"""Product quantization (PQ) — compressed embeddings for ANN at scale.

IVF (operators/similarity.py, operators/ann_index.py) prunes WHICH
vectors a query touches; PQ shrinks WHAT each touched vector costs.
The vector is split into ``m`` subvectors, each quantized to one of
``k`` per-subspace codewords (Jegou/Douze/Schmid, TPAMI'11), so a
64-dim float32 embedding (256 bytes) becomes ``m`` small codes (m
bytes at k<=256) — the difference between an embedding table that
spills to disk and one that sits in executor memory at 100 TB corpus
scale. Search is asymmetric (ADC): the query stays full-precision,
and each subspace contributes a codeword inner product read from a
per-query lookup table, so scoring a corpus row is ``m`` array reads
instead of ``dim`` multiply-adds.

Spark shapes: training is ``m`` independent coarse-quantizer fits
(:func:`similarity.kmeans_fit` on sliced vectors — same deterministic
Lloyd's); encoding is ONE map-only pass (the m argmaxes inline their
codeword literals exactly like ``assign_cells`` — zero exchanges, no
Python); ADC scoring is map-only expression arithmetic with the
per-query tables inlined as literal arrays (queries are bounded by
contract, as in cosine_topk). Nothing here shuffles the corpus.

Codewords are chosen by L2 argmin (minimum reconstruction error —
what ADC's inner-product read actually approximates); ADC scores the
reconstruction's inner product, which is exact for the reconstruction
and approximate for the original vector — recall against exact search
is the quality metric (tests/test_pq.py measures it alongside
reconstruction error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.similarity import (
    cosine_similarity,
    kmeans_fit,
    probe_assignments,
)


def _subvec_sql(vec_col: str, j: int, d: int) -> str:
    return f"slice({vec_col}, {j * d + 1}, {d})"


def _argmin_l2_expr(cent_rows, vec_sql: str) -> str:
    """L2 codeword argmin for one subspace, as an argmax over
    (v.c - |c|^2/2, -label) structs: argmin |v_j - c|^2 equals that
    argmax because |v_j|^2 is constant across codewords — so the
    expression needs no per-row norm at all, just k inner products.
    (assign_cells' cosine argmax picks the same cell only for
    unit-norm codewords; ADC ranks by inner products of the
    reconstruction, so the encoder must minimize reconstruction
    error, i.e. L2.)"""
    structs = []
    for row in cent_rows:
        vec = [float(x) for x in row["centroid"]]
        vals = ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in vec)
        half_nc2 = sum(x * x for x in vec) / 2.0
        dot = (
            f"aggregate(zip_with(cast({vec_sql} as array<double>),"
            f" array({vals}), (x, y) -> x * y), 0D, (a, v) -> a + v)"
        )
        structs.append(
            f"struct({dot} - CAST('{half_nc2!r}' AS DOUBLE) AS sim,"
            f" {-int(row['label'])} AS negcell)"
        )
    return "array_max(array(" + ",".join(structs) + "))"


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[DataFrame]:
    """Train the ``m`` per-subspace codebooks → list of (label,
    centroid) frames. Each subspace is an independent
    :func:`kmeans_fit` over the sliced vectors; the fits are
    sequential full-corpus passes (like IVF training) and are paid at
    index-build time, never per query."""
    dim = len(df.select(vec_col).limit(1).collect()[0][0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    from concurrent.futures import ThreadPoolExecutor

    def fit(j: int):
        sub = df.select(
            F.col(id_col),
            F.expr(_subvec_sql(vec_col, j, d)).alias(vec_col),
        )
        return kmeans_fit(
            sub, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )

    # the m fits are independent jobs on disjoint column slices —
    # submitting them from threads lets Spark's scheduler interleave
    # their stages instead of paying m sequential job latencies
    # (thread-safe: SparkSession job submission is, and kmeans_fit
    # holds no shared state)
    with ThreadPoolExecutor(max_workers=m) as pool:
        return list(pool.map(fit, range(m)))


def pq_encode(
    df: DataFrame,
    codebooks: list[DataFrame],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, codes array<int>): each vector's per-subspace codeword
    ids, in ONE map-only projection — all m argmaxes run in the same
    whole-stage-codegen pass with their codewords inlined as
    literals, the assign_cells shape times m. At k<=256 the codes
    array is the m-byte compressed representation."""
    book_rows = [b.collect() for b in codebooks]
    m = len(book_rows)
    dim = len(df.select(vec_col).limit(1).collect()[0][0])
    d = dim // m
    code_cols = [
        -F.expr(_argmin_l2_expr(rows, _subvec_sql(vec_col, j, d)))[
            "negcell"
        ]
        for j, rows in enumerate(book_rows)
    ]
    return df.select(F.col(id_col), F.array(*code_cols).alias("codes"))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[DataFrame],
    queries_pdf,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, neighbor_id, adc_ip).

    ``candidates`` (optional) is a (query_id, ``id_col``) pair frame
    restricting which rows each query may rank — FAISS's
    ``search_preassigned`` hook, i.e. the IVFPQ composition point: the
    IVF probe emits per-query candidate pairs, ADC ranks only those
    (a semi-join BEFORE the rank window, so pruned rows are never
    scored into the top-k).

    Per query, the m x k_sub table of <query subvector, codeword>
    inner products is computed driver-side (bounded: queries are small
    by contract, codebooks are control-plane frames) and shipped as a
    BROADCAST (query_id, tables) frame; scoring is ONE
    BroadcastNestedLoopJoin pass over the encoded corpus — each
    (query, row) pair costs m nested ``element_at`` reads + adds
    inside a single codegen stage (no per-query plan branches, no
    unions: the per-query-union form paid the whole-stage-codegen
    compiler once PER QUERY, which dwarfed the actual scoring).
    Ranking is (rounded score desc, neighbor id asc), the repo's
    tiebreak convention.

    Lookup tables are keyed BY LABEL VALUE, not by sorted position:
    a codebook's labels are not assumed contiguous 0..k-1 (since
    round 7 :func:`similarity.kmeans_fit` carries empty cells
    forward, so ITS labels are always dense, but this scorer accepts
    any labeled codebook — e.g. one with pruned codewords) — each
    table array is sized max(label)+1 with the codeword's inner
    product placed at index ``label`` (gap slots hold NULL and are
    unreachable: pq_encode only ever emits labels that exist in the
    codebook)."""
    from pyspark.sql import Window

    book_maps = []
    for b in codebooks:
        rows = b.collect()
        book_maps.append(
            {int(r["label"]): [float(x) for x in r["centroid"]] for r in rows}
        )
    m = len(book_maps)
    d = len(next(iter(book_maps[0].values())))
    spark = encoded.sparkSession
    # query_id keeps the caller's id type: integer-kind pandas dtypes
    # ship as long, float as double, anything else as string — the
    # broadcast frame's key must compare cleanly against id_col
    kind = queries_pdf[query_id_col].dtype.kind
    if kind == "O" and len(queries_pdf):
        # object columns (e.g. Python ints read through pandas object
        # dtype) would otherwise coerce to string and force implicit
        # string/long -> double casts in the equi-join against id_col
        # — key by the values' real type instead. ALL non-null values
        # must agree (first-value sniffing would mistype mixed
        # columns); numpy scalar types count as their Python kind.
        import numbers as _numbers

        vals = [v for v in queries_pdf[query_id_col] if v is not None]
        if vals and all(
            isinstance(v, _numbers.Integral)
            and not isinstance(v, bool)
            for v in vals
        ):
            kind = "i"
        elif vals and all(
            isinstance(v, _numbers.Real) and not isinstance(v, bool)
            for v in vals
        ):
            kind = "f"
    if kind in "iu":
        qid_type, coerce = "long", int
    elif kind == "f":
        qid_type, coerce = "double", float
    else:
        qid_type, coerce = "string", str
    q_rows = []
    for q in queries_pdf.itertuples(index=False):
        qid = getattr(q, query_id_col)
        qv = [float(x) for x in getattr(q, query_vec_col)]
        tables = []
        for j, book in enumerate(book_maps):
            table = {
                lbl: sum(qv[j * d + t] * c[t] for t in range(d))
                for lbl, c in book.items()
            }
            tables.append([table.get(i) for i in range(max(table) + 1)])
        q_rows.append((coerce(qid), tables))
    qdf = spark.createDataFrame(
        q_rows, f"query_id {qid_type}, tabs array<array<double>>"
    )
    score = None
    for j in range(m):
        term = F.element_at(
            F.element_at("tabs", j + 1), F.element_at("codes", j + 1) + 1
        )
        score = term if score is None else score + term
    scored = (
        encoded.join(F.broadcast(qdf))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(score, 6).alias("adc_ip"),
        )
    )
    if candidates is not None:
        scored = scored.join(
            candidates.withColumnRenamed(id_col, "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_ip"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_ip")
    )


def ivfpq_topk(
    cells: DataFrame,
    encoded: DataFrame,
    codebooks: list[DataFrame],
    cents: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: DataFrame | None = None,
) -> DataFrame:
    """The COMPOSED production IVFPQ retriever: IVF probe prunes WHICH
    rows a query touches, ADC ranks ONLY those into a ``shortlist``,
    and exact full-precision cosine re-ranks the shortlist into the
    final top-k — the standard two-stage-plus-re-rank serving pattern
    (FAISS ``IVFPQ`` + refine). Bare ADC top-k is a lossy retriever
    (codes are m small codewords — measured recall@5 of 0.08-0.20 at
    the ×100 rung on near-random vectors); the re-rank recovers what
    quantization loses because the exact pass only has to ORDER
    ``shortlist`` survivors per query, never score the corpus.

    Inputs are the persisted serving state: ``cells`` = the assigned
    corpus (id, vector, cell — operators/ann_index.py's inverted
    lists), ``encoded`` = the PQ codes (:func:`pq_encode`),
    ``codebooks``/``cents`` = the trained quantizers. ``queries`` is a
    bounded DataFrame (collected driver-side for the ADC lookup
    tables, exactly like :func:`pq_adc_topk`).

    Scale shape: the probe join touches ~n_probe/k_cells of the codes;
    the exact stage scores |queries| × ``shortlist`` rows — a
    broadcast semi-join against the corpus, never a corpus scan. Cost
    per query is therefore (pruned ADC reads) + (shortlist exact
    cosines), the same asymptotics as the bare two-stage pipeline.

    Output: (query_id, neighbor_id, cosine) — k rows per query ranked
    by exact rounded cosine desc, neighbor_id asc (the repo's ranking
    convention), self-matches excluded.
    """
    from pyspark.sql import Window

    # ``probes`` lets a caller that already probed (e.g. the persisted
    # index, which needs the probed-cell list for partition pruning)
    # hand the checkpointed frame through instead of re-scoring
    if probes is None:
        probes = probe_assignments(
            queries, cents, id_col, vec_col, n_probe
        ).localCheckpoint(eager=True)
    cands = (
        cells.select(id_col, "cell")
        .join(probes.select("query_id", "cell"), "cell")
        .select("query_id", id_col)
    )
    qp = queries.select(id_col, vec_col).toPandas()
    sl = pq_adc_topk(
        encoded,
        codebooks,
        qp,
        k=shortlist,
        candidates=cands,
        id_col=id_col,
        query_id_col=id_col,
        query_vec_col=vec_col,
    )
    # exact re-rank: fetch ONLY the shortlist rows' vectors (broadcast
    # of |queries| x shortlist pairs prunes the corpus scan) and score
    # them full-precision against the query vectors the probe already
    # carries
    sl_vecs = cells.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).join(F.broadcast(sl.select("query_id", "neighbor_id")), "neighbor_id")
    q_vecs = probes.select("query_id", "q_vec").dropDuplicates(["query_id"])
    scored = sl_vecs.join(F.broadcast(q_vecs), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )
