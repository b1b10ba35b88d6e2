"""Persisted IVF index: build once, probe many — partition-pruned ANN.

:func:`similarity.ivf_topk` assigns the corpus to cells on EVERY query
batch — right for one-shot audits, wrong for a serving corpus probed
repeatedly. At lake scale the index IS a table: the assigned corpus
written hive-partitioned by cell (``cell=<i>/`` directories) plus the
k centroids as a tiny sidecar. A probe then reads ONLY its ``n_probe``
cell directories — partition pruning skips the rest of the corpus
before a single byte is scanned, the same directory-skipping contract
as a month-partitioned fact table. (FAISS calls this layout the
inverted lists; Spark's version is just partitioned parquet, so it
inherits snapshots, compaction, and schema evolution for free.)

New vectors append through :func:`add_to_index` with the FROZEN
centroids (standard IVF practice — re-train when drift accumulates,
measured by the existing recall harness `ivf_recall_check`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.similarity import (
    _assign_cells_rows,
    assign_cells,
    embedding_near_dups_incremental,
    kmeans_fit,
    probe_assignments,
    rerank_within_cells,
)


def _cells_dir(path: str) -> str:
    return path.rstrip("/") + "/cells"


def _cents_dir(path: str) -> str:
    return path.rstrip("/") + "/centroids"


# Driver-side cache of the FROZEN centroid sidecar rows, keyed by
# (applicationId, index path) — r14, guide §5. The centroids are
# immutable after build_index (append paths never rewrite them; the
# module docstring's frozen-quantizer contract), yet every per-batch
# probe and fold re-listed and re-collected the same ≤ a-few-hundred-row
# table: in a streaming foreachBatch sink that was two parquet reads +
# two collect jobs PER MICRO-BATCH for bytes the driver already held.
# build_index invalidates on overwrite; an external writer that
# rewrites the sidecar outside this module's API must clear the cache
# (the same immutability assumption workload.load() documents).
_CENT_ROWS_CACHE: dict[tuple[str, str], list] = {}


def _cent_rows(spark: SparkSession, path: str) -> list:
    key = (spark.sparkContext.applicationId, path.rstrip("/"))
    rows = _CENT_ROWS_CACHE.get(key)
    if rows is None:
        rows = spark.read.parquet(_cents_dir(path)).collect()
        _CENT_ROWS_CACHE[key] = rows
    return rows


def build_index(
    corpus: DataFrame,
    path: str,
    k_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    cells: DataFrame | None = None,
) -> None:
    """Train the coarse quantizer and materialize the inverted lists.

    One kmeans fit + one assignment pass + one partitioned write; the
    shuffle implied by ``partitionBy`` is the index-build cost paid
    once. Each cell directory holds that cell's vectors contiguously,
    so probes are sequential columnar reads. Pass ``centroids`` (a
    (label, centroid) frame) to build the lists under an
    already-fitted quantizer — e.g. one shared with an in-memory
    audit — skipping the fit entirely; pass ``cells`` (an (id, vec,
    cell) frame assigned under those centroids) to skip the
    assignment pass too (r14 — a session that already holds the
    assigned corpus should not re-run the argmax for a layout write)."""
    cents = centroids
    if cents is None:
        cents = kmeans_fit(corpus, k=k_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    if cells is None:
        cells = assign_cells(corpus, cents, id_col, vec_col)
    # cluster by cell BEFORE the partitioned write: without it every
    # upstream task writes its own sliver into every cell directory —
    # n_tasks x n_cells tiny files whose listing + footer opens
    # dominate every later probe (measured: the r13 scaled-nlist index
    # at 200 cells x 32 tasks left 6400 ~31-row files). One shuffle of
    # the table being written anyway -> exactly one file per cell.
    (
        cells.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(_cells_dir(path))
    )
    cents.write.mode("overwrite").parquet(_cents_dir(path))
    # a rebuild at the same path (tests, refits) must not serve stale
    # frozen-centroid rows to later probes
    _CENT_ROWS_CACHE.pop(
        (corpus.sparkSession.sparkContext.applicationId, path.rstrip("/")),
        None,
    )


def add_to_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    if_absent: bool = False,
) -> None:
    """Append vectors to an existing index under the FROZEN centroids:
    assign (map-only — the centroids inline as literals) + append the
    new rows into their cell directories. No existing file is
    rewritten; dynamic partition overwrite is not needed for appends.

    ``if_absent=True`` makes the append IDEMPOTENT: ids already
    present in the index are dropped before the write, so a replayed
    batch (the crash-between-append-and-checkpoint case in a
    streaming ``foreachBatch`` sink — streaming/vectors.py) is a
    no-op instead of a duplicate row. The existence check reads ONLY
    the cell directories the batch would land in (the same static
    partition filter as :func:`query_index`), never the whole index."""
    assigned = _assign_cells_rows(
        new_vectors, _cent_rows(spark, path), id_col, vec_col
    )
    if if_absent:
        # idempotence must also hold WITHIN the batch: a producer
        # double-write into one landing file carries the same id twice,
        # and the anti-join against the index can't see that
        assigned = assigned.dropDuplicates([id_col])
        # no eager checkpoint (r14): the assignment is a map-only
        # literal argmax over cached centroid rows, so re-evaluating
        # it under the write job costs less than a per-batch
        # materialization job did
        target_cells = sorted(
            {r["cell"] for r in assigned.select("cell").collect()}
        )
        existing = (
            spark.read.parquet(_cells_dir(path))
            .filter(F.col("cell").isin(target_cells))
            .select(id_col)
        )
        assigned = assigned.join(existing, id_col, "left_anti")
    # one file per cell per batch (see build_index's write note)
    (
        assigned.repartition("cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(_cells_dir(path))
    )


def query_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 3,
) -> DataFrame:
    """Probe the persisted index: top-k per query reading ONLY the
    probed cell directories.

    The probed cell set (bounded by k_cells — a control-plane scalar
    list, like the centroid collect in assign_cells) is inlined as an
    IN-list so the parquet scan carries a static PartitionFilter: at
    n_probe=3 of 16 cells the probe reads ~3/16 of the corpus bytes,
    and the fraction falls as k_cells grows. The per-cell re-rank is
    identical to similarity.ivf_topk, so a persisted probe returns the
    same rows as the on-the-fly operator over the same centroids."""
    cents = _cent_rows(spark, path)
    # probes feeds two consumers (the distinct-cell collect below and
    # the re-rank join) — checkpoint so the per-query centroid scoring
    # and its row_number window run once, not once per consumer, and
    # the lineage stops re-reading the centroid parquet
    probes = probe_assignments(
        queries, cents, id_col, vec_col, n_probe
    ).localCheckpoint(eager=True)
    # driver-side distinct over the collected |q| x n_probe cell rows
    # (a distinct() job shuffled the same tiny frame for the same set)
    probed_cells = sorted(
        {r["cell"] for r in probes.select("cell").collect()}
    )
    cells = spark.read.parquet(_cells_dir(path)).filter(
        F.col("cell").isin(probed_cells)
    )
    return rerank_within_cells(cells, probes, id_col, vec_col, k)


def incremental_near_dups_indexed(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_probe: int = 4,
    max_block_rows: int | None = None,
    append: bool = False,
) -> DataFrame:
    """The nightly-ingest near-dup loop against the PERSISTED index,
    with ZERO quantizer work per batch: "is anything in tonight's
    batch a near-dup of what we already have?" answered from the
    frozen sidecar.

    Composition (the docstring promise of
    ``similarity.embedding_near_dups_incremental`` made code):

    1. centroids come from the index sidecar — no ``kmeans_fit``;
    2. the new batch probes its ``n_probe`` nearest cells (map-side,
       centroid literals);
    3. the STORED side is a PARTITION-PRUNED read of only those cell
       directories (`cell IN (...)` on the hive-partitioned inverted
       lists — the scan skips every unprobed cell at the directory
       level, same contract as :func:`query_index`);
    4. the shared rectangular kernel emits pairs touching the batch —
       stored × stored work is never scheduled;
    5. with ``append=True`` the batch is then folded into the index
       under the frozen centroids (:func:`add_to_index`), so tomorrow's
       batch sees tonight's rows — the complete ingest loop. Pairs are
       materialized BEFORE the append so the emitted frame never reads
       the index it just grew.

    Returns the same (id_a, id_b, cosine) contract as the in-memory
    operator, and — given the same centroids — the IDENTICAL rows
    (pinned by tests/test_ann_index.py and the
    ``embedding_near_dups_indexed`` workload entry).

    Index-side multi-assignment (the ``stored_probes`` knob for
    weak-similarity thresholds) is a BUILD-time choice here: build the
    index over multi-probed assignments instead of ``assign_cells``
    and this probe loop is unchanged. At near-dup thresholds the
    standard single-assignment index suffices (measured in the r10
    recall audits)."""
    cents = _cent_rows(spark, path)
    # ONE probe construction per batch, threaded through ``new_probes``
    # so embedding_near_dups_incremental doesn't re-score the batch.
    # Lazy (r14): the probe is a map-only literal projection of the
    # micro-batch (callers checkpoint their batch — streaming/vectors,
    # the indexed workload entries), so re-evaluating it under the
    # kernel costs less than a per-batch materialization job did.
    probes = probe_assignments(new, cents, id_col, vec_col, n_probe)
    # driver-side distinct (see query_index): one collect, no shuffle
    probed = sorted(
        {r["cell"] for r in probes.select("cell").collect()}
    )
    stored_cells = spark.read.parquet(_cells_dir(path)).filter(
        F.col("cell").isin(probed)
    )
    pairs = embedding_near_dups_incremental(
        stored=None,
        new=new,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_probe=n_probe,
        cents=cents,
        stored_cells=stored_cells,
        max_block_rows=max_block_rows,
        new_probes=probes,
    )
    if append:
        pairs = pairs.localCheckpoint(eager=True)
        add_to_index(spark, path, new, id_col, vec_col)
    return pairs


def _codes_dir(path: str) -> str:
    return path.rstrip("/") + "/codes"


def _books_dir(path: str) -> str:
    return path.rstrip("/") + "/codebooks"


def build_pq_index(
    spark: SparkSession,
    path: str,
    codebooks: list[DataFrame],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Extend a built IVF index (:func:`build_index`) into a full
    persisted IVFPQ index: the PQ codes of every indexed vector are
    written CELL-PARTITIONED beside the inverted lists (so an ADC
    probe prunes code bytes exactly like the vector probe prunes
    vectors), and the ``m`` per-subspace codebooks land in one tiny
    sidecar (FAISS's serialized quantizers as a parquet table).

    The index then carries everything a two-stage-plus-refine probe
    needs on disk: centroids (route), codes (cheap rank), vectors
    (exact re-rank) — :func:`query_pq_index` reads only the probed
    cell directories of BOTH partitioned tables."""
    from data_engineering_project_spark.operators import pq as pq_ops

    cells = spark.read.parquet(_cells_dir(path))
    codes = pq_ops.pq_encode(cells, codebooks, id_col, vec_col).join(
        cells.select(id_col, "cell"), id_col
    )
    # one file per cell (see build_index): the codes table is m
    # bytes/row, so un-clustered partitionBy writes would leave
    # directories where per-file open cost dwarfs the payload
    (
        codes.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(_codes_dir(path))
    )
    books = None
    for j, b in enumerate(codebooks):
        part = b.select(
            F.lit(j).alias("subspace"), "label", "centroid"
        )
        books = part if books is None else books.unionByName(part)
    books.write.mode("overwrite").parquet(_books_dir(path))


def add_to_pq_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    if_absent: bool = False,
) -> None:
    """Fold a batch into the persisted CODES table under the frozen
    quantizers: encode with the codebook sidecar (map-only, codeword
    literals — zero re-training), assign cells with the frozen
    centroids, append cell-partitioned. The PQ twin of
    :func:`add_to_index`, with the same idempotence contract:
    ``if_absent=True`` dedupes ids within the batch AND against the
    ids already coded in the target cells (a partition-pruned read),
    so a replayed micro-batch appends nothing."""
    from data_engineering_project_spark.operators import pq as pq_ops

    # rows, not frames: pq_encode builds codeword literals driver-side
    books = read_codebook_rows(spark, path)
    assigned = _assign_cells_rows(
        new_vectors, _cent_rows(spark, path), id_col, vec_col
    )
    # encode the ASSIGNED frame with the cell carried through — one
    # map-only projection instead of encode + equi-join on id (r14);
    # the partitioned write drops `cell` into the directory key, so
    # the data files are byte-shaped as before
    codes = pq_ops.pq_encode(
        assigned,
        books,
        id_col,
        vec_col,
        keep=["cell"],
        dim=len(books) * len(books[0][0]["centroid"]),
    )
    if if_absent:
        codes = codes.dropDuplicates([id_col])
        # no eager checkpoint (r14) — map-only lineage, see add_to_index
        target_cells = sorted(
            {r["cell"] for r in codes.select("cell").collect()}
        )
        existing = (
            spark.read.parquet(_codes_dir(path))
            .filter(F.col("cell").isin(target_cells))
            .select(id_col)
        )
        codes = codes.join(existing, id_col, "left_anti")
    # one file per cell per batch (see build_index's write note)
    (
        codes.repartition("cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(_codes_dir(path))
    )


def index_row_count(path: str) -> int:
    """Row count of the inverted-lists table summed from parquet
    footers — a driver-side directory walk, zero Spark jobs (r14,
    guide §5: the same per-file metadata a ``count()`` scan
    aggregates, without scheduling the scan). Exact by the parquet
    spec (num_rows is mandatory footer metadata)."""
    import os

    import pyarrow.parquet as papq

    total = 0
    for base, _, files in os.walk(_cells_dir(path)):
        for f in files:
            if f.endswith(".parquet"):
                total += papq.ParquetFile(
                    os.path.join(base, f)
                ).metadata.num_rows
    return total


def index_scan_bytes(path: str, cells: list) -> dict:
    """On-disk parquet bytes a probe of ``cells`` would scan, per
    table — the honest codes-vs-vectors footprint comparison (the
    whole reason PQ codes exist at 100 TB: the rank stage reads
    m-byte codes, ~dim*8/m smaller than the fp64 vectors). Driver-side
    directory walk over the probed ``cell=`` directories only —
    control-plane, no Spark job."""
    import os

    def du(root: str) -> int:
        total = 0
        for c in cells:
            d = os.path.join(root, f"cell={c}")
            if not os.path.isdir(d):
                continue
            for base, _, files in os.walk(d):
                total += sum(
                    os.path.getsize(os.path.join(base, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        return total

    return {
        "vector_bytes": du(_cells_dir(path)),
        "codes_bytes": du(_codes_dir(path)),
    }


def incremental_near_dups_pq(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_probe: int = 4,
    shortlist: int = 50,
    append: bool = False,
) -> DataFrame:
    """SEMANTIC DEDUP OVER THE PERSISTED PQ CODES — the nightly
    near-dup loop where the stored-side rank stage reads m-byte codes
    instead of full vectors (the 100 TB story: at m=4 over 64-dim
    fp64, the codes table is ~100x smaller than the embeddings it
    ranks, so the heavy scan shrinks by that factor; measured by
    :func:`index_scan_bytes`).

    Composition (the `ivfpq_rerank_recall` two-stage-plus-refine
    pattern folded into the ingest loop):

    1. route: the new batch probes its ``n_probe`` cells under the
       FROZEN sidecar centroids (one probe, checkpointed — it feeds
       the partition-filter collect AND the exact re-rank);
    2. cheap rank: ADC over ONLY the probed cells' CODES
       (partition-pruned directory read) shortlists ``shortlist``
       stored candidates per new vector — full vectors never touch
       this stage;
    3. exact re-rank: the shortlist survivors' vectors are fetched by
       a broadcast semi-join into the probed cell directories and
       scored full-precision; pairs above ``threshold`` are emitted
       with the exact (rounded-4) cosine — ADC only SELECTS, it never
       SCORES the output;
    4. new x new pairs come from the exact rectangular kernel over the
       batch alone (a micro-batch is bounded; its own pairs don't need
       PQ);
    5. ``append=True`` folds the batch into BOTH persisted tables —
       vectors (:func:`add_to_index`) and codes
       (:func:`add_to_pq_index`) — so tomorrow's batch sees tonight's
       rows in the codes it ranks.

    Same (id_a, id_b, cosine) contract as
    :func:`incremental_near_dups_indexed`; identical rows given the
    same quantizers WHEN the shortlist holds every true near-dup —
    ``shortlist`` is the recall dial, and at near-dup thresholds a
    vector's dups are its very nearest neighbors, so small shortlists
    already reach parity (pinned by the ``pq_near_dups_incremental``
    workload entry and tests/test_ann_index.py). A vector with more
    than ``shortlist`` dups above threshold would truncate — size the
    dial like `ivfpq_rerank_recall` measures.

    The new batch is collected driver-side for the ADC lookup tables
    (micro-batch bounded by contract, exactly like the query side of
    :func:`query_pq_index`)."""
    import pandas as pd

    from data_engineering_project_spark.operators import pq as pq_ops

    cents = _cent_rows(spark, path)
    # ONE collect of the books sidecar instead of 1 + m filtered scans
    books = read_codebook_rows(spark, path)
    probes = probe_assignments(
        new, cents, id_col, vec_col, n_probe
    ).localCheckpoint(eager=True)
    # one collect serves the partition-filter cell list AND the grouped
    # kernel's probe map (was a distinct() job + a toPandas job)
    pc_rows = probes.select("query_id", "cell").collect()
    probed = sorted({r["cell"] for r in pc_rows})
    codes = spark.read.parquet(_codes_dir(path)).filter(
        F.col("cell").isin(probed)
    )
    cells = spark.read.parquet(_cells_dir(path)).filter(
        F.col("cell").isin(probed)
    )
    # grouped IVFADC kernel (r13): the cell-pruned codes stream through
    # the scorer ONCE — no (query, id) candidate pair frame, no join,
    # no Q-fold row amplification; the probe map ships driver-side
    # (bounded: |batch| x n_probe entries). This is what keeps the
    # rank stage's cost proportional to the bytes it reads (the m-byte
    # codes) instead of to the materialized pair count.
    qp = new.select(id_col, vec_col).toPandas()
    sl = pq_ops.pq_adc_topk_grouped(
        codes.select(id_col, "codes", "cell"),
        books,
        qp,
        pd.DataFrame(
            {
                "query_id": [r["query_id"] for r in pc_rows],
                "cell": [r["cell"] for r in pc_rows],
            }
        ),
        k=shortlist,
        id_col=id_col,
        query_id_col=id_col,
        query_vec_col=vec_col,
    )
    sl_vecs = cells.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).join(F.broadcast(sl.select("query_id", "neighbor_id")), "neighbor_id")
    q_vecs = probes.select("query_id", "q_vec").dropDuplicates(["query_id"])

    # exact re-rank as an Arrow kernel — same arithmetic as the exact
    # loop's rectangle kernel (normalize with the 1e-12 clamp, raw-
    # cosine threshold, np.round to 4), instead of the interpreted
    # higher-order-function cosine expression (measured 4s vs <0.5s
    # on the x100 rung's 322k shortlist pairs)
    def rerank_kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack(pdf["q_vec"].map(lambda v: np.asarray(v, dtype=np.float64)))
            b = np.stack(pdf["c_vec"].map(lambda v: np.asarray(v, dtype=np.float64)))
            an = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
            bn = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
            cos = np.einsum("ij,ij->i", an, bn)
            m = cos > threshold
            if not m.any():
                continue
            qa = pdf["query_id"].to_numpy()[m]
            nb = pdf["neighbor_id"].to_numpy()[m]
            yield pd.DataFrame(
                {
                    "id_a": np.minimum(qa, nb),
                    "id_b": np.maximum(qa, nb),
                    "cosine": np.round(cos[m], 4),
                }
            )

    new_stored = (
        sl_vecs.join(F.broadcast(q_vecs), "query_id")
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .mapInPandas(rerank_kernel, "id_a long, id_b long, cosine double")
    )
    # new x new: the exact kernel over the batch alone — an empty
    # stored side turns the rectangle into the within-batch square
    new_new = embedding_near_dups_incremental(
        stored=None,
        new=new,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_probe=n_probe,
        cents=cents,
        stored_cells=cells.select(id_col, vec_col, "cell").limit(0),
        new_probes=probes,
    )
    # same deterministic key-only collapse as the exact loop
    # (similarity._collapse_pairs): multi-probe rediscoveries of one
    # pair keep the max cosine, never a first-row race
    pairs = (
        new_stored.unionByName(new_new)
        .groupBy("id_a", "id_b")
        .agg(F.max("cosine").alias("cosine"))
    )
    if append:
        pairs = pairs.localCheckpoint(eager=True)
        add_to_index(spark, path, new, id_col, vec_col)
        add_to_pq_index(spark, path, new, id_col, vec_col)
    return pairs


def read_codebooks(spark: SparkSession, path: str) -> list[DataFrame]:
    """Sidecar → the list-of-(label, centroid)-frames shape
    ``pq_adc_topk`` consumes. Parquet doubles round-trip exactly, so
    a probe against the persisted books scores bit-identically to one
    against the in-memory fit.

    (r13 note: a single-collect + m-local-createDataFrame variant was
    A/B-measured 3x SLOWER — on this workload ``createDataFrame`` costs
    ~0.4 s of driver time per call while each filtered scan of the tiny
    sidecar is ~0.1 s, so the m+1 small scan jobs stay.)"""
    all_books = spark.read.parquet(_books_dir(path))
    m = all_books.agg(F.max("subspace")).collect()[0][0] + 1
    return [
        all_books.filter(F.col("subspace") == j).select("label", "centroid")
        for j in range(m)
    ]


def read_codebook_rows(spark: SparkSession, path: str) -> list[list]:
    """Sidecar → per-subspace lists of (label, centroid) rows in ONE
    scan + collect (the sidecar is a bounded control-plane table).
    The probe path consumes driver-side rows anyway (the ADC lookup
    tables are built on the driver), so reading the books as m
    separate filtered-scan jobs paid m extra job round-trips per probe
    for rows the driver immediately collected — guide §5. Row values
    are identical to :func:`read_codebooks`'s frames collected
    per-subspace (same files, same cells)."""
    rows = spark.read.parquet(_books_dir(path)).collect()
    if not rows:
        raise ValueError(f"no codebooks at {_books_dir(path)}")
    m = max(int(r["subspace"]) for r in rows) + 1
    books: list[list] = [[] for _ in range(m)]
    for r in rows:
        books[int(r["subspace"])].append(r)
    return books


def query_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    shortlist: int = 50,
) -> DataFrame:
    """Probe the persisted IVFPQ index: route by the centroid sidecar,
    ADC-rank ONLY the probed cells' codes into a shortlist, exact
    re-rank against ONLY the probed cells' vectors — both heavy scans
    carry static ``cell`` PartitionFilters, so a probe reads
    ~n_probe/k_cells of the code bytes AND of the vector bytes.
    Returns the same rows as the in-memory composition
    (:func:`pq.ivfpq_topk`) over the same quantizers — the lake
    layout is never an answer change (pinned by the
    ``ivfpq_index_parity`` workload entry and tests/test_ann_index.py).
    """
    import pandas as pd

    from data_engineering_project_spark.operators import pq as pq_ops

    cents = _cent_rows(spark, path)
    # ONE collect of the books sidecar (the driver builds the ADC
    # tables from rows anyway) instead of 1 + m filtered-scan jobs
    books = read_codebook_rows(spark, path)
    probes = probe_assignments(
        queries, cents, id_col, vec_col, n_probe
    ).localCheckpoint(eager=True)
    # one collect serves BOTH the partition-filter cell list and the
    # grouped kernel's driver-side probe map (the distinct() job and
    # the toPandas job each re-walked the same |q| x n_probe rows)
    pc_rows = probes.select("query_id", "cell").collect()
    probed_cells = sorted({r["cell"] for r in pc_rows})
    probes_pdf = pd.DataFrame(
        {
            "query_id": [r["query_id"] for r in pc_rows],
            "cell": [r["cell"] for r in pc_rows],
        }
    )
    cells = spark.read.parquet(_cells_dir(path)).filter(
        F.col("cell").isin(probed_cells)
    )
    codes = spark.read.parquet(_codes_dir(path)).filter(
        F.col("cell").isin(probed_cells)
    )
    # the rerank itself IS pq.ivfpq_topk over the pruned frames — one
    # code path for both the in-memory and persisted retrievers, so
    # the ivfpq_index_parity oracle compares composition, not two
    # hand-kept copies of the shortlist->fetch->rerank block
    return pq_ops.ivfpq_topk(
        cells,
        # keep `cell` on the codes frame: ivfpq_topk's grouped kernel
        # consumes it directly, so the pruned partition scan feeds the
        # scorer without a cell-assignment join
        codes.select(id_col, "codes", "cell"),
        books,
        cents,
        queries,
        k=k,
        n_probe=n_probe,
        shortlist=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        probes=probes,
        probes_pdf=probes_pdf,
    )
