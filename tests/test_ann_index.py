"""Persisted IVF index (operators/ann_index.py): build / probe /
append semantics and the partition-pruning contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import ann_index, similarity
from data_engineering_project_spark.plans import workload


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = workload.load(spark, sf_dir, "embeddings")
    ann_index.build_index(emb, path, k_cells=8, iters=2)
    return path


def test_persisted_probe_matches_on_the_fly_ivf(spark, sf_dir, index_path):
    emb = workload.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = spark.read.parquet(index_path + "/centroids")
    on_the_fly = similarity.ivf_topk(emb, queries, cents, k=5, n_probe=3)
    persisted = ann_index.query_index(
        spark, index_path, queries, k=5, n_probe=3
    )
    a = sorted(map(tuple, on_the_fly.collect()))
    b = sorted(map(tuple, persisted.collect()))
    assert a == b and len(a) > 0


def test_probe_scan_is_partition_pruned(spark, sf_dir, index_path):
    emb = workload.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = ann_index.query_index(spark, index_path, queries, k=5, n_probe=2)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cell" in seg, "probe scan lost its partition filter"
    # and the pruned read really returns rows only from probed cells
    n_probed = (
        similarity.probe_assignments(
            queries, spark.read.parquet(index_path + "/centroids"), n_probe=2
        )
        .select("cell")
        .distinct()
        .count()
    )
    assert 0 < n_probed <= 3 * 2  # <= n_queries * n_probe, and tiny vs 8


def test_append_under_frozen_centroids_is_findable(spark, sf_dir, tmp_path):
    path = str(tmp_path / "index")
    emb = workload.load(spark, sf_dir, "embeddings")
    ann_index.build_index(emb, path, k_cells=8, iters=2)
    # plant a near-duplicate of vector 0 with a fresh id
    v0 = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    planted = spark.createDataFrame(
        [(10_000_000, list(v0))],
        "vec_id long, embedding array<float>",
    )
    ann_index.add_to_index(spark, path, planted)
    hits = ann_index.query_index(
        spark,
        path,
        emb.filter(F.col("vec_id") == 0),
        k=5,
        n_probe=2,
    ).collect()
    by_rank = [r["neighbor_id"] for r in hits]
    # an exact copy lands in the same cell and reranks to the top
    assert by_rank and by_rank[0] == 10_000_000
    top = [r for r in hits if r["neighbor_id"] == 10_000_000][0]
    assert top["cosine"] == pytest.approx(1.0, abs=1e-6)


def _perturbed_copies(spark, emb, every: int = 7, offset: int = 10_000_000):
    """Deterministic ±0.3% perturbed copies of every ``every``-th
    vector under fresh ids — near-dups by construction (cosine of v vs
    v*(1±eps per-dim) stays > 0.999 at eps=0.003)."""
    return emb.filter(F.col("vec_id") % every == 0).select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x * CAST(1.0 + 0.003 *"
            " IF(pmod(xxhash64(concat(CAST(vec_id AS STRING), ':',"
            " CAST(i AS STRING))), 2) = 0, 1.0, -1.0) AS FLOAT))"
        ).alias("embedding"),
    )


def test_indexed_incremental_near_dups_zero_refit_parity(
    spark, sf_dir, index_path
):
    """incremental_near_dups_indexed == the in-memory operator under
    the same (frozen) quantizer, and the stored-side scan is
    partition-pruned — the docstring promise of
    embedding_near_dups_incremental demonstrated as code."""
    emb = workload.load(spark, sf_dir, "embeddings")
    new = _perturbed_copies(spark, emb).localCheckpoint(eager=True)
    indexed = ann_index.incremental_near_dups_indexed(
        spark, index_path, new, threshold=0.99, n_probe=3
    )
    cents = spark.read.parquet(index_path + "/centroids")
    inmem = similarity.embedding_near_dups_incremental(
        emb, new, threshold=0.99, n_probe=3, cents=cents
    )
    a = sorted(map(tuple, indexed.collect()))
    b = sorted(map(tuple, inmem.collect()))
    assert a == b
    # every planted copy pairs with its source
    planted = {int(r["vec_id"]) for r in new.select("vec_id").collect()}
    got = {(r[0], r[1]) for r in a}
    assert all((p - 10_000_000, p) in got for p in planted)
    # zero-refit: the stored scan carries a static cell partition
    # filter (directory-level pruning on the inverted lists)
    plan = indexed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cell" in seg, "stored-side scan lost its partition filter"


def test_indexed_incremental_append_completes_the_loop(spark, sf_dir, tmp_path):
    """Nightly shape: batch 1 probes + appends; batch 2 (near-dups of
    batch 1's rows) then finds them WITHOUT any refit — tomorrow's
    batch sees tonight's rows."""
    path = str(tmp_path / "index")
    emb = workload.load(spark, sf_dir, "embeddings")
    ann_index.build_index(emb, path, k_cells=8, iters=2)
    batch1 = _perturbed_copies(
        spark, emb, every=11, offset=10_000_000
    ).localCheckpoint(eager=True)
    pairs1 = ann_index.incremental_near_dups_indexed(
        spark, path, batch1, threshold=0.99, n_probe=3, append=True
    ).localCheckpoint(eager=True)
    # batch 2 = exact copies of batch 1's rows under yet-fresher ids:
    # their only 0.99-near-dups at distance ~1.0 are batch-1 rows (and
    # the original sources), both of which must be found in the index
    batch2 = batch1.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    pairs2 = ann_index.incremental_near_dups_indexed(
        spark, path, batch2, threshold=0.99, n_probe=3, append=True
    ).collect()
    got2 = {(r["id_a"], r["id_b"]) for r in pairs2}
    b1 = {int(r["vec_id"]) for r in batch1.select("vec_id").collect()}
    # every batch-2 exact copy finds its batch-1 twin (appended rows
    # are visible) AND its original source (original rows still are)
    assert all((p, p + 10_000_000) in got2 for p in b1)
    assert all((p - 10_000_000, p + 10_000_000) in got2 for p in b1)
    # batch-1's own pairs never re-emit stored x stored work: pairs2
    # all touch batch 2
    b2 = {p + 10_000_000 for p in b1}
    assert all(a in b2 or b in b2 for a, b in got2)
    # and the appended index answers point queries (loop is usable)
    hits = ann_index.query_index(
        spark, path, batch2.limit(1), k=3, n_probe=2
    ).collect()
    assert hits and hits[0]["cosine"] == pytest.approx(1.0, abs=1e-6)


@pytest.fixture(scope="module")
def pq_index_path(spark, sf_dir, tmp_path_factory):
    """Own IVF+PQ index (separate from index_path so the PQ-state
    tests never depend on another test having built the codes)."""
    from data_engineering_project_spark.operators import pq

    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    emb = workload.load(spark, sf_dir, "embeddings")
    ann_index.build_index(emb, path, k_cells=8, iters=2)
    # m=4/k=16 (the production sizing from workload._pq_books): coarser
    # books (m=2/k=4) leave only 16 distinct codes, whose huge ADC tie
    # groups can push a true near-dup below any reasonable shortlist
    books = pq.pq_train(emb, m=4, k=16, iters=1)
    ann_index.build_pq_index(spark, path, books)
    return path


def test_pq_incremental_near_dups_matches_exact_loop(
    spark, sf_dir, pq_index_path
):
    """Semantic dedup over the persisted PQ codes: the
    codes-shortlist -> exact-re-rank loop returns the SAME pairs as
    the full-vector loop on planted near-dups — ADC only selects, the
    emitted cosine is exact — and the codes footprint a probe scans
    is a fraction of the vector footprint (the 100 TB reason to rank
    codes)."""
    emb = workload.load(spark, sf_dir, "embeddings")
    new = _perturbed_copies(spark, emb).localCheckpoint(eager=True)
    pq_pairs = ann_index.incremental_near_dups_pq(
        spark, pq_index_path, new, threshold=0.99, n_probe=3, shortlist=50
    ).collect()
    exact_pairs = ann_index.incremental_near_dups_indexed(
        spark, pq_index_path, new, threshold=0.99, n_probe=3
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pq_pairs}
    want = {(r["id_a"], r["id_b"]): r["cosine"] for r in exact_pairs}
    assert set(got) == set(want) and len(want) > 0
    # both sides round an exact double cosine to 4dp; allow the ulp at
    # a rounding boundary between the SQL and numpy evaluation orders
    assert all(abs(got[k] - want[k]) <= 1e-4 + 1e-12 for k in want)
    # every planted copy found its source
    planted = {int(r["vec_id"]) for r in new.select("vec_id").collect()}
    assert all((p - 10_000_000, p) in got for p in planted)
    # the rank-stage scan footprint: probed codes bytes << vector bytes
    fp = ann_index.index_scan_bytes(pq_index_path, list(range(8)))
    assert 0 < fp["codes_bytes"] < fp["vector_bytes"] / 3


def test_pq_incremental_codes_scan_partition_pruned(
    spark, sf_dir, pq_index_path
):
    emb = workload.load(spark, sf_dir, "embeddings")
    new = _perturbed_copies(spark, emb, every=31).localCheckpoint(eager=True)
    out = ann_index.incremental_near_dups_pq(
        spark, pq_index_path, new, threshold=0.99, n_probe=2, shortlist=10
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pruned_scans = sum(
        "cell" in seg.split("]")[0]
        for seg in plan.split("PartitionFilters")[1:]
    )
    assert pruned_scans >= 2, "codes and vectors scans must both prune"


def test_pq_incremental_append_completes_the_loop(spark, sf_dir, tmp_path):
    """Nightly PQ shape: batch 1 probes + appends into BOTH persisted
    tables (vectors and codes); batch 2 (exact copies of batch 1)
    finds its batch-1 twins through the CODES it ranks — tonight's
    rows visible in tomorrow's shortlist stage. Replayed append is a
    no-op on both tables (if_absent layering)."""
    from data_engineering_project_spark.operators import pq

    path = str(tmp_path / "index")
    emb = workload.load(spark, sf_dir, "embeddings")
    ann_index.build_index(emb, path, k_cells=8, iters=2)
    books = pq.pq_train(emb, m=4, k=16, iters=1)
    ann_index.build_pq_index(spark, path, books)
    batch1 = _perturbed_copies(
        spark, emb, every=11, offset=10_000_000
    ).localCheckpoint(eager=True)
    ann_index.incremental_near_dups_pq(
        spark, path, batch1, threshold=0.99, n_probe=3, shortlist=50,
        append=True,
    ).collect()
    batch2 = batch1.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    pairs2 = ann_index.incremental_near_dups_pq(
        spark, path, batch2, threshold=0.99, n_probe=3, shortlist=50
    ).collect()
    got2 = {(r["id_a"], r["id_b"]) for r in pairs2}
    b1 = {int(r["vec_id"]) for r in batch1.select("vec_id").collect()}
    assert all((p, p + 10_000_000) in got2 for p in b1)
    # idempotent code append: replaying batch 1 adds zero code rows
    n_codes = spark.read.parquet(path + "/codes").count()
    ann_index.add_to_pq_index(spark, path, batch1, if_absent=True)
    assert spark.read.parquet(path + "/codes").count() == n_codes
    # and a double-write WITHIN one batch dedupes too
    dup_batch = batch1.limit(1).unionByName(batch1.limit(1)).select(
        (F.col("vec_id") + 77_000_000).alias("vec_id"), "embedding"
    )
    ann_index.add_to_pq_index(spark, path, dup_batch, if_absent=True)
    assert spark.read.parquet(path + "/codes").count() == n_codes + 1
    ann_index.add_to_index(spark, path, dup_batch, if_absent=True)
    dup_id_rows = (
        spark.read.parquet(path + "/cells")
        .filter(F.col("vec_id") >= 77_000_000)
        .count()
    )
    assert dup_id_rows == 1


def test_pq_index_probe_matches_inmemory_composition(spark, sf_dir, index_path):
    """Persisted IVFPQ (codes cell-partitioned beside the inverted
    lists + codebook sidecar): the on-disk probe returns the IDENTICAL
    rows as the in-memory composition over the same quantizers, both
    heavy scans are partition-pruned, and the codebook sidecar
    round-trips exactly."""
    from data_engineering_project_spark.operators import pq

    emb = workload.load(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(index_path + "/centroids")
    books = pq.pq_train(emb, m=2, k=4, iters=1)
    ann_index.build_pq_index(spark, index_path, books)
    # sidecar round-trip: parquet doubles are exact
    back = ann_index.read_codebooks(spark, index_path)
    assert len(back) == len(books)
    for b_mem, b_disk in zip(books, back):
        assert sorted(map(tuple, b_mem.collect())) == sorted(
            map(tuple, b_disk.collect())
        )
    queries = emb.filter(F.col("vec_id") < 5)
    persisted = ann_index.query_pq_index(
        spark, index_path, queries, k=5, n_probe=3, shortlist=20
    )
    cells = similarity.assign_cells(emb, cents)
    enc = pq.pq_encode(emb, books)
    inmem = pq.ivfpq_topk(
        cells, enc, books, cents, queries, k=5, n_probe=3, shortlist=20
    )
    a = sorted(map(tuple, persisted.collect()))
    b = sorted(map(tuple, inmem.collect()))
    assert a == b and len(a) == 25
    # BOTH the codes scan and the vectors scan carry cell filters
    plan = persisted._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pruned_scans = sum(
        "cell" in seg.split("]")[0]
        for seg in plan.split("PartitionFilters")[1:]
    )
    assert pruned_scans >= 2, "codes and vectors scans must both prune"


def test_read_codebook_rows_matches_read_codebooks(spark, sf_dir, index_path):
    """r13: the single-collect sidecar read returns the same
    per-subspace (label, centroid) values as the m filtered-scan
    frames (float-exact — same files, same cells)."""
    from data_engineering_project_spark.operators import pq

    emb = workload.load(spark, sf_dir, "embeddings")
    books = pq.pq_train(emb, m=2, k=4, iters=1)
    ann_index.build_pq_index(spark, index_path, books)
    frames = ann_index.read_codebooks(spark, index_path)
    rows = ann_index.read_codebook_rows(spark, index_path)
    assert len(frames) == len(rows)
    for bf, br in zip(frames, rows):
        assert sorted(
            (r["label"], list(r["centroid"])) for r in bf.collect()
        ) == sorted((r["label"], list(r["centroid"])) for r in br)


def test_index_row_count_matches_scan_count(spark, sf_dir, index_path):
    """r14: the footer-summed row count equals a Spark count over the
    inverted lists, including after an append."""
    emb = workload.load(spark, sf_dir, "embeddings")
    want = spark.read.parquet(index_path + "/cells").count()
    assert ann_index.index_row_count(index_path) == want


def test_cent_rows_cache_invalidated_on_rebuild(spark, sf_dir, tmp_path):
    """r14: the frozen-centroid row cache must serve the REBUILT
    sidecar after build_index overwrites the same path."""
    path = str(tmp_path / "index")
    emb = workload.load(spark, sf_dir, "embeddings")
    ann_index.build_index(emb, path, k_cells=4, iters=1)
    first = {r["label"]: list(r["centroid"]) for r in ann_index._cent_rows(spark, path)}
    ann_index.build_index(emb, path, k_cells=8, iters=2)
    again = {r["label"]: list(r["centroid"]) for r in ann_index._cent_rows(spark, path)}
    disk = {
        r["label"]: list(r["centroid"])
        for r in spark.read.parquet(path + "/centroids").collect()
    }
    assert again == disk
    assert set(again) != set(first) or again != first
