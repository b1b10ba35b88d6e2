"""×100 scale rung (round-9 VERDICT item 5).

Every scaling claim so far is attested at ×10 (sf0.1 → sf1-ish).
This probe builds a ×100 replica (sf10-equivalent: ~60 M lineitem
rows, ~500 k docs, ~200 k vectors) with the same key-shift/salt scheme
as scripts_x10_bench.py and times the 30 most scale-interesting
families on it (the PROBE list below), writing SCALING_X100.json with
the same flag logic — one measured point per family supporting the
100 TB extrapolation instead of an argument.

The full registry is NOT swept at ×100 (that is the ×10 artifact's
job); the probe set covers: IVF/PQ ANN, the LSH/MinHash dedup family,
winnowing, the streaming drain, record linkage (both block keys), the
t-digest sketch, conformal + label-separation (the two most expensive
statistical entries), and two core anchors (pricing_summary,
sessionize) as linear references.

Round-10 hardening (r9 VERDICT items 2+3, ADVICE low #3):
- each family is timed SPARK_GRAFT_X100_RUNS times (default 3) and
  the MEDIAN carries the ratio/flag; per-family samples are recorded
  so the artifact shows its own spread (the committed r9 variance was
  x11-x28 on identical code — wider than most reported ratios).
- run_conditions (load averages, JVM census, wall) are stamped into
  SCALING_X100.json exactly like bench.py stamps BENCH_DETAIL.json.
- a family missing from the sf0.1 baseline can no longer be silently
  unflaggable: it gets "no_baseline": true and falls back to the
  ratio_vs_x10 > 10*1.3 flag.

Run:  python scripts_x100_probe.py                (build + probe)
      SPARK_GRAFT_X100_SKIP_BUILD=1 ...           (reuse replica)
      SPARK_GRAFT_X100_RUNS=1 ...                 (fast single-shot)
Timing-sensitive: run ALONE on the box, like bench.py.

Targeted reruns (round 11): a family whose median has not converged
(monotonically decaying samples, wide spread) can be re-measured alone
instead of paying the full 32-family sweep —
      SPARK_GRAFT_X100_ONLY=a,b ...      (time only these families;
          every other row is carried over from the committed artifact)
      SPARK_GRAFT_X100_SKIP_FAMILIES=1   (skip the timing loop)
      SPARK_GRAFT_X100_SKIP_RECALL=1     (skip the recall sections)
Carried-over rows keep their flags; the artifact records which
families the current run measured (run_conditions.measured_families)
so mixed provenance is visible, never silent.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
WORK = os.environ.get("SPARK_GRAFT_X100_DIR", "/tmp/spark_graft_x100")
K = 100

# sf10-equivalent intermediates (LSH band explosion, cluster edges)
# overflow the 8g default local-JVM heap; the probe box has 128 GiB —
# take a third of it unless the caller says otherwise. On a real
# cluster this is per-executor memory, not one shared local heap.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "40g")

PROBE = [
    # core anchors (linear references)
    "pricing_summary",
    "sessionize",
    # ANN family
    "ivf_recall_check",
    "ivfpq_recall",
    # dedup / fingerprint family (including the worst x10 ratios —
    # pair-growth families are exactly where a x100 point matters)
    "lsh_pairs_portable",
    "dedup_clusters_portable",
    "dedup_keep_list",
    "dedup_incremental_index",
    "jaccard_prefix_pairs",
    "ngram_jaccard_portable",
    "minhash_estimate_error",
    "heavy_hitter_tokens",
    "winnow_fingerprints",
    "embedding_similar_pairs",
    # streaming drain
    "streaming_sessionize_closed",
    # statistics (top-expensive entries, r8 VERDICT plan audit)
    "conformal_price_interval",
    "label_separation_score",
    # sketches + linkage (new r8/r9 families)
    "value_quantile_sketch",
    "customer_name_linkage",
    "part_phonetic_linkage",
    # second ring (r9 widening): one representative per remaining
    # scale-interesting family — exact global order statistics,
    # funnels/retention, SCD2, packing, sampling, text quality,
    # as-of join, OLAP rollup, reach sketch, fingerprints
    "running_monthly_revenue",
    "conversion_funnel",
    "dim_history_scd2",
    "pack_documents",
    "stratified_corpus_sample",
    "corpus_filter",
    "asof_purchase_view",
    "revenue_rollup",
    "reach_rollup_sketch",
    "month_fingerprints",
    # late r9: trained-BPE (distributed count + Arrow encode)
    "bpe_fertility_audit",
    # r10: production-shaped trainer — the top_k-capped dictionary
    # bounds training and encode, so the x100 cost should be the
    # count scan alone (a flat-cost demonstration, not an assumption)
    "bpe_vocab_train",
    # r11: the composed IVFPQ shortlist->re-rank audit, the
    # persisted-index nightly near-dup loop (index build + zero-refit
    # probe + in-memory parity twin), and the PNG decode pipeline
    # (per-doc encode+decode in the Arrow kernel — cost must stay
    # linear in docs)
    "ivfpq_rerank_recall",
    "embedding_near_dups_indexed",
    "media_decode_png",
    # late r11: the streaming near-dup drain (two AvailableNow streams
    # + index fold per call) and the persisted-IVFPQ parity audit
    # (pq-encode + partitioned write + on-disk vs in-memory probe)
    "streaming_near_dups",
    "ivfpq_index_parity",
    # r12: semantic dedup over the persisted PQ codes (ADC shortlist
    # from pruned code directories + exact re-rank + exact-loop
    # parity audit inside the entry)
    "pq_near_dups_incremental",
    # r12: layout operators — the Morton-key pruning audit (two
    # full-scan aggregates over 60 M lineitem rows; cost must stay
    # linear in rows) and the bucketed co-located join (one-time
    # bucketed CTAS of orders+lineitem, then the shuffle-free merge
    # join + aggregate)
    "zorder_pruning_audit",
    "bucketed_colocated_join",
    # r12: month-partitioned fact CTAS + DPP join (the partitioned
    # write dominates; the pruned read must stay ~quarter-sized)
    "dynamic_partition_pruning_join",
    # r13: the 3-D Morton pruning audit (three-dim scaling + 30-bit
    # interleave over the full lineitem, two 64-group aggregates) and
    # the bucketed point lookup (shares the bucketed CTAS with
    # bucketed_colocated_join; the lookup itself must stay
    # bucket-sized regardless of corpus growth)
    "zorder3_pruning_audit",
    "bucketed_point_lookup",
]


def _measure_recall(spark) -> tuple[dict, dict]:
    """Sections (1)/(1b)/(2): ANN substitution for the quadratic
    exact join, planted near-dup recall, and IVF/PQ/composed-rerank
    recall@5 — returns (ann_substitution, ann_recall_at_5)."""
    # ---- recall at x100 (r9 VERDICT items 1 + 3) -------------------
    # Speed ratios alone don't justify the ANN substitution for the
    # flagged exact join — the accuracy the speed buys must be a
    # measured number at this rung, not an sf0.1 extrapolation.
    from pyspark.sql import functions as Fn

    from data_engineering_project_spark.operators import pq as pq_ops
    from data_engineering_project_spark.operators import similarity

    emb = spark.read.parquet(f"{WORK}/embeddings.parquet")
    n_vec = emb.count()

    # (1) the ANN substitution for embedding_similar_pairs: same
    # question (pairs above cosine 0.35), IVF-cell blocking with
    # nlist scaled to the corpus (constant cell population).
    sub: dict = {"n_vectors": n_vec, "threshold": 0.35}
    t0 = time.perf_counter()
    exact = similarity.embedding_near_dups(
        emb, threshold=0.35, max_block_rows=100_000
    ).localCheckpoint(eager=True)
    sub["exact_pairs"] = exact.count()
    sub["exact_sec"] = round(time.perf_counter() - t0, 1)
    nlist = max(16, n_vec // 1000)
    t0 = time.perf_counter()
    ann = similarity.embedding_near_dups_ann(
        emb, threshold=0.35, nlist=nlist, n_probe=4, iters=2,
        max_block_rows=100_000,
    ).localCheckpoint(eager=True)
    sub["ann_pairs_total"] = ann.count()
    sub["ann_sec"] = round(time.perf_counter() - t0, 1)
    sub["nlist"] = nlist
    sub["n_probe"] = 4
    lab = emb.select("vec_id", "label")
    ann_sl = (
        ann.join(lab.select(Fn.col("vec_id").alias("id_a"), Fn.col("label").alias("la")), "id_a")
        .join(lab.select(Fn.col("vec_id").alias("id_b"), Fn.col("label").alias("lb")), "id_b")
        .filter(Fn.col("la") == Fn.col("lb"))
        .select("id_a", "id_b")
    ).localCheckpoint(eager=True)
    n_common = exact.join(ann_sl, ["id_a", "id_b"], "left_semi").count()
    sub["spurious_same_label"] = ann_sl.join(
        exact, ["id_a", "id_b"], "left_anti"
    ).count()
    sub["recall_vs_exact"] = round(n_common / max(sub["exact_pairs"], 1), 4)
    # Context the number needs: at threshold 0.35 the exact OUTPUT
    # itself grows ~quadratically (hundreds of pairs at sf0.1 ->
    # millions here for x100 data), so the 0.35 join is a dense
    # weak-similarity question — no sub-quadratic method answers it
    # with high recall; the ANN operator's production contract is the
    # NEAR-DUP regime measured below with planted duplicates at 0.99.
    # The sf0.1 output count is measured live (seconds), not quoted.
    emb_base = spark.read.parquet(
        os.path.join(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "embeddings.parquet",
        )
    )
    n_base_pairs = similarity.embedding_near_dups(
        emb_base, threshold=0.35, max_block_rows=100_000
    ).count()
    sub["exact_pairs_sf0.1"] = n_base_pairs
    sub["output_growth_vs_data_x100"] = round(
        sub["exact_pairs"] / max(n_base_pairs, 1) / 100, 1
    )
    print(f"ann_substitution: {sub}", file=sys.stderr)

    # (1b) the near-dup regime at x100: plant deterministic
    # near-duplicates (1 exact copy + 1 ±0.5% perturbed copy per
    # source vector) and measure planted-pair recall at threshold
    # 0.99 with the SAME scaled quantizer settings — the regime where
    # constant cell population holds recall, because near-identical
    # vectors share their nearest cells.
    src = (
        emb.filter(Fn.col("vec_id") % 97 == 0)
        .orderBy("vec_id")
        .limit(1000)
        .select("vec_id", "label", "embedding")
        .localCheckpoint(eager=True)
    )
    copy_exact = src.select(
        (Fn.col("vec_id") + 1_000_000_000).alias("vec_id"), "label", "embedding"
    )
    copy_pert = src.select(
        (Fn.col("vec_id") + 2_000_000_000).alias("vec_id"),
        "label",
        Fn.expr(
            "transform(embedding, (x, i) -> x * CAST(1.0 + 0.005 *"
            " IF(pmod(xxhash64(concat(CAST(vec_id AS STRING), ':',"
            " CAST(i AS STRING))), 2) = 0, 1.0, -1.0) AS FLOAT))"
        ).alias("embedding"),
    )
    planted_corpus = emb.select("vec_id", "label", "embedding").unionByName(
        copy_exact
    ).unionByName(copy_pert)
    t0 = time.perf_counter()
    ann_nd = similarity.embedding_near_dups_ann(
        planted_corpus, threshold=0.99, nlist=nlist, n_probe=4, iters=2,
        max_block_rows=100_000,
    ).localCheckpoint(eager=True)
    nd_sec = round(time.perf_counter() - t0, 1)
    src_ids = {r["vec_id"] for r in src.select("vec_id").collect()}
    expected = set()
    for v in src_ids:
        expected.add((v, v + 1_000_000_000))
        expected.add((v, v + 2_000_000_000))
        expected.add((v + 1_000_000_000, v + 2_000_000_000))
    got = {
        (r["id_a"], r["id_b"])
        for r in ann_nd.filter(
            Fn.col("id_b") >= 1_000_000_000
        ).collect()
    }
    sub["near_dup_regime"] = {
        "threshold": 0.99,
        "planted_pairs": len(expected),
        "recovered": len(expected & got),
        "recall": round(len(expected & got) / len(expected), 4),
        # counts extra pairs WITHIN the planted-id range only (id_b >=
        # 1e9) — base-corpus near-dup pairs at 0.99 are legitimate
        # output and deliberately not in scope; named for what is
        # measured (ADVICE r10)
        "planted_range_extra_pairs": len(got - expected),
        "sec": nd_sec,
        "nlist": nlist,
        "n_probe": 4,
    }
    print(f"near_dup_regime: {sub['near_dup_regime']}", file=sys.stderr)

    # (2) IVF recall@5 with the sf0.1 tuning and one retuned setting,
    # and IVFPQ (composed) recall@5 at the sf0.1 tuning — against the
    # exact brute-force top-5 of the 10-query gate set.
    queries = emb.filter(Fn.col("vec_id") < 10)
    exact5 = similarity.cosine_topk(emb, queries, k=5).localCheckpoint(eager=True)
    ann_recall: dict = {}
    for tag, (nl, np_) in {
        "ivf_sf0.1_tuned": (16, 4),
        "ivf_retuned": (64, 8),
    }.items():
        t0 = time.perf_counter()
        cents = similarity.kmeans_fit(emb, k=nl, iters=2)
        approx = similarity.ivf_topk(
            emb, queries, cents, k=5, n_probe=np_
        ).localCheckpoint(eager=True)
        secs = round(time.perf_counter() - t0, 1)
        hits = approx.join(
            exact5.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        ann_recall[tag] = {
            "nlist": nl, "n_probe": np_,
            "recall_at_5": round(hits / 50.0, 3), "sec_incl_fit": secs,
        }
        print(f"{tag}: {ann_recall[tag]}", file=sys.stderr)
    t0 = time.perf_counter()
    books = pq_ops.pq_train(emb, m=4, k=16, iters=1)
    cents16 = similarity.kmeans_fit(emb, k=16, iters=2)
    cells = similarity.assign_cells(emb, cents16)
    probes = similarity.probe_assignments(
        queries, cents16, n_probe=4
    ).localCheckpoint(eager=True)
    cands = cells.select("vec_id", "cell").join(
        probes.select("query_id", "cell"), "cell"
    ).select("query_id", "vec_id")
    enc = pq_ops.pq_encode(emb, books)
    adc = pq_ops.pq_adc_topk(
        enc, books, queries.select("vec_id", "embedding").toPandas(),
        k=5, candidates=cands,
    ).localCheckpoint(eager=True)
    secs = round(time.perf_counter() - t0, 1)
    hits = adc.join(
        exact5.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    ann_recall["ivfpq_sf0.1_tuned"] = {
        "nlist": 16, "n_probe": 4, "m": 4, "k_sub": 16,
        "recall_at_5": round(hits / 50.0, 3), "sec_incl_fit": secs,
    }
    print(f"ivfpq: {ann_recall['ivfpq_sf0.1_tuned']}", file=sys.stderr)
    # retuned PQ: 16 codewords/subspace cannot rank 200k near-random
    # vectors at k=5 — the production response is a bigger codebook
    # (m=8 x k=64 = 48 bits/vector), measured here as the
    # recall/latency trade beside the sf0.1 tuning.
    t0 = time.perf_counter()
    books8 = pq_ops.pq_train(emb, m=8, k=64, iters=1)
    enc8 = pq_ops.pq_encode(emb, books8)
    adc8 = pq_ops.pq_adc_topk(
        enc8, books8, queries.select("vec_id", "embedding").toPandas(),
        k=5, candidates=cands,
    ).localCheckpoint(eager=True)
    secs = round(time.perf_counter() - t0, 1)
    hits = adc8.join(
        exact5.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    ann_recall["ivfpq_retuned"] = {
        "nlist": 16, "n_probe": 4, "m": 8, "k_sub": 64,
        "recall_at_5": round(hits / 50.0, 3), "sec_incl_fit": secs,
    }
    print(f"ivfpq_retuned: {ann_recall['ivfpq_retuned']}", file=sys.stderr)
    # the PRODUCTION composition (r10 VERDICT item 1): ADC shortlist ->
    # exact re-rank (pq_ops.ivfpq_topk). Bare ADC recall above is the
    # honest number for PQ codes alone; these rows are the number a
    # real deployment gets. Recall is a SHORTLIST-BUDGET dial at flat
    # latency (the ADC pass dominates; exact re-rank of |queries| x
    # shortlist rows is trivial), so the tuned codebooks sweep the
    # dial up to the IVF probe ceiling; the retuned codebooks carry
    # one point (their 8-fit cost dominates, recall matches tuned).
    for tag, (bks, encoding, m_, ks_, sls) in {
        "ivfpq_rerank_sf0.1_tuned": (books, enc, 4, 16, (50, 1000, 5000)),
        "ivfpq_rerank_retuned": (books8, enc8, 8, 64, (50,)),
    }.items():
        for sl in sls:
            t0 = time.perf_counter()
            composed = pq_ops.ivfpq_topk(
                cells, encoding, bks, cents16, queries,
                k=5, n_probe=4, shortlist=sl,
            ).localCheckpoint(eager=True)
            secs = round(time.perf_counter() - t0, 1)
            hits = composed.join(
                exact5.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
                "left_semi",
            ).count()
            key = tag if len(sls) == 1 else f"{tag}_sl{sl}"
            ann_recall[key] = {
                "nlist": 16, "n_probe": 4, "m": m_, "k_sub": ks_,
                "shortlist": sl,
                "recall_at_5": round(hits / 50.0, 3), "sec": secs,
            }
            print(f"{key}: {ann_recall[key]}", file=sys.stderr)
    return sub, ann_recall


def main() -> int:
    # reuse the ×10 replica builder with its env knobs pointed at ×100
    os.environ["SPARK_GRAFT_SCALE_K"] = str(K)
    os.environ["SPARK_GRAFT_X10_DIR"] = WORK
    import scripts_x10_bench as xb

    # same host-state snapshot bench.py stamps into BENCH_DETAIL —
    # the x100 artifact supports the headline 100 TB claim, so it
    # carries the strongest (not weakest) measurement protocol.
    import bench as bench_mod

    probe_started = time.time()
    conditions = bench_mod._run_conditions(probe_started)
    runs = max(1, int(os.environ.get("SPARK_GRAFT_X100_RUNS", "3")))
    conditions["n_runs_per_family"] = runs

    only = [
        s for s in os.environ.get("SPARK_GRAFT_X100_ONLY", "").split(",") if s
    ]
    skip_recall = bool(os.environ.get("SPARK_GRAFT_X100_SKIP_RECALL"))
    probe_list = [n for n in PROBE if not only or n in only]
    if os.environ.get("SPARK_GRAFT_X100_SKIP_FAMILIES"):
        probe_list = []
    unknown = [n for n in only if n not in PROBE]
    if unknown:
        print(f"unknown X100_ONLY families: {unknown}", file=sys.stderr)
        return 1
    partial = bool(only) or not probe_list or skip_recall
    out_path = os.path.join(REPO, "SCALING_X100.json")
    prev: dict = {}
    if partial:
        if not os.path.exists(out_path):
            print("partial rerun needs an existing SCALING_X100.json", file=sys.stderr)
            return 1
        prev = json.load(open(out_path))
    conditions["measured_families"] = sorted(probe_list)
    conditions["measured_recall_sections"] = not skip_recall
    if partial and prev.get("run_conditions"):
        # one level only — a chain of partial reruns would otherwise
        # nest conditions recursively without bound
        carried = dict(prev["run_conditions"])
        carried.pop("carried_over_run_conditions", None)
        conditions["carried_over_run_conditions"] = carried

    from data_engineering_project_spark.plans import workload
    from data_engineering_project_spark.session import get_spark

    spark = get_spark("x100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.environ.get("SPARK_GRAFT_X100_SKIP_BUILD"):
        xb.build_replica(spark)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # same warmups as bench.py: codegen path + Python/Arrow worker pool
    force(workload.QUERIES["pricing_summary"](spark, WORK))
    force(
        spark.range(1024)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 32))
        .mapInPandas(lambda it: it, "id long")
    )

    from data_engineering_project_spark.operators.similarity import (
        BlockSizeExceeded,
    )

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    first_run: dict[str, float] = {}
    guard_trips: dict[str, str] = {}
    for name in probe_list:
        per_run = []
        for _ in range(runs):
            # drop Python-side refs to the previous run's frames FIRST:
            # localCheckpoint blocks (e.g. conformal's 60M-row split
            # table at x100) are only releasable by the JVM cleaner
            # once py4j finalizers run, and letting them pile up across
            # repeat runs is exactly the monotone-then-spike variance
            # the r11 verdict flagged on conformal_price_interval
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
            start = time.perf_counter()
            try:
                force(workload.QUERIES[name](spark, WORK))
            except BlockSizeExceeded as exc:
                # the entry REFUSED the quadratic work (r14 guard):
                # record the refusal verbatim — the adjudication is
                # the guard message + the measured ann_substitution
                # section, not a silent absence
                guard_trips[name] = str(exc)[:400]
                break
            per_run.append(round(time.perf_counter() - start, 3))
        if name in guard_trips:
            print(
                f"{name}: guard tripped — {guard_trips[name][:120]}",
                file=sys.stderr,
            )
            continue
        # samples stay CHRONOLOGICAL: entries that persist state
        # (streaming txlog drain, incremental index) are near-no-ops
        # on repeat runs — the 1st-vs-rest pattern must stay visible,
        # and the first run is the honest comparable to the
        # single-shot sf0.1 baseline for those families.
        samples[name] = list(per_run)
        first_run[name] = per_run[0]
        timings[name] = sorted(per_run)[len(per_run) // 2]  # median flags
        print(
            f"{name}: median {timings[name]}s of {per_run}", file=sys.stderr
        )

    base = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    x10_path = os.path.join(
        os.environ.get("SPARK_GRAFT_X10_REF_DIR", "/tmp/spark_graft_x10"),
        "BENCH_DETAIL_X10.json",
    )
    x10 = json.load(open(x10_path)) if os.path.exists(x10_path) else {"queries": {}}

    rows = {}
    for name, t100 in timings.items():
        t1 = base["queries"].get(name)
        t10 = x10["queries"].get(name)
        r1 = round(t100 / t1, 2) if t1 else None
        r10 = round(t100 / t10, 2) if t10 else None
        # same flag shape as SCALING_X10: super-linear iff growth
        # beats the data factor by >30% and the run is non-trivial.
        # A family absent from the sf0.1 baseline is NOT silently
        # unflaggable (ADVICE r9): it is marked no_baseline and the
        # flag falls back to the x10-rung ratio (x10 -> x100 is a
        # 10x data factor, so >13 is the same +30% tolerance).
        # The rung ratio is consulted even WITH a baseline (r12
        # verdict item 3): accelerating growth — e.g. x3 at the first
        # 10x rung, x33 at the second — must not hide under a total
        # that stays within x130 of sf0.1.
        exceeds_total = r1 is not None and r1 > K * 1.3
        exceeds_rung = r10 is not None and r10 > 10 * 1.3
        flag = bool((exceeds_total or exceeds_rung) and t100 > 5.0)
        fr = first_run[name]
        rows[name] = {
            "sf0.1_sec": t1,
            "x10_sec": t10,
            "x100_sec": t100,
            "x100_first_run_sec": fr,
            "x100_samples": samples[name],
            "ratio_vs_sf0.1": r1,
            # first-run ratio: the honest number for families whose
            # repeat runs hit persisted state (samples show the
            # 1st-vs-rest cliff); for everyone else it is the
            # coldest-cache sample.
            "ratio_vs_sf0.1_first_run": round(fr / t1, 2) if t1 else None,
            "ratio_vs_x10": r10,
            "no_baseline": r1 is None,
            "super_linear": flag,
        }
    for name, msg in guard_trips.items():
        rows[name] = {
            "sf0.1_sec": base["queries"].get(name),
            "x10_sec": x10["queries"].get(name),
            "x100_sec": None,
            "guard_tripped": msg,
            "no_baseline": base["queries"].get(name) is None,
            # the entry fails loudly above its stated pair-work budget
            # and routes to the measured ANN substitute — the
            # quadratic regime is refused by code, not hidden by the
            # probe (the census cost itself is measured in
            # ann_substitution.exact_sec)
            "super_linear": False,
        }
    # merge: rows not re-measured this run carry over verbatim from
    # the committed artifact (flags included)
    rows = {**prev.get("queries", {}), **rows}
    flagged = sorted(
        (n for n, r in rows.items() if r["super_linear"]),
        key=lambda n: -(rows[n]["ratio_vs_sf0.1"] or rows[n]["ratio_vs_x10"] or 0),
    )

    if skip_recall:
        sub = prev.get("ann_substitution") or {}
        ann_recall = prev.get("ann_recall_at_5") or {}
    else:
        sub, ann_recall = _measure_recall(spark)
    # optional: the codes-path vs vector-path comparison at the x100
    # rung (200k vectors — the regime where the byte ratio should
    # start buying wall-clock, unlike the x10 rung where ADC setup
    # dominates). SPARK_GRAFT_X100_PQ_BYTES=1 measures; otherwise the
    # committed section carries over.
    if os.environ.get("SPARK_GRAFT_X100_PQ_BYTES"):
        pq_bytes = xb._pq_bytes_comparison()
    else:
        pq_bytes = prev.get("pq_codes_bytes_comparison") or {}
        if not pq_bytes and os.path.exists(out_path):
            # full (non-partial) reruns never load `prev` — don't let
            # them silently blank a measured section
            pq_bytes = json.load(open(out_path)).get(
                "pq_codes_bytes_comparison"
            ) or {}
    no_baseline = sorted(n for n, r in rows.items() if r["no_baseline"])
    try:
        end_la = os.getloadavg()[0]
    except OSError:
        end_la = None
    conditions["wall_sec"] = round(time.time() - probe_started, 1)
    conditions["load_avg_1m_end"] = end_la
    out = {
        "k": K,
        "probe_total_sec": round(
            sum(
                r["x100_sec"]
                for r in rows.values()
                if r["x100_sec"] is not None
            ),
            3,
        ),
        "n_probed": len(rows),
        "flagged_super_linear": flagged,
        "guarded_families": sorted(
            n for n, r in rows.items() if r.get("guard_tripped")
        ),
        "no_baseline_families": no_baseline,
        "ann_substitution": sub,
        "ann_recall_at_5": ann_recall,
        "pq_codes_bytes_comparison": pq_bytes,
        "run_conditions": conditions,
        "queries": rows,
    }
    with open(os.path.join(REPO, "SCALING_X100.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"probe_total": out["probe_total_sec"], "flagged": flagged}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
