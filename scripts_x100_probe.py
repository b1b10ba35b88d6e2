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

Run:  python scripts_x100_probe.py                (build + probe)
      SPARK_GRAFT_X100_SKIP_BUILD=1 ...           (reuse replica)
Timing-sensitive: run ALONE on the box, like bench.py.
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
]


def main() -> int:
    # reuse the ×10 replica builder with its env knobs pointed at ×100
    os.environ["SPARK_GRAFT_SCALE_K"] = str(K)
    os.environ["SPARK_GRAFT_X10_DIR"] = WORK
    import scripts_x10_bench as xb

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

    timings: dict[str, float] = {}
    for name in PROBE:
        spark.sparkContext._jvm.System.gc()
        start = time.perf_counter()
        force(workload.QUERIES[name](spark, WORK))
        timings[name] = round(time.perf_counter() - start, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

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
        rows[name] = {
            "sf0.1_sec": t1,
            "x10_sec": t10,
            "x100_sec": t100,
            "ratio_vs_sf0.1": r1,
            "ratio_vs_x10": r10,
            # same flag shape as SCALING_X10: super-linear iff growth
            # beats the data factor by >30% and the run is non-trivial
            "super_linear": bool(r1 and r1 > K * 1.3 and t100 > 5.0),
        }
    flagged = sorted(
        (n for n, r in rows.items() if r["super_linear"]),
        key=lambda n: -rows[n]["ratio_vs_sf0.1"],
    )
    out = {
        "k": K,
        "probe_total_sec": round(sum(timings.values()), 3),
        "n_probed": len(timings),
        "flagged_super_linear": flagged,
        "queries": rows,
    }
    with open(os.path.join(REPO, "SCALING_X100.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"probe_total": out["probe_total_sec"], "flagged": flagged}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
