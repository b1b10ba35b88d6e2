"""Serving workload at scale (round-9 VERDICT item 4).

The reference's implicit performance bound is "7 dashboard queries
interactive on one machine"; BENCH_DETAIL attests 4.8 s total at
sf0.1. This script closes the last reference-parity extrapolation by
running the SAME serving suite (bench.serving_suite — one shared
definition, so the rungs measure exactly what the baseline comparison
measures) against gold tables materialized from the ×10 and ×100
replicas, and committing the totals to SERVING_SCALE.json.

Method per rung:
- reuse (or build) the key-shifted replica from scripts_x10_bench /
  scripts_x100_probe (same generators, same WORK dirs),
- materialize the gold star schema from it (the nightly-CTAS shape —
  serving reads gold, never raw),
- time gold_build + each serving query (same GC hygiene as bench.py).

Dims stay broadcast at every rung (customer/part dims grow linearly
but remain MB-scale at ×100); the fact table carries the growth, so
sub-linear serving ratios here demonstrate the broadcast-star design
rather than assume it.

Run:  python scripts_serving_scale.py            (both rungs)
      SPARK_GRAFT_SERVING_RUNGS=10 ...           (subset, csv of Ks)
Timing-sensitive: run ALONE on the box, like bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))

RUNG_DIRS = {
    10: os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/spark_graft_x10"),
    100: os.environ.get("SPARK_GRAFT_X100_DIR", "/tmp/spark_graft_x100"),
}

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "40g")


def _ensure_replica(spark, k: int, work: str) -> None:
    if os.path.exists(os.path.join(work, "lineitem.parquet")):
        return
    os.environ["SPARK_GRAFT_SCALE_K"] = str(k)
    os.environ["SPARK_GRAFT_X10_DIR"] = work
    import importlib

    import scripts_x10_bench as xb

    importlib.reload(xb)  # module-level K/WORK read env at import
    xb.build_replica(spark)


def main() -> int:
    import bench as bench_mod
    from data_engineering_project_spark.plans import workload
    from data_engineering_project_spark.session import get_spark

    rungs = [
        int(k)
        for k in os.environ.get("SPARK_GRAFT_SERVING_RUNGS", "10,100").split(",")
    ]
    started = time.time()
    conditions = bench_mod._run_conditions(started)
    spark = get_spark("serving-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # same warmups as bench.py
    force(workload.QUERIES["kpis"](spark, "/root/testdata/sf0.1"))

    out_rungs = {}
    for k in rungs:
        work = RUNG_DIRS[k]
        _ensure_replica(spark, k, work)
        gold_dir = tempfile.mkdtemp(prefix=f"serving_gold_x{k}_")
        timings: dict[str, float] = {}
        try:
            start = time.perf_counter()
            for name, df in workload.gold(spark, work).items():
                df.write.mode("overwrite").parquet(os.path.join(gold_dir, name))
            timings["gold_build"] = round(time.perf_counter() - start, 3)
            fact = spark.read.parquet(os.path.join(gold_dir, "fact_sales"))
            dim_c = spark.read.parquet(os.path.join(gold_dir, "dim_customers"))
            dim_p = spark.read.parquet(os.path.join(gold_dir, "dim_products"))
            n_fact = fact.count()
            for name, fn in bench_mod.serving_suite(fact, dim_c, dim_p).items():
                spark.sparkContext._jvm.System.gc()
                start = time.perf_counter()
                force(fn())
                timings[name] = round(time.perf_counter() - start, 3)
        finally:
            shutil.rmtree(gold_dir, ignore_errors=True)
        q = {n: t for n, t in timings.items() if n != "gold_build"}
        out_rungs[f"x{k}"] = {
            "fact_rows": n_fact,
            "gold_build_sec": timings["gold_build"],
            "serving_total_sec": round(sum(q.values()), 3),
            "serving_max_sec": max(q.values()),
            "queries": timings,
        }
        print(f"x{k}: serving {out_rungs[f'x{k}']['serving_total_sec']}s "
              f"(max {out_rungs[f'x{k}']['serving_max_sec']}s, "
              f"{n_fact} fact rows)", file=sys.stderr)

    # sf0.1 baseline for the ratio column comes from the committed bench
    base = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    base_q = {
        n: base["queries"][n]
        for n in next(iter(out_rungs.values()))["queries"]
        if n in base["queries"]
    }
    try:
        end_la = os.getloadavg()[0]
    except OSError:
        end_la = None
    conditions["wall_sec"] = round(time.time() - started, 1)
    conditions["load_avg_1m_end"] = end_la
    out = {
        "suite": "dashboard serving (bench.serving_suite) over materialized gold",
        "sf0.1_baseline": {
            "serving_total_sec": round(
                sum(v for n, v in base_q.items() if n != "gold_build"), 3
            ),
            "queries": base_q,
        },
        "rungs": out_rungs,
        "run_conditions": conditions,
    }
    with open(os.path.join(REPO, "SERVING_SCALE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v["serving_total_sec"] for k, v in out_rungs.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
