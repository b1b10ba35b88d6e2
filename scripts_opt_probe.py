"""Per-query timing probe for the optimization rounds.

Times named registry queries standalone, N samples each, through the
same noop sink + session warmup as bench.py — but isolated from the
303-query sweep so a before/after comparison is not at the mercy of
whole-suite box noise (the host shows ~4-5% CPU steal; single full-bench
totals swing ±20%).

Sample 1 of a family's first query includes any session-shared fixture
build (index writes, _shared_frame checkpoints) exactly like the bench
sweep's first family member; later samples measure the steady state.
Report ALL samples — the before/after evidence in OPTIMIZATION_r13.md
quotes sample lists, not just medians.

Usage: python scripts_opt_probe.py [-n N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

from data_engineering_project_spark.plans import workload
from data_engineering_project_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if not args:
        print("usage: scripts_opt_probe.py [-n N] query [query ...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # same warmup as bench.py: codegen + the Python worker pool
    force(workload.QUERIES["kpis"](spark, sf_dir))
    force(
        spark.range(1024)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 32))
        .mapInPandas(lambda it: it, "id long")
    )

    out = {}
    for name in args:
        fn = workload.QUERIES.get(name)
        if fn is None:
            print(f"{name}: UNKNOWN", file=sys.stderr)
            continue
        samples = []
        for _ in range(n):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = samples
        print(f"{name:40s} {samples}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
