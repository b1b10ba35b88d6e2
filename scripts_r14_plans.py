"""Capture .explain('formatted') for named queries into plans/r14/.

Usage: python scripts_r14_plans.py before|after query [query ...]

Writes plans/r14/<query>_<tag>.txt. Parity/audit-style queries do their
heavy work in builder-internal actions; for those the declared frame's
plan is still captured (it is what the driver runs), and operator-level
plans are captured separately where OPTIMIZATION_r14.md says so.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_project_spark.plans import workload
from data_engineering_project_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r14-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = workload.QUERIES.get(name)
        if fn is None:
            print(f"{name}: UNKNOWN", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
