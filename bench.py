"""Benchmark harness — one JSON line to stdout.

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is forced
end-to-end with the noop sink (full computation, no driver collect
cost). Prints:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from data_engineering_project_spark.plans import workload
from data_engineering_project_spark.session import get_spark

# The serving workload (the reference's 7 dashboard queries), the gold
# build itself, and the heavier beyond-reference operators.
BENCH_QUERIES = [
    "kpis",
    "top_categories",
    "orders_by_state",
    "delivery_days_by_state",
    "freight_by_state",
    "monthly_trend",
    "weekday_seasonality",
    "star_fact_sales",
    "top_parts_per_brand",
    "dedup_exact",
    "text_stats",
    "token_count_by_lang",
    "events_daily",
    "events_json",
    "sessionize",
    "cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths so per-query numbers measure the plan,
    # not first-call class loading.
    workload.QUERIES["kpis"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = workload.QUERIES[name]
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "workload_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
