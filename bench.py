"""Benchmark harness — one JSON line to stdout.

Mirrors the reference architecture (SURVEY.md §4.1: gold is materialized
once nightly; the dashboard serves from gold):

- ``gold_build``: silver+gold star schema built from raw and
  materialized to parquet (the pipeline cost).
- serving queries: the reference's 7-query dashboard workload + ranking
  and percentile queries, over the **materialized** gold tables.
- extension queries: the beyond-reference operators (dedup, similarity,
  text analysis, sessionization, as-of), from raw tables.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Every query is forced end-to-end with the
noop sink (full computation, no driver collect cost). Output:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...headline-query sec...}, "sf": ...}

STDOUT CONTRACT: exactly ONE line of JSON. Round 2's full ~95-query
timing dict inflated the line past the capturing harness's limit
(BENCH_r02.json: parsed null), so the stdout line now carries only the
headline queries; the COMPLETE per-query dict (the full regression
surface) is written to BENCH_DETAIL.json at the repo root each run.
While queries execute, sys.stdout is pointed at stderr so no library
print can corrupt the contract line.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from data_engineering_project_spark.plans import analytics, workload
from data_engineering_project_spark.session import get_spark

# The dashboard workload is benched from the MATERIALIZED gold tables
# (the reference serves from gold, not raw) — these names are timed in
# the serving section below, so their raw-table registry twins are
# excluded from the extension sweep.
SERVING_COVERED = {
    "kpis",
    "top_categories",
    "orders_by_state",
    "delivery_days_by_state",
    "freight_by_state",
    "monthly_trend",
    "weekday_seasonality",
    "delivery_percentiles",
}

# Every registered query gets a per-round timing (regressions are
# invisible for unbenched queries) — new registrations are picked up
# automatically, in registration order.
EXTENSION_QUERIES = [n for n in workload.QUERIES if n not in SERVING_COVERED]

# The stdout contract line stays compact (see module docstring): total +
# these headline timings. One representative per family — pipeline
# build, dashboard serving, TPC-H shape, JSON/sessionize, dedup (both
# hash families), similarity, sketch rollup, SCD2, packing.
HEADLINE = [
    "gold_build",
    "kpis",
    "top_categories",
    "monthly_trend",
    "delivery_percentiles",
    "pricing_summary",
    "events_json",
    "sessionize",
    "cosine_topk_fast",
    "minhash_portable",
    "minhash_lsh_pairs",
    "dedup_incremental_index",
    "split_contamination",
    "pack_documents",
    "events_reach_approx",
    "reach_rollup_sketch",
    "snapshot_diff",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def serving_suite(fact, dim_c, dim_p) -> dict:
    """The dashboard serving workload over materialized gold tables —
    name -> thunk. ONE definition shared by the sf0.1 bench below and
    scripts_serving_scale.py's ×10/×100 rungs, so the scale artifact
    measures exactly the suite the baseline comparison uses."""
    return {
        "kpis": lambda: analytics.kpis(fact, dim_c),
        "top_categories": lambda: analytics.top_categories(fact, dim_p, dim_c),
        "orders_by_state": lambda: analytics.orders_by_state(fact, dim_c),
        "delivery_days_by_state": lambda: analytics.delivery_days_by_state(fact, dim_c),
        "freight_by_state": lambda: analytics.freight_by_state(fact, dim_c),
        "monthly_trend": lambda: analytics.monthly_trend(fact, dim_c),
        "weekday_seasonality": lambda: analytics.weekday_seasonality(fact, dim_c),
        "state_filtered_kpis": lambda: analytics.kpis(
            fact, dim_c, states=["BUILDING", "MACHINERY"]
        ),
        "delivery_percentiles": lambda: fact.join(F.broadcast(dim_c), "customer_id")
        .groupBy("customer_state")
        .agg(
            F.round(F.expr("percentile(delivery_time_days, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(delivery_time_days, 0.9)"), 4).alias("p90"),
        ),
    }


def _java_pids() -> list[int]:
    """PIDs of running JVMs — competing Spark sessions are the known
    confounder for wall-clock totals on this box (r7/r8 'drift')."""
    pids = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/comm") as fh:
                comm = fh.read().strip()
        except OSError:
            continue
        if comm == "java":
            pids.append(int(p))
    return pids


def _run_conditions(started: float) -> dict:
    """Host-state snapshot taken at bench START — recorded so the
    artifact adjudicates noise-vs-regression itself instead of a
    PARITY.md narrative (r8 VERDICT item 2). load_avg is captured
    before our own Spark JVM ramps, so nonzero load + foreign JVMs
    mean a contended window."""
    try:
        la = os.getloadavg()
    except OSError:
        la = (None, None, None)
    return {
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(started)),
        "load_avg_1m": la[0],
        "load_avg_5m": la[1],
        "load_avg_15m": la[2],
        "cpu_count": os.cpu_count(),
        "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "preexisting_jvms": len(_java_pids()),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Guard the one-line stdout contract: while queries run, any stray
    # print (Spark, libraries, our own code) lands on stderr.
    contract_out = sys.stdout
    sys.stdout = sys.stderr
    bench_started = time.time()
    conditions = _run_conditions(bench_started)  # BEFORE our JVM ramps
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Local-mode scan parallelism: the sf0.1 tables are single ~30 MB
    # parquet files, which the default 128 MB split reads in ≤3 tasks on
    # 32 cores. 16 MB splits ≈25-30% faster here. A cluster reading real
    # multi-TB tables keeps the 128 MB default (session.py) — this knob
    # compensates for small benchmark files, not a scale setting.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    timings: dict[str, float] = {}

    # Warm the JVM/codegen paths so numbers measure plans, not class loading.
    _force(workload.QUERIES["kpis"](spark, sf_dir))
    # Warm the Python/Arrow worker pool too: mapInPandas spawns workers
    # lazily and the first spawn costs ~2-3s of interpreter startup
    # (measured: cosine_topk_fast 3.4s cold vs 0.5s warm at sf0.1).
    # That's process bring-up, not plan execution — a long-lived cluster
    # pays it once at provisioning, so the bench shouldn't charge it to
    # whichever Pandas-path query happens to run first.
    _force(
        spark.range(1024)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 32))
        .mapInPandas(lambda it: it, "id long")
    )

    # --- pipeline: materialize the gold star schema (reference: nightly CTAS)
    gold_dir = tempfile.mkdtemp(prefix="bench_gold_")
    try:
        # The four tables are independent sinks; submitting them as
        # concurrent Spark jobs lets the tiny dim writes ride along
        # with the fact build instead of serializing four job setups
        # (measured ~4s → ~1s at sf0.1; same win on a cluster, where
        # the scheduler interleaves stages across executors).
        start = time.perf_counter()
        with ThreadPoolExecutor(max_workers=4) as pool:
            list(
                pool.map(
                    lambda kv: kv[1]
                    .write.mode("overwrite")
                    .parquet(os.path.join(gold_dir, kv[0])),
                    workload.gold(spark, sf_dir).items(),
                )
            )
        timings["gold_build"] = round(time.perf_counter() - start, 3)

        fact = spark.read.parquet(os.path.join(gold_dir, "fact_sales"))
        dim_c = spark.read.parquet(os.path.join(gold_dir, "dim_customers"))
        dim_p = spark.read.parquet(os.path.join(gold_dir, "dim_products"))

        serving = serving_suite(fact, dim_c, dim_p)
        for name, fn in serving.items():
            start = time.perf_counter()
            _force(fn())
            timings[name] = round(time.perf_counter() - start, 3)

        # --- extensions: raw-table operators
        for name in EXTENSION_QUERIES:
            fn = workload.QUERIES[name]
            # Collect the PREVIOUS queries' garbage before timing this
            # one: Spark frees broadcast variables and shuffle state
            # lazily via GC-driven cleanup, so without this a ~95-query
            # sweep charges accumulated JVM debt to whichever query runs
            # late (measured: events_near_order 4.4s in-sweep vs 1.1s
            # with the hint — the plan itself never changed). A real
            # cluster amortizes this across executors and time; the
            # single local JVM must be told.
            spark.sparkContext._jvm.System.gc()
            start = time.perf_counter()
            _force(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - start, 3)
    finally:
        shutil.rmtree(gold_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # Full per-query regression surface → file; compact line → stdout.
    # SPARK_GRAFT_BENCH_DETAIL redirects the file (scripts_x10_bench.py
    # uses it so a ×10 run can never clobber the committed sf0.1
    # baseline it compares against). The committed repo-root baseline
    # (BENCH_DETAIL.json) is written ONLY under an explicit opt-in —
    # SPARK_GRAFT_COMMIT_BASELINE=1 — because ANY same-SF run would
    # otherwise silently replace it (a smoke run did in round 12; the
    # driver's own hot-box run did through the other door at the r12
    # close). Every non-opt-in run lands in a gitignored sibling: the
    # default-SF run as BENCH_DETAIL.latest.json, other SFs as
    # BENCH_DETAIL.sf<N>.json. The SF tag comes from the same regex
    # the `sf` field uses (ADVICE r12: a differently-named directory
    # holding sf0.1 data, or a trailing path tag, must not invent an
    # un-ignored filename from its basename).
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL")
    if not detail_path:
        repo = os.path.dirname(os.path.abspath(__file__))
        tag = f"sf{m.group(1)}" if m else "untagged"
        if tag == "sf0.1":
            name = (
                "BENCH_DETAIL.json"
                if os.environ.get("SPARK_GRAFT_COMMIT_BASELINE")
                else "BENCH_DETAIL.latest.json"
            )
        else:
            name = f"BENCH_DETAIL.{tag}.json"
        detail_path = os.path.join(repo, name)
    try:
        end_la = os.getloadavg()[0]
    except OSError:
        end_la = None
    conditions["wall_sec"] = round(time.time() - bench_started, 1)
    conditions["load_avg_1m_end"] = end_la
    conditions["jvms_at_end"] = len(_java_pids())
    # Operator-declared rerun context: when a noisy run is discarded
    # and the bench re-run, export the discarded totals so the
    # committed artifact carries the adjudication evidence, e.g.
    #   SPARK_GRAFT_BENCH_DISCARDED='[445.8, 419.5]'
    raw_discarded = os.environ.get("SPARK_GRAFT_BENCH_DISCARDED", "[]")
    try:
        discarded = json.loads(raw_discarded)
    except ValueError:
        discarded = None
    if isinstance(discarded, (int, float)) and not isinstance(discarded, bool):
        discarded = [discarded]  # forgive a bare scalar
    if not (
        isinstance(discarded, list)
        and all(
            # bool is a subclass of int — 'true'/'[true]' is NOT a
            # wall-clock total and must land in the unparsed branch.
            isinstance(x, (int, float)) and not isinstance(x, bool)
            for x in discarded
        )
    ):
        # NEVER swallow operator-declared evidence: a malformed value
        # is preserved verbatim so the artifact shows something was
        # declared but unparseable, instead of silently claiming a
        # clean single run.
        conditions["n_runs"] = 1
        conditions["discarded_totals"] = []
        conditions["discarded_totals_unparsed"] = raw_discarded
    else:
        conditions["n_runs"] = 1 + len(discarded)
        conditions["discarded_totals"] = discarded
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "workload_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "run_conditions": conditions,
            },
            fh,
            indent=1,
        )
    sys.stdout = contract_out
    print(
        json.dumps(
            {
                "metric": "workload_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": {k: timings[k] for k in HEADLINE if k in timings},
                "sf": sf,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
