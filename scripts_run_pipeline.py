"""Scheduled-pipeline entrypoint — the reference's GitHub-Actions cron
job (`.github/workflows/pipeline.yml:8-9`: daily 02:00 UTC) as one
schedulable command.

The reference's scheduler re-runs the whole DuckDB pipeline inside a
CI runner. Here the unit of scheduling is this CLI: medallion flow
(bronze -> silver -> gold, fail-fast with bounded retries —
plans/flows.py) followed by the static dashboard render
(serving/dashboard.py), exactly what the Streamlit app would show.
Wire it to ANY scheduler — cron, Airflow BashOperator, GitHub
Actions `run:` — e.g.::

    0 2 * * *  cd /repo && python scripts_run_pipeline.py \\
        --sf-dir /root/testdata/sf0.1 --out /var/www/dashboard.html

Idempotence is the pipeline's own property (re-runs insert nothing new
— tests/test_olist_pipeline.py::test_main_flow_incremental_idempotent),
so an overlapping or repeated cron firing is safe.

Exit code 0 on success, 1 with the per-stage report on stderr on
failure — the scheduler's alert hook.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="testdata directory (parquet tables)",
    )
    ap.add_argument(
        "--raw-dir",
        default=None,
        help="Olist raw CSV dir; when set, runs the medallion flow "
        "first (bronze->silver->gold into --lake-dir)",
    )
    ap.add_argument("--lake-dir", default=None)
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument(
        "--out",
        default="dashboard.html",
        help="where the rendered dashboard lands",
    )
    ap.add_argument(
        "--states",
        default=None,
        help="comma-separated customer-state filter",
    )
    args = ap.parse_args()

    from data_engineering_project_spark.serving.dashboard import (
        render_dashboard,
    )
    from data_engineering_project_spark.session import get_spark

    spark = get_spark("scheduled-pipeline")
    frames = None
    if args.raw_dir:
        from data_engineering_project_spark.plans.flows import (
            FlowError,
            medallion_flow,
        )

        lake = args.lake_dir or tempfile.mkdtemp(prefix="lake_")
        try:
            report = medallion_flow(
                spark, args.raw_dir, lake, retries=args.retries
            ).run()
        except FlowError as e:
            print(
                json.dumps(
                    [s.__dict__ for s in e.report.stages], default=str
                ),
                file=sys.stderr,
            )
            return 1
        print(
            json.dumps(
                {
                    "flow": report.flow,
                    "stages": [
                        {"name": s.name, "status": s.status, "s": s.seconds}
                        for s in report.stages
                    ],
                }
            ),
            file=sys.stderr,
        )
        # render the lake the flow JUST built, not the static testdata
        frames = {
            name: spark.read.parquet(os.path.join(lake, "gold", name))
            for name in ("fact_sales", "dim_customers", "dim_products")
        }
    states = args.states.split(",") if args.states else None
    render_dashboard(
        spark,
        args.sf_dir,
        states=states,
        out_path=args.out,
        frames=frames,
        source_label=(
            os.path.join(lake, "gold") if frames is not None else None
        ),
    )
    print(
        json.dumps(
            {
                "dashboard": args.out,
                "source": "lake gold" if frames is not None else args.sf_dir,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
