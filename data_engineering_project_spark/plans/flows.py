"""Scheduled-flow wrapper — orchestration parity with the reference.

The reference orchestrates with Prefect (``etl/flows/main_flows.py:11-25``
runs bronze → silver → gold in order; ``etl/flows/main_flows_fase2.py:30-64``
the 4-step incremental variant) and schedules via a nightly GitHub-Actions
cron (``.github/workflows/pipeline.yml:8-9``). The engine-relevant contract
is small: named stages run in a fixed order, a stage failure stops every
downstream stage (fail-fast), transient failures retry a bounded number of
times, and the run produces an inspectable report. That contract is
re-expressed here as a dependency-free registry — any scheduler (Airflow,
Prefect, cron + spark-submit) can call :meth:`Flow.run`.

No Spark-specific logic lives here on purpose: stages are plain callables
receiving a shared context dict, so the same runner sequences DataFrame
pipelines (plans/olist.py), incremental loads (plans/incremental.py) and
streaming batch triggers (streaming/events.py). Driver-side orchestration
is control-plane only — the data plane stays distributed inside each
stage's Spark plan.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence


class FlowError(RuntimeError):
    """A stage exhausted its retries; downstream stages were skipped."""

    def __init__(self, report: "FlowReport"):
        self.report = report
        failed = [s.name for s in report.stages if s.status == "failed"]
        super().__init__(
            f"flow {report.flow!r} failed at stage(s) {failed}; "
            f"skipped {[s.name for s in report.stages if s.status == 'skipped']}"
        )


@dataclass(frozen=True)
class Stage:
    """One named pipeline step.

    ``fn`` receives the flow's context dict and may return a value that is
    stored back into the context under the stage's name — downstream
    stages read upstream outputs from the context, mirroring how the
    reference's silver task consumes the DB state the bronze task wrote.
    """

    name: str
    fn: Callable[[dict[str, Any]], Any]
    retries: int = 0
    retry_wait_s: float = 0.0


@dataclass
class StageResult:
    name: str
    status: str  # "success" | "failed" | "skipped"
    attempts: int = 0
    seconds: float = 0.0
    error: str | None = None


@dataclass
class FlowReport:
    flow: str
    stages: list[StageResult] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(s.status == "success" for s in self.stages)


@dataclass(frozen=True)
class Flow:
    """An ordered, fail-fast sequence of stages.

    Reference parity: ``main_flow`` at ``etl/flows/main_flows.py:11-25``
    is exactly ``Flow("...", [bronze, silver, gold]).run(...)`` — Prefect's
    ``@flow`` default behavior is sequential execution with downstream
    tasks not started after an upstream failure, which is what ``run``
    implements (plus bounded retries, Prefect's ``retries=`` knob).
    """

    name: str
    stages: Sequence[Stage]

    def run(
        self,
        context: dict[str, Any] | None = None,
        raise_on_failure: bool = True,
    ) -> FlowReport:
        ctx = dict(context or {})
        report = FlowReport(flow=self.name)
        failed = False
        for stage in self.stages:
            if failed:
                report.stages.append(StageResult(stage.name, "skipped"))
                continue
            result = StageResult(stage.name, "failed")
            t0 = time.perf_counter()
            for attempt in range(1, stage.retries + 2):
                result.attempts = attempt
                try:
                    ctx[stage.name] = stage.fn(ctx)
                    result.status = "success"
                    result.error = None
                    break
                except Exception as exc:  # noqa: BLE001 — report, don't mask
                    result.error = f"{type(exc).__name__}: {exc}"
                    if attempt <= stage.retries and stage.retry_wait_s:
                        time.sleep(stage.retry_wait_s)
            result.seconds = round(time.perf_counter() - t0, 3)
            report.stages.append(result)
            if result.status != "success":
                failed = True
        ctx["__report__"] = report
        if failed and raise_on_failure:
            raise FlowError(report)
        return report


def medallion_flow(
    spark, raw_dir: str, lake_dir: str, retries: int = 0
) -> Flow:
    """The reference's main flow (bronze → silver → gold,
    ``etl/flows/main_flows.py:11-25``) over the Spark pipeline in
    plans/olist.py, with each layer a retryable, fail-fast stage."""
    from data_engineering_project_spark.plans import olist

    return Flow(
        "medallion",
        [
            Stage(
                "bronze",
                lambda ctx: olist.bronze_ingest(spark, raw_dir, lake_dir),
                retries=retries,
            ),
            Stage(
                "silver",
                lambda ctx: olist.silver_clean(spark, ctx["bronze"], lake_dir),
                retries=retries,
            ),
            Stage(
                "gold",
                lambda ctx: olist.gold_build(spark, ctx["silver"], lake_dir),
                retries=retries,
            ),
        ],
    )
