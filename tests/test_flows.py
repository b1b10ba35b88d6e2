"""Orchestration contract tests — flow runner parity with the reference's
Prefect flows (etl/flows/main_flows.py:11-25): fixed stage order,
fail-fast downstream skipping, bounded retries, inspectable report."""

from __future__ import annotations

import pytest

from data_engineering_project_spark.plans.flows import (
    Flow,
    FlowError,
    Stage,
)


def _flow(calls, fail_at=None, retries=0, succeed_on_attempt=None):
    def mk(name):
        attempts = {"n": 0}

        def fn(ctx):
            attempts["n"] += 1
            calls.append(name)
            if name == fail_at:
                if succeed_on_attempt and attempts["n"] >= succeed_on_attempt:
                    return f"{name}-recovered"
                raise ValueError(f"{name} exploded")
            return f"{name}-out"

        return fn

    return Flow(
        "medallion-shaped",
        [
            Stage("bronze", mk("bronze"), retries=retries),
            Stage("silver", mk("silver"), retries=retries),
            Stage("gold", mk("gold"), retries=retries),
        ],
    )


def test_stages_run_in_order_and_share_context():
    calls: list[str] = []
    report = _flow(calls).run()
    assert calls == ["bronze", "silver", "gold"]
    assert report.ok
    assert [s.status for s in report.stages] == ["success"] * 3
    assert [s.attempts for s in report.stages] == [1, 1, 1]


def test_upstream_output_visible_downstream():
    seen = {}
    flow = Flow(
        "ctx",
        [
            Stage("bronze", lambda ctx: {"rows": 42}),
            Stage("silver", lambda ctx: seen.setdefault("b", ctx["bronze"])),
        ],
    )
    flow.run()
    assert seen["b"] == {"rows": 42}


def test_mid_stage_failure_stops_downstream():
    """The reference's Prefect flow never runs gold when silver raises
    (fail-fast DQ, README_FASE1.md:61-70) — neither do we."""
    calls: list[str] = []
    flow = _flow(calls, fail_at="silver")
    with pytest.raises(FlowError) as exc_info:
        flow.run()
    assert calls == ["bronze", "silver"]  # gold never invoked
    report = exc_info.value.report
    assert [s.status for s in report.stages] == ["success", "failed", "skipped"]
    assert "silver exploded" in report.stages[1].error
    assert not report.ok


def test_first_stage_failure_skips_everything_downstream():
    calls: list[str] = []
    report = _flow(calls, fail_at="bronze").run(raise_on_failure=False)
    assert calls == ["bronze"]
    assert [s.status for s in report.stages] == ["failed", "skipped", "skipped"]


def test_retry_recovers_transient_failure():
    calls: list[str] = []
    report = _flow(calls, fail_at="silver", retries=2, succeed_on_attempt=2).run()
    # bronze once, silver twice (fail + recover), gold once
    assert calls == ["bronze", "silver", "silver", "gold"]
    assert report.ok
    assert report.stages[1].attempts == 2


def test_retries_exhausted_then_fail_fast():
    calls: list[str] = []
    report = _flow(calls, fail_at="silver", retries=2).run(raise_on_failure=False)
    assert calls == ["bronze", "silver", "silver", "silver"]
    assert report.stages[1].attempts == 3
    assert [s.status for s in report.stages] == ["success", "failed", "skipped"]


def test_report_also_stored_in_context():
    flow = Flow("r", [Stage("only", lambda ctx: 1)])
    ctx: dict = {}
    report = flow.run(ctx)
    assert report.ok and report.flow == "r"
