"""Revenue bridge: the decomposition must reconcile with the totals."""

from __future__ import annotations

import pytest

from data_engineering_project_spark.plans import workload


def test_bridge_components_reconcile_the_delta(spark, sf_dir):
    r = workload.QUERIES["revenue_bridge"](spark, sf_dir).collect()[0]
    delta = r["rev_1997"] - r["rev_1996"]
    recon = (
        r["volume_effect"]
        + r["price_effect"]
        + r["new_parts_rev"]
        - r["lost_parts_rev"]
    )
    # identity holds exactly in real arithmetic; decimal truncation of
    # each effect term leaves sub-cent-per-part slack
    assert recon == pytest.approx(delta, rel=1e-6, abs=1.0)
    assert r["rev_1996"] > 0 and r["rev_1997"] > 0
