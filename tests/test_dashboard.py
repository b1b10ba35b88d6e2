"""serving/dashboard.py — the Streamlit-equivalent static render
(reference dashboard/app_fase1.py:160-256 without Streamlit)."""

from __future__ import annotations

import re
from html.parser import HTMLParser

from data_engineering_project_spark.serving.dashboard import render_dashboard


class _Parser(HTMLParser):
    def __init__(self):
        super().__init__()
        self.tags = []

    def handle_starttag(self, tag, attrs):
        self.tags.append(tag)


def test_dashboard_renders_all_figures(spark, sf_dir, tmp_path):
    out = str(tmp_path / "dash.html")
    html = render_dashboard(spark, sf_dir, out_path=out)
    assert open(out).read() == html
    # 5 KPI tiles + 6 figures, each with a chart AND its table view
    assert html.count('class="tile"') == 5
    assert html.count("<figure>") == 6
    assert html.count("<svg") == 6
    assert html.count("<details>") == 6  # contrast-relief table views
    # native tooltips on marks, dark-mode palette blocks present
    assert html.count("<title>") > 20
    assert html.count("color-scheme: dark") >= 2
    p = _Parser()
    p.feed(html)
    assert "svg" in p.tags and "rect" in p.tags and "path" in p.tags


def test_dashboard_kpis_match_analytics(spark, sf_dir):
    """Tile values are the analytics.kpis frame, not re-derived."""
    from data_engineering_project_spark.plans import analytics
    from data_engineering_project_spark.plans.workload import gold

    g = gold(spark, sf_dir)
    kpi = analytics.kpis(g["fact_sales"], g["dim_customers"]).collect()[0]
    html = render_dashboard(spark, sf_dir)
    assert f"{int(kpi['total_orders']):,}" in html
    rev = float(kpi["total_revenue"])
    assert f"{rev:,.2f}" in html or f"{int(rev):,}" in html


def test_dashboard_geometry_within_viewbox(spark, sf_dir):
    """Every bar lies inside its viewBox (labels may extend into the
    reserved right margin) — the render-and-look check, automated."""
    html = render_dashboard(spark, sf_dir)
    svgs = re.findall(r"<svg.*?</svg>", html, re.S)
    assert len(svgs) == 6
    for svg in svgs:
        vb = re.search(r'viewBox="0 0 (\d+) (\d+)"', svg)
        w_max, h_max = int(vb.group(1)), int(vb.group(2))
        for m in re.finditer(
            r'<rect x="([\d.]+)" y="([\d.]+)" width="([\d.]+)" height="([\d.]+)"',
            svg,
        ):
            x, y, w, h = map(float, m.groups())
            assert w > 0 and h > 0
            assert x + w <= w_max + 80 and y + h <= h_max


def test_dashboard_state_filter_parameterizes(spark, sf_dir):
    """The state IN-list flows through the parameterized plans: a
    filtered render differs, names the filter, and repeated renders
    are byte-identical (deterministic serving output)."""
    full = render_dashboard(spark, sf_dir)
    again = render_dashboard(spark, sf_dir)
    assert full == again
    some_state = re.search(r"<td>([A-Z]+)</td>", full).group(1)
    filtered = render_dashboard(spark, sf_dir, states=[some_state])
    assert filtered != full
    assert f"filter: {some_state}" in filtered


def test_dashboard_frames_override(spark, sf_dir):
    """The frames= hook (used by scripts_run_pipeline.py to render the
    lake it just built) produces the same output as the default
    testdata star when handed the same frames — once the provenance
    label is pinned to the same value."""
    from data_engineering_project_spark.plans.workload import gold

    g = gold(spark, sf_dir)
    default = render_dashboard(spark, sf_dir)
    via_frames = render_dashboard(spark, sf_dir, frames=g, source_label=sf_dir)
    assert via_frames == default


def test_dashboard_provenance_label(spark, sf_dir):
    """ADVICE r08: a frames override must NOT claim the subtitle was
    'generated from {sf_dir}' — the artifact states where its frames
    actually came from."""
    from data_engineering_project_spark.plans.workload import gold

    g = gold(spark, sf_dir)
    html = render_dashboard(spark, sf_dir, frames=g)
    assert "caller-provided gold frames" in html
    assert f"generated from {sf_dir}" not in html
    labeled = render_dashboard(
        spark, sf_dir, frames=g, source_label="/lake/gold"
    )
    assert "generated from /lake/gold" in labeled
