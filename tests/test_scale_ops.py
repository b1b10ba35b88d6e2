"""Scale operators: salting correctness, bucketed joins eliminating
exchanges, and plan-shape assertions (pushdown, broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spark.operators import skew
from data_engineering_project_spark.plans import workload
from data_engineering_project_spark.sources import bucketing


def test_salted_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        (r.l_returnflag,): (r.n, r.total, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("total"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, round(r.total, 4), r.mx)
        for r in skew.salted_agg(
            li,
            keys=["l_returnflag"],
            aggs={
                "n": ("count", "l_quantity"),
                "total": ("sum", "l_quantity"),
                "mx": ("max", "l_quantity"),
            },
            salt_from=["l_orderkey", "l_linenumber"],
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_brand")
    li2 = li.select(F.col("l_partkey").alias("p_partkey"), "l_extendedprice")
    plain = (
        li2.join(part, "p_partkey")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        skew.salted_join(li2, part, "p_partkey", salt_from=["l_extendedprice"], salt_buckets=4)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
    )
    assert sorted((r.p_brand, r.n) for r in plain.collect()) == sorted(
        (r.p_brand, r.n) for r in salted.collect()
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    bucketing.write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    bucketing.write_bucketed(li, "b_lineitem", ["o_orderkey"], 8, ["o_orderkey"])
    # Force sort-merge (at test scale the planner would broadcast and
    # skip bucketing entirely; at 100 TB neither side broadcasts).
    thresholds = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in thresholds}
    try:
        for k, v in thresholds.items():
            spark.conf.set(k, v)
        joined = bucketing.bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == li.count()  # every item has an order

        # contrast: the same join over plain parquet shuffles both sides
        plain = orders.join(li, "o_orderkey")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_part_filters_pushed_to_scan(spark, sf_dir):
    """The P5/P6/P7 predicates must reach the parquet scan."""
    df = workload.QUERIES["part_filters"](spark, sf_dir)
    scan = _formatted_plan(df)
    assert "PushedFilters: [" in scan
    for frag in ("In(p_brand", "GreaterThanOrEqual(p_size,10)", "StringStartsWith(p_type,PRO"):
        assert frag in scan, scan


def test_partitioned_lake_prunes(spark, sf_dir, tmp_path):
    """The landing layout as a partitioned directory: a month filter
    must become a PartitionFilter (pruned at file-listing time), not a
    data filter."""
    from data_engineering_project_spark.sources.parquet import write_parquet

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    lake = str(tmp_path / "orders_lake")
    write_parquet(orders, lake, partition_by=["order_month"])

    one_month = spark.read.parquet(lake).filter(F.col("order_month") == "1995-03")
    plan = _formatted_plan(one_month)
    assert "PartitionFilters: [isnotnull(order_month" in plan, plan
    # the partition predicate must NOT appear as a post-scan Filter
    assert one_month.count() == orders.filter(F.col("order_month") == "1995-03").count()


def test_dim_joins_are_broadcast(spark, sf_dir):
    df = workload.QUERIES["top_categories"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_clustered_write_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """write_clustered: each output file owns a narrow, (near-)disjoint
    range of the cluster column — the property that makes parquet
    row-group min/max statistics prune point/range scans at 100 TB. A
    plain shuffled write gives every file the full value range."""
    import pyarrow.parquet as pq

    from data_engineering_project_spark.sources.layout import write_clustered

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "clustered")
    write_clustered(orders, out, cluster_by=["o_totalprice"], num_files=8)

    ranges = []
    for f in sorted((tmp_path / "clustered").glob("*.parquet")):
        meta = pq.ParquetFile(str(f)).metadata
        idx = meta.schema.names.index("o_totalprice")
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    # consecutive file ranges must not overlap (range exchange bounds
    # are exclusive, so strict clustering means prev.max <= next.min)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges ({lo1},{hi1}) vs ({lo2},{hi2})"

    # correctness: the clustered copy is the same relation
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    lo, hi = 1000.0, 5000.0
    assert (
        back.filter((F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi)).count()
        == orders.filter(
            (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi)
        ).count()
    )


def test_zordered_write_clusters_both_columns(spark, sf_dir, tmp_path):
    """write_zordered: per-file ranges are narrow on BOTH cluster
    columns (lexicographic clustering leaves the second column with
    full-range files, so any predicate on it reads everything)."""
    import pyarrow.parquet as pq

    from data_engineering_project_spark.sources.layout import write_zordered

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "value")
    out = tmp_path / "zordered"
    write_zordered(ev, str(out), cluster_by=["user_id", "value"], num_files=16)

    def spans(col):
        per_file, glo_min, glo_max = [], None, None
        for f in sorted(out.glob("*.parquet")):
            meta = pq.ParquetFile(str(f)).metadata
            idx = meta.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            per_file.append((min(mins), max(maxs)))
            glo_min = min(mins) if glo_min is None else min(glo_min, min(mins))
            glo_max = max(maxs) if glo_max is None else max(glo_max, max(maxs))
        total = (glo_max - glo_min) or 1
        return [(hi - lo) / total for lo, hi in per_file]

    u_spans, v_spans = spans("user_id"), spans("value")
    assert len(u_spans) >= 8
    # with 16 files and 2 interleaved dims each file should cover ~1/4
    # of each axis; allow generous slack but far below full-range
    import statistics

    assert statistics.median(u_spans) <= 0.6, u_spans
    assert statistics.median(v_spans) <= 0.6, v_spans

    # relation unchanged
    back = spark.read.parquet(str(out))
    assert back.count() == ev.count()
    # double SUM is order-sensitive; the rewrite reorders rows
    import pytest

    assert back.agg(F.sum("value")).collect()[0][0] == pytest.approx(
        ev.agg(F.sum("value")).collect()[0][0], rel=1e-9
    )
