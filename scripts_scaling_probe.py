"""Scaling probe: how query time grows with data size, Spark vs DuckDB.

Builds a ×K copy of the sf0.1 fact tables (keys shifted per replica so
cardinalities grow realistically: distinct orders/customers scale ×K,
the join/group key spaces widen accordingly), then times a
representative query set on both the original and the scaled data, in
both engines. Writes SCALING.json at the repo root.

Run: python scripts_scaling_probe.py  (takes a few minutes at K=10)

Why this artifact exists: at sf0.1 every dashboard query is sub-second
in DuckDB while Spark pays a ~0.5 s per-query scheduling floor — the
interesting engineering question is the SLOPE, not the intercept. A
sub-linear Spark slope with a near-linear single-process slope is the
quantitative form of "designed for 100 TB".
"""

from __future__ import annotations

import json
import os
import shutil
import time

import duckdb

from data_engineering_project_spark.session import get_spark
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SPARK_GRAFT_SCALE_K", "10"))
WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")

# (name, spark_builder, duckdb_sql) — heavy shapes, not dashboard
# point queries: wide-scan aggregate, fact-fact join + group,
# high-cardinality distinct, window.
PROBES = {
    "pricing_summary_shape": (
        lambda s, d: s.read.parquet(f"{d}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("n"),
        ),
        """SELECT l_returnflag, l_linestatus, SUM(l_quantity), SUM(l_extendedprice),
                  AVG(l_discount), COUNT(*)
           FROM lineitem GROUP BY 1, 2""",
    ),
    "join_group_shape": (
        lambda s, d: s.read.parquet(f"{d}/lineitem.parquet")
        .join(
            s.read.parquet(f"{d}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"), F.count("*").alias("n")),
        """SELECT o_orderpriority, SUM(l_extendedprice), COUNT(*)
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1""",
    ),
    "distinct_shape": (
        lambda s, d: s.read.parquet(f"{d}/orders.parquet")
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.countDistinct("o_custkey").alias("u")),
        """SELECT EXTRACT(year FROM o_orderdate), COUNT(DISTINCT o_custkey)
           FROM orders GROUP BY 1""",
    ),
    "window_shape": (
        lambda s, d: s.read.parquet(f"{d}/orders.parquet")
        .withColumn(
            "rn",
            F.row_number().over(
                __import__(
                    "pyspark.sql.window", fromlist=["Window"]
                ).Window.partitionBy("o_custkey").orderBy(
                    F.desc("o_totalprice"), F.asc("o_orderkey")
                )
            ),
        )
        .filter(F.col("rn") <= 3)
        .groupBy()
        .agg(F.count("*").alias("n")),
        """SELECT COUNT(*) FROM (
               SELECT ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
               FROM orders) WHERE rn <= 3""",
    ),
}


def build_scaled(spark) -> str:
    out = os.path.join(WORK, f"x{K}")
    if os.path.exists(out):
        return out
    os.makedirs(out, exist_ok=True)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    max_order = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    max_cust = orders.agg(F.max("o_custkey")).collect()[0][0] + 1
    reps = spark.range(K).withColumnRenamed("id", "rep")
    (
        orders.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * max_order).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.col("rep") * max_cust).alias(
                "o_custkey"
            ),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * max_order).alias(
                "l_orderkey"
            ),
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    return out


def time_spark(spark, builder, d, runs=3) -> float:
    builder(spark, d).count() if False else None
    # force full execution with a cheap count-style sink
    df = builder(spark, d)
    df.collect()  # warm (plan + code cache)
    t0 = time.time()
    for _ in range(runs):
        builder(spark, d).collect()
    return round((time.time() - t0) / runs, 3)


def time_duck(con, sql, runs=3) -> float:
    con.execute(sql).fetchall()
    t0 = time.time()
    for _ in range(runs):
        con.execute(sql).fetchall()
    return round((time.time() - t0) / runs, 3)


def main() -> None:
    spark = get_spark("scaling-probe")
    scaled = build_scaled(spark)
    results: dict = {"k": K, "base_dir": SF_DIR, "probes": {}}
    for name, (builder, sql) in PROBES.items():
        row: dict = {}
        row["spark_base_s"] = time_spark(spark, builder, SF_DIR)
        row["spark_xk_s"] = time_spark(spark, builder, scaled)
        for label, d in (("base", SF_DIR), ("xk", scaled)):
            con = duckdb.connect()
            con.execute("SET threads TO 32")
            for t in ("lineitem", "orders"):
                p = f"{d}/{t}.parquet"
                # Spark writes a directory of part files; DuckDB needs
                # the glob form for those
                src = f"{p}/*.parquet" if os.path.isdir(p) else p
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{src}'"
                )
            row[f"duck_{label}_s"] = time_duck(con, sql)
            con.close()
        row["spark_slope"] = round(
            row["spark_xk_s"] / max(row["spark_base_s"], 1e-9), 2
        )
        row["duck_slope"] = round(
            row["duck_xk_s"] / max(row["duck_base_s"], 1e-9), 2
        )
        results["probes"][name] = row
    with open("SCALING.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
