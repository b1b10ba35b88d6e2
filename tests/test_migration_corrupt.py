"""Round-3 batch 24: segment migration matrix + corrupt-file
tolerance."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_project_spark.plans import workload


def test_migration_matrix_partitions_both_years(spark, sf_dir):
    rows = workload.QUERIES["customer_migration_matrix"](spark, sf_dir).collect()
    cells = {(r["tier_1996"], r["tier_1997"]): r["n_customers"] for r in rows}
    assert ("absent", "absent") not in cells
    orders = workload.load(spark, sf_dir, "orders")
    active_96 = (
        orders.filter(F.year("o_orderdate") == 1996)
        .select("o_custkey")
        .distinct()
        .count()
    )
    from_96 = sum(
        n for (a, b), n in cells.items() if a in ("high", "low")
    )
    assert from_96 == active_96
    # median split: high and low 1996 rows are within 1 of each other
    hi = sum(n for (a, _), n in cells.items() if a == "high")
    lo = sum(n for (a, _), n in cells.items() if a == "low")
    assert abs(hi - lo) <= max(2, active_96 // 50)


def test_ignore_corrupt_files_reads_past_garbage(spark, tmp_path):
    p = str(tmp_path / "tbl")
    spark.range(100).write.parquet(p)
    # plant a garbage file that parquet cannot parse
    with open(os.path.join(p, "part-junk.parquet"), "wb") as f:
        f.write(b"this is not parquet at all")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        n = spark.read.parquet(p).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    assert n == 100
