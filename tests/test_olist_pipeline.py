"""End-to-end Olist-shaped pipeline (the reference's native surface),
from synthetic CSVs through bronze → silver → gold, plus the dashboard
workload on the result."""

from __future__ import annotations

import csv
import os
import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import analytics, olist, quality

STATUSES = ["delivered"] * 18 + ["shipped", "canceled"]


def _write_csv(path, header, rows):
    with open(path, "w", newline="", encoding="utf-8-sig") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        w.writerows(rows)


@pytest.fixture()
def olist_raw(tmp_path):
    """Tiny deterministic Olist-shaped raw dir (BOM'd CSVs, like the
    real dataset)."""
    rng = random.Random(42)
    raw = tmp_path / "raw"
    raw.mkdir()
    t0 = datetime(2017, 1, 1)

    customers = [
        (f"c{i:03d}", f"cu{i:03d}", "Sao Paulo" if i % 3 else "Rio", "SP" if i % 3 else "RJ")
        for i in range(40)
    ]
    _write_csv(
        raw / "olist_customers_dataset.csv",
        ["customer_id", "customer_unique_id", "customer_city", "customer_state"],
        customers,
    )
    products = [(f"p{i:03d}", rng.choice(["beleza_saude", "esporte_lazer", "moveis_decoracao"])) for i in range(15)]
    _write_csv(
        raw / "olist_products_dataset.csv",
        ["product_id", "product_category_name"],
        products,
    )
    _write_csv(
        raw / "olist_sellers_dataset.csv",
        ["seller_id", "seller_city", "seller_state"],
        [(f"s{i}", "sp", "SP") for i in range(5)],
    )
    orders, items = [], []
    for i in range(60):
        status = STATUSES[i % len(STATUSES)]
        purchase = t0 + timedelta(days=i * 5, hours=i % 24)
        delivered = purchase + timedelta(days=3 + i % 10) if status == "delivered" else None
        orders.append(
            (
                f"o{i:03d}",
                customers[i % 40][0],
                status,
                purchase.strftime("%Y-%m-%d %H:%M:%S"),
                delivered.strftime("%Y-%m-%d %H:%M:%S") if delivered else "",
                (purchase + timedelta(days=14)).strftime("%Y-%m-%d %H:%M:%S"),
            )
        )
        for item_no in range(1 + i % 3):
            items.append(
                (
                    f"o{i:03d}",
                    item_no + 1,
                    products[(i + item_no) % 15][0],
                    f"s{item_no % 5}",
                    round(20 + rng.random() * 80, 2),
                    round(5 + rng.random() * 15, 2),
                )
            )
    _write_csv(
        raw / "olist_orders_dataset.csv",
        [
            "order_id",
            "customer_id",
            "order_status",
            "order_purchase_timestamp",
            "order_delivered_customer_date",
            "order_estimated_delivery_date",
        ],
        orders,
    )
    _write_csv(
        raw / "olist_order_items_dataset.csv",
        ["order_id", "order_item_id", "product_id", "seller_id", "price", "freight_value"],
        items,
    )
    return str(raw)


def test_main_flow_end_to_end(spark, olist_raw, tmp_path):
    lake = str(tmp_path / "lake")
    gold = olist.main_flow(spark, olist_raw, lake)

    # gold tables exist with the documented schemas (CI smoke equivalent)
    assert set(gold) == {"dim_customers", "dim_products", "dim_time", "fact_sales"}
    fact = gold["fact_sales"]
    assert fact.columns == [
        "order_id",
        "customer_id",
        "product_id",
        "price",
        "freight_value",
        "order_purchase_timestamp",
        "delivery_time_days",
    ]
    # delivered-only: 54 of 60 orders (i%20 < 18)
    assert fact.select("order_id").distinct().count() == 54
    # item grain: fact rows == items of delivered orders
    assert fact.count() > 54
    # delivery_time_days = day-boundary diff, 3..12 per construction
    rng_row = fact.agg(F.min("delivery_time_days"), F.max("delivery_time_days")).collect()[0]
    assert rng_row[0] >= 3 and rng_row[1] <= 13

    # bronze fidelity: all-string schema
    bronze_orders = spark.read.parquet(os.path.join(lake, "bronze", "orders"))
    assert all(f.dataType.simpleString() == "string" for f in bronze_orders.schema.fields)

    # dashboard workload runs on the Olist gold too
    kpi = analytics.kpis(fact, gold["dim_customers"]).collect()[0]
    assert kpi.total_orders == 54
    by_state = analytics.orders_by_state(fact, gold["dim_customers"], states=["SP"]).collect()
    assert len(by_state) == 1 and by_state[0].customer_state == "SP"

    # dim_time keyed on DATE with weekday names
    dt = gold["dim_time"]
    assert dict(dt.dtypes)["order_date"] == "date"
    days = {r.day_of_week for r in dt.select("day_of_week").distinct().collect()}
    assert days <= {"Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"}


def test_dq_failure_blocks_gold(spark, olist_raw, tmp_path):
    """Scenario 5 (FIXTURES.md §4): out-of-domain status → silver gate
    raises and gold is never written."""
    # corrupt one status in the orders CSV
    path = os.path.join(olist_raw, "olist_orders_dataset.csv")
    with open(path, encoding="utf-8-sig") as fh:
        lines = fh.read().splitlines()
    lines[1] = lines[1].replace("delivered", "EXPLODED", 1)
    with open(path, "w", encoding="utf-8-sig") as fh:
        fh.write("\n".join(lines))

    lake = str(tmp_path / "lake2")
    with pytest.raises(quality.DataQualityError, match="order_status_in_domain"):
        olist.main_flow(spark, olist_raw, lake)
    assert not os.path.exists(os.path.join(lake, "gold"))


def test_main_flow_incremental_idempotent(spark, olist_raw, tmp_path):
    """Phase-2 composition: landing → bronze incremental → silver →
    gold; a re-run is a observable no-op and gold is unchanged."""
    import csv as csvmod

    lake = str(tmp_path / "lake_inc")
    gold1 = olist.main_flow_incremental(spark, olist_raw, lake)
    fact_rows_1 = gold1["fact_sales"].count()
    orders_1 = spark.read.parquet(os.path.join(lake, "bronze", "orders")).count()
    assert fact_rows_1 > 0 and orders_1 == 60

    gold2 = olist.main_flow_incremental(spark, olist_raw, lake)
    assert spark.read.parquet(os.path.join(lake, "bronze", "orders")).count() == orders_1
    assert gold2["fact_sales"].count() == fact_rows_1

    # a new order arrives in the orders CSV (new month) → exactly one
    # more bronze order; its items follow
    path = os.path.join(olist_raw, "olist_orders_dataset.csv")
    with open(path, "a", newline="", encoding="utf-8-sig") as fh:
        csvmod.writer(fh).writerow(
            ["o999", "c001", "delivered", "2019-06-01 10:00:00", "2019-06-05 10:00:00", "2019-06-15 10:00:00"]
        )
    items_path = os.path.join(olist_raw, "olist_order_items_dataset.csv")
    with open(items_path, "a", newline="", encoding="utf-8-sig") as fh:
        csvmod.writer(fh).writerow(["o999", "1", "p001", "s1", "42.0", "7.0"])

    gold3 = olist.main_flow_incremental(spark, olist_raw, lake)
    assert spark.read.parquet(os.path.join(lake, "bronze", "orders")).count() == orders_1 + 1
    assert gold3["fact_sales"].count() == fact_rows_1 + 1
    new_fact = gold3["fact_sales"].filter(F.col("order_id") == "o999").collect()
    assert len(new_fact) == 1 and new_fact[0].delivery_time_days == 4


def test_table_name_derivation():
    assert olist.table_name_from_csv("olist_orders_dataset.csv") == "orders"
    assert olist.table_name_from_csv("/x/olist_order_items_dataset.csv") == "order_items"


def test_decode_maps(spark):
    df = spark.createDataFrame([("SP",), ("RJ",), ("XX",)], "customer_state string")
    out = {r.customer_state for r in olist.decode_column(df, "customer_state", olist.BR_STATE_NAMES).collect()}
    assert out == {"San Paolo", "Rio de Janeiro", "XX"}
