"""The reference pipeline end-to-end, Olist-shaped.

This is the Spark re-expression of the reference's Prefect flow
(etl/flows/main_flows.py:11-25): bronze CSV ingest → silver typed clean
with fail-fast DQ → gold star schema, over the 5 ingested Olist tables
(etl/tasks/bronze.py:8-14). One SparkSession, parquet lake with
bronze/silver/gold prefixes, tables registered as views.

Layer contracts (README_FASE1.md:36-70):
- bronze: string-typed fidelity copies of the raw CSVs;
- silver: explicit canonical types + Pandera-equivalent gates
  (plans/quality.py) — a violation raises before gold runs;
- gold: dims + item-grain fact, delivered-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.plans import quality
from data_engineering_project_spark.plans.medallion import (
    StarSchemaSpec,
    build_star_schema,
)
from data_engineering_project_spark.sources.csv import read_csv
from data_engineering_project_spark.sources.parquet import write_parquet

# Olist column mapping (etl/tasks/silver.py:29-56, gold.py:12-65).
OLIST_SPEC = StarSchemaSpec(
    order_key="order_id",
    customer_key="customer_id",
    order_status="order_status",
    purchase_ts="order_purchase_timestamp",
    completed_status="delivered",
    delivered_ts="order_delivered_customer_date",
    item_order_key="order_id",
    product_key="product_id",
    price="price",
    freight="freight_value",
    item_event_ts=None,
    cust_key="customer_id",
    cust_attrs={"customer_city": "customer_city", "customer_state": "customer_state"},
    prod_key="product_id",
    prod_attrs={"product_category_name": "product_category_name"},
    cast_keys_to_string=True,  # Olist IDs are hash strings
)

# The 5 ingested tables (etl/tasks/bronze.py:8-14); filename pattern
# olist_<name>_dataset.csv → table <name> (bronze.py:26-29).
INGESTED_TABLES = ("orders", "order_items", "customers", "products", "sellers")


def table_name_from_csv(path: str) -> str:
    """olist_orders_dataset.csv → orders (etl/tasks/bronze.py:28-29)."""
    base = os.path.basename(path)
    return base.removeprefix("olist_").removesuffix(".csv").removesuffix("_dataset")


def bronze_ingest(spark: SparkSession, raw_dir: str, lake_dir: str) -> dict[str, DataFrame]:
    """S1/S2: BOM-safe, string-typed CSV → bronze parquet fidelity copies."""
    bronze: dict[str, DataFrame] = {}
    for table in INGESTED_TABLES:
        path = os.path.join(raw_dir, f"olist_{table}_dataset.csv")
        df = read_csv(spark, path)
        write_parquet(df, os.path.join(lake_dir, "bronze", table))
        bronze[table] = spark.read.parquet(os.path.join(lake_dir, "bronze", table))
    return bronze


def silver_clean(
    spark: SparkSession, bronze: dict[str, DataFrame], lake_dir: str
) -> dict[str, DataFrame]:
    """Silver typing (etl/tasks/silver.py:29-56) + fail-fast DQ gates
    (:7-19,42,58 — as single-pass Spark aggregates, no Pandas hop)."""
    orders = bronze["orders"].select(
        "order_id",
        "customer_id",
        "order_status",
        F.to_timestamp("order_purchase_timestamp").alias("order_purchase_timestamp"),
        F.to_timestamp("order_delivered_customer_date").alias(
            "order_delivered_customer_date"
        ),
        F.to_timestamp("order_estimated_delivery_date").alias(
            "order_estimated_delivery_date"
        ),
    ).filter(F.col("order_id").isNotNull())
    quality.validate(orders, quality.silver_orders_checks())

    items = bronze["order_items"].select(
        "order_id",
        F.col("order_item_id").cast("int").alias("order_item_id"),
        "product_id",
        "seller_id",
        F.col("price").cast("double").alias("price"),
        F.col("freight_value").cast("double").alias("freight_value"),
    )
    quality.validate(items, quality.silver_items_checks())

    silver = {
        "orders": orders,
        "order_items": items,
        "customers": bronze["customers"],  # passthrough (silver.py:61-62)
        "products": bronze["products"],
    }
    for name, df in silver.items():
        write_parquet(df, os.path.join(lake_dir, "silver", name))
        silver[name] = spark.read.parquet(os.path.join(lake_dir, "silver", name))
    return silver


def gold_build(
    spark: SparkSession, silver: dict[str, DataFrame], lake_dir: str
) -> dict[str, DataFrame]:
    """Gold star schema (etl/tasks/gold.py:4-68), materialized + registered."""
    gold = build_star_schema(
        orders_raw=silver["orders"],
        items_raw=silver["order_items"],
        customers_raw=silver["customers"],
        products_raw=silver["products"],
        spec=OLIST_SPEC,
    )
    out: dict[str, DataFrame] = {}
    for name, df in gold.items():
        write_parquet(df, os.path.join(lake_dir, "gold", name))
        materialized = spark.read.parquet(os.path.join(lake_dir, "gold", name))
        materialized.createOrReplaceTempView(name)
        out[name] = materialized
    return out


def main_flow(spark: SparkSession, raw_dir: str, lake_dir: str) -> dict[str, DataFrame]:
    """The full batch pipeline (etl/flows/main_flows.py:11-25).

    Fail-fast: a DataQualityError in silver propagates and gold is never
    written (README_FASE1.md:61-70).
    """
    bronze = bronze_ingest(spark, raw_dir, lake_dir)
    silver = silver_clean(spark, bronze, lake_dir)
    return gold_build(spark, silver, lake_dir)


def main_flow_incremental(
    spark: SparkSession, raw_dir: str, lake_dir: str
) -> dict[str, DataFrame]:
    """The Phase-2 pipeline (etl/flows/main_flows_fase2.py:29-64):

    1. landing — orders CSV split into month files, written only when
       the month's fingerprint moved (scripts/esplosione_dati.py);
    2. bronze incremental — ledger-gated, anti-dup appends
       (scripts/bronze_incremental.py); dims replaced on change;
    3. silver + gold — full rebuilds over bronze, exactly like Phase 1
       (the reference keeps these non-incremental,
       etl/flows/main_flows_fase2.py:53-62).

    Idempotent end-to-end: a re-run lands nothing, appends nothing, and
    rebuilds identical silver/gold.
    """
    from data_engineering_project_spark.plans.incremental import (
        IncrementalSpec,
        land_monthly,
        replace_dimension,
        run_incremental,
    )
    from data_engineering_project_spark.sources.control_table import ControlTable

    landing = os.path.join(lake_dir, "landing_zone")
    bronze_dir = os.path.join(lake_dir, "bronze")

    # step 1: landing (orders monthly, fingerprint-gated)
    orders_csv = read_csv(spark, os.path.join(raw_dir, "olist_orders_dataset.csv"))
    orders_typed = orders_csv.withColumn(
        "order_purchase_timestamp", F.to_timestamp("order_purchase_timestamp")
    )
    land_monthly(orders_typed, "order_purchase_timestamp", "order_id", landing)

    # step 2: bronze incremental (orders/items) + dims replace-on-change
    items_csv = read_csv(spark, os.path.join(raw_dir, "olist_order_items_dataset.csv"))
    spec = IncrementalSpec(
        order_key="order_id",
        item_order_key="order_id",
        item_line_key="order_item_id",
        ts_col="order_purchase_timestamp",
    )
    run_incremental(spark, landing, bronze_dir, spec, items_csv)
    ledger = ControlTable(spark, os.path.join(bronze_dir, "tech_processed_files"))
    for dim, key in (("customers", "customer_id"), ("products", "product_id")):
        incoming = read_csv(spark, os.path.join(raw_dir, f"olist_{dim}_dataset.csv"))
        replace_dimension(
            spark,
            os.path.join(bronze_dir, dim),
            incoming,
            key,
            ledger,
            f"olist_{dim}_dataset.csv",
        )

    # steps 3-4: silver + gold full rebuilds from bronze (stringly bronze
    # is re-typed by silver, same as Phase 1)
    bronze = {
        name: spark.read.parquet(os.path.join(bronze_dir, dirname))
        for name, dirname in (
            ("orders", "orders"),
            ("order_items", "order_items"),
            ("customers", "customers"),
            ("products", "products"),
        )
    }
    silver = silver_clean(spark, bronze, lake_dir)
    return gold_build(spark, silver, lake_dir)


# F16: presentation-layer decode maps (dashboard/app_fase1.py:40-80) as a
# broadcast map lookup with coalesce-to-original fallback.
BR_STATE_NAMES = {
    "AC": "Acre", "AL": "Alagoas", "AP": "Amapá", "AM": "Amazonas",
    "BA": "Bahia", "CE": "Ceará", "DF": "Distrito Federale", "ES": "Espírito Santo",
    "GO": "Goiás", "MA": "Maranhão", "MT": "Mato Grosso", "MS": "Mato Grosso do Sul",
    "MG": "Minas Gerais", "PA": "Pará", "PB": "Paraíba", "PR": "Paraná",
    "PE": "Pernambuco", "PI": "Piauí", "RJ": "Rio de Janeiro",
    "RN": "Rio Grande do Norte", "RS": "Rio Grande do Sul", "RO": "Rondônia",
    "RR": "Roraima", "SC": "Santa Catarina", "SP": "San Paolo",
    "SE": "Sergipe", "TO": "Tocantins",
}


def decode_column(df: DataFrame, col: str, mapping: dict[str, str]) -> DataFrame:
    """Map-decode with original-value fallback (Pandas
    ``.map(dict).fillna(orig)`` at app_fase1.py:166,195) via a literal
    ``create_map`` — a broadcast-free per-row lookup."""
    pairs = [x for kv in mapping.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    m = F.create_map(*pairs)
    return df.withColumn(col, F.coalesce(m[F.col(col)], F.col(col)))
