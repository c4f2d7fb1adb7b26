"""Deterministic on-the-fly TPC-DS-style data generation (core star subset).

Capability parity with the reference's TPCDS DSv2 connector
(extensions/spark/kyuubi-spark-connector-tpcds/.../TPCDSBatchScan.scala:31-95
— per-chunk row generators over a split key space; schemas
TPCDSSchemaUtils.scala:31-80).  Spark-first equivalent of the same design as
sources/datagen.py: `spark.range(n)` is the partitioned key space and
`mapInPandas` turns Arrow batches of keys into rows, so generation is
embarrassingly parallel and identical for any partition count.

Covered tables — the store-channel star that the classic report queries
(q3/q7/q36/q42/q52/q55/q67…) touch: ``date_dim``, ``item``, ``store``,
``customer_demographics``, ``promotion``, ``store_sales``.  Money columns
are DECIMAL(7,2) as in the spec, which also makes cross-engine sums exact
(no float association ambiguity between Spark and an oracle engine).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_GENDERS = ["M", "F"]
_MARITAL = ["M", "S", "D", "W", "U"]
_EDUCATION = [
    "Primary",
    "Secondary",
    "College",
    "2 yr Degree",
    "4 yr Degree",
    "Advanced Degree",
    "Unknown",
]
_CATEGORIES = ["Books", "Electronics", "Home", "Music", "Shoes", "Sports"]
_CLASSES = ["classic", "modern", "value", "premium", "import"]
_DAY_NAMES = [
    "Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
]

# d_date_sk base matching the spec's julian-ish offsets (1998-01-01).
_DATE_BASE_SK = 2450815
_DATE_START = "1998-01-01"
_N_DATES = 1826  # 1998-01-01 .. 2002-12-31


def _keyed(spark: SparkSession, n: int, partitions: int | None) -> DataFrame:
    df = spark.range(n)
    return df.repartition(partitions) if partitions else df


def gen_date_dim(spark: SparkSession, sf: float = 1.0, partitions: int | None = None) -> DataFrame:
    """Five calendar years; week/month sequences continuous across years."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf["id"].to_numpy()
            dates = pd.to_datetime(_DATE_START) + pd.to_timedelta(keys, unit="D")
            yield pd.DataFrame(
                {
                    "d_date_sk": keys + _DATE_BASE_SK,
                    "d_date_id": [f"AAAAAAAA{int(k):08d}" for k in keys],
                    "d_date": dates.date,
                    "d_year": dates.year.astype("int32"),
                    "d_moy": dates.month.astype("int32"),
                    "d_dom": dates.day.astype("int32"),
                    "d_qoy": dates.quarter.astype("int32"),
                    "d_day_name": [_DAY_NAMES[d] for d in dates.dayofweek],
                    # continuous sequences from the epoch of the table
                    "d_week_seq": (keys // 7 + 1).astype("int32"),
                    "d_month_seq": (
                        (dates.year - 1998) * 12 + dates.month - 1
                    ).astype("int32")
                    + 1188,  # spec-style offset so BETWEEN windows look real
                }
            )

    return _keyed(spark, _N_DATES, partitions).mapInPandas(
        gen,
        schema="d_date_sk long, d_date_id string, d_date date, d_year int, "
        "d_moy int, d_dom int, d_qoy int, d_day_name string, d_week_seq int, "
        "d_month_seq int",
    )


def gen_item(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(10, int(sf * 18_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf["id"].to_numpy()
            brand_id = (keys * 2654435761 % 10).astype("int64") + 1
            manu_id = (keys * 48271 % 100).astype("int64") + 1
            cat_idx = keys % len(_CATEGORIES)
            cls_idx = (keys * 31) % len(_CLASSES)
            yield pd.DataFrame(
                {
                    "i_item_sk": keys + 1,
                    "i_item_id": [f"AAAAAAAA{int(k):08d}" for k in keys],
                    "i_product_name": [f"item {int(k):07d}" for k in keys],
                    "i_brand_id": brand_id,
                    "i_brand": [f"brand#{int(b)}" for b in brand_id],
                    "i_class_id": cls_idx.astype("int64") + 1,
                    "i_class": [_CLASSES[int(i)] for i in cls_idx],
                    "i_category_id": cat_idx.astype("int64") + 1,
                    "i_category": [_CATEGORIES[int(i)] for i in cat_idx],
                    "i_manufact_id": manu_id,
                    "i_manufact": [f"manufact#{int(m)}" for m in manu_id],
                    "i_manager_id": (keys * 977 % 100).astype("int64") + 1,
                    "i_current_price": ((keys * 7 % 9900 + 100) / 100.0).round(2),
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="i_item_sk long, i_item_id string, i_product_name string, "
        "i_brand_id long, i_brand string, i_class_id long, i_class string, "
        "i_category_id long, i_category string, i_manufact_id long, "
        "i_manufact string, i_manager_id long, i_current_price double",
    )
    from pyspark.sql import functions as F

    return df.withColumn(
        "i_current_price", F.col("i_current_price").cast("decimal(7,2)")
    )


def gen_store(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(2, int(sf * 12))
    states = ["TN", "CA", "NY", "TX", "WA"]
    rows = [
        (
            i + 1,
            f"AAAAAAAA{i:08d}",
            f"store {i}",
            f"company {i % 3}",
            states[i % len(states)],
            f"{37000 + i * 13 % 60000:05d}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "s_store_sk long, s_store_id string, s_store_name string, "
        "s_company_name string, s_state string, s_zip string",
    )


def gen_customer_demographics(
    spark: SparkSession, sf: float = 1.0, partitions: int | None = None
) -> DataFrame:
    """All gender × marital × education combinations (spec's cross product)."""
    rows = []
    sk = 1
    for g in _GENDERS:
        for m in _MARITAL:
            for e in _EDUCATION:
                rows.append((sk, g, m, e))
                sk += 1
    return spark.createDataFrame(
        rows,
        "cd_demo_sk long, cd_gender string, cd_marital_status string, "
        "cd_education_status string",
    )


def gen_promotion(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(3, int(sf * 300))
    rows = [
        (
            i + 1,
            f"AAAAAAAA{i:08d}",
            "Y" if i % 3 == 0 else "N",
            "Y" if i % 5 == 0 else "N",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "p_promo_sk long, p_promo_id string, p_channel_email string, "
        "p_channel_event string",
    )


def gen_store_sales(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """Fact table; every money column an exact DECIMAL(7,2)."""
    n = max(1000, int(sf * 2_880_000))
    n_item = max(10, int(sf * 18_000))
    n_store = max(2, int(sf * 12))
    n_cd = len(_GENDERS) * len(_MARITAL) * len(_EDUCATION)
    n_promo = max(3, int(sf * 300))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            list_cents = k * 7919 % 19_900 + 100  # 1.00 .. 199.99
            sales_cents = list_cents * (50 + k * 31 % 50) // 100  # 50-99% of list
            qty = (k * 2654435761 % 100 + 1).astype("int64")
            coupon_cents = np.where(k % 7 == 0, sales_cents // 10, 0)
            cost_cents = list_cents * (30 + k * 13 % 40) // 100
            ext_cents = sales_cents * qty
            profit_cents = ext_cents - cost_cents * qty - coupon_cents
            yield pd.DataFrame(
                {
                    "ss_sold_date_sk": k * 6364136223846793005 % _N_DATES
                    + _DATE_BASE_SK,
                    "ss_item_sk": k * 48271 % n_item + 1,
                    "ss_store_sk": k * 69621 % n_store + 1,
                    "ss_customer_sk": k * 977 % max(1, int(sf * 100_000) or 1000) + 1,
                    "ss_cdemo_sk": k * 31 % n_cd + 1,
                    "ss_promo_sk": k * 13 % n_promo + 1,
                    "ss_ticket_number": k // 4 + 1,
                    "ss_quantity": qty.astype("int32"),
                    "ss_list_price": list_cents / 100.0,
                    "ss_sales_price": sales_cents / 100.0,
                    "ss_ext_sales_price": ext_cents / 100.0,
                    "ss_coupon_amt": coupon_cents / 100.0,
                    "ss_net_profit": profit_cents / 100.0,
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="ss_sold_date_sk long, ss_item_sk long, ss_store_sk long, "
        "ss_customer_sk long, ss_cdemo_sk long, ss_promo_sk long, "
        "ss_ticket_number long, ss_quantity int, ss_list_price double, "
        "ss_sales_price double, ss_ext_sales_price double, "
        "ss_coupon_amt double, ss_net_profit double",
    )
    from pyspark.sql import functions as F

    money = [
        "ss_list_price",
        "ss_sales_price",
        "ss_ext_sales_price",
        "ss_coupon_amt",
        "ss_net_profit",
    ]
    for c in money:
        df = df.withColumn(c, F.col(c).cast("decimal(7,2)"))
    return df


def gen_inventory(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """Weekly inventory snapshots: one row per (week-start date, item) with a
    deterministic on-hand quantity — enough rows for q22's rollup over a
    12-month window without the spec's full warehouse dimension."""
    n_item = max(10, int(sf * 18_000))
    n_weeks = _N_DATES // 7

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            week = k // n_item
            item = k % n_item + 1
            yield pd.DataFrame(
                {
                    "inv_date_sk": week * 7 + _DATE_BASE_SK,
                    "inv_item_sk": item,
                    "inv_warehouse_sk": k % 3 + 1,
                    "inv_quantity_on_hand": (
                        (k * 2654435761 % 1000).astype("int64")
                    ).astype("int32"),
                }
            )

    return _keyed(spark, n_weeks * n_item, partitions).mapInPandas(
        gen,
        schema="inv_date_sk long, inv_item_sk long, inv_warehouse_sk long, "
        "inv_quantity_on_hand int",
    )


TPCDS_GENERATORS = {
    "date_dim": gen_date_dim,
    "item": gen_item,
    "store": gen_store,
    "customer_demographics": gen_customer_demographics,
    "promotion": gen_promotion,
    "store_sales": gen_store_sales,
    "inventory": gen_inventory,
}


def generate_tpcds(
    spark: SparkSession, table: str, sf: float = 0.01, partitions: int | None = None
) -> DataFrame:
    return TPCDS_GENERATORS[table](spark, sf, partitions=partitions)
