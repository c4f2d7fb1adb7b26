"""Deterministic on-the-fly TPC-DS-style data generation (core star subset).

Capability parity with the reference's TPCDS DSv2 connector
(extensions/spark/kyuubi-spark-connector-tpcds/.../TPCDSBatchScan.scala:31-95
— per-chunk row generators over a split key space; schemas
TPCDSSchemaUtils.scala:31-80).  Spark-first equivalent of the same design as
sources/datagen.py: `spark.range(n)` is the partitioned key space and
`mapInPandas` turns Arrow batches of keys into rows, so generation is
embarrassingly parallel and identical for any partition count.

Covered tables — all three sales channels with their returns plus the
dimensions the cross-channel queries touch: ``date_dim``, ``item``,
``store``, ``customer_demographics``, ``promotion``, ``customer``,
``customer_address``, ``warehouse``, ``inventory``, ``store_sales`` /
``store_returns``, ``catalog_sales`` / ``catalog_returns``, ``web_sales``
/ ``web_returns``.  Money columns are exact DECIMALs as in the spec,
which also makes cross-engine sums exact (no float association ambiguity
between Spark and an oracle engine).  Each returns table regenerates its
parent sale's fields from the shared per-key formula (``_ss_fields`` /
``_cs_fields`` / ``_ws_fields``) instead of joining — referential
integrity with zero generation-time shuffle.
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
_COLORS = ["orchid", "maroon", "steel", "navy", "ivory", "chocolate",
           "salmon", "peach"]
_UNITS = ["Each", "Dozen", "Case", "Pallet", "Ounce"]
_SIZES = ["small", "medium", "large", "extra large", "petite"]
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
                    # TPC-DS convention: 0=Sunday .. 6=Saturday
                    "d_dow": ((dates.dayofweek + 1) % 7).astype("int32"),
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
        "d_moy int, d_dom int, d_qoy int, d_day_name string, d_dow int, "
        "d_week_seq int, d_month_seq int",
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
                    "i_color": [_COLORS[int(i)] for i in keys * 13 % len(_COLORS)],
                    "i_units": [_UNITS[int(i)] for i in keys * 11 % len(_UNITS)],
                    "i_size": [_SIZES[int(i)] for i in keys * 19 % len(_SIZES)],
                    # large odd multiplier so the 1.00-99.99 price domain is
                    # covered even when the item count is tiny (a small
                    # stride never wraps the modulus at low SF, collapsing
                    # every price below ~$4 and emptying price-band queries)
                    "i_current_price": (
                        (keys * 7919 % 9900 + 100) / 100.0
                    ).round(2),
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="i_item_sk long, i_item_id string, i_product_name string, "
        "i_brand_id long, i_brand string, i_class_id long, i_class string, "
        "i_category_id long, i_category string, i_manufact_id long, "
        "i_manufact string, i_manager_id long, i_color string, "
        "i_units string, i_size string, i_current_price double",
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
            _ZIPS[i % len(_ZIPS)],
            _CITIES[i % len(_CITIES)],
            _COUNTIES[i % len(_COUNTIES)],
            i % 10 + 1,
            200 + i * 37 % 150,
            5_000_000 + i * 250_000,
            i % 3 + 1,
            str(100 + i * 7),
            f"{_CITIES[(i + 1) % len(_CITIES)]} Blvd",
            "Suite " + str(i % 9 * 10),
            -(5 + i % 4),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "s_store_sk long, s_store_id string, s_store_name string, "
        "s_company_name string, s_state string, s_zip string, "
        "s_city string, s_county string, s_market_id long, "
        "s_number_employees int, s_floor_space long, s_company_id long, "
        "s_street_number string, s_street_name string, "
        "s_suite_number string, s_gmt_offset int",
    )


def gen_customer_demographics(
    spark: SparkSession, sf: float = 1.0, partitions: int | None = None
) -> DataFrame:
    """All gender × marital × education combinations (spec's cross
    product), plus deterministic purchase-estimate / credit-rating /
    dependent-count attributes (q10's grouping set)."""
    ratings = ["Low Risk", "Good", "High Risk", "Unknown"]
    rows = []
    sk = 1
    for g in _GENDERS:
        for m in _MARITAL:
            for e in _EDUCATION:
                rows.append((
                    sk, g, m, e,
                    (sk * 7 % 20) * 500 + 500,
                    ratings[sk % len(ratings)],
                    sk % 7,
                    sk % 5,
                    sk % 3,
                ))
                sk += 1
    return spark.createDataFrame(
        rows,
        "cd_demo_sk long, cd_gender string, cd_marital_status string, "
        "cd_education_status string, cd_purchase_estimate int, "
        "cd_credit_rating string, cd_dep_count int, "
        "cd_dep_employed_count int, cd_dep_college_count int",
    )


def gen_promotion(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(3, int(sf * 300))
    rows = [
        (
            i + 1,
            f"AAAAAAAA{i:08d}",
            "Y" if i % 3 == 0 else "N",
            "Y" if i % 5 == 0 else "N",
            "Y" if i % 2 == 0 else "N",
            "Y" if i % 4 == 0 else "N",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "p_promo_sk long, p_promo_id string, p_channel_email string, "
        "p_channel_event string, p_channel_dmail string, "
        "p_channel_tv string",
    )


def _n_customer(sf: float) -> int:
    return max(1, int(sf * 100_000) or 1000)


def _n_address(sf: float) -> int:
    return max(50, int(sf * 50_000))


_N_WAREHOUSE = 5
_N_HD = 60       # household_demographics rows (20 income bands x 3 profiles)
_N_IB = 20       # income_band rows
_N_REASON = 10   # reason rows
_BUY_POTENTIAL = ["0-500", "501-1000", "1001-5000", "5001-10000",
                  ">10000", "Unknown"]
_REASONS = [
    "Did not like the warranty",
    "Package was damaged",
    "Wrong size",
    "Not the product that was ordered",
    "Found a better price",
    "Changed mind",
    "Gift exchange",
    "Did not fit",
    "Stopped working",
    "Duplicate purchase",
]


def _ss_fields(k: np.ndarray, sf: float) -> dict:
    """store_sales row derivation for key array k — shared with the
    store_returns generator so a return can recompute its parent sale
    without any join (generation stays embarrassingly parallel)."""
    n_item = max(10, int(sf * 18_000))
    n_store = max(2, int(sf * 12))
    n_cd = len(_GENDERS) * len(_MARITAL) * len(_EDUCATION)
    n_promo = max(3, int(sf * 300))
    list_cents = k * 7919 % 19_900 + 100  # 1.00 .. 199.99
    sales_cents = list_cents * (50 + k * 31 % 50) // 100  # 50-99% of list
    qty = (k * 2654435761 % 100 + 1).astype("int64")
    coupon_cents = np.where(k % 7 == 0, sales_cents // 10, 0)
    cost_cents = list_cents * (30 + k * 13 % 40) // 100
    ext_cents = sales_cents * qty
    profit_cents = ext_cents - cost_cents * qty - coupon_cents
    ext_list_cents = list_cents * qty
    ext_wholesale_cents = cost_cents * qty
    ext_tax_cents = ext_cents * (k % 9) // 100  # 0-8% tax
    return {
        "sold_date_sk": k * 6364136223846793005 % _N_DATES + _DATE_BASE_SK,
        "item_sk": k * 48271 % n_item + 1,
        "store_sk": k * 69621 % n_store + 1,
        "customer_sk": k * 977 % _n_customer(sf) + 1,
        "cdemo_sk": k * 31 % n_cd + 1,
        "hdemo_sk": k * 17 % _N_HD + 1,
        "addr_sk": k * 23 % _n_address(sf) + 1,
        "promo_sk": k * 13 % n_promo + 1,
        "ticket_number": k // 4 + 1,
        "qty": qty,
        "list_cents": list_cents,
        "cost_cents": cost_cents,
        "sales_cents": sales_cents,
        "coupon_cents": coupon_cents,
        "ext_cents": ext_cents,
        "ext_list_cents": ext_list_cents,
        "ext_wholesale_cents": ext_wholesale_cents,
        "ext_tax_cents": ext_tax_cents,
        "profit_cents": profit_cents,
    }


def gen_store_sales(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """Fact table; every money column an exact DECIMAL(9,2) (the
    shared _money helper's cast)."""
    n = max(1000, int(sf * 2_880_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            f = _ss_fields(k, sf)
            yield pd.DataFrame(
                {
                    "ss_sold_date_sk": f["sold_date_sk"],
                    "ss_sold_time_sk": k * 40847 % _N_TIMES,
                    "ss_item_sk": f["item_sk"],
                    "ss_store_sk": f["store_sk"],
                    "ss_customer_sk": f["customer_sk"],
                    "ss_cdemo_sk": f["cdemo_sk"],
                    "ss_hdemo_sk": f["hdemo_sk"],
                    # deterministic NULL slice (q76's null-key report);
                    # nullable Int64 so Arrow carries real NULLs
                    "ss_addr_sk": pd.array(
                        np.where(k % 13 == 0, None, f["addr_sk"]),
                        dtype="Int64",
                    ),
                    "ss_promo_sk": f["promo_sk"],
                    "ss_ticket_number": f["ticket_number"],
                    "ss_quantity": f["qty"].astype("int32"),
                    "ss_list_price": f["list_cents"] / 100.0,
                    "ss_wholesale_cost": f["cost_cents"] / 100.0,
                    "ss_sales_price": f["sales_cents"] / 100.0,
                    "ss_ext_sales_price": f["ext_cents"] / 100.0,
                    "ss_ext_list_price": f["ext_list_cents"] / 100.0,
                    "ss_ext_wholesale_cost": f["ext_wholesale_cents"] / 100.0,
                    "ss_ext_discount_amt": (
                        f["ext_list_cents"] - f["ext_cents"]
                    ) / 100.0,
                    "ss_ext_tax": f["ext_tax_cents"] / 100.0,
                    "ss_net_paid": (f["ext_cents"] - f["coupon_cents"]) / 100.0,
                    "ss_coupon_amt": f["coupon_cents"] / 100.0,
                    "ss_net_profit": f["profit_cents"] / 100.0,
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="ss_sold_date_sk long, ss_sold_time_sk long, "
        "ss_item_sk long, ss_store_sk long, "
        "ss_customer_sk long, ss_cdemo_sk long, ss_hdemo_sk long, "
        "ss_addr_sk long, ss_promo_sk long, "
        "ss_ticket_number long, ss_quantity int, ss_list_price double, "
        "ss_wholesale_cost double, ss_sales_price double, ss_ext_sales_price double, "
        "ss_ext_list_price double, ss_ext_wholesale_cost double, "
        "ss_ext_discount_amt double, ss_ext_tax double, "
        "ss_net_paid double, ss_coupon_amt double, ss_net_profit double",
    )
    return _money(df, [
        "ss_list_price",
        "ss_wholesale_cost",
        "ss_sales_price",
        "ss_ext_sales_price",
        "ss_ext_list_price",
        "ss_ext_wholesale_cost",
        "ss_ext_discount_amt",
        "ss_ext_tax",
        "ss_net_paid",
        "ss_coupon_amt",
        "ss_net_profit",
    ])


def _money(df: DataFrame, cols: list[str]) -> DataFrame:
    from pyspark.sql import functions as F

    for c in cols:
        df = df.withColumn(c, F.col(c).cast("decimal(9,2)"))
    return df


def gen_store_returns(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """~22% of store sales return: keys k % 9 < 2 of the sales key space.

    The parent sale's fields are recomputed from the key (same formulas as
    gen_store_sales), so (sr_item_sk, sr_ticket_number, sr_customer_sk)
    always resolve against store_sales — referential integrity without a
    generation-time join."""
    n = max(1000, int(sf * 2_880_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            k = k[k % 9 < 2]
            if len(k) == 0:
                continue
            f = _ss_fields(k, sf)
            ret_qty = np.maximum(1, f["qty"] * (k % 50 + 25) // 100)
            amt_cents = f["sales_cents"] * ret_qty
            fee_cents = amt_cents // 20 + 150
            loss_cents = amt_cents // 10 + 500  # restock fee + handling
            yield pd.DataFrame(
                {
                    "sr_returned_date_sk": np.minimum(
                        f["sold_date_sk"] + k % 40 + 3,
                        _DATE_BASE_SK + _N_DATES - 1,
                    ),
                    "sr_item_sk": f["item_sk"],
                    "sr_customer_sk": f["customer_sk"],
                    "sr_cdemo_sk": f["cdemo_sk"],
                    "sr_reason_sk": k * 7 % _N_REASON + 1,
                    "sr_store_sk": f["store_sk"],
                    "sr_ticket_number": f["ticket_number"],
                    "sr_return_quantity": ret_qty.astype("int32"),
                    "sr_return_amt": amt_cents / 100.0,
                    "sr_fee": fee_cents / 100.0,
                    "sr_net_loss": loss_cents / 100.0,
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="sr_returned_date_sk long, sr_item_sk long, sr_customer_sk long, "
        "sr_cdemo_sk long, sr_reason_sk long, "
        "sr_store_sk long, sr_ticket_number long, sr_return_quantity int, "
        "sr_return_amt double, sr_fee double, sr_net_loss double",
    )
    return _money(df, ["sr_return_amt", "sr_fee", "sr_net_loss"])


def _cs_fields(k: np.ndarray, sf: float) -> dict:
    """catalog_sales row derivation (own hash streams; shared with
    catalog_returns)."""
    n_item = max(10, int(sf * 18_000))
    n_promo = max(3, int(sf * 300))
    list_cents = k * 104729 % 19_900 + 100
    sales_cents = list_cents * (55 + k * 17 % 45) // 100
    qty = (k * 2862933555777941757 % 100 + 1).astype("int64")
    cost_cents = list_cents * (30 + k * 19 % 40) // 100
    ext_cents = sales_cents * qty
    ext_list_cents = list_cents * qty
    wholesale_cents = cost_cents * qty
    disc_cents = ext_list_cents - ext_cents
    coupon_cents = np.where(k % 5 == 0, ext_cents // 8, 0)
    profit_cents = ext_cents - cost_cents * qty
    sold = k * 2654435761 % _N_DATES
    n_cd = len(_GENDERS) * len(_MARITAL) * len(_EDUCATION)
    return {
        "sold_date_sk": sold + _DATE_BASE_SK,
        "ship_date_sk": np.minimum(sold + k % 30 + 2, _N_DATES - 1)
        + _DATE_BASE_SK,
        "item_sk": k * 16807 % n_item + 1,
        "customer_sk": k * 48271 % _n_customer(sf) + 1,
        "ship_customer_sk": (k * 48271 + 13 * (k % 3 == 0)) % _n_customer(sf)
        + 1,
        "cdemo_sk": k * 37 % n_cd + 1,
        "bill_addr_sk": k * 19 % _n_address(sf) + 1,
        "ship_addr_sk": k * 11 % _n_address(sf) + 1,
        "warehouse_sk": k % _N_WAREHOUSE + 1,
        "promo_sk": k * 7 % n_promo + 1,
        "order_number": k // 3 + 1,
        "qty": qty,
        "list_cents": list_cents,
        "cost_cents": cost_cents,
        "sales_cents": sales_cents,
        "ext_cents": ext_cents,
        "ext_list_cents": ext_list_cents,
        "wholesale_cents": wholesale_cents,
        "disc_cents": disc_cents,
        "coupon_cents": coupon_cents,
        "ship_cents": ext_cents // 20 + 99,
        "profit_cents": profit_cents,
    }


def gen_catalog_sales(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(500, int(sf * 1_440_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            f = _cs_fields(k, sf)
            yield pd.DataFrame(
                {
                    "cs_sold_date_sk": f["sold_date_sk"],
                    "cs_sold_time_sk": k * 16807 % _N_TIMES,
                    "cs_ship_date_sk": f["ship_date_sk"],
                    "cs_item_sk": f["item_sk"],
                    "cs_bill_customer_sk": f["customer_sk"],
                    "cs_ship_customer_sk": f["ship_customer_sk"],
                    "cs_bill_cdemo_sk": f["cdemo_sk"],
                    "cs_bill_addr_sk": f["bill_addr_sk"],
                    "cs_ship_addr_sk": f["ship_addr_sk"],
                    "cs_warehouse_sk": pd.array(
                        np.where(k % 17 == 0, None, f["warehouse_sk"]),
                        dtype="Int64",
                    ),
                    "cs_ship_mode_sk": k * 13 % len(_SHIP_MODES) + 1,
                    "cs_promo_sk": f["promo_sk"],
                    "cs_order_number": f["order_number"],
                    "cs_quantity": f["qty"].astype("int32"),
                    "cs_list_price": f["list_cents"] / 100.0,
                    "cs_wholesale_cost": f["cost_cents"] / 100.0,
                    "cs_sales_price": f["sales_cents"] / 100.0,
                    "cs_ext_sales_price": f["ext_cents"] / 100.0,
                    "cs_ext_list_price": f["ext_list_cents"] / 100.0,
                    "cs_ext_discount_amt": f["disc_cents"] / 100.0,
                    "cs_coupon_amt": f["coupon_cents"] / 100.0,
                    "cs_ext_ship_cost": f["ship_cents"] / 100.0,
                    "cs_ext_wholesale_cost": f["wholesale_cents"] / 100.0,
                    "cs_net_paid_inc_ship_tax": (
                        f["ext_cents"] + f["ship_cents"]
                        + f["ext_cents"] * (k % 9) // 100
                    ) / 100.0,
                    "cs_net_profit": f["profit_cents"] / 100.0,
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="cs_sold_date_sk long, cs_sold_time_sk long, "
        "cs_ship_date_sk long, cs_item_sk long, "
        "cs_bill_customer_sk long, cs_ship_customer_sk long, "
        "cs_bill_cdemo_sk long, "
        "cs_bill_addr_sk long, cs_ship_addr_sk long, cs_warehouse_sk long, "
        "cs_ship_mode_sk long, cs_promo_sk long, "
        "cs_order_number long, cs_quantity int, cs_list_price double, "
        "cs_wholesale_cost double, cs_sales_price double, cs_ext_sales_price double, "
        "cs_ext_list_price double, cs_ext_discount_amt double, "
        "cs_coupon_amt double, cs_ext_ship_cost double, "
        "cs_ext_wholesale_cost double, cs_net_paid_inc_ship_tax double, "
        "cs_net_profit double",
    )
    return _money(df, [
        "cs_list_price",
        "cs_wholesale_cost",
        "cs_sales_price",
        "cs_ext_sales_price",
        "cs_ext_list_price",
        "cs_ext_discount_amt",
        "cs_coupon_amt",
        "cs_ext_ship_cost",
        "cs_ext_wholesale_cost",
        "cs_net_paid_inc_ship_tax",
        "cs_net_profit",
    ])


def gen_catalog_returns(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """~28% of catalog sales return (keys k % 7 < 2); refunded cash /
    reversed charge / store credit split the return amount exactly."""
    n = max(500, int(sf * 1_440_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            k = k[k % 7 < 2]
            if len(k) == 0:
                continue
            f = _cs_fields(k, sf)
            ret_qty = np.maximum(1, f["qty"] * (k % 60 + 20) // 100)
            amt_cents = f["sales_cents"] * ret_qty
            inc_tax_cents = amt_cents + amt_cents * (k % 9) // 100
            cash_cents = amt_cents * (k % 60 + 20) // 100
            charge_cents = (amt_cents - cash_cents) * (k % 50) // 100
            credit_cents = amt_cents - cash_cents - charge_cents
            loss_cents = amt_cents // 10 + 700
            yield pd.DataFrame(
                {
                    "cr_returned_date_sk": np.minimum(
                        f["sold_date_sk"] + k % 40 + 3,
                        _DATE_BASE_SK + _N_DATES - 1,
                    ),
                    "cr_item_sk": f["item_sk"],
                    "cr_returning_customer_sk": f["customer_sk"],
                    "cr_warehouse_sk": f["warehouse_sk"],
                    "cr_order_number": f["order_number"],
                    "cr_returning_addr_sk": f["bill_addr_sk"],
                    "cr_return_quantity": ret_qty.astype("int32"),
                    "cr_return_amount": amt_cents / 100.0,
                    "cr_return_amt_inc_tax": inc_tax_cents / 100.0,
                    "cr_refunded_cash": cash_cents / 100.0,
                    "cr_reversed_charge": charge_cents / 100.0,
                    "cr_store_credit": credit_cents / 100.0,
                    "cr_net_loss": loss_cents / 100.0,
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="cr_returned_date_sk long, cr_item_sk long, "
        "cr_returning_customer_sk long, cr_warehouse_sk long, "
        "cr_returning_addr_sk long, "
        "cr_order_number long, cr_return_quantity int, "
        "cr_return_amount double, cr_return_amt_inc_tax double, "
        "cr_refunded_cash double, "
        "cr_reversed_charge double, cr_store_credit double, "
        "cr_net_loss double",
    )
    return _money(df, [
        "cr_return_amount",
        "cr_return_amt_inc_tax",
        "cr_refunded_cash",
        "cr_reversed_charge",
        "cr_store_credit",
        "cr_net_loss",
    ])


def _ws_fields(k: np.ndarray, sf: float) -> dict:
    """web_sales row derivation (own hash streams; shared with
    web_returns).  Orders span 2 consecutive keys so most orders ship
    from more than one warehouse (q94/q95's EXISTS shape needs that)."""
    n_item = max(10, int(sf * 18_000))
    list_cents = k * 75193 % 19_900 + 100
    sales_cents = list_cents * (60 + k * 23 % 40) // 100
    qty = (k * 6364136223846793005 % 100 + 1).astype("int64")
    cost_cents = list_cents * (35 + k * 29 % 35) // 100
    ext_cents = sales_cents * qty
    ext_list_cents = list_cents * qty
    wholesale_cents = cost_cents * qty
    disc_cents = ext_list_cents - ext_cents
    profit_cents = ext_cents - cost_cents * qty
    sold = k * 48271 % _N_DATES
    return {
        "sold_date_sk": sold + _DATE_BASE_SK,
        "ship_date_sk": np.minimum(sold + k % 90 + 1, _N_DATES - 1)
        + _DATE_BASE_SK,
        "item_sk": k * 69621 % n_item + 1,
        "customer_sk": k * 104729 % _n_customer(sf) + 1,
        "warehouse_sk": k % _N_WAREHOUSE + 1,
        "bill_addr_sk": k * 37 % _n_address(sf) + 1,
        "ship_addr_sk": k * 31 % _n_address(sf) + 1,
        "order_number": k // 2 + 1,
        "qty": qty,
        "list_cents": list_cents,
        "cost_cents": cost_cents,
        "sales_cents": sales_cents,
        "ext_cents": ext_cents,
        "ext_list_cents": ext_list_cents,
        "wholesale_cents": wholesale_cents,
        "disc_cents": disc_cents,
        "ship_cents": ext_cents // 25 + 149,
        "profit_cents": profit_cents,
    }


def gen_web_sales(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(500, int(sf * 720_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            f = _ws_fields(k, sf)
            yield pd.DataFrame(
                {
                    "ws_sold_date_sk": f["sold_date_sk"],
                    "ws_sold_time_sk": k * 75193 % _N_TIMES,
                    "ws_ship_date_sk": f["ship_date_sk"],
                    "ws_item_sk": f["item_sk"],
                    "ws_bill_customer_sk": f["customer_sk"],
                    "ws_warehouse_sk": f["warehouse_sk"],
                    "ws_ship_hdemo_sk": k * 23 % _N_HD + 1,
                    # NULL slice keyed off a stream independent of the
                    # returns slice (k % 11 < 2) — a correlated modulus
                    # would make every returned sale's page NULL and
                    # empty q85's ws x wr x web_page join
                    "ws_web_page_sk": pd.array(
                        np.where((k * 7 + 3) % 13 < 3, None, k % 5 + 1),
                        dtype="Int64",
                    ),
                    "ws_ship_mode_sk": k * 7 % len(_SHIP_MODES) + 1,
                    "ws_promo_sk": k * 11 % max(3, int(sf * 300)) + 1,
                    "ws_bill_addr_sk": f["bill_addr_sk"],
                    "ws_ship_addr_sk": f["ship_addr_sk"],
                    "ws_order_number": f["order_number"],
                    "ws_quantity": f["qty"].astype("int32"),
                    "ws_list_price": f["list_cents"] / 100.0,
                    "ws_wholesale_cost": f["cost_cents"] / 100.0,
                    "ws_sales_price": f["sales_cents"] / 100.0,
                    "ws_ext_sales_price": f["ext_cents"] / 100.0,
                    "ws_ext_list_price": f["ext_list_cents"] / 100.0,
                    "ws_ext_discount_amt": f["disc_cents"] / 100.0,
                    "ws_ext_ship_cost": f["ship_cents"] / 100.0,
                    "ws_ext_wholesale_cost": f["wholesale_cents"] / 100.0,
                    "ws_net_paid": f["ext_cents"] / 100.0,
                    "ws_net_paid_inc_tax": (
                        f["ext_cents"] + f["ext_cents"] * (k % 9) // 100
                    ) / 100.0,
                    "ws_net_profit": f["profit_cents"] / 100.0,
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="ws_sold_date_sk long, ws_sold_time_sk long, "
        "ws_ship_date_sk long, ws_item_sk long, "
        "ws_bill_customer_sk long, ws_warehouse_sk long, "
        "ws_ship_hdemo_sk long, "
        "ws_web_page_sk long, ws_ship_mode_sk long, ws_promo_sk long, "
        "ws_bill_addr_sk long, ws_ship_addr_sk long, "
        "ws_order_number long, ws_quantity int, ws_list_price double, "
        "ws_wholesale_cost double, ws_sales_price double, ws_ext_sales_price double, "
        "ws_ext_list_price double, ws_ext_discount_amt double, "
        "ws_ext_ship_cost double, ws_ext_wholesale_cost double, "
        "ws_net_paid double, ws_net_paid_inc_tax double, "
        "ws_net_profit double",
    )
    return _money(df, [
        "ws_list_price",
        "ws_wholesale_cost",
        "ws_sales_price",
        "ws_ext_sales_price",
        "ws_ext_list_price",
        "ws_ext_discount_amt",
        "ws_ext_ship_cost",
        "ws_ext_wholesale_cost",
        "ws_net_paid",
        "ws_net_paid_inc_tax",
        "ws_net_profit",
    ])


def gen_web_returns(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """~18% of web sales return (keys k % 11 < 2)."""
    n = max(500, int(sf * 720_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            k = k[k % 11 < 2]
            if len(k) == 0:
                continue
            f = _ws_fields(k, sf)
            ret_qty = np.maximum(1, f["qty"] * (k % 70 + 15) // 100)
            amt_cents = f["sales_cents"] * ret_qty
            cash_cents = amt_cents * (k % 70 + 15) // 100
            fee_cents = amt_cents // 15 + 120
            loss_cents = amt_cents // 8 + 300
            yield pd.DataFrame(
                {
                    "wr_returned_date_sk": np.minimum(
                        f["sold_date_sk"] + k % 60 + 3,
                        _DATE_BASE_SK + _N_DATES - 1,
                    ),
                    "wr_item_sk": f["item_sk"],
                    "wr_returning_customer_sk": f["customer_sk"],
                    "wr_returning_addr_sk": f["bill_addr_sk"],
                    "wr_refunded_addr_sk": f["ship_addr_sk"],
                    "wr_refunded_cdemo_sk": k * 31 % (
                        len(_GENDERS) * len(_MARITAL) * len(_EDUCATION)
                    ) + 1,
                    "wr_returning_cdemo_sk": k * 31 % (
                        len(_GENDERS) * len(_MARITAL) * len(_EDUCATION)
                    ) + 1,
                    "wr_reason_sk": k * 3 % _N_REASON + 1,
                    "wr_warehouse_sk": f["warehouse_sk"],
                    "wr_order_number": f["order_number"],
                    "wr_return_quantity": ret_qty.astype("int32"),
                    "wr_return_amt": amt_cents / 100.0,
                    "wr_refunded_cash": cash_cents / 100.0,
                    "wr_fee": fee_cents / 100.0,
                    "wr_net_loss": loss_cents / 100.0,
                }
            )

    df = _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="wr_returned_date_sk long, wr_item_sk long, "
        "wr_returning_customer_sk long, wr_returning_addr_sk long, "
        "wr_refunded_addr_sk long, wr_refunded_cdemo_sk long, "
        "wr_returning_cdemo_sk long, wr_reason_sk long, "
        "wr_warehouse_sk long, "
        "wr_order_number long, wr_return_quantity int, "
        "wr_return_amt double, wr_refunded_cash double, wr_fee double, "
        "wr_net_loss double",
    )
    return _money(df, ["wr_return_amt", "wr_refunded_cash", "wr_fee",
                       "wr_net_loss"])


_SALUTATIONS = ["Mr.", "Mrs.", "Ms.", "Dr.", "Sir"]
_FIRST_NAMES = ["James", "Mary", "John", "Linda", "Robert", "Susan", "Luis",
                "Aisha", "Wei", "Priya"]
_LAST_NAMES = ["Smith", "Garcia", "Chen", "Johnson", "Patel", "Brown",
               "Nguyen", "Lopez", "Kim", "Mueller"]
_CITIES = ["Fairview", "Midway", "Riverside", "Centerville", "Oakland",
           "Springdale", "Georgetown", "Greenville"]
_COUNTIES = ["Williamson County", "Walker County", "Ziebach County",
             "Daviess County", "Barrow County"]
_CA_STATES = ["TN", "CA", "NY", "TX", "WA", "GA", "SD", "IN", "OH", "IL"]
# one shared zip pool for stores AND addresses, so q24-style s_zip = ca_zip
# equi-joins have matches by construction
_ZIPS = [f"{37000 + i * 13 % 60000:05d}" for i in range(12)]
_COUNTRIES = ["United States", "Canada", "Mexico", "Brazil"]


def gen_customer(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """Customer dimension covering the fact generators' customer key
    domain; first-sale/first-ship dates land inside date_dim."""
    n = _n_customer(sf)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            first = k * 31 % len(_FIRST_NAMES)
            last = k * 17 % len(_LAST_NAMES)
            sal = k * 7 % len(_SALUTATIONS)
            yield pd.DataFrame(
                {
                    "c_customer_sk": k + 1,
                    "c_customer_id": [f"AAAAAAAA{int(x):08d}" for x in k],
                    "c_salutation": [_SALUTATIONS[int(i)] for i in sal],
                    "c_first_name": [_FIRST_NAMES[int(i)] for i in first],
                    "c_last_name": [_LAST_NAMES[int(i)] for i in last],
                    "c_preferred_cust_flag": np.where(k % 3 == 0, "Y", "N"),
                    "c_birth_year": (1920 + k * 13 % 73).astype("int32"),
                    "c_birth_month": (k * 11 % 12 + 1).astype("int32"),
                    "c_birth_day": (k * 5 % 28 + 1).astype("int32"),
                    "c_login": [f"user{int(x):05d}" for x in k],
                    "c_email_address": [
                        f"user{int(x):05d}@example.com" for x in k
                    ],
                    "c_last_review_date_sk": k * 13 % _N_DATES
                    + _DATE_BASE_SK,
                    "c_birth_country": [
                        _COUNTRIES[int(i)].upper() for i in k * 3 % len(_COUNTRIES)
                    ],
                    "c_current_cdemo_sk": k * 29 % (
                        len(_GENDERS) * len(_MARITAL) * len(_EDUCATION)
                    ) + 1,
                    "c_current_hdemo_sk": k * 41 % _N_HD + 1,
                    "c_current_addr_sk": k * 7 % _n_address(sf) + 1,
                    "c_first_sales_date_sk": k * 977 % _N_DATES
                    + _DATE_BASE_SK,
                    "c_first_shipto_date_sk": np.minimum(
                        k * 977 % _N_DATES + k % 30, _N_DATES - 1
                    )
                    + _DATE_BASE_SK,
                }
            )

    return _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="c_customer_sk long, c_customer_id string, "
        "c_salutation string, c_first_name string, "
        "c_last_name string, c_preferred_cust_flag string, c_birth_year int, "
        "c_birth_month int, c_birth_day int, c_login string, "
        "c_email_address string, c_last_review_date_sk long, "
        "c_birth_country string, c_current_cdemo_sk long, "
        "c_current_hdemo_sk long, c_current_addr_sk long, "
        "c_first_sales_date_sk long, c_first_shipto_date_sk long",
    )


def gen_customer_address(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = _n_address(sf)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "ca_address_sk": k + 1,
                    "ca_address_id": [f"AAAAAAAA{int(x):08d}" for x in k],
                    "ca_street_number": (k * 7 % 999 + 1).astype("int64")
                    .astype(str),
                    "ca_street_name": [
                        f"{_CITIES[int(i)]} Way" for i in k % len(_CITIES)
                    ],
                    "ca_street_type": [
                        ["Way", "Blvd", "Ave", "St"][int(i)] for i in k % 4
                    ],
                    "ca_suite_number": [
                        f"Suite {int(i) * 10}" for i in k % 9
                    ],
                    "ca_location_type": [
                        ["condo", "single family", "apartment"][int(i)]
                        for i in k % 3
                    ],
                    "ca_city": [_CITIES[int(i)] for i in k * 3 % len(_CITIES)],
                    "ca_county": [
                        _COUNTIES[int(i)] for i in k * 11 % len(_COUNTIES)
                    ],
                    "ca_state": [
                        _CA_STATES[int(i)] for i in k * 13 % len(_CA_STATES)
                    ],
                    "ca_zip": [_ZIPS[int(i)] for i in k * 89 % len(_ZIPS)],
                    "ca_country": "United States",
                    "ca_gmt_offset": (-(5 + k % 4)).astype("int32"),
                }
            )

    return _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="ca_address_sk long, ca_address_id string, "
        "ca_street_number string, ca_street_name string, "
        "ca_street_type string, ca_suite_number string, "
        "ca_location_type string, ca_city string, "
        "ca_county string, ca_state string, ca_zip string, ca_country string, "
        "ca_gmt_offset int",
    )


def gen_warehouse(spark: SparkSession, sf: float = 1.0, partitions: int | None = None) -> DataFrame:
    states = ["TN", "CA", "NY", "TX", "WA"]
    rows = [
        (
            i + 1,
            f"AAAAAAAA{i:08d}",
            f"warehouse {i}",
            100_000 + i * 37_500,
            _CITIES[i % len(_CITIES)],
            _COUNTIES[i % len(_COUNTIES)],
            states[i % len(states)],
            "United States",
        )
        for i in range(_N_WAREHOUSE)
    ]
    return spark.createDataFrame(
        rows,
        "w_warehouse_sk long, w_warehouse_id string, w_warehouse_name string, "
        "w_warehouse_sq_ft long, w_city string, w_county string, "
        "w_state string, w_country string",
    )


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


_SHIP_MODES = ["EXPRESS", "OVERNIGHT", "REGULAR", "TWO DAY", "LIBRARY"]
_N_TIMES = 86_400  # one row per second of day, spec-style


def gen_time_dim(
    spark: SparkSession, sf: float = 1.0, partitions: int | None = None
) -> DataFrame:
    """Second-of-day dimension (spec's 86,400-row time_dim): hour/minute/
    second decomposition + meal-time bands."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            k = pdf["id"].to_numpy()
            hour = k // 3600
            minute = k % 3600 // 60
            meal = np.select(
                [(hour >= 6) & (hour < 9), (hour >= 11) & (hour < 14),
                 (hour >= 17) & (hour < 20)],
                ["breakfast", "lunch", "dinner"],
                default=None,
            )
            yield pd.DataFrame(
                {
                    "t_time_sk": k,
                    "t_time_id": [f"AAAAAAAA{int(x):08d}" for x in k],
                    "t_time": k.astype("int64"),
                    "t_hour": hour.astype("int32"),
                    "t_minute": minute.astype("int32"),
                    "t_second": (k % 60).astype("int32"),
                    "t_am_pm": np.where(hour < 12, "AM", "PM"),
                    "t_meal_time": meal,
                }
            )

    return _keyed(spark, _N_TIMES, partitions).mapInPandas(
        gen,
        schema="t_time_sk long, t_time_id string, t_time long, t_hour int, "
        "t_minute int, t_second int, t_am_pm string, t_meal_time string",
    )


def gen_web_page(
    spark: SparkSession, sf: float = 1.0, partitions: int | None = None
) -> DataFrame:
    rows = [
        (i + 1, f"AAAAAAAA{i:08d}", 4900 + i * 100, "Y" if i % 2 else "N")
        for i in range(5)
    ]
    return spark.createDataFrame(
        rows,
        "wp_web_page_sk long, wp_web_page_id string, wp_char_count int, "
        "wp_autogen_flag string",
    )


def gen_ship_mode(
    spark: SparkSession, sf: float = 1.0, partitions: int | None = None
) -> DataFrame:
    rows = [
        (i + 1, f"AAAAAAAA{i:08d}", _SHIP_MODES[i], f"carrier {i % 3}")
        for i in range(len(_SHIP_MODES))
    ]
    return spark.createDataFrame(
        rows,
        "sm_ship_mode_sk long, sm_ship_mode_id string, sm_type string, "
        "sm_carrier string",
    )


def gen_household_demographics(
    spark: SparkSession, sf: float = 1.0, partitions: int | None = None
) -> DataFrame:
    """Income-band x buy-potential x dependents/vehicles profiles
    (spec's 7200-row cross product reduced to 60 deterministic rows)."""
    rows = [
        (
            i + 1,
            (i % _N_IB) + 1,
            _BUY_POTENTIAL[i % len(_BUY_POTENTIAL)],
            i % 10,
            i % 6,
        )
        for i in range(_N_HD)
    ]
    return spark.createDataFrame(
        rows,
        "hd_demo_sk long, hd_income_band_sk long, hd_buy_potential string, "
        "hd_dep_count int, hd_vehicle_count int",
    )


def gen_income_band(
    spark: SparkSession, sf: float = 1.0, partitions: int | None = None
) -> DataFrame:
    rows = [(i + 1, i * 10_000, (i + 1) * 10_000 - 1) for i in range(_N_IB)]
    return spark.createDataFrame(
        rows, "ib_income_band_sk long, ib_lower_bound int, ib_upper_bound int"
    )


def gen_reason(
    spark: SparkSession, sf: float = 1.0, partitions: int | None = None
) -> DataFrame:
    rows = [(i + 1, f"AAAAAAAA{i:08d}", _REASONS[i]) for i in range(_N_REASON)]
    return spark.createDataFrame(
        rows, "r_reason_sk long, r_reason_id string, r_reason_desc string"
    )


TPCDS_GENERATORS = {
    "date_dim": gen_date_dim,
    "item": gen_item,
    "store": gen_store,
    "customer_demographics": gen_customer_demographics,
    "promotion": gen_promotion,
    "store_sales": gen_store_sales,
    "store_returns": gen_store_returns,
    "catalog_sales": gen_catalog_sales,
    "catalog_returns": gen_catalog_returns,
    "web_sales": gen_web_sales,
    "web_returns": gen_web_returns,
    "customer": gen_customer,
    "customer_address": gen_customer_address,
    "warehouse": gen_warehouse,
    "household_demographics": gen_household_demographics,
    "ship_mode": gen_ship_mode,
    "time_dim": gen_time_dim,
    "web_page": gen_web_page,
    "income_band": gen_income_band,
    "reason": gen_reason,
    "inventory": gen_inventory,
}


def generate_tpcds(
    spark: SparkSession, table: str, sf: float = 0.01, partitions: int | None = None
) -> DataFrame:
    return TPCDS_GENERATORS[table](spark, sf, partitions=partitions)
