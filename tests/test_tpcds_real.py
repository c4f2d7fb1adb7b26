"""Real TPC-DS SQL over the generated store-channel star.

The reference's TPC-DS connector generates tables on the fly and verifies
queries against golden schema+hash files (TPCDSBatchScan.scala,
OutputSchemaTPCDSSuite.scala).  Equivalent check here: generate the core
star with sources/tpcds_datagen.py, land it as parquet ONCE, then run
standard TPC-DS report queries (spec text, our parameter choices) both in
Spark (temp views) and DuckDB (views over the same files) and require
identical rows — engine-vs-engine on identical bytes, with DECIMAL money
so sums are exact in both engines.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

@pytest.fixture(scope="module")
def star(tpcds_star):
    # session-scoped generation lives in conftest.tpcds_star (shared with
    # test_tpcds_real2.py); this alias keeps the local test signatures
    return tpcds_star


def _canon(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                float(v) if hasattr(v, "scaleb") or isinstance(v, float) else v
                for v in r
            )
        )
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _compare(star, sql):
    spark, con = star
    got = _canon([tuple(r) for r in spark.sql(sql).collect()])
    want = _canon(con.execute(sql).fetchall())
    assert got == want and len(got) > 0


# q3 — brand revenue report for one month of one manufacturer
Q3 = """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       SUM(ss_ext_sales_price) AS sum_agg
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manufact_id < 30
  AND dt.d_moy = 11
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
"""

# q7 — demographic/promotion filtered averages per item
Q7 = """
SELECT i_item_id,
       AVG(ss_quantity) AS agg1,
       AVG(ss_list_price) AS agg2,
       AVG(ss_coupon_amt) AS agg3,
       AVG(ss_sales_price) AS agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk
  AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk
  AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'F'
  AND cd_marital_status = 'W'
  AND cd_education_status = 'Primary'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 1999
GROUP BY i_item_id
"""

# q55 — brand revenue for a manager's items in one month
Q55 = """
SELECT i_brand_id AS brand_id, i_brand AS brand,
       SUM(ss_ext_sales_price) AS ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id < 20
  AND d_moy = 11
  AND d_year IN (1999, 2000, 2001)
GROUP BY i_brand, i_brand_id
"""

# q36 — gross margin rollup hierarchy with rank within parent
Q36 = """
SELECT CAST(SUM(ss_net_profit) AS DOUBLE) / CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS gross_margin,
       i_category, i_class,
       GROUPING(i_category) + GROUPING(i_class) AS lochierarchy,
       RANK() OVER (
         PARTITION BY GROUPING(i_category) + GROUPING(i_class),
                      CASE WHEN GROUPING(i_class) = 0 THEN i_category END
         ORDER BY CAST(SUM(ss_net_profit) AS DOUBLE) / CAST(SUM(ss_ext_sales_price) AS DOUBLE) ASC
       ) AS rank_within_parent
FROM store_sales, date_dim d1, item, store
WHERE d1.d_year = 2001
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND s_state IN ('TN', 'CA')
GROUP BY ROLLUP (i_category, i_class)
"""

# q67 — wide rollup + rank per category, top slice by rank value
Q67 = """
SELECT * FROM (
  SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,
         s_store_id, sumsales,
         RANK() OVER (PARTITION BY i_category ORDER BY sumsales DESC) AS rk
  FROM (
    SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
           d_moy, s_store_id,
           SUM(COALESCE(ss_sales_price * ss_quantity, 0)) AS sumsales
    FROM store_sales, date_dim, store, item
    WHERE ss_sold_date_sk = d_date_sk
      AND ss_item_sk = i_item_sk
      AND ss_store_sk = s_store_sk
      AND d_month_seq BETWEEN 1212 AND 1212 + 11
    GROUP BY ROLLUP (i_category, i_class, i_brand, i_product_name, d_year,
                     d_qoy, d_moy, s_store_id)
  ) dw1
) dw2
WHERE rk <= 10
"""


@pytest.mark.parametrize(
    "name,sql",
    [("q3", Q3), ("q7", Q7), ("q55", Q55), ("q36", Q36), ("q67", Q67)],
)
def test_tpcds_query_cross_engine(star, name, sql):
    _compare(star, sql)


def test_generated_star_integrity(star):
    spark, con = star
    # fact keys resolve against every dimension
    for dim, key, fk in [
        ("date_dim", "d_date_sk", "ss_sold_date_sk"),
        ("item", "i_item_sk", "ss_item_sk"),
        ("store", "s_store_sk", "ss_store_sk"),
        ("customer_demographics", "cd_demo_sk", "ss_cdemo_sk"),
        ("promotion", "p_promo_sk", "ss_promo_sk"),
    ]:
        dangling = spark.sql(
            f"SELECT count(*) FROM store_sales LEFT ANTI JOIN {dim} "
            f"ON {fk} = {key}"
        ).collect()[0][0]
        assert dangling == 0, dim


# q22 — average quantity-on-hand over the item rollup hierarchy
Q22 = """
SELECT i_product_name, i_brand, i_class, i_category,
       AVG(inv_quantity_on_hand) AS qoh
FROM inventory, date_dim, item
WHERE inv_date_sk = d_date_sk
  AND inv_item_sk = i_item_sk
  AND d_month_seq BETWEEN 1212 AND 1212 + 11
GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
"""


def test_tpcds_q22_inventory_rollup(star):
    _compare(star, Q22)


# q42 — category revenue for one month under a manager filter
Q42 = """
SELECT dt.d_year, item.i_category_id, item.i_category,
       SUM(ss_ext_sales_price) AS sum_agg
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id <= 25
  AND dt.d_moy = 11
  AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_category_id, item.i_category
"""

# q52 — brand revenue report (q3's twin with the manager axis)
Q52 = """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       SUM(ss_ext_sales_price) AS ext_price
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id <= 25
  AND dt.d_moy = 11
  AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
"""

# q43 — store day-of-week pivot (spec's s_gmt_offset filter -> s_state)
Q43 = """
SELECT s_store_name, s_store_id,
       SUM(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE NULL END) AS sun_sales,
       SUM(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE NULL END) AS mon_sales,
       SUM(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price ELSE NULL END) AS tue_sales,
       SUM(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price ELSE NULL END) AS wed_sales,
       SUM(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price ELSE NULL END) AS thu_sales,
       SUM(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE NULL END) AS fri_sales,
       SUM(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE NULL END) AS sat_sales
FROM date_dim, store_sales, store
WHERE d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_state = 'TN'
  AND d_year = 2000
GROUP BY s_store_name, s_store_id
"""

# q63 — manager monthly sales vs their yearly monthly average
Q63 = """
SELECT * FROM (
  SELECT i_manager_id,
         CAST(SUM(ss_sales_price) AS DOUBLE) AS sum_sales,
         ROUND(CAST(SUM(SUM(ss_sales_price))
                      OVER (PARTITION BY i_manager_id) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY i_manager_id),
               4) AS avg_monthly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_year = 2000
    AND ((i_category IN ('Books', 'Home', 'Electronics')
          AND i_class IN ('classic', 'modern', 'value'))
      OR (i_category IN ('Shoes', 'Music', 'Sports')
          AND i_class IN ('premium', 'import', 'value')))
  GROUP BY i_manager_id, d_moy
) tmp1
WHERE CASE WHEN avg_monthly_sales > 0
           THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
"""

# q89 — class/store monthly sales deviating >10% from the yearly average
Q89 = """
SELECT * FROM (
  SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
         CAST(SUM(ss_sales_price) AS DOUBLE) AS sum_sales,
         ROUND(CAST(SUM(SUM(ss_sales_price)) OVER (
             PARTITION BY i_category, i_brand, s_store_name, s_company_name)
               AS DOUBLE)
           / COUNT(*) OVER (
             PARTITION BY i_category, i_brand, s_store_name, s_company_name),
           4) AS avg_monthly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_year IN (2000)
  GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name, d_moy
) tmp1
WHERE CASE WHEN (avg_monthly_sales <> 0)
           THEN (ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales)
           ELSE NULL END > 0.1
"""

# q65 — items selling at or below 10% above their store's average revenue
Q65 = """
SELECT s_store_name, i_item_id, sc.revenue
FROM store, item,
     (SELECT ss_store_sk,
             ROUND(CAST(SUM(revenue) AS DOUBLE) / COUNT(*), 4) AS ave
      FROM (SELECT ss_store_sk, ss_item_sk,
                   SUM(ss_sales_price) AS revenue
            FROM store_sales, date_dim
            WHERE ss_sold_date_sk = d_date_sk
              AND d_month_seq BETWEEN 1212 AND 1212 + 11
            GROUP BY ss_store_sk, ss_item_sk) sa
      GROUP BY ss_store_sk) sb,
     (SELECT ss_store_sk, ss_item_sk,
             CAST(SUM(ss_sales_price) AS DOUBLE) AS revenue
      FROM store_sales, date_dim
      WHERE ss_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 1212 AND 1212 + 11
      GROUP BY ss_store_sk, ss_item_sk) sc
WHERE sb.ss_store_sk = sc.ss_store_sk
  AND sc.revenue <= 0.9 * sb.ave
  AND s_store_sk = sc.ss_store_sk
  AND i_item_sk = sc.ss_item_sk
"""

# q59 — week-over-year same-store sales ratios on d_week_seq
Q59 = """
WITH wss AS (
  SELECT d_week_seq, ss_store_sk,
         SUM(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE NULL END) AS sun_sales,
         SUM(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE NULL END) AS mon_sales,
         SUM(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE NULL END) AS fri_sales,
         SUM(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE NULL END) AS sat_sales
  FROM store_sales, date_dim
  WHERE d_date_sk = ss_sold_date_sk
  GROUP BY d_week_seq, ss_store_sk
)
SELECT s_store_name1, s_store_id1, d_week_seq1,
       ROUND(CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE), 6) AS r_sun,
       ROUND(CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE), 6) AS r_mon,
       ROUND(CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE), 6) AS r_fri,
       ROUND(CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE), 6) AS r_sat
FROM (SELECT s_store_name AS s_store_name1, wss.d_week_seq AS d_week_seq1,
             s_store_id AS s_store_id1, sun_sales AS sun_sales1,
             mon_sales AS mon_sales1, fri_sales AS fri_sales1,
             sat_sales AS sat_sales1
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq
        AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 1212 AND 1212 + 11) y,
     (SELECT s_store_name AS s_store_name2, wss.d_week_seq AS d_week_seq2,
             s_store_id AS s_store_id2, sun_sales AS sun_sales2,
             mon_sales AS mon_sales2, fri_sales AS fri_sales2,
             sat_sales AS sat_sales2
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq
        AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 1212 + 12 AND 1212 + 23) x
WHERE s_store_id1 = s_store_id2
  AND d_week_seq1 = d_week_seq2 - 52
"""


@pytest.mark.parametrize(
    "name,sql",
    [("q42", Q42), ("q52", Q52), ("q43", Q43), ("q63", Q63), ("q89", Q89),
     ("q65", Q65), ("q59", Q59)],
)
def test_tpcds_query_cross_engine_batch2(star, name, sql):
    _compare(star, sql)


# q28 — six quantity-band scalar aggregate subqueries cross-joined
# (tpcds_3.2/q28.sql; bands re-centered on the generator's 1-100 quantity
# and 1-100 list-price domains)
Q28 = """
SELECT *
FROM (SELECT ROUND(CAST(sum(ss_list_price) AS DOUBLE)
                   / count(ss_list_price), 4) b1_lp,
             count(ss_list_price) b1_cnt,
             count(DISTINCT ss_list_price) b1_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 0 AND 5
        AND (ss_list_price BETWEEN 10 AND 20
             OR ss_coupon_amt BETWEEN 0 AND 50)) b1,
     (SELECT ROUND(CAST(sum(ss_list_price) AS DOUBLE)
                   / count(ss_list_price), 4) b2_lp,
             count(ss_list_price) b2_cnt,
             count(DISTINCT ss_list_price) b2_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 6 AND 10
        AND (ss_list_price BETWEEN 20 AND 30
             OR ss_coupon_amt BETWEEN 0 AND 50)) b2,
     (SELECT ROUND(CAST(sum(ss_list_price) AS DOUBLE)
                   / count(ss_list_price), 4) b3_lp,
             count(ss_list_price) b3_cnt,
             count(DISTINCT ss_list_price) b3_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 11 AND 15
        AND (ss_list_price BETWEEN 30 AND 40
             OR ss_coupon_amt BETWEEN 0 AND 50)) b3,
     (SELECT ROUND(CAST(sum(ss_list_price) AS DOUBLE)
                   / count(ss_list_price), 4) b4_lp,
             count(ss_list_price) b4_cnt,
             count(DISTINCT ss_list_price) b4_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 16 AND 20
        AND (ss_list_price BETWEEN 40 AND 50
             OR ss_coupon_amt BETWEEN 0 AND 50)) b4,
     (SELECT ROUND(CAST(sum(ss_list_price) AS DOUBLE)
                   / count(ss_list_price), 4) b5_lp,
             count(ss_list_price) b5_cnt,
             count(DISTINCT ss_list_price) b5_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 21 AND 25
        AND (ss_list_price BETWEEN 50 AND 60
             OR ss_coupon_amt BETWEEN 0 AND 50)) b5,
     (SELECT ROUND(CAST(sum(ss_list_price) AS DOUBLE)
                   / count(ss_list_price), 4) b6_lp,
             count(ss_list_price) b6_cnt,
             count(DISTINCT ss_list_price) b6_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 26 AND 30
        AND (ss_list_price BETWEEN 60 AND 70
             OR ss_coupon_amt BETWEEN 0 AND 50)) b6
"""


# q44 — best/worst items by avg net profit at one store, double rank join
# (tpcds_3.2/q44.sql; item_sk tiebreaks added for deterministic ranks,
# the spec's null-column average guard simplified to a positive-count
# HAVING — same plan shape)
Q44 = """
SELECT asceding.rnk, i1.i_product_name best_performing,
       i2.i_product_name worst_performing
FROM (SELECT item_sk, rank() OVER (ORDER BY rank_col ASC, item_sk) rnk
      FROM (SELECT ss_item_sk item_sk,
                   ROUND(CAST(sum(ss_net_profit) AS DOUBLE) / count(*), 4)
                     rank_col
            FROM store_sales WHERE ss_store_sk = 2
            GROUP BY ss_item_sk HAVING count(*) > 0) v1) asceding,
     (SELECT item_sk, rank() OVER (ORDER BY rank_col DESC, item_sk) rnk
      FROM (SELECT ss_item_sk item_sk,
                   ROUND(CAST(sum(ss_net_profit) AS DOUBLE) / count(*), 4)
                     rank_col
            FROM store_sales WHERE ss_store_sk = 2
            GROUP BY ss_item_sk HAVING count(*) > 0) v2) descending,
     item i1, item i2
WHERE asceding.rnk = descending.rnk
  AND asceding.rnk <= 10
  AND i1.i_item_sk = asceding.item_sk
  AND i2.i_item_sk = descending.item_sk
ORDER BY asceding.rnk
"""


# q47 — monthly brand sales vs yearly average with lag/lead neighbors
# (tpcds_3.2/q47.sql; category/brand/store partition, rn tiebreak via the
# unique (d_year, d_moy) ordering; avg guard > 0 on DECIMAL sums)
Q47 = """
WITH v1 AS (
  SELECT i_category, i_brand, s_store_name,
         d_year, d_moy,
         CAST(sum(ss_sales_price) AS DOUBLE) sum_sales,
         ROUND(CAST(sum(sum(ss_sales_price)) OVER (
                 PARTITION BY i_category, i_brand, s_store_name, d_year)
               AS DOUBLE)
               / count(*) OVER (
                 PARTITION BY i_category, i_brand, s_store_name, d_year),
               4) avg_monthly_sales,
         rank() OVER (
           PARTITION BY i_category, i_brand, s_store_name
           ORDER BY d_year, d_moy) rn
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_year = 2000
  GROUP BY i_category, i_brand, s_store_name, d_year, d_moy),
v2 AS (
  SELECT v1.i_category, v1.i_brand, v1.s_store_name,
         v1.d_year, v1.d_moy, v1.avg_monthly_sales, v1.sum_sales,
         v1_lag.sum_sales psum, v1_lead.sum_sales nsum
  FROM v1, v1 v1_lag, v1 v1_lead
  WHERE v1.i_category = v1_lag.i_category
    AND v1.i_brand = v1_lag.i_brand
    AND v1.s_store_name = v1_lag.s_store_name
    AND v1.i_category = v1_lead.i_category
    AND v1.i_brand = v1_lead.i_brand
    AND v1.s_store_name = v1_lead.s_store_name
    AND v1.rn = v1_lag.rn + 1
    AND v1.rn = v1_lead.rn - 1)
SELECT i_category, i_brand, s_store_name, d_year, d_moy,
       avg_monthly_sales, sum_sales, psum, nsum
FROM v2
WHERE d_year = 2000
  AND avg_monthly_sales > 0
  AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
ORDER BY i_category, i_brand, s_store_name, d_year, d_moy
"""


# q98 — revenue share within class over a 30-day window
# (tpcds_3.2/q98.sql; ratio of DECIMAL sums — exact in both engines)
Q98 = """
SELECT i_item_id, i_category, i_class, i_current_price,
       CAST(sum(ss_ext_sales_price) AS DOUBLE) AS itemrevenue,
       ROUND(CAST(sum(ss_ext_sales_price) AS DOUBLE) * 100.0
             / CAST(sum(sum(ss_ext_sales_price))
                    OVER (PARTITION BY i_class) AS DOUBLE), 4)
         AS revenueratio
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('Books', 'Home', 'Sports')
  AND ss_sold_date_sk = d_date_sk
  AND d_year = 2000 AND d_moy = 3
GROUP BY i_item_id, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_current_price, revenueratio
"""


@pytest.mark.parametrize(
    "name,sql",
    [("q28", Q28), ("q44", Q44), ("q47", Q47), ("q98", Q98)],
)
def test_tpcds_query_cross_engine_batch3(star, name, sql):
    _compare(star, sql)
