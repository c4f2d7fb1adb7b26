"""Real TPC-DS SQL, batch 6 — the remaining 13 texts: time-of-day family
(q66 q71 q88 q90 q96 over the generated time_dim/web_page), the big CTE
machines (q4 q11 q14 q23 q64 q78), the return-reason probe (q85), and
the inventory-variance pair (q39).

With this batch EVERY one of the 99 TPC-DS queries runs as a REAL spec
text cross-engine (Spark vs DuckDB on identical parquet).  House
adaptations as in batches 1-5: in-domain literals, DECIMAL avg/ratio ->
exact-sum double division with ROUND, stddev -> integer power sums
(q39; engine accumulation order makes native stddev_samp unreproducible
at the last ulp), i_item_desc -> i_product_name, call-center-style dims
-> warehouse; q23's frequent-items grain is the month (the generator's
linear date map never lands two sales of one item on one day at
sf0.002) and its customer bar is 50% of the max spender.  The long q66/q88 pivots are assembled programmatically —
the assembled string is the executed spec text.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


_YT_SS = ("SUM(ss_ext_list_price - ss_ext_wholesale_cost "
          "- ss_ext_discount_amt + ss_ext_sales_price)")
_YT_CS = ("SUM(cs_ext_list_price - cs_ext_wholesale_cost "
          "- cs_ext_discount_amt + cs_ext_sales_price)")
_YT_WS = ("SUM(ws_ext_list_price - ws_ext_wholesale_cost "
          "- ws_ext_discount_amt + ws_ext_sales_price)")

# q4 — three-channel year-over-year growth comparison (tpcds_3.2/q4.sql;
# the spec divides the per-row formula by 2 — dropping the constant
# factor leaves every growth ratio identical, avoiding a decimal
# half-cent division)
Q4 = f"""
WITH year_total AS (
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name, d_year dyear,
         {_YT_SS} year_total, 's' sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
    AND d_year IN (2000, 2001)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, d_year,
         {_YT_CS}, 'c'
  FROM customer, catalog_sales, date_dim
  WHERE c_customer_sk = cs_bill_customer_sk AND cs_sold_date_sk = d_date_sk
    AND d_year IN (2000, 2001)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, d_year,
         {_YT_WS}, 'w'
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
    AND d_year IN (2000, 2001)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_c_firstyear, year_total t_c_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_c_secyear.customer_id
  AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.sale_type = 's' AND t_c_firstyear.sale_type = 'c'
  AND t_w_firstyear.sale_type = 'w' AND t_s_secyear.sale_type = 's'
  AND t_c_secyear.sale_type = 'c' AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 2000 AND t_s_secyear.dyear = 2001
  AND t_c_firstyear.dyear = 2000 AND t_c_secyear.dyear = 2001
  AND t_w_firstyear.dyear = 2000 AND t_w_secyear.dyear = 2001
  AND t_s_firstyear.year_total > 0 AND t_c_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_c_firstyear.year_total > 0
           THEN CAST(t_c_secyear.year_total AS DOUBLE)
                / CAST(t_c_firstyear.year_total AS DOUBLE)
           ELSE NULL END
    > CASE WHEN t_s_firstyear.year_total > 0
           THEN CAST(t_s_secyear.year_total AS DOUBLE)
                / CAST(t_s_firstyear.year_total AS DOUBLE)
           ELSE NULL END
  AND CASE WHEN t_c_firstyear.year_total > 0
           THEN CAST(t_c_secyear.year_total AS DOUBLE)
                / CAST(t_c_firstyear.year_total AS DOUBLE)
           ELSE NULL END
    > CASE WHEN t_w_firstyear.year_total > 0
           THEN CAST(t_w_secyear.year_total AS DOUBLE)
                / CAST(t_w_firstyear.year_total AS DOUBLE)
           ELSE NULL END
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
         t_s_secyear.customer_last_name
LIMIT 100
"""

# q11 — store-vs-web growth with full customer projection
# (tpcds_3.2/q11.sql)
Q11 = """
WITH year_total AS (
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name,
         c_preferred_cust_flag customer_preferred_cust_flag,
         c_birth_country customer_birth_country,
         c_login customer_login,
         c_email_address customer_email_address, d_year dyear,
         SUM(ss_ext_list_price - ss_ext_discount_amt) year_total,
         's' sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name,
           c_preferred_cust_flag, c_birth_country, c_login,
           c_email_address, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name,
         c_preferred_cust_flag, c_birth_country, c_login,
         c_email_address, d_year,
         SUM(ws_ext_list_price - ws_ext_discount_amt), 'w'
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name,
           c_preferred_cust_flag, c_birth_country, c_login,
           c_email_address, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name,
       t_s_secyear.customer_email_address
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 2000 AND t_s_secyear.dyear = 2001
  AND t_w_firstyear.dyear = 2000 AND t_w_secyear.dyear = 2001
  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_w_firstyear.year_total > 0
           THEN CAST(t_w_secyear.year_total AS DOUBLE)
                / CAST(t_w_firstyear.year_total AS DOUBLE)
           ELSE 0.0 END
    > CASE WHEN t_s_firstyear.year_total > 0
           THEN CAST(t_s_secyear.year_total AS DOUBLE)
                / CAST(t_s_firstyear.year_total AS DOUBLE)
           ELSE 0.0 END
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
         t_s_secyear.customer_last_name,
         t_s_secyear.customer_email_address
LIMIT 100
"""

# q14a — cross-channel item hierarchy intersect + rollup above the
# all-channel average (tpcds_3.2/q14a.sql)
Q14 = """
WITH cross_items AS (
  SELECT i_item_sk ss_item_sk
  FROM item,
       (SELECT iss.i_brand_id brand_id, iss.i_class_id class_id,
               iss.i_category_id category_id
        FROM store_sales, item iss, date_dim d1
        WHERE ss_item_sk = iss.i_item_sk AND ss_sold_date_sk = d1.d_date_sk
          AND d1.d_year BETWEEN 1999 AND 2001
        INTERSECT
        SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
        FROM catalog_sales, item ics, date_dim d2
        WHERE cs_item_sk = ics.i_item_sk AND cs_sold_date_sk = d2.d_date_sk
          AND d2.d_year BETWEEN 1999 AND 2001
        INTERSECT
        SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
        FROM web_sales, item iws, date_dim d3
        WHERE ws_item_sk = iws.i_item_sk AND ws_sold_date_sk = d3.d_date_sk
          AND d3.d_year BETWEEN 1999 AND 2001) x
  WHERE i_brand_id = brand_id AND i_class_id = class_id
    AND i_category_id = category_id),
avg_sales AS (
  SELECT ROUND(CAST(SUM(quantity * list_price) AS DOUBLE)
               / COUNT(*), 4) average_sales
  FROM (SELECT ss_quantity quantity, ss_list_price list_price
        FROM store_sales, date_dim
        WHERE ss_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001
        UNION ALL
        SELECT cs_quantity, cs_list_price
        FROM catalog_sales, date_dim
        WHERE cs_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001
        UNION ALL
        SELECT ws_quantity, ws_list_price
        FROM web_sales, date_dim
        WHERE ws_sold_date_sk = d_date_sk
          AND d_year BETWEEN 1999 AND 2001) x)
SELECT channel, i_brand_id, i_class_id, i_category_id,
       SUM(sales) AS sum_sales, SUM(number_sales) AS sum_number_sales
FROM (SELECT 'store' channel, i_brand_id, i_class_id, i_category_id,
             SUM(ss_quantity * ss_list_price) sales,
             COUNT(*) number_sales
      FROM store_sales, item, date_dim
      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
        AND d_year = 2001 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING SUM(ss_quantity * ss_list_price)
             > (SELECT average_sales FROM avg_sales)
      UNION ALL
      SELECT 'catalog', i_brand_id, i_class_id, i_category_id,
             SUM(cs_quantity * cs_list_price), COUNT(*)
      FROM catalog_sales, item, date_dim
      WHERE cs_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
        AND d_year = 2001 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING SUM(cs_quantity * cs_list_price)
             > (SELECT average_sales FROM avg_sales)
      UNION ALL
      SELECT 'web', i_brand_id, i_class_id, i_category_id,
             SUM(ws_quantity * ws_list_price), COUNT(*)
      FROM web_sales, item, date_dim
      WHERE ws_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
        AND d_year = 2001 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING SUM(ws_quantity * ws_list_price)
             > (SELECT average_sales FROM avg_sales)) y
GROUP BY ROLLUP (channel, i_brand_id, i_class_id, i_category_id)
ORDER BY channel, i_brand_id, i_class_id, i_category_id
LIMIT 100
"""

# q23a — frequent items x 95th-percentile customers, catalog+web month
# slice (tpcds_3.2/q23a.sql; i_item_desc -> i_product_name)
Q23 = """
WITH frequent_ss_items AS (
  SELECT substr(i_product_name, 1, 30) itemdesc, i_item_sk item_sk,
         d_month_seq soldmonth, COUNT(*) cnt
  FROM store_sales, date_dim, item
  WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
    AND d_year IN (1999, 2000, 2001, 2002)
  GROUP BY substr(i_product_name, 1, 30), i_item_sk, d_month_seq
  HAVING COUNT(*) > 4),
max_store_sales AS (
  SELECT MAX(csales) tpcds_cmax
  FROM (SELECT c_customer_sk, SUM(ss_quantity * ss_sales_price) csales
        FROM store_sales, customer, date_dim
        WHERE ss_customer_sk = c_customer_sk
          AND ss_sold_date_sk = d_date_sk
          AND d_year IN (1999, 2000, 2001, 2002)
        GROUP BY c_customer_sk) x),
best_ss_customer AS (
  SELECT c_customer_sk, SUM(ss_quantity * ss_sales_price) ssales
  FROM store_sales, customer
  WHERE ss_customer_sk = c_customer_sk
  GROUP BY c_customer_sk
  HAVING SUM(ss_quantity * ss_sales_price)
         > (50 / 100.0) * (SELECT * FROM max_store_sales))
SELECT SUM(sales) AS total_sales
FROM (SELECT cs_quantity * cs_list_price sales
      FROM catalog_sales, date_dim
      WHERE d_year = 1999 AND d_moy = 1 AND cs_sold_date_sk = d_date_sk
        AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND cs_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)
      UNION ALL
      SELECT ws_quantity * ws_list_price sales
      FROM web_sales, date_dim
      WHERE d_year = 1999 AND d_moy = 1 AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)) x
"""

# q39a — warehouse/item monthly inventory variance pairs
# (tpcds_3.2/q39a.sql; stddev via integer power sums, cov bar 0.5 for
# the flat 0..999 uniform on-hand distribution)
Q39 = """
WITH stats AS (
  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
         COUNT(*) n,
         SUM(CAST(inv_quantity_on_hand AS BIGINT)) s1,
         SUM(CAST(inv_quantity_on_hand AS BIGINT)
             * CAST(inv_quantity_on_hand AS BIGINT)) s2
  FROM inventory, item, warehouse, date_dim
  WHERE inv_item_sk = i_item_sk AND inv_warehouse_sk = w_warehouse_sk
    AND inv_date_sk = d_date_sk AND d_year = 2000
  GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy
  HAVING COUNT(*) > 1),
inv AS (
  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
         ROUND(CAST(s1 AS DOUBLE) / n, 4) mean,
         ROUND(sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1)))
               / (CAST(s1 AS DOUBLE) / n), 4) cov
  FROM stats WHERE s1 > 0)
SELECT inv1.w_warehouse_sk wh1, inv1.i_item_sk item1, inv1.d_moy moy1,
       inv1.mean mean1, inv1.cov cov1,
       inv2.w_warehouse_sk wh2, inv2.i_item_sk item2, inv2.d_moy moy2,
       inv2.mean mean2, inv2.cov cov2
FROM inv inv1, inv inv2
WHERE inv1.i_item_sk = inv2.i_item_sk
  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
  AND inv1.d_moy = 3 AND inv2.d_moy = 4
  AND inv1.cov > 0.5 AND inv2.cov > 0.5
ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean,
         inv1.cov, inv2.d_moy, inv2.mean, inv2.cov
"""

# q64 — twice-sold items through the full dimension graph
# (tpcds_3.2/q64.sql; the 15-table join realized on the generated star)
Q64 = """
WITH cs_ui AS (
  SELECT cs_item_sk,
         SUM(cs_ext_list_price) AS sale,
         SUM(cr_refunded_cash + cr_reversed_charge + cr_store_credit)
           AS refund
  FROM catalog_sales, catalog_returns
  WHERE cs_item_sk = cr_item_sk AND cs_order_number = cr_order_number
  GROUP BY cs_item_sk
  HAVING SUM(cs_ext_list_price)
         > 2 * SUM(cr_refunded_cash + cr_reversed_charge
                   + cr_store_credit)),
cross_sales AS (
  SELECT i_product_name product_name, i_item_sk item_sk,
         s_store_name store_name, s_zip store_zip,
         ad1.ca_street_number b_street_number,
         ad1.ca_street_name b_street_name, ad1.ca_city b_city,
         ad1.ca_zip b_zip,
         ad2.ca_street_number c_street_number,
         ad2.ca_street_name c_street_name, ad2.ca_city c_city,
         ad2.ca_zip c_zip,
         d1.d_year AS syear, d2.d_year AS fsyear, d3.d_year s2year,
         COUNT(*) cnt,
         SUM(ss_wholesale_cost) s1, SUM(ss_list_price) s2,
         SUM(ss_coupon_amt) s3
  FROM store_sales, store_returns, cs_ui, date_dim d1, date_dim d2,
       date_dim d3, store, customer, customer_demographics cd1,
       customer_demographics cd2, promotion, household_demographics hd1,
       household_demographics hd2, customer_address ad1,
       customer_address ad2, income_band ib1, income_band ib2, item
  WHERE ss_store_sk = s_store_sk
    AND ss_sold_date_sk = d1.d_date_sk
    AND ss_customer_sk = c_customer_sk
    AND ss_cdemo_sk = cd1.cd_demo_sk
    AND ss_hdemo_sk = hd1.hd_demo_sk
    AND ss_addr_sk = ad1.ca_address_sk
    AND ss_item_sk = i_item_sk
    AND ss_item_sk = sr_item_sk
    AND ss_ticket_number = sr_ticket_number
    AND ss_item_sk = cs_ui.cs_item_sk
    AND c_current_cdemo_sk = cd2.cd_demo_sk
    AND c_current_hdemo_sk = hd2.hd_demo_sk
    AND c_current_addr_sk = ad2.ca_address_sk
    AND c_first_sales_date_sk = d2.d_date_sk
    AND c_first_shipto_date_sk = d3.d_date_sk
    AND ss_promo_sk = p_promo_sk
    AND hd1.hd_income_band_sk = ib1.ib_income_band_sk
    AND hd2.hd_income_band_sk = ib2.ib_income_band_sk
    AND cd1.cd_marital_status <> cd2.cd_marital_status
    AND i_color IN ('maroon', 'steel', 'chocolate', 'salmon', 'navy',
                    'ivory')
    AND i_current_price BETWEEN 20 AND 70
  GROUP BY i_product_name, i_item_sk, s_store_name, s_zip,
           ad1.ca_street_number, ad1.ca_street_name, ad1.ca_city,
           ad1.ca_zip, ad2.ca_street_number, ad2.ca_street_name,
           ad2.ca_city, ad2.ca_zip, d1.d_year, d2.d_year, d3.d_year)
SELECT cs1.product_name, cs1.store_name, cs1.store_zip,
       cs1.b_street_number, cs1.b_street_name, cs1.b_city, cs1.b_zip,
       cs1.c_street_number, cs1.c_street_name, cs1.c_city, cs1.c_zip,
       cs1.syear, cs1.cnt,
       cs1.s1 AS s11, cs1.s2 AS s21, cs1.s3 AS s31,
       cs2.s1 AS s12, cs2.s2 AS s22, cs2.s3 AS s32,
       cs2.syear AS syear2, cs2.cnt AS cnt2
FROM cross_sales cs1, cross_sales cs2
WHERE cs1.item_sk = cs2.item_sk
  AND cs1.syear = 2000 AND cs2.syear = 2001
  AND cs2.cnt <= cs1.cnt
  AND cs1.store_name = cs2.store_name
  AND cs1.store_zip = cs2.store_zip
ORDER BY cs1.product_name, cs1.store_name, cs2.cnt, cs1.s1, cs2.s1
"""

# q78 — return-free per-customer-item channel comparison
# (tpcds_3.2/q78.sql)
Q78 = """
WITH ws AS (
  SELECT d_year AS ws_sold_year, ws_item_sk,
         ws_bill_customer_sk ws_customer_sk,
         SUM(ws_quantity) ws_qty, SUM(ws_wholesale_cost) ws_wc,
         SUM(ws_sales_price) ws_sp
  FROM web_sales
  LEFT JOIN web_returns ON wr_order_number = ws_order_number
                        AND ws_item_sk = wr_item_sk
  JOIN date_dim ON ws_sold_date_sk = d_date_sk
  WHERE wr_order_number IS NULL
  GROUP BY d_year, ws_item_sk, ws_bill_customer_sk),
cs AS (
  SELECT d_year AS cs_sold_year, cs_item_sk,
         cs_bill_customer_sk cs_customer_sk,
         SUM(cs_quantity) cs_qty, SUM(cs_wholesale_cost) cs_wc,
         SUM(cs_sales_price) cs_sp
  FROM catalog_sales
  LEFT JOIN catalog_returns ON cr_order_number = cs_order_number
                            AND cs_item_sk = cr_item_sk
  JOIN date_dim ON cs_sold_date_sk = d_date_sk
  WHERE cr_order_number IS NULL
  GROUP BY d_year, cs_item_sk, cs_bill_customer_sk),
ss AS (
  SELECT d_year AS ss_sold_year, ss_item_sk, ss_customer_sk,
         SUM(ss_quantity) ss_qty, SUM(ss_wholesale_cost) ss_wc,
         SUM(ss_sales_price) ss_sp
  FROM store_sales
  LEFT JOIN store_returns ON sr_ticket_number = ss_ticket_number
                          AND ss_item_sk = sr_item_sk
  JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE sr_ticket_number IS NULL
  GROUP BY d_year, ss_item_sk, ss_customer_sk)
SELECT ss_sold_year, ss_item_sk, ss_customer_sk,
       ROUND(CAST(ss_qty AS DOUBLE)
             / (COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0)), 2) ratio,
       ss_qty store_qty, ss_wc store_wholesale_cost,
       ss_sp store_sales_price,
       COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) other_chan_qty,
       COALESCE(ws_wc, 0) + COALESCE(cs_wc, 0) other_chan_wholesale_cost,
       COALESCE(ws_sp, 0) + COALESCE(cs_sp, 0) other_chan_sales_price
FROM ss
LEFT JOIN ws ON (ws_sold_year = ss_sold_year AND ws_item_sk = ss_item_sk
                 AND ws_customer_sk = ss_customer_sk)
LEFT JOIN cs ON (cs_sold_year = ss_sold_year AND cs_item_sk = ss_item_sk
                 AND cs_customer_sk = ss_customer_sk)
WHERE (COALESCE(ws_qty, 0) > 0 OR COALESCE(cs_qty, 0) > 0)
  AND ss_sold_year = 2000
ORDER BY ss_sold_year, ss_item_sk, ss_customer_sk, ss_qty DESC,
         ss_wc DESC, ss_sp DESC, other_chan_qty,
         other_chan_wholesale_cost, other_chan_sales_price, ratio
LIMIT 100
"""


def _q66_arm(fact, prefix, net_col):
    months = ", ".join(
        f"SUM(CASE WHEN d_moy = {m} THEN {prefix}_sales_price "
        f"* {prefix}_quantity ELSE 0 END) AS m{m}_sales"
        for m in range(1, 13)
    )
    nets = ", ".join(
        f"SUM(CASE WHEN d_moy = {m} THEN {net_col} "
        f"* {prefix}_quantity ELSE 0 END) AS m{m}_net"
        for m in range(1, 13)
    )
    return f"""
  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
         w_country, 'carrier 0,carrier 1' AS ship_carriers,
         d_year AS year, {months}, {nets}
  FROM {fact}, warehouse, date_dim, time_dim, ship_mode
  WHERE {prefix}_warehouse_sk = w_warehouse_sk
    AND {prefix}_sold_date_sk = d_date_sk
    AND {prefix}_sold_time_sk = t_time_sk
    AND {prefix}_ship_mode_sk = sm_ship_mode_sk
    AND d_year = 2000
    AND t_time BETWEEN 30838 AND 30838 + 28800
    AND sm_carrier IN ('carrier 0', 'carrier 1')
  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
           w_state, w_country, d_year"""


# q66 — warehouse 24-column monthly sales/net pivot over web+catalog
# (tpcds_3.2/q66.sql; per-sq-foot columns as exact-sum double divisions;
# assembled programmatically — months m1..m12 instead of jan..dec)
Q66 = (
    "SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, "
    "w_state, w_country, ship_carriers, year, "
    + ", ".join(f"SUM(m{m}_sales) AS m{m}_sales" for m in range(1, 13))
    + ", "
    + ", ".join(
        f"ROUND(CAST(SUM(m{m}_sales) AS DOUBLE) / w_warehouse_sq_ft, 6) "
        f"AS m{m}_sales_per_sq_foot"
        for m in range(1, 13)
    )
    + ", "
    + ", ".join(f"SUM(m{m}_net) AS m{m}_net" for m in range(1, 13))
    + " FROM ("
    + _q66_arm("web_sales", "ws", "ws_net_paid_inc_tax")
    + " UNION ALL "
    + _q66_arm("catalog_sales", "cs", "cs_net_paid_inc_ship_tax")
    + ") x GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, "
    "w_county, w_state, w_country, ship_carriers, year "
    "ORDER BY w_warehouse_name LIMIT 100"
)

# q71 — brand revenue by breakfast/dinner minute across all channels
# (tpcds_3.2/q71.sql)
Q71 = """
SELECT i_brand_id brand_id, i_brand brand, t_hour, t_minute,
       SUM(ext_price) ext_price
FROM item,
     (SELECT ws_ext_sales_price AS ext_price,
             ws_sold_date_sk AS sold_date_sk,
             ws_item_sk AS sold_item_sk,
             ws_sold_time_sk AS time_sk
      FROM web_sales, date_dim
      WHERE d_date_sk = ws_sold_date_sk AND d_moy = 12 AND d_year = 2000
      UNION ALL
      SELECT cs_ext_sales_price, cs_sold_date_sk, cs_item_sk,
             cs_sold_time_sk
      FROM catalog_sales, date_dim
      WHERE d_date_sk = cs_sold_date_sk AND d_moy = 12 AND d_year = 2000
      UNION ALL
      SELECT ss_ext_sales_price, ss_sold_date_sk, ss_item_sk,
             ss_sold_time_sk
      FROM store_sales, date_dim
      WHERE d_date_sk = ss_sold_date_sk AND d_moy = 12
        AND d_year = 2000) tmp,
     time_dim
WHERE sold_item_sk = i_item_sk
  AND i_manager_id BETWEEN 1 AND 40
  AND time_sk = t_time_sk
  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
GROUP BY i_brand, i_brand_id, t_hour, t_minute
ORDER BY ext_price DESC, i_brand_id, t_hour, t_minute
"""

# q85 — web return reasons by demographic/address/price bands
# (tpcds_3.2/q85.sql; averages as exact-sum double divisions)
Q85 = """
SELECT substr(r_reason_desc, 1, 20) AS reason,
       ROUND(CAST(SUM(ws_quantity) AS DOUBLE) / COUNT(ws_quantity), 4)
         AS avg_qty,
       ROUND(CAST(SUM(wr_refunded_cash) AS DOUBLE)
             / COUNT(wr_refunded_cash), 4) AS avg_refunded,
       ROUND(CAST(SUM(wr_fee) AS DOUBLE) / COUNT(wr_fee), 4) AS avg_fee
FROM web_sales, web_returns, web_page, customer_demographics cd1,
     customer_demographics cd2, customer_address, date_dim, reason
WHERE ws_web_page_sk = wp_web_page_sk
  AND ws_item_sk = wr_item_sk
  AND ws_order_number = wr_order_number
  AND ws_sold_date_sk = d_date_sk AND d_year IN (1999, 2000, 2001)
  AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
  AND cd2.cd_demo_sk = wr_returning_cdemo_sk
  AND ca_address_sk = wr_refunded_addr_sk
  AND r_reason_sk = wr_reason_sk
  AND ((cd1.cd_marital_status = 'M'
        AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = '4 yr Degree'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 0.00 AND 67.00)
    OR (cd1.cd_marital_status = 'D'
        AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = 'Primary'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 67.00 AND 134.00)
    OR (cd1.cd_marital_status = 'U'
        AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = 'Advanced Degree'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 134.00 AND 200.00))
  AND ((ca_country = 'United States'
        AND ca_state IN ('TN', 'GA', 'NY')
        AND ws_net_profit BETWEEN 0 AND 25000)
    OR (ca_country = 'United States'
        AND ca_state IN ('TX', 'OR', 'IN')
        AND ws_net_profit BETWEEN 0 AND 25000)
    OR (ca_country = 'United States'
        AND ca_state IN ('WA', 'IL', 'SD')
        AND ws_net_profit BETWEEN 0 AND 25000))
GROUP BY r_reason_desc
ORDER BY reason, avg_qty, avg_refunded, avg_fee
LIMIT 100
"""


def _q88_slot(label, alias, hour, minute_cond):
    return f"""
 (SELECT COUNT(*) {label}
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = {hour} AND time_dim.t_minute {minute_cond}
    AND ((household_demographics.hd_dep_count = 3
          AND household_demographics.hd_vehicle_count <= 5)
      OR (household_demographics.hd_dep_count = 0
          AND household_demographics.hd_vehicle_count <= 2)
      OR (household_demographics.hd_dep_count = 1
          AND household_demographics.hd_vehicle_count <= 3))
    AND store.s_store_name = 'store 0') {alias}"""


# q88 — eight half-hour shopper-count probes cross-joined
# (tpcds_3.2/q88.sql; assembled programmatically, store 'ese' -> 'store 0')
Q88 = (
    "SELECT * FROM "
    + ", ".join(
        _q88_slot(label, f"s{i + 1}", hour, cond)
        for i, (label, hour, cond) in enumerate([
            ("h8_30_to_9", 8, ">= 30"),
            ("h9_to_9_30", 9, "< 30"),
            ("h9_30_to_10", 9, ">= 30"),
            ("h10_to_10_30", 10, "< 30"),
            ("h10_30_to_11", 10, ">= 30"),
            ("h11_to_11_30", 11, "< 30"),
            ("h11_30_to_12", 11, ">= 30"),
            ("h12_to_12_30", 12, "< 30"),
        ])
    )
)

# q90 — web AM/PM order ratio (tpcds_3.2/q90.sql)
Q90 = """
SELECT ROUND(CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE), 4) am_pm_ratio
FROM (SELECT COUNT(*) amc
      FROM web_sales, household_demographics, time_dim, web_page
      WHERE ws_sold_time_sk = time_dim.t_time_sk
        AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        AND ws_web_page_sk = web_page.wp_web_page_sk
        AND time_dim.t_hour BETWEEN 6 AND 7
        AND household_demographics.hd_dep_count = 8
        AND web_page.wp_char_count BETWEEN 5000 AND 5200) at_probe,
     (SELECT COUNT(*) pmc
      FROM web_sales, household_demographics, time_dim, web_page
      WHERE ws_sold_time_sk = time_dim.t_time_sk
        AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        AND ws_web_page_sk = web_page.wp_web_page_sk
        AND time_dim.t_hour BETWEEN 14 AND 15
        AND household_demographics.hd_dep_count = 8
        AND web_page.wp_char_count BETWEEN 5000 AND 5200) pt_probe
ORDER BY am_pm_ratio
LIMIT 100
"""

# q96 — half-hour shopper count (tpcds_3.2/q96.sql; 'ese' -> 'store 0')
Q96 = """
SELECT COUNT(*) AS cnt
FROM store_sales, household_demographics, time_dim, store
WHERE ss_sold_time_sk = time_dim.t_time_sk
  AND ss_hdemo_sk = household_demographics.hd_demo_sk
  AND ss_store_sk = s_store_sk
  AND time_dim.t_hour = 8 AND time_dim.t_minute >= 30
  AND household_demographics.hd_dep_count = 5
  AND store.s_store_name = 'store 0'
ORDER BY COUNT(*)
LIMIT 100
"""


@pytest.mark.parametrize(
    "name,sql",
    [("q4", Q4), ("q11", Q11), ("q14", Q14), ("q23", Q23), ("q39", Q39),
     ("q64", Q64), ("q66", Q66), ("q71", Q71), ("q78", Q78), ("q85", Q85),
     ("q88", Q88), ("q90", Q90), ("q96", Q96)],
)
def test_tpcds_real_final(tpcds_star, name, sql):
    _compare(tpcds_star, sql)
