"""Real TPC-DS SQL, batch 7 — the a/b second-variant texts.

The reference corpus ships TWO verified files for q14/q23/q24/q39
(tpcds_3.2/q{14,23,24,39}{a,b}.sql); batches 1-6 run one variant of
each. This batch runs the OTHER variant, so every query file in the
reference's tpcds_3.2 corpus has a cross-engine run. Same contract and
house adaptations as before; q14b's one-week sales slice is widened to
the month containing the spec's anchor date (a single week of the
sf0.002 star leaves the above-average HAVING empty).
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


_CROSS_ITEMS = """
cross_items AS (
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
"""

_Q14B_SLICE = """
  SELECT 'store' channel, i_brand_id, i_class_id, i_category_id,
         SUM(ss_quantity * ss_list_price) sales, COUNT(*) number_sales
  FROM store_sales, item, date_dim
  WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_month_seq = (SELECT DISTINCT d_month_seq FROM date_dim
                       WHERE d_year = {year} AND d_moy = 12)
  GROUP BY i_brand_id, i_class_id, i_category_id
  HAVING SUM(ss_quantity * ss_list_price)
         > (SELECT average_sales FROM avg_sales)
"""

# q14b — this-year vs last-year item-hierarchy slices joined
# (tpcds_3.2/q14b.sql; the spec's one-week d_week_seq slice widened to
# the anchor month — a week of the sf0.002 star leaves the HAVING empty)
Q14B = (
    "WITH " + _CROSS_ITEMS + ", this_year AS (" +
    _Q14B_SLICE.format(year=2001) + "), last_year AS (" +
    _Q14B_SLICE.format(year=2000) + """)
SELECT this_year.channel ty_channel, this_year.i_brand_id ty_brand,
       this_year.i_class_id ty_class, this_year.i_category_id ty_category,
       this_year.sales ty_sales, this_year.number_sales ty_number_sales,
       last_year.channel ly_channel, last_year.i_brand_id ly_brand,
       last_year.i_class_id ly_class, last_year.i_category_id ly_category,
       last_year.sales ly_sales, last_year.number_sales ly_number_sales
FROM this_year, last_year
WHERE this_year.i_brand_id = last_year.i_brand_id
  AND this_year.i_class_id = last_year.i_class_id
  AND this_year.i_category_id = last_year.i_category_id
ORDER BY this_year.channel, this_year.i_brand_id, this_year.i_class_id,
         this_year.i_category_id
LIMIT 100
""")

# q23b — frequent items x 95th-percentile customers, per-customer spend
# (tpcds_3.2/q23b.sql; i_item_desc -> i_product_name)
Q23B = """
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
SELECT c_last_name, c_first_name, sales
FROM (SELECT c_last_name, c_first_name,
             SUM(cs_quantity * cs_list_price) sales
      FROM catalog_sales, customer, date_dim
      WHERE d_year = 1999 AND d_moy = 1 AND cs_sold_date_sk = d_date_sk
        AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND cs_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)
        AND cs_bill_customer_sk = c_customer_sk
      GROUP BY c_last_name, c_first_name
      UNION ALL
      SELECT c_last_name, c_first_name,
             SUM(ws_quantity * ws_list_price) sales
      FROM web_sales, customer, date_dim
      WHERE d_year = 1999 AND d_moy = 1 AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)
        AND ws_bill_customer_sk = c_customer_sk
      GROUP BY c_last_name, c_first_name) x
ORDER BY c_last_name, c_first_name, sales
LIMIT 100
"""

# q24b — q24a's text with the variant's color literal
# (tpcds_3.2/q24b.sql; the a/b pair differ only in i_color)
Q24B = """
WITH ssales AS (
  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
         i_color, i_current_price, i_manager_id, i_units, i_size,
         SUM(ss_net_paid) netpaid
  FROM store_sales, store_returns, store, item, customer, customer_address
  WHERE ss_ticket_number = sr_ticket_number
    AND ss_item_sk = sr_item_sk
    AND ss_customer_sk = c_customer_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND c_current_addr_sk = ca_address_sk
    AND c_birth_country <> upper(ca_country)
    AND s_zip = ca_zip
    AND s_market_id = 2
  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
           i_color, i_current_price, i_manager_id, i_units, i_size)
SELECT c_last_name, c_first_name, s_store_name, SUM(netpaid) paid
FROM ssales
WHERE i_color = 'chocolate'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING SUM(netpaid) > (SELECT 0.05 * AVG(netpaid) FROM ssales)
ORDER BY c_last_name, c_first_name, s_store_name
"""

# q39b — the variance pairs with the b-variant's stricter March bar
# (tpcds_3.2/q39b.sql; power-sum stddev as in q39a, bars 0.5/0.6 for the
# flat on-hand distribution)
Q39B = """
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
  AND inv1.cov > 0.6 AND inv2.cov > 0.5
ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean,
         inv1.cov, inv2.d_moy, inv2.mean, inv2.cov
"""


@pytest.mark.parametrize(
    "name,sql",
    [("q14b", Q14B), ("q23b", Q23B), ("q24b", Q24B), ("q39b", Q39B)],
)
def test_tpcds_real_ab_variants(tpcds_star, name, sql):
    _compare(tpcds_star, sql)
