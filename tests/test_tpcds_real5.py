"""Real TPC-DS SQL, batch 5 — window/rollup/null-key report families.

Spec texts from tpcds_3.2/q*.sql over the generated star; identical-rows
vs DuckDB as in batches 1-4.  House adaptations: AVG-over-partition
windows become SUM-over / COUNT-over exact-sum double divisions (batch-1
Q63's form); decimal ratio casts become double casts; ship_mode is
generated, call_center/web_site/catalog_page map to warehouse; q76's
null-key arms use the generator's deterministic NULL slices
(ss_addr_sk, cs_warehouse_sk, ws_web_page_sk).
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


# q51 — web-vs-store cumulative sales crossover (tpcds_3.2/q51.sql)
Q51 = """
WITH web_v1 AS (
  SELECT ws_item_sk item_sk, d_date,
         SUM(SUM(ws_sales_price)) OVER (
           PARTITION BY ws_item_sk ORDER BY d_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cume_sales
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 1212 AND 1212 + 11
    AND ws_item_sk IS NOT NULL
  GROUP BY ws_item_sk, d_date),
store_v1 AS (
  SELECT ss_item_sk item_sk, d_date,
         SUM(SUM(ss_sales_price)) OVER (
           PARTITION BY ss_item_sk ORDER BY d_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cume_sales
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 1212 AND 1212 + 11
    AND ss_item_sk IS NOT NULL
  GROUP BY ss_item_sk, d_date)
SELECT * FROM (
  SELECT item_sk, d_date, web_sales, store_sales,
         MAX(web_sales) OVER (
           PARTITION BY item_sk ORDER BY d_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) web_cumulative,
         MAX(store_sales) OVER (
           PARTITION BY item_sk ORDER BY d_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) store_cumulative
  FROM (SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk
                    ELSE store.item_sk END item_sk,
               CASE WHEN web.d_date IS NOT NULL THEN web.d_date
                    ELSE store.d_date END d_date,
               web.cume_sales web_sales, store.cume_sales store_sales
        FROM web_v1 web FULL OUTER JOIN store_v1 store
          ON (web.item_sk = store.item_sk AND web.d_date = store.d_date)
       ) x) y
WHERE web_cumulative > store_cumulative
ORDER BY item_sk, d_date
LIMIT 100
"""

# q53 — manufacturer quarterly sales vs their average (tpcds_3.2/q53.sql)
Q53 = """
SELECT * FROM (
  SELECT i_manufact_id,
         CAST(SUM(ss_sales_price) AS DOUBLE) sum_sales,
         ROUND(CAST(SUM(SUM(ss_sales_price))
                    OVER (PARTITION BY i_manufact_id) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY i_manufact_id), 4)
           avg_quarterly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND d_month_seq IN (1212, 1213, 1214, 1215, 1216, 1217, 1218, 1219,
                        1220, 1221, 1222, 1223)
    AND ((i_category IN ('Books', 'Electronics', 'Home')
          AND i_class IN ('classic', 'modern', 'value'))
      OR (i_category IN ('Music', 'Shoes', 'Sports')
          AND i_class IN ('premium', 'import', 'value')))
  GROUP BY i_manufact_id, d_qoy) tmp1
WHERE CASE WHEN avg_quarterly_sales > 0
           THEN ABS(sum_sales - avg_quarterly_sales) / avg_quarterly_sales
           ELSE NULL END > 0.1
ORDER BY avg_quarterly_sales, sum_sales, i_manufact_id
LIMIT 100
"""

# q56 — per-item three-channel revenue for chosen colors and timezone
# (tpcds_3.2/q56.sql)
Q56 = """
WITH ss AS (
  SELECT i_item_id, SUM(ss_ext_sales_price) total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('orchid', 'ivory', 'peach'))
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 1
    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -8
  GROUP BY i_item_id),
cs AS (
  SELECT i_item_id, SUM(cs_ext_sales_price) total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('orchid', 'ivory', 'peach'))
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 1
    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -8
  GROUP BY i_item_id),
ws AS (
  SELECT i_item_id, SUM(ws_ext_sales_price) total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('orchid', 'ivory', 'peach'))
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 1
    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -8
  GROUP BY i_item_id)
SELECT i_item_id, SUM(total_sales) total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY total_sales, i_item_id
LIMIT 100
"""

# q57 — catalog monthly brand sales vs yearly average with lag/lead
# (tpcds_3.2/q57.sql; call_center -> warehouse)
Q57 = """
WITH v1 AS (
  SELECT i_category, i_brand, w_warehouse_name cc_name, d_year, d_moy,
         CAST(SUM(cs_sales_price) AS DOUBLE) sum_sales,
         ROUND(CAST(SUM(SUM(cs_sales_price)) OVER (
                 PARTITION BY i_category, i_brand, w_warehouse_name, d_year)
               AS DOUBLE)
               / COUNT(*) OVER (
                 PARTITION BY i_category, i_brand, w_warehouse_name, d_year),
               4) avg_monthly_sales,
         RANK() OVER (
           PARTITION BY i_category, i_brand, w_warehouse_name
           ORDER BY d_year, d_moy) rn
  FROM item, catalog_sales, date_dim, warehouse
  WHERE cs_item_sk = i_item_sk
    AND cs_sold_date_sk = d_date_sk
    AND w_warehouse_sk = cs_warehouse_sk
    AND (d_year = 2000 OR (d_year = 1999 AND d_moy = 12)
         OR (d_year = 2001 AND d_moy = 1))
  GROUP BY i_category, i_brand, w_warehouse_name, d_year, d_moy),
v2 AS (
  SELECT v1.cc_name, v1.d_year, v1.d_moy, v1.avg_monthly_sales,
         v1.sum_sales, v1_lag.sum_sales psum, v1_lead.sum_sales nsum
  FROM v1, v1 v1_lag, v1 v1_lead
  WHERE v1.i_category = v1_lag.i_category
    AND v1.i_category = v1_lead.i_category
    AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
    AND v1.cc_name = v1_lag.cc_name AND v1.cc_name = v1_lead.cc_name
    AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1)
SELECT * FROM v2
WHERE d_year = 2000 AND avg_monthly_sales > 0
  AND CASE WHEN avg_monthly_sales > 0
           THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales
           ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales, nsum, cc_name, d_moy
LIMIT 100
"""

# q58 — items with balanced revenue across all three channels in one week
# (tpcds_3.2/q58.sql; ratios as exact-sum double divisions)
Q58 = """
WITH ss_items AS (
  SELECT i_item_id item_id, SUM(ss_ext_sales_price) ss_item_rev
  FROM store_sales, item, date_dim
  WHERE ss_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_month_seq = (SELECT d_month_seq FROM date_dim
                                        WHERE d_date = '1999-02-19'))
    AND ss_sold_date_sk = d_date_sk
  GROUP BY i_item_id),
cs_items AS (
  SELECT i_item_id item_id, SUM(cs_ext_sales_price) cs_item_rev
  FROM catalog_sales, item, date_dim
  WHERE cs_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_month_seq = (SELECT d_month_seq FROM date_dim
                                        WHERE d_date = '1999-02-19'))
    AND cs_sold_date_sk = d_date_sk
  GROUP BY i_item_id),
ws_items AS (
  SELECT i_item_id item_id, SUM(ws_ext_sales_price) ws_item_rev
  FROM web_sales, item, date_dim
  WHERE ws_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_month_seq = (SELECT d_month_seq FROM date_dim
                                        WHERE d_date = '1999-02-19'))
    AND ws_sold_date_sk = d_date_sk
  GROUP BY i_item_id)
SELECT ss_items.item_id,
       ss_item_rev,
       ROUND(CAST(ss_item_rev AS DOUBLE)
             / (CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3)
             * 100, 4) ss_dev,
       cs_item_rev,
       ROUND(CAST(cs_item_rev AS DOUBLE)
             / (CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3)
             * 100, 4) cs_dev,
       ws_item_rev,
       ROUND(CAST(ws_item_rev AS DOUBLE)
             / (CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3)
             * 100, 4) ws_dev,
       ROUND(CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3, 4)
         average
FROM ss_items, cs_items, ws_items
WHERE ss_items.item_id = cs_items.item_id
  AND ss_items.item_id = ws_items.item_id
  AND ss_item_rev BETWEEN 0.2 * cs_item_rev AND 5.0 * cs_item_rev
  AND ss_item_rev BETWEEN 0.2 * ws_item_rev AND 5.0 * ws_item_rev
  AND cs_item_rev BETWEEN 0.2 * ss_item_rev AND 5.0 * ss_item_rev
  AND cs_item_rev BETWEEN 0.2 * ws_item_rev AND 5.0 * ws_item_rev
  AND ws_item_rev BETWEEN 0.2 * ss_item_rev AND 5.0 * ss_item_rev
  AND ws_item_rev BETWEEN 0.2 * cs_item_rev AND 5.0 * cs_item_rev
ORDER BY ss_items.item_id, ss_item_rev
LIMIT 100
"""

# q61 — promotional share of category revenue in one timezone
# (tpcds_3.2/q61.sql)
Q61 = """
SELECT promotions, total,
       ROUND(CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE) * 100, 4)
         AS promo_pct
FROM (SELECT SUM(ss_ext_sales_price) promotions
      FROM store_sales, store, promotion, date_dim, customer,
           customer_address, item
      WHERE ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND ss_promo_sk = p_promo_sk
        AND ss_customer_sk = c_customer_sk
        AND ca_address_sk = c_current_addr_sk
        AND ss_item_sk = i_item_sk
        AND ca_gmt_offset = -7
        AND i_category = 'Books'
        AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y'
             OR p_channel_tv = 'Y')
        AND s_gmt_offset = -7
        AND d_year = 1999 AND d_moy = 11) promotional_sales,
     (SELECT SUM(ss_ext_sales_price) total
      FROM store_sales, store, date_dim, customer, customer_address, item
      WHERE ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND ss_customer_sk = c_customer_sk
        AND ca_address_sk = c_current_addr_sk
        AND ss_item_sk = i_item_sk
        AND ca_gmt_offset = -7
        AND i_category = 'Books'
        AND s_gmt_offset = -7
        AND d_year = 1999 AND d_moy = 11) all_sales
ORDER BY promotions, total
LIMIT 100
"""

# q62 — web shipping-lag day buckets per warehouse/ship-mode
# (tpcds_3.2/q62.sql; web_site dim dropped — no such table — the
# warehouse + ship_mode grouping is kept)
Q62 = """
SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS days_30,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 30)
                 AND (ws_ship_date_sk - ws_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS days_31_60,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 60)
                 AND (ws_ship_date_sk - ws_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS days_61_90,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 90)
                 AND (ws_ship_date_sk - ws_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS days_91_120,
       SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS days_over_120
FROM web_sales, warehouse, ship_mode, date_dim
WHERE d_month_seq BETWEEN 1212 AND 1212 + 11
  AND ws_ship_date_sk = d_date_sk
  AND ws_warehouse_sk = w_warehouse_sk
  AND ws_ship_mode_sk = sm_ship_mode_sk
GROUP BY substr(w_warehouse_name, 1, 20), sm_type
ORDER BY wh, sm_type
LIMIT 100
"""

# q69 — demographics of store-only shoppers (NOT EXISTS variant)
# (tpcds_3.2/q69.sql)
Q69 = """
SELECT cd_gender, cd_marital_status, cd_education_status, COUNT(*) cnt1,
       cd_purchase_estimate, COUNT(*) cnt2, cd_credit_rating, COUNT(*) cnt3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_state IN ('CA', 'IL', 'SD')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_moy BETWEEN 1 AND 3)
  AND (NOT EXISTS (SELECT * FROM web_sales, date_dim
                   WHERE c.c_customer_sk = ws_bill_customer_sk
                     AND ws_sold_date_sk = d_date_sk
                     AND d_year = 2000 AND d_moy BETWEEN 1 AND 3)
   AND NOT EXISTS (SELECT * FROM catalog_sales, date_dim
                   WHERE c.c_customer_sk = cs_ship_customer_sk
                     AND cs_sold_date_sk = d_date_sk
                     AND d_year = 2000 AND d_moy BETWEEN 1 AND 3))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
ORDER BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
LIMIT 100
"""

# q70 — state/county profit rollup restricted to top-5 ranked states
# (tpcds_3.2/q70.sql)
Q70 = """
SELECT SUM(ss_net_profit) AS total_sum, s_state, s_county,
       GROUPING(s_state) + GROUPING(s_county) AS lochierarchy,
       RANK() OVER (
         PARTITION BY GROUPING(s_state) + GROUPING(s_county),
                      CASE WHEN GROUPING(s_county) = 0 THEN s_state END
         ORDER BY SUM(ss_net_profit) DESC) AS rank_within_parent
FROM store_sales, date_dim d1, store
WHERE d1.d_month_seq BETWEEN 1212 AND 1212 + 11
  AND d1.d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_state IN (SELECT s_state FROM (
      SELECT s_state AS s_state,
             RANK() OVER (PARTITION BY s_state
                          ORDER BY SUM(ss_net_profit) DESC) AS ranking
      FROM store_sales, store, date_dim
      WHERE d_month_seq BETWEEN 1212 AND 1212 + 11
        AND d_date_sk = ss_sold_date_sk
        AND s_store_sk = ss_store_sk
      GROUP BY s_state) tmp1
    WHERE ranking <= 5)
GROUP BY ROLLUP (s_state, s_county)
ORDER BY lochierarchy DESC,
         CASE WHEN lochierarchy = 0 THEN s_state END,
         rank_within_parent
LIMIT 100
"""

# q74 — store-vs-web year-over-year growth by max net paid
# (tpcds_3.2/q74.sql)
Q74 = """
WITH year_total AS (
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name, d_year AS year,
         MAX(ss_net_paid) year_total, 's' sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
    AND d_year IN (2000, 2001)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, d_year,
         MAX(ws_net_paid), 'w'
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
    AND d_year IN (2000, 2001)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.year = 2000 AND t_s_secyear.year = 2001
  AND t_w_firstyear.year = 2000 AND t_w_secyear.year = 2001
  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_w_firstyear.year_total > 0
           THEN CAST(t_w_secyear.year_total AS DOUBLE)
                / CAST(t_w_firstyear.year_total AS DOUBLE)
           ELSE NULL END
    > CASE WHEN t_s_firstyear.year_total > 0
           THEN CAST(t_s_secyear.year_total AS DOUBLE)
                / CAST(t_s_firstyear.year_total AS DOUBLE)
           ELSE NULL END
ORDER BY 2, 1, 3
LIMIT 100
"""

# q75 — year-over-year net-of-returns decline across all three channels
# (tpcds_3.2/q75.sql; ratio cast to double)
Q75 = """
WITH all_sales AS (
  SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
         SUM(sales_cnt) AS sales_cnt, SUM(sales_amt) AS sales_amt
  FROM (SELECT d_year, i_brand_id, i_class_id, i_category_id,
               i_manufact_id,
               cs_quantity - COALESCE(cr_return_quantity, 0) AS sales_cnt,
               cs_ext_sales_price - COALESCE(cr_return_amount, 0.0)
                 AS sales_amt
        FROM catalog_sales
        JOIN item ON i_item_sk = cs_item_sk
        JOIN date_dim ON d_date_sk = cs_sold_date_sk
        LEFT JOIN catalog_returns ON (cs_order_number = cr_order_number
                                      AND cs_item_sk = cr_item_sk)
        WHERE i_category = 'Sports'
        UNION
        SELECT d_year, i_brand_id, i_class_id, i_category_id,
               i_manufact_id,
               ss_quantity - COALESCE(sr_return_quantity, 0),
               ss_ext_sales_price - COALESCE(sr_return_amt, 0.0)
        FROM store_sales
        JOIN item ON i_item_sk = ss_item_sk
        JOIN date_dim ON d_date_sk = ss_sold_date_sk
        LEFT JOIN store_returns ON (ss_ticket_number = sr_ticket_number
                                    AND ss_item_sk = sr_item_sk)
        WHERE i_category = 'Sports'
        UNION
        SELECT d_year, i_brand_id, i_class_id, i_category_id,
               i_manufact_id,
               ws_quantity - COALESCE(wr_return_quantity, 0),
               ws_ext_sales_price - COALESCE(wr_return_amt, 0.0)
        FROM web_sales
        JOIN item ON i_item_sk = ws_item_sk
        JOIN date_dim ON d_date_sk = ws_sold_date_sk
        LEFT JOIN web_returns ON (ws_order_number = wr_order_number
                                  AND ws_item_sk = wr_item_sk)
        WHERE i_category = 'Sports') sales_detail
  GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
SELECT prev_yr.d_year AS prev_year, curr_yr.d_year AS year,
       curr_yr.i_brand_id, curr_yr.i_class_id, curr_yr.i_category_id,
       curr_yr.i_manufact_id,
       prev_yr.sales_cnt AS prev_yr_cnt, curr_yr.sales_cnt AS curr_yr_cnt,
       curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
       curr_yr.sales_amt - prev_yr.sales_amt AS sales_amt_diff
FROM all_sales curr_yr, all_sales prev_yr
WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
  AND curr_yr.i_class_id = prev_yr.i_class_id
  AND curr_yr.i_category_id = prev_yr.i_category_id
  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
  AND curr_yr.d_year = 2001 AND prev_yr.d_year = 2000
  AND CAST(curr_yr.sales_cnt AS DOUBLE)
      / CAST(prev_yr.sales_cnt AS DOUBLE) < 0.9
ORDER BY sales_cnt_diff, sales_amt_diff, curr_yr.i_brand_id,
         curr_yr.i_class_id, curr_yr.i_manufact_id
LIMIT 100
"""

# q76 — sales recorded with a NULL key, per channel (tpcds_3.2/q76.sql;
# the generator plants deterministic NULL slices in ss_addr_sk,
# ws_web_page_sk, cs_warehouse_sk)
Q76 = """
SELECT channel, col_name, d_year, d_qoy, i_category,
       COUNT(*) sales_cnt, SUM(ext_sales_price) sales_amt
FROM (SELECT 'store' AS channel, 'ss_addr_sk' col_name, d_year, d_qoy,
             i_category, ss_ext_sales_price ext_sales_price
      FROM store_sales, item, date_dim
      WHERE ss_addr_sk IS NULL
        AND ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      UNION ALL
      SELECT 'web', 'ws_web_page_sk', d_year, d_qoy, i_category,
             ws_ext_sales_price
      FROM web_sales, item, date_dim
      WHERE ws_web_page_sk IS NULL
        AND ws_sold_date_sk = d_date_sk AND ws_item_sk = i_item_sk
      UNION ALL
      SELECT 'catalog', 'cs_warehouse_sk', d_year, d_qoy, i_category,
             cs_ext_sales_price
      FROM catalog_sales, item, date_dim
      WHERE cs_warehouse_sk IS NULL
        AND cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel, col_name, d_year, d_qoy, i_category
LIMIT 100
"""

# q80 — per-channel sales/returns/profit rollup with item+promo filters
# (tpcds_3.2/q80.sql; catalog_page/web_site -> warehouse reporting ids)
Q80 = """
WITH ssr AS (
  SELECT s_store_id AS store_id, SUM(ss_ext_sales_price) AS sales,
         SUM(COALESCE(sr_return_amt, 0)) AS returns_amt,
         SUM(ss_net_profit - COALESCE(sr_net_loss, 0)) AS profit
  FROM store_sales
  LEFT OUTER JOIN store_returns ON (ss_item_sk = sr_item_sk
                                    AND ss_ticket_number = sr_ticket_number),
       date_dim, store, item, promotion
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN CAST('1999-08-04' AS DATE)
                   AND (CAST('1999-08-04' AS DATE) + INTERVAL 30 DAYS)
    AND ss_store_sk = s_store_sk
    AND ss_item_sk = i_item_sk
    AND i_current_price > 50
    AND ss_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY s_store_id),
csr AS (
  SELECT w_warehouse_id AS catalog_page_id,
         SUM(cs_ext_sales_price) AS sales,
         SUM(COALESCE(cr_return_amount, 0)) AS returns_amt,
         SUM(cs_net_profit - COALESCE(cr_net_loss, 0)) AS profit
  FROM catalog_sales
  LEFT OUTER JOIN catalog_returns ON (cs_item_sk = cr_item_sk
                                      AND cs_order_number = cr_order_number),
       date_dim, warehouse, item, promotion
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN CAST('1999-08-04' AS DATE)
                   AND (CAST('1999-08-04' AS DATE) + INTERVAL 30 DAYS)
    AND cs_warehouse_sk = w_warehouse_sk
    AND cs_item_sk = i_item_sk
    AND i_current_price > 50
    AND cs_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY w_warehouse_id),
wsr AS (
  SELECT w_warehouse_id AS web_site_id, SUM(ws_ext_sales_price) AS sales,
         SUM(COALESCE(wr_return_amt, 0)) AS returns_amt,
         SUM(ws_net_profit - COALESCE(wr_net_loss, 0)) AS profit
  FROM web_sales
  LEFT OUTER JOIN web_returns ON (ws_item_sk = wr_item_sk
                                  AND ws_order_number = wr_order_number),
       date_dim, warehouse, item, promotion
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN CAST('1999-08-04' AS DATE)
                   AND (CAST('1999-08-04' AS DATE) + INTERVAL 30 DAYS)
    AND ws_warehouse_sk = w_warehouse_sk
    AND ws_item_sk = i_item_sk
    AND i_current_price > 50
    AND ws_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY w_warehouse_id)
SELECT channel, id, SUM(sales) AS sales,
       SUM(returns_amt) AS returns_amt, SUM(profit) AS profit
FROM (SELECT 'store channel' AS channel, 'store' || store_id AS id,
             sales, returns_amt, profit
      FROM ssr
      UNION ALL
      SELECT 'catalog channel', 'catalog_page' || catalog_page_id,
             sales, returns_amt, profit
      FROM csr
      UNION ALL
      SELECT 'web channel', 'web_site' || web_site_id,
             sales, returns_amt, profit
      FROM wsr) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel, id
LIMIT 100
"""

# q81 — catalog returners over 1.2x their state's average, full address
# projection (tpcds_3.2/q81.sql)
Q81 = """
WITH customer_total_return AS (
  SELECT cr_returning_customer_sk AS ctr_customer_sk,
         ca_state AS ctr_state,
         SUM(cr_return_amt_inc_tax) AS ctr_total_return
  FROM catalog_returns, date_dim, customer_address
  WHERE cr_returned_date_sk = d_date_sk AND d_year = 2000
    AND cr_returning_addr_sk = ca_address_sk
  GROUP BY cr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       ca_street_number, ca_street_name, ca_street_type, ca_suite_number,
       ca_city, ca_county, ca_state, ca_zip, ca_country, ca_gmt_offset,
       ca_location_type, ctr_total_return
FROM customer_total_return ctr1, customer_address, customer
WHERE ctr1.ctr_total_return > (
    SELECT ROUND(CAST(SUM(ctr_total_return) AS DOUBLE)
                 / COUNT(ctr_total_return) * 1.2, 4)
    FROM customer_total_return ctr2
    WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'IL'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id
LIMIT 100
"""

# q83 — returned quantities across the three channels for chosen weeks
# (tpcds_3.2/q83.sql)
Q83 = """
WITH sr_items AS (
  SELECT i_item_id item_id, SUM(sr_return_quantity) sr_item_qty
  FROM store_returns, item, date_dim
  WHERE sr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_year = 1999))
    AND sr_returned_date_sk = d_date_sk
  GROUP BY i_item_id),
cr_items AS (
  SELECT i_item_id item_id, SUM(cr_return_quantity) cr_item_qty
  FROM catalog_returns, item, date_dim
  WHERE cr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_year = 1999))
    AND cr_returned_date_sk = d_date_sk
  GROUP BY i_item_id),
wr_items AS (
  SELECT i_item_id item_id, SUM(wr_return_quantity) wr_item_qty
  FROM web_returns, item, date_dim
  WHERE wr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_year = 1999))
    AND wr_returned_date_sk = d_date_sk
  GROUP BY i_item_id)
SELECT sr_items.item_id, sr_item_qty,
       ROUND(CAST(sr_item_qty AS DOUBLE)
             / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
             / 3.0 * 100, 4) sr_dev,
       cr_item_qty,
       ROUND(CAST(cr_item_qty AS DOUBLE)
             / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
             / 3.0 * 100, 4) cr_dev,
       wr_item_qty,
       ROUND(CAST(wr_item_qty AS DOUBLE)
             / CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
             / 3.0 * 100, 4) wr_dev,
       ROUND(CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE)
             / 3.0, 4) average
FROM sr_items, cr_items, wr_items
WHERE sr_items.item_id = cr_items.item_id
  AND sr_items.item_id = wr_items.item_id
ORDER BY sr_items.item_id, sr_item_qty
LIMIT 100
"""

# q86 — web category/class rollup with rank within parent
# (tpcds_3.2/q86.sql)
Q86 = """
SELECT SUM(ws_net_paid) AS total_sum, i_category, i_class,
       GROUPING(i_category) + GROUPING(i_class) AS lochierarchy,
       RANK() OVER (
         PARTITION BY GROUPING(i_category) + GROUPING(i_class),
                      CASE WHEN GROUPING(i_class) = 0 THEN i_category END
         ORDER BY SUM(ws_net_paid) DESC) AS rank_within_parent
FROM web_sales, date_dim d1, item
WHERE d1.d_month_seq BETWEEN 1212 AND 1212 + 11
  AND d1.d_date_sk = ws_sold_date_sk
  AND i_item_sk = ws_item_sk
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC,
         CASE WHEN lochierarchy = 0 THEN i_category END,
         rank_within_parent
LIMIT 100
"""

# q99 — catalog shipping-lag day buckets per warehouse/ship-mode
# (tpcds_3.2/q99.sql; call_center dim dropped, as q62's web_site)
Q99 = """
SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk <= 30)
                THEN 1 ELSE 0 END) AS days_30,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 30)
                 AND (cs_ship_date_sk - cs_sold_date_sk <= 60)
                THEN 1 ELSE 0 END) AS days_31_60,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 60)
                 AND (cs_ship_date_sk - cs_sold_date_sk <= 90)
                THEN 1 ELSE 0 END) AS days_61_90,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 90)
                 AND (cs_ship_date_sk - cs_sold_date_sk <= 120)
                THEN 1 ELSE 0 END) AS days_91_120,
       SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 120)
                THEN 1 ELSE 0 END) AS days_over_120
FROM catalog_sales, warehouse, ship_mode, date_dim
WHERE d_month_seq BETWEEN 1212 AND 1212 + 11
  AND cs_ship_date_sk = d_date_sk
  AND cs_warehouse_sk = w_warehouse_sk
  AND cs_ship_mode_sk = sm_ship_mode_sk
GROUP BY substr(w_warehouse_name, 1, 20), sm_type
ORDER BY wh, sm_type
LIMIT 100
"""


@pytest.mark.parametrize(
    "name,sql",
    [("q51", Q51), ("q53", Q53), ("q56", Q56), ("q57", Q57), ("q58", Q58),
     ("q61", Q61), ("q62", Q62), ("q69", Q69), ("q70", Q70), ("q74", Q74),
     ("q75", Q75), ("q76", Q76), ("q80", Q80), ("q81", Q81), ("q83", Q83),
     ("q86", Q86), ("q99", Q99)],
)
def test_tpcds_real_window_rollup(tpcds_star, name, sql):
    _compare(tpcds_star, sql)
