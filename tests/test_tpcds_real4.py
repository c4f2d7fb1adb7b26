"""Real TPC-DS SQL, batch 4 — correlated-subquery and EXISTS families.

Spec texts from tpcds_3.2/q*.sql over the generated star; identical-rows
contract vs DuckDB as in batches 1-3.  Adaptations follow the house
rules established there: in-domain literals; DECIMAL averages/ratios
rewritten as ONE double division of exact DECIMAL sums with ROUND
(Spark's decimal avg/division rescaling differs from DuckDB's
double-path in trailing digits); q9's count thresholds re-centered on
the sf0.002 row counts so both CASE branches are exercised.
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


# q1 — customers returning over 1.2x their store's average fee
# (tpcds_3.2/q1.sql)
Q1 = """
WITH customer_total_return AS (
  SELECT sr_customer_sk AS ctr_customer_sk, sr_store_sk AS ctr_store_sk,
         SUM(sr_fee) AS ctr_total_return
  FROM store_returns, date_dim
  WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
  GROUP BY sr_customer_sk, sr_store_sk)
SELECT c_customer_id
FROM customer_total_return ctr1, store, customer
WHERE ctr1.ctr_total_return > (
    SELECT ROUND(CAST(SUM(ctr_total_return) AS DOUBLE)
                 / COUNT(ctr_total_return) * 1.2, 4)
    FROM customer_total_return ctr2
    WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  AND s_store_sk = ctr1.ctr_store_sk
  AND s_state = 'TN'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id
LIMIT 100
"""

# q6 — states whose customers buy items priced over 1.2x the category
# average (tpcds_3.2/q6.sql)
Q6 = """
SELECT a.ca_state state, COUNT(*) cnt
FROM customer_address a, customer c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq = (SELECT DISTINCT (d_month_seq) FROM date_dim
                       WHERE d_year = 2000 AND d_moy = 2)
  AND i.i_current_price > 1.2 * (SELECT AVG(j.i_current_price) FROM item j
                                 WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING COUNT(*) >= 3
ORDER BY cnt, a.ca_state
LIMIT 100
"""

# q8 — store profit in zips with many preferred customers
# (tpcds_3.2/q8.sql; zip list from the shared store/address pool)
Q8 = """
SELECT s_store_name, SUM(ss_net_profit) AS net_profit
FROM store_sales, date_dim, store,
     (SELECT ca_zip FROM (
        SELECT substr(ca_zip, 1, 5) ca_zip FROM customer_address
        WHERE substr(ca_zip, 1, 5) IN ('37000', '37013', '37026', '37039',
                                       '37052', '37065', '37078', '37091')
        INTERSECT
        SELECT ca_zip FROM (
          SELECT substr(ca_zip, 1, 5) ca_zip, COUNT(*) cnt
          FROM customer_address, customer
          WHERE ca_address_sk = c_current_addr_sk
            AND c_preferred_cust_flag = 'Y'
          GROUP BY ca_zip HAVING COUNT(*) > 2) A1) A2) V1
WHERE ss_store_sk = s_store_sk
  AND ss_sold_date_sk = d_date_sk
  AND d_qoy = 1 AND d_year = 2000
  AND (substr(s_zip, 1, 2) = substr(V1.ca_zip, 1, 2))
GROUP BY s_store_name
ORDER BY s_store_name
LIMIT 100
"""

# q9 — five quantity-bucket CASE probes against scalar counts
# (tpcds_3.2/q9.sql; thresholds re-centered on sf0.002 bucket sizes so
# both branches fire)
Q9 = """
SELECT
  CASE WHEN (SELECT COUNT(*) FROM store_sales
             WHERE ss_quantity BETWEEN 1 AND 20) > 1000
       THEN (SELECT ROUND(CAST(SUM(ss_ext_discount_amt) AS DOUBLE)
                          / COUNT(ss_ext_discount_amt), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 1 AND 20)
       ELSE (SELECT ROUND(CAST(SUM(ss_net_profit) AS DOUBLE)
                          / COUNT(ss_net_profit), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 1 AND 20) END bucket1,
  CASE WHEN (SELECT COUNT(*) FROM store_sales
             WHERE ss_quantity BETWEEN 21 AND 40) > 1200
       THEN (SELECT ROUND(CAST(SUM(ss_ext_discount_amt) AS DOUBLE)
                          / COUNT(ss_ext_discount_amt), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 21 AND 40)
       ELSE (SELECT ROUND(CAST(SUM(ss_net_profit) AS DOUBLE)
                          / COUNT(ss_net_profit), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 21 AND 40) END bucket2,
  CASE WHEN (SELECT COUNT(*) FROM store_sales
             WHERE ss_quantity BETWEEN 41 AND 60) > 1000
       THEN (SELECT ROUND(CAST(SUM(ss_ext_discount_amt) AS DOUBLE)
                          / COUNT(ss_ext_discount_amt), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 41 AND 60)
       ELSE (SELECT ROUND(CAST(SUM(ss_net_profit) AS DOUBLE)
                          / COUNT(ss_net_profit), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 41 AND 60) END bucket3,
  CASE WHEN (SELECT COUNT(*) FROM store_sales
             WHERE ss_quantity BETWEEN 61 AND 80) > 1200
       THEN (SELECT ROUND(CAST(SUM(ss_ext_discount_amt) AS DOUBLE)
                          / COUNT(ss_ext_discount_amt), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 61 AND 80)
       ELSE (SELECT ROUND(CAST(SUM(ss_net_profit) AS DOUBLE)
                          / COUNT(ss_net_profit), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 61 AND 80) END bucket4,
  CASE WHEN (SELECT COUNT(*) FROM store_sales
             WHERE ss_quantity BETWEEN 81 AND 100) > 1000
       THEN (SELECT ROUND(CAST(SUM(ss_ext_discount_amt) AS DOUBLE)
                          / COUNT(ss_ext_discount_amt), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 81 AND 100)
       ELSE (SELECT ROUND(CAST(SUM(ss_net_profit) AS DOUBLE)
                          / COUNT(ss_net_profit), 4) FROM store_sales
             WHERE ss_quantity BETWEEN 81 AND 100) END bucket5
FROM reason WHERE r_reason_sk = 1
"""

# q10 — demographic profile of county customers active in 2+ channels
# (tpcds_3.2/q10.sql)
Q10 = """
SELECT cd_gender, cd_marital_status, cd_education_status, COUNT(*) cnt1,
       cd_purchase_estimate, COUNT(*) cnt2, cd_credit_rating, COUNT(*) cnt3,
       cd_dep_count, COUNT(*) cnt4, cd_dep_employed_count, COUNT(*) cnt5,
       cd_dep_college_count, COUNT(*) cnt6
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_county IN ('Williamson County', 'Walker County', 'Ziebach County')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_moy BETWEEN 4 AND 7)
  AND (EXISTS (SELECT * FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk
                 AND ws_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_moy BETWEEN 4 AND 7)
    OR EXISTS (SELECT * FROM catalog_sales, date_dim
               WHERE c.c_customer_sk = cs_ship_customer_sk
                 AND cs_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_moy BETWEEN 4 AND 7))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
ORDER BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
LIMIT 100
"""

# q12 — web revenue share within class over a 30-day window
# (tpcds_3.2/q12.sql; ratio via exact-sum double division, Q98's form)
Q12 = """
SELECT i_item_id, i_product_name, i_category, i_class, i_current_price,
       CAST(SUM(ws_ext_sales_price) AS DOUBLE) AS itemrevenue,
       ROUND(CAST(SUM(ws_ext_sales_price) AS DOUBLE) * 100.0
             / CAST(SUM(SUM(ws_ext_sales_price))
                    OVER (PARTITION BY i_class) AS DOUBLE), 4)
         AS revenueratio
FROM web_sales, item, date_dim
WHERE ws_item_sk = i_item_sk
  AND i_category IN ('Books', 'Sports', 'Music')
  AND ws_sold_date_sk = d_date_sk
  AND d_date BETWEEN CAST('2000-01-12' AS DATE)
                 AND (CAST('2000-01-12' AS DATE) + INTERVAL 30 DAYS)
GROUP BY i_item_id, i_product_name, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_product_name, revenueratio
LIMIT 100
"""

# q15 — catalog revenue by zip for target zips/states/big tickets
# (tpcds_3.2/q15.sql)
Q15 = """
SELECT ca_zip, SUM(cs_sales_price) AS sum_sales
FROM catalog_sales, customer, customer_address, date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (substr(ca_zip, 1, 5) IN ('37000', '37013', '37026', '37039')
       OR ca_state IN ('CA', 'WA', 'GA')
       OR cs_sales_price > 150)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2000
GROUP BY ca_zip
ORDER BY ca_zip
LIMIT 100
"""

# q18 — demographic rollup of seven catalog averages
# (tpcds_3.2/q18.sql; averages as exact-sum double divisions)
Q18 = """
SELECT i_item_id, ca_country, ca_state, ca_county,
       ROUND(CAST(SUM(cs_quantity) AS DOUBLE) / COUNT(cs_quantity), 4) agg1,
       ROUND(CAST(SUM(cs_list_price) AS DOUBLE) / COUNT(cs_list_price), 4) agg2,
       ROUND(CAST(SUM(cs_coupon_amt) AS DOUBLE) / COUNT(cs_coupon_amt), 4) agg3,
       ROUND(CAST(SUM(cs_sales_price) AS DOUBLE) / COUNT(cs_sales_price), 4) agg4,
       ROUND(CAST(SUM(cs_net_profit) AS DOUBLE) / COUNT(cs_net_profit), 4) agg5,
       ROUND(CAST(SUM(c_birth_year) AS DOUBLE) / COUNT(c_birth_year), 4) agg6,
       ROUND(CAST(SUM(cd1.cd_dep_count) AS DOUBLE)
             / COUNT(cd1.cd_dep_count), 4) agg7
FROM catalog_sales, customer_demographics cd1, customer_demographics cd2,
     customer, customer_address, date_dim, item
WHERE cs_sold_date_sk = d_date_sk
  AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd1.cd_demo_sk
  AND cs_bill_customer_sk = c_customer_sk
  AND cd1.cd_gender = 'M' AND cd1.cd_education_status = 'College'
  AND c_current_cdemo_sk = cd2.cd_demo_sk
  AND c_current_addr_sk = ca_address_sk
  AND c_birth_month IN (1, 3, 5, 9, 11, 12)
  AND d_year = 2000
  AND ca_state IN ('TN', 'CA', 'NY', 'TX', 'WA', 'GA', 'SD')
GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
ORDER BY ca_country, ca_state, ca_county, i_item_id
LIMIT 100
"""

# q20 — catalog revenue share within class (tpcds_3.2/q20.sql)
Q20 = """
SELECT i_item_id, i_product_name, i_category, i_class, i_current_price,
       CAST(SUM(cs_ext_sales_price) AS DOUBLE) AS itemrevenue,
       ROUND(CAST(SUM(cs_ext_sales_price) AS DOUBLE) * 100.0
             / CAST(SUM(SUM(cs_ext_sales_price))
                    OVER (PARTITION BY i_class) AS DOUBLE), 4)
         AS revenueratio
FROM catalog_sales, item, date_dim
WHERE cs_item_sk = i_item_sk
  AND i_category IN ('Books', 'Sports', 'Music')
  AND cs_sold_date_sk = d_date_sk
  AND d_date BETWEEN CAST('2000-01-12' AS DATE)
                 AND (CAST('2000-01-12' AS DATE) + INTERVAL 30 DAYS)
GROUP BY i_item_id, i_product_name, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_product_name, revenueratio
LIMIT 100
"""

# q30 — web returners over 1.2x their state's average, full customer
# projection (tpcds_3.2/q30.sql)
Q30 = """
WITH customer_total_return AS (
  SELECT wr_returning_customer_sk AS ctr_customer_sk, ca_state AS ctr_state,
         SUM(wr_return_amt) AS ctr_total_return
  FROM web_returns, date_dim, customer_address
  WHERE wr_returned_date_sk = d_date_sk AND d_year = 2000
    AND wr_returning_addr_sk = ca_address_sk
  GROUP BY wr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,
       c_birth_country, c_login, c_email_address, c_last_review_date_sk,
       ctr_total_return
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

# q31 — county web-vs-store quarter-over-quarter growth
# (tpcds_3.2/q31.sql; ratios as exact-sum double divisions)
Q31 = """
WITH ss AS (
  SELECT ca_county, d_qoy, d_year,
         SUM(ss_ext_sales_price) AS store_sales
  FROM store_sales, date_dim, customer_address
  WHERE ss_sold_date_sk = d_date_sk AND ss_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year),
ws AS (
  SELECT ca_county, d_qoy, d_year,
         SUM(ws_ext_sales_price) AS web_sales
  FROM web_sales, date_dim, customer_address
  WHERE ws_sold_date_sk = d_date_sk AND ws_bill_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year)
SELECT ss1.ca_county, ss1.d_year,
       ROUND(CAST(ws2.web_sales AS DOUBLE)
             / CAST(ws1.web_sales AS DOUBLE), 6) web_q1_q2_increase,
       ROUND(CAST(ss2.store_sales AS DOUBLE)
             / CAST(ss1.store_sales AS DOUBLE), 6) store_q1_q2_increase,
       ROUND(CAST(ws3.web_sales AS DOUBLE)
             / CAST(ws2.web_sales AS DOUBLE), 6) web_q2_q3_increase,
       ROUND(CAST(ss3.store_sales AS DOUBLE)
             / CAST(ss2.store_sales AS DOUBLE), 6) store_q2_q3_increase
FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
WHERE ss1.d_qoy = 1 AND ss1.d_year = 1999
  AND ss1.ca_county = ss2.ca_county AND ss2.d_qoy = 2 AND ss2.d_year = 1999
  AND ss2.ca_county = ss3.ca_county AND ss3.d_qoy = 3 AND ss3.d_year = 1999
  AND ss1.ca_county = ws1.ca_county AND ws1.d_qoy = 1 AND ws1.d_year = 1999
  AND ws1.ca_county = ws2.ca_county AND ws2.d_qoy = 2 AND ws2.d_year = 1999
  AND ws1.ca_county = ws3.ca_county AND ws3.d_qoy = 3 AND ws3.d_year = 1999
  AND CASE WHEN ws1.web_sales > 0
           THEN CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE)
           ELSE NULL END
    > CASE WHEN ss1.store_sales > 0
           THEN CAST(ss2.store_sales AS DOUBLE)
                / CAST(ss1.store_sales AS DOUBLE)
           ELSE NULL END
  AND CASE WHEN ws2.web_sales > 0
           THEN CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE)
           ELSE NULL END
    > CASE WHEN ss2.store_sales > 0
           THEN CAST(ss3.store_sales AS DOUBLE)
                / CAST(ss2.store_sales AS DOUBLE)
           ELSE NULL END
ORDER BY ss1.d_year, ss1.ca_county
"""

# q33 — manufacturer revenue across all three channels for one category
# and timezone (tpcds_3.2/q33.sql)
Q33 = """
WITH ss AS (
  SELECT i_manufact_id, SUM(ss_ext_sales_price) total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category IN ('Books'))
    AND ss_item_sk = i_item_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year = 1999 AND d_moy = 3
    AND ss_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
cs AS (
  SELECT i_manufact_id, SUM(cs_ext_sales_price) total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category IN ('Books'))
    AND cs_item_sk = i_item_sk
    AND cs_sold_date_sk = d_date_sk
    AND d_year = 1999 AND d_moy = 3
    AND cs_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
ws AS (
  SELECT i_manufact_id, SUM(ws_ext_sales_price) total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                          WHERE i_category IN ('Books'))
    AND ws_item_sk = i_item_sk
    AND ws_sold_date_sk = d_date_sk
    AND d_year = 1999 AND d_moy = 3
    AND ws_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id)
SELECT i_manufact_id, SUM(total_sales) total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_manufact_id
ORDER BY total_sales, i_manufact_id
LIMIT 100
"""

# q35 — dependent-count stats for multi-channel shoppers
# (tpcds_3.2/q35.sql)
Q35 = """
SELECT ca_state, cd_gender, cd_marital_status, cd_dep_count,
       COUNT(*) cnt1, AVG(cd_dep_count) avg1, MAX(cd_dep_count) max1,
       SUM(cd_dep_count) sum1,
       cd_dep_employed_count, COUNT(*) cnt2, AVG(cd_dep_employed_count) avg2,
       MAX(cd_dep_employed_count) max2, SUM(cd_dep_employed_count) sum2,
       cd_dep_college_count, COUNT(*) cnt3, AVG(cd_dep_college_count) avg3,
       MAX(cd_dep_college_count) max3, SUM(cd_dep_college_count) sum3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_qoy < 4)
  AND (EXISTS (SELECT * FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk
                 AND ws_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_qoy < 4)
    OR EXISTS (SELECT * FROM catalog_sales, date_dim
               WHERE c.c_customer_sk = cs_ship_customer_sk
                 AND cs_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_qoy < 4))
GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
ORDER BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
LIMIT 100
"""

# q38 — customers active in ALL three channels (INTERSECT chain)
# (tpcds_3.2/q38.sql)
Q38 = """
SELECT COUNT(*) AS hot_cust_count FROM (
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM store_sales, date_dim, customer
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 1212 AND 1212 + 11
  INTERSECT
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM catalog_sales, date_dim, customer
  WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
    AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 1212 AND 1212 + 11
  INTERSECT
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM web_sales, date_dim, customer
  WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
    AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 1212 AND 1212 + 11) hot_cust
"""

# q41 — manufacturers with qualifying item variants (item-only correlated
# COUNT; attribute combos from the generator's domains)
# (tpcds_3.2/q41.sql)
Q41 = """
SELECT DISTINCT (i_product_name)
FROM item i1
WHERE i_manufact_id BETWEEN 1 AND 40
  AND (SELECT COUNT(*) AS item_cnt FROM item
       WHERE (i_manufact = i1.i_manufact
              AND ((i_category = 'Shoes'
                    AND (i_color = 'orchid' OR i_color = 'maroon')
                    AND (i_units = 'Each' OR i_units = 'Dozen')
                    AND (i_size = 'petite' OR i_size = 'medium'))
                OR (i_category = 'Music'
                    AND (i_color = 'navy' OR i_color = 'ivory')
                    AND (i_units = 'Case' OR i_units = 'Pallet')
                    AND (i_size = 'small' OR i_size = 'large'))))
          OR (i_manufact = i1.i_manufact
              AND ((i_category = 'Sports'
                    AND (i_color = 'salmon' OR i_color = 'steel')
                    AND (i_units = 'Ounce' OR i_units = 'Each')
                    AND (i_size = 'petite' OR i_size = 'medium'))
                OR (i_category = 'Home'
                    AND (i_color = 'chocolate' OR i_color = 'peach')
                    AND (i_units = 'Dozen' OR i_units = 'Case')
                    AND (i_size = 'extra large' OR i_size = 'small'))))) > 0
ORDER BY i_product_name
LIMIT 100
"""

# q87 — store shoppers in NEITHER other channel (EXCEPT chain)
# (tpcds_3.2/q87.sql)
Q87 = """
SELECT COUNT(*) AS cool_cust_count FROM (
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM store_sales, date_dim, customer
   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
     AND store_sales.ss_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 1212 AND 1212 + 11)
  EXCEPT
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM catalog_sales, date_dim, customer
   WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
     AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 1212 AND 1212 + 11)
  EXCEPT
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM web_sales, date_dim, customer
   WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
     AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 1212 AND 1212 + 11)) cool_cust
"""


@pytest.mark.parametrize(
    "name,sql",
    [("q1", Q1), ("q6", Q6), ("q8", Q8), ("q9", Q9), ("q10", Q10),
     ("q12", Q12), ("q15", Q15), ("q18", Q18), ("q20", Q20), ("q30", Q30),
     ("q31", Q31), ("q33", Q33), ("q35", Q35), ("q38", Q38), ("q41", Q41),
     ("q87", Q87)],
)
def test_tpcds_real_subquery_families(tpcds_star, name, sql):
    _compare(tpcds_star, sql)
