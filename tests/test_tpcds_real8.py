"""Real TPC-DS SQL, batch 8 — q60, the last spec text missing from the
cross-engine REAL-TEXT lane (tpcds_3.2/q60.sql).

q60 is the category-sliced sibling of q56/q33 (three-channel union of
per-item ext_sales_price for one month / one GMT band, buyers filtered
by address offset).  House adaptations as in batches 1-7: in-domain
literals for the generated star (category 'Music' from the generator's
six-category domain, d_year 2000 / d_moy 9, ca_gmt_offset -6 from the
-5..-8 band) — structure, join graph, subquery placement and ORDER BY
are the spec's own.
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


# q60 — three-channel per-item sales for one category/month/GMT band
# (tpcds_3.2/q60.sql)
Q60 = """
WITH ss AS (
  SELECT i_item_id, SUM(ss_ext_sales_price) total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_category IN ('Music'))
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 9
    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -6
  GROUP BY i_item_id),
cs AS (
  SELECT i_item_id, SUM(cs_ext_sales_price) total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_category IN ('Music'))
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 9
    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -6
  GROUP BY i_item_id),
ws AS (
  SELECT i_item_id, SUM(ws_ext_sales_price) total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_category IN ('Music'))
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 9
    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -6
  GROUP BY i_item_id)
SELECT i_item_id, SUM(total_sales) total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY i_item_id, total_sales
LIMIT 100
"""


def test_q60(tpcds_star):
    _compare(tpcds_star, Q60)
