"""Remaining TPC-H query shapes over the fixture schema: q9, q11, q13,
q16, q20, q21 — the decision-support plans not yet represented in the
registered surface (generalizing the reference's O20 SQL layer,
README.md:134, the same way operators/relational.py does).

The fixtures carry no `partsupp` table, no `l_commitdate`/
`l_receiptdate`, and no comment columns, so the four queries that
depend on them are ADAPTED, preserving the plan shape that makes each
interesting rather than the literal TPC-H text:

- q9:  cost side rebuilt from `p_retailprice * l_quantity` instead of
       `ps_supplycost` (same 5-table star + LIKE filter + per-year agg).
- q11: "important stock" becomes per-part revenue share with the group
       filter against a scalar-subquery global total (same
       HAVING-vs-scalar-subquery shape).
- q16: the part-supplier bridge is `SELECT DISTINCT l_partkey,
       l_suppkey FROM lineitem` (the observed partsupp), complaints
       become negative account balance (same NOT IN + COUNT DISTINCT).
- q20: availability becomes shipped volume per (supplier, part) with a
       HAVING threshold (same nested IN-chain shape).
- q21: "kept orders waiting" is l_shipdate > o_orderdate + 60 days
       (same EXISTS / NOT EXISTS double self-join on the fact table).

Scale posture, common to all six: dimension joins (nation, supplier,
part at fixture scale) broadcast — no fact shuffle; fact-fact joins
and aggregations shuffle once on their key; the EXISTS/NOT EXISTS
forms are written as subqueries so Catalyst decorrelates them into
semi/anti joins (no nested-loop re-execution per row). At 100 TB the
same plans hold: the only growing shuffles are keyed on
l_orderkey/l_partkey/l_suppkey, all high-cardinality and unskewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from coursera_etl_pipeline_spark.catalog import views
from coursera_etl_pipeline_spark.registry import dsum, query

# Shared between the Spark text and the DuckDB oracle: both engines
# parse the identical ANSI query, so parity reduces to the determinism
# helpers (decimal-accumulated sums) already proven by the rest of the
# surface. Divergent dialect corners (INTERVAL syntax, year()) are
# avoided by sticking to the common subset.

_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""

_Q21 = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
  AND n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL '60' DAY)
GROUP BY s.s_name
"""

_Q9 = f"""
SELECT nation, o_year, {dsum('amount')} AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.6 * p.p_retailprice * l.l_quantity AS amount
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""

_Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type NOT LIKE 'ECONOMY%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""

_Q20 = """
SELECT s.s_suppkey, s.s_name
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_2', 'NATION_5', 'NATION_9', 'NATION_14')
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'blue%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(38,6))) > 45
  )
"""

_Q11 = f"""
SELECT l.l_partkey AS ps_partkey,
       {dsum('l.l_extendedprice * (1 - l.l_discount)')} AS part_value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_4', 'NATION_8')
GROUP BY l.l_partkey
HAVING SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
     > (SELECT SUM(CAST(l2.l_extendedprice * (1 - l2.l_discount) AS DECIMAL(38,6))) * 0.001
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        WHERE n2.n_name IN ('NATION_1', 'NATION_4', 'NATION_8'))
"""


@query("q13_customer_distribution", oracle=_Q13)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: LEFT OUTER JOIN with a compound on-clause
    predicate, then an aggregation OF an aggregation (orders per
    customer -> customers per order-count). The outer join shuffles
    once on custkey; the second groupBy is over ~#distinct counts —
    trivially small at any scale."""
    views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13)


@query("q21_waiting_suppliers", oracle=_Q21)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (adapted: late = shipped >60 days after order
    date): fact join + correlated EXISTS and NOT EXISTS against the
    same fact — Catalyst decorrelates both into left-semi / left-anti
    joins keyed on l_orderkey, so the heavy table is touched three
    times but every contact is an equi-join shuffle, never a per-row
    subquery loop."""
    views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(_Q21)


@query("q9_product_type_profit", oracle=_Q9)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape (adapted cost side, no partsupp in fixtures):
    5-table star join with a substring filter on the part dimension and
    a per-(nation, year) profit rollup. The LIKE filter prunes part
    before the join (pushed to the scan); dimensions broadcast; the
    only big shuffles are lineitem->orders on orderkey and the final
    2-key aggregation."""
    views(spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation")
    return spark.sql(_Q9)


@query("q16_supplier_part_count", oracle=_Q16)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: the part-supplier bridge is distilled from the
    fact table (DISTINCT l_partkey, l_suppkey — the observed partsupp),
    anti-filtered by a NOT IN subquery, then COUNT(DISTINCT supplier)
    per part attribute triple. The DISTINCT bridge is one shuffle on
    (partkey, suppkey); the NOT IN side is a handful of rows and
    broadcasts as an anti join."""
    views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_Q16)


@query("q20_excess_suppliers", oracle=_Q20)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: nested IN-chain — suppliers whose shipped
    volume of a part family crossed a per-(supplier, part) HAVING
    threshold, intersected with a nation filter. The inner aggregate
    runs once over the pruned fact (date + LIKE pushdown), and the IN
    becomes a semi join against its tiny result."""
    views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20)


@query("q11_important_parts", oracle=_Q11)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: group filter against a scalar subquery — parts
    whose revenue (within a nation group) exceeds a fraction of the
    group's global revenue. The scalar subquery is a 1-row broadcast;
    both sides accumulate in exact DECIMAL so the threshold comparison
    is bit-identical across engines (no boundary-row flapping)."""
    views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11)
