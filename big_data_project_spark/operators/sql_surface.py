"""Pure-SQL entry surface: the same engine driven through ``spark.sql``
text instead of the DataFrame builder (SURVEY §1.3/§3.4 — both are thin
clients over the same Catalyst plans; a reference user coming from a SQL
warehouse uses this path).

These queries also exercise the Catalyst rewrites SURVEY §4.2 claims for
free: correlated-EXISTS decorrelation into a semi-join, scalar-subquery
decorrelation into a broadcast join + agg, and (Spark 4) recursive CTE
evaluation. Each oracle is near-verbatim the same ANSI text, which is the
point: the SQL dialect surface matches the oracle engine's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_project_spark.io import load_all
from big_data_project_spark.registry import query


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    load_all(spark, sf_dir)  # registers every fixture table as a temp view
    return spark.sql(text)


# --- CTE + window + join, SQL-first ----------------------------------------

_TOP_CUSTOMERS = """
WITH revenue AS (
  SELECT o_custkey, round(sum(o_totalprice), 4) AS total_spent,
         count(*) AS n_orders
  FROM orders
  GROUP BY o_custkey
),
ranked AS (
  SELECT c.c_mktsegment, c.c_custkey, r.total_spent, r.n_orders,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY r.total_spent DESC, c.c_custkey) AS rk
  FROM revenue r JOIN customer c ON r.o_custkey = c.c_custkey
)
SELECT c_mktsegment, c_custkey, total_spent, n_orders
FROM ranked WHERE rk <= 3
"""


@query("sql_cte_top_customers", oracle=_TOP_CUSTOMERS)
def sql_cte_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical SQL text runs on both engines — CTE inlining, join
    strategy, and window execution are each engine's own business."""
    return _sql(spark, sf_dir, _TOP_CUSTOMERS)


# --- correlated EXISTS (decorrelates to a semi-join) ------------------------

_EXISTS = """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey AND l_discount > 0.09
)
GROUP BY n_name
"""


@query("sql_correlated_exists", oracle=_EXISTS)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates to a left-semi hash join
    (no per-row subquery execution; the naive interpretation is O(n·m))."""
    return _sql(spark, sf_dir, _EXISTS)


# --- correlated scalar subquery --------------------------------------------

_SCALAR_SUB = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_above_avg
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_mktsegment = c.c_mktsegment)
GROUP BY c_mktsegment
"""


@query("sql_scalar_subquery", oracle=_SCALAR_SUB)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-segment average) — decorrelated
    into an aggregate + join rather than executed per row."""
    return _sql(spark, sf_dir, _SCALAR_SUB)


# --- correlated aggregate vs per-group threshold (TPC-H Q17 pattern) --------

_SMALL_QTY = """
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_small,
       round(sum(l.l_extendedprice) / 7.0 + 1e-9, 4) AS avg_yearly
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_returnflag
"""


@query("sql_small_qty_revenue", oracle=_SMALL_QTY)
def sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: each row compared against an aggregate of its OWN
    group (half the part's average quantity). Catalyst decorrelates the
    per-part scalar subquery into one grouped aggregate joined back on
    l_partkey — the fact table is scanned twice but shuffled on the same
    key both times, never executed per-row. At 100 TB the per-part
    aggregate is ~|parts| rows: orders of magnitude smaller than the
    fact, so the join-back broadcasts or co-partitions cheaply."""
    return _sql(spark, sf_dir, _SMALL_QTY)


# --- doubly nested subquery (TPC-H Q20 pattern) ------------------------------

_EXCESS_SHIPPERS = """
SELECT s.s_name, n.n_name,
       CAST(s.s_suppkey AS BIGINT) AS s_suppkey
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
    SELECT p.p_partkey FROM part p WHERE p.p_type = 'PROMO'
  )
  GROUP BY l.l_suppkey
  HAVING sum(l.l_quantity) > (SELECT avg(l2.l_quantity) * 20 FROM lineitem l2)
)
"""


@query("sql_excess_shippers", oracle=_EXCESS_SHIPPERS)
def sql_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN-subquery nested inside an IN-subquery, with an
    uncorrelated scalar subquery in the HAVING. All three levels must
    flatten — part-filter → semi join into lineitem, supplier IN → semi
    join, the scalar average → a one-row broadcast — so the plan is
    joins+aggregates end to end, no per-row subquery execution at any
    depth."""
    return _sql(spark, sf_dir, _EXCESS_SHIPPERS)


# --- error-tolerant expressions (try_*) --------------------------------------

_TRY_FUNCS = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(try_cast(json_extract_string(props, '$.k') AS INTEGER))
            AS BIGINT) AS n_valid_k,
       round(sum(coalesce(try_cast(json_extract_string(props, '$.k') AS INTEGER), 0))
             / nullif(sum(CASE WHEN value <> 0 THEN 1 ELSE 0 END), 0) + 1e-9, 4)
         AS k_per_nonzero
FROM events
GROUP BY event_type
"""

_TRY_FUNCS_SPARK = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(try_cast(get_json_object(props, '$.k') AS INTEGER))
            AS BIGINT) AS n_valid_k,
       round(sum(coalesce(try_cast(get_json_object(props, '$.k') AS INTEGER), 0))
             / nullif(sum(CASE WHEN value <> 0 THEN 1 ELSE 0 END), 0) + 1e-9, 4)
         AS k_per_nonzero
FROM events
GROUP BY event_type
"""


@query("sql_try_functions", oracle=_TRY_FUNCS)
def sql_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant expressions under ANSI mode: try_cast yields NULL on
    malformed input instead of failing the query, and nullif guards the
    division. On a 100 TB corpus a handful of bad rows must never kill
    the job — the try_* family is the row-level quarantine that keeps
    ANSI's overflow/cast strictness everywhere else. (Only the JSON
    accessor differs between dialects: get_json_object vs
    json_extract_string.)"""
    return _sql(spark, sf_dir, _TRY_FUNCS_SPARK)


# --- recursive CTE (Spark 4) ------------------------------------------------

_RECURSIVE = """
WITH RECURSIVE days(d) AS (
  SELECT DATE '2024-01-01'
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '2024-01-30'
)
SELECT CAST(d AS TIMESTAMP) AS day,
       CAST((SELECT count(*) FROM events e
             WHERE e.ts >= d AND e.ts < d + INTERVAL 1 DAY) AS BIGINT) AS n_events
FROM days
"""


@query("sql_recursive_cte", oracle=_RECURSIVE)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x) generating a day spine + a correlated
    count per day — the calendar-dimension pattern without a stored dim
    table. (For plain ranges ``sequence()`` is cheaper — see
    b4_resample_ffill; recursion is for genuinely inductive state.)"""
    return _sql(spark, sf_dir, _RECURSIVE)


# --- double-correlated EXISTS / NOT EXISTS (TPC-H Q21 pattern) ---------------

_WAITING_SUPPLIERS = """
SELECT s.s_name, n.n_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query("sql_waiting_suppliers", oracle=_WAITING_SUPPLIERS)
def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to the fixture: 'late' = shipped > 60 days
    after the order date): the sole late supplier on a multi-supplier
    finished order. Hardest decorrelation case in the TPC-H suite — one
    EXISTS and one NOT EXISTS over the same fact table, the NOT EXISTS
    correlated on columns of TWO outer tables (l1 and o). Catalyst turns
    them into a left-semi and a left-anti join against lineitem keyed on
    l_orderkey, so the fact is scanned thrice but every probe is a hash
    join on the same shuffle key — co-partitioned, never per-row."""
    return _sql(spark, sf_dir, _WAITING_SUPPLIERS)


# --- LATERAL correlated derived table ---------------------------------------

_LATERAL_TOPK = """
SELECT r.r_name, n.n_name, t.s_suppkey, round(t.s_acctbal, 4) AS s_acctbal
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey,
LATERAL (
  SELECT s.s_suppkey, s.s_acctbal
  FROM supplier s
  WHERE s.s_nationkey = n.n_nationkey
  ORDER BY s.s_acctbal DESC, s.s_suppkey
  LIMIT 2
) t
"""


@query("sql_lateral_topk", oracle=_LATERAL_TOPK)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table: per-nation top-2 suppliers by
    account balance, written as a for-each-row subselect instead of a
    window. Spark rewrites the lateral into a DomainJoin — dedup the
    correlation domain, run the subquery once per DISTINCT nation, join
    back — which is exactly the window-function plan's cost shape, not a
    per-row loop. Deterministic under LIMIT via the (balance, suppkey)
    total order on both engines."""
    return _sql(spark, sf_dir, _LATERAL_TOPK)


# --- SQL pipe syntax (Spark 4) ----------------------------------------------

_PIPE_ORACLE = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(sum(l_extendedprice) + 1e-9, 4) AS total
FROM lineitem
WHERE l_quantity > 45
GROUP BY l_returnflag
"""

_PIPE_SPARK = """
FROM lineitem
|> WHERE l_quantity > 45
|> AGGREGATE CAST(count(*) AS BIGINT) AS n,
             round(sum(l_extendedprice) + 1e-9, 4) AS total
   GROUP BY l_returnflag
"""


@query("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the dataflow-ordered dialect — each |>
    stage consumes the previous relation, in the order the engine
    actually executes (scan → filter → aggregate), compiled to the very
    same Catalyst plan as the classic nested form the oracle runs. The
    third entry dialect after DataFrame builders and classic SQL text."""
    return _sql(spark, sf_dir, _PIPE_SPARK)


# --- Collation-aware comparison (Spark 4) -----------------------------------

_COLLATE_ORACLE = """
WITH mixed AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg
  FROM customer
)
SELECT CAST(count(DISTINCT seg) AS BIGINT) AS n_binary_distinct,
       CAST(count(DISTINCT lower(seg)) AS BIGINT) AS n_lcase_distinct
FROM mixed
"""

_COLLATE_SPARK = """
WITH mixed AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg
  FROM customer
)
SELECT CAST(count(DISTINCT seg) AS BIGINT) AS n_binary_distinct,
       CAST(count(DISTINCT collate(seg, 'UTF8_LCASE')) AS BIGINT)
         AS n_lcase_distinct
FROM mixed
"""


@query("f3b_collated_distinct", oracle=_COLLATE_ORACLE)
def f3b_collated_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4): UTF8_LCASE collation makes
    equality, grouping, and DISTINCT case-insensitive at the COMPARISON
    level — no lower() rewriting of the data, and unlike lower() the
    collation composes with joins/sorts through the planner. Mixed-case
    segments collapse 10 → 5 under the collation; the oracle reproduces
    the semantics with lower() since DuckDB compares binary."""
    return _sql(spark, sf_dir, _COLLATE_SPARK)
