"""Projections, filters, predicates (SURVEY.md §2.2).

Reference behavior reconstructed: row filtering and derived-field
computation during curator-sheet cleanup (SURVEY.md §0 — public-knowledge
reconstruction; the mount is empty). All operators are single-pass
narrow transformations: no shuffle, filters and projections push into the
parquet scan (verified via .explain — PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.registry import register


_REV = "l_extendedprice * (1 - l_discount)"


@register("project_compute", f"""
SELECT l_orderkey, l_linenumber,
       l_quantity AS qty,
       {sql_rnd(_REV)} AS revenue,
       {sql_rnd(f"{_REV} * (1 + l_tax)")} AS charged
FROM lineitem
""")
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row products of 2dp decimals land on .xx5 rounding ties —
    # use the cross-engine deterministic rounder, not native round()
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("qty"),
        rnd(disc).alias("revenue"),
        rnd(disc * (1 + F.col("l_tax"))).alias("charged"),
    )


@register("filter_compound", """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q6-shaped predicate; every conjunct is pushable into parquet.
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


@register("filter_in_like_null", """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderstatus LIKE 'F%'
  AND o_custkey IS NOT NULL
""")
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    # controlled-vocabulary membership + pattern + null validation
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").like("F%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@register("distinct_rows", """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
""")
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@register("subquery_correlated", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
""")
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # correlated scalar subquery ("orders 50% above this customer's
    # average"), expressed through the SQL entry point. Catalyst's
    # RewriteCorrelatedScalarSubquery decorrelates it into an aggregate
    # + join (SURVEY.md §4) — no per-row subquery execution exists in
    # the physical plan at any scale.
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
                                    FROM orders_v o2
                                    WHERE o2.o_custkey = o.o_custkey)
    """)


@register("sql_parameterized", """
SELECT o_orderpriority, count(*) AS n,
       sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))::BIGINT
           AS cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
""")
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL — named parameter markers bound through
    `spark.sql(query, args=...)`: the values travel as LITERALS in the
    analyzed plan, never pasted into the query text, which is both the
    injection-safe templating surface every query service needs and
    the plan-cache-friendly form (same text, different args). The
    markers behave exactly like the inlined constants the oracle
    states, including predicate pushdown of the bound dates.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_param_v")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                   AS cents
        FROM orders_param_v
        WHERE o_orderdate >= :lo AND o_orderdate < :hi
        GROUP BY o_orderpriority
        """,
        args={"lo": "1996-01-01", "hi": "1997-01-01"})


@register("sql_session_variables", """
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders)
                    - INTERVAL 90 DAY
GROUP BY o_orderpriority
""")
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SESSION VARIABLES (`DECLARE` / `SET VAR`) — engine-held
    session state: a computed scalar (the corpus's high-water-mark
    order date) is stored ONCE and referenced by name in later
    queries, replacing the re-evaluated scalar subquery the oracle
    states. The production pattern for incremental jobs: the watermark
    is computed in one statement, then drives any number of extraction
    queries in the same session without re-scanning or string-pasting.
    Exact DATE arithmetic — no float threshold can flip between
    engines.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_var_v")
    # the variable is SESSION-scoped shared state (same class as temp
    # views): a concurrent invocation of this op re-derives the same
    # value from the same data, so the race is benign; no other
    # operator uses the name
    spark.sql("DECLARE OR REPLACE VARIABLE mdis_hwm TIMESTAMP")
    spark.sql("SET VAR mdis_hwm = "
              "(SELECT max(o_orderdate) FROM orders_var_v)")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n
        FROM orders_var_v
        WHERE o_orderdate > mdis_hwm - INTERVAL 90 DAY
        GROUP BY o_orderpriority
    """)
