"""Flagship query — TPC-H-Q3-shaped shipping-priority revenue report.

The minimum end-to-end slice (SURVEY.md §7 Phase 0): scan + filter +
join + aggregate + sort + limit, exercising predicate pushdown (the date
filters reach the parquet scan), broadcast of the small filtered customer
side, partial aggregation, and TakeOrderedAndProject for the top-k.

At 100 TB: customer(BUILDING) after the segment filter is ~1/5 of
customers — still too big to broadcast at full scale, so we leave join
selection to Catalyst/AQE rather than forcing a hint; the groupBy key
(l_orderkey) is high-cardinality and evenly distributed, so the shuffle
is skew-free; top-10 uses per-partition partial top-k (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.registry import register

_CUTOFF = "1998-06-01"

FLAGSHIP_ORACLE = f"""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{_CUTOFF}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("flagship_q3", FLAGSHIP_ORACLE)
def flagship_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < _CUTOFF),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_shipdate") > _CUTOFF),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
