"""Sorts, limits, top-k (SURVEY.md §2.6).

Reference behavior reconstructed: deterministic report ordering and
top-N reports. ``orderBy(...).limit(k)`` compiles to Spark's
TakeOrderedAndProject — per-partition partial top-k then a single
driver-side merge of k·P rows, never a global sort; this is the plan
that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.registry import register


@register("sort_multi_null", """
SELECT c_custkey, c_acctbal,
       row_number() OVER (ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS rnk
FROM customer
""")
def sort_multi_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the rank column carries the ordering through the driver's
    # order-insensitive hash; tie-break on the unique key. Computed
    # via the distributed exact-rank primitive (r9: tools/plan_audit.py
    # flagged the original unpartitioned-window form — the 8th member
    # of the global-rank family, missed by every hand audit) so no
    # stage single-partitions the relation.
    from manual_data_ingest_spark.functions.ranking import (
        with_exact_global_rank)

    c = load_table(spark, sf_dir, "customer")
    return (with_exact_global_rank(
                c.select("c_custkey", "c_acctbal"),
                "c_acctbal", ["c_custkey"], descending=True,
                rank_col="rnk")
            .select("c_custkey", "c_acctbal",
                    F.col("rnk").cast("int").alias("rnk")))


@register("topk_global", """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""")
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(10))
