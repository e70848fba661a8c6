"""Set operations (SURVEY.md §2.7).

Reference behavior reconstructed: combining sheet batches (union),
cross-sheet reconciliation (intersect), and gap detection (except).
``unionByName`` is used everywhere — positional union is a silent
correctness bug when column order drifts between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.registry import register

_HIGH_VALUE = 400_000.0


def _urgent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority") == "1-URGENT") \
            .select("o_orderkey", "o_totalprice", "o_orderpriority")


def _high_value(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > _HIGH_VALUE) \
            .select("o_orderkey", "o_totalprice", "o_orderpriority")


@register("set_union_all", f"""
SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
WHERE o_totalprice > {_HIGH_VALUE}
""")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dupes kept: an urgent high-value order appears twice — by design
    return _urgent(spark, sf_dir).unionByName(_high_value(spark, sf_dir))


@register("set_union_distinct", f"""
SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
WHERE o_totalprice > {_HIGH_VALUE}
""")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).unionByName(_high_value(spark, sf_dir)).distinct()


@register("set_intersect", """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
""")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ordering = o.select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(ordering)


@register("set_except", """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderpriority = '1-URGENT'
""")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gap detection with real gaps (see join_anti note)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderpriority") == "1-URGENT")
    return c.select("c_custkey").exceptAll(
        o.select(F.col("o_custkey").alias("c_custkey"))).distinct()


@register("set_except_all", """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bag-semantics difference: each open-order custkey occurrence is
    # cancelled by ONE urgent-order occurrence — multiplicity preserved,
    # unlike EXCEPT's set semantics (set_except)
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    right = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return left.exceptAll(right)


@register("set_intersect_all", """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bag intersection: min(multiplicity) occurrences survive per key
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    right = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return left.intersectAll(right)
