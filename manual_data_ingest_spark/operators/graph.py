"""Iterative graph algorithms over derived relation graphs (SURVEY.md §2).

PageRank on the nation-level trade graph: an edge src→dst with weight
w means customers of nation `src` bought w lineitems from suppliers of
nation `dst`. The graph derives from a 4-way join of the fact tables;
the rank iteration then runs over a dim-sized node set.

Scale shape: the EXPENSIVE part (edge extraction) is one distributed
join+aggregate pass over the facts — the iteration itself touches only
(node, rank) pairs, so at 100 TB the loop cost is |V|, not |E| rows per
step, and each step is a join+groupBy Catalyst plans like any other.
The driver loop carries only the iteration counter (the dedup_clusters
discipline); for deep iteration counts each step would localCheckpoint
to truncate lineage — at 5 fixed steps Catalyst handles the unrolled
plan directly.

Cross-engine float parity: all constants are evaluated as doubles in
both engines (`::DOUBLE` in the oracle — DuckDB would otherwise do
DECIMAL division), and the only order-sensitive float op is the
per-node contribution sum, whose last-bit drift is far below the 6dp
output rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.registry import register

_ITERS = 5
_DAMP = 0.85


def _pagerank_oracle(iters: int) -> str:
    """Generate the unrolled fixed-iteration PageRank as portable SQL."""
    head = """
WITH e AS (
  SELECT c_nationkey AS src, s_nationkey AS dst, count(*)::DOUBLE AS w
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), ow AS (
  SELECT src, sum(w) AS ow FROM e GROUP BY 1
), p AS (
  SELECT src, dst, w / ow AS p FROM e JOIN ow USING (src)
), nodes AS (
  SELECT n_nationkey AS node, n_name FROM nation
), nn AS (
  SELECT count(*) AS n FROM nodes
), r0 AS (
  SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS r FROM nodes
)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""", r{k} AS (
  SELECT nodes.node,
         0.15::DOUBLE / (SELECT n FROM nn)
         + {_DAMP}::DOUBLE * (
             coalesce(c.contrib, 0.0::DOUBLE)
             + (SELECT coalesce(sum(r), 0.0::DOUBLE) FROM r{k-1}
                WHERE node NOT IN (SELECT DISTINCT src FROM p))
               / (SELECT n FROM nn)) AS r
  FROM nodes LEFT JOIN (
    SELECT p.dst AS node, sum(p.p * r.r) AS contrib
    FROM p JOIN r{k-1} r ON p.src = r.node GROUP BY 1
  ) c ON nodes.node = c.node
)""")
    tail = f"""
SELECT nodes.node AS n_nationkey, nodes.n_name,
       {sql_rnd('r.r', 6)} AS pagerank
FROM nodes JOIN r{iters} r ON nodes.node = r.node
"""
    return head + "".join(steps) + tail


@register("graph_pagerank", _pagerank_oracle(_ITERS))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 5-iteration PageRank (damping 0.85, dangling-mass
    redistribution) over the customer-nation → supplier-nation trade
    graph. Oracle: the identical recurrence unrolled into SQL CTEs."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    e = (o.join(c, o.o_custkey == c.c_custkey)
         .join(li, li.l_orderkey == o.o_orderkey)
         .join(s, li.l_suppkey == s.s_suppkey)
         .groupBy(F.col("c_nationkey").alias("src"),
                  F.col("s_nationkey").alias("dst"))
         .agg(F.count("*").cast("double").alias("w")))
    ow = e.groupBy("src").agg(F.sum("w").alias("ow"))
    p = (e.join(ow, "src")
         .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
         .localCheckpoint(eager=True))  # edge extraction runs ONCE

    nodes = n.select(F.col("n_nationkey").alias("node"), "n_name")
    n_nodes = nodes.count()  # dim-sized scalar (25), not a fact collect
    src_nodes = p.select("src").distinct()

    r = nodes.select("node", F.lit(1.0 / n_nodes).alias("r"))
    for _ in range(_ITERS):
        contrib = (p.join(r, p.src == r.node)
                   .groupBy("dst")
                   .agg(F.sum(F.col("p") * F.col("r")).alias("contrib")))
        dangling = (r.join(src_nodes, r.node == src_nodes.src, "left_anti")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("d")))
        r = (nodes.join(contrib, nodes.node == contrib.dst, "left")
             .crossJoin(F.broadcast(dangling))
             .select(
                 "node",
                 (F.lit(0.15 / n_nodes)
                  + F.lit(_DAMP) * (F.coalesce(F.col("contrib"), F.lit(0.0))
                                    + F.col("d") / n_nodes)).alias("r")))
    return (nodes.join(r, "node")
            .select(F.col("node").alias("n_nationkey"), "n_name",
                    rnd(F.col("r"), 6).alias("pagerank")))
