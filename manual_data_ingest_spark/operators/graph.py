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

from pyspark.sql import DataFrame, SparkSession, Window
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
    if n_nodes == 0:
        # empty graph: empty ranking, not a 1/0 (empty-input sweep)
        return (nodes.select(F.col("node").alias("n_nationkey"), "n_name",
                             F.lit(0.0).alias("pagerank")))
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


def _mutual_topk_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual top-8 strongest-tie co-supplier edge set (u < v_),
    localCheckpointed: the fact-sized co-occurrence extraction runs
    once and every consumer re-reads ≤ 8·|V| rows. Shared by
    `graph_triangle_count` and `graph_link_prediction`."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select(F.col("l_orderkey").alias("ok"),
                    F.col("l_suppkey").alias("sk")).distinct()
    a, b = os_.alias("a"), os_.alias("b")
    pair = (a.join(b, (F.col("a.ok") == F.col("b.ok"))
                   & (F.col("a.sk") < F.col("b.sk")))
            .groupBy(F.col("a.sk").alias("u"), F.col("b.sk").alias("v_"))
            .agg(F.count("*").alias("co")))
    sym = (pair.select(F.col("u").alias("node"), F.col("v_").alias("nbr"), "co")
           .unionAll(pair.select(F.col("v_").alias("node"),
                                 F.col("u").alias("nbr"), "co")))
    wnd = Window.partitionBy("node").orderBy(F.col("co").desc(), F.col("nbr"))
    topk = (sym.withColumn("rn", F.row_number().over(wnd))
            .filter(F.col("rn") <= 8).select("node", "nbr"))
    ta, tb = topk.alias("ta"), topk.alias("tb")
    return (ta.join(tb, (F.col("ta.node") == F.col("tb.nbr"))
                    & (F.col("ta.nbr") == F.col("tb.node")))
            .filter(F.col("ta.node") < F.col("ta.nbr"))
            .select(F.col("ta.node").alias("u"), F.col("ta.nbr").alias("v_"))
            .localCheckpoint(eager=True))


@register("graph_triangle_count", """
WITH os AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
), pair AS (
  SELECT a.sk AS u, b.sk AS v_, count(*) AS co
  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
  GROUP BY a.sk, b.sk
), sym AS (
  SELECT u AS node, v_ AS nbr, co FROM pair
  UNION ALL
  SELECT v_ AS node, u AS nbr, co FROM pair
), topk AS (
  SELECT node, nbr FROM sym
  QUALIFY row_number() OVER (PARTITION BY node
                             ORDER BY co DESC, nbr) <= 8
), e AS (
  SELECT a.node AS u, a.nbr AS v_
  FROM topk a JOIN topk b ON a.node = b.nbr AND a.nbr = b.node
  WHERE a.node < a.nbr
), deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v_ AS node FROM e
  ) GROUP BY node
), oe AS (
  SELECT CASE WHEN du.deg * 100000000 + e.u <= dv.deg * 100000000 + e.v_
              THEN e.u ELSE e.v_ END AS src,
         CASE WHEN du.deg * 100000000 + e.u <= dv.deg * 100000000 + e.v_
              THEN e.v_ ELSE e.u END AS dst,
         CASE WHEN du.deg * 100000000 + e.u <= dv.deg * 100000000 + e.v_
              THEN dv.deg * 100000000 + e.v_
              ELSE du.deg * 100000000 + e.u END AS dst_ord
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v_
), wedge AS (
  SELECT w1.dst AS b, w2.dst AS c
  FROM oe w1 JOIN oe w2
    ON w1.src = w2.src AND w1.dst_ord < w2.dst_ord
), tri AS (
  SELECT count(*) AS n_triangles
  FROM wedge SEMI JOIN oe ON wedge.b = oe.src AND wedge.c = oe.dst
), stats AS (
  SELECT (SELECT count(*) FROM deg)               AS n_nodes,
         (SELECT count(*) FROM e)                 AS n_edges,
         (SELECT count(*) FROM wedge)             AS n_wedges,
         (SELECT n_triangles FROM tri)            AS n_triangles
)
SELECT n_nodes, n_edges, n_triangles,
       floor(CASE WHEN n_wedges > 0
                  THEN CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
                  ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0
           AS closure_rate
FROM stats
""")
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the MUTUAL top-8 strongest-tie co-supplier
    graph, with degree-ordered wedge enumeration.

    Two bounding layers make this linear at any scale — raw
    co-occurrence graphs saturate toward complete (measured: the
    sf0.1 co-supply graph has 343k of 500k possible edges, and the
    naive wedge set explodes to ~10⁸ rows):

    1. **Mutual-kNN sparsification**: each node keeps its 8 strongest
       neighbors by (co-occurrence count DESC, id); an edge survives
       only if BOTH endpoints keep it. Degree ≤ 8 by construction, so
       wedges ≤ 28·|V| — linear in nodes regardless of raw density.
       Ranking is on exact integer counts with an id tie-break:
       deterministic on both engines.
    2. **Degree orientation**: surviving edges are oriented low→high
       under (degree, id) (encoded as one integer), so each triangle
       is counted exactly once and every wedge pivots at its
       lowest-degree vertex — on power-law graphs this is what kills
       the hub O(d²) blowup; the count is then wedge ⋉ oriented-edge,
       an equi semi-join with no cartesian anywhere.

    100 TB: the one fact-sized stage is the co-occurrence aggregate
    (pairs-per-container bounded by order size; the dedup posting-cap
    applies to unbounded containers). Everything after the top-8 prune
    is ≤ 8·|V| rows; the fact-derived edge list is localCheckpointed
    so the four stat branches never re-run the extraction.
    """
    e = _mutual_topk_edges(spark, sf_dir)
    deg = (e.select(F.col("u").alias("node"))
           .unionAll(e.select(F.col("v_").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))

    du, dv = deg.alias("du"), deg.alias("dv")
    ord_u = F.col("du.deg") * 100000000 + F.col("u")
    ord_v = F.col("dv.deg") * 100000000 + F.col("v_")
    oe = (e.join(du, F.col("du.node") == F.col("u"))
          .join(dv, F.col("dv.node") == F.col("v_"))
          .select(F.when(ord_u <= ord_v, F.col("u")).otherwise(F.col("v_"))
                  .alias("src"),
                  F.when(ord_u <= ord_v, F.col("v_")).otherwise(F.col("u"))
                  .alias("dst"),
                  F.when(ord_u <= ord_v, ord_v).otherwise(ord_u)
                  .alias("dst_ord"))
          .localCheckpoint(eager=True))
    w1, w2 = oe.alias("w1"), oe.alias("w2")
    wedge = (w1.join(w2, (F.col("w1.src") == F.col("w2.src"))
                     & (F.col("w1.dst_ord") < F.col("w2.dst_ord")))
             .select(F.col("w1.dst").alias("b"), F.col("w2.dst").alias("c")))
    tri = wedge.join(oe, (F.col("b") == F.col("src"))
                     & (F.col("c") == F.col("dst")), "left_semi")

    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    n_wedges = wedge.agg(F.count("*").alias("n_wedges"))
    n_tri = tri.agg(F.count("*").alias("n_triangles"))
    return (n_nodes.crossJoin(n_edges).crossJoin(n_tri).crossJoin(n_wedges)
            .select("n_nodes", "n_edges", "n_triangles",
                    rnd(F.when(F.col("n_wedges") > 0,
                               F.col("n_triangles").cast("double")
                               / F.col("n_wedges").cast("double"))
                        .otherwise(0.0), 6).alias("closure_rate")))


@register("graph_link_prediction", """
WITH os AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
), pair AS (
  SELECT a.sk AS u, b.sk AS v_, count(*) AS co
  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
  GROUP BY a.sk, b.sk
), sym AS (
  SELECT u AS node, v_ AS nbr, co FROM pair
  UNION ALL
  SELECT v_ AS node, u AS nbr, co FROM pair
), topk AS (
  SELECT node, nbr FROM sym
  QUALIFY row_number() OVER (PARTITION BY node
                             ORDER BY co DESC, nbr) <= 8
), e AS (
  SELECT a.node AS u, a.nbr AS v_
  FROM topk a JOIN topk b ON a.node = b.nbr AND a.nbr = b.node
  WHERE a.node < a.nbr
), adj AS (
  SELECT u AS node, v_ AS nbr FROM e
  UNION ALL
  SELECT v_ AS node, u AS nbr FROM e
), deg AS (
  SELECT node, count(*) AS deg FROM adj GROUP BY node
), cand AS (
  SELECT a.node AS u, b.node AS v_, count(*) AS cn
  FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
  GROUP BY a.node, b.node
), novel AS (
  SELECT c.u, c.v_, c.cn FROM cand c
  ANTI JOIN e ON e.u = c.u AND e.v_ = c.v_
)
SELECT u, v_ AS v, CAST(cn AS BIGINT) AS common_neighbors,
       floor(CAST(cn AS DOUBLE)
             / CAST(du.deg + dv.deg - cn AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM novel
JOIN deg du ON du.node = u
JOIN deg dv ON dv.node = v_
ORDER BY CAST(cn AS DOUBLE) / CAST(du.deg + dv.deg - cn AS DOUBLE) DESC,
         u, v_
LIMIT 20
""")
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the mutual top-8 co-supplier graph: for every
    NON-adjacent node pair sharing ≥1 neighbor, score the missing edge
    by neighborhood Jaccard |Γu∩Γv| / |Γu∪Γv|; emit the top-20 — the
    "suppliers that should be trading partners" recommender.

    Everything downstream of the shared (checkpointed) mutual-kNN edge
    extraction is degree-bounded: candidate generation is the wedge
    join (≤ 28·|V| pairs), the existing-edge exclusion is an anti
    join, and the score is exact-integer arithmetic (cn, degrees) with
    one rounded division — rank on the raw ratio with (u,v) tie-break,
    identical on both engines. Adamic-Adar would need log(); Jaccard
    deliberately stays in exact-int territory (PARITY discipline).
    """
    e = _mutual_topk_edges(spark, sf_dir)
    adj = (e.select(F.col("u").alias("node"), F.col("v_").alias("nbr"))
           .unionAll(e.select(F.col("v_").alias("node"),
                              F.col("u").alias("nbr"))))
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    a, b = adj.alias("a"), adj.alias("b")
    cand = (a.join(b, (F.col("a.nbr") == F.col("b.nbr"))
                   & (F.col("a.node") < F.col("b.node")))
            .groupBy(F.col("a.node").alias("u"), F.col("b.node").alias("v_"))
            .agg(F.count("*").alias("cn")))
    novel = cand.join(e, ["u", "v_"], "left_anti")
    du, dv = deg.alias("du"), deg.alias("dv")
    raw = (F.col("cn").cast("double")
           / (F.col("du.deg") + F.col("dv.deg") - F.col("cn")).cast("double"))
    return (novel.join(du, F.col("du.node") == F.col("u"))
            .join(dv, F.col("dv.node") == F.col("v_"))
            .select("u", F.col("v_").alias("v"),
                    F.col("cn").alias("common_neighbors"),
                    rnd(raw, 6).alias("jaccard"),
                    raw.alias("_raw"))
            .orderBy(F.col("_raw").desc(), F.col("u"), F.col("v"))
            .limit(20)
            .select("u", "v", "common_neighbors", "jaccard"))


_CC_ITERS = 8

_CC_EDGE_CTE = """
WITH os AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
), pair AS (
  SELECT a.sk AS u, b.sk AS v_, count(*) AS co
  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
  GROUP BY a.sk, b.sk
), sym AS (
  SELECT u AS node, v_ AS nbr, co FROM pair
  UNION ALL
  SELECT v_ AS node, u AS nbr, co FROM pair
), topk AS (
  SELECT node, nbr FROM sym
  QUALIFY row_number() OVER (PARTITION BY node
                             ORDER BY co DESC, nbr) <= 8
), e AS (
  SELECT a.node AS u, a.nbr AS v_
  FROM topk a JOIN topk b ON a.node = b.nbr AND a.nbr = b.node
  WHERE a.node < a.nbr
), adj AS MATERIALIZED (
  SELECT u AS node, v_ AS nbr FROM e
  UNION ALL
  SELECT v_ AS node, u AS nbr FROM e
)"""


def _cc_oracle(iters: int) -> str:
    """Unrolled fixed-iteration min-label propagation as portable SQL.

    Every CTE level is AS MATERIALIZED: the optimizer's default CTE
    INLINING duplicates l{k-1} at each of its two references, which
    compounds to 2^iters copies of the whole edge-extraction pipeline —
    the unrolled query went from minutes (killed) to milliseconds with
    materialization. The Spark twin needs the identical move
    (per-round localCheckpoint) for the identical reason.
    """
    steps = [", l0 AS MATERIALIZED "
             "(SELECT DISTINCT node, node AS comp FROM adj)"]
    for k in range(1, iters + 1):
        steps.append(f""", l{k} AS MATERIALIZED (
  SELECT l.node,
         least(l.comp, coalesce(min(nb.comp), l.comp)) AS comp
  FROM l{k-1} l
  LEFT JOIN adj ON adj.node = l.node
  LEFT JOIN l{k-1} nb ON nb.node = adj.nbr
  GROUP BY l.node, l.comp
)""")
    tail = f"""
SELECT comp AS component, count(*) AS n_nodes,
       min(node) AS min_node, max(node) AS max_node
FROM l{iters}
GROUP BY comp
"""
    return _CC_EDGE_CTE + "".join(steps) + tail


@register("graph_connected_components", _cc_oracle(_CC_ITERS))
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the mutual top-8 co-supplier graph by
    FIXED-iteration min-label propagation (8 rounds): every node adopts
    the smallest node id within 8 hops; component rows report size and
    id range.

    Fixed iteration count (not run-to-convergence) is the contract:
    both engines execute the identical recurrence, so the result is
    hash-exact even on a graph whose diameter exceeds the budget — the
    same determinism move as `graph_pagerank`. Each round is one
    (node)-keyed shuffle over |adj| rows, degree-bounded (≤ 8·|V|) by
    the mutual-kNN extraction, which runs ONCE (localCheckpoint shared
    with the other graph ops). Production CC at 100 TB swaps the
    recurrence for large-star/small-star (Kiveris et al.), which
    converges in O(log n) rounds of the same shuffle shape;
    `dedup_clusters` runs the same loop with a convergence counter.
    """
    e = _mutual_topk_edges(spark, sf_dir)
    adj = (e.select(F.col("u").alias("node"), F.col("v_").alias("nbr"))
           .unionAll(e.select(F.col("v_").alias("node"),
                              F.col("u").alias("nbr"))))
    adj = adj.localCheckpoint(eager=True)  # 8 consumers of a tiny edge list
    labels = adj.select("node").distinct().withColumn("comp", F.col("node"))
    for i in range(_CC_ITERS):
        nbr_min = (adj.join(labels.withColumnRenamed("node", "nbr"), "nbr")
                   .groupBy("node").agg(F.min("comp").alias("nbr_comp")))
        labels = (labels.join(nbr_min, "node", "left")
                  .select("node",
                          F.least(F.col("comp"),
                                  F.coalesce(F.col("nbr_comp"), F.col("comp")))
                          .alias("comp")))
        # truncate lineage every SECOND round: labels feeds two plans
        # per iteration, so unchecked the logical plan (and Catalyst's
        # analyze cost) doubles per round — 2^8 subtrees by round 8,
        # measured MINUTES of pure plan-build. Checkpoint cadence is a
        # measured trade (sf0.1, median of 3): every round 3.65 s,
        # every 2nd 2.25 s, every 4th 3.12 s — eager materialization
        # costs a job, plan growth costs analysis; 2 balances them.
        # The node-set is |V|-sized; truncating its lineage is the
        # Pregel-loop discipline (same move as dedup_clusters).
        if i % 2 == 1:
            labels = labels.localCheckpoint(eager=True)
    return (labels.groupBy(F.col("comp").alias("component"))
            .agg(F.count("*").alias("n_nodes"),
                 F.min("node").alias("min_node"),
                 F.max("node").alias("max_node")))


@register("graph_bfs_levels", """
WITH RECURSIVE pe AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p
  FROM lineitem WHERE l_quantity <= 2
), ss AS (
  SELECT DISTINCT a.s AS src, b.s AS dst FROM pe a JOIN pe b ON a.p = b.p
), bfs AS (
  SELECT 1::BIGINT AS node, 0 AS lvl
  UNION
  SELECT ss.dst, bfs.lvl + 1
  FROM bfs JOIN ss ON ss.src = bfs.node
  WHERE bfs.lvl < 4
)
SELECT node AS supp_key, min(lvl) AS lvl FROM bfs GROUP BY node
""")
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-hop BFS from supplier 1 over the co-supply graph (suppliers
    joined when a shared part links them in small-quantity lineitems):
    per reachable supplier, its hop distance — the supply-chain blast-
    radius query ("how far does a recall propagate").

    Frontier BFS, the scale-correct shape: the supplier-supplier edge
    list is built ONCE (self-join of the distinct supplier-part pairs
    on the part key — one shuffle), then each of the 4 fixed rounds
    joins only the FRONTIER (nodes first reached last round) against
    the edges and anti-joins the visited set, so per-round work decays
    as the frontier saturates instead of re-expanding every path the
    way the oracle's recursive UNION does. 4 rounds keeps the unrolled
    lineage trivially small (the graph_pagerank note); deeper searches
    would localCheckpoint on the dedup_clusters cadence.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pe = (li.filter(F.col("l_quantity") <= 2)
          .select(F.col("l_suppkey").alias("s"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    ss = (pe.alias("a").join(pe.alias("b"), "p")
          .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
          .distinct())
    frontier = spark.range(1, 2).select(F.col("id").alias("node"))
    visited = frontier.withColumn("lvl", F.lit(0))
    for k in range(1, 5):
        nxt = (frontier.join(ss, frontier.node == ss.src)
               .select(F.col("dst").alias("node")).distinct()
               .join(visited, "node", "left_anti")
               .withColumn("lvl", F.lit(k)))
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.select(F.col("node").alias("supp_key"), "lvl")


@register("graph_degree_distribution", """
WITH pe AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p
  FROM lineitem WHERE l_quantity <= 2
), deg AS (
  SELECT a.s AS node, count(DISTINCT b.s) AS degree
  FROM pe a JOIN pe b ON a.p = b.p AND b.s <> a.s
  GROUP BY a.s
)
SELECT degree, count(*) AS n_nodes,
       min(node) AS min_node, max(node) AS max_node
FROM deg GROUP BY degree
""")
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree frequency table of the co-supplier graph (same edge rule
    as `graph_bfs_levels`): how many suppliers have k distinct
    co-suppliers — the first diagnostic run on ANY derived graph,
    because every downstream choice (wedge bounds for triangles,
    bucket widths for LSH, skew salting for joins) is a read off this
    table's tail.

    The degree computation is the part-keyed self-join aggregated by
    node — hot parts (high-degree hubs) are exactly the AQE skew-split
    case; the distribution itself is a bounded second agg (distinct
    degrees ≪ nodes). No full edge materialization is kept: the
    count(DISTINCT) collapses parallel edges in the same pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pe = (li.filter(F.col("l_quantity") <= 2)
          .select(F.col("l_suppkey").alias("s"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    a = pe.alias("a")
    b = pe.alias("b")
    deg = (a.join(b, (F.col("a.p") == F.col("b.p"))
                  & (F.col("b.s") != F.col("a.s")))
           .groupBy(F.col("a.s").alias("node"))
           .agg(F.countDistinct(F.col("b.s")).alias("degree")))
    return (deg.groupBy("degree")
            .agg(F.count("*").alias("n_nodes"),
                 F.min("node").alias("min_node"),
                 F.max("node").alias("max_node")))


_LPA_ITERS = 3

_LPA_EDGE_SQL = """
e0 AS (
  SELECT c_nationkey AS src, s_nationkey AS dst, count(*)::BIGINT AS w
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
  GROUP BY 1, 2
), sym AS (
  SELECT src AS node, dst AS nbr, w FROM e0
  UNION ALL
  SELECT dst AS node, src AS nbr, w FROM e0
)"""


def _lpa_oracle(iters: int) -> str:
    head = f"WITH {_LPA_EDGE_SQL}, l0 AS (\n" \
           "  SELECT n_nationkey AS node, n_nationkey AS lbl FROM nation\n)"
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""", l{k} AS (
  SELECT node, lbl FROM (
    SELECT s.node, l.lbl,
           row_number() OVER (PARTITION BY s.node
                              ORDER BY sum(s.w) DESC, l.lbl) AS rn
    FROM sym s JOIN l{k-1} l ON s.nbr = l.node
    GROUP BY s.node, l.lbl
  ) WHERE rn = 1
)""")
    tail = f"""
SELECT n_nationkey, n_name, coalesce(l.lbl, n_nationkey) AS community
FROM nation LEFT JOIN l{iters} l ON n_nationkey = l.node
"""
    return head + "".join(steps) + tail


@register("graph_label_propagation", _lpa_oracle(_LPA_ITERS))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous weighted label propagation
    over the undirected nation trade graph (3 fixed rounds;
    each node adopts the label carrying the greatest total edge weight
    among its neighbors, ties broken toward the smaller label;
    isolated nodes keep their own label). Complements
    `graph_connected_components` (pure reachability) with
    strength-of-ties communities, and `graph_pagerank` (importance)
    with membership.

    Scale shape follows the module discipline: the fact-sized edge
    extraction (4-way join + aggregate) runs ONCE and is
    localCheckpointed; each propagation round is then a |E|-row join
    + hash aggregate + per-node argmax over dim-sized data, and the
    fixed small round count keeps the unrolled plan shallow.
    Determinism: weights are exact int64 counts, so the argmax with
    min-label tie-break is integer arithmetic end-to-end — the oracle
    unrolls the identical recurrence into CTEs.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    e0 = (o.join(c, o.o_custkey == c.c_custkey)
          .join(li, li.l_orderkey == o.o_orderkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .filter(F.col("c_nationkey") != F.col("s_nationkey"))
          .groupBy(F.col("c_nationkey").alias("src"),
                   F.col("s_nationkey").alias("dst"))
          .agg(F.count("*").alias("w")))
    sym = (e0.select(F.col("src").alias("node"), F.col("dst").alias("nbr"),
                     "w")
           .unionAll(e0.select(F.col("dst").alias("node"),
                               F.col("src").alias("nbr"), "w"))
           .localCheckpoint(eager=True))  # edge extraction runs ONCE

    # labels carries (lnode, lbl) so the per-round self-derived frame
    # never collides with sym's `node` column in the join
    labels = n.select(F.col("n_nationkey").alias("lnode"),
                      F.col("n_nationkey").alias("lbl"))
    for _ in range(_LPA_ITERS):
        votes = (sym.join(labels, sym.nbr == labels.lnode)
                 .groupBy("node", "lbl")
                 .agg(F.sum("w").alias("wsum")))
        labels = (votes.withColumn("rn", F.row_number().over(
            Window.partitionBy("node")
            .orderBy(F.col("wsum").desc(), F.col("lbl"))))
            .filter(F.col("rn") == 1)
            .select(F.col("node").alias("lnode"), "lbl"))
    return (n.join(labels, n.n_nationkey == labels.lnode, "left")
            .select("n_nationkey", "n_name",
                    F.coalesce("lbl", "n_nationkey").alias("community")))


_KCORE_K = 3
_KCORE_ITERS = 8


def _kcore_oracle(k: int, iters: int) -> str:
    """Unrolled fixed-iteration k-core peeling as portable SQL (the
    `_cc_oracle` MATERIALIZED discipline — CTE inlining would
    otherwise duplicate the edge pipeline 2^iters times)."""
    steps = [", s0 AS MATERIALIZED (SELECT DISTINCT node FROM adj)"]
    for i in range(1, iters + 1):
        steps.append(f""", s{i} AS MATERIALIZED (
  SELECT a.node FROM adj a
  JOIN s{i-1} u ON a.node = u.node
  JOIN s{i-1} v ON a.nbr = v.node
  GROUP BY a.node HAVING count(*) >= {k}
)""")
    tail = f"""
SELECT a.node, count(*)::BIGINT AS core_deg
FROM adj a
JOIN s{iters} u ON a.node = u.node
JOIN s{iters} v ON a.nbr = v.node
GROUP BY a.node
"""
    return _CC_EDGE_CTE + "".join(steps) + tail


@register("graph_kcore", _kcore_oracle(_KCORE_K, _KCORE_ITERS))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the mutual top-8 co-supplier graph by FIXED-iteration
    peeling (8 rounds): repeatedly drop nodes with fewer than 3
    surviving neighbors; emit each surviving node with its degree
    inside the core. The k-core is the standard dense-substructure
    extraction (community seeds, spam/bot rings, the coreness
    hierarchy) that `graph_connected_components` (pure reachability)
    and `graph_triangle_count` (local density) don't give.

    Fixed iteration count is the determinism contract shared by all
    the iterative graph ops — both engines run the identical
    recurrence, so the result is hash-exact regardless of whether the
    peel has converged; tests/test_new_ops.py additionally pins that
    8 rounds REACH the fixpoint on every fixture scale (peeling
    removes ≥1 node per non-converged round, and the fixture graphs
    are hundreds of nodes with shallow peel depth).

    Scale: the fact-sized edge extraction runs ONCE (shared
    localCheckpointed `_mutual_topk_edges`); each round is one
    degree-count groupBy + two semi-joins over ≤ 8·|V| edge rows —
    the Pregel loop shape, linear in |E| per round. Lineage
    truncated every 2nd round (the `graph_connected_components`
    measured cadence).
    """
    e = _mutual_topk_edges(spark, sf_dir)
    adj = (e.select(F.col("u").alias("node"), F.col("v_").alias("nbr"))
           .unionAll(e.select(F.col("v_").alias("node"),
                              F.col("u").alias("nbr"))))
    adj = adj.localCheckpoint(eager=True)
    surv = adj.select("node").distinct()
    for i in range(_KCORE_ITERS):
        surv = (adj.join(surv.withColumnRenamed("node", "n1"),
                         adj.node == F.col("n1"))
                .join(surv.withColumnRenamed("node", "n2"),
                      F.col("nbr") == F.col("n2"))
                .groupBy("node").agg(F.count("*").alias("deg"))
                .filter(F.col("deg") >= _KCORE_K)
                .select("node"))
        if i % 2 == 1:
            surv = surv.localCheckpoint(eager=True)
    return (adj.join(surv.withColumnRenamed("node", "n1"),
                     adj.node == F.col("n1"))
            .join(surv.withColumnRenamed("node", "n2"),
                  F.col("nbr") == F.col("n2"))
            .groupBy("node").agg(F.count("*").alias("core_deg")))


def _hits_oracle(iters: int) -> str:
    """Unrolled fixed-iteration weighted HITS as portable SQL (L1
    normalization each half-step; guards mirror the Spark side).
    Every per-iteration CTE is MATERIALIZED: DuckDB inlines plain CTEs,
    and the alternating recurrence references each level ~3x, so the
    unmaterialized form explodes 3^10 file opens (hit: "Too many open
    files" on the fact scan)."""
    head = """
WITH e AS MATERIALIZED (
  SELECT c_nationkey AS src, s_nationkey AS dst, count(*)::DOUBLE AS w
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), nodes AS (
  SELECT n_nationkey AS node, n_name FROM nation
), nn AS (SELECT count(*) AS n FROM nodes
), h0 AS (
  SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS h FROM nodes
)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""", ar{k} AS MATERIALIZED (
  SELECT nodes.node, coalesce(s.v, 0.0::DOUBLE) AS v
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, sum(e.w * h.h) AS v
    FROM e JOIN h{k-1} h ON e.src = h.node GROUP BY 1
  ) s ON nodes.node = s.node
), a{k} AS MATERIALIZED (
  SELECT node, CASE WHEN (SELECT sum(v) FROM ar{k}) > 0
                    THEN v / (SELECT sum(v) FROM ar{k})
                    ELSE 0.0::DOUBLE END AS a
  FROM ar{k}
), hr{k} AS MATERIALIZED (
  SELECT nodes.node, coalesce(s.v, 0.0::DOUBLE) AS v
  FROM nodes LEFT JOIN (
    SELECT e.src AS node, sum(e.w * a.a) AS v
    FROM e JOIN a{k} a ON e.dst = a.node GROUP BY 1
  ) s ON nodes.node = s.node
), h{k} AS MATERIALIZED (
  SELECT node, CASE WHEN (SELECT sum(v) FROM hr{k}) > 0
                    THEN v / (SELECT sum(v) FROM hr{k})
                    ELSE 0.0::DOUBLE END AS h
  FROM hr{k}
)""")
    tail = f"""
SELECT nodes.node AS n_nationkey, nodes.n_name,
       {sql_rnd('a.a', 6)} AS authority,
       {sql_rnd('h.h', 6)} AS hub
FROM nodes
JOIN a{iters} a ON nodes.node = a.node
JOIN h{iters} h ON nodes.node = h.node
"""
    return head + "".join(steps) + tail


@register("graph_hits", _hits_oracle(_ITERS))
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted HITS (hubs & authorities, Kleinberg) — the second
    classic eigenvector ranking beside `graph_pagerank`, and the one
    that fits an asymmetric trade graph natively: a nation is a good
    HUB where its customers buy from authoritative supplier nations,
    and a good AUTHORITY where authoritative hubs buy from it. Fixed
    5 iterations of the alternating recurrence a←Wᵀh, h←Wa with L1
    normalization each half-step (init h = 1/n).

    Scale shape — the `graph_pagerank` discipline verbatim: edge
    extraction (the expensive fact join) runs ONCE and is
    localCheckpointed; each iteration joins the checkpointed edge
    list against a |V|-row score table, so loop cost is dim-sized.
    Degenerate guards: empty node set returns empty (not 1/0);
    zero-mass half-steps (all edges NULLed away) normalize to 0.0
    instead of ANSI 0/0 — mirrored as CASE in the oracle.
    """
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
         .agg(F.count("*").cast("double").alias("w"))
         .localCheckpoint(eager=True))

    nodes = n.select(F.col("n_nationkey").alias("node"), "n_name")
    n_nodes = nodes.count()  # dim-sized scalar (25), not a fact collect
    if n_nodes == 0:
        return nodes.select(F.col("node").alias("n_nationkey"), "n_name",
                            F.lit(0.0).alias("authority"),
                            F.lit(0.0).alias("hub"))

    def half_step(scores: DataFrame, score_col: str, join_on: str,
                  group_as: str) -> DataFrame:
        """One HITS half-step: propagate `scores` across edges joined
        on `join_on` (src for a←Wᵀh, dst for h←Wa), regroup on the
        other endpoint, L1-normalize with the zero-mass guard."""
        raw = (nodes.join(
            e.join(scores, F.col(join_on) == F.col("node"))
            .groupBy(F.col(group_as).alias("gnode"))
            .agg(F.sum(F.col("w") * F.col(score_col)).alias("v")),
            nodes.node == F.col("gnode"), "left")
            .select("node", F.coalesce("v", F.lit(0.0)).alias("v")))
        total = raw.agg(F.sum("v").alias("t"))
        return (raw.crossJoin(F.broadcast(total))
                .select("node",
                        F.when(F.col("t") > 0, F.col("v") / F.col("t"))
                        .otherwise(F.lit(0.0)).alias(score_col)))

    # localCheckpoint each |V|-row half-step: the alternating recurrence
    # nests two aggregations + a crossJoin per half-step, so an unrolled
    # 10-deep lineage blows up Catalyst analysis (measured: the plain
    # chain did not return at sf0.01) — exactly the deep-iteration case
    # the pagerank docstring reserves checkpointing for
    h = nodes.select("node", F.lit(1.0 / n_nodes).alias("h"))
    for _ in range(_ITERS):
        a = (half_step(h.withColumnRenamed("h", "sc"), "sc", "src", "dst")
             .withColumnRenamed("sc", "a").localCheckpoint(eager=True))
        h = (half_step(a.withColumnRenamed("a", "sc"), "sc", "dst", "src")
             .withColumnRenamed("sc", "h").localCheckpoint(eager=True))
    return (nodes.join(a, "node").join(h, "node")
            .select(F.col("node").alias("n_nationkey"), "n_name",
                    rnd(F.col("a"), 6).alias("authority"),
                    rnd(F.col("h"), 6).alias("hub")))


_SSSP_ITERS = 24  # |V|-1: the Bellman-Ford guarantee for 25 nations —
# at sf0.001 a cheapest path was measured needing >6 hops (sparse
# latencies make multi-hop routes cheaper), so diameter heuristics are
# unsafe; convergence at the cap is pinned in tests/test_unit_operators.py


def _sssp_oracle(iters: int) -> str:
    """Unrolled Bellman-Ford as portable SQL. Every per-iteration CTE is
    MATERIALIZED — DuckDB otherwise inlines d{k-1} at each of its two
    references and the plan compounds 2^iters copies of the edge
    extraction (the graph_connected_components lesson, PARITY #29)."""
    head = """
WITH e AS (
  SELECT c_nationkey AS src, s_nationkey AS dst,
         greatest(sum(date_diff('day', o_orderdate::DATE, l_shipdate::DATE))
                  // count(*) + 1, 1)::BIGINT AS cost
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
  GROUP BY 1, 2
), d0 AS (SELECT 0::BIGINT AS node, 0::BIGINT AS d)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""", d{k} AS MATERIALIZED (
  SELECT node, min(d) AS d FROM (
    SELECT node, d FROM d{k-1}
    UNION ALL
    SELECT e.dst AS node, p.d + e.cost AS d
    FROM e JOIN d{k-1} p ON e.src = p.node
  ) u GROUP BY 1
)""")
    tail = f"""
SELECT n_nationkey, n_name, d.d AS dist
FROM nation LEFT JOIN d{iters} d ON n_nationkey = d.node
"""
    return head + "".join(steps) + tail


@register("graph_sssp_weighted", _sssp_oracle(_SSSP_ITERS))
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford) over the
    nation trade graph — the routing/reachability member of the graph
    family beside PageRank (influence), components (connectivity) and
    BFS (hop counts): edge cost = integer mean order→ship latency in
    days between customer and supplier nations, CLAMPED to >= 1 day —
    the synthetic fixture contains ship-before-order rows, and a
    negative mean latency would put a NEGATIVE CYCLE in the graph
    (Bellman-Ford diverges; measured: 24 rounds not converged before
    the clamp) — exactly the guard a production latency graph needs
    against data errors. Source = nation 0, 24 relaxation rounds (|V|−1 —
    the Bellman-Ford guarantee; a one-extra-round fixed-point pin
    lives in tests/test_unit_operators.py).

    ZERO float arithmetic anywhere: costs are exact integer division
    of day sums (both engines `DIV`/`//`), distances are BIGINT min()
    folds — the one graph op whose output needs no rounding guard at
    all; unreachable nations emit NULL via the LEFT join.

    Scale shape (the module contract): the expensive edge extraction
    is ONE fact join+aggregate pass, checkpointed; each relaxation
    touches only (node, dist) pairs — |V|-sized, dim-bounded — and
    checkpoints per round to keep the unrolled lineage out of
    Catalyst's analyzer (the `graph_hits` stall lesson). The oracle
    MATERIALIZEs each round (PARITY #29).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    edges = (o.filter(F.col("o_orderdate").isNotNull())
             .join(c, F.col("o_custkey") == F.col("c_custkey"))
             .join(li.filter(F.col("l_shipdate").isNotNull()),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
             .groupBy(F.col("c_nationkey").alias("src"),
                      F.col("s_nationkey").alias("dst"))
             .agg(F.expr("greatest(sum(datediff(cast(l_shipdate as date),"
                         " cast(o_orderdate as date)))"
                         " div count(*) + 1, 1)").cast("long").alias("cost"))
             .localCheckpoint(eager=True))
    dist = (spark.range(1).select(F.lit(0).cast("long").alias("node"),
                                  F.lit(0).cast("long").alias("d")))
    prev_rows = None
    for k in range(_SSSP_ITERS):
        relax = (edges.join(dist, edges.src == dist.node)
                 .select(F.col("dst").alias("node"),
                         (F.col("d") + F.col("cost")).alias("d")))
        dist = (dist.unionByName(relax)
                .groupBy("node").agg(F.min("d").alias("d")))
        # cadence-3 checkpoints: per-round eager checkpoints cost one
        # scheduler job each (24 jobs ~= 5 s of pure floor at 1x; A/B in
        # BASELINE.md r6) while Catalyst analyzes a 3-deep union chain
        # without stalling — the graph_connected_components cadence rule
        if k % 3 == 2 or k == _SSSP_ITERS - 1:
            dist = dist.localCheckpoint(eager=True)
            # fixed-point early exit at the same cadence: Bellman-Ford
            # is monotone, so an unchanged |V|-row state (one tiny
            # sorted-collect on dim-sized data) means every remaining
            # round is a no-op — identical result BY DEFINITION, and
            # the loop cost drops from |V|-1 rounds to the graph's
            # actual distance-diameter (A/B in BASELINE.md r6)
            rows = set(map(tuple, dist.collect()))  # nodes unique; a
            if rows == prev_rows:                    # set compare needs
                break                                # no None-safe sort
            prev_rows = rows
    return (n.join(dist, n.n_nationkey == dist.node, "left")
            .select("n_nationkey", "n_name", F.col("d").alias("dist")))


@register("graph_reach_recursive", """
WITH RECURSIVE e AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS cnt
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
), top3 AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY cnt DESC, dst) AS rk
    FROM e
  ) WHERE rk <= 3
), walk AS (
  SELECT 0 AS node, 0 AS lvl
  UNION ALL
  SELECT top3.dst, walk.lvl + 1
  FROM walk JOIN top3 ON top3.src = walk.node
  WHERE walk.lvl < 4
)
SELECT node AS n_nationkey, min(lvl)::BIGINT AS hops,
       count(*)::BIGINT AS n_paths
FROM walk GROUP BY node
""")
def graph_reach_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-hop reachability via the ENGINE'S OWN iteration —
    Spark 4's `WITH RECURSIVE` (UnionLoop execution), the declarative
    counterpart to this module's Python-driven frontier loops
    (`graph_bfs_levels`): hop distance and path multiplicity from
    nation 0 over each nation's top-3 trading destinations, depth ≤ 4.

    Engine facts recorded: Spark 4.1 recursive CTEs support UNION ALL
    ONLY ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE], probed) — no
    engine-side frontier dedup, so cycle safety must come from a depth
    bound and path multiplicity grows with walks, not nodes. That is
    exactly why the Python frontier loop (visited-set anti-join per
    round) remains this engine's scale path for unbounded BFS; the
    recursive form is the right tool when the recursion is DIM-SIZED
    (here: a ≤25-node nation graph, out-degree capped at 3 by the
    top-3 rank, so ≤ 3^4 walk rows) — org charts, category trees, BOM
    explosions — while the heavy fact work stays in the one edge
    aggregation below the recursion. The walk table also carries
    n_paths (walk multiplicity), which the dedup-based frontier loop
    cannot produce — UNION ALL semantics as a feature, not a bug.

    The top-3 edge prune is deterministic ((cnt DESC, dst) total
    order) and both engines run the identical recursion, so the
    oracle is the same SQL modulo dialect.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    e = (o.join(c, o.o_custkey == c.c_custkey)
         .join(li, li.l_orderkey == o.o_orderkey)
         .join(s, li.l_suppkey == s.s_suppkey)
         .filter(F.col("c_nationkey") != F.col("s_nationkey"))
         .groupBy(F.col("c_nationkey").alias("src"),
                  F.col("s_nationkey").alias("dst"))
         .agg(F.count("*").alias("cnt")))
    rk = Window.partitionBy("src").orderBy(F.col("cnt").desc(), "dst")
    # checkpoint BEFORE the recursion: the loop references this view
    # once per iteration, and an unmaterialized view re-executes the
    # whole 4-way fact join every step (measured 4.7 s -> see
    # BASELINE.md; the edge list is <=75 rows, the fact is scanned once)
    top3 = (e.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") <= 3).select("src", "dst")
            .localCheckpoint(eager=True))
    view = "mdis_reach_edges"
    top3.createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH RECURSIVE walk AS (
          SELECT 0 AS node, 0 AS lvl
          UNION ALL
          SELECT e.dst, walk.lvl + 1
          FROM walk JOIN {view} e ON e.src = walk.node
          WHERE walk.lvl < 4
        )
        SELECT node AS n_nationkey, CAST(min(lvl) AS BIGINT) AS hops,
               CAST(count(*) AS BIGINT) AS n_paths
        FROM walk GROUP BY node""")
