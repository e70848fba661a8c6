"""TPC-H-shaped analytics suite — the 11 shapes completing the 22-query set.

The reference workload (curator analytics over a star schema; SURVEY.md
§2 [PK]) is TPC-H-shaped, and r1/r2 already shipped q1 (as
``agg_pricing_summary``), q3, q4, q5, q7, q8, q10, q16, q18, q19 and
q22. This module adds the remaining shapes — q2, q6, q9, q11, q12, q13,
q14, q15, q17, q20, q21 — so a user of the reference can run the entire
canonical 22-query analytics suite on this engine.

The fixture schema (TESTDATA.md) has no ``partsupp`` table and no
``l_shipmode``/``l_commitdate``/``l_receiptdate`` columns, so four
queries are *shape-preserving adaptations* (documented per query): the
join/subquery/aggregation structure — which is what the optimizer and
the 100 TB story care about — is identical to the canonical form; only
the column bindings differ.

Determinism discipline (PARITY.md): every money aggregate is rounded
with the IEEE-exact ``floor(x*100+0.5)/100`` form on BOTH engines;
every threshold comparison is either on exact-integer sums (quantities,
cent-ints) or on values rounded before the compare, so no
float-summation-order drift can flip a row in or out of the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.functions.rounding import rnd
from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.registry import register


@register("flagship_q6_forecast_revenue", """
SELECT floor(sum(l_extendedprice * l_discount) * 100.0 + 0.5) / 100.0
           AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def flagship_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast-revenue-change — pure scan-filter-aggregate.

    The simplest shape in the suite and the purest pushdown test: all
    three predicates (date range, discount band, quantity cap) reach
    the parquet scan as PushedFilters, the projection prunes to two
    columns, and the aggregate is a partial-final pair with no
    grouping key — at 100 TB this is a map-only job plus a scalar
    reduce; the only network traffic is one partial aggregate row per
    task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1997-01-01")
                      & (F.col("l_shipdate") < "1998-01-01")
                      & F.col("l_discount").between(0.05, 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
                 .alias("revenue"),
                 F.count("*").alias("n_lines")))


@register("flagship_q2_min_cost_supplier", """
WITH links AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
           row_number() OVER (PARTITION BY p_partkey
                              ORDER BY s_acctbal, s_suppkey) AS rn
    FROM part
    JOIN links    ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'EUROPE')
SELECT p_partkey, p_name, s_name, s_acctbal, n_name
FROM cand WHERE rn = 1
ORDER BY s_acctbal DESC, p_partkey
LIMIT 100
""")
def flagship_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin supplier in one region.

    Adaptation (no ``partsupp`` in the fixture): the part↔supplier
    relation is the DISTINCT (l_partkey, l_suppkey) link set from
    lineitem, and the minimized cost is ``s_acctbal`` instead of
    ``ps_supplycost``. The canonical structure is intact: filtered dim
    × link table × supplier × nation × region, then a correlated
    per-part minimum resolved as an argmin (row_number window with a
    unique tie-break), then top-100.

    100 TB: the link-distinct is the only fact-sized shuffle and it
    carries two int columns; part/supplier/nation/region are broadcast
    dims. The argmin window partitions on p_partkey — high cardinality,
    skew-free. The canonical correlated-MIN subquery would decorrelate
    to exactly this aggregate-and-rejoin under Catalyst.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    links = li.select("l_partkey", "l_suppkey").distinct()
    cand = (p.join(links, F.col("l_partkey") == F.col("p_partkey"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(r, F.col("n_regionkey") == F.col("r_regionkey")))
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc())
    return (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
            .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey"))
            .limit(100))


@register("flagship_q9_product_profit", """
SELECT n_name AS nation,
       year(o_orderdate) AS o_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                AS BIGINT)
           - CAST(floor(p_retailprice * 0.6 * l_quantity * 100.0 + 0.5)
                  AS BIGINT)) / 100.0
           AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
""")
def flagship_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and year.

    Adaptation (no ``partsupp``): unit cost is modeled as
    ``p_retailprice * 0.6`` (a fixed margin off the part's list price)
    instead of ``ps_supplycost``; the part filter token is ``red``
    (the fixture's p_name vocabulary has no ``green``). Structure is
    canonical: five-way join, substring part filter, two-level
    group-by with an expression key.

    100 TB: part/supplier/nation broadcast after the LIKE prune;
    orders⋈lineitem is the one big shuffle (both hash-partitioned on
    orderkey). The group-by key (nation × year) is tiny — partial
    aggregation collapses each task's output to ~nations×years rows
    before the exchange.

    Rounding: each row's revenue and cost terms are quantized to
    BIGINT cents BEFORE the sum (the flagship_q11 rule), so the group
    total is exact integer arithmetic on both engines. The previous
    round-the-float-sum form sat exactly on a half-cent tie on the
    null-injected fixture (577783.815 — both engines wobbled on the
    last IEEE bit; r7 verdict #6); per-row quantization removes the
    tie class instead of guard-banding it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")

    rev_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 100.0 + 0.5).cast("long")
    cost_cents = F.floor(F.col("p_retailprice") * 0.6 * F.col("l_quantity")
                         * 100.0 + 0.5).cast("long")
    return (li.join(p, F.col("p_partkey") == F.col("l_partkey"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg((F.sum(rev_cents - cost_cents) / 100.0).alias("profit")))


@register("flagship_q11_important_stock", """
WITH val AS (
    SELECT l_partkey,
           sum(CAST(floor(l_extendedprice * l_quantity * 100.0 + 0.5)
                    AS BIGINT)) AS v_cents
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY l_partkey)
SELECT l_partkey AS partkey,
       v_cents / 100.0 AS part_value
FROM val
WHERE v_cents > (SELECT 1.5 * sum(v_cents) / count(*) FROM val)
""")
def flagship_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with a global-fraction HAVING.

    Adaptation (no ``partsupp``): part value is the shipped
    ``extendedprice × quantity`` volume from one nation's suppliers
    instead of ``ps_supplycost × ps_availqty``. The defining structure
    — aggregate per part, keep parts above a scalar-subquery threshold
    over the GLOBAL aggregate — is intact. The canonical
    ``fraction-of-total`` cut is replaced by ``1.5× the mean part
    value`` so the selectivity is scale-invariant (a fixed fraction
    empties the result as the part count grows with SF).

    Determinism: per-row value is floored to integer cents (an
    exactly-specified IEEE op sequence, identical on both engines), so
    both the per-part sums and the global threshold are exact-integer
    arithmetic — no summation-order drift can flip a borderline part.

    100 TB: one fact shuffle on l_partkey; the global total re-uses
    the per-part aggregate (tiny) and broadcasts back as a scalar —
    the plan is agg → scalar-agg → broadcast-join, no second fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = (s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
         .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
         .select("s_suppkey"))

    val = (li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
           .withColumn("cents",
                       F.floor(F.col("l_extendedprice") * F.col("l_quantity")
                               * 100.0 + 0.5).cast("long"))
           .groupBy("l_partkey")
           .agg(F.sum("cents").alias("v_cents")))
    thr = val.agg((F.lit(1.5) * F.sum("v_cents") / F.count("*")).alias("thr"))
    return (val.crossJoin(F.broadcast(thr))
            .filter(F.col("v_cents") > F.col("thr"))
            .select(F.col("l_partkey").alias("partkey"),
                    (F.col("v_cents") / 100.0).alias("part_value")))


@register("flagship_q12_priority_lines", """
SELECT l_linestatus AS ship_mode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate
GROUP BY l_linestatus
""")
def flagship_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-mode high/low-priority conditional counts.

    Adaptation (no ``l_shipmode``/``l_commitdate``/``l_receiptdate``):
    the mode column is ``l_linestatus`` and "late" is ship-after-order
    (``l_shipdate > o_orderdate``). The canonical structure — a fact
    join with a cross-table inequality plus two CASE-conditional
    counts per group — is intact.

    100 TB: integer conditional counts are exact; the shuffle key
    (l_linestatus, 2 values) is low-cardinality but the partial
    aggregation collapses each map task to ≤2 rows pre-exchange, so
    the skew is irrelevant — the reduce side receives #tasks×2 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .filter(F.col("l_shipdate") > F.col("o_orderdate"))
            .groupBy(F.col("l_linestatus").alias("ship_mode"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count")))


@register("flagship_q13_order_distribution", """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
""")
def flagship_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution.

    The only 22-suite query driven by an OUTER join with a predicate
    in the JOIN condition (not WHERE — customers with zero qualifying
    orders must survive with c_count=0). The comment-pattern exclusion
    becomes a priority exclusion (fixture has no o_comment). Two
    cascaded aggregations: per-customer count, then the histogram.

    100 TB: the left join shuffles on custkey; the first aggregate
    rides the SAME hash partitioning (no second exchange — Catalyst
    reuses the join's distribution), and the histogram input is one
    row per customer with partial aggregation collapsing it to
    ~distinct-count rows per task.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (c.join(o, (F.col("c_custkey") == F.col("o_custkey"))
                       & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
                       "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register("flagship_q14_promo_share", """
SELECT floor(100.0
             * sum(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount))
             * 1000000.0 + 0.5) / 1000000.0 AS promo_share,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
""")
def flagship_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one month.

    Canonical structure unchanged (the fixture's p_type IS 'PROMO' for
    ~1/6 of parts): a month-sliced fact⋈dim join feeding a ratio of a
    CASE-masked sum over the total sum, rounded at 6dp — the two sums
    share one aggregation pass. The ratio of two large same-scale sums
    has ~1e-12 relative drift across engine summation orders, far
    inside the 5e-7 rounding margin.

    100 TB: the date slice prunes the fact scan (PushedFilters), part
    broadcasts, and the aggregate is grouping-free — map-side partials
    reduce to one row per task.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01"))
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (li.join(p, F.col("p_partkey") == F.col("l_partkey"))
            .agg(rnd(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6)
                 .alias("promo_share"),
                 F.count("*").alias("n_lines")))


@register("flagship_q15_top_supplier", """
WITH rev AS (
    SELECT l_suppkey,
           floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5)
               / 100.0 AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""")
def flagship_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier(s) by one quarter's revenue.

    Canonical structure: a revenue view per supplier, a scalar MAX
    subquery over that same view, and an equality join back to the
    supplier dim — the classic aggregate-reuse test. Revenue is
    rounded to cents BEFORE the max/equality compare on both engines,
    so summation-order drift cannot make the engines disagree about
    who is top (PARITY.md discipline).

    100 TB: one fact shuffle on l_suppkey; the view is
    supplier-cardinality (small), its MAX is a scalar broadcast, and
    the final join broadcasts both small sides. The view is computed
    once — Spark reuses the aggregated DataFrame for both branches.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01"))
    s = load_table(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
           .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (s.join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
            .crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("mx"))
            .select("s_suppkey", "s_name", "total_revenue"))


@register("flagship_q17_small_qty_revenue", """
WITH part_avg AS (
    SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thr
    FROM lineitem
    GROUP BY l_partkey)
SELECT floor(sum(l_extendedprice) / 7.0 * 100.0 + 0.5) / 100.0
           AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN part_avg USING (l_partkey)
WHERE p_brand = 'Brand#23'
  AND l_quantity < qty_thr
""")
def flagship_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue (correlated AVG).

    Canonical structure: the correlated scalar subquery
    ``l_quantity < 0.2 * avg(l_quantity) over the same part`` —
    written as its decorrelated form (per-part aggregate re-joined to
    the fact), which is exactly what Catalyst/DuckDB both rewrite the
    correlated form into. No p_container in the fixture, so the part
    filter is brand-only.

    Determinism: quantities are integer-valued doubles, so each
    per-part sum is EXACT (< 2^53) regardless of summation order;
    avg = exact-sum / exact-count is one IEEE division → bit-identical
    thresholds on both engines.

    100 TB: the per-part avg shuffles the fact once on l_partkey and
    produces a part-cardinality table; the threshold join re-uses the
    same hash distribution and the Brand filter broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = (li.groupBy("l_partkey")
                .agg((F.avg("l_quantity") * 0.2).alias("qty_thr")))
    return (li.join(p, F.col("p_partkey") == F.col("l_partkey"))
            .join(part_avg, "l_partkey")
            .filter(F.col("l_quantity") < F.col("qty_thr"))
            .agg(rnd(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
                 F.count("*").alias("n_lines")))


@register("flagship_q20_excess_share_suppliers", """
WITH q97 AS (
    SELECT l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS q97
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey),
qall AS (
    SELECT l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qa
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO'
    GROUP BY l_suppkey),
thr AS (
    SELECT CAST(sum(q97) AS DOUBLE) / CAST(sum(qa) AS DOUBLE) AS mean_share
    FROM q97 JOIN qall USING (l_suppkey))
SELECT s_suppkey, s_name, n_name, CAST(q97 AS BIGINT) AS qty_1997
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN q97  ON l_suppkey = s_suppkey
JOIN qall USING (l_suppkey), thr
WHERE q97 > 1.15 * mean_share * qa
""")
def flagship_q20_excess_share_suppliers(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with excess share of a part class.

    Adaptation (no ``ps_availqty``): the canonical "availqty greater
    than half of this year's shipped quantity" becomes "this year's
    shipped PROMO quantity exceeds 1.15× the corpus-wide 1997 share
    applied to the supplier's all-time PROMO quantity" — i.e. the
    suppliers that over-indexed on 1997. Structure preserved: two
    nested aggregates over the filtered part class, a scalar subquery
    threshold, and a semi-join back to supplier/nation detail.

    Determinism: quantities sum as exact integers; the mean share is
    ONE division of two exact ints, and the comparison
    ``q97 > 1.15 * mean_share * qa`` evaluates left-to-right the same
    IEEE sequence on both engines.

    100 TB: two passes over the PROMO slice (both pruned at the scan
    by the broadcast part filter), each shuffling supplier-cardinality
    aggregates; the threshold is a broadcast scalar.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    promo = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    q97 = (promo.filter((F.col("l_shipdate") >= "1997-01-01")
                        & (F.col("l_shipdate") < "1998-01-01"))
           .groupBy("l_suppkey")
           .agg(F.sum(F.col("l_quantity").cast("long")).alias("q97")))
    qall = (promo.groupBy("l_suppkey")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("qa")))
    both = q97.join(qall, "l_suppkey")
    thr = both.agg((F.sum("q97").cast("double")
                    / F.sum("qa").cast("double")).alias("mean_share"))
    return (s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(both, F.col("l_suppkey") == F.col("s_suppkey"))
            .crossJoin(F.broadcast(thr))
            .filter(F.col("q97") > F.lit(1.15) * F.col("mean_share")
                    * F.col("qa"))
            .select("s_suppkey", "s_name", "n_name",
                    F.col("q97").alias("qty_1997")))


@register("flagship_q21_waiting_supplier", """
WITH late AS (
    SELECT DISTINCT l_orderkey, l_suppkey
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
order_supp AS (
    SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
    FROM lineitem GROUP BY l_orderkey),
late_cnt AS (
    SELECT l_orderkey, count(*) AS n_late
    FROM late GROUP BY l_orderkey)
SELECT s_name, count(*) AS numwait
FROM late
JOIN supplier  ON s_suppkey = l_suppkey
JOIN order_supp USING (l_orderkey)
JOIN late_cnt   USING (l_orderkey)
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""")
def flagship_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone delayed multi-supplier orders.

    Adaptation (no ``l_receiptdate``/``l_commitdate``): "late" is
    shipping more than 60 days after the order date. The canonical
    EXISTS ("another supplier participates in the order") and NOT
    EXISTS ("no OTHER supplier was late on it") are expressed as their
    exact aggregate forms: participant-count > 1 and late-count = 1 —
    the decorrelation both optimizers apply to the subquery pair.

    100 TB: every aggregate and join in the chain keys on l_orderkey,
    so the whole pipeline rides ONE hash distribution; the final
    per-supplier count is a ~100-row aggregate with partials. The
    order-status filter prunes the orders side before its join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")

    late = (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .select("l_orderkey", "l_suppkey").distinct())
    order_supp = (li.groupBy("l_orderkey")
                  .agg(F.countDistinct("l_suppkey").alias("n_supp")))
    late_cnt = late.groupBy("l_orderkey").agg(F.count("*").alias("n_late"))
    return (late.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(order_supp, "l_orderkey")
            .join(late_cnt, "l_orderkey")
            .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("s_name"))
            .limit(100))
