"""Aggregation operators (SURVEY.md §2.4).

Reference behavior reconstructed: summary statistics and per-category
tallies over curator sheets; hierarchical report totals. All groupBys
here are hash aggregations with map-side partial aggregation (Spark
does partial/final automatically); group keys are low-cardinality
enums or dim keys, so the shuffle moves only the partial states —
the pattern that holds at 100 TB.

Hash discipline: every double is rounded before it reaches the driver's
value hash (2dp money, 4dp ratios); collected arrays are sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import (epoch_day, rnd,
                                                         sql_rnd)
from manual_data_ingest_spark.registry import register


@register("agg_pricing_summary", f"""
WITH sc AS (
  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
         l_discount,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS u,
         CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS dc
  FROM lineitem
)
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       -- exact integers: u = cents × (100 − disc_c), summed as a
       -- TWO-LEVEL SPLIT (lo = u % 1e6, hi = (u−lo)/1e6 exact) so
       -- both partial sums stay in fast int64 — a plain double
       -- product sum is order-sensitive once values leave the
       -- 2dp-clean domain (numeric-edge sweep), a DECIMAL sum costs
       -- ~1.5× (A/B measured), and the split's envelope holds through
       -- 100 TB in-domain row counts (|Σhi| ≤ 1.2e3/row,
       -- |Σlo| < 1e6/row). The recombine Σhi·1e6 + Σlo runs over
       -- identical exact ints on both engines.
       {sql_rnd('''(sum(CAST((u - u % 1000000) / 1000000 AS BIGINT))::DOUBLE
                     * 1000000.0
                   + sum(u % 1000000)::DOUBLE) / 10000.0''')}
           AS sum_disc_price,
       CASE WHEN count(l_discount) > 0 THEN
         {sql_rnd('sum(dc)::DOUBLE / (100.0 * count(l_discount))', 4)}
       END AS avg_disc,
       count(*)                       AS count_order
FROM sc
GROUP BY l_returnflag, l_linestatus
""")
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1 shape — the flagship aggregation. Revenue and the
    # discount mean ride exact integer moments (2dp money/rates ×100,
    # two-level split sums — see the oracle comment), so the one
    # rounded division is identical on both engines at any magnitude;
    # qty/base-price sums stay native (their drift is orders of
    # magnitude inside the rounding margin).
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    dc = F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
    u = cents * (100 - dc)
    lo = u % F.lit(1000000)
    hi = ((u - lo) / F.lit(1000000)).cast("long")  # exact division
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 rnd((F.sum(hi).cast("double") * 1000000.0
                      + F.sum(lo).cast("double")) / 10000.0)
                 .alias("sum_disc_price"),
                 F.when(F.count("l_discount") > 0,
                        rnd(F.sum(dc).cast("double")
                            / (100.0 * F.count("l_discount")), 4))
                 .alias("avg_disc"),
                 F.count("*").alias("count_order")))


@register("agg_count_distinct", """
SELECT n_name, count(DISTINCT o_custkey) AS n_customers
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.countDistinct("o_custkey").alias("n_customers")))


@register("agg_approx_distinct", """
SELECT count(DISTINCT l_partkey)::BIGINT AS exact_parts,
       TRUE AS within_bound
FROM lineitem
""")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB-scale cardinality estimation: one pass, constant memory/key.

    HLL sketch internals aren't portable SQL, so the oracle pins the
    sketch's ERROR BOUND instead of its value: the query emits the exact
    count (hash payload) plus ``within_bound`` — true iff the HLL++
    estimate is within 3×rsd of exact (rsd=0.05 → 15 %). The oracle
    asserts TRUE, so a sketch drifting out of spec hash-mismatches.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (li.agg(F.approx_count_distinct("l_partkey", 0.05).alias("approx"),
                   F.countDistinct("l_partkey").alias("exact_parts"))
            .select("exact_parts",
                    (F.abs(F.col("approx") - F.col("exact_parts"))
                     <= 0.15 * F.col("exact_parts")).alias("within_bound")))


@register("agg_rollup", """
SELECT n_name, c_mktsegment,
       count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
""")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .rollup("n_name", "c_mktsegment")
            .agg(F.count("*").alias("n_cust"),
                 F.round(F.sum("c_acctbal"), 2).alias("sum_bal")))


@register("agg_cube", """
SELECT n_name, c_mktsegment,
       count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, c_mktsegment)
""")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .cube("n_name", "c_mktsegment")
            .agg(F.count("*").alias("n_cust"),
                 F.round(F.sum("c_acctbal"), 2).alias("sum_bal")))


@register("agg_grouping_sets", """
SELECT n_name, c_mktsegment, count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
""")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no stable DataFrame API for arbitrary grouping sets → SQL entry point
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey) \
        .createOrReplaceTempView("mdis_gs_custnation")
    return spark.sql("""
        SELECT n_name, c_mktsegment, count(*) AS n_cust
        FROM mdis_gs_custnation
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    """)


@register("agg_filtered", f"""
WITH sc AS (
  SELECT l_linestatus, l_returnflag, l_quantity,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS u
  FROM lineitem
)
SELECT l_linestatus,
       {sql_rnd('''(sum(CAST((u - u % 1000000) / 1000000 AS BIGINT))
                     FILTER (WHERE l_returnflag = 'R')::DOUBLE * 1000000.0
                   + sum(u % 1000000)
                     FILTER (WHERE l_returnflag = 'R')::DOUBLE)
                   / 10000.0''')} AS rev_returned,
       {sql_rnd('''(sum(CAST((u - u % 1000000) / 1000000 AS BIGINT))
                     FILTER (WHERE l_returnflag = 'A')::DOUBLE * 1000000.0
                   + sum(u % 1000000)
                     FILTER (WHERE l_returnflag = 'A')::DOUBLE)
                   / 10000.0''')} AS rev_accepted,
       count(*) FILTER (WHERE l_quantity > 25) AS n_bulk
FROM sc
GROUP BY l_linestatus
""")
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    # conditional aggregation in ONE pass (no self-joins / multiple
    # scans); revenue rides the agg_pricing_summary exact two-level
    # split form so the FILTER sums agree at any value magnitude
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    dc = F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
    u = cents * (100 - dc)
    lo = u % F.lit(1000000)
    hi = ((u - lo) / F.lit(1000000)).cast("long")  # exact division

    def rev(flag):
        w = F.col("l_returnflag") == flag
        return rnd((F.sum(F.when(w, hi)).cast("double") * 1000000.0
                    + F.sum(F.when(w, lo)).cast("double")) / 10000.0)

    return (li.groupBy("l_linestatus")
            .agg(rev("R").alias("rev_returned"),
                 rev("A").alias("rev_accepted"),
                 F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_bulk")))


@register("agg_collect_sorted", """
SELECT n_name,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-safety: collected arrays are always sorted (collect_set order
    # is nondeterministic across partitions/runs) and flattened to one
    # string — the driver's canonicalizer cannot hash ndarray cells
    # (r1 red: TypeError unhashable ndarray), so no array column may
    # reach the contract surface.
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",")
                 .alias("segments")))


@register("agg_percentile", f"""
SELECT o_orderstatus,
       {sql_rnd('quantile_cont(o_totalprice, 0.5)')} AS p50,
       {sql_rnd('quantile_cont(o_totalprice, 0.9)')} AS p90
FROM orders
GROUP BY o_orderstatus
""")
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact interpolated percentiles (Spark `percentile` == DuckDB
    # quantile_cont — parity verified, SURVEY.md §2.14), emitted as two
    # SCALAR columns: the driver's canonicalizer crashed on the r1
    # array-typed output. At 100 TB use approx_percentile instead;
    # exact needs a per-group sort.
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(rnd(F.expr("percentile(o_totalprice, 0.5D)")).alias("p50"),
                 rnd(F.expr("percentile(o_totalprice, 0.9D)")).alias("p90")))


@register("agg_stats", f"""
SELECT n_name,
       {sql_rnd(f"{sql_rnd('sum(c_acctbal)')} / count(*)")} AS avg_bal,
       round(min(c_acctbal), 2)         AS min_bal,
       round(max(c_acctbal), 2)         AS max_bal,
       round(stddev_samp(c_acctbal), 2) AS sd_bal,
       round(var_samp(c_acctbal), 2)    AS var_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg derives from the 2dp-ROUNDED sum (then one exact division):
    # raw avg() sat exactly on a .xx5 rounding boundary at sf0.001, where
    # the engines' different summation orders flip the final cent —
    # rounding the sum first puts ~1e-9 of drift against a 0.005 margin
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(rnd(rnd(F.sum("c_acctbal")) / F.count("*")).alias("avg_bal"),
                 F.round(F.min("c_acctbal"), 2).alias("min_bal"),
                 F.round(F.max("c_acctbal"), 2).alias("max_bal"),
                 F.round(F.stddev_samp("c_acctbal"), 2).alias("sd_bal"),
                 F.round(F.var_samp("c_acctbal"), 2).alias("var_bal")))


@register("agg_time_rollup", f"""
WITH e AS (SELECT ts::TIMESTAMP AS ts, value FROM events)
SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket,
       count(*) AS cnt, {sql_rnd('sum(value)')} AS sum_value
FROM e GROUP BY 2
UNION ALL
SELECT 'day', date_trunc('day', ts), count(*), {sql_rnd('sum(value)')}
FROM e GROUP BY 2
UNION ALL
SELECT 'total', NULL, count(*), {sql_rnd('sum(value)')}
FROM e
""")
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup ladder: hour → day → total, where each
    coarser resolution aggregates the FINER level's partials instead of
    rescanning raw events — the continuous-aggregate cascade pattern.
    At 100 TB the hourly table is materialized incrementally by the
    tumbling-window stream (stream_tumbling) and the day/total levels
    are cheap reductions over it; here the cascade runs in one plan and
    the raw-scan SQL is the oracle (sum reassociation is absorbed by
    the 2dp rounding discipline).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly_raw = (ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
                  .agg(F.count("*").alias("cnt"),
                       F.sum("value").alias("sv")))
    daily_raw = (hourly_raw
                 .groupBy(F.date_trunc("day", "bucket").alias("bucket"))
                 .agg(F.sum("cnt").alias("cnt"), F.sum("sv").alias("sv")))
    total_raw = daily_raw.agg(F.sum("cnt").alias("cnt"),
                              F.sum("sv").alias("sv")) \
        .select(F.lit(None).cast("timestamp").alias("bucket"), "cnt", "sv")

    def finish(df, label):
        return df.select(F.lit(label).alias("resolution"), "bucket",
                         F.col("cnt").cast("long").alias("cnt"),
                         rnd(F.col("sv")).alias("sum_value"))

    return (finish(hourly_raw, "hour")
            .unionByName(finish(daily_raw, "day"))
            .unionByName(finish(total_raw, "total")))


@register("agg_approx_quantile", f"""
SELECT o_orderstatus,
       {sql_rnd('quantile_cont(o_totalprice, 0.5)')} AS p50_exact,
       {sql_rnd('quantile_cont(o_totalprice, 0.9)')} AS p90_exact,
       TRUE AS approx_ok
FROM orders
GROUP BY o_orderstatus
""")
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via Spark's Greenwald-Khanna sketch —
    p50/p90 of o_totalprice per o_orderstatus at accuracy 1000
    (error ≤ 0.1 %·n ranks). Mergeable sketch → one partial-agg shuffle
    at any scale, vs exact percentile's full sort per group.

    Sketch internals aren't portable SQL, so (like agg_approx_distinct)
    the oracle pins the ERROR BOUND: the query emits the exact
    quantiles (hash payload) plus ``approx_ok`` — true iff each GK
    estimate lands within 2 % of its exact value. The oracle asserts
    TRUE; a sketch out of spec hash-mismatches instead of being
    invisible to the driver (r1 scored every no-oracle query as err).
    """
    o = load_table(spark, sf_dir, "orders")
    agg = (o.groupBy("o_orderstatus")
           .agg(F.percentile_approx(
                    "o_totalprice", [0.5, 0.9], 1000).alias("q"),
                F.expr("percentile(o_totalprice, array(0.5D, 0.9D))").alias("e"),
                F.expr("percentile_disc(0.5) WITHIN GROUP "
                       "(ORDER BY o_totalprice)").alias("d50"),
                F.expr("percentile_disc(0.9) WITHIN GROUP "
                       "(ORDER BY o_totalprice)").alias("d90")))
    # the GK bound is stated against the DISCRETE exact quantile — the
    # sketch returns an OBSERVED element with an ε·n rank guarantee, so
    # comparing it to the INTERPOLATED percentile conflates sketch
    # error with the discrete-vs-interpolated definitional gap, which
    # dominates on small groups in sparse value regions (adversarial
    # sweep: a 136-row group sat 2.8% from the interpolated median
    # while being EXACTLY the discrete one). The hashed payload stays
    # the interpolated quantiles; approx_ok is the sketch-vs-disc spec.
    # |.| on BOTH sides (r9, advice): a negative discrete quantile made
    # the threshold negative, failing groups where the sketch returned
    # the EXACT element (the numeric sweep's 8% negations never turned
    # a group median negative, so the gate missed it). A zero quantile
    # degenerates the relative bound to exact equality — intended.
    close = (F.abs(F.col("q")[0] - F.col("d50"))
             <= 0.02 * F.abs(F.col("d50"))) & \
            (F.abs(F.col("q")[1] - F.col("d90"))
             <= 0.02 * F.abs(F.col("d90")))
    # a group with zero non-null prices has nothing to estimate: the
    # bound is VACUOUSLY satisfied (null-fixture contract)
    ok = F.when(F.col("e")[0].isNull(), F.lit(True)).otherwise(close)
    return agg.select("o_orderstatus",
                      rnd(F.col("e")[0]).alias("p50_exact"),
                      rnd(F.col("e")[1]).alias("p90_exact"),
                      ok.alias("approx_ok"))


@register("agg_gapfill_timeseries", f"""
WITH spine AS (
    SELECT n_nationkey,
           unnest(generate_series(DATE '1995-01-01', DATE '1996-12-01',
                                  INTERVAL 1 MONTH))::DATE AS month_start
    FROM nation
),
actual AS (
    SELECT c_nationkey, date_trunc('month', o_orderdate)::DATE AS month_start,
           count(*) AS n, {sql_rnd('sum(o_totalprice)')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY 1, 2
)
SELECT s.n_nationkey, s.month_start,
       coalesce(a.n, 0) AS n_orders,
       coalesce(a.revenue, 0.0) AS revenue
FROM spine s
LEFT JOIN actual a ON a.c_nationkey = s.n_nationkey
                  AND a.month_start = s.month_start
""")
def agg_gapfill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled time series (the hypertable `time_bucket_gapfill`
    shape): monthly order counts + revenue per nation over a fixed
    2-year spine, with ZERO rows where a nation had no orders that
    month — the property a naive groupBy cannot give and every
    dashboard/forecast consumer needs.

    Spine = nation × sequence(months) (generated, tiny); actuals
    aggregate once; the left join broadcasts whichever side is small.
    At 100 TB the spine stays tiny — cardinality is entities×buckets,
    independent of event volume.
    """
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spine = n.select(
        "n_nationkey",
        F.explode(F.expr("sequence(DATE '1995-01-01', DATE '1996-12-01',"
                         " INTERVAL 1 MONTH)")).alias("month_start"))
    actual = (o.join(c, o.o_custkey == c.c_custkey)
              .filter((F.col("o_orderdate") >= "1995-01-01")
                      & (F.col("o_orderdate") < "1997-01-01"))
              .groupBy(F.col("c_nationkey"),
                       F.date_trunc("month", "o_orderdate").cast("date")
                       .alias("month_start"))
              .agg(F.count("*").alias("n"),
                   rnd(F.sum("o_totalprice")).alias("revenue")))
    return (spine.join(actual,
                       (actual.c_nationkey == spine.n_nationkey)
                       & (actual.month_start == spine.month_start), "left")
            .select("n_nationkey", spine.month_start,
                    F.coalesce("n", F.lit(0)).alias("n_orders"),
                    F.coalesce("revenue", F.lit(0.0)).alias("revenue")))


@register("agg_gapfill_interp", f"""
WITH months AS (
    SELECT n_nationkey,
           unnest(generate_series(DATE '1995-01-01', DATE '1996-12-01',
                                  INTERVAL 1 MONTH))::DATE AS month_start
    FROM nation
),
actual AS (
    SELECT c_nationkey, date_trunc('month', o_orderdate)::DATE AS month_start,
           {sql_rnd('sum(o_totalprice)')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
      AND o_totalprice > 450000
    GROUP BY 1, 2
),
j AS (
    SELECT s.n_nationkey, s.month_start, a.revenue,
           (12 * (year(s.month_start) - 1995)
            + month(s.month_start) - 1) AS m
    FROM months s
    LEFT JOIN actual a ON a.c_nationkey = s.n_nationkey
                      AND a.month_start = s.month_start
),
w AS (
    SELECT *,
           last_value(revenue IGNORE NULLS) OVER (
               PARTITION BY n_nationkey ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           last_value(CASE WHEN revenue IS NOT NULL THEN m END IGNORE NULLS)
               OVER (PARTITION BY n_nationkey ORDER BY m
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
           first_value(revenue IGNORE NULLS) OVER (
               PARTITION BY n_nationkey ORDER BY m
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN revenue IS NOT NULL THEN m END IGNORE NULLS)
               OVER (PARTITION BY n_nationkey ORDER BY m
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm
    FROM j
)
SELECT n_nationkey, month_start,
       CASE WHEN revenue IS NOT NULL THEN revenue
            WHEN pv IS NULL OR nv IS NULL THEN NULL
            ELSE {sql_rnd('pv + (nv - pv) * (m - pm) / (nm - pm)')}
       END AS revenue_interp,
       (revenue IS NULL) AS was_gap
FROM w
""")
def agg_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-interpolated gapfill — the hypertable ``interpolate()``
    companion to ``agg_gapfill_timeseries``'s zero-fill and
    ``win_forward_fill``'s LOCF: missing (nation, month) revenue points
    take the straight line between the nearest present neighbors;
    leading/trailing gaps (no neighbor on one side) stay NULL, flagged
    by ``was_gap``.

    The actuals are made genuinely sparse (only orders > 450k) so the
    interpolation path is exercised, not vacuous. Bracketing neighbors
    come from four IGNORE-NULLS running windows (last value/index
    before, first value/index after) — one shuffle on the entity key
    serves all four plus the output sort. Determinism: month index m is
    an exact integer, both engines compute the identical
    ``pv + (nv-pv)*(m-pm)/(nm-pm)`` shape, and the result passes the
    shared round-half-up 2dp rounder before comparison.

    100 TB: identical scale story to the zero-fill twin — the spine is
    entities × buckets (independent of event volume), the actuals
    aggregate ONCE with a partial agg, and the windows run over
    spine-sized partitions, never event-sized ones.
    """
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spine = n.select(
        "n_nationkey",
        F.explode(F.expr("sequence(DATE '1995-01-01', DATE '1996-12-01',"
                         " INTERVAL 1 MONTH)")).alias("month_start"))
    actual = (o.join(c, o.o_custkey == c.c_custkey)
              .filter((F.col("o_orderdate") >= "1995-01-01")
                      & (F.col("o_orderdate") < "1997-01-01")
                      & (F.col("o_totalprice") > 450000))
              .groupBy(F.col("c_nationkey"),
                       F.date_trunc("month", "o_orderdate").cast("date")
                       .alias("month_start"))
              .agg(rnd(F.sum("o_totalprice")).alias("revenue")))
    j = (spine.join(actual,
                    (actual.c_nationkey == spine.n_nationkey)
                    & (actual.month_start == spine.month_start), "left")
         .select("n_nationkey", spine.month_start, "revenue",
                 (12 * (F.year(spine.month_start) - 1995)
                  + F.month(spine.month_start) - 1).alias("m")))
    wp = (Window.partitionBy("n_nationkey").orderBy("m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy("n_nationkey").orderBy("m")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    marked = F.when(F.col("revenue").isNotNull(), F.col("m"))
    out = (j.withColumn("pv", F.last("revenue", ignorenulls=True).over(wp))
           .withColumn("pm", F.last(marked, ignorenulls=True).over(wp))
           .withColumn("nv", F.first("revenue", ignorenulls=True).over(wn))
           .withColumn("nm", F.first(marked, ignorenulls=True).over(wn)))
    interp = rnd(F.col("pv") + (F.col("nv") - F.col("pv"))
                 * (F.col("m") - F.col("pm")) / (F.col("nm") - F.col("pm")))
    return out.select(
        "n_nationkey", "month_start",
        F.when(F.col("revenue").isNotNull(), F.col("revenue"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(interp).alias("revenue_interp"),
        F.col("revenue").isNull().alias("was_gap"))


@register("agg_skew_kurtosis", f"""
WITH mu AS (
    SELECT o_orderstatus, avg(o_totalprice) AS mu
    FROM orders GROUP BY o_orderstatus
),
m AS (
    SELECT o.o_orderstatus,
           avg(pow(o_totalprice - mu, 2)) AS m2,
           avg(pow(o_totalprice - mu, 3)) AS m3,
           avg(pow(o_totalprice - mu, 4)) AS m4
    FROM orders o JOIN mu
        ON o.o_orderstatus IS NOT DISTINCT FROM mu.o_orderstatus
    GROUP BY o.o_orderstatus
)
SELECT o_orderstatus,
       {sql_rnd('m3 / pow(m2, 1.5)', 6)} AS skew,
       {sql_rnd('m4 / (m2 * m2) - 3.0', 6)} AS kurt
FROM m
""")
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    # higher-moment distribution QC: skewness + excess kurtosis of
    # o_totalprice per status. Spark computes POPULATION moments
    # (g1 = m3/m2^1.5, excess g2 = m4/m2² − 3) while DuckDB's built-in
    # skewness/kurtosis are SAMPLE-adjusted (G1) — verified divergent
    # (PARITY #16). The oracle therefore spells out the population
    # moments explicitly (two-pass central moments, numerically stable),
    # making this hash-exact instead of r1's rows-only/no-oracle red.
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(rnd(F.skewness("o_totalprice"), 6).alias("skew"),
                 rnd(F.kurtosis("o_totalprice"), 6).alias("kurt")))


@register("agg_minby_maxby", """
SELECT o_orderstatus,
       arg_max(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS top_order,
       arg_min(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS bottom_order
FROM orders
GROUP BY o_orderstatus
""")
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    # argmin/argmax in ONE aggregation pass (no window, no self-join):
    # the orderkey of each group's price extreme. Ties are broken by a
    # composite numeric key (price*1e6 + key — 2dp prices make it an
    # exact integer in double range, so both engines compare identically;
    # a bare max_by on price alone would be nondeterministic on ties).
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_totalprice") * 1000000 + F.col("o_orderkey")
    return (o.groupBy("o_orderstatus")
            .agg(F.max_by("o_orderkey", key).alias("top_order"),
                 F.min_by("o_orderkey", key).alias("bottom_order")))


@register("agg_boolean", """
SELECT c_nationkey,
       bool_and(c_acctbal > 0) AS all_positive,
       bool_or(c_acctbal > 9000) AS any_rich,
       count_if(c_acctbal < 0)::BIGINT AS n_negative
FROM customer
GROUP BY c_nationkey
""")
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # boolean aggregates: universal/existential per group + predicate
    # count — the validation-report shape ("all rows pass", "any outlier")
    c = load_table(spark, sf_dir, "customer")
    return (c.groupBy("c_nationkey")
            .agg(F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
                 F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
                 F.count_if(F.col("c_acctbal") < 0).alias("n_negative")))


#: shared fixed-IEEE combine for the bivariate moments (the _det3
#: discipline): both engines evaluate this IDENTICAL op sequence over
#: bit-identical double moments, so the rounded outputs cannot sit on
#: different sides of a rounding boundary. Engine-native corr/covar
#: accumulate doubles in partition order — the adversarial sweep caught
#: a 6-row group whose covar_pop landed one cent apart across engines.
def _rnd_sql_dbl(expr: str, digits: int) -> str:
    """sql_rnd twin whose literals are written 1eN so SPARK's SQL
    parser types them DOUBLE — `1000000.0` is a DECIMAL literal to
    Spark (fine in the DuckDB-only oracles, but a string meant for
    BOTH engines via F.expr would come back decimal-typed)."""
    return f"floor(({expr}) * 1e{digits} + cast(0.5 as double)) / 1e{digits}"


_CORR_SQL = ("CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0"
             " AND (n * syy - sy * sy) > 0 THEN "
             + _rnd_sql_dbl("(n * sxy - sx * sy)"
                            " / sqrt((n * sxx - sx * sx)"
                            " * (n * syy - sy * sy))", 6)
             + " END")
_CVS_SQL = ("CASE WHEN n >= 2 THEN "
            + _rnd_sql_dbl("((sxy - sx * sy / n) / (n - 1)) / 1e4", 2)
            + " END")
_CVP_SQL = ("CASE WHEN n >= 1 THEN "
            + _rnd_sql_dbl("((sxy - sx * sy / n) / n) / 1e4", 2)
            + " END")


@register("agg_corr_covar", f"""
WITH sc AS (
  SELECT o_orderstatus,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c,
         -- positive mod, matching Spark's pmod (SQL % takes the
         -- dividend's sign — diverges on negative keys)
         CAST(((o_custkey % 100) + 100) % 100 AS BIGINT) * 100 AS y
  FROM orders
), m AS (
  -- every sum is EXACT (DuckDB promotes BIGINT sums to HUGEINT), then
  -- cast once to DOUBLE: both engines combine bit-identical moments
  SELECT o_orderstatus,
         CAST(count(c) AS DOUBLE) AS n,
         CAST(sum(c) AS DOUBLE) AS sx,
         CAST(sum(CASE WHEN c IS NOT NULL THEN y END) AS DOUBLE) AS sy,
         -- cast BEFORE the multiply (r9 advice): a BIGINT c*c errors
         -- once price cents reach ~3.04e9; HUGEINT products match the
         -- Spark side's decimal products (agg_regression discipline)
         CAST(sum(CAST(c AS HUGEINT) * y) AS DOUBLE) AS sxy,
         CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) AS sxx,
         CAST(sum(CASE WHEN c IS NOT NULL THEN y * y END) AS DOUBLE) AS syy
  FROM sc GROUP BY o_orderstatus
)
SELECT o_orderstatus,
       {_CORR_SQL} AS price_mod_corr,
       {_CVS_SQL} AS cv_samp,
       {_CVP_SQL} AS cv_pop
FROM m
""")
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bivariate statistics per group (corr ≈ 0 by construction — the
    # check is engine parity of the co-moment computation). Moments are
    # integer-scaled (price cents, y·100) and summed exactly — Spark
    # sums DECIMAL (exact, order-free), DuckDB HUGEINT — then the
    # shared _CORR_SQL/_CVS_SQL/_CVP_SQL strings combine them with one
    # fixed IEEE op sequence on both engines. The /10000 in the covar
    # combine undoes the two ×100 scalings.
    o = load_table(spark, sf_dir, "orders")
    c = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    y = (F.pmod("o_custkey", F.lit(100)).cast("long") * 100)
    sc = o.select("o_orderstatus", c.alias("c"), y.alias("y"))
    dec = "decimal(38,0)"
    m = (sc.groupBy("o_orderstatus")
         .agg(F.count("c").cast("double").alias("n"),
              F.sum("c").cast("double").alias("sx"),
              F.sum(F.when(F.col("c").isNotNull(), F.col("y")))
              .cast("double").alias("sy"),
              # cast-before-multiply (r9 advice): c*y in long ANSI-
              # throws just past the documented envelope; decimal
              # products mirror the oracle's HUGEINT products
              F.sum(F.col("c").cast(dec) * F.col("y").cast(dec))
              .cast("double").alias("sxy"),
              F.sum((F.col("c").cast(dec) * F.col("c").cast(dec)))
              .cast("double").alias("sxx"),
              F.sum(F.when(F.col("c").isNotNull(),
                           F.col("y") * F.col("y")))
              .cast("double").alias("syy")))
    return m.select("o_orderstatus",
                    F.expr(_CORR_SQL).alias("price_mod_corr"),
                    F.expr(_CVS_SQL).alias("cv_samp"),
                    F.expr(_CVP_SQL).alias("cv_pop"))


@register("agg_string_concat", """
SELECT r_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_regionkey
""")
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered string aggregation (listagg/string_agg): the report-line
    # shape. Spark's spelling is concat_ws over a SORTED collect_list —
    # the sort is the determinism discipline (an unordered string_agg is
    # nondeterministic under parallel collection on every engine).
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (r.join(n, n.n_regionkey == r.r_regionkey)
            .groupBy("r_regionkey")
            .agg(F.concat_ws(",", F.sort_array(F.collect_list("n_name")))
                 .alias("nations")))


@register("agg_heavy_hitters", """
WITH c AS (
    SELECT user_id, count(*)::BIGINT AS cnt
    FROM events GROUP BY user_id
), tot AS (
    SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_users FROM c
)
SELECT user_id, cnt,
       floor(cnt * 1000000.0 / total + 0.5) / 1000000.0 AS share
FROM c, tot
WHERE cnt * n_users >= 1.2 * total
""")
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: entities whose event count is ≥ 1.2× the
    mean (the skew-detection primitive a 100 TB ingest runs before
    choosing salting keys — SCALE.md relational-core row).

    Mean-relative (not fixed-share) so the definition survives scale:
    fixture user counts grow with SF while shares shrink. Shape: one
    partial+final count per user (1 shuffle), then the corpus total —
    two scalars — computed once and broadcast into the filter; the
    threshold never touches the driver. The integer cross-multiplied
    predicate (cnt * n_users >= 1.2 * total) avoids double division in
    the filter; `share` is emitted rounded 6dp for the hash.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = c.agg(F.sum("cnt").alias("total"),
                F.count("*").alias("n_users"))
    return (c.join(F.broadcast(tot))
            .filter(F.col("cnt") * F.col("n_users")
                    >= 1.2 * F.col("total"))
            .select("user_id", "cnt",
                    rnd(F.col("cnt") * 1.0 / F.col("total"), 6)
                    .alias("share")))


@register("agg_mode_deterministic", """
WITH c AS (
    SELECT l_returnflag, l_quantity, count(*)::BIGINT AS n
    FROM lineitem GROUP BY l_returnflag, l_quantity
)
SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
FROM c
QUALIFY row_number() OVER (PARTITION BY l_returnflag
                           ORDER BY n DESC, l_quantity) = 1
""")
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group statistical mode with a PINNED tie-break (smallest
    value wins). Spark 3.4+ ships `F.mode`, but its tie choice is
    unspecified — a hash-grade contract needs the two-level
    count-then-rank form, which also happens to be the scalable shape:
    both aggregations are partial+final on co-located keys (the second
    groupBy key is a prefix of the first), so the rank runs on the
    already-shuffled layout.
    """
    li = load_table(spark, sf_dir, "lineitem")
    c = (li.groupBy("l_returnflag", "l_quantity")
         .agg(F.count("*").alias("n")))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity"))
    return (c.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("l_returnflag",
                    F.col("l_quantity").alias("mode_qty"),
                    F.col("n").alias("mode_count")))


@register("agg_hll_partitioned", """
SELECT count(DISTINCT user_id)::BIGINT AS exact_users,
       -- a NULL event_type shard still holds rows and owns a sketch
       -- (Spark's groupBy keeps the NULL group; bare count(DISTINCT)
       -- would drop it and under-count the shards)
       (SELECT count(*) FROM (SELECT DISTINCT event_type FROM events))::BIGINT
           AS n_sketches,
       TRUE AS within_bound
FROM events
""")
def agg_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct count: one Datasketches HLL sketch per
    `event_type` shard, then `hll_union_agg` merges the sketch COLUMN
    into a global estimate — no rescan of the shards.

    This is the 100 TB cardinality pattern `agg_approx_distinct`
    (single-shot HLL++) can't do: partial sketches are materialized
    per partition/day and UNIONED at query time, so "distinct users
    ever" costs one pass over yesterday's sketch row + today's data.
    The oracle pins the 5% HLL error envelope (lgConfigK=12 default)
    as a hashable boolean plus the exact count.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count("*").alias("n_sketches"))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    return (exact.crossJoin(merged)
            .select("exact_users", "n_sketches",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= 0.05 * F.col("exact_users")).alias("within_bound")))


@register("agg_entropy", """
WITH c AS (
    SELECT source, lang, count(*) AS n
    FROM documents GROUP BY source, lang
),
t AS (SELECT source, sum(n) AS tot FROM c GROUP BY source)
SELECT c.source,
       floor((-sum((n / tot) * log2(n / tot))) * 1000000.0 + 0.5)
           / 1000000.0 AS lang_entropy,
       count(*)::BIGINT AS n_langs
FROM c JOIN t ON c.source = t.source
GROUP BY c.source, t.tot
""")
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the language mix per source — the
    distribution-balance QC a training-data pipeline runs before
    mixing corpora (entropy 0 = monolingual shard, log2(k) = uniform).

    Two chained aggregations on the same leading key: the per-(source,
    lang) count shuffles once; the per-source total and the final
    entropy reduce on the co-located layout. Entropy is rounded 6dp —
    it is a sum of p·log2(p) terms over ≤ O(langs) values, so the
    floating error is well inside 1e-6.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (c.join(t, "source")
            .groupBy("source")
            .agg(rnd(-F.sum(p * F.log2(p)), 6).alias("lang_entropy"),
                 F.count("*").alias("n_langs")))


@register("agg_histogram", """
WITH b AS (
    SELECT least(floor(o_totalprice / 60000.0), 9)::BIGINT AS bucket
    FROM orders
)
SELECT bucket,
       (bucket * 60000)::BIGINT AS lo,
       count(*)::BIGINT AS n,
       floor((count(*) * 1.0 /
              (SELECT count(*) FROM orders)) * 1000000.0 + 0.5)
           / 1000000.0 AS frac
FROM b
GROUP BY bucket
""")
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of order value (10 buckets of 60k, last
    bucket open-ended) — the distribution profile behind skew
    decisions: which salting factor, which range-partition bounds.

    Deliberately IDENTICAL floor arithmetic on both engines rather
    than `width_bucket` (absent in DuckDB 1.0, and its edge semantics
    differ by dialect): IEEE division + floor is bit-deterministic for
    the same inputs, so bucket assignment is engine-portable. One
    shuffle of 10 partial counts; the total for `frac` is a broadcast
    scalar, not a second scan shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 60000.0),
                     F.lit(9)).cast("long")
    total = o.agg(F.count("*").alias("tot"))
    return (o.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n"))
            .crossJoin(F.broadcast(total))
            .select("bucket",
                    (F.col("bucket") * 60000).cast("long").alias("lo"),
                    "n",
                    rnd(F.col("n") * 1.0 / F.col("tot"), 6).alias("frac")))


@register("agg_gini", """
WITH c AS (
    SELECT event_type, user_id, count(*) AS x
    FROM events GROUP BY event_type, user_id
),
r AS (
    SELECT event_type, x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY x, user_id) AS i,
           count(*) OVER (PARTITION BY event_type) AS n,
           sum(x)   OVER (PARTITION BY event_type) AS tot
    FROM c
)
SELECT event_type,
       floor((2.0 * sum(i * x) / (n * tot) - (n + 1.0) / n) * 1000000.0
             + 0.5) / 1000000.0 AS gini,
       n::BIGINT AS n_users
FROM r
GROUP BY event_type, n, tot
""")
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the per-user activity distribution per
    event type — the scalar skew diagnostic (0 = uniform load, →1 =
    one hot user) read BEFORE choosing salting factors and AQE skew
    thresholds; complements `agg_histogram` (shape) and
    `agg_heavy_hitters` (who).

    Rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending
    ranks. Tie-break (x, user_id) is pinned so row_number ranks agree
    across engines. r10: the per-type rank runs over USER-cardinality
    rows (grows with the data, split across only a few event types),
    so it rides the partitioned exact-rank primitive with the
    dominant-tie subdivision (x is a small count — massively tied);
    per-type totals arrive as a broadcast aggregate joined null-safely
    (NULL event_type is a group, like the window it replaces).
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_exact_partitioned_rank)

    ev = load_table(spark, sf_dir, "events")
    c = (ev.groupBy("event_type", "user_id").agg(F.count("*").alias("x"))
         .localCheckpoint(eager=True))  # two consumers: ranks + totals
    ranked = with_exact_partitioned_rank(
        c, ["event_type"], "x", ["user_id"], rank_col="i",
        total_col="n", tie_proxy=F.col("user_id"))
    tot = (c.groupBy("event_type").agg(F.sum("x").alias("tot"))
           .withColumnRenamed("event_type", "_tot_et"))
    r = (ranked.join(F.broadcast(tot),
                     F.col("event_type").eqNullSafe(F.col("_tot_et")))
         .drop("_tot_et"))
    return (r.groupBy("event_type", "n", "tot")
            .agg(rnd(2.0 * F.sum(F.col("i") * F.col("x"))
                     / (F.col("n") * F.col("tot"))
                     - (F.col("n") + 1.0) / F.col("n"), 6).alias("gini"))
            .select("event_type", "gini", F.col("n").alias("n_users")))


@register("agg_quantile_sketch_merge", f"""
WITH b AS (
  SELECT event_id % 32 AS bucket,
         list(value ORDER BY value) FILTER (WHERE value IS NOT NULL) AS arr,
         count(value) AS n
  FROM events GROUP BY 1
), p AS (
  SELECT arr[cast(floor((i + 0.5) * n / 16) AS INT) + 1] AS v,
         n / 16.0 AS w
  FROM b, unnest(generate_series(0, 15)) AS g(i)
), c AS (
  SELECT v, w,
         sum(w) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cumw,
         sum(w) OVER () AS total
  FROM p
)
SELECT {sql_rnd("min(CASE WHEN cumw >= 0.5 * total THEN v END)", 6)}
           AS p50_approx,
       {sql_rnd("min(CASE WHEN cumw >= 0.9 * total THEN v END)", 6)}
           AS p90_approx,
       round(max(total))::BIGINT AS total_weight
FROM c
""")
def agg_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable quantile sketch — the KLL/t-digest SHAPE.

    Level 1 (map side): each of 32 deterministic buckets compacts its
    sorted values to 16 uniform-rank points, each carrying weight
    n_bucket/16 — a fixed 256-byte summary per bucket regardless of
    bucket size. Level 2 (merge): the 512 weighted points globally
    sort-merge and the quantile reads off the cumulative weight. At
    100 TB the level-1 compaction is a partial aggregate (no data
    shuffle beyond the sketch bytes) and level 2 merges KBs on one
    reducer — the exact topology sketch libraries (DataSketches KLL)
    run; here the compaction math is plain uniform-rank so BOTH engines
    reproduce it bit-for-bit (weights n/16 are exact binary doubles, so
    cumulative sums carry no float drift). Rank error ≤ 1/16 per bucket
    by construction — pinned in tests against the exact percentile.
    """
    ev = load_table(spark, sf_dir, "events")
    K = 16
    b = (ev.groupBy((F.col("event_id") % 32).alias("bucket"))
         .agg(F.sort_array(F.collect_list("value")).alias("arr"),
              # count the VALUES, not the rows: collect_list skips NULLs,
              # so count(*) would index past the array (NULL sweep)
              F.count("value").alias("n")))
    points = (b.select(
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(K - 1)),
            lambda i: F.element_at(
                F.col("arr"),
                F.floor((i + F.lit(0.5)) * F.col("n") / K).cast("int") + 1)))
        .alias("v"),
        (F.col("n") / F.lit(float(K))).alias("w")))
    cum_w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    all_w = Window.partitionBy()
    c = points.select(
        "v", F.sum("w").over(cum_w).alias("cumw"),
        F.sum("w").over(all_w).alias("total"))
    return c.agg(
        rnd(F.min(F.when(F.col("cumw") >= 0.5 * F.col("total"),
                         F.col("v"))), 6).alias("p50_approx"),
        rnd(F.min(F.when(F.col("cumw") >= 0.9 * F.col("total"),
                         F.col("v"))), 6).alias("p90_approx"),
        F.round(F.max("total")).cast("long").alias("total_weight"))


_CMS_PARAMS = [(0, 31337, 71), (1, 27644437, 131), (2, 97, 12289)]
_CMS_P = 2147483647
_CMS_W = 64


@register("agg_countmin_sketch", f"""
WITH params(d, a, b) AS (VALUES {", ".join(f"({d}, {a}, {b})" for d, a, b in _CMS_PARAMS)}),
sketch AS (
  SELECT d, ((a * user_id + b) % {_CMS_P}) % {_CMS_W} AS cell,
         count(*) AS cnt
  FROM events, params
  GROUP BY 1, 2
),
probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
est AS (
  SELECT p.user_id, min(s.cnt) AS cms_est
  FROM probes p, params pa
  JOIN sketch s
    ON s.d = pa.d
   AND s.cell = ((pa.a * p.user_id + pa.b) % {_CMS_P}) % {_CMS_W}
  GROUP BY p.user_id
),
exact AS (
  SELECT user_id, count(*) AS exact_cnt FROM events
  WHERE user_id < 5 GROUP BY user_id
)
SELECT e.user_id, x.exact_cnt, e.cms_est,
       CASE WHEN e.cms_est >= x.exact_cnt THEN 1 ELSE 0 END AS never_under
FROM est e JOIN exact x ON e.user_id = x.user_id
""")
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch: mergeable frequency estimation in 3×64 cells.

    Each event increments one cell per hash row ((a·k+b) mod p mod w —
    portable integer math, so both engines build the IDENTICAL sketch);
    a point query reads the MIN across rows. The sketch is a partial
    aggregate: per-partition sketches sum cell-wise, so at 100 TB the
    shuffle carries 3×64 longs per task — constant — no matter the key
    cardinality, and sketches from different days/shards merge by
    addition (the same property `agg_hll_partitioned` pins for distinct
    counts). CMS guarantees est ≥ exact (one-sided error) — emitted as
    `never_under` and pinned per probe in the oracle itself.
    """
    ev = load_table(spark, sf_dir, "events")
    params = F.array(*[
        F.struct(F.lit(d).alias("d"), F.lit(a).alias("a"),
                 F.lit(b).alias("b")) for d, a, b in _CMS_PARAMS])
    withd = (ev.select("user_id", F.explode(params).alias("p"))
             .select("user_id", "p.d", "p.a", "p.b"))
    cell = ((F.col("a") * F.col("user_id") + F.col("b")) % _CMS_P) % _CMS_W
    sketch = (withd.select("d", cell.alias("cell"))
              .groupBy("d", "cell").agg(F.count("*").alias("cnt")))
    probes = (ev.filter(F.col("user_id") < 5)
              .select("user_id").distinct()
              .select("user_id", F.explode(params).alias("p"))
              .select("user_id", "p.d", "p.a", "p.b")
              .withColumn("cell", cell))
    est = (probes.join(sketch, ["d", "cell"])
           .groupBy("user_id").agg(F.min("cnt").alias("cms_est")))
    exact = (ev.filter(F.col("user_id") < 5)
             .groupBy("user_id").agg(F.count("*").alias("exact_cnt")))
    return (est.join(exact, "user_id")
            .select("user_id", "exact_cnt", "cms_est",
                    F.when(F.col("cms_est") >= F.col("exact_cnt"), 1)
                    .otherwise(0).alias("never_under")))


@register("agg_ttest_welch", f"""
WITH g AS (
  SELECT event_type,
         count(*)::DOUBLE AS n,
         avg(value) AS m,
         var_samp(value) AS v
  FROM events
  WHERE event_type IN ('purchase', 'click')
  GROUP BY event_type
), w AS (
  SELECT
    (SELECT m FROM g WHERE event_type = 'purchase')
      - (SELECT m FROM g WHERE event_type = 'click') AS mean_diff,
    (SELECT v / n FROM g WHERE event_type = 'purchase')
      + (SELECT v / n FROM g WHERE event_type = 'click') AS se2,
    (SELECT v / n FROM g WHERE event_type = 'purchase') AS a,
    (SELECT v / n FROM g WHERE event_type = 'click') AS b,
    (SELECT n FROM g WHERE event_type = 'purchase') AS na,
    (SELECT n FROM g WHERE event_type = 'click') AS nb
)
SELECT {sql_rnd('mean_diff / sqrt(se2)', 6)} AS t_stat,
       {sql_rnd('(a + b) * (a + b) / (a * a / (na - 1.0)'
                ' + b * b / (nb - 1.0))', 6)} AS welch_dof
FROM w
""")
def agg_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event populations —
    the A/B significance readout, computed as pure aggregates.

    Per-group (n, mean, var_samp) come from ONE grouped pass (partial
    aggregation, constant shuffle); the t statistic and
    Welch–Satterthwaite dof are scalar arithmetic on the two group
    rows, so at 100 TB this costs exactly one scan regardless of group
    sizes. Both engines evaluate the same IEEE expression tree on the
    same group moments — hash-exact at 6dp.
    """
    ev = load_table(spark, sf_dir, "events")
    # conditional aggregation: BOTH groups' moments from one grouped-
    # less pass (a per-group groupBy + two filtered branches re-planned
    # the scan 4x — same trap as ingest_dq_suite, plan-asserted fixed)
    isp = F.when(F.col("event_type") == "purchase", F.col("value"))
    isc = F.when(F.col("event_type") == "click", F.col("value"))
    w = (ev.filter(F.col("event_type").isin("purchase", "click"))
         .agg(F.count(isp).cast("double").alias("na"),
              F.avg(isp).alias("ma"),
              F.var_samp(isp).alias("va"),
              F.count(isc).cast("double").alias("nb"),
              F.avg(isc).alias("mb"),
              F.var_samp(isc).alias("vb"))
         .select("na", "ma", "nb", "mb",
                 (F.col("va") / F.col("na")).alias("a"),
                 (F.col("vb") / F.col("nb")).alias("b")))
    se2 = F.col("a") + F.col("b")
    dof = (se2 * se2) / (F.col("a") * F.col("a") / (F.col("na") - 1.0)
                         + F.col("b") * F.col("b") / (F.col("nb") - 1.0))
    return w.select(
        rnd((F.col("ma") - F.col("mb")) / F.sqrt(se2), 6).alias("t_stat"),
        rnd(dof, 6).alias("welch_dof"))


#: shared fixed-IEEE combine for the OLS trend line (same discipline as
#: _CORR_SQL): x = epoch SECONDS (exact int), y = value micro-units
#: (exact int); the combine unscales to value-per-DAY / value at the
#: end. Engine-native regr_* aggregates accumulate doubles and their
#: intercept extrapolates to epoch 0 (magnitude ~4e5), so 6dp parity
#: needs ~1e-12 relative agreement — the adversarial sweep caught a
#: 3-row group one ulp apart. Guards: NULL when x has no variance, and
#: r2 NULL when y has none (matching regr_r2's NULL on zero variance).
_REGR_DEN = "(np * sxx - sx * sx)"
_REGR_NUM = "(np * svx - sx * sv)"
_REGR_SLOPE_SQL = (f"CASE WHEN np >= 2 AND {_REGR_DEN} > 0 THEN "
                   + _rnd_sql_dbl(f"{_REGR_NUM} / {_REGR_DEN}"
                                  " * 86400.0 / 1e6", 6)
                   + " END")
_REGR_ICEPT_SQL = (f"CASE WHEN np >= 2 AND {_REGR_DEN} > 0 THEN "
                   + _rnd_sql_dbl(
                       f"(sv - {_REGR_NUM} / {_REGR_DEN} * sx) / np / 1e6", 6)
                   + " END")
_REGR_R2_SQL = (f"CASE WHEN np >= 2 AND {_REGR_DEN} > 0"
                " AND (np * svv - sv * sv) > 0 THEN "
                + _rnd_sql_dbl(f"{_REGR_NUM} * {_REGR_NUM}"
                               f" / ({_REGR_DEN} * (np * svv - sv * sv))", 6)
                + " END")


@register("agg_regression", f"""
WITH p AS (
  SELECT event_type,
         CAST(epoch_us(ts::TIMESTAMP) // 1000000 AS BIGINT) AS xs,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
  FROM events
), m AS (
  -- exact integer moments over valid (x, y) pairs (DuckDB sums promote
  -- to HUGEINT; the Spark twin sums DECIMAL) cast once to DOUBLE
  SELECT event_type,
         count(*) AS n,
         CAST(count(CASE WHEN xs IS NOT NULL AND v6 IS NOT NULL
                         THEN 1 END) AS DOUBLE) AS np,
         CAST(sum(CASE WHEN v6 IS NOT NULL THEN xs END) AS DOUBLE) AS sx,
         CAST(sum(CASE WHEN xs IS NOT NULL THEN v6 END) AS DOUBLE) AS sv,
         -- HUGEINT casts BEFORE the multiply: xs·v6 and v6² exceed
         -- int64 at edge magnitudes and DuckDB (like Spark) errors on
         -- bigint multiplication overflow rather than promoting
         CAST(sum(CASE WHEN v6 IS NOT NULL
                       THEN CAST(xs AS HUGEINT) * xs END) AS DOUBLE) AS sxx,
         CAST(sum(CAST(xs AS HUGEINT) * v6) AS DOUBLE) AS svx,
         CAST(sum(CASE WHEN xs IS NOT NULL
                       THEN CAST(v6 AS HUGEINT) * v6 END) AS DOUBLE) AS svv
  FROM p GROUP BY event_type
)
SELECT event_type, n,
       {_REGR_SLOPE_SQL} AS slope_per_day,
       {_REGR_ICEPT_SQL} AS intercept,
       {_REGR_R2_SQL} AS r2
FROM m
""")
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend line: value regressed on time, reported as
    slope per DAY plus intercept and R².

    Moments are exact integers — x in epoch seconds, y in micro-units
    (floor(value·1e6 + 0.5), documented 5e-7 quantization) — summed
    exactly (Spark DECIMAL partials, DuckDB HUGEINT), so both engines
    feed bit-identical doubles into the shared _REGR_*_SQL combine
    strings and the 6dp rounding cannot land on different sides of a
    boundary. Still one shuffle of constant-size moment tuples per
    group, the same 100 TB shape as `agg_stats`; drift detection over
    ingest time is the curator use.
    """
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    xs = F.expr("unix_micros(ts) div 1000000")
    v6 = F.floor(F.col("value") * 1e6 + 0.5).cast("long")
    p = ev.select("event_type", xs.alias("xs"), v6.alias("v6"))
    both = F.col("xs").isNotNull() & F.col("v6").isNotNull()
    m = (p.groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.count(F.when(both, 1)).cast("double").alias("np"),
              F.sum(F.when(F.col("v6").isNotNull(), F.col("xs")))
              .cast("double").alias("sx"),
              F.sum(F.when(F.col("xs").isNotNull(), F.col("v6")))
              .cast("double").alias("sv"),
              F.sum(F.when(F.col("v6").isNotNull(),
                           F.col("xs").cast(dec) * F.col("xs").cast(dec)))
              .cast("double").alias("sxx"),
              F.sum(F.col("xs").cast(dec) * F.col("v6").cast(dec))
              .cast("double").alias("svx"),
              F.sum(F.when(F.col("xs").isNotNull(),
                           F.col("v6").cast(dec) * F.col("v6").cast(dec)))
              .cast("double").alias("svv")))
    return m.select("event_type", "n",
                    F.expr(_REGR_SLOPE_SQL).alias("slope_per_day"),
                    F.expr(_REGR_ICEPT_SQL).alias("intercept"),
                    F.expr(_REGR_R2_SQL).alias("r2"))


@register("agg_bitmap_distinct", """
WITH b AS (
  SELECT event_type,
         user_id // 63 AS chunk,
         bit_or((1::BIGINT) << (user_id % 63)) AS bm
  FROM events GROUP BY 1, 2
)
SELECT event_type, sum(bit_count(bm))::BIGINT AS n_users
FROM b GROUP BY event_type
""")
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via chunked bitmaps — the roaring-bitmap
    pattern in pure SQL.

    Each 63-ID chunk of the key domain (63, not 64 — DuckDB's signed
    left-shift rejects the sign bit) collapses to one long via
    bit_or (a partial aggregate: task-local bitmaps OR together, so the
    shuffle carries fixed-width longs, not IDs); popcounts then sum per
    group. Unlike count(DISTINCT) — whose expand+exchange moves every
    distinct key — the bitmap shuffle is O(domain/64) per group and the
    merge is associative, so per-day bitmaps roll up to month/year
    without rescanning (the same mergeability as `agg_hll_partitioned`,
    but EXACT, for the dense-int-key case where bitmaps beat sketches).
    """
    ev = load_table(spark, sf_dir, "events")
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
    b = (ev.groupBy("event_type",
                    F.expr("user_id div 63").alias("chunk"))
         .agg(F.bit_or(bit).alias("bm")))
    return (b.groupBy("event_type")
            .agg(F.sum(F.bit_count("bm")).alias("n_users")))


@register("agg_histogram_equidepth", f"""
WITH t AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT bucket,
       count(*) AS n,
       {sql_rnd('min(o_totalprice)')} AS lo,
       {sql_rnd('max(o_totalprice)')} AS hi
FROM t GROUP BY bucket
""", twin_of="agg_histogram_sketch_bins")
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 buckets of equal row count) — the
    histogram cost-based optimizers and skew diagnostics actually use,
    beside the equi-width `agg_histogram`: equal-width buckets go
    empty under skew; equal-depth buckets adapt their boundaries to
    the distribution.

    ntile's global ORDER BY is the honest cost: a total sort (with the
    orderkey tie-break pinning bucket assignment exactly). At 100 TB
    the production form replaces the sort with the mergeable quantile
    sketch (`agg_quantile_sketch_merge`) providing approximate bucket
    BOUNDARIES, then one map-only pass bins rows — sketch + scan, no
    sort; this operator is the exact-reference version of that.
    """
    # histogram of a VALUE: null prices are excluded on both engines
    # (the engines' null sort order disagrees, so leaving them in
    # shifts every bucket boundary — r7 null sweep)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull())
    w = Window.orderBy("o_totalprice", "o_orderkey")
    t = o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
    return (t.groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 rnd(F.min("o_totalprice")).alias("lo"),
                 rnd(F.max("o_totalprice")).alias("hi")))


@register("agg_market_basket", f"""
WITH pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, a.l_orderkey
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), together AS (
  SELECT p1, p2, count(DISTINCT l_orderkey) AS n_together
  FROM pairs GROUP BY 1, 2
), item AS (
  SELECT l_partkey, count(DISTINCT l_orderkey) AS n_item
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT count(DISTINCT l_orderkey)::DOUBLE AS n_orders FROM lineitem
)
SELECT p1, p2, n_together,
       {sql_rnd('n_together::DOUBLE / (SELECT n_orders FROM tot)', 6)}
           AS support,
       {sql_rnd('n_together::DOUBLE / i1.n_item', 6)} AS confidence,
       {sql_rnd('n_together::DOUBLE * (SELECT n_orders FROM tot)'
                ' / (i1.n_item * i2.n_item)', 6)} AS lift
FROM together
JOIN item i1 ON p1 = i1.l_partkey
JOIN item i2 ON p2 = i2.l_partkey
ORDER BY n_together DESC, p1, p2
LIMIT 20
""")
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association pairs: support, confidence(p1→p2),
    lift for the top-20 co-purchased part pairs — the frequent-itemset
    readout (the k=2 slice of Apriori, which is where most production
    affinity analyses stop).

    The pair expansion is a SELF-JOIN ON THE ORDER KEY, so its blowup
    is (lines per order choose 2) — bounded by the basket size (≤7
    here), NOT the catalog; the same join on l_partkey would be the
    quadratic mistake. At 100 TB add a min-support pre-filter on items
    (the Apriori pruning) before the self-join so rare items never
    expand. Tie-break (p1, p2) pins the top-20 exactly.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok2"),
                  F.col("l_partkey").alias("p2"))
    pairs = a.join(b, (a.l_orderkey == b.ok2) & (a.p1 < b.p2))
    together = (pairs.groupBy("p1", "p2")
                .agg(F.countDistinct("l_orderkey").alias("n_together")))
    item = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("n_item"))
    tot = li.agg(F.countDistinct("l_orderkey").cast("double")
                 .alias("n_orders"))
    i1 = item.select(F.col("l_partkey").alias("p1"),
                     F.col("n_item").alias("n1"))
    i2 = item.select(F.col("l_partkey").alias("p2"),
                     F.col("n_item").alias("n2"))
    out = (together.join(i1, "p1").join(i2, "p2")
           .crossJoin(F.broadcast(tot)))
    return (out.select(
        "p1", "p2", "n_together",
        rnd(F.col("n_together").cast("double") / F.col("n_orders"), 6)
        .alias("support"),
        rnd(F.col("n_together").cast("double") / F.col("n1"), 6)
        .alias("confidence"),
        rnd(F.col("n_together").cast("double") * F.col("n_orders")
            / (F.col("n1") * F.col("n2")), 6).alias("lift"))
        .orderBy(F.col("n_together").desc(), "p1", "p2")
        .limit(20))


@register("agg_mad_outliers", f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, abs(e.value - med.m) AS ad, med.m
  FROM events e JOIN med ON e.event_type = med.event_type
), mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad_v, max(m) AS m
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       count(*) FILTER (d.ad > 3.0 * 1.4826 * mad.mad_v) AS n_outliers,
       count(*) AS n_total,
       {sql_rnd('max(mad.mad_v)', 6)} AS mad,
       {sql_rnd('max(mad.m)', 6)} AS median
FROM dev d JOIN mad ON d.event_type = mad.event_type
GROUP BY d.event_type
""")
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by Median Absolute Deviation: flag
    |x − median| > 3·1.4826·MAD per group — the robust twin of
    `win_zscore_outliers`, immune to the outliers inflating their own
    threshold (mean/stddev's classic failure, why quality pipelines
    use MAD for heavy-tailed web data).

    Two grouped percentile passes (median, then MAD) + one counting
    pass, each a partial-aggregated shuffle on the group key; the
    medians are dim-sized and broadcast back. Exact interpolated
    percentile parity across engines was established by
    `agg_percentile`; 1.4826 is the normal-consistency constant making
    MAD comparable to σ.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("m"))
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type", F.abs(F.col("value") - F.col("m"))
                   .alias("ad"), "m"))
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5D)").alias("mad_v"), F.max("m").alias("m"))
    d = dev.join(F.broadcast(mad.select("event_type", "mad_v")),
                 "event_type")
    return (d.groupBy("event_type")
            .agg(F.count(F.when(F.col("ad") > 3.0 * 1.4826 * F.col("mad_v"),
                                1)).alias("n_outliers"),
                 F.count("*").alias("n_total"),
                 rnd(F.max("mad_v"), 6).alias("mad"),
                 rnd(F.max("m"), 6).alias("median")))


@register("agg_histogram_sketch_bins", f"""
WITH b AS (
  SELECT o_orderkey % 32 AS bucket,
         list(o_totalprice ORDER BY o_totalprice)
             FILTER (WHERE o_totalprice IS NOT NULL) AS arr,
         count(o_totalprice) AS n
  FROM orders GROUP BY 1
), p AS (
  SELECT arr[cast(floor((i + 0.5) * n / 16) AS INT) + 1] AS v,
         n / 16.0 AS w
  FROM b, unnest(generate_series(0, 15)) AS g(i)
), c AS (
  SELECT v, w,
         sum(w) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cumw,
         sum(w) OVER () AS total
  FROM p
), bounds AS (
  SELECT d AS decile,
         min(CASE WHEN cumw >= d * 0.1 * total THEN v END) AS cut
  FROM c, unnest(generate_series(1, 9)) AS dd(d)
  GROUP BY d
)
SELECT (SELECT count(*) FROM bounds WHERE cut <= o.o_totalprice) + 1
           AS bin,
       count(*) AS n,
       {sql_rnd('min(o_totalprice)')} AS lo,
       {sql_rnd('max(o_totalprice)')} AS hi
FROM orders o GROUP BY 1
""")
def agg_histogram_sketch_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate equi-depth histogram WITHOUT the global sort — the
    100 TB form `agg_histogram_equidepth`'s docstring promises, now
    registered and measured: decile BOUNDARIES come from the mergeable
    quantile sketch (`agg_quantile_sketch_merge`'s level-1/level-2
    compaction), then one MAP-ONLY pass bins every row against the
    broadcast 9-cut array. Bin populations are approximate (rank error
    ≤ 1/16 per bucket moves boundary rows between adjacent bins) but
    boundaries are deterministic in both engines, so the result is
    hash-exact. Sort cost: gone — the measured 2× growth of the exact
    ntile form becomes a scan.
    """
    o = load_table(spark, sf_dir, "orders")
    K = 16
    b = (o.groupBy((F.col("o_orderkey") % 32).alias("bucket"))
         .agg(F.sort_array(F.collect_list("o_totalprice")).alias("arr"),
              F.count("o_totalprice").alias("n")))  # NULLs skipped by collect_list
    points = (b.select(
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(K - 1)),
            lambda i: F.element_at(
                F.col("arr"),
                F.floor((i + F.lit(0.5)) * F.col("n") / K).cast("int") + 1)))
        .alias("v"), (F.col("n") / F.lit(float(K))).alias("w")))
    cum_w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    all_w = Window.partitionBy()
    c = points.select("v", F.sum("w").over(cum_w).alias("cumw"),
                      F.sum("w").over(all_w).alias("total"))
    cuts = (c.crossJoin(F.broadcast(
        spark.range(1, 10).select(F.col("id").alias("d"))))
        .groupBy("d")
        .agg(F.min(F.when(F.col("cumw") >= F.col("d") * 0.1 * F.col("total"),
                          F.col("v"))).alias("cut")))
    cut_arr = cuts.agg(F.sort_array(F.collect_list("cut")).alias("cs"))
    binned = (o.crossJoin(F.broadcast(cut_arr))
              .select("o_totalprice",
                      (F.size(F.filter(
                          F.col("cs"),
                          lambda cv: cv <= F.col("o_totalprice"))) + 1)
                      .alias("bin")))
    return (binned.groupBy("bin")
            .agg(F.count("*").alias("n"),
                 rnd(F.min("o_totalprice")).alias("lo"),
                 rnd(F.max("o_totalprice")).alias("hi")))


@register("agg_percentile_disc", f"""
SELECT o_orderstatus,
       {sql_rnd('quantile_disc(o_totalprice, 0.5)')} AS p50_disc,
       {sql_rnd('quantile_disc(o_totalprice, 0.9)')} AS p90_disc
FROM orders
GROUP BY o_orderstatus
""")
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (an actual data value, never interpolated)
    beside the continuous `agg_percentile`: the distinction matters
    whenever the value must exist (a real order to inspect, a real
    latency trace to pull) — interpolation invents numbers. Parity
    note: Spark `percentile_disc`/DuckDB `quantile_disc` both return
    the smallest value whose cumulative rank ≥ p; verified identical
    here with no rounding dependence (the values are 2-decimal data).
    """
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(rnd(F.expr("percentile_disc(0.5) WITHIN GROUP"
                            " (ORDER BY o_totalprice)")).alias("p50_disc"),
                 rnd(F.expr("percentile_disc(0.9) WITHIN GROUP"
                            " (ORDER BY o_totalprice)")).alias("p90_disc")))


@register("agg_winsorized_stats", f"""
WITH cuts AS (
  SELECT l_returnflag AS g,
         quantile_disc(l_extendedprice, 0.05) AS lo,
         quantile_disc(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1
), clipped AS (
  SELECT c.g, c.lo, c.hi,
         least(greatest(l_extendedprice, c.lo), c.hi) AS x
  FROM lineitem JOIN cuts c ON l_returnflag = c.g
)
SELECT g AS l_returnflag,
       count(*) AS n,
       {sql_rnd(sql_rnd('sum(x)') + ' / count(*)')} AS wins_mean,
       {sql_rnd('stddev_pop(x)', 4)} AS wins_std,
       {sql_rnd('lo')} AS p05,
       {sql_rnd('hi')} AS p95
FROM clipped
GROUP BY g, lo, hi
""")
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per group: clip values to the
    [p05, p95] DISCRETE percentiles (real data values — both engines
    agree exactly, no interpolation), then mean/std of the clipped
    column. The outlier-robust summary a data-quality dashboard wants
    where plain avg/std is hostage to a single corrupt row.

    Determinism: the cut points are exact data values; the winsorized
    mean derives from the 2dp-ROUNDED sum (PARITY.md #23 discipline —
    one exact division after), and the std rounds at 4dp, ~4 orders of
    magnitude above cross-engine summation drift.

    100 TB: one shuffle on the group key for the percentile pass (a
    sort-based exact quantile per group; for wider cardinality the
    sketch path `agg_quantile_sketch_merge` is the pre-pass), then the
    clip+moment pass re-uses the same distribution — the cuts table is
    group-cardinality and broadcasts.
    """
    # fan_out (r12): percentile_disc buffers every value in its agg
    # state — the partial-agg pass is the heavy half, and the single-
    # row-group lineitem scan ran it one-task (sweep: 2.9 s warm).
    # Both branches (cuts + clip) read the same round-robin exchange,
    # which ReuseExchange shares; scale guard per io.fan_out.
    from manual_data_ingest_spark.io import fan_out

    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    cuts = (li.groupBy(F.col("l_returnflag").alias("g"))
            .agg(F.expr("percentile_disc(0.05) WITHIN GROUP"
                        " (ORDER BY l_extendedprice)").alias("lo"),
                 F.expr("percentile_disc(0.95) WITHIN GROUP"
                        " (ORDER BY l_extendedprice)").alias("hi")))
    x = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")),
                F.col("hi"))
    return (li.join(F.broadcast(cuts), F.col("l_returnflag") == F.col("g"))
            .select("g", "lo", "hi", x.alias("x"))
            .groupBy("g", "lo", "hi")
            .agg(F.count("*").alias("n"),
                 rnd(rnd(F.sum("x")) / F.count("*")).alias("wins_mean"),
                 rnd(F.stddev_pop("x"), 4).alias("wins_std"))
            .select(F.col("g").alias("l_returnflag"), "n", "wins_mean",
                    "wins_std", rnd(F.col("lo")).alias("p05"),
                    rnd(F.col("hi")).alias("p95")))


#: log10(1 + 1/d) as exact double LITERALS shared by both engine texts —
#: computing them with log() at query time would expose the engines'
#: non-correctly-rounded libm/Math.log differences on boundary values
_BENFORD = {1: 0.3010299956639812, 2: 0.17609125905568124,
            3: 0.12493873660829992, 4: 0.09691001300805642,
            5: 0.07918124604762482, 6: 0.06694678963061322,
            7: 0.05799194697768673, 8: 0.05115252244738129,
            9: 0.04575749056067514}

_BENFORD_CASE = ("CASE first_digit " + " ".join(
    f"WHEN {d} THEN CAST({p!r} AS DOUBLE)" for d, p in _BENFORD.items())
    + " END")


@register("agg_benford_deviation", f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS first_digit
  FROM orders
  WHERE o_totalprice > 0
), counts AS (
  SELECT first_digit, count(*) AS n,
         sum(count(*)) OVER () AS total
  FROM digits GROUP BY first_digit
)
SELECT first_digit, n,
       floor(CAST(n AS DOUBLE) / total * 1000000.0 + 0.5) / 1000000.0
           AS obs_share,
       {_BENFORD_CASE} AS exp_share,
       floor((CAST(n AS DOUBLE) / total - {_BENFORD_CASE})
             * (CAST(n AS DOUBLE) / total - {_BENFORD_CASE})
             / ({_BENFORD_CASE}) * 1000000000.0 + 0.5) / 1000000000.0
           AS chi2_term
FROM counts
""")
def agg_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / corrupted-feed detector: natural multi-scale
    amounts follow P(d)=log10(1+1/d); a flat or spiked digit histogram
    flags synthetic or truncated data. Emits per-digit observed vs
    expected share and the χ² contribution.

    Determinism: the first digit is extracted ARITHMETICALLY — exact
    integer cents → string → first char — never via log10/floor, whose
    not-correctly-rounded libm vs Java Math implementations can
    disagree exactly on power-of-ten boundaries (1000.00 → log10 →
    2.9999999999999996 → floor → 2). The expected shares are shared
    double literals, and every emitted ratio is an exact-int quotient
    rounded once.

    100 TB: map-only digit extraction + a 9-group aggregate with
    partials; the window total is 9 rows. The audit reads one column.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(F.floor(F.col("o_totalprice") * 100.0 + 0.5)
                    .cast("long").cast("string"), 1, 1)
        .cast("int").alias("first_digit"))
    counts = (digits.groupBy("first_digit")
              .agg(F.count("*").alias("n"))
              .withColumn("total", F.sum("n").over(Window.partitionBy())))
    obs = F.col("n").cast("double") / F.col("total")
    exp = F.expr(_BENFORD_CASE)
    return counts.select(
        "first_digit", "n",
        rnd(obs, 6).alias("obs_share"),
        exp.alias("exp_share"),
        rnd((obs - exp) * (obs - exp) / exp, 9).alias("chi2_term"))


@register("agg_percentile_weighted", """
WITH d AS (
    SELECT l_returnflag AS rf, l_extendedprice AS price,
           l_quantity::BIGINT AS wt, l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
), c AS (
    SELECT rf, price,
           sum(wt) OVER (PARTITION BY rf
                         ORDER BY price, l_orderkey, l_linenumber
                         ROWS UNBOUNDED PRECEDING) AS cum,
           sum(wt) OVER (PARTITION BY rf) AS tot
    FROM d
)
SELECT rf AS l_returnflag,
       round(min(CASE WHEN cum * 2 >= tot THEN price END), 2) AS p50_w,
       round(min(CASE WHEN cum * 10 >= tot * 9 THEN price END), 2) AS p90_w
FROM c GROUP BY rf
""")
def agg_percentile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles (quantity-weighted price p50/p90 per return
    flag) — the pricing/inventory primitive Spark has no built-in for
    (``percentile_approx`` is unweighted; ML feature pipelines and
    revenue analytics both need the weighted form).

    Lower weighted quantile: the smallest value whose cumulative integer
    weight reaches q·total. Computed BINNED TWO-PHASE — the naive form
    (one running-sum window partitioned by the 3-value group key) was
    measured 10× SUPERLINEAR at 16× data because three giant window
    partitions single-thread their sorts. Here:

    1. weights aggregate per (group, price-bin) — a partial-agg shuffle
       on a well-distributed key; bins are fixed-width in exact cents
       (2^17 cents ≈ $1310), so binning is a map-only integer shift;
    2. a window over the BIN table (≤ ~100 rows/group) finds each
       quantile's target bin and its cumulative-weight offset;
    3. only the target bins' rows (~1/n_bins of the data) re-sort in a
       per-(group, quantile) window seeded with the bin's offset — the
       first row crossing the threshold is the exact quantile.

    Same answer as the naive form (the DuckDB oracle IS the naive form —
    hash-equality proves the rewrite), but every sort is bounded by bin
    population. Determinism: BIGINT weights, pure integer threshold
    tests (``cum·2 ≥ tot``, ``cum·10 ≥ 9·tot``), total order ends in the
    unique line key. Measured: 0.86/2.3/8.9 s at 1×/4×/16× naive →
    flat after the rewrite.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull())
    d = li.select(F.col("l_returnflag").alias("rf"),
                  F.col("l_extendedprice").alias("price"),
                  F.col("l_quantity").cast("bigint").alias("wt"),
                  "l_orderkey", "l_linenumber",
                  (F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
                   .cast("long")).alias("pc"))
    d = d.withColumn("bin", F.expr("pc div 131072"))

    # phase 1: per-(group, bin) weight mass — partial-agg shuffle
    b = d.groupBy("rf", "bin").agg(F.sum("wt").alias("bw"))
    w_bins = (Window.partitionBy("rf").orderBy("bin")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    b = (b.withColumn("cumb", F.sum("bw").over(w_bins))
         .withColumn("tot", F.sum("bw").over(Window.partitionBy("rf"))))

    # phase 2: target bin per quantile = first bin whose cumulative
    # crosses the threshold; carry the offset (cum BEFORE the bin)
    def target(num: int, den: int, tag: int):
        first = (b.filter(F.col("cumb") * den >= F.col("tot") * num)
                 .groupBy("rf")
                 .agg(F.min("bin").alias("tbin"))
                 .withColumnRenamed("rf", "t_rf"))
        bb = b.select(F.col("rf").alias("b_rf"), F.col("bin").alias("b_bin"),
                      "bw", "cumb", "tot")
        return (first.join(bb, F.col("t_rf").eqNullSafe(F.col("b_rf"))
                           & (F.col("tbin") == F.col("b_bin")))
                .select(F.col("t_rf").alias("m_rf"),
                        F.col("tbin").alias("m_bin"),
                        (F.col("cumb") - F.col("bw")).alias("off"),
                        "tot", F.lit(num).alias("num"),
                        F.lit(den).alias("den"), F.lit(tag).alias("q")))

    markers = target(1, 2, 50).unionByName(target(9, 10, 90))

    # phase 3: exact scan of ONLY the target bins, offset-seeded
    hits = (d.join(F.broadcast(markers),
                   F.col("rf").eqNullSafe(F.col("m_rf"))
                   & (F.col("bin") == F.col("m_bin")))
            .select("rf", "price", "wt",
                    "l_orderkey", "l_linenumber", "off", "tot",
                    "num", "den", "q"))
    w_in = (Window.partitionBy("rf", "q")
            .orderBy("price", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ans = (hits.withColumn("cum", F.col("off") + F.sum("wt").over(w_in))
           .filter(F.col("cum") * F.col("den") >= F.col("tot") * F.col("num"))
           .groupBy("rf", "q").agg(F.min("price").alias("v")))
    return (ans.groupBy(F.col("rf").alias("l_returnflag"))
            .agg(rnd(F.min(F.when(F.col("q") == 50, F.col("v"))), 2)
                 .alias("p50_w"),
                 rnd(F.min(F.when(F.col("q") == 90, F.col("v"))), 2)
                 .alias("p90_w")))


@register("agg_ks_test", """
WITH ev AS (
    SELECT event_type, value FROM events
    WHERE event_type IN ('click', 'purchase')
), per_v AS (
    SELECT value,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS ca,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS cb
    FROM ev GROUP BY value
), tot AS (
    SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM per_v
), cums AS (
    SELECT sum(ca) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_a,
           sum(cb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_b
    FROM per_v
)
SELECT round(max(abs(cum_a * nb - cum_b * na))::DOUBLE
             / (na::DOUBLE * nb::DOUBLE), 6) AS ks_d,
       na AS n_click, nb AS n_purchase
FROM cums, tot
GROUP BY na, nb
""")
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the ``value``
    distributions of click vs purchase events — the standard
    distribution-drift check a data pipeline runs between snapshots or
    A/B arms (D = max |ECDF_a − ECDF_b| over the pooled support).

    Integer-exact inside: D's argmax is taken over
    |cum_a·n_b − cum_b·n_a| (exact integers), with ONE float division at
    the end — so no running-sum float drift can reorder the max (the
    PARITY #12/#21 classes are structurally excluded). r10 scale
    rewrite (r9 verdict task 1): the cumulative counts run through the
    distributed running-sum primitive (both sums share ONE bucketing
    pass over the value-level aggregate), so the support cardinality —
    which grows with the data for a continuous measure — never funnels
    through a single window task; exact integers make the bucket
    reassociation hash-free.
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_exact_running_sum)
    from manual_data_ingest_spark.io import load_events

    ev = (load_events(spark, sf_dir)
          .filter(F.col("event_type").isin("click", "purchase")))
    per_v = (ev.groupBy("value")
             .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).cast("long").alias("ca"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast("long").alias("cb")))
    cums = with_exact_running_sum(per_v, ["ca", "cb"], "value", [],
                                  out_col=["cum_a", "cum_b"])
    tot = cums.agg(F.sum("ca").cast("long").alias("na"),
                   F.sum("cb").cast("long").alias("nb"))
    return (cums.select(F.col("cum_a").cast("long").alias("cum_a"),
                        F.col("cum_b").cast("long").alias("cum_b"))
            .crossJoin(F.broadcast(tot))
            .groupBy("na", "nb")
            .agg(rnd(F.max(F.abs(F.col("cum_a") * F.col("nb")
                                 - F.col("cum_b") * F.col("na")))
                     .cast("double")
                     / (F.col("na").cast("double")
                        * F.col("nb").cast("double")), 6).alias("ks_d"))
            .select("ks_d", F.col("na").alias("n_click"),
                    F.col("nb").alias("n_purchase")))


@register("agg_user_overlap_jaccard", f"""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
            WHERE event_type IS NOT NULL),
sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type),
common AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_common
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
       {sql_rnd('n_common::DOUBLE / (sa.n + sb.n - n_common)', 6)} AS jaccard
FROM common
JOIN sizes sa ON type_a = sa.event_type
JOIN sizes sb ON type_b = sb.event_type
""")
def agg_user_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: |users(a) ∩
    users(b)| / |users(a) ∪ users(b)| for every type pair — the
    segment-overlap matrix every analytics product renders.

    Same inverted-index algebra as `dedup_near_jaccard`, over USERS
    instead of shingles: one distinct pass, a self-join keyed on
    user_id (each user contributes |types(u)| choose 2 pairs — bounded
    by the type-universe, NOT by corpus size), then set sizes join back.
    Exact answer; at 100 TB with a large segment universe the same
    report runs on HLL sketches per segment (`agg_hll_partitioned`'s
    merge property gives |a ∪ b| directly, and inclusion-exclusion the
    intersection) — the pair-expansion shape is unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    ut = (ev.filter(F.col("event_type").isNotNull())
          .select("user_id", "event_type").distinct())
    sizes = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    common = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                     & (F.col("a.event_type") < F.col("b.event_type")))
              .groupBy(F.col("a.event_type").alias("type_a"),
                       F.col("b.event_type").alias("type_b"))
              .agg(F.count("*").alias("n_common")))
    jac = (F.col("n_common").cast("double")
           / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")))
    return (common
            .join(F.broadcast(sizes.alias("sa")),
                  F.col("type_a") == F.col("sa.event_type"))
            .join(F.broadcast(sizes.alias("sb")),
                  F.col("type_b") == F.col("sb.event_type"))
            .select("type_a", "type_b",
                    F.col("sa.n").alias("n_a"), F.col("sb.n").alias("n_b"),
                    "n_common", rnd(jac, 6).alias("jaccard")))


#: Carter-Wegman affine MinHash family for audience sketches — the
#: §2.14 md5 contract (`dedup_minhash_band_tune`'s): one portable md5
#: base per user, k affine rehashes in pure int64 (A[i]·(P−1)+B[i] <
#: 2^63). 32 components: se(est) = sqrt(J(1−J)/32) ≈ 0.09 worst-case.
_OVL_K = 32
_OVL_P = 2_147_483_647
_OVL_A = tuple(2 * k + 1 for k in range(1, _OVL_K + 1))
_OVL_B = tuple(k * 40_503 for k in range(_OVL_K))
_OVL_BASE_DUCK = (f"(('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT"
                  f" % {_OVL_P})")
_OVL_SIG_DUCK = ", ".join(
    f"min(({_OVL_A[i]} * {_OVL_BASE_DUCK} + {_OVL_B[i]}) % {_OVL_P})"
    f" AS s{i}" for i in range(_OVL_K))
_OVL_EQ = " + ".join(f"(sa.s{i} = sb.s{i})::INT" for i in range(_OVL_K))


@register("agg_overlap_minhash", f"""
WITH sig AS (
    SELECT event_type, {_OVL_SIG_DUCK}
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    GROUP BY event_type
)
SELECT sa.event_type AS type_a, sb.event_type AS type_b,
       ({_OVL_EQ})::BIGINT AS sig_matches,
       {sql_rnd(f'({_OVL_EQ}) / {_OVL_K}.0', 4)} AS est_jaccard
FROM sig sa JOIN sig sb ON sa.event_type < sb.event_type
""")
def agg_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS sketch twin of `agg_user_overlap_jaccard`: the pairwise
    audience-overlap matrix estimated from per-segment MinHash
    signatures instead of the exact user-level self-join. min() is
    idempotent over duplicates, so the sketch needs NO distinct pass —
    the fact contributes one map-side-combinable groupBy(event_type)
    carrying 32 mins; the pair comparison then runs over |segments|²
    signature rows (25 here), never over users. That is the shape the
    exact op's docstring promises at 100 TB, delivered: the exact twin
    expands |types(u)|² pairs per user through a shuffle; the sketch
    shuffles 5 rows.

    Cross-engine exactness: the §2.14 md5 + Carter-Wegman contract —
    signatures are pure int64 arithmetic over a portable md5 base, so
    DuckDB reproduces them bit-for-bit; est = matches/32 is a DYADIC
    fraction (exact in binary, 4dp rounding can never straddle).
    Calibration vs the exact op (max |est − exact| ≤ 0.25 per pair at
    every fixture SF) is pinned in tests/test_recall.py.
    """
    ev = load_table(spark, sf_dir, "events")
    hb = (F.expr("cast(conv(substring(md5(cast(user_id as string)), 1, 15),"
                 " 16, 10) as bigint)") % F.lit(_OVL_P)).alias("hb")
    hs = (ev.filter(F.col("event_type").isNotNull()
                    & F.col("user_id").isNotNull())
          .select("event_type", hb))
    sig = hs.groupBy("event_type").agg(*[
        F.min((F.lit(_OVL_A[i]) * F.col("hb") + F.lit(_OVL_B[i]))
              % F.lit(_OVL_P)).alias(f"s{i}")
        for i in range(_OVL_K)])
    # both pair sides read the signature table: materialize the 5-row
    # state once (the graph/PQ amortization rule) so the fact is
    # scanned exactly ONCE — without this the self-join re-runs the
    # whole events pass on each side (plan-asserted)
    sig = sig.localCheckpoint(eager=True)
    sa = sig.select(F.col("event_type").alias("type_a"),
                    *[F.col(f"s{i}").alias(f"a{i}") for i in range(_OVL_K)])
    sb = sig.select(F.col("event_type").alias("type_b"),
                    *[F.col(f"s{i}").alias(f"b{i}") for i in range(_OVL_K)])
    matches = sum((F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
                  for i in range(_OVL_K))
    return (sa.join(sb, F.col("type_a") < F.col("type_b"))
            .select("type_a", "type_b",
                    matches.cast("long").alias("sig_matches"),
                    rnd(matches / float(_OVL_K), 4).alias("est_jaccard")))


@register("agg_time_decay_score", f"""
WITH mx AS (SELECT max(ts) AS anchor FROM events)
SELECT user_id,
       count(*) AS n_events,
       {sql_rnd("sum(value * exp(-(date_diff('second', ts,"
                " (SELECT anchor FROM mx)) / 86400.0) / 30.0))", 6)}
           AS decayed_score
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""")
def agg_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score: Σ value · exp(−age/30 d) per
    user, aged against the corpus max timestamp (pure function of the
    data — never wall-clock now(), which is untestable and makes
    backfills non-reproducible).

    The standard exponential-decay feature for churn/LTV models. Weight
    computation is map-side codegen (no UDF); one partial-agg shuffle
    on user_id. The incremental-maintenance property that matters at
    100 TB: an exp-decay score ages multiplicatively, so yesterday's
    aggregate re-anchors by one multiply instead of a rescan —
    `ingest_incremental_agg` shows that update pattern.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("anchor"))
    age_days = (F.col("anchor").cast("long") - F.col("ts").cast("long")) / 86400.0
    return (ev.filter(F.col("value").isNotNull())
            .crossJoin(F.broadcast(anchor))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 rnd(F.sum(F.col("value") * F.exp(-age_days / 30.0)), 6)
                 .alias("decayed_score")))


@register("agg_activity_heatmap", f"""
SELECT dayofweek(ts) + 1 AS dow,
       hour(ts) AS hod,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       {sql_rnd('sum(value)', 2)} AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY dayofweek(ts), hour(ts)
""")
def agg_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap: events, distinct
    users, and value per calendar cell — the seasonality readout behind
    every ops dashboard and the capacity-planning input for ingest.

    One grouped pass; the (dow, hod) key space is ≤ 168 cells, so the
    shuffle carries partial aggregates bounded by cells×tasks no matter
    the corpus size (distinct-user is the only term that scales — at
    100 TB it swaps for the HLL sketch, `agg_hll_partitioned`'s merge).
    Dialect trap: Spark dayofweek is Sunday=1..7 while DuckDB's is
    Sunday=0..6 — the oracle shifts +1; both read the same UTC session
    rendering (PARITY: session timeZone pinned).
    """
    ev = load_table(spark, sf_dir, "events")
    return (ev.filter(F.col("ts").isNotNull())
            .groupBy(F.dayofweek("ts").alias("dow"),
                     F.hour("ts").alias("hod"))
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 rnd(F.sum("value"), 2).alias("sum_value")))


@register("agg_theil_index", f"""
WITH pos AS (
  SELECT c_nationkey, c_acctbal FROM customer WHERE c_acctbal > 0
), mu AS (
  SELECT c_nationkey, avg(c_acctbal) AS mu, count(*) AS n
  FROM pos GROUP BY c_nationkey
)
SELECT n_name,
       {sql_rnd('sum((c_acctbal / mu) * ln(c_acctbal / mu)) / n', 6)}
           AS theil_t,
       n AS n_customers
FROM pos
JOIN mu USING (c_nationkey)
JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name, n
""")
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of positive account balances per nation
    — the decomposable inequality measure (0 = perfect equality,
    ln(n) = one customer holds everything) economists prefer over Gini
    when indices must aggregate across subgroups.

    T = (1/n) Σ (x/μ)·ln(x/μ). Two passes over the same c_nationkey
    distribution (mean, then the ln sum), so ONE shuffle key reused;
    the nation join is a 25-row broadcast. ln appears only inside a
    6dp-rounded sum of O(n) bounded terms (PARITY #31 discipline —
    never a raw threshold). Negative/zero balances are excluded up
    front, which also keeps ln's domain safe in ANSI mode.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    n = load_table(spark, sf_dir, "nation")
    mu = (c.groupBy("c_nationkey")
          .agg(F.avg("c_acctbal").alias("mu"), F.count("*").alias("n")))
    ratio = F.col("c_acctbal") / F.col("mu")
    return (c.join(mu, "c_nationkey")
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name", "n")
            .agg(rnd(F.sum(ratio * F.log(ratio)) / F.first("n"), 6)
                 .alias("theil_t"))
            .select("n_name", "theil_t", F.col("n").alias("n_customers")))


@register("agg_apdex", f"""
SELECT event_type,
       count(*) AS n,
       count(CASE WHEN value <= 10.0 THEN 1 END) AS n_satisfied,
       count(CASE WHEN value > 10.0 AND value <= 40.0 THEN 1 END)
           AS n_tolerating,
       {sql_rnd('(count(CASE WHEN value <= 10.0 THEN 1 END)::DOUBLE'
                ' + count(CASE WHEN value > 10.0 AND value <= 40.0'
                ' THEN 1 END)::DOUBLE / 2.0) / count(*)::DOUBLE', 6)}
           AS apdex
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
""")
def agg_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex score per event_type (target T=10, tolerating ≤ 4T): the
    SLO headline metric — (satisfied + tolerating/2) / total — that
    compresses a latency distribution into one number operators can
    alert on.

    Pure conditional aggregation: one grouped pass, three counters per
    group riding the same partial-agg shuffle (the ingest_dq_suite
    lesson — never one scan per predicate). NULL values are excluded
    on both engines so the denominator is the measured population.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    sat = F.count(F.when(F.col("value") <= 10.0, 1))
    tol = F.count(F.when((F.col("value") > 10.0) & (F.col("value") <= 40.0), 1))
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 sat.alias("n_satisfied"),
                 tol.alias("n_tolerating"),
                 rnd((sat.cast("double") + tol.cast("double") / 2.0)
                     / F.count("*").cast("double"), 6).alias("apdex")))


@register("agg_dau_wau", f"""
WITH d AS (
  SELECT DISTINCT date_trunc('week', ts)::DATE AS wk,
         ((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000)::BIGINT AS day, user_id
  FROM events WHERE ts IS NOT NULL
), dau AS (
  SELECT wk, day, count(*) AS dau FROM d GROUP BY wk, day
), wau AS (
  SELECT wk, count(DISTINCT user_id) AS wau FROM d GROUP BY wk
)
SELECT dau.wk AS week, count(*) AS n_days,
       {sql_rnd('avg(dau.dau::DOUBLE)', 4)} AS avg_dau,
       wau.wau,
       {sql_rnd('avg(dau.dau::DOUBLE) / wau.wau::DOUBLE', 6)} AS stickiness
FROM dau JOIN wau ON dau.wk = wau.wk
GROUP BY dau.wk, wau.wau
""")
def agg_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per ISO week — the engagement headline (what
    share of the weekly audience shows up on an average day); 0.14 is
    a weekly tool, 1.0 a daily habit. (The monthly variant is the same
    plan with month truncation; the fixtures span one month, so the
    week grain is the one with a non-trivial series.)

    Both layers reduce from ONE (week, day, user) distinct pass — the
    daily count and the weekly distinct ride the same collapsed
    relation, so events are deduplicated once and never re-scanned.
    The week join is weeks-sized. At 100 TB the distinct pass is the
    only fact-scale shuffle, and it swaps for the HLL-sketch merge
    (`agg_hll_partitioned`) when exactness can yield.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = (ev.select(F.date_trunc("week", "ts").cast("date").alias("wk"),
                   epoch_day(F.col("ts")).alias("day"),
                   "user_id")
         .distinct())
    dau = d.groupBy("wk", "day").agg(F.count("*").alias("dau"))
    wau = d.groupBy("wk").agg(F.countDistinct("user_id").alias("wau"))
    return (dau.join(wau, "wk")
            .groupBy(F.col("wk").alias("week"), "wau")
            .agg(F.count("*").alias("n_days"),
                 rnd(F.avg(F.col("dau").cast("double")), 4).alias("avg_dau"),
                 rnd(F.avg(F.col("dau").cast("double"))
                     / F.col("wau").cast("double"), 6).alias("stickiness"))
            .select("week", "n_days", "avg_dau", "wau", "stickiness"))


@register("agg_ship_latency", f"""
WITH lat AS (
  SELECT o_orderpriority,
         date_diff('day', o_orderdate::DATE, l_shipdate::DATE) AS lat_days
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
)
SELECT o_orderpriority,
       count(*) AS n_lines,
       min(lat_days) AS min_days,
       max(lat_days) AS max_days,
       {sql_rnd('avg(lat_days::DOUBLE)', 4)} AS avg_days,
       count(CASE WHEN lat_days > 60 THEN 1 END) AS n_breached
FROM lat GROUP BY o_orderpriority
""")
def agg_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency SLA per priority class: min/avg/max days
    between order placement and line shipment, plus the count breaching
    a 60-day SLA — the fulfillment-ops readout that tells you whether
    '1-URGENT' actually ships faster than '5-LOW'.

    One orderkey equi-join (the l_orderkey side arrives pre-shuffled
    from the fact layout at scale; bucketing both by orderkey makes
    this exchange-free — `sink_bucketed_join`'s demonstrated shape),
    then a 5-group conditional agg. Date subtraction is exact integer
    days on both engines; the single float op is the rounded average.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = (li.join(o, li.l_orderkey == o.o_orderkey)
           .filter(F.col("l_shipdate").isNotNull()
                   & F.col("o_orderdate").isNotNull())
           .select("o_orderpriority",
                   F.datediff("l_shipdate", "o_orderdate").alias("lat_days")))
    return (lat.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_lines"),
                 F.min("lat_days").alias("min_days"),
                 F.max("lat_days").alias("max_days"),
                 rnd(F.avg(F.col("lat_days").cast("double")), 4)
                 .alias("avg_days"),
                 F.count(F.when(F.col("lat_days") > 60, 1))
                 .alias("n_breached")))


@register("agg_price_index", f"""
WITH yearly AS (
  SELECT year(l_shipdate)::BIGINT AS yr,
         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
             AS cents,
         sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem WHERE l_shipdate IS NOT NULL
  GROUP BY yr
), based AS (
  SELECT yr, cents, qty,
         first_value(cents) OVER (ORDER BY yr) AS base_cents,
         first_value(qty) OVER (ORDER BY yr) AS base_qty
  FROM yearly
)
SELECT yr, qty::BIGINT AS total_qty,
       {sql_rnd('(cents::DOUBLE / qty::DOUBLE)'
                ' / (base_cents::DOUBLE / base_qty::DOUBLE) * 100.0', 4)}
           AS price_index
FROM based
""")
def agg_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price index by ship year (base year = 100): the quantity-
    weighted average unit price of each year relative to the first —
    the inflation/pricing-power readout a revenue team separates from
    volume growth ("are we selling more, or the same for more money").

    Moments are EXACT integers (floor-rescaled cents, integer
    quantities) aggregated once per year; the base-year reference is a
    first_value window over the years-sized rollup (never a self-join
    back to facts). The index is a fixed 3-division IEEE sequence both
    engines evaluate identically, rounded 4dp.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull())
    yearly = (li.select(F.year("l_shipdate").cast("long").alias("yr"),
                        F.floor(F.col("l_extendedprice") * 100.0
                                + F.lit(0.5)).cast("long").alias("c"),
                        F.col("l_quantity").cast("long").alias("q"))
              .groupBy("yr")
              .agg(F.sum("c").alias("cents"), F.sum("q").alias("qty")))
    w = Window.orderBy("yr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    based = (yearly
             .withColumn("base_cents", F.first("cents").over(w))
             .withColumn("base_qty", F.first("qty").over(w)))
    idx = ((F.col("cents").cast("double") / F.col("qty").cast("double"))
           / (F.col("base_cents").cast("double")
              / F.col("base_qty").cast("double")) * 100.0)
    return (based.select("yr", F.col("qty").alias("total_qty"),
                         rnd(idx, 4).alias("price_index")))


@register("agg_reorder_rate", f"""
WITH cp AS (
  SELECT l_partkey, o_custkey, count(DISTINCT l_orderkey) AS n_orders
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY l_partkey, o_custkey
), per_part AS (
  SELECT l_partkey,
         count(*) AS n_customers,
         count(CASE WHEN n_orders >= 2 THEN 1 END) AS n_repeat
  FROM cp GROUP BY l_partkey
)
SELECT p_brand,
       sum(n_customers)::BIGINT AS n_customers,
       sum(n_repeat)::BIGINT AS n_repeat,
       {sql_rnd('sum(n_repeat)::DOUBLE / sum(n_customers)::DOUBLE', 6)}
           AS reorder_rate
FROM per_part JOIN part ON p_partkey = l_partkey
GROUP BY p_brand
""")
def agg_reorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate by brand: of the (customer, part) pairs
    ever bought, what share were bought in ≥2 DISTINCT orders — the
    retention-of-demand metric that separates staples (bought again)
    from one-shot purchases, aggregated to the brand level a buyer
    team acts on.

    The (part, customer, order) distinct collapse is the one
    fact-scale shuffle; the per-part and per-brand layers reduce on
    progressively smaller keys, and the part dim joins broadcast-side.
    All counts exact integers; one rounded division at the end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    cp = (li.join(o, li.l_orderkey == o.o_orderkey)
          .groupBy("l_partkey", "o_custkey")
          .agg(F.countDistinct("l_orderkey").alias("n_orders")))
    per_part = (cp.groupBy("l_partkey")
                .agg(F.count("*").alias("n_customers"),
                     F.count(F.when(F.col("n_orders") >= 2, 1))
                     .alias("n_repeat")))
    return (per_part.join(F.broadcast(p),
                          per_part.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum("n_customers").alias("n_customers"),
                 F.sum("n_repeat").alias("n_repeat"),
                 rnd(F.sum("n_repeat").cast("double")
                     / F.sum("n_customers").cast("double"), 6)
                 .alias("reorder_rate")))


@register("agg_revenue_recognition", f"""
WITH svc AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         o_orderdate::DATE AS svc_start,
         o_orderdate::DATE + 89 AS svc_end
  FROM orders WHERE o_orderdate IS NOT NULL
), months AS (
  SELECT o_orderkey, cents, svc_start, svc_end,
         unnest(generate_series(date_trunc('month', svc_start)::DATE,
                                svc_end, INTERVAL 1 MONTH))::DATE AS m
  FROM svc
), prorated AS (
  SELECT date_trunc('month', m)::DATE AS month,
         cents,
         (least(svc_end, (m + INTERVAL 1 MONTH)::DATE - 1)
          - greatest(svc_start, date_trunc('month', m)::DATE) + 1)
             AS days_in_month
  FROM months
)
SELECT month,
       count(*) AS n_slices,
       sum(days_in_month)::BIGINT AS svc_days,
       {sql_rnd('sum(cents * days_in_month)::DOUBLE / 90.0 / 100.0', 2)}
           AS recognized_revenue
FROM prorated WHERE days_in_month > 0
GROUP BY month
""")
def agg_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue recognition: each order's total prorated day-by-day over
    a 90-day service window and recognized into calendar months — the
    ASC-606-style deferral schedule finance closes the books with,
    where cash in January becomes revenue in Jan+Feb+Mar.

    The month explosion is a built-in `explode(sequence(...))` — 3-4
    rows per order, NO UDF and no driver loop; day counts are exact
    integer date arithmetic and the money stays integer cents until
    the single final division (cents·days / 90 / 100). One grouped
    pass over the exploded slices; months are the bounded group key.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull())
    svc = o.select(
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
        .alias("cents"),
        F.col("o_orderdate").cast("date").alias("svc_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 89).alias("svc_end"))
    months = svc.select(
        "cents", "svc_start", "svc_end",
        F.explode(F.sequence(
            F.trunc("svc_start", "month"), F.col("svc_end"),
            F.expr("interval 1 month"))).alias("m"))
    days = (F.datediff(
        F.least(F.col("svc_end"),
                F.date_sub(F.add_months(F.col("m"), 1), 1)),
        F.greatest(F.col("svc_start"), F.trunc("m", "month"))) + 1)
    prorated = months.select(
        F.trunc("m", "month").alias("month"), "cents",
        days.alias("days_in_month"))
    return (prorated.filter(F.col("days_in_month") > 0)
            .groupBy("month")
            .agg(F.count("*").alias("n_slices"),
                 F.sum("days_in_month").alias("svc_days"),
                 rnd(F.sum(F.col("cents") * F.col("days_in_month"))
                     .cast("double") / 90.0 / 100.0, 2)
                 .alias("recognized_revenue")))


@register("agg_new_vs_returning", """
WITH ud AS (
  SELECT DISTINCT user_id,
         ((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000)::BIGINT AS day
  FROM events WHERE ts IS NOT NULL
), first_day AS (
  SELECT user_id, min(day) AS d0 FROM ud GROUP BY user_id
)
SELECT ud.day,
       count(*) AS active_users,
       count(CASE WHEN ud.day = f.d0 THEN 1 END) AS new_users,
       count(CASE WHEN ud.day > f.d0 THEN 1 END) AS returning_users
FROM ud JOIN first_day f ON f.user_id = ud.user_id
GROUP BY ud.day
""")
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily actives: per day, how many active users
    are seen for the FIRST time vs coming back — the growth-accounting
    split (acquisition vs retention) under every "DAU is up, but why"
    question.

    The (user, day) distinct collapse and the per-user min reduce on
    the SAME user_id key, and the tag join rides that layout too —
    one fact-scale shuffle total, then a days-sized agg. First-touch
    is exact integer epoch-days; no timezone arithmetic can shift a
    user's birth day differently across engines (UTC-pinned session,
    integer floor-division).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ud = (ev.select("user_id",
                    epoch_day(F.col("ts")).alias("day"))
          .distinct())
    first_day = ud.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (ud.join(first_day, "user_id")
            .groupBy("day")
            .agg(F.count("*").alias("active_users"),
                 F.count(F.when(F.col("day") == F.col("d0"), 1))
                 .alias("new_users"),
                 F.count(F.when(F.col("day") > F.col("d0"), 1))
                 .alias("returning_users")))


@register("agg_skyline_2d", """
WITH pts AS (
  SELECT p_partkey, p_size,
         CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_cents
  FROM part WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
), sizes AS (
  SELECT p_size, min(price_cents) AS minp FROM pts GROUP BY p_size
), frontier_sizes AS (
  SELECT p_size, minp,
         min(minp) OVER (ORDER BY p_size DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS best_bigger
  FROM sizes
)
SELECT p.p_partkey, p.p_size, p.price_cents
FROM pts p
JOIN frontier_sizes f
  ON f.p_size = p.p_size AND p.price_cents = f.minp
WHERE f.best_bigger IS NULL OR f.best_bigger > f.minp
""")
def agg_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not DOMINATED on
    (size↑ better, price↓ better) — q dominates p iff q is ≥ on both
    axes and strictly better on one. The multi-criteria shortlist
    ("show me the efficient frontier") that no single ORDER BY can
    express.

    Sort-filter skyline done at the SIZE level first: per-size min
    price (a size survives iff no strictly-bigger size is as cheap —
    running min over the size-desc order), then points join back and
    only same-size price-ties on the surviving minimum remain (equal
    on both axes = mutually non-dominated, all kept). O(n log n),
    one grouped pass + a sizes-sized window + one id join — the naive
    NOT EXISTS dominance test is O(n²). Exact integer cents; at
    100 TB the size rollup is the only fact-scale shuffle.
    """
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isNotNull() & F.col("p_retailprice").isNotNull())
    pts = p.select(
        "p_partkey", "p_size",
        F.floor(F.col("p_retailprice") * 100.0 + F.lit(0.5)).cast("long")
        .alias("price_cents"))
    sizes = pts.groupBy("p_size").agg(F.min("price_cents").alias("minp"))
    w = (Window.orderBy(F.col("p_size").desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    fs = (sizes.withColumn("best_bigger", F.min("minp").over(w))
          .filter(F.col("best_bigger").isNull()
                  | (F.col("best_bigger") > F.col("minp"))))
    return (pts.join(F.broadcast(fs), "p_size")
            .filter(F.col("price_cents") == F.col("minp"))
            .select("p_partkey", "p_size", "price_cents"))


@register("agg_abc_classification", f"""
WITH rev AS (
  SELECT l_partkey,
         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, cents,
         sum(cents) OVER (ORDER BY cents DESC, l_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
         sum(cents) OVER () AS tot
  FROM rev
), classed AS (
  SELECT l_partkey, cents,
         CASE WHEN cum * 10 <= tot * 8 THEN 'A'
              WHEN cum * 100 <= tot * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc,
       count(*) AS n_parts,
       floor((sum(cents)::DOUBLE / 100.0) * 100.0 + 0.5) / 100.0 AS revenue,
       floor((sum(cents)::DOUBLE / sum(sum(cents)) OVER ()::DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS revenue_share
FROM classed GROUP BY abc
""")
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head up to 80% of cumulative revenue, B to 95%, C the tail —
    the warehouse-policy partition (count A daily, B weekly, C yearly)
    that `win_pareto_share`'s curve is usually read INTO.

    Class boundaries are EXACT integer comparisons (cum·10 ≤ tot·8,
    cum·100 ≤ tot·95 — the PARITY #21 rule; a float 0.8·tot literal
    could flip a boundary part between engines). r10 scale rewrite
    (r9 verdict task 1): the cumulative revenue over the per-part
    rollup — part-cardinality, which grows with the data — runs
    through the distributed running-sum primitive instead of an
    unpartitioned window (exact integer cents make the bucket
    reassociation hash-free); the total arrives as a broadcast
    scalar and the three-row report divides once at the end.
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_exact_running_sum)

    li = load_table(spark, sf_dir, "lineitem")
    rev = (li.groupBy("l_partkey")
           .agg(F.sum(F.floor(F.col("l_extendedprice") * 100.0
                              + F.lit(0.5)).cast("long")).alias("cents")))
    # descending revenue order == ascending order of the negated cents
    # (custkey... partkey tie-break asc in both framings)
    cum = with_exact_running_sum(
        rev.withColumn("_neg", -F.col("cents")),
        "cents", "_neg", ["l_partkey"], out_col="cum").drop("_neg")
    tot = cum.agg(F.sum("cents").alias("tot"))
    ranked = cum.crossJoin(F.broadcast(tot))
    abc = (F.when(F.col("cum") * 10 <= F.col("tot") * 8, "A")
           .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
           .otherwise("C"))
    return (ranked.withColumn("abc", abc)
            .groupBy("abc")
            .agg(F.count("*").alias("n_parts"),
                 F.sum("cents").alias("cents"))
            .select("abc", "n_parts",
                    rnd(F.col("cents").cast("double") / 100.0, 2)
                    .alias("revenue"),
                    rnd(F.col("cents").cast("double")
                        / F.sum("cents").over(Window.partitionBy())
                        .cast("double"), 6).alias("revenue_share")))


@register("agg_catalog_coverage", """
SELECT 'parts_never_sold' AS entity,
       (SELECT count(*) FROM part p WHERE NOT EXISTS
          (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey))
           AS n_unused,
       (SELECT count(*) FROM part) AS n_total
UNION ALL
SELECT 'suppliers_never_shipped',
       (SELECT count(*) FROM supplier s WHERE NOT EXISTS
          (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)),
       (SELECT count(*) FROM supplier)
UNION ALL
SELECT 'customers_never_ordered',
       (SELECT count(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)),
       (SELECT count(*) FROM customer)
""")
def agg_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-coverage report: parts never sold, suppliers never
    shipped, customers who never ordered — the PARENT→child unused-
    entity complement of `ingest_validate`'s child→parent orphan
    checks. Dead catalog weight is what a 100 TB dim table is mostly
    made of; this is the pruning candidate list's summary.

    Three anti-join aggregates; each anti join builds its hash
    relation from the FACT side's distinct keys (the dim streams
    against it), and each dim is scanned once for the pair of counts.
    The map-explode fan-out (one row per rule from one aggregate —
    the `ingest_validate` rewrite's trick) applies per entity.
    """
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def rule(name, dim, key, fact_keys):
        unused = (dim.join(F.broadcast(fact_keys),
                           dim[key] == fact_keys[fact_keys.columns[0]],
                           "left_anti")
                  .agg(F.count("*").alias("n")))
        total = dim.agg(F.count("*").alias("t"))
        return (unused.join(F.broadcast(total))
                .select(F.lit(name).alias("entity"),
                        F.col("n").cast("long").alias("n_unused"),
                        F.col("t").cast("long").alias("n_total")))

    r1 = rule("parts_never_sold", part, "p_partkey",
              li.select("l_partkey").distinct())
    r2 = rule("suppliers_never_shipped", supp, "s_suppkey",
              li.select("l_suppkey").distinct())
    r3 = rule("customers_never_ordered", cust, "c_custkey",
              o.select("o_custkey").distinct())
    return r1.unionByName(r2).unionByName(r3)


@register("agg_wilson_interval", f"""
WITH rates AS (
  SELECT event_type,
         count(*)::BIGINT AS n,
         count(CASE WHEN value > 50.0 THEN 1 END)::BIGINT AS k
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n, k,
       {sql_rnd('k::DOUBLE / n::DOUBLE', 6)} AS p_hat,
       {sql_rnd('(k::DOUBLE / n::DOUBLE + 1.9208::DOUBLE / n::DOUBLE'
                ' - 1.96::DOUBLE * sqrt((k::DOUBLE / n::DOUBLE)'
                ' * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE'
                ' + 0.9604::DOUBLE / (n::DOUBLE * n::DOUBLE)))'
                ' / (1.0 + 3.8416::DOUBLE / n::DOUBLE)', 6)} AS wilson_lo,
       {sql_rnd('(k::DOUBLE / n::DOUBLE + 1.9208::DOUBLE / n::DOUBLE'
                ' + 1.96::DOUBLE * sqrt((k::DOUBLE / n::DOUBLE)'
                ' * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE'
                ' + 0.9604::DOUBLE / (n::DOUBLE * n::DOUBLE)))'
                ' / (1.0 + 3.8416::DOUBLE / n::DOUBLE)', 6)} AS wilson_hi
FROM rates
""")
def agg_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% confidence interval for the high-value-event rate
    per event type — the proportion CI that behaves at the edges
    (a 0/10 observed rate gets a sane upper bound where the naive
    Wald interval collapses to [0,0]), which is why ranking-by-
    lower-bound (Reddit's comment sort) and SLO error budgets use it.

    Counts are exact integers off one conditional-agg pass; the
    interval is a FIXED shared IEEE expression (z=1.96 and its powers
    as shared literals — no inverse-CDF at query time, the
    `ml_ab_srm_check` discipline), identical text both engines,
    rounded 6dp. Groups always have n ≥ 1 by construction (they exist
    because rows exist), so the divisions are safe without guards.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    rates = (ev.groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.count(F.when(F.col("value") > 50.0, 1)).alias("k")))
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    center = p + F.lit(1.9208) / n
    half = 1.96 * F.sqrt(p * (1.0 - p) / n + F.lit(0.9604) / (n * n))
    denom = 1.0 + F.lit(3.8416) / n
    return rates.select(
        "event_type", "n", "k",
        rnd(p, 6).alias("p_hat"),
        rnd((center - half) / denom, 6).alias("wilson_lo"),
        rnd((center + half) / denom, 6).alias("wilson_hi"))


@register("agg_revenue_bridge", f"""
WITH per_cust AS (
  SELECT o_custkey,
         sum(CASE WHEN year(o_orderdate) = 1997
             THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
             ELSE 0 END) AS prev_cents,
         sum(CASE WHEN year(o_orderdate) = 1998
             THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
             ELSE 0 END) AS curr_cents
  FROM orders
  WHERE o_orderdate IS NOT NULL
    AND year(o_orderdate) IN (1997, 1998)
  GROUP BY o_custkey
), classed AS (
  SELECT o_custkey, prev_cents, curr_cents,
         CASE WHEN prev_cents = 0 AND curr_cents > 0 THEN 'new'
              WHEN prev_cents > 0 AND curr_cents = 0 THEN 'churned'
              WHEN curr_cents > prev_cents THEN 'expansion'
              WHEN curr_cents < prev_cents THEN 'contraction'
              ELSE 'flat' END AS segment
  FROM per_cust
)
SELECT segment,
       count(*) AS n_customers,
       {sql_rnd('sum(curr_cents - prev_cents)::DOUBLE / 100.0', 2)}
           AS revenue_delta
FROM classed GROUP BY segment
""")
def agg_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (growth accounting): the 1997→1998 revenue delta
    decomposed into new / churned / expansion / contraction customer
    segments — the waterfall every board deck shows, answering
    "revenue grew 3%: was that new logos or existing accounts
    spending more, net of churn". The segment deltas sum EXACTLY to
    the total year-over-year change (a conservation law a hand-built
    bridge usually violates).

    ONE conditional-aggregation pass builds both years per customer
    (never two scans + a full-outer join — the `ingest_dq_suite`
    lesson applied to time slices: a customer absent in a year is a
    ZERO from the same group, not a NULL from a join). Exact integer
    cents end-to-end; the only float op is the final display division.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
        & F.year("o_orderdate").isin(1997, 1998))
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.sum(F.when(F.year("o_orderdate") == 1997, cents)
                           .otherwise(0)).alias("prev_cents"),
                     F.sum(F.when(F.year("o_orderdate") == 1998, cents)
                           .otherwise(0)).alias("curr_cents")))
    seg = (F.when((F.col("prev_cents") == 0)
                  & (F.col("curr_cents") > 0), "new")
           .when((F.col("prev_cents") > 0)
                 & (F.col("curr_cents") == 0), "churned")
           .when(F.col("curr_cents") > F.col("prev_cents"), "expansion")
           .when(F.col("curr_cents") < F.col("prev_cents"), "contraction")
           .otherwise("flat"))
    return (per_cust.withColumn("segment", seg)
            .groupBy("segment")
            .agg(F.count("*").alias("n_customers"),
                 rnd(F.sum(F.col("curr_cents") - F.col("prev_cents"))
                     .cast("double") / 100.0, 2).alias("revenue_delta")))


@register("agg_seasonal_index", f"""
WITH daily AS (
  SELECT event_type,
         ((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000)::BIGINT AS day,
         (((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000) % 7)::INT AS dow,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY event_type, day, dow
), per_dow AS (
  SELECT event_type, dow,
         count(*)::BIGINT AS n_days,
         sum(cents) AS cents,
         avg(cents::DOUBLE) AS dow_avg
  FROM daily GROUP BY event_type, dow
), overall AS (
  SELECT event_type, avg(cents::DOUBLE) AS all_avg FROM daily
  GROUP BY event_type
)
SELECT p.event_type, p.dow, p.n_days,
       {sql_rnd('p.dow_avg / o.all_avg', 6)} AS seasonal_index
FROM per_dow p JOIN overall o ON o.event_type = p.event_type
""")
def agg_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week seasonal index per event type
    (dow average ÷ overall daily average; 1.0 = typical day) — the
    FACTORS a forecast multiplies its baseline by, where
    `agg_seasonality_strength` only says whether seasonality exists.
    The dow is epoch-day mod 7 (integer, timezone-free) so the index
    is keyed identically on both engines and under any session TZ.

    Both layers reduce from the same exact-cents daily rollup — the
    dow average and the overall average ride one (type, day) collapse;
    the final join is types×7. The ratio of two averages of the SAME
    integer set is a fixed IEEE sequence (each avg is one division of
    an exact sum); rounded 6dp.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    day = epoch_day(F.col("ts"))
    daily = (ev.select("event_type", day.alias("day"),
                       F.floor(F.col("value") * 100.0 + F.lit(0.5))
                       .cast("long").alias("c"))
             .groupBy("event_type", "day")
             .agg(F.sum("c").alias("cents"))
             .withColumn("dow", (F.col("day") % 7).cast("int")))
    per_dow = (daily.groupBy("event_type", "dow")
               .agg(F.count("*").alias("n_days"),
                    F.avg(F.col("cents").cast("double")).alias("dow_avg")))
    overall = (daily.groupBy("event_type")
               .agg(F.avg(F.col("cents").cast("double")).alias("all_avg")))
    return (per_dow.join(F.broadcast(overall), "event_type")
            .select("event_type", "dow", "n_days",
                    rnd(F.col("dow_avg") / F.col("all_avg"), 6)
                    .alias("seasonal_index")))


@register("agg_hhi_concentration", f"""
WITH per AS (
    SELECT c_nationkey,
           o_custkey,
           sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT) AS rev
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
), tot AS (
    SELECT c_nationkey, sum(rev) AS tot, count(*) AS n_custs
    FROM per GROUP BY 1
)
SELECT per.c_nationkey, n_custs,
       {sql_rnd('sum((rev::DOUBLE / tot::DOUBLE)'
                ' * (rev::DOUBLE / tot::DOUBLE)) * 10000.0', 4)} AS hhi
FROM per JOIN tot ON per.c_nationkey = tot.c_nationkey
GROUP BY 1, 2
""")
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of customer revenue per
    nation (sum of squared revenue shares x 10000; 10000 = monopoly) —
    the concentration report an account-risk review starts from.

    Plan: exact-cents per-(nation, customer) rollup (one shuffle with
    map-side partials), nation totals as a second tiny aggregate
    joined back (25 rows — broadcast by AQE), squared-share sum as a
    third dim-sized aggregate. All float work happens after the data
    collapses to one row per customer; shares divide two exact int64
    cent sums so both engines square identical doubles, and the final
    sum's order drift (~1e-13 over <=6k customers/nation) is far below
    the 4dp rounding.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    per = (o.join(c, o.o_custkey == c.c_custkey)
           .groupBy("c_nationkey", "o_custkey")
           .agg(F.sum(cents).alias("rev")))
    tot = per.groupBy("c_nationkey").agg(F.sum("rev").alias("tot"),
                                         F.count("*").alias("n_custs"))
    share = F.col("rev").cast("double") / F.col("tot").cast("double")
    return (per.join(tot, "c_nationkey")
            .groupBy("c_nationkey", "n_custs")
            .agg(rnd(F.sum(share * share) * 10000.0, 4).alias("hhi")))


@register("agg_survival_km", f"""
WITH span AS (
    SELECT o_custkey,
           min(o_orderdate) AS f,
           max(o_orderdate) AS l
    FROM orders
    WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    GROUP BY 1
), study AS (SELECT max(o_orderdate) AS study_end FROM orders
             WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
cust AS (
    SELECT date_diff('day', f, l) // 30 AS dur_m,
           (date_diff('day', l, study_end) > 180)::INT AS ev
    FROM span, study
), tp AS (
    SELECT dur_m, sum(ev)::BIGINT AS d, count(*) AS total_at
    FROM cust GROUP BY 1
), risk AS (
    SELECT dur_m, d,
           ((SELECT sum(total_at) FROM tp) -
            coalesce(sum(total_at) OVER (ORDER BY dur_m
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
           AS n_at_risk
    FROM tp
), km AS (
    SELECT dur_m, d, n_at_risk,
           list_product(list(1.0 - d::DOUBLE / n_at_risk::DOUBLE)
               OVER (ORDER BY dur_m
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS s
    FROM risk
)
SELECT dur_m AS duration_months, n_at_risk, d AS n_events,
       {sql_rnd('s', 6)} AS survival
FROM km WHERE d > 0
""")
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer activity lifetimes
    (months between first and last order; 'churn' observed when the
    last order is >180 days before the study end, else censored) —
    the estimator retention analyses use when lifetimes are cut off
    by the observation window, which a plain churn-rate ignores.

    Scale shape: the heavy pass is the per-customer min/max rollup
    (one shuffle, map-side partials); everything after collapses to
    <=~80 month-grain timepoints, so the at-risk cumsum and the
    product-limit fold are dim-sized single-partition windows by
    construction. Cross-engine float discipline: S(t) is a SEQUENTIAL
    left-to-right product of (1 - d/n) factors — Spark folds the
    ordered frame list with `F.aggregate`, DuckDB takes
    `list_product` over the same frame-ordered window list — the
    identical IEEE operation sequence, so no exp/ln libm divergence
    enters (PARITY.md discipline), then rounded 6dp.
    """
    # cohorts are per-CUSTOMER with dated orders on both engines (NULL
    # custkey/date rows are not a cohort — r7 null sweep)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
    span = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("f"),
                                      F.max("o_orderdate").alias("l"))
    study = o.agg(F.max("o_orderdate").alias("study_end"))
    cust = (span.join(F.broadcast(study))
            .select(F.floor(F.datediff("l", "f") / 30).cast("long")
                    .alias("dur_m"),
                    (F.datediff("study_end", "l") > 180).cast("int")
                    .alias("ev")))
    tp = cust.groupBy("dur_m").agg(F.sum("ev").alias("d"),
                                   F.count("*").alias("total_at"))
    w_all = Window.orderBy("dur_m").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_prev = Window.orderBy("dur_m").rowsBetween(
        Window.unboundedPreceding, -1)
    w_run = Window.orderBy("dur_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    risk = tp.select(
        "dur_m", "d",
        (F.sum("total_at").over(w_all)
         - F.coalesce(F.sum("total_at").over(w_prev), F.lit(0)))
        .alias("n_at_risk"))
    factor = F.lit(1.0) - F.col("d").cast("double") / \
        F.col("n_at_risk").cast("double")
    km = risk.select(
        "dur_m", "d", "n_at_risk",
        F.aggregate(F.collect_list(factor).over(w_run),
                    F.lit(1.0), lambda acc, x: acc * x).alias("s"))
    return (km.filter(F.col("d") > 0)
            .select(F.col("dur_m").alias("duration_months"),
                    "n_at_risk", F.col("d").alias("n_events"),
                    rnd(F.col("s"), 6).alias("survival")))


@register("agg_runs_test", f"""
WITH daily AS (
    SELECT o_orderdate AS day,
           sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT) AS cents
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    GROUP BY 1
), tot AS (
    SELECT sum(cents) AS t, count(*) AS n FROM daily
), signed AS (
    SELECT day, (cents * (SELECT n FROM tot) > (SELECT t FROM tot))::INT AS s
    FROM daily
), runs AS (
    SELECT s,
           CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                  OR s <> lag(s) OVER (ORDER BY day)
                THEN 1 ELSE 0 END AS new_run
    FROM signed
)
SELECT count(*) AS n_days,
       sum(s)::BIGINT AS n_above,
       (count(*) - sum(s))::BIGINT AS n_below,
       sum(new_run)::BIGINT AS n_runs,
       {sql_rnd('CASE WHEN 2.0 * sum(s) * (count(*) - sum(s)) > count(*)'
                ' THEN (sum(new_run) - (1.0 + 2.0 * sum(s)'
                ' * (count(*) - sum(s)) / count(*)))'
                ' / sqrt(2.0 * sum(s) * (count(*) - sum(s))'
                ' * (2.0 * sum(s) * (count(*) - sum(s)) - count(*))'
                ' / (count(*)::DOUBLE * count(*) * (count(*) - 1)))'
                ' ELSE NULL END', 4)}
           AS z_score
FROM runs
""")
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-revenue series: are
    above-mean/below-mean days randomly interleaved, or does the
    series trend/cluster (too few runs) or oscillate (too many)? The
    z-score against the null's run-count distribution is the
    randomness check that complements `agg_ks_test` (distribution
    shape) and `win_autocorr_lag1` (linear memory) with a
    SIGN-pattern test that is robust to outliers.

    Float discipline: the above/below split avoids a float mean
    entirely — day is above iff cents·n > total (exact int64 compare,
    the `agg_abc_classification` boundary rule); run counting is a
    lag window over integers; only the final z divides exact integer
    aggregates in one fixed IEEE expression, rounded 4dp. Scale: one
    exact-cents daily collapse, then a dim-sized ordered pass.

    Degenerate guard (r4 ADVICE.md): the null variance
    2·n1·n0·(2·n1·n0−n)/(n²(n−1)) is zero or undefined when the
    series is a single day, entirely one-sided (n1=0 or n0=0), or the
    two-day split case 2·n1·n0=n — Spark ANSI would raise
    DIVIDE_BY_ZERO where DuckDB nulls out. z_score is therefore gated
    on 2·n1·n0 > n (which implies n1>0, n0>0, n>1 AND var>0) and NULL
    otherwise, with the CASE mirrored in the oracle.
    """
    # the series is over non-null (day, price) pairs on both engines —
    # a NULL day otherwise sorts first in Spark's lag window and last
    # in DuckDB's, shifting every run boundary (r7 null sweep)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull())
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    daily = (o.groupBy(F.col("o_orderdate").alias("day"))
             .agg(F.sum(cents).alias("cents")))
    tot = daily.agg(F.sum("cents").alias("t"), F.count("*").alias("n"))
    signed = (daily.join(F.broadcast(tot))
              .select("day", (F.col("cents") * F.col("n") > F.col("t"))
                      .cast("int").alias("s")))
    lagw = Window.orderBy("day")
    runs = signed.select(
        "s",
        F.when(F.lag("s").over(lagw).isNull()
               | (F.col("s") != F.lag("s").over(lagw)), 1)
        .otherwise(0).alias("new_run"))
    n = F.count("*")
    n1 = F.sum("s")
    n0 = n - n1
    r = F.sum("new_run")
    expected = 1.0 + 2.0 * n1 * n0 / n
    var = (2.0 * n1 * n0 * (2.0 * n1 * n0 - n)
           / (n.cast("double") * n * (n - 1)))
    return runs.agg(
        n.alias("n_days"),
        n1.cast("long").alias("n_above"),
        n0.cast("long").alias("n_below"),
        r.cast("long").alias("n_runs"),
        rnd(F.when(2.0 * n1 * n0 > n, (r - expected) / F.sqrt(var)),
            4).alias("z_score"))


@register("agg_poisson_rate_ci", f"""
WITH span AS (
    SELECT (date_diff('day', min(ts::TIMESTAMP), max(ts::TIMESTAMP)) + 1)
               ::BIGINT AS days
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       (SELECT days FROM span) AS days_observed,
       {sql_rnd('count(*)::DOUBLE / (SELECT days FROM span)', 6)}
           AS rate_per_day,
       {sql_rnd('greatest(count(*)::DOUBLE / (SELECT days FROM span)'
                ' - 1.96 * sqrt(count(*)::DOUBLE)'
                ' / (SELECT days FROM span), 0.0)', 6)} AS rate_lo,
       {sql_rnd('count(*)::DOUBLE / (SELECT days FROM span)'
                ' + 1.96 * sqrt(count(*)::DOUBLE)'
                ' / (SELECT days FROM span)', 6)} AS rate_hi
FROM events
GROUP BY event_type
""")
def agg_poisson_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% CI for the per-day event rate of each event type under a
    Poisson arrival model (normal approximation, var = count) — the
    rate-metric companion to `agg_wilson_interval`'s proportions:
    alerting thresholds and capacity plans need the interval, not
    just the point rate, before declaring a traffic change real.

    Shared fixed z-literal (1.96) in identical expression text on
    both engines (the `ml_ab_srm_check` discipline, no inverse CDF);
    counts and the day span are exact integers, so both engines
    divide and sqrt identical values. One conditional-free grouped
    count + a one-row broadcast span — the aggregate rides the scan.
    """
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg((F.datediff(F.max("ts"), F.min("ts")) + 1)
                  .cast("long").alias("days"))
    cnt = F.count("*")
    rate = cnt.cast("double") / F.col("days")
    half = 1.96 * F.sqrt(cnt.cast("double")) / F.col("days")
    return (ev.join(F.broadcast(span))
            .groupBy("event_type", "days")
            .agg(cnt.alias("n_events"),
                 rnd(rate, 6).alias("rate_per_day"),
                 rnd(F.greatest(rate - half, F.lit(0.0)), 6).alias("rate_lo"),
                 rnd(rate + half, 6).alias("rate_hi"))
            .select("event_type", "n_events",
                    F.col("days").alias("days_observed"),
                    "rate_per_day", "rate_lo", "rate_hi"))


@register("agg_spearman", f"""
WITH r AS (
  SELECT l_returnflag AS flag,
         2 * count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - count(*) OVER (PARTITION BY l_returnflag, l_quantity) + 1 AS rx,
         2 * count(*) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) + 1 AS ry
  FROM lineitem
), s AS (
  SELECT flag, count(*)::BIGINT AS n,
         sum(rx::HUGEINT) AS sx, sum(ry::HUGEINT) AS sy,
         sum(rx::HUGEINT * rx) AS sxx, sum(ry::HUGEINT * ry) AS syy,
         sum(rx::HUGEINT * ry) AS sxy
  FROM r GROUP BY flag
)
SELECT flag AS l_returnflag, n,
       CASE WHEN n::DOUBLE * sxx - sx::DOUBLE * sx > 0
             AND n::DOUBLE * syy - sy::DOUBLE * sy > 0
            THEN {sql_rnd('(n::DOUBLE * sxy - sx::DOUBLE * sy)'
                          ' / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)'
                          ' * (n::DOUBLE * syy - sy::DOUBLE * sy))', 6)}
       END AS spearman_rho
FROM s
""", twin_of="agg_spearman_grid")
def agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (quantity vs price per returnflag) —
    the monotone-association twin of `agg_corr_covar`'s Pearson r:
    robust to outliers and nonlinear-but-monotone relationships, the
    correlation a data-quality pass actually wants on heavy-tailed
    columns.

    Cross-engine exactness: average ranks are DOUBLED so they stay
    integers (2·ar = 2·cnt_le − cnt_eq + 1 — rho is scale-invariant),
    built from two count windows (RANGE frame counts peers, a
    partition count gives the tie size). All five power sums are then
    EXACT 128-bit integer aggregates — Spark decimal(38,0), DuckDB
    HUGEINT — because the cubic sums (sxx ~ 4n³ with doubled ranks up
    to 2n) overflow int64 once a flag partition exceeds ~1.3M rows
    (~16× sf0.1; the r5 advisor's finding — agg_anova_f's scale-free
    guard, applied here as widened accumulators). The widened ceiling
    is ~2.9e12 rows/flag. rho is one fixed IEEE expression over the
    exact sums (the `win_autocorr_lag1` explicit-moment discipline),
    with the zero-variance guard mirrored as CASE (ANSI
    divide-by-zero).

    Plan: two window passes over the fact (each a flag-keyed sort,
    3 bounded partitions) + one grouped reduction; no joins. At
    100 TB the rank windows are the cost — per-key sorts that AQE
    splits by flag; `agg_spearman_grid` is the registered one-pass
    scale twin (grid-binned ranks, no full-fact sort).
    """
    li = load_table(spark, sf_dir, "lineitem")

    def ranks2(col: str, alias: str):
        w_le = (Window.partitionBy("l_returnflag").orderBy(col)
                .rangeBetween(Window.unboundedPreceding, Window.currentRow))
        w_eq = Window.partitionBy("l_returnflag", col)
        return (2 * F.count("*").over(w_le)
                - F.count("*").over(w_eq) + 1).alias(alias)

    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731 — 128-bit sums
    r = li.select(F.col("l_returnflag").alias("flag"),
                  ranks2("l_quantity", "rx"),
                  ranks2("l_extendedprice", "ry"))
    s = r.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum(d19(F.col("rx"))).alias("sx"),
        F.sum(d19(F.col("ry"))).alias("sy"),
        F.sum(d19(F.col("rx")) * d19(F.col("rx"))).alias("sxx"),
        F.sum(d19(F.col("ry")) * d19(F.col("ry"))).alias("syy"),
        F.sum(d19(F.col("rx")) * d19(F.col("ry"))).alias("sxy"))
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    rho = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) \
        / F.sqrt(vx * vy)
    return s.select(F.col("flag").alias("l_returnflag"), "n",
                    F.when((vx > 0) & (vy > 0), rnd(rho, 6))
                    .alias("spearman_rho"))


@register("agg_spearman_grid", f"""
WITH cells AS (
  SELECT l_returnflag AS flag,
         floor(l_quantity)::BIGINT AS bq,
         floor(l_extendedprice / 100.0)::BIGINT AS bp,
         count(*)::BIGINT AS cnt
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1, 2, 3
), r AS (
  SELECT flag, cnt,
         2 * sum(cnt) OVER (PARTITION BY flag ORDER BY bq
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - sum(cnt) OVER (PARTITION BY flag, bq) + 1 AS rx,
         2 * sum(cnt) OVER (PARTITION BY flag ORDER BY bp
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - sum(cnt) OVER (PARTITION BY flag, bp) + 1 AS ry
  FROM cells
), s AS (
  SELECT flag, sum(cnt)::BIGINT AS n,
         sum(cnt::HUGEINT * rx) AS sx, sum(cnt::HUGEINT * ry) AS sy,
         sum(cnt::HUGEINT * rx * rx) AS sxx,
         sum(cnt::HUGEINT * ry * ry) AS syy,
         sum(cnt::HUGEINT * rx * ry) AS sxy
  FROM r GROUP BY flag
)
SELECT flag AS l_returnflag, n,
       CASE WHEN n::DOUBLE * sxx - sx::DOUBLE * sx > 0
             AND n::DOUBLE * syy - sy::DOUBLE * sy > 0
            THEN {sql_rnd('(n::DOUBLE * sxy - sx::DOUBLE * sy)'
                          ' / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)'
                          ' * (n::DOUBLE * syy - sy::DOUBLE * sy))', 6)}
       END AS spearman_rho
FROM s
""")
def agg_spearman_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`agg_spearman`'s registered ONE-PASS scale twin (r5 verdict
    item 2): Spearman rho over GRID-BINNED values — quantity at its
    native integer grid (lossless: fixture quantities are integral),
    extendedprice in $100 bins. The rank windows then run over the
    (flag, bin) CELL table (≤ |flags|·|bins| rows, ~3·1.1k here),
    never the fact: the fact contributes exactly one
    map-side-combinable groupBy count. That converts the exact op's
    two full-fact flag-keyed sorts into one partial-agg shuffle of
    bounded cardinality — the shape that survives 100 TB.

    Why grid bins and not the verdict's suggested KLL/approx-
    percentile ranks: Spark's approx_percentile merges Greenwald-
    Khanna summaries in PARTITION ORDER, so its cut points are not
    partition-invariant — it would fail the repo's byte-identical
    3-vs-17-partition law and cannot be oracled hash-exact. A fixed
    grid is deterministic in BOTH engines, keeps every moment an
    exact 128-bit integer (decimal(38,0) / HUGEINT — the overflow
    class the r5 advisor flagged is structurally absent), and is
    itself the textbook sketch: rho over binned grades converges to
    exact rho as the grid refines (here |rho_grid − rho_exact| <
    2e-3 at every fixture SF, pinned in tests/test_guard_band.py).
    NULL pairs are excluded up front in both engines (pairwise-
    complete semantics; also removes the NULLS FIRST/LAST window-
    order divergence class).

    Plan (asserted in tests/test_plans.py): exactly ONE lineitem
    scan, partial hash aggregation before the exchange, and every
    window sort placed after the cell-level aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cells = (li.where(F.col("l_quantity").isNotNull()
                      & F.col("l_extendedprice").isNotNull())
             .groupBy(F.col("l_returnflag").alias("flag"),
                      F.floor("l_quantity").alias("bq"),
                      F.floor(F.col("l_extendedprice") / 100.0).alias("bp"))
             .agg(F.count("*").alias("cnt")))

    def ranks2(col: str, alias: str):
        w_le = (Window.partitionBy("flag").orderBy(col)
                .rangeBetween(Window.unboundedPreceding, Window.currentRow))
        w_eq = Window.partitionBy("flag", col)
        return (2 * F.sum("cnt").over(w_le)
                - F.sum("cnt").over(w_eq) + 1).alias(alias)

    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731 — 128-bit sums
    r = cells.select("flag", "cnt", ranks2("bq", "rx"), ranks2("bp", "ry"))
    cnt = d19(F.col("cnt"))
    s = r.groupBy("flag").agg(
        F.sum("cnt").alias("n"),
        F.sum(cnt * d19(F.col("rx"))).alias("sx"),
        F.sum(cnt * d19(F.col("ry"))).alias("sy"),
        F.sum(cnt * d19(F.col("rx")) * d19(F.col("rx"))).alias("sxx"),
        F.sum(cnt * d19(F.col("ry")) * d19(F.col("ry"))).alias("syy"),
        F.sum(cnt * d19(F.col("rx")) * d19(F.col("ry"))).alias("sxy"))
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    rho = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) \
        / F.sqrt(vx * vy)
    return s.select(F.col("flag").alias("l_returnflag"), "n",
                    F.when((vx > 0) & (vy > 0), rnd(rho, 6))
                    .alias("spearman_rho"))


@register("agg_anova_f", f"""
WITH g AS (
  SELECT c_mktsegment AS seg, count(*)::BIGINT AS n_i,
         sum(floor(c_acctbal * 100.0 + 0.5)::BIGINT)::BIGINT AS s_i,
         sum(floor(c_acctbal * 100.0 + 0.5)::BIGINT
             * floor(c_acctbal * 100.0 + 0.5)::BIGINT)::BIGINT AS q_i
  FROM customer GROUP BY 1
), t AS (
  SELECT count(*)::BIGINT AS k, sum(n_i)::BIGINT AS n,
         sum(s_i)::BIGINT AS s, sum(q_i)::BIGINT AS q,
         sum(s_i::DOUBLE * s_i::DOUBLE / n_i::DOUBLE) AS sg
  FROM g
)
SELECT k AS k_groups, n AS n_total,
       CASE WHEN q::DOUBLE - s::DOUBLE * s / n > 0
            THEN {sql_rnd('(sg - s::DOUBLE * s / n)'
                          ' / (q::DOUBLE - s::DOUBLE * s / n)', 6)}
       END AS eta_sq,
       CASE WHEN k > 1 AND n > k AND q::DOUBLE - sg > 0
            THEN {sql_rnd('((sg - s::DOUBLE * s / n) / (k - 1))'
                          ' / ((q::DOUBLE - sg) / (n - k))', 6)}
       END AS f_stat
FROM t
""")
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean account balance differ across the 5
    market segments? Emits η² (variance explained, SSB/SST) and the F
    statistic — the k-group generalization of `agg_ttest_welch`'s
    two-group comparison. Only SCALE-FREE ratios are emitted: raw SS
    magnitudes grow ~1e11 at sf0.1, where a double ULP exceeds the
    4dp rounding grid (caught by the guard-band suite while drafting
    — emitting them would hash-flip under association drift).

    Two-level reduction: per-segment EXACT integer power sums of
    cents (n_i, Σc, Σc² — map-side partials, 5 groups), then a
    5-row combine where only Σ(s_i²/n_i) leaves integer arithmetic
    (s_i² would overflow BIGINT; the division is a fixed IEEE step
    per group, summed over 5 rows — the `ingest_mix_shift_chi2` cell
    pattern). F and η² assembled in one final expression, degenerate
    cases (one group, zero variance) guarded as NULL identically in
    CASE.

    Plan: one grouped pass over the dim + a singleton combine —
    O(scan) at any scale.
    """
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("long")
    g = (c.groupBy(F.col("c_mktsegment").alias("seg"))
         .agg(F.count("*").alias("n_i"),
              F.sum(cents).alias("s_i"),
              F.sum(cents * cents).alias("q_i")))
    t = g.agg(F.count("*").alias("k"), F.sum("n_i").alias("n"),
              F.sum("s_i").alias("s"), F.sum("q_i").alias("q"),
              F.sum(F.col("s_i").cast("double") * F.col("s_i")
                    / F.col("n_i")).alias("sg"))
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    ssb = F.col("sg") - sd * sd / F.col("n")
    sst = qd - sd * sd / F.col("n")
    ssw = qd - F.col("sg")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return t.select(
        F.col("k").alias("k_groups"), F.col("n").alias("n_total"),
        F.when(sst > 0, rnd(ssb / sst, 6)).alias("eta_sq"),
        F.when((F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0),
               rnd(f_stat, 6)).alias("f_stat"))


@register("agg_cramers_v", f"""
WITH j AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS prio
  FROM orders JOIN customer ON o_custkey = c_custkey
), cell AS (SELECT seg, prio, count(*)::BIGINT AS obs FROM j GROUP BY 1, 2),
rt AS (SELECT seg, sum(obs)::BIGINT AS r FROM cell GROUP BY 1),
ct AS (SELECT prio, sum(obs)::BIGINT AS c FROM cell GROUP BY 1),
tot AS (SELECT sum(obs)::BIGINT AS n FROM cell),
grid AS (
  SELECT r.seg, c.prio, r.r, c.c, (SELECT n FROM tot) AS n,
         coalesce(k.obs, 0)::BIGINT AS obs
  FROM rt r CROSS JOIN ct c
  LEFT JOIN cell k ON k.seg = r.seg AND k.prio = c.prio
), chi AS (
  SELECT max(n) AS n,
         count(DISTINCT seg) AS n_rows, count(DISTINCT prio) AS n_cols,
         sum(power(obs::DOUBLE - r::DOUBLE * c / n, 2)
             / (r::DOUBLE * c / n)) AS chi2
  FROM grid
)
SELECT n, (n_rows - 1) * (n_cols - 1) AS dof,
       {sql_rnd('chi2', 4)} AS chi2,
       CASE WHEN least(n_rows, n_cols) > 1 AND n > 0
            THEN {sql_rnd('sqrt(chi2 / (n * (least(n_rows, n_cols) - 1)))', 6)}
       END AS cramers_v
FROM chi
""")
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — effect-size of association between two categorical
    columns (market segment × order priority), the normalized [0,1]
    companion `ingest_mix_shift_chi2`'s raw χ² lacks: comparable
    across tables with different cardinalities, the number a feature-
    redundancy audit reports.

    Shape: fact⋈dim equi-join (AQE broadcast at bench SF), one
    grouped count to a 25-cell contingency, margins as two
    broadcastable rollups, the expectation grid dense via
    CROSS JOIN + LEFT (zero cells kept — χ² needs them). Counts are
    exact integers; each cell's χ² term is one fixed IEEE sequence,
    summed over 25 cells and rounded (the established cell pattern);
    V's degenerate 1×k case guarded as NULL in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = (o.join(c, o.o_custkey == c.c_custkey)
         .select(F.col("c_mktsegment").alias("seg"),
                 F.col("o_orderpriority").alias("prio")))
    cell = j.groupBy("seg", "prio").agg(F.count("*").alias("obs"))
    rt = cell.groupBy("seg").agg(F.sum("obs").alias("r"))
    ct = cell.groupBy("prio").agg(F.sum("obs").alias("c"))
    tot = cell.agg(F.sum("obs").alias("n"))
    grid = (rt.crossJoin(F.broadcast(ct)).join(F.broadcast(tot))
            .join(cell, ["seg", "prio"], "left")
            .select("seg", "prio", "r", "c", "n",
                    F.coalesce(F.col("obs"), F.lit(0)).alias("obs")))
    exp = F.col("r").cast("double") * F.col("c") / F.col("n")
    term = F.pow(F.col("obs").cast("double") - exp, 2) / exp
    chi = grid.agg(F.max("n").alias("n"),
                   F.countDistinct("seg").alias("n_rows"),
                   F.countDistinct("prio").alias("n_cols"),
                   F.sum(term).alias("chi2"))
    v = F.sqrt(F.col("chi2")
               / (F.col("n") * (F.least("n_rows", "n_cols") - 1)))
    return chi.select(
        "n", ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).alias("dof"),
        rnd(F.col("chi2"), 4).alias("chi2"),
        F.when((F.least("n_rows", "n_cols") > 1) & (F.col("n") > 0),
               rnd(v, 6)).alias("cramers_v"))


_ACF_LAGS = tuple(range(1, 8))


def _acf_oracle() -> str:
    lag_cols = ", ".join(
        f"lag(x, {L}) OVER (ORDER BY day) AS p{L}" for L in _ACF_LAGS)
    branches = []
    for L in _ACF_LAGS:
        num = (f"(n::DOUBLE * sxp - sx::DOUBLE * sp)")
        den = (f"(sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx)"
               f" * sqrt(n::DOUBLE * spp - sp::DOUBLE * sp))")
        branches.append(f"""
SELECT {L} AS lag, n AS n_pairs,
       CASE WHEN n::DOUBLE * sxx - sx::DOUBLE * sx > 0
             AND n::DOUBLE * spp - sp::DOUBLE * sp > 0
            THEN round({num} / {den}, 6) END AS acf
FROM (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(p{L})::BIGINT AS sp, sum(x * p{L})::BIGINT AS sxp,
         sum(x * x)::BIGINT AS sxx, sum(p{L} * p{L})::BIGINT AS spp
  FROM pairs WHERE p{L} IS NOT NULL
)""")
    return f"""
WITH daily AS MATERIALIZED (
    SELECT o_orderdate AS day,
           sum(floor(o_totalprice / 1000.0 + 0.5)::BIGINT)::BIGINT AS x
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    GROUP BY 1
), pairs AS MATERIALIZED (
    SELECT x, {lag_cols} FROM daily
)""" + " UNION ALL ".join(branches)


@register("agg_acf_multi_lag", _acf_oracle())
def agg_acf_multi_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation FUNCTION of the daily order-revenue series —
    Pearson r of (x_t, x_{t−L}) for lags 1..7, the weekly-seasonality
    diagnostic curve that `win_autocorr_lag1` (one point) and
    `agg_seasonality_strength` (one ratio) only sample: a lag-7 spike
    against a flat lag-1..6 floor IS weekly seasonality.

    Shape: exact-KILODOLLAR daily rollup (one shuffle) to ~2400 rows
    — integer k$ (not cents) so the x² power sums stay inside int64
    through ~10^6× replica scale (cents overflowed at 1×: sum(x²) ~
    2e19 under Spark ANSI; the coarser unit is deterministic in both
    engines and statistically irrelevant for the diagnostic); ONE
    window pass carries all 7 lag columns (one dim-sized sort, not 7);
    per-lag power sums are FILTER-conditional aggregates of the same
    one-row reduction, unpivoted to 7 rows via the map-explode
    pattern. Each ACF value is one fixed IEEE expression over exact
    BIGINT sums (the `win_autocorr_lag1` explicit-moment discipline),
    zero-variance guarded NULL in both engines.
    """
    # non-null (day, price) pairs only, both engines — NULL days sort
    # differently across engines in the lag window (r7 null sweep)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull())
    kilo = F.floor(F.col("o_totalprice") / 1000.0 + F.lit(0.5)).cast("long")
    daily = (o.groupBy(F.col("o_orderdate").alias("day"))
             .agg(F.sum(kilo).alias("x")))
    w = Window.orderBy("day")
    pairs = daily.select(
        "x", *[F.lag("x", L).over(w).alias(f"p{L}") for L in _ACF_LAGS])
    aggs = []
    for L in _ACF_LAGS:
        p = F.col(f"p{L}")
        ok = p.isNotNull()
        aggs += [
            F.count(F.when(ok, 1)).alias(f"n{L}"),
            F.sum(F.when(ok, F.col("x"))).alias(f"sx{L}"),
            F.sum(p).alias(f"sp{L}"),
            F.sum(F.col("x") * p).alias(f"sxp{L}"),
            F.sum(F.when(ok, F.col("x") * F.col("x"))).alias(f"sxx{L}"),
            F.sum(p * p).alias(f"spp{L}"),
        ]
    one = pairs.agg(*aggs)
    structs = []
    for L in _ACF_LAGS:
        n = F.col(f"n{L}").cast("double")
        sx = F.col(f"sx{L}").cast("double")
        sp = F.col(f"sp{L}").cast("double")
        vx = n * F.col(f"sxx{L}") - sx * F.col(f"sx{L}")
        vp = n * F.col(f"spp{L}") - sp * F.col(f"sp{L}")
        acf = ((n * F.col(f"sxp{L}") - sx * sp)
               / (F.sqrt(vx) * F.sqrt(vp)))
        structs.append(F.struct(
            F.lit(L).alias("lag"),
            F.col(f"n{L}").alias("n_pairs"),
            F.when((vx > 0) & (vp > 0), F.round(acf, 6)).alias("acf")))
    return (one.select(F.explode(F.array(*structs)).alias("r"))
            .select("r.lag", "r.n_pairs", "r.acf"))


@register("agg_lorenz_curve", f"""
WITH spend AS (
    SELECT c_mktsegment AS segment, c_custkey,
           {sql_rnd('sum(o_totalprice)', 2)} AS s
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY 1, 2
), ranked AS (
    SELECT segment, c_custkey, s,
           ntile(10) OVER (PARTITION BY segment
                           ORDER BY s, c_custkey) AS decile
    FROM spend
), d AS (
    SELECT segment, decile,
           count(*)::BIGINT AS n_d,
           sum(floor(s * 100.0 + 0.5)::HUGEINT) AS sc_d
    FROM ranked GROUP BY 1, 2
)
SELECT segment, decile,
       {sql_rnd('''sum(n_d) OVER (PARTITION BY segment ORDER BY decile)::DOUBLE
                / sum(n_d) OVER (PARTITION BY segment)''', 6)}
           AS cum_cust_share,
       {sql_rnd('''sum(sc_d) OVER (PARTITION BY segment ORDER BY decile)::DOUBLE
                / sum(sc_d) OVER (PARTITION BY segment)''', 6)}
           AS cum_rev_share
FROM d
""")
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve decile points per segment — the CURVE behind
    `agg_gini`'s single number and `agg_abc_classification`'s cutoffs:
    customers ranked by total spend (2dp-rounded, custkey tie-break)
    into ntile(10) deciles; each decile reports the cumulative
    customer share and cumulative revenue share. Reading it off:
    cum_rev_share at decile 8 = the revenue share of the bottom 80%.

    Scale shape: one fact shuffle (per-customer spend), then — r10
    rewrite (r9 verdict tasks 1+2) — the PARTITIONED exact-rank
    primitive deciles each segment without funneling a segment's
    customers (entity-scale: grows with the data, split across only
    ~5 segment partitions) through one window task; the 10-row-per-
    segment aggregate and its dim-sized cumulative windows follow.
    Ranking on the ROUNDED spend keeps the cross-engine order
    deterministic away from rounding boundaries (the
    `dedup_survivorship` discipline), and the share numerators are
    EXACT 128-bit integer cents sums per decile (decimal(38,0)/
    HUGEINT — the r5 advisor flagged the earlier float per-decile
    sums, whose association order is engine/partition dependent)
    with ONE final IEEE division each, so the 6dp shares are
    structurally drift-free.
    """
    from manual_data_ingest_spark.functions.ranking import (
        ntile_from_rank, with_exact_partitioned_rank)

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (c.join(o, c.c_custkey == o.o_custkey)
             .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
             .agg(rnd(F.sum("o_totalprice"), 2).alias("s")))
    ranked = (with_exact_partitioned_rank(
        spend, ["segment"], "s", ["c_custkey"],
        rank_col="_rk", total_col="_n")
        .withColumn("decile",
                    ntile_from_rank(F.col("_rk"), F.col("_n"), 10))
        .drop("_rk", "_n"))
    d = (ranked.groupBy("segment", "decile")
         .agg(F.count("*").alias("n_d"),
              F.sum(F.floor(F.col("s") * 100.0 + 0.5)
                    .cast("decimal(19,0)")).alias("sc_d")))
    wcum = Window.partitionBy("segment").orderBy("decile")
    wall = Window.partitionBy("segment")
    return d.select(
        "segment", "decile",
        rnd(F.sum("n_d").over(wcum).cast("double")
            / F.sum("n_d").over(wall), 6).alias("cum_cust_share"),
        rnd(F.sum("sc_d").over(wcum).cast("double")
            / F.sum("sc_d").over(wall).cast("double"), 6)
        .alias("cum_rev_share"))


@register("agg_approx_topk_merge", """
SELECT rank, item, n_events FROM (
  SELECT row_number() OVER (ORDER BY count(*) DESC, event_type) AS rank,
         event_type AS item,
         count(*)::BIGINT AS n_events
  FROM events
  WHERE event_type IS NOT NULL
  GROUP BY event_type
) WHERE rank <= 5
""")
def agg_approx_topk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's native mergeable top-k sketch pipeline —
    `approx_top_k_accumulate` per day → `approx_top_k_combine` →
    `approx_top_k_estimate` — the heavy-hitters twin of
    `agg_hll_partitioned`'s HLL merge: per-shard/per-day sketches are
    built independently (map-side, one pass), shipped as opaque
    binary state, and merged without re-reading the data — the shape
    that lets a 100 TB deployment keep per-partition leaderboards and
    answer global ones from sketch state alone. (`agg_heavy_hitters`
    is the hand-rolled SpaceSaving equivalent; this exercises the
    engine-native API surface.)

    Exactness precondition, machine-checked by the oracle at 3 SFs:
    with maxItemsTracked (100) ≥ the item cardinality (5 event
    types), SpaceSaving degenerates to exact counting and the merge
    is lossless, so the estimate equals the exact GROUP BY and ties
    cannot bite (the emitted ranking re-sorts on (count DESC, item)
    rather than trusting sketch order). Beyond the precondition the
    sketch approximates — the documented trade, not an error.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("event_type").isNotNull())
             .groupBy(F.window("ts", "1 day"))
             .agg(F.expr("approx_top_k_accumulate(event_type, 100)")
                  .alias("sk")))
    # engine-bug guard (verified on Spark 4.1.2): approx_top_k_combine
    # over ZERO input rows crashes with scala.MatchError: null instead
    # of returning null — the one aggregate in the repo that cannot see
    # an empty relation. The isEmpty probe is one job over the ~31-row
    # daily aggregate, correctness-only (the empty sweep hits this).
    if daily.isEmpty():
        return spark.createDataFrame(
            [], "rank int, item string, n_events long")
    # estimate the FULL tracked set (100 = maxItemsTracked), then apply
    # the deterministic (count DESC, item) rank and cut to k=5 HERE —
    # asking the sketch for exactly k would leave boundary-tie
    # SELECTION to sketch internals (adversarial fixture: dozens of
    # singleton event types tie at the k-th count), while the rank-5
    # cut over the exact tracked counts ties-break identically on both
    # engines.
    merged = daily.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(sk, 100), 100)")
        .alias("top"))
    flat = (merged.select(F.explode("top").alias("t"))
            .select(F.col("t.item").alias("item"),
                    F.col("t.count").cast("long").alias("n_events")))
    w = Window.orderBy(F.col("n_events").desc(), "item")
    return (flat.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("rank", "item", "n_events"))


@register("agg_benford_test", f"""
WITH digits AS (
  SELECT o_orderpriority AS priority,
         substring(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::INT AS d
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        AND o_totalprice >= 1
), obs AS (
  SELECT priority, d, count(*)::BIGINT AS o
  FROM digits GROUP BY 1, 2
), tot AS (SELECT priority, count(*)::BIGINT AS n FROM digits GROUP BY 1),
grid AS (
  SELECT t.priority, t.n, g.d,
         coalesce(o.o, 0)::BIGINT AS o,
         log10((g.d + 1.0::DOUBLE) / g.d::DOUBLE) AS p
  FROM tot t
  CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) g
  LEFT JOIN obs o ON o.priority = t.priority AND o.d = g.d
)
SELECT priority, max(n)::BIGINT AS n,
       {sql_rnd('sum((o::DOUBLE - n::DOUBLE * p) * (o::DOUBLE - n::DOUBLE * p)'
                ' / (n::DOUBLE * p))', 4)} AS chi2,
       ({sql_rnd('sum((o::DOUBLE - n::DOUBLE * p) * (o::DOUBLE - n::DOUBLE * p)'
                 ' / (n::DOUBLE * p))', 4)} < 21.666) AS benford_ok
FROM grid GROUP BY priority
""")
def agg_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts per priority —
    the classic fraud / fabricated-data screen for ingest QA: natural
    multi-scale amounts follow P(d) = log10(1+1/d); a feed whose
    digits don't is manufactured, truncated, or unit-corrupted. Emits
    the chi-square distance (df = 8) and a pass flag at the 0.005
    critical value 21.666.

    Determinism: the first digit comes from the INTEGER-part string
    (identical text on both engines — no float log10 of the value),
    observed counts are exact BIGINT on a full 9-digit grid (absent
    digits count 0 — dropping them would silently lower df), expected
    shares are the same fixed IEEE log10 expression, and the flag
    compares the ROUNDED 4dp chi2 so both engines test the identical
    double. Scale: map-side digit extraction, one partial-agg shuffle
    on (priority, digit) — 45 cells; the grid join is dim-sized.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & (F.col("o_totalprice") >= 1))
    digits = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.substring(F.floor("o_totalprice").cast("long").cast("string"),
                    1, 1).cast("int").alias("d"))
    obs = digits.groupBy("priority", "d").agg(F.count("*").alias("o"))
    tot = digits.groupBy("priority").agg(F.count("*").alias("n"))
    nine = spark.range(1, 10).select(F.col("id").cast("int").alias("gd"))
    grid = (tot.crossJoin(F.broadcast(nine))
            .join(obs, (tot.priority == obs.priority) & (obs.d == F.col("gd")),
                  "left")
            .select(tot.priority.alias("priority"), "n", "gd",
                    F.coalesce(obs.o, F.lit(0)).alias("o"),
                    F.log10((F.col("gd") + F.lit(1.0)) /
                            F.col("gd").cast("double")).alias("p")))
    dev = (F.col("o").cast("double") - F.col("n").cast("double") * F.col("p"))
    chi2 = rnd(F.sum(dev * dev / (F.col("n").cast("double") * F.col("p"))), 4)
    return (grid.groupBy("priority")
            .agg(F.max("n").alias("n"),
                 chi2.alias("chi2"),
                 (chi2 < 21.666).alias("benford_ok")))


@register("agg_exchange_reuse", """
WITH yr AS (
  SELECT year(o_orderdate) AS y,
         sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
)
SELECT a.y AS y,
       floor((a.cents::DOUBLE / b.cents::DOUBLE) * 1e6 + 0.5) / 1e6
           AS yoy_ratio
FROM yr a JOIN yr b ON b.y = a.y + 1
""")
def agg_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCHANGE REUSE — one shuffle feeding two plan consumers: the
    year-level revenue aggregate is consumed twice (each year joined to
    its successor for a year-over-year ratio), and Spark plans the
    second consumer as a `ReusedExchange` over the FIRST aggregation's
    shuffle files instead of recomputing the fact scan + partial aggs.
    tests/test_plans.py asserts the node on the executed plan.

    This is the engine mechanism that makes self-join analytics
    (period-over-period, share-of-total, cohort-vs-cohort) pay for the
    fact pass ONCE — at 100 TB the difference between one
    orders-table scan and two. It falls out of expressing both
    consumers over the SAME DataFrame object (same canonical plan);
    re-deriving the aggregate from a second `spark.read` would defeat
    the reuse, which is the design rule this operator records.
    Per-row BIGINT-cent quantization (the flagship_q9/q11 rule) keeps
    the group sums exact on both engines; the ratio is rounded to 6dp.
    """
    o = load_table(spark, sf_dir, "orders")
    yr = (o.groupBy(F.year("o_orderdate").alias("y"))
          .agg(F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5)
                     .cast("long")).alias("cents")))
    a, b = yr.alias("a"), yr.alias("b")
    return (a.join(b, F.col("b.y") == F.col("a.y") + 1)
            .select(F.col("a.y").alias("y"),
                    (F.floor((F.col("a.cents").cast("double")
                              / F.col("b.cents").cast("double"))
                             * 1e6 + F.lit(0.5)) / 1e6).alias("yoy_ratio")))


@register("agg_grouping_id", """
SELECT event_type,
       GROUPING(event_type)::INTEGER AS is_total,
       count(*) AS n,
       sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS cents
FROM events
GROUP BY ROLLUP(event_type)
""")
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`grouping()` over a ROLLUP — the only correct way to tell a
    rollup TOTAL row from a genuine NULL-key group: both render
    event_type as NULL, and on the null-injected fixture both rows
    EXIST, so any consumer keying on `event_type IS NULL` silently
    merges real null-typed events into the grand total. The grouping
    flag is engine-computed metadata (bit i of grouping_id), identical
    in Spark and DuckDB, which makes the disambiguation portable —
    the rollup/cube family (`agg_rollup`/`agg_cube`/
    `agg_grouping_sets`) left this surface undemonstrated.
    Per-row BIGINT-cent quantization (q9/q11 rule) keeps the sums
    exact.
    """
    ev = load_table(spark, sf_dir, "events")
    return (ev.rollup("event_type")
            .agg(F.grouping("event_type").cast("int").alias("is_total"),
                 F.count(F.lit(1)).alias("n"),
                 F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
                 .alias("cents"))
            .select("event_type", "is_total", "n", "cents"))
