"""Window functions (SURVEY.md §2.5).

Reference behavior reconstructed: per-entity record ordering,
latest-N selection, sessionized diffs. Determinism rule: every window
ORDER BY ends in a unique key (orderkey / event_id / custkey) so the
total order — and therefore rank/lag/lead output — is reproducible.

Scale note: window partitions shuffle on partitionBy keys; all keys
here (custkey, user_id, nationkey) are high-cardinality or bounded-
fanout, so no single partition explodes. Global windows (sort_multi_
null in §2.6) are the only single-reducer risk and are confined to
dim-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import (epoch_day, rnd,
                                                         sql_rnd)
from manual_data_ingest_spark.registry import register


@register("win_rank_trio", """
SELECT o_orderkey, o_custkey,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""")
def win_rank_trio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select("o_orderkey", "o_custkey",
                    F.row_number().over(w).alias("rn"),
                    F.rank().over(w).alias("rnk"),
                    F.dense_rank().over(w).alias("drnk"))


@register("win_topk_group", """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) <= 3
""")
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-3 orders per customer; Spark pushes a WindowGroupLimit below
    # the shuffle (partial top-k per map task) — the per-group analog of
    # TakeOrderedAndProject.
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice"))


@register("win_lag_lead", """
SELECT event_id, user_id,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       (epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER w)) / 1000000.0
           AS gap_sec
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
""")
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    # inter-event gaps per user; gap computed on epoch-µs longs then one
    # IEEE divide — bit-identical across engines.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1000000.0)
        .alias("gap_sec"))


@register("win_running_sum", f"""
SELECT o_custkey, o_orderkey,
       {sql_rnd('''sum(o_totalprice) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')}
           AS running_total
FROM orders
""")
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select("o_custkey", "o_orderkey",
                    rnd(F.sum("o_totalprice").over(w)).alias("running_total"))


@register("win_moving_range", f"""
SELECT event_id, user_id,
       {sql_rnd('''avg(value) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts::TIMESTAMP)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)''', 4)}
           AS avg_1h
FROM events
""")
def win_moving_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # trailing-1-hour average: RANGE frame over epoch-µs (a long), so the
    # frame boundary is exact on both engines (no second-truncation drift).
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"))
         .rangeBetween(-3_600_000_000, 0))
    return ev.select("event_id", "user_id",
                     rnd(F.avg("value").over(w), 4).alias("avg_1h"))


@register("win_ntile_firstlast", """
SELECT c_custkey, c_nationkey,
       ntile(4) OVER w AS bal_quartile,
       first_value(c_custkey) OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal, c_custkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS poorest,
       last_value(c_custkey)  OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal, c_custkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS richest
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""")
def win_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # last_value needs the explicit full frame — the default frame ends at
    # CURRENT ROW, a classic silent-wrong-answer trap on both engines.
    # r10: 25 nations over entity-scale customers is the bounded-
    # partition window class — ntile rides the partitioned rank
    # primitive (+ the SQL tile rule), and first/last ARE the rank
    # endpoints (_rk == 1 / _rk == n), derived per nation and
    # broadcast back (null-safe: a NULL nation is a group). The rank's
    # NULLS LAST order also matches the oracle exactly, where the old
    # Spark window defaulted nulls FIRST on c_acctbal.
    from manual_data_ingest_spark.functions.ranking import (
        ntile_from_rank, with_exact_partitioned_rank)

    c = load_table(spark, sf_dir, "customer")
    ranked = with_exact_partitioned_rank(
        c, ["c_nationkey"], "c_acctbal", ["c_custkey"],
        rank_col="_rk", total_col="_n")
    ends = (ranked.filter((F.col("_rk") == 1) | (F.col("_rk") == F.col("_n")))
            .groupBy(F.col("c_nationkey").alias("_e_nk"))
            .agg(F.min(F.when(F.col("_rk") == 1, F.col("c_custkey")))
                 .alias("poorest"),
                 F.min(F.when(F.col("_rk") == F.col("_n"),
                              F.col("c_custkey"))).alias("richest")))
    return (ranked.join(F.broadcast(ends),
                        F.col("c_nationkey").eqNullSafe(F.col("_e_nk")))
            .select("c_custkey", "c_nationkey",
                    ntile_from_rank(F.col("_rk"), F.col("_n"), 4)
                    .alias("bal_quartile"),
                    "poorest", "richest"))


@register("win_dist_ranks", f"""
SELECT c_custkey, c_nationkey,
       {sql_rnd('percent_rank() OVER w', 6)} AS pct_rank,
       {sql_rnd('cume_dist() OVER w', 6)} AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
""")
def win_dist_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # relative-position windows: percent_rank and cume_dist depend only
    # on peer groups (ties share values), so they are deterministic
    # without a unique tie-break — unlike row_number (§2.5 discipline).
    # r10 (bounded-partition window class): both are PURE RANK
    # ARITHMETIC — percent_rank = (peer_first−1)/(n−1) (0 when n=1,
    # the SQL rule) and cume_dist = peer_last/n — so one partitioned-
    # rank pass + a per-(nation, balance) peer-endpoint aggregate
    # joined back (co-keyed shuffle join, null-safe: NULL balances are
    # one peer group on both engines) replaces the per-nation serial
    # windows.
    from manual_data_ingest_spark.functions.ranking import (
        with_exact_partitioned_rank)

    c = load_table(spark, sf_dir, "customer")
    ranked = with_exact_partitioned_rank(
        c, ["c_nationkey"], "c_acctbal", ["c_custkey"],
        rank_col="_rn", total_col="_n")
    peers = (ranked.groupBy(F.col("c_nationkey").alias("_p_nk"),
                            F.col("c_acctbal").alias("_p_bal"))
             .agg(F.min("_rn").alias("_r1"), F.max("_rn").alias("_r2")))
    pct = F.when(F.col("_n") > 1,
                 (F.col("_r1") - 1).cast("double") / (F.col("_n") - 1)) \
           .otherwise(F.lit(0.0))
    return (ranked.join(peers,
                        F.col("c_nationkey").eqNullSafe(F.col("_p_nk"))
                        & F.col("c_acctbal").eqNullSafe(F.col("_p_bal")))
            .select("c_custkey", "c_nationkey",
                    rnd(pct, 6).alias("pct_rank"),
                    rnd(F.col("_r2").cast("double") / F.col("_n"), 6)
                    .alias("cume")))


@register("win_conditional", """
SELECT event_id, user_id,
       (sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING))::BIGINT AS errors_so_far,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS events_so_far
FROM events
""")
def win_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    # conditional running aggregate: per user, errors-so-far alongside
    # events-so-far over the event timeline — the error-rate monitor
    # shape; the CASE rides inside the window sum, one shuffle total
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w).alias("errors_so_far"),
        F.count("*").over(w).alias("events_so_far"))


@register("win_forward_fill", """
WITH e AS (
    SELECT event_id, user_id, ts::TIMESTAMP AS ts,
           CASE WHEN value < 0.1 THEN NULL ELSE value END AS v
    FROM events
)
SELECT event_id, user_id,
       last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS v_filled
FROM e
""")
def win_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LOCF forward fill: sensor dropouts (here: values < 0.1 nulled as
    # stand-ins) carry the last observed value forward per user —
    # last(ignorenulls=True) over an expanding frame; rows before any
    # observation stay NULL. One shuffle on the entity key.
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") < 0.1, None).otherwise(F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.last(v, ignorenulls=True).over(w).alias("v_filled"))


@register("win_sessionize", """
WITH ordered AS (
    SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
           CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
                  OR ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w
                     > INTERVAL 12 HOUR
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, event_id, ts, value,
           (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING))::BIGINT AS session_no
    FROM ordered
)
SELECT user_id, session_no,
       count(*)  AS n_events,
       min(ts)   AS session_start,
       max(ts)   AS session_end,
       floor(sum(value) * 100.0 + 0.5) / 100.0 AS sum_value
FROM sess
GROUP BY user_id, session_no
""")
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): the batch twin of
    ``stream_session``'s session windows, over the full history.

    A session breaks when the per-user inter-event gap exceeds 12 h
    (gap chosen by measurement: ~3 events/session on this fixture at
    every SF). Three steps — lag to flag session starts, running sum to
    number sessions, aggregate per session — all partitioned by
    ``user_id``, and the final groupBy key ``(user_id, session_no)`` is
    a superset of the window key, so Catalyst satisfies the aggregate's
    distribution with the window's existing hashpartitioning(user_id):
    ONE shuffle end-to-end at any scale (plan-asserted).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-exact gap: fixture timestamps carry sub-second parts, so whole-
    # second casts would mis-classify gaps within 1 s of the boundary
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(gap_us.isNull() | (gap_us > 12 * 3600 * 1_000_000),
                      1).otherwise(0)
    run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ev.withColumn("new_sess", new_sess)
            .withColumn("session_no", F.sum("new_sess").over(run))
            .groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 rnd(F.sum("value")).alias("sum_value")))


@register("win_period_growth", """
WITH monthly AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           sum(o_totalprice) AS rev
    FROM orders GROUP BY 1
)
SELECT strftime(month, '%Y-%m') AS month,
       floor(rev * 100.0 + 0.5) / 100.0 AS revenue,
       floor((rev / lag(rev) OVER (ORDER BY month) - 1.0) * 1000000.0
             + 0.5) / 1000000.0 AS mom_growth
FROM monthly
""")
def win_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period KPI: monthly revenue with month-over-month
    growth (NULL for the first month) — the standard reporting shape
    layered as agg-then-window.

    Scale shape matters here: the lag window is GLOBAL (one series),
    but it runs on the AGGREGATED relation — at most one row per month
    — so the single-partition window touches dozens of rows while the
    heavy lifting (summing orders) stays a partial+final hash agg over
    the cluster. The anti-pattern is lagging over raw rows; the
    monthly series is the only thing small enough to order globally.
    Growth is a ratio of two rounded-independently sums, so it is
    rounded at 6dp — divergence would need ~1e-6 relative drift in a
    2dp-stable sum (PARITY discipline).
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = (o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
               .agg(F.sum("o_totalprice").alias("rev")))
    w = Window.orderBy("m")
    return (monthly
            .select(F.date_format("m", "yyyy-MM").alias("month"),
                    rnd(F.col("rev")).alias("revenue"),
                    rnd(F.col("rev") / F.lag("rev").over(w) - 1.0, 6)
                    .alias("mom_growth")))


@register("win_cumulative_distinct", """
WITH days AS (SELECT DISTINCT ts::DATE AS day FROM events),
first_seen AS (SELECT user_id, min(ts::DATE) AS day FROM events GROUP BY 1),
new_users AS (SELECT day, count(*) AS n_new FROM first_seen GROUP BY day)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       coalesce(n.n_new, 0)::BIGINT AS new_users,
       sum(coalesce(n.n_new, 0)) OVER (ORDER BY d.day
                                       ROWS UNBOUNDED PRECEDING)::BIGINT
           AS cum_distinct_users
FROM days d LEFT JOIN new_users n ON d.day = n.day
""")
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve metric.

    The naive form (`count(DISTINCT user) OVER (ORDER BY day ROWS
    UNBOUNDED PRECEDING)`) is unsupported AND quadratic-in-state on
    any engine; the scalable identity is: a user contributes to the
    cumulative count exactly on their FIRST day → per-user min(day)
    (one shuffle, partial-aggregated), count first-seens per day, then
    a running sum over the ~O(days) series — the same
    agg-before-global-window discipline as `win_period_growth`.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    days = ev.select(day.alias("day")).distinct()
    new = (ev.groupBy("user_id").agg(F.min(day).alias("day"))
           .groupBy("day").agg(F.count("*").alias("n_new")))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (days.join(new, "day", "left")
            .select("day", F.coalesce("n_new", F.lit(0)).alias("new_users"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "new_users",
                    F.sum("new_users").over(w).alias("cum_distinct_users")))


@register("win_zscore_outliers", """
WITH s AS (
    SELECT event_id, event_type, value,
           avg(value)        OVER (PARTITION BY event_type) AS mu,
           stddev_pop(value) OVER (PARTITION BY event_type) AS sd
    FROM events
)
SELECT event_id, event_type,
       floor(((value - mu) / sd) * 1000000.0 + 0.5) / 1000000.0 AS zscore
FROM s
WHERE sd > 0 AND abs((value - mu) / sd) >= 3.0
""")
def win_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging (|z| ≥ 3) — the row-level QC
    twin of `agg_stats`: the same pass that computes group moments
    tags the individual violating rows for quarantine.

    r10 scale shape: per-type moments as a tiny aggregate BROADCAST-
    JOINED back (null-safe — NULL event_type is a group, like the
    window form it replaces). The r1 window form (unbounded frame per
    type) put the whole stream through one task per type; the join
    form is two narrow passes with NO wide shuffle at all — the
    crossover its own docstring recorded, now taken. Population
    stddev (not sample) matches `stddev_pop` across engines; z
    rounded 6dp, selection on the unrounded value identically in
    both.
    """
    ev = load_table(spark, sf_dir, "events")
    mom = (ev.groupBy(F.col("event_type").alias("_m_et"))
           .agg(F.avg("value").alias("_mu"),
                F.stddev_pop("value").alias("_sd")))
    # a zero-variance group has no outliers by definition — and the
    # explicit sd > 0 guard keeps Spark's ANSI division from throwing
    # where DuckDB's x/0 quietly NULLs (tiny groups appear the moment
    # event_type carries adversarial values)
    z = F.when(F.col("_sd") > 0,
               (F.col("value") - F.col("_mu")) / F.col("_sd"))
    return (ev.join(F.broadcast(mom),
                    F.col("event_type").eqNullSafe(F.col("_m_et")))
            .select("event_id", "event_type", z.alias("z"))
            .filter(F.abs(F.col("z")) >= 3.0)
            .select("event_id", "event_type",
                    rnd(F.col("z"), 6).alias("zscore")))


@register("win_ewma", """
SELECT user_id,
       floor(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> acc * 0.75 + x * 0.25)
             * 1000000.0 + 0.5) / 1000000.0 AS ewma,
       count(*)::BIGINT AS n_events
FROM events
GROUP BY user_id
""")
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per key — entirely JVM-side.

    The recurrence y_i = (1-a)*y_{i-1} + a*x_i (a=0.25, y_0=x_0) is a
    sequential fold, which naive implementations push into a Python UDF.
    Here it stays in codegen: collect the per-key series as a struct
    array (one shuffle), `array_sort` pins the (ts, event_id) total
    order, and `F.aggregate` folds the recurrence inside whole-stage
    codegen — both engines evaluate the identical IEEE op sequence, so
    the result is hash-exact. At 100 TB the state per key is one array
    bounded by per-key event count (sessions, not the corpus); keys
    partition freely. A 20-byte running-state `transformWithState`
    variant covers the unbounded-stream case (streaming/ops.py).
    """
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    vals = F.transform(arr, lambda s: s["value"])
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.75) + x * F.lit(0.25))
    return (ev.groupBy("user_id")
            .agg(rnd(fold, 6).alias("ewma"),
                 F.count("*").alias("n_events")))


@register("win_funnel_steps", f"""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click_after_view,
       (SELECT count(*) FROM p) AS n_buy_after_click,
       {sql_rnd("(SELECT count(*) FROM p)::DOUBLE"
                " / (SELECT count(*) FROM v)", 6)} AS conversion
""")
def win_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: view -> click-after-view ->
    purchase-after-click, each step anchored at the FIRST qualifying
    event strictly after the previous step's anchor.

    The MATCH_RECOGNIZE-shaped question every product-analytics store
    answers. Three filter+groupBy passes over the fact, each keyed on
    user_id; the tiny per-step anchor tables broadcast back onto the
    fact scan, so the fact never shuffles — at 100 TB this is three
    scans (or one, if the engine fuses CASE-filtered mins after the
    first anchor is materialized) versus a stateful sequential scan
    that cannot parallelize.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (ev.join(F.broadcast(v), "user_id")
         .filter((F.col("event_type") == "click")
                 & (F.col("ts") > F.col("t_view")))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.join(F.broadcast(c), "user_id")
         .filter((F.col("event_type") == "purchase")
                 & (F.col("ts") > F.col("t_click")))
         .groupBy("user_id").agg(F.min("ts").alias("t_buy")))
    nv = v.agg(F.count("*").alias("n_view"))
    nc = c.agg(F.count("*").alias("n_click_after_view"))
    np_ = p.agg(F.count("*").alias("n_buy_after_click"))
    return (nv.crossJoin(nc).crossJoin(np_)
            .select("n_view", "n_click_after_view", "n_buy_after_click",
                    # NULL (not ANSI error) when the funnel top is empty
                    # — the empty-partition backfill case
                    rnd(F.when(F.col("n_view") > 0,
                               F.col("n_buy_after_click").cast("double")
                               / F.col("n_view")), 6).alias("conversion")))


@register("win_retention_cohorts", """
WITH firstday AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS offset_days,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN firstday f ON e.user_id = f.user_id
GROUP BY 1, 2
""")
def win_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    distinct on each day-offset they return.

    The product-analytics staple. Two shuffles: first-day per user
    (key = user), then the (cohort, offset) count-distinct — whose
    distinct-by-user rewrite rides the SAME user partitioning, so AQE
    plans the second exchange as a partial reuse. At 100 TB cohort_day
    is the natural partition column of the output table and the
    first-day relation is a compact per-user dim maintained
    incrementally (`ingest_incremental_agg` pattern) rather than
    recomputed from history.
    """
    ev = load_table(spark, sf_dir, "events")
    firstday = (ev.groupBy("user_id")
                .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day")))
    return (ev.join(firstday, "user_id")
            .groupBy("cohort_day",
                     F.datediff(F.date_trunc("day", F.col("ts")),
                                F.col("cohort_day")).alias("offset_days"))
            .agg(F.countDistinct("user_id").alias("n_active")))


@register("win_streak_days", """
WITH days AS (
  SELECT DISTINCT user_id, (date_trunc('day', ts))::DATE AS d FROM events
), g AS (
  SELECT user_id, d,
         d - (row_number() OVER (PARTITION BY user_id ORDER BY d))::INT
             AS anchor
  FROM days
), streaks AS (
  SELECT user_id, anchor, count(*) AS len FROM g GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_streaks,
       max(len) AS longest_streak,
       sum(len)::BIGINT AS active_days
FROM streaks GROUP BY user_id
""")
def win_streak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands idiom: distinct active days minus their row_number
    collapse each run of consecutive dates to one shared anchor date,
    so streaks become plain groups. Two key-local shuffles (distinct
    days, then the per-user rollup riding the same partitioning); no
    self-joins, no iteration — the shape that holds when 'user' is a
    billion keys. Engagement metrics and retention-risk flags are the
    consumers.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (ev.select("user_id",
                      F.to_date(F.date_trunc("day", "ts")).alias("d"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    g = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = g.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return (streaks.groupBy("user_id")
            .agg(F.count("*").alias("n_streaks"),
                 F.max("len").alias("longest_streak"),
                 F.sum("len").alias("active_days")))


@register("win_rolling_wau", """
WITH du AS (
  SELECT DISTINCT (date_trunc('day', ts))::DATE AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day FROM du
)
SELECT d.day,
       count(DISTINCT u.user_id) AS wau
FROM days d JOIN du u
  ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
""")
def win_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) — the dashboard metric
    SQL window functions cannot express (COUNT(DISTINCT) is not a
    window aggregate in either engine).

    Rewritten as a banded self-join: distinct (day, user) pairs join
    the day spine on a 7-day band, then count-distinct per anchor day.
    The (day, user) relation is the COMPACT form (≤ users × days
    rows), each row lands in ≤ 7 anchor groups, so the expansion is
    bounded at 7× compact size — at 100 TB this beats any
    per-event window by orders of magnitude because the fact collapses
    to (day, user) FIRST. Exactness distinguishes it from the HLL
    union alternative (`agg_hll_partitioned`), which trades exactness
    for O(sketch) merges when even the compact form is too hot.
    """
    ev = load_table(spark, sf_dir, "events")
    du = (ev.select(F.to_date(F.date_trunc("day", "ts")).alias("day"),
                    "user_id").distinct())
    days = du.select("day").distinct()
    d = days.select(F.col("day").alias("anchor"))
    joined = du.join(d, (F.col("day") >= F.date_sub(F.col("anchor"), 6))
                    & (F.col("day") <= F.col("anchor")))
    return (joined.groupBy(F.col("anchor").alias("day"))
            .agg(F.countDistinct("user_id").alias("wau")))


@register("win_zscore_rolling", f"""
WITH w AS (
  SELECT event_id, user_id, value,
         avg(value) OVER win AS mu,
         stddev_pop(value) OVER win AS sigma,
         count(*) OVER win AS n_window
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
       {sql_rnd('(value - mu) / sigma', 6)} AS z_trailing
FROM w
WHERE n_window >= 10 AND sigma > 0.0
  AND abs((value - mu) / sigma) >= 3.0
""")
def win_zscore_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each event scored against the
    mean/stddev of its OWN user's previous 20 events (never including
    itself — the self-exclusion matters: an outlier inside its own
    baseline dilutes its score), flagged at |z| ≥ 3 once the baseline
    has ≥ 10 points.

    This is the streaming-QC twin of the global `win_zscore_outliers`:
    the global form finds distribution outliers after the fact, the
    trailing form finds CHANGES as they arrive (level shifts, sensor
    breaks) and maps 1:1 onto a `transformWithState` deployment (the
    window is bounded → O(1) state per key). One key shuffle; both
    moments ride one window frame.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-20, -1))
    z = (F.col("value") - F.avg("value").over(w)) / \
        F.stddev_pop("value").over(w)
    return (ev.select("event_id", "user_id", "value",
                      F.avg("value").over(w).alias("mu"),
                      F.stddev_pop("value").over(w).alias("sigma"),
                      F.count("*").over(w).alias("n_window"))
            .filter((F.col("n_window") >= 10) & (F.col("sigma") > 0.0))
            .withColumn("z", (F.col("value") - F.col("mu")) / F.col("sigma"))
            .filter(F.abs(F.col("z")) >= 3.0)
            .select("event_id", "user_id", rnd(F.col("z"), 6)
                    .alias("z_trailing")))


@register("win_churn_weekly", f"""
WITH wu AS (
  SELECT DISTINCT user_id, (date_trunc('week', ts))::DATE AS wk FROM events
), weeks AS (
  SELECT DISTINCT wk FROM wu
), paired AS (
  SELECT a.wk, a.user_id,
         CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS retained
  FROM wu a LEFT JOIN wu b
    ON a.user_id = b.user_id AND b.wk = a.wk + 7
  WHERE EXISTS (SELECT 1 FROM weeks w WHERE w.wk = a.wk + 7)
)
SELECT wk,
       count(*) AS n_active,
       (sum(retained))::BIGINT AS n_retained,
       count(*) - sum(retained)::BIGINT AS n_churned,
       {sql_rnd("1.0 - sum(retained)::DOUBLE / count(*)", 6)} AS churn_rate
FROM paired GROUP BY wk
""")
def win_churn_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn: of the users active in week w, how many do NOT
    return in week w+1 — the forward-looking complement of
    `win_retention_cohorts` (which follows cohorts; churn follows
    consecutive periods). The final period is EXCLUDED (its successor
    is unobserved — counting it as churn is the classic
    right-censoring bug, guarded by the EXISTS).

    Fact collapses to distinct (user, week) first (the
    `win_rolling_wau` discipline), then one self-join on the user key
    offset by a week; both sides ride the same user partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    wu = (ev.select("user_id",
                    F.to_date(F.date_trunc("week", "ts")).alias("wk"))
          .distinct())
    weeks = wu.select("wk").distinct()
    nxt = wu.select(F.col("user_id").alias("u2"),
                    F.col("wk").alias("wk2"))
    observed = weeks.select(F.col("wk").alias("wk_obs"))
    paired = (wu.join(nxt, (wu.user_id == nxt.u2)
                      & (nxt.wk2 == F.date_add(wu.wk, 7)), "left")
              .join(observed,
                    F.date_add(wu.wk, 7) == observed.wk_obs, "left_semi")
              .select("wk", "user_id",
                      F.when(F.col("u2").isNull(), 0).otherwise(1)
                      .alias("retained")))
    return (paired.groupBy("wk")
            .agg(F.count("*").alias("n_active"),
                 F.sum("retained").alias("n_retained"),
                 (F.count("*") - F.sum("retained")).alias("n_churned"),
                 rnd(1.0 - F.sum("retained").cast("double") / F.count("*"),
                     6).alias("churn_rate")))


@register("win_seasonal_backtest", """
WITH daily AS (
  SELECT event_type,
         date_trunc('day', ts::TIMESTAMP) AS day,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS total_c
  FROM events
  GROUP BY event_type, date_trunc('day', ts::TIMESTAMP)
), paired AS (
  SELECT a.event_type, a.day, a.total_c AS actual_c, f.total_c AS fc_c
  FROM daily a
  JOIN daily f ON f.event_type = a.event_type
              AND f.day = a.day - INTERVAL 7 DAY
)
SELECT event_type,
       count(*) AS n_days,
       floor(CAST(sum(abs(actual_c - fc_c)) AS DOUBLE) / count(*)
             / 100.0 * 100.0 + 0.5) / 100.0 AS mae,
       floor(100.0 * CAST(sum(abs(actual_c - fc_c)) AS DOUBLE)
             / CAST(sum(actual_c) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
           AS mape_pct,
       floor(CAST(sum(fc_c - actual_c) AS DOUBLE) / count(*)
             / 100.0 * 100.0 + 0.5) / 100.0 AS bias
FROM paired
GROUP BY event_type
""")
def win_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's per-type
    event value with the SAME WEEKDAY one week earlier, then score
    MAE / MAPE / bias per event type — the baseline every forecasting
    pipeline must beat, and the sanity check run nightly over the
    metric warehouse.

    The forecast join is on (type, day−7) — a calendar join, not
    ``lag(7)``: with gap days, "7 rows back" silently becomes a
    different horizon per row, which is the classic backtest bug.
    Daily totals are EXACT integer cents, so errors, MAE, MAPE and
    bias are exact-integer arithmetic with one rounded division each —
    bit-identical across engines.

    100 TB: the daily rollup is the only fact-sized aggregate; the
    self-join runs on (type, day) — dim-cardinality — and rides the
    rollup's distribution.
    """
    from manual_data_ingest_spark.io import load_events

    ev = load_events(spark, sf_dir)
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
                  .alias("total_c")))
    a, f = daily.alias("a"), daily.alias("f")
    paired = a.join(
        f, (F.col("f.event_type") == F.col("a.event_type"))
        & (F.col("f.day") == F.col("a.day") - F.expr("INTERVAL 7 DAYS")))
    err = F.col("a.total_c") - F.col("f.total_c")
    return (paired.groupBy(F.col("a.event_type").alias("event_type"))
            .agg(F.count("*").alias("n_days"),
                 rnd(F.sum(F.abs(err)).cast("double") / F.count("*")
                     / 100.0).alias("mae"),
                 rnd(F.lit(100.0) * F.sum(F.abs(err)).cast("double")
                     / F.sum("a.total_c").cast("double"), 4).alias("mape_pct"),
                 rnd(F.sum(-err).cast("double") / F.count("*")
                     / 100.0).alias("bias")))


@register("agg_cusum_changepoint", """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts::TIMESTAMP) AS day,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS x
  FROM events
  GROUP BY event_type, date_trunc('day', ts::TIMESTAMP)
), stats AS (
  SELECT event_type,
         CAST(sum(x) AS DOUBLE) / count(*) AS mean_x,
         count(*) AS n_days
  FROM daily GROUP BY event_type
), cusum AS (
  SELECT d.event_type, d.day, s.n_days,
         CAST(sum(d.x) OVER (PARTITION BY d.event_type ORDER BY d.day)
              AS DOUBLE)
         - (row_number() OVER (PARTITION BY d.event_type ORDER BY d.day))
           * s.mean_x AS c
  FROM daily d JOIN stats s USING (event_type)
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS changepoint_day,
       floor(abs(c) / 100.0 * 100.0 + 0.5) / 100.0 AS max_abs_cusum,
       CAST(n_days AS BIGINT) AS n_days
FROM cusum
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY abs(c) DESC, day) = 1
""")
def agg_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the day where the
    cumulative deviation from the series mean peaks — the standard
    level-shift locator a metrics-monitoring pipeline runs nightly
    (a flat series wanders near 0; a step change makes |CUSUM| peak
    exactly at the break).

    Exactness: daily totals and their prefix sums are exact integer
    cents; the mean is one exact division, so every CUSUM value is a
    short identical IEEE sequence on both engines — the argmax
    (|c| DESC, day) cannot diverge. The prefix sum is an ordered
    window per type; the argmax QUALIFY rides the same partitioning.

    100 TB: one fact rollup to (type, day) — everything after is
    dim-sized; for per-entity changepoints the same shape partitions
    by entity and the window stays within partitions.
    """
    from manual_data_ingest_spark.io import load_events

    ev = load_events(spark, sf_dir)
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
                  .alias("x")))
    stats = (daily.groupBy("event_type")
             .agg((F.sum("x").cast("double") / F.count("*")).alias("mean_x"),
                  F.count("*").alias("n_days")))
    w = Window.partitionBy("event_type").orderBy("day")
    cusum = (daily.join(F.broadcast(stats), "event_type")
             .withColumn("c", F.sum("x").over(w).cast("double")
                         - F.row_number().over(w) * F.col("mean_x")))
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("c")).desc(), F.col("day"))
    return (cusum.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("event_type",
                    F.date_format("day", "yyyy-MM-dd")
                    .alias("changepoint_day"),
                    rnd(F.abs(F.col("c")) / 100.0).alias("max_abs_cusum"),
                    F.col("n_days").cast("long").alias("n_days")))


@register("win_max_drawdown", """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts::TIMESTAMP) AS day,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS x
  FROM events
  GROUP BY event_type, date_trunc('day', ts::TIMESTAMP)
), curve AS (
  SELECT event_type, day,
         sum(x) OVER (PARTITION BY event_type ORDER BY day) AS equity
  FROM daily
), dd AS (
  SELECT event_type, day, equity,
         max(equity) OVER (PARTITION BY event_type ORDER BY day) - equity
             AS drawdown
  FROM curve
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS trough_day,
       floor(CAST(drawdown AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0
           AS max_drawdown,
       floor(CAST(equity AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0
           AS equity_at_trough
FROM dd
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY drawdown DESC, day) = 1
""")
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per event type: cumulative daily value as an
    equity curve, running peak, and the deepest peak-to-trough drop
    with its trough day — the risk metric every metric-over-time
    dashboard wants next to the trend line.

    Two stacked ordered windows on the SAME (type, day) partitioning
    (prefix sum, then running max — Catalyst executes both in one
    window stage, no second shuffle), then an argmax QUALIFY. All
    arithmetic is exact integer cents until the final /100 render, so
    the trough selection cannot diverge between engines.

    100 TB: one fact rollup to (type, day); windows run over
    dim-sized series within partitions.
    """
    from manual_data_ingest_spark.io import load_events

    ev = load_events(spark, sf_dir)
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
                  .alias("x")))
    w = Window.partitionBy("event_type").orderBy("day")
    curve = daily.withColumn("equity", F.sum("x").over(w))
    dd = curve.withColumn("drawdown",
                          F.max("equity").over(w) - F.col("equity"))
    pick = Window.partitionBy("event_type").orderBy(
        F.col("drawdown").desc(), F.col("day"))
    return (dd.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("event_type",
                    F.date_format("day", "yyyy-MM-dd").alias("trough_day"),
                    rnd(F.col("drawdown").cast("double") / 100.0)
                    .alias("max_drawdown"),
                    rnd(F.col("equity").cast("double") / 100.0)
                    .alias("equity_at_trough")))


@register("agg_rfm_segments", """
WITH rfm AS (
  SELECT c_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS monetary_c
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
), scored AS (
  SELECT c_custkey,
         ntile(5) OVER (ORDER BY last_order, c_custkey)  AS r_score,
         ntile(5) OVER (ORDER BY frequency, c_custkey)   AS f_score,
         ntile(5) OVER (ORDER BY monetary_c, c_custkey)  AS m_score,
         monetary_c
  FROM rfm
), seg AS (
  SELECT CASE
           WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                THEN 'champion'
           WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
           WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
           WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
           ELSE 'core'
         END AS segment,
         monetary_c
  FROM scored
)
SELECT segment,
       count(*) AS n_customers,
       floor(CAST(sum(monetary_c) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0
           AS total_monetary
FROM seg GROUP BY segment
""")
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — quintile-score recency, frequency
    and monetary value, then map score combinations to the marketing
    segments (champion / new / at-risk / hibernating / core) and
    report each segment's size and revenue. The curator-analytics
    staple that turns three windows into an actionable list.

    Determinism: every ntile ORDER BY carries the c_custkey tie-break
    (ntile over a non-total order is engine-divergent on boundary
    rows); monetary is exact integer cents. Since r9 the three
    quintile scores run on the distributed exact-rank primitive
    (functions/ranking.py — quantile-cut buckets, per-bucket
    partitioned windows, cumulative offsets, SQL tile rule): three
    bounded shuffles instead of three single-partition global sorts,
    hash-identical to the oracle's ntiles. last_order buckets on its
    epoch-double proxy (monotone; exact timestamp ordering stays
    inside the buckets). The frequency score is LOW-CARDINALITY
    (small order counts — a dominant tied value under key skew), so
    its pass carries tie_proxy=c_custkey: dominant frequencies
    subdivide across buckets by custkey quantiles instead of landing
    one mega-bucket on one window task (r10; module docstring Skew).
    """
    from manual_data_ingest_spark.functions.ranking import (
        ntile_from_rank, with_exact_global_rank)

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rfm = (c.join(o, F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("c_custkey")
           .agg(F.max("o_orderdate").alias("last_order"),
                F.count("*").alias("frequency"),
                F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5)
                      .cast("long")).alias("monetary_c")))
    # each rank pass reads its input twice (quantile cuts + bucketing)
    # and the three passes chain — checkpoint the per-customer rollup
    # once (the dedup shingle discipline) so the fact join+agg runs
    # ONE time, not 6+
    rfm = rfm.localCheckpoint(eager=True)
    ranked = with_exact_global_rank(
        rfm, "last_order", ["c_custkey"], rank_col="_rk_r",
        bucket_proxy=F.unix_micros(F.col("last_order")).cast("double"),
        total_col="_n_tot")
    ranked = with_exact_global_rank(
        ranked, "frequency", ["c_custkey"], rank_col="_rk_f",
        tie_proxy=F.col("c_custkey"))
    ranked = with_exact_global_rank(
        ranked, "monetary_c", ["c_custkey"], rank_col="_rk_m")
    nt = F.col("_n_tot")
    scored = ranked.select("c_custkey", "monetary_c",
                           ntile_from_rank(F.col("_rk_r"), nt, 5)
                           .alias("r_score"),
                           ntile_from_rank(F.col("_rk_f"), nt, 5)
                           .alias("f_score"),
                           ntile_from_rank(F.col("_rk_m"), nt, 5)
                           .alias("m_score"))
    seg = F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4)
                 & (F.col("m_score") >= 4), "champion") \
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "new") \
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk") \
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2),
              "hibernating") \
        .otherwise("core")
    return (scored.select(seg.alias("segment"), "monetary_c")
            .groupBy("segment")
            .agg(F.count("*").alias("n_customers"),
                 rnd(F.sum("monetary_c").cast("double") / 100.0)
                 .alias("total_monetary")))


@register("agg_cohort_ltv_curve", """
WITH firsts AS (
  SELECT user_id, min(date_trunc('week', ts::TIMESTAMP)) AS cohort_week
  FROM events GROUP BY user_id
), rev AS (
  SELECT e.user_id, f.cohort_week,
         -- day-diff // 7, not date_diff('week'): DuckDB's week diff
         -- is epoch-anchored and TRUNCATING — a Monday→Monday span
         -- crossing 1970-01-01 comes back one week short (probed:
         -- 1969-12-29 → 1970-01-05 gives 0). The day diff is
         -- calendar-exact, and between two week-truncated Mondays it
         -- is an exact multiple of 7.
         CAST(date_diff('day', f.cohort_week,
                        date_trunc('week', e.ts::TIMESTAMP)) // 7
              AS BIGINT) AS week_no,
         CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN firsts f USING (user_id)
  WHERE e.event_type = 'purchase'
), weekly AS (
  SELECT cohort_week, week_no, sum(cents) AS wk_cents
  FROM rev GROUP BY cohort_week, week_no
), sizes AS (
  SELECT cohort_week, count(*) AS cohort_users FROM firsts
  GROUP BY cohort_week
)
SELECT strftime(w.cohort_week, '%Y-%m-%d') AS cohort_week,
       w.week_no,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       floor(CAST(sum(w.wk_cents) OVER (PARTITION BY w.cohort_week
                                        ORDER BY w.week_no) AS DOUBLE)
             / s.cohort_users / 100.0 * 10000.0 + 0.5) / 10000.0
           AS cum_ltv_per_user
FROM weekly w JOIN sizes s USING (cohort_week)
""")
def agg_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: users cohorted by first-event week; cumulative
    purchase revenue per cohort member at each week-since-signup — the
    monetary twin of `win_retention_cohorts`, and the curve a growth
    team reads to see whether newer cohorts monetize faster.

    Exactness: cohort assignment and week arithmetic are calendar
    functions over identical timestamps; revenue accumulates as exact
    integer cents through the ordered window, divided once by the
    exact cohort size and rounded once.

    100 TB: first-event per user and the (cohort, week) rollup are the
    two fact-sized aggregates (both key-partitioned); the cumulative
    window runs over dim-sized (cohort × week) cells.
    """
    from manual_data_ingest_spark.io import load_events

    ev = load_events(spark, sf_dir)
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.date_trunc("week", F.col("ts")))
                   .alias("cohort_week")))
    rev = (ev.filter(F.col("event_type") == "purchase")
           .join(firsts, "user_id")
           .select("cohort_week",
                   ((F.unix_date(F.to_date(F.date_trunc("week", F.col("ts"))))
                     - F.unix_date(F.to_date(F.col("cohort_week")))) / 7)
                   .cast("long").alias("week_no"),
                   F.floor(F.col("value") * 100.0 + 0.5).cast("long")
                   .alias("cents")))
    weekly = (rev.groupBy("cohort_week", "week_no")
              .agg(F.sum("cents").alias("wk_cents")))
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users"))
    w = Window.partitionBy("cohort_week").orderBy("week_no")
    return (weekly.join(F.broadcast(sizes), "cohort_week")
            .select(F.date_format("cohort_week", "yyyy-MM-dd")
                    .alias("cohort_week"),
                    "week_no", "cohort_users",
                    rnd(F.sum("wk_cents").over(w).cast("double")
                        / F.col("cohort_users") / 100.0, 4)
                    .alias("cum_ltv_per_user")))


@register("agg_markov_transition", """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type AS next_type,
       CAST(n AS BIGINT) AS n_transitions,
       floor(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY prev_type)
             * 1000000.0 + 0.5) / 1000000.0 AS prob
FROM pairs
""")
def agg_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | previous), with raw transition
    counts — the behavioral fingerprint behind session simulation,
    anomaly scoring ('error after purchase spiked this week') and
    funnel design.

    The per-user ordered lag carries a (ts, event_id) total order so
    simultaneous events cannot swap between engines; counts are exact
    ints, each probability one rounded exact-int division.

    100 TB: ONE shuffle on user_id for the sequence window (sessions
    are contiguous within partitions), then a 25-cell aggregate with
    partials; the row normalizer is a window over the 25-cell result — no second branch, no rescan.
    """
    from manual_data_ingest_spark.io import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("event_type",
                    F.lag("event_type").over(w).alias("prev_type"))
    pairs = (seq.filter(F.col("prev_type").isNotNull())
             .groupBy("prev_type", "event_type")
             .agg(F.count("*").alias("n")))
    tot = F.sum("n").over(Window.partitionBy("prev_type"))
    return pairs.select(
        "prev_type", F.col("event_type").alias("next_type"),
        F.col("n").alias("n_transitions"),
        rnd(F.col("n").cast("double") / tot, 6).alias("prob"))


@register("agg_seasonality_strength", """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts::TIMESTAMP) AS day,
         CAST(dayofweek(date_trunc('day', ts::TIMESTAMP)) AS BIGINT) AS dow,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS x
  FROM events
  GROUP BY event_type, date_trunc('day', ts::TIMESTAMP)
), m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(x * x) AS DOUBLE) AS sxx
  FROM daily GROUP BY event_type
), grp AS (
  SELECT event_type, dow,
         CAST(count(*) AS DOUBLE) AS gn,
         CAST(sum(x) AS DOUBLE) AS gsx
  FROM daily GROUP BY event_type, dow
), between_var AS (
  SELECT g.event_type,
         sum(g.gn * (g.gsx / g.gn - m.sx / m.n)
                  * (g.gsx / g.gn - m.sx / m.n)) / max(m.n) AS vb
  FROM grp g JOIN m ON m.event_type = g.event_type
  GROUP BY g.event_type
)
SELECT m.event_type,
       CAST(m.n AS BIGINT) AS n_days,
       CASE WHEN (m.sxx - (m.sx * m.sx) / m.n) / m.n > 0 THEN
         floor(b.vb / ((m.sxx - (m.sx * m.sx) / m.n) / m.n)
               * 1000000.0 + 0.5) / 1000000.0
       END AS seasonality_strength
FROM m JOIN between_var b USING (event_type)
""")
def agg_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality strength per event type: the fraction of
    daily-total variance explained by day-of-week means (between-group
    over total variance, η² for the weekday factor) — ~0 for a flat
    series, →1 when weekday alone predicts the day. The one-number
    screen that decides whether the forecast baseline needs the
    seasonal term (`win_seasonal_backtest`'s day−7 join) at all.

    Exactness: daily totals are exact cents; group and total moments
    are exact-int sums; the η² expression is a fixed IEEE sequence
    over them, rounded once.

    100 TB: the (type, day) rollup is the single fact-sized pass;
    both moment layers aggregate dim-sized intermediates.
    """
    from manual_data_ingest_spark.io import load_events

    ev = load_events(spark, sf_dir)
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
                  .alias("x"))
             .withColumn("dow", F.dayofweek(F.col("day")).cast("long")))
    m = (daily.groupBy("event_type")
         .agg(F.count("*").cast("double").alias("n"),
              F.sum("x").cast("double").alias("sx"),
              F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx")))
    grp = (daily.groupBy("event_type", "dow")
           .agg(F.count("*").cast("double").alias("gn"),
                F.sum("x").cast("double").alias("gsx")))
    dev = F.col("gsx") / F.col("gn") - F.col("sx") / F.col("n")
    vb = (grp.join(F.broadcast(m), "event_type")
          .groupBy("event_type")
          .agg((F.sum(F.col("gn") * dev * dev) / F.max("n")).alias("vb")))
    vtot = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    # a zero-variance series (e.g. a single day) has no seasonality to
    # measure: NULL on both engines (Spark ANSI would throw on /0)
    return (m.join(vb, "event_type")
            .select("event_type", F.col("n").cast("long").alias("n_days"),
                    rnd(F.when(vtot > 0, F.col("vb") / vtot), 6)
                    .alias("seasonality_strength")))


@register("win_interval_coalesce", """
WITH iv AS (
    SELECT l_suppkey AS sk,
           l_shipdate::DATE AS s,
           l_shipdate::DATE + CAST(l_quantity AS INT) AS e,
           l_orderkey, l_linenumber
    FROM lineitem WHERE l_suppkey <= 20
), marked AS (
    SELECT sk, s, e,
           CASE WHEN max(e) OVER (PARTITION BY sk
                                  ORDER BY s, e, l_orderkey, l_linenumber
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) IS NULL
                  OR s > max(e) OVER (PARTITION BY sk
                                      ORDER BY s, e, l_orderkey, l_linenumber
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_island,
           l_orderkey, l_linenumber
    FROM iv
), isl AS (
    SELECT sk, s, e,
           sum(new_island) OVER (PARTITION BY sk
                                 ORDER BY s, e, l_orderkey, l_linenumber
                                 ROWS UNBOUNDED PRECEDING) AS island_id
    FROM marked
)
SELECT sk AS l_suppkey, island_id::BIGINT AS island_id,
       min(s) AS island_start, max(e) AS island_end,
       count(*) AS n_intervals
FROM isl GROUP BY sk, island_id
""")
def win_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (gaps-and-islands over RANGES): merge each
    supplier's overlapping busy periods [shipdate, shipdate+quantity
    days] into maximal islands — the range twin of ``win_sessionize``'s
    point-gap sessions (availability windows, maintenance periods,
    coverage gaps all reduce to this).

    The running-max trick: a row starts a new island iff its start lies
    strictly past the MAX end of every earlier interval (not merely the
    previous row's end — an earlier long interval can span a later short
    one, the classic bug naive lag-based merges have). Island id = the
    running count of starts; one groupBy per (supplier, island).

    Determinism: pure date/integer arithmetic, no floats anywhere; the
    window order ends in the unique line key. 100 TB: one shuffle on the
    supplier key serves both windows AND the final aggregate (group keys
    contain the partition key, so clustering is already satisfied); the
    running max/count carry scalar state only.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    iv = li.select(
        F.col("l_suppkey").alias("sk"),
        F.to_date("l_shipdate").alias("s"),
        F.expr("date_add(to_date(l_shipdate), CAST(l_quantity AS INT))")
        .alias("e"),
        "l_orderkey", "l_linenumber")
    w = (Window.partitionBy("sk")
         .orderBy("s", "e", "l_orderkey", "l_linenumber"))
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0))
    isl = marked.withColumn(
        "island_id",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (isl.groupBy("sk", "island_id")
            .agg(F.min("s").alias("island_start"),
                 F.max("e").alias("island_end"),
                 F.count("*").alias("n_intervals"))
            .select(F.col("sk").alias("l_suppkey"),
                    F.col("island_id").cast("long").alias("island_id"),
                    "island_start", "island_end", "n_intervals"))


@register("win_autocorr_lag1", """
WITH daily AS (
    SELECT date_trunc('day', ts::TIMESTAMP) AS day,
           sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS x
    FROM events GROUP BY 1
), pairs AS (
    SELECT x,
           lag(x) OVER (ORDER BY day) AS px
    FROM daily
), s AS (
    SELECT count(*)::BIGINT AS n,
           sum(x)::BIGINT AS sx, sum(px)::BIGINT AS sp,
           sum(x * px)::BIGINT AS sxp,
           sum(x * x)::BIGINT AS sxx, sum(px * px)::BIGINT AS spp
    FROM pairs WHERE px IS NOT NULL
)
SELECT n AS n_pairs,
       round((n::DOUBLE * sxp::DOUBLE - sx::DOUBLE * sp::DOUBLE)
             / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * sqrt(n::DOUBLE * spp::DOUBLE - sp::DOUBLE * sp::DOUBLE)),
             6) AS autocorr_lag1
FROM s
""")
def win_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-value series — the
    first question asked of any metric time series (is today predictive
    of tomorrow?), and the diagnostic behind seasonality/trend detection
    (`agg_seasonality_strength`'s scalar cousin).

    Exact-integer discipline: daily values are summed as integer CENTS,
    so every power sum (Σx, Σxy, Σx²) is an exact integer — Pearson r
    over (x_t, x_{t-1}) is assembled from those sums with FLOAT ARITHMETIC
    ONLY IN THE FINAL EXPRESSION (the explicit-moment pattern that fixed
    the r1 skew/kurtosis red, PARITY #16). The lag window runs over the
    DAILY aggregate (≤ one row per day — bounded, not data-sized), after
    one keyed shuffle over events.
    """
    from manual_data_ingest_spark.io import load_events

    ev = load_events(spark, sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
                  .cast("long").alias("x")))
    pairs = (daily.select("x", F.lag("x").over(Window.orderBy("day"))
                          .alias("px"))
             .filter(F.col("px").isNotNull()))
    s = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("px").cast("long").alias("sp"),
        F.sum(F.col("x") * F.col("px")).cast("long").alias("sxp"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("px") * F.col("px")).cast("long").alias("spp"))
    n, sx, sp = F.col("n").cast("double"), F.col("sx").cast("double"), \
        F.col("sp").cast("double")
    sxp, sxx, spp = F.col("sxp").cast("double"), F.col("sxx").cast("double"), \
        F.col("spp").cast("double")
    r = (n * sxp - sx * sp) / (F.sqrt(n * sxx - sx * sx)
                               * F.sqrt(n * spp - sp * sp))
    return s.select(F.col("n").alias("n_pairs"),
                    rnd(r, 6).alias("autocorr_lag1"))


@register("agg_ohlc_bars", f"""
WITH base AS (
    SELECT event_type, date_trunc('day', ts) AS day, ts, event_id, value
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
), r AS (
    SELECT *,
           row_number() OVER (PARTITION BY event_type, day
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY event_type, day
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM base
)
SELECT event_type, day,
       {sql_rnd('min(CASE WHEN rn_a = 1 THEN value END)', 6)} AS open,
       {sql_rnd('max(value)', 6)} AS high,
       {sql_rnd('min(value)', 6)} AS low,
       {sql_rnd('min(CASE WHEN rn_d = 1 THEN value END)', 6)} AS close,
       count(*) AS volume
FROM r
GROUP BY event_type, day
""")
def agg_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to daily OHLC bars (open / high / low /
    close / volume) per event type — the resample primitive financial
    and metrics pipelines run before charting or modeling.

    Open/close are FIRST/LAST by (ts, event_id) — the event_id
    tie-break makes same-timestamp days deterministic (SURVEY §5
    total-order discipline), expressed as ``min_by``/``max_by`` over
    the (ts, event_id) struct so the WHOLE bar is ONE hash aggregate
    with map-side partial combine (r11: the previous form ran two
    row_number windows first — one task per (type, day) over that
    day's raw events; min_by partials make open/close associative, so
    a 100 TB day combines across hundreds of tasks like any sum).
    Struct ordering is lexicographic and (ts, event_id) is unique per
    row, so the pick is total-ordered; a NULL-day group (ts NULL) has
    all-NULL ts and falls through to the event_id field, matching the
    oracle's nulls-within-group order. At 100 TB this is the
    canonical hypertable rollup: continuous aggregation maintains
    bars incrementally (`ingest_incremental_agg`'s pattern) instead
    of rescanning.
    """
    ev = load_table(spark, sf_dir, "events")
    base = (ev.filter(F.col("event_type").isNotNull()
                      & F.col("value").isNotNull())
            .select("event_type", F.date_trunc("day", "ts").alias("day"),
                    "ts", "event_id", "value"))
    key = F.struct("ts", "event_id")
    return (base.groupBy("event_type", "day")
            .agg(rnd(F.min_by("value", key), 6).alias("open"),
                 rnd(F.max("value"), 6).alias("high"),
                 rnd(F.min("value"), 6).alias("low"),
                 rnd(F.max_by("value", key), 6).alias("close"),
                 F.count("*").alias("volume")))


@register("win_pareto_share", f"""
WITH cust AS (
    SELECT o_custkey,
           sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
), tot AS (
    SELECT sum(cents) AS tot_cents, count(*) AS n_cust FROM cust
), ranked AS (
    SELECT o_custkey, cents,
           row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk,
           sum(cents) OVER (ORDER BY cents DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum_cents
    FROM cust
)
SELECT rnk, o_custkey,
       {sql_rnd('cents::DOUBLE / 100.0', 2)} AS revenue,
       {sql_rnd('cum_cents::DOUBLE / tot_cents::DOUBLE', 6)} AS cum_share,
       {sql_rnd('rnk::DOUBLE / n_cust', 6)} AS cust_frac
FROM ranked, tot
WHERE rnk <= 25
""")
def win_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration curve: customers ranked by revenue
    with cumulative revenue share and customer fraction — the top-25
    rows of the whale curve every revenue team draws.

    r10 scale rewrite (r9 verdict task 1): the output is a TOP-K, so
    no global window is needed AT ALL — the per-customer rollup (the
    only fact-sized shuffle) feeds (a) a constant-size totals
    aggregate and (b) `orderBy().limit(25)`, which Spark plans as
    TakeOrderedAndProject (per-partition top-25, merge of 25-row
    heads — the same plan at any scale). Rank and cumulative revenue
    are then serial windows over the 25 SURVIVING rows (bounded by k,
    not data). Revenue moves as EXACT integer cents (PARITY #21) so
    the 6dp cumulative shares cannot drift under reordering;
    tie-break on custkey asc NULLS LAST to match DuckDB.
    """
    o = load_table(spark, sf_dir, "orders")
    cust = (o.groupBy("o_custkey")
            .agg(F.sum(F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                       .cast("long")).alias("cents")))
    # two consumers of the rollup (totals + top-k): materialize once so
    # the fact shuffle runs once
    cust = cust.localCheckpoint(eager=True)
    tot = cust.agg(F.sum("cents").alias("tot_cents"),
                   F.count("*").alias("n_cust"))
    lead = [F.col("cents").desc(), F.asc_nulls_last("o_custkey")]
    top = cust.orderBy(*lead).limit(25)
    w = Window.orderBy(*lead)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (top.crossJoin(F.broadcast(tot))
            .select(F.row_number().over(w).alias("rnk"),
                    "o_custkey",
                    rnd(F.col("cents").cast("double") / 100.0, 2)
                    .alias("revenue"),
                    rnd(F.sum("cents").over(wcum).cast("double")
                        / F.col("tot_cents").cast("double"), 6)
                    .alias("cum_share"),
                    F.col("n_cust"))
            .withColumn("cust_frac",
                        rnd(F.col("rnk").cast("double") / F.col("n_cust"),
                            6))
            .drop("n_cust"))


@register("agg_session_bounce", """
WITH ordered AS (
    SELECT user_id, event_id, ts::TIMESTAMP AS ts,
           CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
                  OR ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w
                     > INTERVAL 12 HOUR
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id,
           (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING))::BIGINT AS session_no
    FROM ordered
), per_sess AS (
    SELECT user_id, session_no, count(*) AS n_events
    FROM sess GROUP BY user_id, session_no
)
SELECT count(*) AS n_sessions,
       count(*) FILTER (WHERE n_events = 1) AS n_bounces,
       CASE WHEN count(*) > 0
            THEN floor(count(*) FILTER (WHERE n_events = 1)::DOUBLE
                       / count(*) * 1000000.0 + 0.5) / 1000000.0
       END AS bounce_rate,
       floor(avg(n_events) * 1000000.0 + 0.5) / 1000000.0
           AS avg_session_events,
       max(n_events) AS max_session_events
FROM per_sess
""")
def agg_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session quality summary on top of the gaps-and-islands
    sessionization: bounce rate (single-event sessions), mean and max
    session length — the engagement KPIs a product dashboard reads off
    sessionized history.

    Same 12 h session rule as `win_sessionize`; the lag window, running
    sum, and per-session aggregate all ride ONE user_id distribution,
    and the final summary is a constant-size partial agg. Adds no new
    shuffle over plain sessionization at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(gap_us.isNull() | (gap_us > 12 * 3600 * 1_000_000),
                      1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per_sess = (ev.withColumn("new_sess", new_sess)
                .withColumn("session_no", F.sum("new_sess").over(run))
                .groupBy("user_id", "session_no")
                .agg(F.count("*").alias("n_events")))
    bounce = F.count(F.when(F.col("n_events") == 1, 1))
    return per_sess.agg(
        F.count("*").alias("n_sessions"),
        bounce.alias("n_bounces"),
        # guard the empty corpus: ANSI mode makes 0/0 a crash, not NaN
        rnd(F.when(F.count("*") > 0,
                   bounce.cast("double") / F.count("*")), 6)
        .alias("bounce_rate"),
        rnd(F.avg("n_events"), 6).alias("avg_session_events"),
        F.max("n_events").alias("max_session_events"))


@register("win_rolling_median", f"""
WITH m AS (
  SELECT event_id, event_type,
         list_sort(list(value) OVER (PARTITION BY event_type
             ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, event_type,
       {sql_rnd('(arr[(len(arr)+1)//2] + arr[len(arr)//2+1]) / 2.0', 4)}
           AS rolling_median
FROM m WHERE len(arr) >= 4
""")
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row median of event value per event_type — the
    robust-location twin of the rolling mean: one sensor spike moves a
    trailing mean for 7 rows but the median not at all, which is why
    ops dashboards smooth with medians.

    Neither engine's native median is used: DuckDB interpolates
    `lower + (upper-lower)/2` while a naive `(a+b)/2` differs in the
    last ulp, so BOTH sides compute the identical explicit form —
    sort the frame, average the two middle elements with the same
    `(a+b)/2` expression. Bit-exact by construction, same discipline
    as the rounding helpers (functions/rounding.py).

    Scale: the frame is ROWS-bounded (7), so state per row is O(7) —
    and since r10 the PARTITION is bounded too: the halo-block
    primitive (functions/ranking.py, with_bounded_frame_buckets)
    splits each event type's stream into contiguous rank blocks with
    a 6-row halo, so the window runs one task per BLOCK instead of
    one task per type over the whole corpus. Rows with < 4 non-null
    points are suppressed (warm-up).
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_bounded_frame_buckets)

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    aug = with_bounded_frame_buckets(
        ev, ["event_type"], "ts", ["event_id"], k_back=6,
        bucket_proxy=F.unix_micros(F.col("ts")))
    w = (Window.partitionBy("event_type", "_fbkt")
         .orderBy(F.asc_nulls_last("ts"), "event_id")
         .rowsBetween(-6, 0))
    arr = F.sort_array(F.collect_list("value").over(w))
    return (aug.select("event_id", "event_type", arr.alias("arr"),
                       "_fhalo")
            .filter(~F.col("_fhalo")).drop("_fhalo")
            .withColumn("n", F.size("arr"))
            .filter(F.col("n") >= 4)
            .select("event_id", "event_type",
                    rnd((F.element_at("arr", ((F.col("n") + 1) / 2)
                                      .cast("int"))
                         + F.element_at("arr", (F.col("n") / 2)
                                        .cast("int") + 1)) / 2.0, 4)
                    .alias("rolling_median")))


@register("win_gap_distribution", """
WITH gaps AS (
  SELECT event_type,
         (epoch_us(ts)
          - lag(epoch_us(ts)) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id)) // 1000000
             AS gap_s
  FROM events WHERE ts IS NOT NULL
)
SELECT event_type,
       CASE WHEN gap_s < 60 THEN 'a_under_1m'
            WHEN gap_s < 600 THEN 'b_1m_10m'
            WHEN gap_s < 3600 THEN 'c_10m_1h'
            WHEN gap_s < 86400 THEN 'd_1h_1d'
            ELSE 'e_over_1d' END AS gap_bucket,
       count(*) AS n,
       min(gap_s) AS min_gap_s,
       max(gap_s) AS max_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY event_type, gap_bucket
""")
def win_gap_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap histogram per event type (fixed human-scale
    buckets: <1m, 1-10m, 10m-1h, 1h-1d, ≥1d) — the feed-cadence
    fingerprint that sizes streaming watermarks (`stream_watermark_
    late`'s lateness bound SHOULD be read off this table, not guessed)
    and flags dying feeds before `ingest_freshness_slo` pages.

    The lag rides the r10 halo-block primitive (k_back=1: each block
    carries its predecessor's last row, so lag(1) is exact per block
    and the stream never funnels one task per type); the bucket edges
    are explicit integer CASE arms (never log-scale math — the PARITY
    libm rule); gaps in exact integer seconds via unix_micros // 1e6,
    both engines flooring the same integer division.
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_bounded_frame_buckets)

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ev = (with_bounded_frame_buckets(
        ev, ["event_type"], "ts", ["event_id"], k_back=1,
        bucket_proxy=F.unix_micros(F.col("ts"))))
    w = (Window.partitionBy("event_type", "_fbkt")
         .orderBy(F.asc_nulls_last("ts"), "event_id"))
    gap = ((F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w))
           / F.lit(1000000)).cast("long")
    bucket = (F.when(F.col("gap_s") < 60, "a_under_1m")
              .when(F.col("gap_s") < 600, "b_1m_10m")
              .when(F.col("gap_s") < 3600, "c_10m_1h")
              .when(F.col("gap_s") < 86400, "d_1h_1d")
              .otherwise("e_over_1d"))
    # halo rows feed the lag above, then drop — AFTER the window
    return (ev.select("event_type", gap.alias("gap_s"), "_fhalo")
            .filter(~F.col("_fhalo"))
            .filter(F.col("gap_s").isNotNull())
            .select("event_type", bucket.alias("gap_bucket"), "gap_s")
            .groupBy("event_type", "gap_bucket")
            .agg(F.count("*").alias("n"),
                 F.min("gap_s").alias("min_gap_s"),
                 F.max("gap_s").alias("max_gap_s")))


@register("win_time_to_convert", """
WITH first_signup AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), first_purchase AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN first_signup s
    ON e.user_id = s.user_id AND e.ts >= s.s_ts
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
)
SELECT s.user_id,
       (epoch_us(p.p_ts) - epoch_us(s.s_ts)) // 1000000 AS convert_s
FROM first_signup s JOIN first_purchase p ON p.user_id = s.user_id
""")
def win_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency per user: seconds from the
    FIRST signup to the first purchase AT OR AFTER it (a purchase
    before signup — imported history — must not count as converting).
    The funnel-velocity metric growth teams watch, and the input to
    `agg_survival`-style analyses.

    Two conditional-min rollups on the SAME user_id key — the second
    joins the first to apply the at-or-after guard, so both aggregates
    and the final join reuse one partitioning; nothing event-sized
    crosses a second shuffle. Latency is exact integer seconds
    (epoch-µs floor-div, both engines flooring the same integers).
    """
    ev = load_table(spark, sf_dir, "events")
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(s, "user_id")
         .filter(F.col("ts") >= F.col("s_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("p_ts")))
    return (s.join(p, "user_id")
            .select("user_id",
                    ((F.unix_micros("p_ts") - F.unix_micros("s_ts"))
                     / F.lit(1000000)).cast("long").alias("convert_s")))


@register("win_rolling_regression", f"""
WITH daily AS (
  SELECT event_type,
         ((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000)::BIGINT AS day,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY event_type, day
), m AS (
  SELECT event_type, day,
         count(*) OVER w AS n,
         sum(day) OVER w AS sx,
         sum(cents) OVER w AS sy,
         sum(day * cents) OVER w AS sxy,
         sum(day * day) OVER w AS sxx
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       {sql_rnd('(n * sxy - sx * sy)::DOUBLE'
                ' / (n * sxx - sx * sx)::DOUBLE', 6)} AS slope_cents_per_day
FROM m WHERE n = 7
""")
def win_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day trend slope per event type: OLS slope of daily
    value (in cents) against the day index over a trailing week — the
    "is this metric rising or falling, and how fast" readout behind
    burn-rate alerts, smoother than day-over-day deltas and earlier
    than monthly aggregates.

    The `ml_ols_normal_equations` discipline applied to a WINDOW: all
    five moment sums are EXACT integers (days are epoch-day ints,
    values floor-rescaled cents; 7-row sums stay far inside 2^53), so
    the slope is one identical IEEE division on both engines — no
    float accumulation order can flip it. One event_type shuffle
    serves the daily rollup AND all five window moments (same
    partitioning); warm-up rows (n<7) suppressed.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    daily = (ev.select("event_type",
                       epoch_day(F.col("ts")).alias("day"),
                       F.floor(F.col("value") * 100.0 + F.lit(0.5))
                       .cast("long").alias("c"))
             .groupBy("event_type", "day")
             .agg(F.sum("c").alias("cents")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-6, 0))
    m = (daily
         .withColumn("n", F.count("*").over(w))
         .withColumn("sx", F.sum("day").over(w))
         .withColumn("sy", F.sum("cents").over(w))
         .withColumn("sxy", F.sum(F.col("day") * F.col("cents")).over(w))
         .withColumn("sxx", F.sum(F.col("day") * F.col("day")).over(w)))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             .cast("double")
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
             .cast("double"))
    return (m.filter(F.col("n") == 7)
            .select("event_type", "day",
                    rnd(slope, 6).alias("slope_cents_per_day")))


@register("win_top_paths", """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS step
  FROM events WHERE ts IS NOT NULL
), paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY step) AS path
  FROM seq WHERE step <= 3
  GROUP BY user_id
)
SELECT path, count(*) AS n_users FROM paths
GROUP BY path HAVING count(*) >= 3
""")
def win_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-path mining: each user's first three events as an ordered
    path string ('signup>click>purchase'), counted across users —
    the onboarding-flow readout that shows which first-session
    journeys actually happen vs the one the product team designed.
    Paths under 3 users are suppressed (noise floor + k-anonymity for
    a published report — the `ingest_k_anonymity` rule applied at the
    source).

    One user_id shuffle carries the step window AND the path
    concat (group key = partition key); the path-count agg runs on
    user-sized rows with a ≤3-element string payload. Deterministic:
    the step order ties on event_id and the concat order is pinned
    on both engines (ORDER BY inside string_agg / sorted collect).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (ev.withColumn("step", F.row_number().over(w))
             .filter(F.col("step") <= 3)
             .groupBy("user_id")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("step", "event_type"))),
                     lambda s: s.event_type), ">").alias("path")))
    return (paths.groupBy("path")
            .agg(F.count("*").alias("n_users"))
            .filter(F.col("n_users") >= 3))


@register("win_peak_concurrency", """
WITH busy AS (
  SELECT l_suppkey,
         l_shipdate::DATE AS s,
         l_shipdate::DATE + CAST(l_quantity AS INTEGER) AS e
  FROM lineitem WHERE l_shipdate IS NOT NULL
), pts AS (
  SELECT l_suppkey, s AS d, 1 AS delta FROM busy
  UNION ALL
  SELECT l_suppkey, e + 1 AS d, -1 AS delta FROM busy
), sweep AS (
  SELECT l_suppkey, d,
         sum(delta) OVER (PARTITION BY l_suppkey ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS conc
  FROM (SELECT l_suppkey, d, sum(delta) AS delta
        FROM pts GROUP BY l_suppkey, d)
)
SELECT l_suppkey AS supp_key,
       max(conc)::BIGINT AS peak_concurrency,
       count(*) AS n_change_points
FROM sweep GROUP BY l_suppkey HAVING max(conc) >= 4
""")
def win_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent jobs per supplier (sweep line over busy
    intervals [ship, ship+qty days]): the capacity question
    `win_interval_coalesce` can't answer — coalescing says WHEN a
    supplier was busy, the sweep says HOW DEEP the overlap stacked
    (the staffing/slot-sizing number). Suppliers peaking ≥4 reported.

    Classic event-point sweep, fully relational: ±1 deltas at interval
    ends, collapsed per (supplier, day) FIRST (bounds the window input
    to change-points, not intervals), then one running sum + max.
    The collapse, the ordered window, and the final max all ride ONE
    supplier-keyed shuffle. Exact integer arithmetic throughout.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull())
    busy = li.select(
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("s"),
        F.expr("date_add(cast(l_shipdate as date),"
               " cast(l_quantity as int))").alias("e"))
    pts = (busy.select("l_suppkey", F.col("s").alias("d"),
                       F.lit(1).alias("delta"))
           .unionByName(
               busy.select("l_suppkey",
                           F.date_add(F.col("e"), 1).alias("d"),
                           F.lit(-1).alias("delta"))))
    collapsed = pts.groupBy("l_suppkey", "d").agg(
        F.sum("delta").alias("delta"))
    w = (Window.partitionBy("l_suppkey").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sweep = collapsed.withColumn("conc", F.sum("delta").over(w))
    return (sweep.groupBy(F.col("l_suppkey").alias("supp_key"))
            .agg(F.max("conc").alias("peak_concurrency"),
                 F.count("*").alias("n_change_points"))
            .filter(F.col("peak_concurrency") >= 4))


@register("win_wma", f"""
WITH daily AS (
  SELECT event_type,
         ((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000)::BIGINT AS day,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY event_type, day
), lagged AS (
  SELECT event_type, day, cents,
         lag(cents, 1) OVER w AS c1, lag(cents, 2) OVER w AS c2,
         lag(cents, 3) OVER w AS c3, lag(cents, 4) OVER w AS c4,
         lag(cents, 5) OVER w AS c5, lag(cents, 6) OVER w AS c6
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, day,
       {sql_rnd('(7 * cents + 6 * c1 + 5 * c2 + 4 * c3 + 3 * c4'
                ' + 2 * c5 + 1 * c6)::DOUBLE / 28.0 / 100.0', 4)}
           AS wma
FROM lagged WHERE c6 IS NOT NULL
""")
def win_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted 7-day moving average of daily value per event
    type (today×7 … 6-days-ago×1, /28): the trend smoother between the
    flat SMA (`win_moving_range`) and the infinite-memory EWMA
    (`win_ewma`) — full weight decay inside a BOUNDED window, so the
    streaming state is 7 values, not a recurrence.

    Explicit lag columns instead of a frame aggregate keep every term
    an EXACT integer (cents × small weights, far inside 2^53); the
    single float step is the final /28/100 rounded 4dp. All six lags
    ride ONE event_type window ordering; warm-up rows suppressed.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    daily = (ev.select("event_type",
                       epoch_day(F.col("ts")).alias("day"),
                       F.floor(F.col("value") * 100.0 + F.lit(0.5))
                       .cast("long").alias("c"))
             .groupBy("event_type", "day")
             .agg(F.sum("c").alias("cents")))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", "cents",
        *[F.lag("cents", k).over(w).alias(f"c{k}") for k in range(1, 7)])
    wma = ((7 * F.col("cents") + 6 * F.col("c1") + 5 * F.col("c2")
            + 4 * F.col("c3") + 3 * F.col("c4") + 2 * F.col("c5")
            + F.col("c6")).cast("double") / 28.0 / 100.0)
    return (lagged.filter(F.col("c6").isNotNull())
            .select("event_type", "day", rnd(wma, 4).alias("wma")))


@register("win_rolling_mad", f"""
WITH m AS (
  SELECT event_id, event_type, value,
         list_sort(list(value) OVER (PARTITION BY event_type
             ORDER BY ts, event_id
             ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)) AS arr
  FROM events WHERE value IS NOT NULL
), med AS (
  SELECT event_id, event_type, value, arr,
         (arr[(len(arr)+1)//2] + arr[len(arr)//2+1]) / 2.0 AS med
  FROM m WHERE len(arr) >= 10
), dev AS (
  SELECT event_id, event_type, value, med,
         list_sort(list_transform(arr, x -> abs(x - med))) AS devs
  FROM med
), scored AS (
  SELECT event_id, event_type, value, med,
         (devs[(len(devs)+1)//2] + devs[len(devs)//2+1]) / 2.0 AS mad
  FROM dev
)
SELECT event_id, event_type,
       {sql_rnd('(value - med) / mad', 4)} AS robust_z
FROM scored
WHERE mad > 0.0 AND abs(value - med) > 5.0 * mad
""")
def win_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median/MAD outlier detector: each event scored against
    the MEDIAN and median-absolute-deviation of its type's previous 14
    events — the robust twin of `win_zscore_rolling`, which a single
    earlier spike can blind (the spike inflates the trailing stddev
    and masks the next one; the median absorbs it).

    Same bounded-frame discipline as `win_rolling_median` (O(14)
    state/row, and since r10 the same halo-block distribution — a
    14-row halo, one task per block instead of one per type),
    self-excluded frame (-14..-1), and the same explicit (a+b)/2
    middle-element form for BOTH medians on both engines — the whole
    med/MAD/threshold chain is one shared IEEE sequence, so the
    5×MAD flag cannot flip between engines. Flagged rows only.
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_bounded_frame_buckets)

    from manual_data_ingest_spark.functions.ranking import _materialize

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    aug = with_bounded_frame_buckets(
        ev, ["event_type"], "ts", ["event_id"], k_back=14,
        bucket_proxy=F.unix_micros(F.col("ts")))
    w = (Window.partitionBy("event_type", "_fbkt")
         .orderBy(F.asc_nulls_last("ts"), "event_id")
         .rowsBetween(-14, -1))
    arr = F.sort_array(F.collect_list("value").over(w))
    m = (aug.select("event_id", "event_type", "value", arr.alias("arr"),
                    "_fhalo")
         .filter(~F.col("_fhalo")).drop("_fhalo")
         .filter(F.size("arr") >= 10))
    # F.get (0-based) instead of element_at: Catalyst fuses the mad>0
    # conjunct into one predicate with the size guard, and conjunct
    # evaluation is NOT short-circuited across subexpressions — an
    # element_at there threw INVALID_INDEX_OF_ZERO on warm-up rows.
    # get() returns NULL out-of-bounds, so those rows filter out.
    mid = lambda a: (F.get(a, ((F.size(a) + 1) / 2).cast("int") - 1)
                     + F.get(a, (F.size(a) / 2).cast("int"))) / 2.0
    med = m.withColumn("med", mid(F.col("arr")))
    devs = F.sort_array(F.transform(
        F.col("arr"), lambda x: F.abs(x - F.col("med"))))
    # Materialization barrier before the flag filter (r12, guide §1.2
    # step 1): PushDownPredicates substitutes aliases into a pushed
    # filter with NO cost guard, so `mad > 0 AND |value-med| > 5·mad`
    # expanded into the full med/devs/mad chain — the plan's Filter
    # re-sorted the 14-element frame array ~30× PER ROW (med re-
    # evaluated per transform() element inside each of several devs
    # copies; measured 6.5 s vs the sibling win_rolling_median's
    # 1.7 s). Projecting the five narrow columns and cutting lineage
    # with the configured rank-pass strategy (spark.mdis.rank.
    # materialize — same fault-tolerance trade documented there)
    # makes every stage evaluate once: 6.5 → ~1.8 s at sf0.1.
    scored = _materialize(
        med.withColumn("devs", devs)
        .withColumn("mad", mid(F.col("devs")))
        .select("event_id", "event_type", "value", "med", "mad"))
    return (scored
            .filter((F.col("mad") > 0.0)
                    & (F.abs(F.col("value") - F.col("med"))
                       > 5.0 * F.col("mad")))
            .select("event_id", "event_type",
                    rnd((F.col("value") - F.col("med")) / F.col("mad"), 4)
                    .alias("robust_z")))


@register("win_error_burst", """
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL
), grp AS (
  SELECT user_id, is_err,
         rn - row_number() OVER (PARTITION BY user_id, is_err
                                 ORDER BY rn) AS island
  FROM seq
), runs AS (
  SELECT user_id, count(*) AS run_len
  FROM grp WHERE is_err = 1
  GROUP BY user_id, island
)
SELECT user_id,
       max(run_len)::BIGINT AS max_error_burst,
       count(*) AS n_bursts
FROM runs GROUP BY user_id HAVING max(run_len) >= 3
""")
def win_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detector: each user's longest run of CONSECUTIVE
    error events (classic gaps-and-islands on the event sequence) —
    the reliability signal that separates "errors sprinkled through a
    session" (network noise) from "N errors in a row" (the user is
    stuck and about to churn). Users peaking ≥3 reported.

    Two stacked row_numbers (global seq, per-kind seq) whose
    DIFFERENCE is constant within a run — both windows and the run
    aggregate ride ONE user_id shuffle. No self-join, no lag chains;
    run length is an exact count.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", is_err.alias("is_err")) \
            .withColumn("rn", F.row_number().over(w1))
    w2 = Window.partitionBy("user_id", "is_err").orderBy("rn")
    grp = seq.withColumn("island",
                         F.col("rn") - F.row_number().over(w2))
    runs = (grp.filter(F.col("is_err") == 1)
            .groupBy("user_id", "island")
            .agg(F.count("*").alias("run_len")))
    return (runs.groupBy("user_id")
            .agg(F.max("run_len").alias("max_error_burst"),
                 F.count("*").alias("n_bursts"))
            .filter(F.col("max_error_burst") >= 3))


@register("win_twap", f"""
WITH seq AS (
  SELECT event_type,
         ((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000)::BIGINT AS day,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id)
             - epoch_us(ts) AS dt_us
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
)
SELECT event_type, day,
       count(*) AS n_intervals,
       -- HUGEINT first factor: a pathological multi-century gap makes
       -- cents·µs exceed int64 and DuckDB (like Spark ANSI) ERRORS on
       -- bigint multiply overflow instead of promoting
       {sql_rnd('sum(CAST(cents AS HUGEINT) * dt_us)::DOUBLE'
                ' / sum(dt_us)::DOUBLE / 100.0', 4)} AS twap
FROM seq WHERE dt_us IS NOT NULL AND dt_us > 0
GROUP BY event_type, day
""")
def win_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (event type, day): each value
    weighted by how LONG it prevailed (µs until the next observation)
    — the standard TWAP/sensor-average that a plain avg() gets wrong
    whenever sampling is irregular (a value held for 6 hours counts
    6 h, not 1 sample). `agg_ohlc_bars` gives the endpoints; this
    gives the exposure-correct level between them.

    One event_type shuffle for the lead; weights are exact integer µs
    and values exact cents, multiplied in DECIMAL/HUGEINT (a
    pathological multi-century gap overflows the int64 product and
    both engines ERROR rather than promote — temporal-edge sweep) so
    both engines aggregate exactly and divide once. Zero-length
    intervals (equal timestamps) are excluded on both sides.
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_bounded_frame_buckets)

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    # r10: the lead rides the halo-block primitive (k_fwd=1 — each
    # block carries its successor's first row, so lead(1) is exact per
    # block and no event type funnels through one window task)
    ev = with_bounded_frame_buckets(
        ev, ["event_type"], "ts", ["event_id"], k_fwd=1,
        bucket_proxy=F.unix_micros(F.col("ts")))
    w = (Window.partitionBy("event_type", "_fbkt")
         .orderBy(F.asc_nulls_last("ts"), "event_id"))
    seq = (ev.select(
        "event_type", "_fhalo",
        epoch_day(F.col("ts")).alias("day"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
        .alias("cents"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts"))
        .alias("dt_us"))
        .filter(~F.col("_fhalo")))
    dec = "decimal(38,0)"
    return (seq.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
            .groupBy("event_type", "day")
            .agg(F.count("*").alias("n_intervals"),
                 # DECIMAL factors: cents·µs overflows int64 on
                 # pathological gaps (see the oracle comment)
                 rnd(F.sum(F.col("cents").cast(dec)
                           * F.col("dt_us").cast(dec)).cast("double")
                     / F.sum("dt_us").cast("double") / 100.0, 4)
                 .alias("twap")))


@register("win_rsi", f"""
WITH daily AS (
  SELECT event_type,
         ((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000)::BIGINT AS day,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY event_type, day
), deltas AS (
  SELECT event_type, day,
         cents - lag(cents) OVER w AS d
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
), ga AS (
  SELECT event_type, day,
         sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w14 AS gains,
         sum(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER w14 AS losses,
         count(d) OVER w14 AS n_win
  FROM deltas
  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       {sql_rnd('CASE WHEN losses = 0 THEN 100.0'
                ' ELSE 100.0 - 100.0 / (1.0 + gains::DOUBLE'
                ' / losses::DOUBLE) END', 4)} AS rsi
FROM ga WHERE n_win = 14
""")
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (relative strength index) of the daily value series
    per event type: 100·gains/(gains+losses) over a trailing
    fortnight — the overbought/oversold oscillator, here reading
    metric momentum ("is this KPI's recent movement mostly up or
    mostly down") rather than stock prices.

    Cutler's RSI (simple sums, not Wilder's recursive smoothing) —
    deliberately: the recursive form carries infinite float memory
    (the `win_ewma` class), the windowed form is EXACT integer cents
    until one final division, and both engines agree bit-for-bit on
    every gain/loss sum. Delta lag + both conditional sums + the
    warm-up count ride ONE event_type ordering; all-gain days hit the
    losses=0 branch explicitly on both engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    daily = (ev.select("event_type",
                       epoch_day(F.col("ts")).alias("day"),
                       F.floor(F.col("value") * 100.0 + F.lit(0.5))
                       .cast("long").alias("c"))
             .groupBy("event_type", "day")
             .agg(F.sum("c").alias("cents")))
    w = Window.partitionBy("event_type").orderBy("day")
    deltas = daily.withColumn("d", F.col("cents") - F.lag("cents").over(w))
    w14 = (Window.partitionBy("event_type").orderBy("day")
           .rowsBetween(-13, 0))
    ga = (deltas
          .withColumn("gains", F.sum(
              F.when(F.col("d") > 0, F.col("d")).otherwise(0)).over(w14))
          .withColumn("losses", F.sum(
              F.when(F.col("d") < 0, -F.col("d")).otherwise(0)).over(w14))
          .withColumn("n_win", F.count("d").over(w14)))
    rsi = (F.when(F.col("losses") == 0, 100.0)
           .otherwise(100.0 - 100.0 / (1.0 + F.col("gains").cast("double")
                                       / F.col("losses").cast("double"))))
    return (ga.filter(F.col("n_win") == 14)
            .select("event_type", "day", rnd(rsi, 4).alias("rsi")))


@register("win_bollinger", f"""
WITH daily AS (
    SELECT o_orderdate AS day,
           sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT) AS cents,
           count(*) AS n_orders
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    GROUP BY 1
), win AS (
    SELECT day, cents, n_orders,
           count(*) OVER w AS n_win,
           sum(cents::DOUBLE) OVER w AS s1,
           sum(cents::DOUBLE * cents::DOUBLE) OVER w AS s2
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
), bands AS (
    SELECT day, cents, n_orders,
           s1 / n_win AS mu,
           sqrt(greatest((s2 - s1 * s1 / n_win) / (n_win - 1), 0.0)) AS sd
    FROM win WHERE n_win = 20
)
SELECT day,
       {sql_rnd('cents::DOUBLE / 100.0')} AS revenue,
       {sql_rnd('mu / 100.0')} AS sma20,
       {sql_rnd('(mu - 2.0 * sd) / 100.0')} AS band_lo,
       {sql_rnd('(mu + 2.0 * sd) / 100.0')} AS band_hi,
       (cents::DOUBLE > mu + 2.0 * sd)::INT
       - (cents::DOUBLE < mu - 2.0 * sd)::INT AS breakout
FROM bands
""")
def win_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the daily order-revenue series (20-day
    simple moving average +/- 2 rolling sample stddevs) with a
    breakout flag (+1 above the upper band, -1 below the lower) —
    the volatility-envelope anomaly view `win_rsi`/`win_twap` don't
    give: is today's move large RELATIVE TO recent dispersion?

    Plan: exact-cents daily rollup (one shuffle, map-side partials)
    collapses facts to <=~2400 day rows; the rolling window is a
    single dim-sized global sort, n_win = 20 gating to complete
    windows only. Cross-engine float discipline: the rolling stddev
    is the explicit sum-of-squares form over EXACT integer cent sums
    (both engines square identical doubles; frame-sum association
    drift ~ulp is far below the 2dp band rounding), and the breakout
    comparison runs on raw un-rounded values identically in both
    engines — fixture distance to the band is pinned by the
    guard-band suite, the `win_zscore_outliers` discipline.
    """
    # non-null (day, price) series on both engines — NULL days sort
    # first in Spark's rolling window and last in DuckDB's, shifting
    # every 20-day band (r7 null sweep)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull())
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    daily = (o.groupBy(F.col("o_orderdate").alias("day"))
             .agg(F.sum(cents).alias("cents"),
                  F.count("*").alias("n_orders")))
    w = Window.orderBy("day").rowsBetween(-19, Window.currentRow)
    cd = F.col("cents").cast("double")
    win = daily.select(
        "day", "cents", "n_orders",
        F.count("*").over(w).alias("n_win"),
        F.sum(cd).over(w).alias("s1"),
        F.sum(cd * cd).over(w).alias("s2"))
    mu = F.col("s1") / F.col("n_win")
    sd = F.sqrt(F.greatest(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_win"))
        / (F.col("n_win") - 1), F.lit(0.0)))
    bands = (win.filter(F.col("n_win") == 20)
             .select("day", "cents", "n_orders",
                     mu.alias("mu"), sd.alias("sd")))
    cd2 = F.col("cents").cast("double")
    return bands.select(
        "day",
        rnd(cd2 / 100.0).alias("revenue"),
        rnd(F.col("mu") / 100.0).alias("sma20"),
        rnd((F.col("mu") - 2.0 * F.col("sd")) / 100.0).alias("band_lo"),
        rnd((F.col("mu") + 2.0 * F.col("sd")) / 100.0).alias("band_hi"),
        ((cd2 > F.col("mu") + 2.0 * F.col("sd")).cast("int")
         - (cd2 < F.col("mu") - 2.0 * F.col("sd")).cast("int"))
        .alias("breakout"))


@register("win_range_duration", f"""
WITH daily AS (
    SELECT l_returnflag, CAST(l_shipdate AS DATE) AS ship_day,
           sum(floor(l_extendedprice * 100.0 + 0.5)::BIGINT) AS cents
    FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, ship_day,
       {sql_rnd('cents::DOUBLE / 100.0')} AS day_rev,
       {sql_rnd('(sum(cents) OVER w)::DOUBLE / 100.0')} AS rev_7d,
       (count(*) OVER w)::BIGINT AS n_days_7d
FROM daily
WINDOW w AS (PARTITION BY l_returnflag ORDER BY ship_day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
""")
def win_range_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over TIME, not rows: 7-calendar-day trailing
    revenue per returnflag. Every other rolling op here (`win_moving_
    range`, `win_bollinger`, `win_wma`, ...) frames by ROW COUNT,
    which silently widens over gaps in the series; a duration frame
    (`RANGE BETWEEN INTERVAL 6 DAY PRECEDING`) keeps the window
    honest when days are missing — n_days_7d exposes exactly how many
    days actually landed in each frame.

    Spark has no interval RANGE frames; the equivalent is
    `rangeBetween(-6, 0)` over `unix_date(ship_day)` — day-grain
    epoch integers make the numeric range frame identical to the
    oracle's interval frame. Plan: exact-cents daily rollup (one
    shuffle, map-side partials) collapses the fact table to ≤ ~7200
    (flag, day) rows; the window then sorts 3 bounded partitions.
    Integer cent sums keep the frame sum exact cross-engine — no
    float frame-association drift (the `win_bollinger` discipline).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long")
    daily = (li.groupBy("l_returnflag",
                        F.to_date("l_shipdate").alias("ship_day"))
             .agg(F.sum(cents).alias("cents")))
    w = (Window.partitionBy("l_returnflag")
         .orderBy(F.unix_date(F.col("ship_day")))
         .rangeBetween(-6, Window.currentRow))
    return daily.select(
        "l_returnflag", "ship_day",
        rnd(F.col("cents") / 100.0).alias("day_rev"),
        rnd(F.sum("cents").over(w) / 100.0).alias("rev_7d"),
        F.count("*").over(w).alias("n_days_7d"))


@register("win_trailing_range_type", f"""
SELECT event_id, event_type,
       {sql_rnd('''(sum(floor(value * 100.0 + 0.5)::BIGINT) OVER w)::DOUBLE
                   / 100.0 / (count(value) OVER w)''', 4)} AS avg_1h,
       (count(value) OVER w)::BIGINT AS n_1h
FROM events
WINDOW w AS (PARTITION BY event_type
             ORDER BY epoch_us(ts::TIMESTAMP)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""")
def win_trailing_range_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour average per EVENT TYPE — the bounded-key
    time-RANGE window class (r10 verdict task 4): `win_moving_range`'s
    per-user twin parallelizes natively (entity-scale keys), but keyed
    by ~5 event types the serial window runs ONE TASK PER TYPE over
    the whole fact table. `with_bounded_range_frame` cuts the time
    axis into value-contiguous blocks with 1-hour halo bands, so the
    same exact RANGE frame runs one task per (type, block) — hundreds
    of tasks at 100 TB instead of five. Frame edges are exact
    (epoch-µs integer range on both engines); halo copies complete
    neighbors' frames and are dropped from the output. The frame
    average moves as an EXACT integer-cent sum with one double
    division at the end (the win_bollinger discipline) — a float
    avg() diverges in accumulation order once temporal-edge
    timestamps collapse a whole type into one frame (temporal sweep
    caught the 4dp flip on this op's first cut, r11).
    """
    from manual_data_ingest_spark.functions.ranking import (
        with_bounded_range_frame)

    ev = (load_table(spark, sf_dir, "events")
          .withColumn("_us", F.unix_micros("ts"))
          .withColumn("_cents", F.floor(F.col("value") * 100.0
                                        + F.lit(0.5)).cast("long")))
    framed = with_bounded_range_frame(
        ev, ["event_type"], "_us", delta_back=3_600_000_000.0)
    w = (Window.partitionBy("event_type", "_rbkt")
         .orderBy("_us")
         .rangeBetween(-3_600_000_000, Window.currentRow))
    n = F.count("value").over(w)
    return (framed
            .withColumn("avg_1h",
                        rnd(F.sum("_cents").over(w).cast("double")
                            / 100.0 / n, 4))
            .withColumn("n_1h", n)
            .filter(~F.col("_rhalo"))
            .select("event_id", "event_type", "avg_1h", "n_1h"))


_MACD_EMA = {"e12": "2.0::DOUBLE / 13.0::DOUBLE",
             "e26": "2.0::DOUBLE / 27.0::DOUBLE",
             "sig": "2.0::DOUBLE / 10.0::DOUBLE"}
_M12, _M26, _M9 = _MACD_EMA["e12"], _MACD_EMA["e26"], _MACD_EMA["sig"]


@register("win_macd", f"""
WITH RECURSIVE cents AS (
  SELECT o_orderpriority AS priority, o_orderdate AS dt,
         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT) AS c
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
        AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), idx AS (
  SELECT priority, c::DOUBLE / 100.0 AS v,
         row_number() OVER (PARTITION BY priority ORDER BY dt) AS rn
  FROM cents
), nn AS (SELECT priority, count(*)::BIGINT AS n_days FROM idx GROUP BY 1),
fold AS (
  SELECT priority, 1 AS rn, v AS e12, v AS e26, 0.0::DOUBLE AS sig
  FROM idx WHERE rn = 1
  UNION ALL
  SELECT f.priority, f.rn + 1,
         f.e12 * (1.0::DOUBLE - {_M12}) + i.v * ({_M12}),
         f.e26 * (1.0::DOUBLE - {_M26}) + i.v * ({_M26}),
         f.sig * (1.0::DOUBLE - {_M9})
           + ((f.e12 * (1.0::DOUBLE - {_M12}) + i.v * ({_M12}))
              - (f.e26 * (1.0::DOUBLE - {_M26}) + i.v * ({_M26})))
             * ({_M9})
  FROM fold f JOIN idx i ON i.priority = f.priority AND i.rn = f.rn + 1
)
SELECT f.priority, nn.n_days,
       {sql_rnd('f.e12 - f.e26', 6)} AS macd,
       {sql_rnd('f.sig', 6)} AS signal_line,
       {sql_rnd('(f.e12 - f.e26) - f.sig', 6)} AS histogram
FROM fold f JOIN nn ON f.priority = nn.priority AND f.rn = nn.n_days
""")
def win_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD (12/26 EMA spread + 9-EMA signal) of daily order revenue
    per priority — the trend-following companion to `win_rsi` /
    `win_bollinger`, and the repo's first COUPLED recurrence: e12, e26
    and the signal evolve jointly, which naive implementations push to
    a Python UDF. Here it is ONE codegen fold with a STRUCT
    accumulator (`F.aggregate` over a named struct) — the `win_ewma`
    move generalized to vector state. The oracle is a RECURSIVE CTE
    carrying the same three-field state: DuckDB's own struct
    accumulator (list_reduce over struct_pack) was measured to
    resolve CROSS-FIELD references unstably (one step reads the old
    field, the next the updated one — PARITY.md #38), so the fold is
    mirrored at the row level where the semantics are defined. Both
    engines then evaluate the identical IEEE op sequence (smoothing
    constants written as 2.0/13.0-style divisions so both derive the
    same doubles) — verified bit-exact on a replay series — and the
    6dp rounding cannot straddle.

    The daily series itself is exact-integer cents (sum of
    floor(price·100+0.5) per day — the `agg_anova_f` discipline), so
    the only float arithmetic is the shared fold. Scale: one map-side-
    combinable daily rollup (5×~2400 cells), then per-key folds over
    bounded arrays — the fact is scanned once; keys partition freely.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = (o.filter(F.col("o_orderpriority").isNotNull()
                      & F.col("o_orderdate").isNotNull()
                      & F.col("o_totalprice").isNotNull())
             .groupBy(F.col("o_orderpriority").alias("priority"),
                      F.col("o_orderdate").alias("dt"))
             .agg(F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5)
                        .cast("long")).alias("c")))
    arr = F.array_sort(F.collect_list(F.struct("dt", "c")))
    vals = F.transform(arr, lambda s: s["c"].cast("double") / 100.0)
    a12 = F.lit(2.0) / F.lit(13.0)
    a26 = F.lit(2.0) / F.lit(27.0)
    a9 = F.lit(2.0) / F.lit(10.0)
    one = F.lit(1.0)

    def step(acc, x):
        e12n = acc["e12"] * (one - a12) + x * a12
        e26n = acc["e26"] * (one - a26) + x * a26
        sign = acc["sig"] * (one - a9) + (e12n - e26n) * a9
        return F.struct(e12n.alias("e12"), e26n.alias("e26"),
                        sign.alias("sig"))

    init = F.struct(F.element_at(vals, 1).alias("e12"),
                    F.element_at(vals, 1).alias("e26"),
                    F.lit(0.0).alias("sig"))
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        init, step)
    macd = fold["e12"] - fold["e26"]
    return (cents.groupBy("priority")
            .agg(F.count("*").alias("n_days"),
                 rnd(macd, 6).alias("macd"),
                 rnd(fold["sig"], 6).alias("signal_line"),
                 rnd(macd - fold["sig"], 6).alias("histogram")))


@register("win_holt_linear", f"""
WITH RECURSIVE cents AS (
  SELECT o_orderpriority AS priority,
         date_trunc('month', o_orderdate) AS mo,
         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT) AS c
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
        AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), idx AS (
  SELECT priority, c::DOUBLE / 100.0 AS v,
         row_number() OVER (PARTITION BY priority ORDER BY mo) AS rn
  FROM cents
), nn AS (SELECT priority, count(*)::BIGINT AS n_months FROM idx GROUP BY 1),
fold AS (
  SELECT a.priority, 2 AS rn,
         (1.0::DOUBLE / 5.0) * b.v
           + (1.0::DOUBLE - 1.0::DOUBLE / 5.0) * (a.v + (b.v - a.v)) AS l,
         (1.0::DOUBLE / 10.0)
           * ((1.0::DOUBLE / 5.0) * b.v
              + (1.0::DOUBLE - 1.0::DOUBLE / 5.0) * (a.v + (b.v - a.v))
              - a.v)
           + (1.0::DOUBLE - 1.0::DOUBLE / 10.0) * (b.v - a.v) AS b
  FROM idx a JOIN idx b ON b.priority = a.priority AND b.rn = 2
  WHERE a.rn = 1
  UNION ALL
  SELECT f.priority, f.rn + 1,
         (1.0::DOUBLE / 5.0) * i.v
           + (1.0::DOUBLE - 1.0::DOUBLE / 5.0) * (f.l + f.b),
         (1.0::DOUBLE / 10.0)
           * ((1.0::DOUBLE / 5.0) * i.v
              + (1.0::DOUBLE - 1.0::DOUBLE / 5.0) * (f.l + f.b) - f.l)
           + (1.0::DOUBLE - 1.0::DOUBLE / 10.0) * f.b
  FROM fold f JOIN idx i ON i.priority = f.priority AND i.rn = f.rn + 1
)
SELECT f.priority, nn.n_months,
       {sql_rnd('f.l', 6)} AS level,
       {sql_rnd('f.b', 6)} AS trend,
       {sql_rnd('f.l + f.b', 6)} AS forecast_next
FROM fold f JOIN nn ON f.priority = nn.priority AND f.rn = nn.n_months
UNION ALL
SELECT i.priority, 1::BIGINT AS n_months,
       {sql_rnd('i.v', 6)} AS level,
       NULL::DOUBLE AS trend, NULL::DOUBLE AS forecast_next
FROM idx i JOIN nn ON i.priority = nn.priority
WHERE i.rn = 1 AND nn.n_months = 1
""")
def win_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing of MONTHLY order
    revenue per priority — the trend-aware forecaster `win_ewma`
    (level-only) and `win_seasonal_backtest` (seasonal-naive) bracket
    but neither provides: level and trend evolve as a COUPLED
    recurrence (l_t = α·x_t + (1−α)(l+b); b_t = β(l_t−l) + (1−β)b,
    α=1/5, β=1/10), seeded the standard way (l₁=x₁, b₁=x₂−x₁).

    Same execution contract as `win_macd`: ONE struct-accumulator
    fold (`F.aggregate`) over the per-key month array — the monthly
    rollup is the only fact-wide stage (map-side combinable,
    5×~84 cells), then bounded per-key folds. The oracle is a
    RECURSIVE CTE carrying (l, b) row-by-row — DuckDB's list_reduce
    struct accumulators resolve cross-field refs unstably (PARITY
    #38, discovered on win_macd), so the recurrence is mirrored at
    the row level. Both engines run the identical IEEE op sequence
    (constants spelled 1.0/5.0-form on both sides); the series is
    exact-integer cents so the fold is the only float arithmetic.
    Groups with a single month emit NULL trend/forecast (no slope
    from one point) on both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = (o.filter(F.col("o_orderpriority").isNotNull()
                      & F.col("o_orderdate").isNotNull()
                      & F.col("o_totalprice").isNotNull())
             .groupBy(F.col("o_orderpriority").alias("priority"),
                      F.date_trunc("month", "o_orderdate").alias("mo"))
             .agg(F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5)
                        .cast("long")).alias("c")))
    arr = F.array_sort(F.collect_list(F.struct("mo", "c")))
    vals = F.transform(arr, lambda s: s["c"].cast("double") / 100.0)
    alpha = F.lit(1.0) / F.lit(5.0)
    beta = F.lit(1.0) / F.lit(10.0)
    one = F.lit(1.0)
    x1, x2 = F.element_at(vals, 1), F.element_at(vals, 2)

    def step(acc, x):
        ln = alpha * x + (one - alpha) * (acc["l"] + acc["b"])
        bn = beta * (ln - acc["l"]) + (one - beta) * acc["b"]
        return F.struct(ln.alias("l"), bn.alias("b"))

    # seed at t=2 (l=x1, b=x2−x1), then fold t=2..n INCLUSIVE — the
    # oracle's anchor row applies the same first step explicitly
    init = F.struct(x1.alias("l"), (x2 - x1).alias("b"))
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        init, step)
    has_trend = F.size(vals) >= 2
    return (cents.groupBy("priority")
            .agg(F.count("*").alias("n_months"),
                 rnd(F.when(has_trend, fold["l"])
                     .otherwise(F.element_at(vals, 1)), 6).alias("level"),
                 rnd(F.when(has_trend, fold["b"]), 6).alias("trend"),
                 rnd(F.when(has_trend, fold["l"] + fold["b"]), 6)
                 .alias("forecast_next")))
