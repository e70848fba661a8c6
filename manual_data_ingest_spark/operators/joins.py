"""Join operators (SURVEY.md §2.3).

Reference behavior reconstructed: joining curator sheets (sample→donor),
membership/gap checks against registered entities, small-dim lookups
(organ-code tables). Scale notes per operator in docstrings/comments —
broadcast for dims, Catalyst/AQE choice for fact-fact, and composed
plans for the non-equi shapes Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.registry import register


@register("join_inner_equi", """
SELECT o_orderkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""")
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fact-dim equi join: leave physical choice to Catalyst/AQE (broadcast
    # at small SF, sort-merge when customer outgrows the threshold).
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey, "inner")
            .select("o_orderkey", "c_name", "o_totalprice"))


@register("join_left_outer", """
SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey", "c_name")
            .agg(F.count("o_orderkey").alias("order_cnt")))


@register("join_right_outer", """
SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt
FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""")
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (o.join(c, c.c_custkey == o.o_custkey, "right")
            .groupBy("c_custkey", "c_name")
            .agg(F.count("o_orderkey").alias("order_cnt")))


@register("join_full_outer", """
WITH sn AS (SELECT s_nationkey AS nationkey, count(*) AS supp_cnt
            FROM supplier GROUP BY 1),
     cn AS (SELECT c_nationkey AS nationkey, count(*) AS cust_cnt
            FROM customer GROUP BY 1)
SELECT coalesce(sn.nationkey, cn.nationkey) AS nationkey,
       coalesce(supp_cnt, 0) AS supp_cnt,
       coalesce(cust_cnt, 0) AS cust_cnt
FROM sn FULL OUTER JOIN cn ON sn.nationkey = cn.nationkey
""")
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reconciliation report: nations having suppliers vs customers
    s = (load_table(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("nationkey"))
         .agg(F.count("*").alias("supp_cnt")))
    c = (load_table(spark, sf_dir, "customer")
         .groupBy(F.col("c_nationkey").alias("nationkey"))
         .agg(F.count("*").alias("cust_cnt")))
    return (s.join(c, "nationkey", "full")
            .select(F.col("nationkey"),
                    F.coalesce("supp_cnt", F.lit(0)).alias("supp_cnt"),
                    F.coalesce("cust_cnt", F.lit(0)).alias("cust_cnt")))


@register("join_semi", """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "already registered?" membership check — semi join never duplicates
    # the left side, and only the join key of the right side is shuffled.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


@register("join_anti", """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "not yet ingested" gap report: customers with no URGENT order
    # (every customer has >=1 order at sf>=0.01, so the plain anti join
    # would be a vacuous 0-row check — this predicate has real gaps)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


@register("join_broadcast", """
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
""")
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit broadcast hint: region is a bounded dim (5 rows at any SF);
    # at 100 TB this stays a map-side join with zero shuffle of nation.
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("n_nationkey", "n_name", "r_name"))


@register("join_cross", """
SELECT r_name, n_nationkey, n_name
FROM region CROSS JOIN nation
WHERE r_regionkey = 0
""")
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bounded candidate-pair generation; the filter collapses one side
    # BEFORE the product (Catalyst pushes it below the join).
    r = load_table(spark, sf_dir, "region").filter(F.col("r_regionkey") == 0)
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_nationkey", "n_name")


@register("join_range_theta", """
SELECT o_orderkey, l_linenumber, o_orderdate, l_shipdate
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
""")
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # equi conjunct carries the shuffle (hash on orderkey); the date-window
    # conjuncts evaluate as post-join residual predicates — so this stays
    # an efficient hash/sort-merge join, NOT a cartesian range join.
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return (o.join(li, cond)
            .select("o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate"))


@register("join_asof", """
WITH p AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events
           WHERE event_type = 'purchase'),
     c AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events
           WHERE event_type = 'click')
SELECT event_id, ts, click_ts FROM (
    SELECT p.event_id, p.ts,
           c.ts AS click_ts,
           row_number() OVER (PARTITION BY p.event_id
                              ORDER BY c.ts DESC, c.event_id DESC) AS rn
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
) WHERE rn = 1
""")
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior click by user.

    Spark has no native as-of join. Shipped formulation: UNION the two
    event kinds, one user_id window ordered (ts, kind, event_id) with
    `last(click_ts, ignoreNulls)` over the running frame — clicks sort
    before purchases at equal ts so `<=` semantics hold, and the
    ascending order makes `last` pick the max-ts / max-event_id click,
    matching the oracle's DESC/DESC tie-break. ONE shuffle, no
    purchase×candidate-click intermediate. The previous range-join +
    row_number=1 form (kept in `join_asof_nearest`/`_forward`/
    `_tolerance` where the band bounds the blow-up) was A/B-measured
    SLOWER here: 1.10 s vs 0.80 s cold at the bench 4× replica — the
    equi+range join materializes every prior click per purchase before
    the window discards all but one. At 100 TB dense per-user
    histories make that gap arbitrarily wide; the union form's state
    is one row per event.
    """
    ev = load_table(spark, sf_dir, "events")
    both = (ev.filter(F.col("event_type").isin("purchase", "click"))
            .select("event_id", "ts", "user_id",
                    F.when(F.col("event_type") == "click", 0).otherwise(1)
                    .alias("kind"),
                    F.when(F.col("event_type") == "click", F.col("ts"))
                    .alias("c_ts")))
    w = (Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (both.withColumn("click_ts",
                            F.last("c_ts", ignorenulls=True).over(w))
            .filter(F.col("kind") == 1)
            .select("event_id", "ts", "click_ts"))


@register("join_null_safe", """
SELECT nullif(o1.o_orderpriority, '5-LOW') AS prio_class, count(*) AS n
FROM orders o1 JOIN orders o2
  ON o1.o_orderkey = o2.o_orderkey
 AND nullif(o1.o_orderpriority, '5-LOW')
     IS NOT DISTINCT FROM nullif(o2.o_orderpriority, '5-LOW')
GROUP BY 1
""")
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # null-safe equality (<=> / IS NOT DISTINCT FROM): rows whose derived
    # key is NULL still match each other — with plain '=', the NULL
    # class would silently vanish from the join (the classic curator-
    # sheet bug when joining on optional columns). Count per class
    # includes the NULL row to prove it.
    o = load_table(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    o1 = o.select("o_orderkey", prio.alias("p1")).alias("o1")
    o2 = o.select("o_orderkey", prio.alias("p2")).alias("o2")
    return (o1.join(o2, (F.col("o1.o_orderkey") == F.col("o2.o_orderkey"))
                    & F.col("p1").eqNullSafe(F.col("p2")))
            .groupBy(F.col("p1").alias("prio_class"))
            .agg(F.count("*").alias("n")))


@register("lateral_join_topn", """
SELECT r.r_name, t.n_name
FROM region r, LATERAL (
    SELECT n_name FROM nation n
    WHERE n.n_regionkey = r.r_regionkey
    ORDER BY n_name LIMIT 2
) t
""")
def lateral_join_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # correlated LATERAL subquery (Spark 3.2+ SQL): per outer row, an
    # inner ordered LIMIT — "first 2 nations per region" without a
    # window over the whole table. Catalyst decorrelates to a
    # rank-filtered join; at scale this beats the window form when the
    # outer side is selective (the limit prunes per group).
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_lv")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lv")
    return spark.sql("""
        SELECT r.r_name, t.n_name
        FROM region_lv r, LATERAL (
            SELECT n_name FROM nation_lv n
            WHERE n.n_regionkey = r.r_regionkey
            ORDER BY n_name LIMIT 2
        ) t
    """)


@register("join_interval_overlap", """
SELECT a.user_id,
       a.event_id AS click_id,
       b.event_id AS error_id
FROM (SELECT * FROM events WHERE event_type = 'click') a
JOIN (SELECT * FROM events WHERE event_type = 'error') b
  ON a.user_id = b.user_id
 AND a.ts <= b.ts + INTERVAL 1 HOUR
 AND b.ts <= a.ts + INTERVAL 1 HOUR
""")
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via BUCKET BLOCKING: each 1-hour activity
    interval ([ts, ts+1h] around clicks and errors per user) is
    exploded into the hour buckets it covers, the two sides equi-join
    on (user_id, bucket), and the exact overlap predicate filters the
    candidates. The oracle is the naive theta join.

    Why not just the theta join: Spark executes a non-equi interval
    condition as a broadcast nested-loop / cartesian-per-key — O(n·m)
    per user, a scale-killer for hot users. Bucketing turns it into an
    EQUI-join (shuffle-hash on (user_id, bucket)): each interval lands
    in ≤ ceil(len/bucket)+1 buckets, so candidates are only pairs
    already within a bucket of each other — the classic spatial-grid /
    DBSCAN-style blocking, and the same shape Flink uses for interval
    joins. `distinct` before the verify dedups the two-bucket
    straddle case.
    """
    ev = load_table(spark, sf_dir, "events")

    def side(kind: str, id_alias: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == kind)
        s = F.unix_timestamp("ts")
        buckets = F.sequence(F.floor(s / 3600),
                             F.floor((s + 3600) / 3600))
        return e.select(F.col("user_id"),
                        F.col("event_id").alias(id_alias),
                        F.col("ts").alias(f"{id_alias}_ts"),
                        F.explode(buckets).alias("bucket"))

    a = side("click", "click_id")
    b = side("error", "error_id")
    hour = F.expr("INTERVAL 1 HOUR")
    return (a.join(b, ["user_id", "bucket"])
            .filter((F.col("click_id_ts") <= F.col("error_id_ts") + hour)
                    & (F.col("error_id_ts") <= F.col("click_id_ts") + hour))
            .select("user_id", "click_id", "error_id")
            .distinct())


@register("join_pit_scd2", """
WITH dim AS (
    SELECT user_id, event_id AS version_id, value AS status_value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to
    FROM events WHERE event_type = 'signup'
),
facts AS (
    SELECT event_id, user_id, ts, value
    FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id,
       d.version_id,
       floor(d.status_value * 100.0 + 0.5) / 100.0 AS status_value
FROM facts f
JOIN dim d
  ON f.user_id = d.user_id
 AND d.valid_from <= f.ts
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
""")
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join — the feature-store primitive: each
    fact (purchase) joins the dimension VERSION that was valid at the
    fact's timestamp, against an SCD2 interval table built from signup
    events (`ingest_scd2`'s shape). No fact ever sees a future
    attribute — the leakage rule every training-feature pipeline must
    enforce.

    Shape: equi-join on the entity key carries the weight; the
    interval predicate then selects exactly one version per fact
    (intervals partition time — the SCD2 law pinned in
    tests/test_new_ops.py). Per-entity version counts are small and
    bounded, so the post-equi-join fanout is O(versions), not O(n·m);
    at extreme version counts this becomes `join_asof`'s
    sort-merge-within-partition shape instead.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("valid_from", "version_id")
    dim = (ev.filter(F.col("event_type") == "signup")
           .select("user_id",
                   F.col("event_id").alias("version_id"),
                   F.col("value").alias("status_value"),
                   F.col("ts").alias("valid_from"))
           .withColumn("valid_to", F.lead("valid_from").over(w)))
    facts = (ev.filter(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "ts"))
    from manual_data_ingest_spark.functions.rounding import rnd
    return (facts.join(dim, "user_id")
            .filter((F.col("valid_from") <= F.col("ts"))
                    & (F.col("valid_to").isNull()
                       | (F.col("ts") < F.col("valid_to"))))
            .select("event_id", "user_id", "version_id",
                    rnd(F.col("status_value")).alias("status_value")))


@register("join_asof_nearest", """
WITH p AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS c_event_id, ts AS click_ts, user_id
  FROM events WHERE event_type = 'click'
)
SELECT event_id, c_event_id,
       (epoch_us(ts::TIMESTAMP) - epoch_us(click_ts::TIMESTAMP)) / 1000000.0
           AS signed_gap_sec
FROM (
  SELECT p.event_id, c.c_event_id, p.ts, c.click_ts,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(epoch_us(p.ts::TIMESTAMP)
                        - epoch_us(c.click_ts::TIMESTAMP)),
                    c.click_ts, c.c_event_id) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.click_ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR
) WHERE rn = 1
""")
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas merge_asof
    direction='nearest' semantics, ±1 h tolerance): for each purchase,
    the click closest in time either way; ties prefer the earlier
    click, then the lower event_id — a total order, so deterministic.

    Same scale posture as the backward `join_asof`: the equi conjunct
    (user_id) carries the shuffle, the time band bounds the candidate
    fan-out per purchase, and the per-purchase row_number collapses it.
    The tolerance is load-bearing at 100 TB — nearest WITHOUT a band
    cannot prune and degenerates to per-user cross products.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user_id"))
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))
    w = Window.partitionBy("event_id").orderBy(
        F.abs(gap), F.col("click_ts"), F.col("c_event_id"))
    return (p.join(c, (p.user_id == c.c_user_id)
                   & (c.click_ts >= p.ts - F.expr("INTERVAL 1 HOUR"))
                   & (c.click_ts <= p.ts + F.expr("INTERVAL 1 HOUR")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("event_id", "c_event_id",
                    (gap / 1000000.0).alias("signed_gap_sec")))


@register("join_asof_forward", """
WITH p AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS c_event_id, ts AS click_ts, user_id
  FROM events WHERE event_type = 'click'
)
SELECT event_id, c_event_id,
       (epoch_us(click_ts::TIMESTAMP) - epoch_us(ts::TIMESTAMP)) / 1000000.0
           AS followup_gap_sec
FROM (
  SELECT p.event_id, c.c_event_id, p.ts, c.click_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.click_ts, c.c_event_id) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.click_ts > p.ts
   AND c.click_ts <= p.ts + INTERVAL 1 HOUR
) WHERE rn = 1
""")
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction (merge_asof direction='forward',
    1 h tolerance): the first click strictly AFTER each purchase —
    the post-purchase follow-up question, completing the
    backward (`join_asof`) / nearest (`join_asof_nearest`) / forward
    trio. Same plan shape: user-key equi shuffle, banded candidates,
    per-purchase row_number with the (click_ts, event_id) total order.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user_id"))
    w = Window.partitionBy("event_id").orderBy("click_ts", "c_event_id")
    return (p.join(c, (p.user_id == c.c_user_id)
                   & (c.click_ts > p.ts)
                   & (c.click_ts <= p.ts + F.expr("INTERVAL 1 HOUR")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("event_id", "c_event_id",
                    ((F.unix_micros(F.col("click_ts"))
                      - F.unix_micros(F.col("ts"))) / 1000000.0)
                    .alias("followup_gap_sec")))


@register("join_asof_tolerance", """
WITH p AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events
           WHERE event_type = 'purchase'),
     c AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events
           WHERE event_type = 'click')
SELECT event_id, ts, click_ts,
       CASE WHEN click_ts IS NULL THEN 0 ELSE 1 END AS matched
FROM (
    SELECT p.event_id, p.ts,
           c.ts AS click_ts,
           row_number() OVER (PARTITION BY p.event_id
                              ORDER BY c.ts DESC, c.event_id DESC) AS rn
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 2 HOUR
) WHERE rn = 1
""")
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE band (pandas `merge_asof(tolerance=...)`
    semantics): the most recent prior click per purchase, but only
    within 2 h — older matches are discarded, purchases with no
    in-window click keep a NULL row and a `matched=0` flag.

    The tolerance bound is not just semantics — it is THE scale lever
    the unbounded as-of lacks: the band predicate caps the per-row
    candidate fan-out (an unbounded backward join over a year of
    history scans a user's whole past; a 2 h band prunes to a bounded
    slice, and a range-partitioned layout turns it into partition-local
    work). Completes the as-of family: backward (`join_asof`), nearest
    (`join_asof_nearest`), forward (`join_asof_forward`), banded (this).
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), F.col("ts").alias("click_ts"),
        F.col("user_id").alias("c_user_id"))
    band = ((c.click_ts <= p.ts)
            & (c.click_ts >= p.ts - F.expr("INTERVAL 2 HOURS")))
    w = Window.partitionBy("event_id").orderBy(
        F.col("click_ts").desc(), F.col("c_event_id").desc())
    return (p.join(c, (p.user_id == c.c_user_id) & band, "left")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("event_id", "ts", "click_ts",
                    F.when(F.col("click_ts").isNull(), 0).otherwise(1)
                    .alias("matched")))


@register("join_fuzzy_levenshtein", """
WITH dirty AS (
  -- deterministic corruption: every 50th part name loses its 3rd char
  SELECT p_partkey AS dirty_id,
         substr(p_name, 1, 2) || substr(p_name, 4) AS dirty_name
  FROM part WHERE p_partkey % 50 = 0 AND length(p_name) > 3
), cand AS (
  SELECT d.dirty_id, d.dirty_name, p.p_partkey, p.p_name,
         levenshtein(d.dirty_name, p.p_name) AS dist
  FROM dirty d JOIN part p
    ON substr(d.dirty_name, 1, 2) = substr(p.p_name, 1, 2)
   AND abs(length(d.dirty_name) - length(p.p_name)) <= 2
)
SELECT dirty_id, dirty_name, p_partkey AS matched_key, dist FROM (
  SELECT dirty_id, dirty_name, p_partkey, dist,
         row_number() OVER (PARTITION BY dirty_id
                            ORDER BY dist, p_partkey) AS rn
  FROM cand
) WHERE rn = 1
""")
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: corrupted catalog names (every 50th part
    name with its 3rd character deterministically dropped — a
    reproducible stand-in for typo'd vendor feeds) matched back to the
    catalog by minimum edit distance. The record-linkage workhorse
    when no normalization (`dedup_fuzzy_key`) makes keys collide.

    NEVER all-pairs: candidates are BLOCKED on (2-char prefix, length
    band ±2) — the standard blocking key that turns O(n·m) Levenshtein
    into a skew-bounded equi-join with a residual band predicate; at
    100 TB the prefix key is what the blocking literature calls a
    cheap-and-dirty pass, and a second block on a different key
    catches first-char typos. Edit distance is integer DP — identical
    on both engines — and the top-1 carries the (dist, partkey)
    total-order tie-break.
    """
    p = load_table(spark, sf_dir, "part")
    dirty = (p.filter((F.col("p_partkey") % 50 == 0)
                      & (F.length("p_name") > 3))
             .select(F.col("p_partkey").alias("dirty_id"),
                     F.concat(F.substring("p_name", 1, 2),
                              F.expr("substr(p_name, 4)"))
                     .alias("dirty_name")))
    cand = (dirty.join(
        p,
        (F.substring("dirty_name", 1, 2) == F.substring("p_name", 1, 2))
        & (F.abs(F.length("dirty_name") - F.length("p_name")) <= 2)))
    w = Window.partitionBy("dirty_id").orderBy("dist", "p_partkey")
    return (cand
            .select("dirty_id", "dirty_name", "p_partkey",
                    F.levenshtein("dirty_name", "p_name").alias("dist"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("dirty_id", "dirty_name",
                    F.col("p_partkey").alias("matched_key"), "dist"))


@register("join_band_bucketed", """
SELECT s_suppkey,
       count(o_orderkey) AS n_matches,
       min(o_orderkey) AS min_orderkey
FROM supplier LEFT JOIN orders
  ON abs(o_totalprice - s_acctbal) <= 1000.0
GROUP BY s_suppkey
""")
def join_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS global band join — |o_totalprice − s_acctbal| ≤ δ with no
    equi conjunct anywhere. `join_range_theta` and
    `join_interval_overlap` both lean on an equi key to carry the
    shuffle; without one Spark executes a band predicate as a
    broadcast-nested-loop over the FULL build side — O(n·m) with no
    key to save you. The classic fix (Databricks' range-join hint,
    DuckDB's IEJoin alternative) is value-grid bucketing: hash both
    sides into δ-width buckets of the band variable, explode each
    probe into its 3 adjacent buckets (a match within δ can only live
    there), equi-join on the bucket, then apply the exact predicate.

    The oracle is the naive theta LEFT JOIN; the engine path is
    plan-asserted equi (no BNLJ/cartesian — tests/test_plans.py).
    Candidates per probe ≈ 3·n/n_buckets instead of n; both sides
    shuffle (or broadcast, AQE's call) on a uniformly-distributed
    integer bucket, so the shape survives 100× on either side. The
    band compare runs on raw doubles computed by the same elementary
    ops in both engines — bit-identical inputs, deterministic verdict
    (the `join_range_theta` discipline).
    """
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    delta = 1000.0
    ob = o.select("o_orderkey", "o_totalprice",
                  F.floor(F.col("o_totalprice") / delta)
                  .cast("long").alias("bucket"))
    pb = F.floor(F.col("s_acctbal") / delta).cast("long")
    probes = s.select(
        "s_suppkey", "s_acctbal",
        F.explode(F.array(pb - 1, pb, pb + 1)).alias("bucket"))
    m = (probes.join(ob, "bucket")
         .filter(F.abs(F.col("o_totalprice") - F.col("s_acctbal")) <= delta)
         .groupBy("s_suppkey")
         .agg(F.count("o_orderkey").alias("n_matches"),
              F.min("o_orderkey").alias("min_orderkey")))
    return (s.select("s_suppkey").join(m, "s_suppkey", "left")
            .select("s_suppkey",
                    F.coalesce(F.col("n_matches"), F.lit(0).cast("long"))
                    .alias("n_matches"),
                    "min_orderkey"))


_BLOOM_M = 1 << 20  # filter bits: fp ~(k*n/m)^k -> <1e-3 at sf0.1's ~30k keys
_BLOOM_K = 3        # hash functions (xxhash64 seeded by function index)


def bloom_positions(col: str, m: int = _BLOOM_M, k: int = _BLOOM_K) -> list:
    """The k bit positions of a key — THE shared formula: build and
    probe both call this, so they cannot drift apart (the r5 advisor
    found the property test re-deriving a parallel implementation)."""
    return [F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m))
            for i in range(k)]


def bloom_build(spark: SparkSession, keys: DataFrame, key_col: str,
                m: int = _BLOOM_M, k: int = _BLOOM_K) -> DataFrame:
    """Fold a keyset into ONE row holding `bf`, a DENSE array<long>
    bitmap of m bits (m/64 words — an ARRAY, not a map: catalyst map
    element_at is a linear scan per probe, F.get is O(1)). Fixed size
    regardless of key count, so it always broadcasts."""
    words = (keys.select(F.explode(F.array(*bloom_positions(key_col, m, k)))
                         .alias("pos"))
             .select((F.col("pos") / 64).cast("int").alias("word_idx"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(pmod(pos, 64) AS INT))").alias("bit"))
             .groupBy("word_idx").agg(F.bit_or("bit").alias("w")))
    grid = (spark.range(m // 64)
            .select(F.col("id").cast("int").alias("word_idx")))
    return (grid.join(words, "word_idx", "left")
            .select("word_idx",
                    F.coalesce("w", F.lit(0).cast("long")).alias("w"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("word_idx", "w"))),
                lambda x: x["w"]).alias("bf")))


def bloom_bit_set(i: int) -> "F.Column":
    """Probe: test position column p{i} against the broadcast `bf`."""
    word = F.coalesce(
        F.get(F.col("bf"), (F.col(f"p{i}") / 64).cast("int")),
        F.lit(0).cast("long"))
    bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                 f"CAST(pmod(p{i}, 64) AS INT))")
    return word.bitwiseAND(bit) != 0


@register("join_bloom_prefilter", """
SELECT l_returnflag,
       count(*)::BIGINT AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
""")
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a BLOOM-FILTER prefilter — the scale pattern for
    'filter a fact table by a keyset too big to broadcast raw' (the
    r4 verdict's `ingest_validate` finding: forcing the keyset into a
    broadcast OOMs at 100 TB; AQE-shuffling it pays a full exchange).
    The bloom bitmap is FIXED SIZE (m bits regardless of key count),
    so it always broadcasts; fact rows failing the membership test —
    the vast majority when the keyset is selective — never enter the
    exact join's shuffle. False positives are resolved by the exact
    semi join on the survivors, so the RESULT is bit-identical to the
    plain semi join (the oracle) — the bloom is pure strategy.

    Built from public DataFrame ops (`bloom_filter_agg` is not in the
    public function catalog): k=3 positions per key via seeded
    xxhash64 mod m, bitmap words via groupBy(word).bit_or(bit) folded
    into ONE dense array<long> row (m/64 entries = 128 KB at m=2^20 —
    an ARRAY, not a map: catalyst map element_at is a linear scan per
    probe, F.get on the array is O(1)); the fact side recomputes the
    k positions in codegen and tests all k bits against the broadcast
    bitmap. The build/probe expressions are SHARED module helpers
    (`bloom_build` / `bloom_positions` / `bloom_bit_set` above): the
    hypothesis no-false-negatives law in tests/test_properties.py runs
    against these exact production expressions (r5 advisor — the old
    test proved the law for a parallel map-based rebuild), and the
    fp-rate bound is pinned in tests/test_new_ops.py; the keyset is
    never hint-broadcast (registry-wide detector in test_plans.py).
    """
    from functools import reduce
    li = load_table(spark, sf_dir, "lineitem")
    keys = (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey"))

    # shiftleft() takes a literal bit count, so the helpers name the
    # position column and shift via a SQL expression over it; the dense
    # array-vs-map lesson (8.4 s -> sub-second at 1x) lives in
    # bloom_build.
    bloom = bloom_build(spark, keys, "o_orderkey")

    with_pos = li.crossJoin(F.broadcast(bloom))
    for i, p in enumerate(bloom_positions("l_orderkey")):
        with_pos = with_pos.withColumn(f"p{i}", p)
    survives = reduce(lambda a, b: a & b,
                      [bloom_bit_set(i) for i in range(_BLOOM_K)])
    # join key ANCHORED to the bloom verdict: on surviving rows
    # when(bit0, l_orderkey) IS l_orderkey, but the alias references bf,
    # so PushDownLeftSemiAntiJoin cannot rewrite the semi join below the
    # bloom stage (unguarded, Catalyst pushes the semi join under the
    # cross join and the prefilter never prefilters — observed, and
    # plan-asserted in tests/test_plans.py)
    prefiltered = (with_pos.filter(survives)
                   .withColumn("jk", F.when(bloom_bit_set(0), F.col("l_orderkey")))
                   .drop("bf", *[f"p{i}" for i in range(_BLOOM_K)]))
    exact = prefiltered.join(keys, prefiltered.jk == keys.o_orderkey,
                             "left_semi")
    return (exact.groupBy("l_returnflag")
            .agg(F.count("*").alias("n_lines"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


@register("join_skew_aqe", """
WITH l AS (
  SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
              ELSE l_orderkey END AS k,
         floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS cents
  FROM lineitem
), d AS (
  SELECT DISTINCT CASE WHEN o_orderkey % 4 <> 0 THEN 0
                       ELSE o_orderkey END AS k
  FROM orders
), dim AS (SELECT k, k % 7 AS grp FROM d)
SELECT dim.grp, count(*)::BIGINT AS n,
       floor((sum(l.cents)::DOUBLE / 100.0) * 100.0 + 0.5) / 100.0
           AS revenue
FROM l JOIN dim ON l.k = dim.k
GROUP BY 1
""")
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE SKEW-JOIN handling, demonstrated end to end — the engine-
    native answer to the HAND-salted `join_skew_salted`: ~75% of the
    left rows collapse onto one hot key (the real-world power-law
    join), the plan is forced to sort-merge, and at runtime AQE's
    OptimizeSkewedJoin SPLITS the hot partition into advisory-sized
    slices that join the (replicated) dim rows in parallel —
    tests/test_plans.py asserts `skew=true` inside the executed SMJ.
    Without the split, one task drags the whole stage (the straggler
    shape `join_skew_salted` documents); with it, no code changes and
    no salt key reach the query.

    Demonstration scaling, same policy as `scan_dpp_pruned`: the skew
    detection thresholds (256 MB partition floor by default) are
    lowered inside try/finally so the mechanism FIRES at fixture
    scale; at production scale the defaults do this unprompted.
    Broadcast is disabled for the same reason — a dim that fits in
    memory would broadcast and make skew moot (which IS the first-
    choice fix; this operator is for when neither side broadcasts).
    Result correctness is split-invariant — the oracle is the plain
    join.
    """
    return _skew_aqe_demo(spark, sf_dir)[0]


def _skew_aqe_demo(spark: SparkSession, sf_dir: str):
    """Run the skew-join demo on an ISOLATED ``spark.newSession()`` and
    return ``(result_df, executed_plan_str)``.

    Conf isolation (r7 advisor): the demo thresholds
    (autoBroadcastJoinThreshold=-1, 32KB skew floor, no coalesce) used
    to be set on the SHARED session around execution — any operator
    running concurrently in the same session would have executed under
    them. ``newSession()`` shares the SparkContext (and executors) but
    owns its SQLConf, so the demo confs never leak; nothing needs
    restoring. The plan string is RETURNED, not stashed on a session
    attribute, so tests assert on a value they derived themselves.
    This op reads only lineitem/orders (DATE columns — no nanos
    timestamp conf needed on the fresh session); AQE is on by default.
    """
    s = spark.newSession()
    li = load_table(s, sf_dir, "lineitem")
    o = load_table(s, sf_dir, "orders")
    k_l = F.when(F.col("l_orderkey") % 4 != 0, F.lit(0)) \
        .otherwise(F.col("l_orderkey")).alias("k")
    k_o = F.when(F.col("o_orderkey") % 4 != 0, F.lit(0)) \
        .otherwise(F.col("o_orderkey")).alias("k")
    # the split unit of OptimizeSkewedJoin is the MAPPER OUTPUT RANGE:
    # a hot reduce partition fed by a single map task cannot be split
    # at all (root-caused here — the single-file fixture scan is one
    # mapper, so skew handling silently never fired). The round-robin
    # repartition gives the fixture the multi-mapper shuffle a real
    # table has natively; the dim is checkpointed so its distinct agg
    # doesn't sit between the join and its shuffle stage (the
    # SMJ(Sort(ShuffleStage)) pattern OptimizeSkewedJoin matches).
    left = li.select(k_l, F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
                     .cast("long").alias("cents")).repartition(8)
    dim = (o.select(k_o).distinct()
           .select("k", (F.col("k") % 7).alias("grp"))
           .localCheckpoint(eager=True))
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin."
               "skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    joined = left.join(dim, "k")
    res = (joined.groupBy("grp")
           .agg(F.count("*").alias("n"),
                (F.floor((F.sum("cents").cast("double") / 100.0)
                         * 100.0 + F.lit(0.5)) / 100.0)
                .alias("revenue")))
    out = res.localCheckpoint(eager=True)  # execute under demo confs
    plan = res._jdf.queryExecution().executedPlan().toString()
    return out, plan


@register("join_runtime_bloom", """
SELECT p_brand, count(*)::BIGINT AS n,
       floor(sum(l_extendedprice) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_partkey % 10 = 0
GROUP BY p_brand
""")
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE runtime bloom-filter injection — the engine-side
    sibling of the hand-built `join_bloom_prefilter`: when a selective
    filter sits on the creation (dim) side of a shuffle join, the
    InjectRuntimeFilter rule plants a `bloom_filter_agg` subquery over
    the filtered dim keys and rewrites the fact scan's predicate to
    `might_contain(...)` — fact rows that cannot join are dropped
    BEFORE the shuffle, with zero query changes. tests/test_plans.py
    asserts both plan nodes on the executed plan.

    Demonstration scaling, same policy as `scan_dpp_pruned` /
    `join_skew_aqe`: the application-side scan-size threshold (10 GB
    default — exactly right at 100 TB, where this fires unprompted) is
    lowered on an ISOLATED newSession so the mechanism fires at
    fixture scale; broadcast is disabled because a broadcast join
    already ships the dim keys (runtime bloom targets shuffle joins).
    """
    return _runtime_bloom_demo(spark, sf_dir)[0]


def _runtime_bloom_demo(spark: SparkSession, sf_dir: str):
    """Run the runtime-bloom demo on an isolated session; return
    (result_df, executed_plan_str) — the join_skew_aqe pattern: confs
    never touch the shared session, tests assert on a returned value."""
    from manual_data_ingest_spark.functions.rounding import rnd

    s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter."
               "applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter."
               "creationSideThreshold", "64MB")
    li = load_table(s, sf_dir, "lineitem")
    p = (load_table(s, sf_dir, "part")
         .filter(F.col("p_partkey") % 10 == 0))
    res = (li.join(p, F.col("p_partkey") == F.col("l_partkey"))
           .groupBy("p_brand")
           .agg(F.count(F.lit(1)).alias("n"),
                rnd(F.sum("l_extendedprice")).alias("revenue")))
    out = res.localCheckpoint(eager=True)  # execute under demo confs
    plan = res._jdf.queryExecution().executedPlan().toString()
    return out, plan
