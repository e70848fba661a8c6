"""Reshape operators: pivot, unpivot, deterministic sampling.

Curator reporting reshapes (wide segment matrices, melted metric rows)
plus the hash-based sampling a 100 TB pipeline uses instead of
TABLESAMPLE — `TABLESAMPLE` is engine/seed-dependent, while a content
hash (md5 of the key) selects the SAME rows on any engine, any cluster
size, any run: the property that makes samples joinable and audits
reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.registry import register

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

_PIVOT_COLS_SQL = ",\n       ".join(
    f"count(*) FILTER (WHERE c_mktsegment = '{s}') AS {s.lower()}"
    for s in _SEGMENTS)


@register("pivot_segment_counts", f"""
SELECT c_nationkey,
       {_PIVOT_COLS_SQL}
FROM customer
GROUP BY c_nationkey
""")
def pivot_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # wide reporting matrix: customers per nation × market segment.
    # The pivot value list is EXPLICIT — with it, Spark pivots in a
    # single pass (no extra distinct-values job) and the output schema
    # is static, which is what a 100 TB scheduled report needs.
    c = load_table(spark, sf_dir, "customer")
    out = (c.groupBy("c_nationkey")
           .pivot("c_mktsegment", _SEGMENTS)
           .agg(F.count(F.lit(1))))
    renamed = out.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS])
    return renamed


@register("unpivot_part_metrics", """
SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice', p_retailprice FROM part
""")
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # melt wide columns to (key, metric, value) rows — the shape
    # downstream metric stores ingest. Spark's native unpivot emits
    # rows without a join or explode.
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey",
                    F.col("p_size").cast("double").alias("size"),
                    F.col("p_retailprice").alias("retailprice")) \
            .unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


@register("sample_hash", f"""
SELECT o_orderstatus,
       count(*) AS n,
       {sql_rnd('sum(o_totalprice)')} AS sum_price
FROM orders
WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 4))::INT % 10 = 0
GROUP BY o_orderstatus
""")
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via key-hash bucketing, aggregated.

    `md5(key) % 10 == 0` picks the same rows on every engine and every
    run (unlike TABLESAMPLE/rand seeds, which are engine-specific), so
    dev-scale samples stay consistent across the Spark pipeline and any
    SQL engine auditing it. Filter is map-side; only the sampled ~10%
    reaches the aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.expr(
        "cast(conv(substring(md5(cast(o_orderkey as string)), 1, 4), 16, 10)"
        " as int) % 10")
    return (o.filter(bucket == 0)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"),
                 rnd(F.sum("o_totalprice")).alias("sum_price")))


@register("sample_stratified", """
WITH ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(doc_id::VARCHAR)) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM documents
)
SELECT doc_id, lang FROM ranked
WHERE rn <= ceil(n * 0.2)
""")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sample: 20% of documents PER language, chosen
    by md5(doc_id) rank — every stratum is represented at exactly
    ceil(0.2*n), unlike Bernoulli `sampleBy` which only hits the
    fraction in expectation and can empty a rare stratum.

    md5 parity across engines (PARITY.md) makes the selection
    engine-reproducible, and the hash order is stable under corpus
    growth for the ranking (a new doc perturbs only ranks behind its
    hash). One shuffle on `lang`; both windows (rank + stratum count)
    share it. Rare-language upsampling at 100 TB is this same shape
    with a per-stratum fraction joined in from a tiny broadcast table.
    """
    # r10 (bounded-partition window class): the 20% cut is a fraction
    # of the stratum, so no group-limit pushdown applies — the rank
    # rides the partitioned rank primitive (md5 hex-prefix bigint as
    # the bucket proxy; exact sort on the full digest) and the stratum
    # count comes from the same pass's per-bucket counts
    from manual_data_ingest_spark.functions.ranking import (
        with_exact_partitioned_rank)

    d = load_table(spark, sf_dir, "documents")
    ordered = d.withColumn("_ord", F.md5(F.col("doc_id").cast("string")))
    return (with_exact_partitioned_rank(
        ordered, ["lang"], "_ord", ["doc_id"], rank_col="rn",
        total_col="n",
        bucket_proxy=F.expr(
            "cast(conv(substring(_ord, 1, 15), 16, 10) as bigint)"))
        .filter(F.col("rn") <= F.ceil(F.col("n") * 0.2))
        .select("doc_id", "lang"))


@register("sample_temperature_mix", """
WITH counts AS (
  SELECT source, count(*) AS c FROM documents GROUP BY source
), wts AS (
  SELECT source, c,
         CAST(floor(sqrt(c) * 1000000.0) AS BIGINT) AS w
  FROM counts
), tot AS (
  SELECT sum(w)::BIGINT AS tw, count(*) AS n_src FROM wts
), alloc AS (
  SELECT source, c, w,
         (w * 1000) // tw AS base_q,
         (w * 1000) % tw  AS rem
  FROM wts, tot
), deficit AS (
  SELECT 1000 - sum(base_q) AS d FROM alloc
), bonus AS (
  SELECT source,
         CASE WHEN row_number() OVER (ORDER BY rem DESC,
                                      source NULLS FIRST)
                   <= (SELECT d FROM deficit) THEN 1 ELSE 0 END AS b
  FROM alloc
)
SELECT a.source, a.c,
       (a.base_q + b.b)::BIGINT AS quota,
       least(a.base_q + b.b, a.c)::BIGINT AS n_downsampled,
       floor((a.base_q + b.b)::DOUBLE / a.c * 1000000.0 + 0.5) / 1000000.0
           AS epochs
FROM alloc a JOIN bonus b ON a.source IS NOT DISTINCT FROM b.source
""")
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based data mixing (τ = 0.5): per-source sampling
    quotas ∝ count^τ, allocated EXACTLY to a 1000-doc budget by the
    largest-remainder method — the pretraining-mix computation behind
    'rebalance sources with temperature' (multilingual/LLM mixture
    lore), with `epochs` > 1 marking sources the mix would upsample.

    Determinism across engines is engineered: sqrt is exactly rounded
    in IEEE 754, and everything after it is INTEGER arithmetic
    (µ-scaled weights, integer div/mod for base quotas and
    remainders), so no float summation order can flip an allocation —
    the trap a pow(c, 0.7)-based version would hit. The allocation is
    a dim-sized computation (one row per source); applying it is a
    per-source hash-ranked filter riding the corpus scan
    (`sample_stratified`'s mechanism).
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("c"))
    wts = counts.select(
        "source", "c",
        F.floor(F.sqrt(F.col("c")) * 1000000.0).cast("long").alias("w"))
    tot = wts.agg(F.sum("w").alias("tw"))
    alloc = (wts.crossJoin(F.broadcast(tot))
             .select("source", "c",
                     F.expr("w * 1000 div tw").alias("base_q"),
                     F.expr("(w * 1000) % tw").alias("rem")))
    deficit = alloc.agg((F.lit(1000) - F.sum("base_q")).alias("d"))
    # a NULL source is a real stratum: the Spark side never rejoins on
    # the grouping key (withColumn carries b), and the oracle's rejoin
    # is IS NOT DISTINCT FROM — a plain equi-join dropped the NULL
    # stratum (r7 null sweep). Tie-break NULLS FIRST, explicit on both.
    wb = Window.orderBy(F.col("rem").desc(), F.asc_nulls_first("source"))
    bonus = (alloc.crossJoin(F.broadcast(deficit))
             .withColumn("b", F.when(F.row_number().over(wb)
                                     <= F.col("d"), 1).otherwise(0)))
    quota = F.col("base_q") + F.col("b")
    return bonus.select(
        "source", "c",
        quota.alias("quota"),
        F.least(quota, F.col("c")).alias("n_downsampled"),
        rnd(quota.cast("double") / F.col("c"), 6).alias("epochs"))


@register("sample_train_val_test", """
WITH tagged AS (
  SELECT source,
         CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT source,
               CAST(('0x' || substring(md5(doc_id::VARCHAR || '|split'), 1, 8))
                    AS BIGINT) % 10 AS b
        FROM documents)
)
SELECT source, split, count(*) AS n_docs
FROM tagged GROUP BY source, split
""")
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-key
    hash — the split every ML corpus build needs to be REPRODUCIBLE
    and LEAKAGE-FREE: the split is a pure function of doc_id (salted),
    so re-runs, backfills, and incremental appends land each doc in
    the same split forever, with no split-assignment table to store or
    join. Map-only tagging rides the scan; the summary here counts per
    (source, split) so skew between sources is visible. The salt
    ('|split') isolates this hash from every other doc_id-derived
    hash in the engine (buckets, samples) — unsalted reuse would
    correlate the split with `sample_hash`'s keep set.
    """
    d = load_table(spark, sf_dir, "documents")
    b = (F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                           F.lit("|split"))), 1, 8), 16, 10)
         .cast("long") % 10)
    split = (F.when(b < 8, "train").when(b < 9, "val").otherwise("test"))
    return (d.select("source", split.alias("split"))
            .groupBy("source", "split").agg(F.count("*").alias("n_docs")))


@register("sample_importance_weighted", """
WITH scored AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_words,
         CAST(floor(CAST(least(len(string_split(text, ' ')), 200) AS DOUBLE)
                    / 200.0 * 65536.0) AS BIGINT) AS thr,
         ('0x' || substr(md5(doc_id::VARCHAR || '|imp'), 1, 4))::BIGINT
             AS h16
  FROM documents
), kept AS (
  SELECT lang, n_words, CASE WHEN h16 < thr THEN 1 ELSE 0 END AS keep
  FROM scored
)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       floor(CAST(sum(keep) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
           / 1000000.0 AS kept_rate,
       floor(CAST(sum(CASE WHEN keep = 1 THEN n_words ELSE 0 END) AS DOUBLE)
             / nullif(sum(keep), 0) * 100.0 + 0.5) / 100.0
           AS kept_avg_words,
       floor(CAST(sum(n_words) AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0
           AS all_avg_words
FROM kept
GROUP BY lang
""")
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted (importance) sampling for training-data
    curation: each document keeps with probability proportional to its
    quality weight (here min(words,200)/200 — longer docs up to a cap
    are likelier kept), decided by comparing a salted 16-bit key hash
    against the per-doc threshold. The report shows, per language, the
    realized keep rate and the kept-vs-all mean length — the upweighting
    visible as kept_avg_words > all_avg_words.

    Unlike rand()-based weighted sampling this is REPRODUCIBLE and
    engine-portable: md5 prefix → integer (the `sample_hash` pattern),
    salted with '|imp' so the keep set is independent of every other
    doc_id-derived hash in the engine. Threshold = floor(w·65536) over
    an exact-int word count — both sides integer-compare.

    100 TB: map-only decision, no shuffle until the per-lang report;
    weights from any scorer column (model quality, dedup multiplicity)
    slot into the same threshold form.
    """
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    thr = F.floor(F.least(n_words, F.lit(200)).cast("double")
                  / 200.0 * 65536.0).cast("long")
    h16 = F.expr("cast(conv(substring(md5(concat(cast(doc_id as string),"
                 " '|imp')), 1, 4), 16, 10) as bigint)")
    kept = d.select("lang", n_words.alias("n_words"),
                    F.when(h16 < thr, 1).otherwise(0).alias("keep"))
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_total"),
                 F.sum("keep").alias("n_kept"),
                 rnd(F.sum("keep").cast("double") / F.count("*"), 6)
                 .alias("kept_rate"),
                 rnd(F.sum(F.when(F.col("keep") == 1, F.col("n_words"))
                           .otherwise(0)).cast("double")
                     / F.nullif(F.sum("keep"), F.lit(0)).cast("double"))
                 .alias("kept_avg_words"),
                 rnd(F.sum("n_words").cast("double") / F.count("*"))
                 .alias("all_avg_words")))


@register("sample_group_holdout", f"""
WITH assigned AS (
    SELECT user_id, value,
           CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INT % 10
                     <= 7 THEN 'train'
                WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::INT % 10
                     = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM events
)
SELECT split,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       {sql_rnd('sum(value)', 2)} AS sum_value
FROM assigned
GROUP BY split
""")
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-whole-groups-out split: every USER lands in exactly one of
    train/val/test (80/10/10 by md5 bucket of user_id), so no user's
    events straddle a split boundary — the contamination
    `sample_train_val_test` (row-granular) cannot rule out when rows of
    one entity are correlated.

    The group key is hashed, never the row, so assignment is stable
    under any data growth for that user and reproducible across engines
    (md5 parity, the `sample_hash` pattern). Assignment is map-side
    codegen; the only shuffle is the report aggregation. At 100 TB this
    decides eval membership for dedup/decontamination, so determinism
    under backfills is the load-bearing property.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(
        "cast(conv(substring(md5(cast(user_id as string)), 1, 4), 16, 10)"
        " as int) % 10")
    split = (F.when(bucket <= 7, "train")
             .when(bucket == 8, "val").otherwise("test"))
    return (ev.withColumn("split", split)
            .groupBy("split")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count("*").alias("n_events"),
                 rnd(F.sum("value"), 2).alias("sum_value")))


@register("sample_balanced_label", """
WITH ranked AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY label
                            ORDER BY md5(vec_id::VARCHAR)) AS rn
  FROM embeddings WHERE label IS NOT NULL
), mn AS (
  SELECT min(c) AS k FROM (
    SELECT count(*) AS c FROM embeddings
    WHERE label IS NOT NULL GROUP BY label)
)
SELECT vec_id, label FROM ranked WHERE rn <= (SELECT k FROM mn)
""")
def sample_balanced_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsample: every label keeps exactly
    min-class-count rows, chosen by md5(vec_id) rank — the classifier-
    training prep that stops a 99:1 majority class from drowning the
    loss, with engine-reproducible row selection (no rand seeds).

    One label shuffle for the rank window; the per-class counts reduce
    to a one-row broadcast scalar (min), so the final filter is
    map-side. At 100 TB the same shape balances trillion-row corpora:
    the scalar subquery stays one row no matter the input, and
    upsampling the minority instead is this plan with the rank
    replaced by a modular replication index.
    """
    # r10 (bounded-partition window class): the cut is the min class
    # count — a scalar, not a literal, so no group-limit pushdown —
    # ride the partitioned rank primitive (md5 hex-prefix proxy)
    from manual_data_ingest_spark.functions.ranking import (
        with_exact_partitioned_rank)

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull())
    ordered = e.withColumn("_ord", F.md5(F.col("vec_id").cast("string")))
    ranked = with_exact_partitioned_rank(
        ordered, ["label"], "_ord", ["vec_id"], rank_col="rn",
        bucket_proxy=F.expr(
            "cast(conv(substring(_ord, 1, 15), 16, 10) as bigint)"))
    k = (e.groupBy("label").agg(F.count("*").alias("c"))
         .agg(F.min("c").alias("k")))
    return (ranked.join(F.broadcast(k), F.col("rn") <= F.col("k"))
            .select("vec_id", "label"))


@register("sample_negative_pairs", """
WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
h AS (SELECT doc_id, md5(text) AS th FROM documents),
cand AS (
  SELECT a.doc_id, (a.doc_id + k.k * 37) % (SELECT n FROM n) AS neg_id, k.k
  FROM documents a, (SELECT unnest([1, 2, 3]) AS k) k
)
SELECT c.doc_id, c.neg_id, c.k
FROM cand c
JOIN h ha ON ha.doc_id = c.doc_id
JOIN h hb ON hb.doc_id = c.neg_id
WHERE c.neg_id <> c.doc_id AND ha.th <> hb.th
""")
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-pair mining for contrastive training:
    each document gets 3 pseudo-random partners by fixed stride
    ((doc_id + k·37) mod N), with exact-duplicate texts excluded so a
    "negative" is never secretly a positive — the standard in-batch-
    negatives prep, made reproducible (re-runs and backfills mint the
    SAME pairs, unlike rand() mining).

    The stride assignment is map-only arithmetic off a one-row
    broadcast scalar (N); the only data joins are two doc_id-keyed hash
    lookups to compare content digests — the join key is the 8-byte id
    and the digest is 32 bytes, so the shuffled payload stays tiny at
    any corpus size. Hard-negative upgrades (same-label strides,
    `sim_knn_graph` mid-rank picks) keep this exact topology.
    """
    d = load_table(spark, sf_dir, "documents")
    n = d.agg((F.max("doc_id") + 1).alias("n"))
    h = d.select("doc_id", F.md5("text").alias("th"))
    cand = (d.select("doc_id")
            .join(F.broadcast(n))
            .select("doc_id",
                    F.explode(F.array(F.lit(1), F.lit(2), F.lit(3)))
                    .alias("k"), "n")
            .select("doc_id", ((F.col("doc_id") + F.col("k") * 37)
                               % F.col("n")).alias("neg_id"), "k"))
    ha = h.select(F.col("doc_id").alias("doc_id"), F.col("th").alias("tha"))
    hb = h.select(F.col("doc_id").alias("neg_id"), F.col("th").alias("thb"))
    return (cand.filter(F.col("neg_id") != F.col("doc_id"))
            .join(ha, "doc_id").join(hb, "neg_id")
            .filter(F.col("tha") != F.col("thb"))
            .select("doc_id", "neg_id", "k"))


_EPOCHS = 3
_SHARDS = 8


@register("sample_epoch_shuffle", f"""
WITH keyed AS (
    SELECT e.epoch, doc_id,
           ('0x' || substr(md5(e.epoch::VARCHAR || ':' || doc_id::VARCHAR),
                           1, 15))::BIGINT AS k
    FROM documents,
         LATERAL (SELECT unnest(generate_series(0, {_EPOCHS - 1}))
                  AS epoch) e
)
SELECT epoch, (k % {_SHARDS})::INT AS shard,
       row_number() OVER (PARTITION BY epoch, k % {_SHARDS}
                          ORDER BY k, doc_id) AS position,
       doc_id
FROM keyed
""")
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-data shuffle: every document
    gets a stable (epoch, shard, position) — the order a distributed
    data loader replays IDENTICALLY on any engine, any partition
    layout, any restart. Seeded RNG shuffles break exactly where this
    matters (resume mid-epoch on different hardware, audit which
    examples a checkpoint saw); a hash order is the reproducible
    answer, and re-keying by epoch gives a genuinely different
    permutation per epoch.

    Scale shape: the shuffle key is md5(epoch:doc_id) (§2.14 parity —
    no RNG, no state); sharding by key mod {_SHARDS} makes each
    epoch's ordering a PER-SHARD window — fully parallel, no global
    sort; a 100 TB loader keys shards to workers and each worker
    range-reads its own slice in position order. Positions tie-break
    on doc_id under the (vanishing) chance of equal 60-bit keys.
    """
    d = load_table(spark, sf_dir, "documents")
    keyed = (d.select("doc_id",
                      F.explode(F.sequence(F.lit(0), F.lit(_EPOCHS - 1)))
                      .alias("epoch"))
             .select("epoch", "doc_id",
                     F.expr("cast(conv(substring(md5(concat("
                            "cast(epoch as string), ':',"
                            " cast(doc_id as string))), 1, 15), 16, 10)"
                            " as bigint)").alias("k")))
    w = Window.partitionBy("epoch", F.col("k") % _SHARDS) \
        .orderBy("k", "doc_id")
    return keyed.select(
        "epoch", (F.col("k") % _SHARDS).cast("int").alias("shard"),
        F.row_number().over(w).alias("position"), "doc_id")


_NEYMAN_BUDGET = 1000  # total sample budget allocated across strata


@register("sample_neyman_allocation", f"""
WITH m AS (
    SELECT c_mktsegment AS segment,
           count(*)::DOUBLE AS n_h,
           count(c_acctbal)::BIGINT AS n_s,
           sum(floor(c_acctbal * 100.0 + 0.5)::HUGEINT) AS s_c,
           sum(floor(c_acctbal * 100.0 + 0.5)::HUGEINT
               * floor(c_acctbal * 100.0 + 0.5)::BIGINT) AS q_c
    FROM customer GROUP BY 1
), s AS (
    SELECT segment, n_h,
           CASE WHEN n_s > 1 THEN
             sqrt((n_s::DOUBLE * q_c - s_c::DOUBLE * s_c)
                  / (n_s::DOUBLE * (n_s - 1))) / 100.0
           END AS s_h
    FROM m
), t AS (
    SELECT segment, n_h, s_h,
           n_h * s_h / sum(n_h * s_h) OVER () AS w_raw,
           n_h / sum(n_h) OVER () AS prop_raw
    FROM s
)
SELECT segment,
       CAST(n_h AS BIGINT) AS stratum_size,
       {sql_rnd('s_h', 4)} AS stratum_sd,
       {sql_rnd('w_raw', 6)} AS neyman_share,
       CAST(floor({_NEYMAN_BUDGET} * ({sql_rnd('w_raw', 6)}) + 0.5) AS BIGINT)
           AS alloc_n,
       CAST(floor({_NEYMAN_BUDGET} * ({sql_rnd('prop_raw', 6)}) + 0.5)
            AS BIGINT) AS proportional_n
FROM t
""")
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample ALLOCATION — the sizing step
    the `sample_stratified` executor consumes: for a fixed budget n,
    allocate n_h ∝ N_h·S_h (stratum size × within-stratum stddev),
    which minimizes the variance of the stratified mean; the
    proportional allocation (n_h ∝ N_h) sits beside it as the naive
    baseline, so the table directly shows where variance-aware
    sampling moves the budget.

    Scale shape: one map-side-combined aggregate over the scan (count
    + cents power sums per stratum) and a 5-row window — the design
    table is dim-sized however big the frame is. Determinism: S_h is
    derived from EXACT 128-bit integer cents moments (n, Σc, Σc² —
    the `agg_anova_f` discipline; the r5 advisor flagged the earlier
    float stddev_samp, whose partial-aggregation order differs across
    engines/partitions) via ONE fixed IEEE expression, and
    allocations are floor(n·share+0.5) on the 6dp-ROUNDED shares, so
    both engines integer-allocate from identical inputs.
    """
    c = load_table(spark, sf_dir, "customer")
    d19 = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    cc = F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("long")
    m = (c.select(F.col("c_mktsegment").alias("segment"), cc.alias("cc"))
         .groupBy("segment")
         .agg(F.count("*").cast("double").alias("n_h"),
              F.count("cc").alias("n_s"),
              F.sum(d19(F.col("cc"))).alias("s_c"),
              F.sum(d19(F.col("cc")) * d19(F.col("cc"))).alias("q_c")))
    nsd = F.col("n_s").cast("double")
    s = m.select(
        "segment", "n_h",
        F.when(F.col("n_s") > 1,
               F.sqrt((nsd * F.col("q_c")
                       - F.col("s_c").cast("double") * F.col("s_c"))
                      / (nsd * (nsd - 1))) / 100.0).alias("s_h"))
    w = Window.partitionBy()
    t = s.select(
        "segment", "n_h", "s_h",
        (F.col("n_h") * F.col("s_h")
         / F.sum(F.col("n_h") * F.col("s_h")).over(w)).alias("w_raw"),
        (F.col("n_h") / F.sum("n_h").over(w)).alias("prop_raw"))
    share = rnd(F.col("w_raw"), 6)
    pshare = rnd(F.col("prop_raw"), 6)
    return t.select(
        "segment",
        F.col("n_h").cast("long").alias("stratum_size"),
        rnd(F.col("s_h"), 4).alias("stratum_sd"),
        share.alias("neyman_share"),
        F.floor(_NEYMAN_BUDGET * share + 0.5).cast("long").alias("alloc_n"),
        F.floor(_NEYMAN_BUDGET * pshare + 0.5).cast("long")
        .alias("proportional_n"))
