"""Targeted tests for the r1 additions: BLAS/expression path equality,
stream-stream join parity, SCD2 interval laws, salted-join equivalence,
rollup cascade consistency.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E
from tests.conftest import SF_SMALL, SF_ORACLE


def _rows(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


def test_blas_equals_expression_path(spark):
    qs = E.queries()
    a = _rows(qs["sim_threshold_pairs"](spark, SF_ORACLE))
    b = _rows(qs["sim_threshold_expr"](spark, SF_ORACLE))
    assert a == b  # two execution strategies, one result


def test_scd2_intervals_partition_time(spark):
    out = E.queries()["ingest_scd2"](spark, SF_SMALL)
    rows = out.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r.user_id, r.event_type), []).append(r)
    for key, rs in by_key.items():
        rs.sort(key=lambda r: (r.valid_from, r.event_id))
        # exactly one open (current) interval per key, and it is the last
        currents = [r for r in rs if r.is_current]
        assert len(currents) == 1 and currents[0] is rs[-1], key
        # intervals chain: each valid_to equals the next valid_from
        for prev, nxt in zip(rs, rs[1:]):
            assert prev.valid_to == nxt.valid_from, key


def test_salted_join_equals_plain_join(spark):
    from manual_data_ingest_spark.io import load_table

    salted = _rows(E.queries()["join_skew_salted"](spark, SF_ORACLE))
    o = load_table(spark, SF_ORACLE, "orders")
    c = load_table(spark, SF_ORACLE, "customer")
    plain = _rows(
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_orders"),
             F.countDistinct("o_custkey").alias("n_custs")))
    assert salted == plain


def test_stream_join_matches_batch_join(spark):
    from manual_data_ingest_spark.io import load_events

    got = E.queries()["stream_join"](spark, SF_SMALL)
    ev = load_events(spark, SF_SMALL)
    p = ev.filter(F.col("event_type") == "purchase") \
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("u"), F.col("ts").alias("p_ts"))
    c = ev.filter(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("cu"), F.col("ts").alias("c_ts"))
    batch = (p.join(c, (F.col("u") == F.col("cu"))
                    & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
                    & (F.col("c_ts") <= F.col("p_ts")))
             .select("purchase_id", "click_id", F.col("u").alias("user_id"),
                     F.expr("(unix_micros(p_ts) - unix_micros(c_ts))"
                            " div 1000000").alias("gap_sec")))
    assert _rows(got) == _rows(batch)


def test_time_rollup_levels_consistent(spark):
    out = E.queries()["agg_time_rollup"](spark, SF_SMALL).collect()
    by_res = {}
    for r in out:
        by_res.setdefault(r.resolution, []).append(r)
    n_hour = sum(r.cnt for r in by_res["hour"])
    n_day = sum(r.cnt for r in by_res["day"])
    (total,) = by_res["total"]
    assert n_hour == n_day == total.cnt  # counts conserve up the cascade
    assert total.bucket is None
    # every hour bucket nests inside a day bucket that exists
    days = {r.bucket for r in by_res["day"]}
    for r in by_res["hour"]:
        assert r.bucket.replace(hour=0, minute=0, second=0, microsecond=0) in days


def test_approx_quantile_rank_error_bound(spark):
    """GK sketch at accuracy 1000 guarantees rank error <= n/1000;
    verify each approximate quantile's true rank is within bound, and
    the registered query's self-check boolean holds."""
    from pyspark.sql import functions as F
    from manual_data_ingest_spark.io import load_table

    for r in E.queries()["agg_approx_quantile"](spark, SF_ORACLE).collect():
        assert r.approx_ok, r  # the oracle-facing error-bound flag
    got = {r.o_orderstatus: r.q for r in
           load_table(spark, SF_ORACLE, "orders")
           .groupBy("o_orderstatus")
           .agg(F.percentile_approx(
               "o_totalprice", [0.5, 0.9, 0.99], 1000).alias("q"))
           .collect()}
    orders = load_table(spark, SF_ORACLE, "orders") \
        .select("o_orderstatus", "o_totalprice").collect()
    by_status = {}
    for r in orders:
        by_status.setdefault(r.o_orderstatus, []).append(r.o_totalprice)
    for status, vals in by_status.items():
        vals.sort()
        n = len(vals)
        for i, p in enumerate((0.5, 0.9, 0.99)):
            v = got[status][i]
            import bisect
            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            target = p * n
            # true rank interval of v must be within n/1000 of target
            err = min(abs(lo - target), abs(hi - target))
            assert err <= n / 1000 + 1, (status, p, err, n)


def test_dedup_clusters_are_valid_components(spark):
    """Cluster labels must be consistent with the pair graph: every
    near-dup pair shares a label; every label is the min doc_id of its
    cluster; singletons label themselves."""
    qs = E.queries()
    labels = {r.doc_id: r.cluster_id
              for r in qs["dedup_clusters"](spark, SF_ORACLE).collect()}
    pairs = [(r.id_a, r.id_b)
             for r in qs["dedup_near_jaccard"](spark, SF_ORACLE).collect()]
    assert pairs, "fixture should contain near-dup pairs"
    for a, b in pairs:
        assert labels[a] == labels[b], (a, b)
    members = {}
    for doc, lab in labels.items():
        members.setdefault(lab, []).append(doc)
    for lab, docs in members.items():
        assert lab == min(docs)  # representative is the minimum member
    paired = {d for p in pairs for d in p}
    for doc, lab in labels.items():
        if doc not in paired:
            assert lab == doc  # singleton labels itself


def test_approx_distinct_error_bound(spark):
    """HLL++ at default rsd=0.05 must land within ~3 standard errors of
    the exact distinct count (deterministic for a fixed input)."""
    from manual_data_ingest_spark.io import load_table

    row = E.queries()["agg_approx_distinct"](spark, SF_ORACLE).first()
    exact = (load_table(spark, SF_ORACLE, "lineitem")
             .select("l_partkey").distinct().count())
    assert row.exact_parts == exact
    assert row.within_bound  # the oracle-facing HLL error-bound flag


def test_scalable_mint_equals_serial_mint(spark):
    # two-phase bucket ranking must reproduce the global row_number exactly
    qs = E.queries()
    assert _rows(qs["ingest_id_mint_scalable"](spark, SF_ORACLE)) == \
        _rows(qs["ingest_id_mint"](spark, SF_ORACLE))


def test_post_entities_retry_contract(spark):
    """Receipts are a pure function of the idempotency key: attempts==2
    iff the key's first hex nibble < 4, everything 'created', and the
    result is invariant to Arrow batch size (per-row determinism)."""
    rows = E.queries()["ingest_post_entities"](spark, SF_ORACLE).collect()
    assert len(rows) == 500
    for r in rows:
        expect = 2 if int(r.idem_key[0], 16) < 4 else 1
        assert r.attempts == expect, r
        assert r.status == "created"
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        small = E.queries()["ingest_post_entities"](spark, SF_ORACLE).collect()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert sorted(map(tuple, small)) == sorted(map(tuple, rows))


def test_dynamic_overwrite_touches_only_delta_partitions(spark, tmp_path):
    """The MERGE mechanism: dynamic partition overwrite must leave
    untouched partitions' files byte-identical on disk."""
    import os

    out = str(tmp_path / "merge")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, p string, v double")
    base.write.mode("overwrite").partitionBy("p").parquet(out)

    def part_files(p):
        d = os.path.join(out, f"p={p}")
        return {f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d) if f.endswith(".parquet")}

    before_b, before_c = part_files("b"), part_files("c")
    delta = spark.createDataFrame([(1, "a", 11.0)], "k int, p string, v double")
    (delta.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("p").parquet(out))
    assert part_files("b") == before_b  # untouched partitions unrewritten
    assert part_files("c") == before_c
    back = {(r.k, r.p): r.v for r in spark.read.parquet(out).collect()}
    assert back == {(1, "a"): 11.0, (2, "b"): 20.0, (3, "c"): 30.0}


def test_scan_excel_matches_nation(spark):
    from manual_data_ingest_spark.io import load_table

    got = _rows(E.queries()["scan_excel"](spark, SF_ORACLE))
    want = _rows(load_table(spark, SF_ORACLE, "nation"))
    assert got == want


def test_skew_kurtosis_match_numpy_population_moments(spark):
    import numpy as np
    from manual_data_ingest_spark.io import load_table

    got = {r.o_orderstatus: (r.skew, r.kurt)
           for r in E.queries()["agg_skew_kurtosis"](spark, SF_ORACLE).collect()}
    rows = (load_table(spark, SF_ORACLE, "orders")
            .select("o_orderstatus", "o_totalprice").collect())
    by = {}
    for r in rows:
        by.setdefault(r.o_orderstatus, []).append(r.o_totalprice)
    for status, vals in by.items():
        x = np.array(vals)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        g1 = ((x - m) ** 3).mean() / m2 ** 1.5
        g2 = ((x - m) ** 4).mean() / m2 ** 2 - 3
        assert abs(got[status][0] - g1) < 1e-4, status
        assert abs(got[status][1] - g2) < 1e-4, status


def test_compaction_output_matches_listing(spark):
    """sink_compaction's summary row must reflect the on-disk result:
    64 fragment files in, ceil(rows/50k) right-sized files out (the
    operator itself asserts the listing count equals the target)."""
    import math

    row = E.queries()["sink_compaction"](spark, SF_ORACLE).collect()[0]
    assert row.files_before == 64
    assert row.files_after == max(1, math.ceil(row.n_rows / 50_000))


def test_heavy_hitters_threshold_is_exact(spark):
    """Every emitted entity clears 1.2x the mean count; the heaviest
    non-emitted entity does not (exactness — no sketch approximation)."""
    ev = E.queries()["agg_heavy_hitters"](spark, SF_ORACLE)
    rows = {r.user_id: r.cnt for r in ev.collect()}
    from manual_data_ingest_spark.io import load_table
    import pyspark.sql.functions as F

    counts = {r.user_id: r.n for r in
              load_table(spark, SF_ORACLE, "events")
              .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    mean = sum(counts.values()) / len(counts)
    expect = {u for u, n in counts.items() if n >= 1.2 * mean}
    assert set(rows) == expect


def test_quarantine_split_is_exhaustive_and_exclusive(spark):
    """ingest_quarantine: every lineitem row lands in exactly one bucket
    (reason or OK), and each row's bucket matches an independent
    re-evaluation of the policy rules."""
    from manual_data_ingest_spark.io import load_table

    out = E.queries()["ingest_quarantine"](spark, SF_ORACLE)
    got = {r.reason: r.n_rows for r in out.collect()}
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_discount", "l_quantity").collect()
    expect = {}
    for r in li:
        tags = []
        if r.l_discount > 0.08:
            tags.append("discount_above_policy")
        if r.l_quantity >= 49:
            tags.append("quantity_outlier")
        key = ",".join(tags) if tags else "OK"
        expect[key] = expect.get(key, 0) + 1
    assert got == expect
    assert sum(got.values()) == len(li)  # exhaustive, no row dropped


def test_mode_tie_break_is_smallest_value(spark):
    """agg_mode_deterministic: per-group mode equals the max-count
    quantity, ties broken toward the SMALLEST value (pinned contract,
    unlike F.mode's unspecified tie choice)."""
    from manual_data_ingest_spark.io import load_table

    out = E.queries()["agg_mode_deterministic"](spark, SF_ORACLE)
    got = {r.l_returnflag: (r.mode_qty, r.mode_count) for r in out.collect()}
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_returnflag", "l_quantity").collect()
    counts = {}
    for r in li:
        k = (r.l_returnflag, r.l_quantity)
        counts[k] = counts.get(k, 0) + 1
    for flag in {r.l_returnflag for r in li}:
        best = min(((-n, q) for (f, q), n in counts.items() if f == flag))
        assert got[flag] == (best[1], -best[0]), flag


def test_sorted_layout_prunes_rowgroups(spark, tmp_path):
    """sink_sorted_layout's claim, measured from parquet footers: with
    sortWithinPartitions(l_shipdate) + small row groups, a one-month
    predicate overlaps only a small fraction of row groups; the same
    write WITHOUT the sort leaves (nearly) every group overlapping."""
    import datetime
    import glob

    import pyarrow.parquet as pq
    from manual_data_ingest_spark.io import load_table

    li = load_table(spark, SF_ORACLE, "lineitem")

    def write(sorted_: bool) -> str:
        out = str(tmp_path / ("sorted" if sorted_ else "plain"))
        df = li.repartition(8, "l_orderkey")
        if sorted_:
            df = df.sortWithinPartitions("l_shipdate")
        (df.write.mode("overwrite")
         .option("parquet.block.size", 256 * 1024).parquet(out))
        return out

    lo = datetime.datetime(1996, 3, 1)
    hi = datetime.datetime(1996, 3, 31, 23, 59, 59)

    def overlap_fraction(path: str) -> float:
        total = hit = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}["l_shipdate"]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += 1
                # a group without min/max can never be skipped — counts
                # as a hit (regression guard: the engine must write
                # INT64 timestamps, since INT96 carries no stats)
                if st is None or not st.has_min_max:
                    hit += 1  # unskippable
                    continue
                mn = st.min.replace(tzinfo=None)  # stats are UTC-aware
                mx = st.max.replace(tzinfo=None)
                if mn <= hi and mx >= lo:
                    hit += 1
        assert total >= 16, f"too few row groups ({total}) to measure"
        return hit / total

    frac_sorted = overlap_fraction(write(True))
    frac_plain = overlap_fraction(write(False))
    assert frac_plain > 0.9, frac_plain   # unsorted: no skipping possible
    assert frac_sorted < 0.35, frac_sorted  # sorted: most groups pruned


def test_bloom_layout_writes_bloom_pages(spark, tmp_path):
    """sink_bloom_layout's layout claim, measured behaviorally: the
    same rewrite with `parquet.bloom.filter.enabled#event_id` must be
    strictly LARGER on disk than without it (bloom pages are real
    bytes — pyarrow 16 exposes no bloom metadata attribute, so byte
    growth is the observable), while the lookup content is identical
    from both layouts."""
    import glob
    import os

    from manual_data_ingest_spark.io import load_table

    ev = load_table(spark, SF_ORACLE, "events")

    def write(bloom: bool) -> str:
        out = str(tmp_path / ("bloom" if bloom else "plain"))
        w = ev.repartition(4).write.mode("overwrite")
        if bloom:
            w = (w.option("parquet.bloom.filter.enabled#event_id", "true")
                 .option("parquet.bloom.filter.expected.ndv#event_id",
                         "100000"))
        w.parquet(out)
        return out

    def nbytes(path: str) -> int:
        return sum(os.path.getsize(f)
                   for f in glob.glob(f"{path}/part-*.parquet"))

    bloom_dir, plain_dir = write(True), write(False)
    grown = nbytes(bloom_dir) - nbytes(plain_dir)
    assert grown > 10_000, grown  # bloom pages are KBs per row group
    look = lambda p: sorted(
        (r.event_id, r.user_id) for r in spark.read.parquet(p)
        .filter(F.col("event_id") % 1009 == 7)
        .select("event_id", "user_id").collect())
    assert look(bloom_dir) == look(plain_dir)


def test_incremental_agg_split_invariance(spark):
    """refresh(state, delta) must be independent of WHERE history was
    cut — merging day<=20 state with day>20 delta is the operator;
    this pins the monoid law by comparing against a day<=10 cut."""
    from manual_data_ingest_spark.io import load_table

    ref = _rows(E.queries()["ingest_incremental_agg"](spark, SF_ORACLE))
    ev = load_table(spark, SF_ORACLE, "events")
    day = F.dayofmonth("ts")
    agg = lambda df: (df.groupBy("user_id", "event_type")
                      .agg(F.count("*").alias("n_events"),
                           F.sum("value").alias("sum_value")))
    from manual_data_ingest_spark.functions.rounding import rnd
    alt = (agg(ev.filter(day <= 10)).unionByName(agg(ev.filter(day > 10)))
           .groupBy("user_id", "event_type")
           .agg(F.sum("n_events").alias("n_events"),
                rnd(F.sum("sum_value")).alias("sum_value")))
    assert _rows(alt) == ref


def test_stratified_sample_hits_every_stratum_exactly(spark):
    """sample_stratified: every stratum delivers exactly ceil(0.2*n) rows."""
    import math

    from manual_data_ingest_spark.io import load_table

    out = E.queries()["sample_stratified"](spark, SF_ORACLE)
    got = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    totals = {r.lang: r.cnt for r in
              load_table(spark, SF_ORACLE, "documents")
              .groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got == {k: math.ceil(0.2 * v) for k, v in totals.items()}


def test_seq_pack_matches_bruteforce(spark):
    """pipeline_seq_pack vs a plain-Python packer over the same order."""
    import math

    from manual_data_ingest_spark.io import load_table

    out = {r.source: (r.total_tokens, r.n_sequences, r.n_straddle_docs)
           for r in E.queries()["pipeline_seq_pack"](spark, SF_ORACLE).collect()}
    docs = (load_table(spark, SF_ORACLE, "documents")
            .select("source", "doc_id", "text").collect())
    by_src = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        by_src.setdefault(r.source, []).append(len(r.text.split(" ")))
    for src, toks in by_src.items():
        cum = 0
        straddle = 0
        for n in toks:
            if (cum // 512) != ((cum + n - 1) // 512):
                straddle += 1
            cum += n
        assert out[src] == (cum, math.ceil(cum / 512), straddle), src


def test_gini_matches_numpy_rank_formula(spark):
    """agg_gini vs a plain-numpy Gini over the same per-user counts."""
    import numpy as np

    from manual_data_ingest_spark.io import load_table

    out = {r.event_type: (r.gini, r.n_users)
           for r in E.queries()["agg_gini"](spark, SF_ORACLE).collect()}
    counts = (load_table(spark, SF_ORACLE, "events")
              .groupBy("event_type", "user_id")
              .agg(F.count("*").alias("x")).collect())
    by_type = {}
    for r in counts:
        by_type.setdefault(r.event_type, []).append(r.x)
    for et, xs in by_type.items():
        x = np.sort(np.asarray(xs, dtype=np.float64))
        n = len(x)
        i = np.arange(1, n + 1)
        g = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
        got_g, got_n = out[et]
        assert got_n == n, et
        assert abs(got_g - g) < 1e-6, (et, got_g, g)
        assert 0.0 <= got_g < 1.0, et


def test_pit_join_no_future_leakage(spark):
    """join_pit_scd2: every fact gets EXACTLY the version valid at its
    ts — never a future one — and every purchase by a user with a
    prior signup appears exactly once (intervals partition time)."""
    from manual_data_ingest_spark.io import load_table

    out = E.queries()["join_pit_scd2"](spark, SF_ORACLE)
    # one row per fact: event_id is unique in the output
    n = out.count()
    assert out.select("event_id").distinct().count() == n
    ev = load_table(spark, SF_ORACLE, "events")
    versions = {}
    for r in (ev.filter(F.col("event_type") == "signup")
              .select("user_id", "event_id", "ts").collect()):
        versions.setdefault(r.user_id, []).append((r.ts, r.event_id))
    for v in versions.values():
        v.sort()
    picked = {r.event_id: r.version_id for r in out.collect()}
    facts = (ev.filter(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "ts").collect())
    covered = 0
    for f in facts:
        vs = [vid for (vts, vid) in versions.get(f.user_id, [])
              if vts <= f.ts]
        if vs:
            covered += 1
            assert picked[f.event_id] == vs[-1], f.event_id
        else:
            assert f.event_id not in picked, f.event_id
    assert covered == n


def test_zscore_outliers_match_numpy(spark):
    """win_zscore_outliers vs numpy population moments per group."""
    import numpy as np

    from manual_data_ingest_spark.io import load_table

    got = {r.event_id: (r.event_type, r.zscore)
           for r in E.queries()["win_zscore_outliers"](spark, SF_ORACLE)
           .collect()}
    rows = (load_table(spark, SF_ORACLE, "events")
            .select("event_id", "event_type", "value").collect())
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.event_id, r.value))
    expect = {}
    for et, pairs in by_type.items():
        vals = np.asarray([v for _, v in pairs], dtype=np.float64)
        mu, sd = vals.mean(), vals.std()  # population
        for (eid, v) in pairs:
            z = (v - mu) / sd
            if abs(z) >= 3.0:
                expect[eid] = (et, round(z, 6))
    assert set(got) == set(expect)
    for eid in expect:
        assert got[eid][0] == expect[eid][0]
        assert abs(got[eid][1] - expect[eid][1]) <= 1e-6, eid


def test_stream_tws_equals_batch_ewma(spark):
    """The RocksDB stateful-stream EWMA and the batch codegen fold are
    two strategies for one recurrence — identical output, and the
    provider override must not leak into the session afterwards."""
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    qs = E.queries()
    stream = {(r.user_id, r.n_events, r.ewma)
              for r in qs["stream_transform_with_state"](spark, SF_ORACLE).collect()}
    batch = {(r.user_id, r.n_events, r.ewma)
             for r in qs["win_ewma"](spark, SF_ORACLE).collect()}
    assert stream == batch
    assert spark.conf.get(key, None) == before


def test_cdc_apply_tombstone_law(spark):
    out = E.queries()["ingest_cdc_apply"](spark, SF_SMALL).collect()
    assert len(out) > 0
    for r in out:
        assert r.is_live == (0 if r.last_op == "D" else 1)
        assert r.n_inserts + r.n_updates + r.n_deletes > 0


def test_variant_typed_null_and_projection(spark):
    out = E.queries()["variant_funcs"](spark, SF_SMALL)
    rows = out.collect()
    assert all(r.k_missing is None for r in rows)
    assert all(r.k_doubled == 2 * r.k_int for r in rows if r.k_int is not None)


def test_quantile_sketch_rank_error_bound(spark):
    """Uniform-rank compaction guarantees rank error <= 1/K per bucket;
    check the merged estimate lands within 10% rank of the exact
    percentile on the oracle fixture."""
    import duckdb

    row = E.queries()["agg_quantile_sketch_merge"](spark, SF_ORACLE).collect()[0]
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT quantile_cont(value, 0.40), quantile_cont(value, 0.60),
                   quantile_cont(value, 0.80), quantile_cont(value, 0.97),
                   count(*)
            FROM read_parquet('{SF_ORACLE}/events.parquet')""").fetchone()
    p40, p60, p80, p97, n = exact
    assert p40 <= row.p50_approx <= p60
    assert p80 <= row.p90_approx <= p97
    assert row.total_weight == n


def test_span_dedup_first_doc_keeps_all(spark):
    """The lowest doc_id can lose spans only to itself (internal
    repeats are still first-occurrence-kept), so its kept_frac is 1
    unless the doc repeats one of its own spans."""
    rows = E.queries()["dedup_span_chunks"](spark, SF_SMALL).collect()
    by_id = {r.doc_id: r for r in rows}
    first = by_id[min(by_id)]
    assert first.n_kept >= 1 and first.n_kept <= first.n_chunks
    total_kept = sum(r.n_kept for r in rows)
    total_chunks = sum(r.n_chunks for r in rows)
    assert total_kept <= total_chunks  # dedup removes, never adds


def test_gopher_signals_ranges(spark):
    rows = E.queries()["text_gopher_repetition"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_word_frac < 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0
        assert r.mean_word_len > 0


def test_zorder_bounds_both_dims(spark):
    """Morton layout: every row group has bounded span in BOTH dims;
    single-key date sort leaves the custkey dim unclustered. Measured
    from the written parquet footers — the stats pruning actually uses."""
    import glob
    import pyarrow.parquet as pq
    from manual_data_ingest_spark.io import load_table
    from manual_data_ingest_spark.sources.scans import _z16_sql

    o = load_table(spark, SF_ORACLE, "orders")
    z = o.selectExpr(
        "o_orderkey",
        "CAST(o_custkey % 256 AS BIGINT) AS x",
        "CAST(datediff(o_orderdate, DATE '1995-01-01') DIV 10 AS BIGINT) AS y")
    z = z.selectExpr("*", f"CAST({_z16_sql('x', 'y')} AS BIGINT) AS zkey")

    import tempfile
    base = tempfile.mkdtemp(prefix="mdis_ztest_")

    def spans(path):
        sx, sy, n = [], [], 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(len(md.schema))}
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                stx = rg.column(idx["x"]).statistics
                sty = rg.column(idx["y"]).statistics
                sx.append(stx.max - stx.min)
                sy.append(sty.max - sty.min)
                n += 1
        return sum(sx) / n, sum(sy) / n, n

    (z.repartitionByRange(8, "zkey").sortWithinPartitions("zkey")
     .write.mode("overwrite").option("parquet.block.size", 64 * 1024)
     .parquet(f"{base}/zorder"))
    (z.repartitionByRange(8, "y").sortWithinPartitions("y")
     .write.mode("overwrite").option("parquet.block.size", 64 * 1024)
     .parquet(f"{base}/datesort"))

    zx, zy, zn = spans(f"{base}/zorder")
    dx, dy, dn = spans(f"{base}/datesort")
    assert zn >= 8 and dn >= 8
    # z-order bounds BOTH dims below their global spans (255 / ~240);
    # a contiguous z-range of length L spans ~sqrt(L) per dim, so with
    # ~2^16/zn z-values per group the bound is coarse but real
    assert zx < 0.75 * 255, (zx, zy)
    assert zy < 0.5 * 240, (zx, zy)
    # single-key sort clusters its own key but abandons the other dim
    assert dy < 0.2 * 240, dy
    assert dx > 0.8 * 255, dx
    # the comparative claim that matters: z-order keeps the non-sort
    # dim several times tighter than the single-key layout does
    assert zx < 0.65 * dx, (zx, dx)


def test_pagerank_is_distribution(spark):
    """Ranks are a probability distribution (sum 1 within rounding) and
    every node keeps at least the teleport floor 0.15/N."""
    rows = E.queries()["graph_pagerank"](spark, SF_ORACLE).collect()
    n = len(rows)
    assert n == 25
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-4, total
    floor = 0.15 / n
    assert all(r.pagerank >= floor - 1e-9 for r in rows)


def test_funnel_monotone(spark):
    r = E.queries()["win_funnel_steps"](spark, SF_ORACLE).collect()[0]
    assert r.n_view >= r.n_click_after_view >= r.n_buy_after_click > 0
    assert 0.0 <= r.conversion <= 1.0


def test_manifest_prune_opens_only_selected_groups(spark, tmp_path):
    """The pruned read must plan files ONLY from the 2 intersecting
    year-groups — the other 5 are never part of the scan."""
    from manual_data_ingest_spark.io import load_table

    o = load_table(spark, SF_ORACLE, "orders")
    base = str(tmp_path / "orders")
    data = o.withColumn("y", F.year("o_orderdate"))
    data.repartition("y").write.mode("overwrite").partitionBy("y").parquet(base)
    manifest = (data.groupBy("y")
                .agg(F.min("o_orderdate").alias("mn"),
                     F.max("o_orderdate").alias("mx")).collect())
    assert len(manifest) == 7
    import datetime as dt
    lo, hi = dt.datetime(1996, 6, 1), dt.datetime(1997, 3, 31)
    sel = [m.y for m in manifest if m.mx >= lo and m.mn <= hi]
    assert sorted(sel) == [1996, 1997]
    back = spark.read.parquet(*[f"{base}/y={y}" for y in sel])
    files = back.inputFiles()
    assert files
    assert all(("y=1996" in f) or ("y=1997" in f) for f in files)


def test_countmin_one_sided_error(spark):
    rows = E.queries()["agg_countmin_sketch"](spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.never_under == 1  # CMS can only overestimate
        assert r.cms_est >= r.exact_cnt


def test_containment_dominates_jaccard(spark):
    """containment = common/min(|A|,|B|) >= common/(|A|+|B|-common) =
    jaccard for every pair, so every Jaccard>=0.5 pair must reappear in
    the containment>=0.7 set or have containment in [0.5, 0.7)."""
    qs = E.queries()
    jac = {(r.id_a, r.id_b): r.jaccard
           for r in qs["dedup_near_jaccard"](spark, SF_ORACLE).collect()}
    cont = {(r.id_a, r.id_b): r.containment
            for r in qs["dedup_containment"](spark, SF_ORACLE).collect()}
    assert cont, "containment fixture should be non-empty"
    for pair, c in cont.items():
        if pair in jac:
            assert c >= jac[pair] - 1e-9, (pair, c, jac[pair])
    for pair, j in jac.items():
        if j >= 0.7:
            assert pair in cont, pair


def test_chunk_overlap_covers_all_tokens(spark):
    from manual_data_ingest_spark.io import load_table

    chunks = E.queries()["text_chunk_overlap"](spark, SF_SMALL).collect()
    n_toks = {r.doc_id: r.n
              for r in load_table(spark, SF_SMALL, "documents")
              .select("doc_id", F.size(F.split("text", " ")).alias("n"))
              .collect()}
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_toks)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        # stride 40 windows of 50: chunks tile the doc with overlap,
        # so total chunk tokens >= doc tokens and the last window ends
        # exactly at the document end
        assert sum(r.n_toks for r in rs) >= n_toks[doc]
        last_start = (len(rs) - 1) * 40
        assert rs[-1].n_toks == min(50, n_toks[doc] - last_start)


def test_time_travel_v1_immutable_under_v2(spark, tmp_path):
    """Committing v2 must not change what a v1 reader sees (snapshot
    isolation): the v1 file set re-reads identically after the delta
    commit lands."""
    from manual_data_ingest_spark.io import load_events

    ev = load_events(spark, SF_SMALL)
    base = str(tmp_path)
    v1 = ev.filter(F.dayofmonth("ts") <= 20)
    v1.write.parquet(f"{base}/snap-1")
    before = spark.read.parquet(f"{base}/snap-1").count()
    ev.filter(F.dayofmonth("ts") > 20).write.parquet(f"{base}/snap-2-delta")
    after = spark.read.parquet(f"{base}/snap-1").count()
    assert before == after  # old snapshot untouched by the new commit
    v2 = spark.read.parquet(f"{base}/snap-1", f"{base}/snap-2-delta")
    assert v2.count() == ev.count()


def test_bitmap_distinct_equals_count_distinct(spark):
    from manual_data_ingest_spark.io import load_events

    got = {r.event_type: r.n_users
           for r in E.queries()["agg_bitmap_distinct"](spark, SF_ORACLE).collect()}
    exact = {r.event_type: r.n
             for r in load_events(spark, SF_ORACLE)
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == exact  # bitmaps are exact, not approximate


def test_streaks_conserve_active_days(spark):
    from manual_data_ingest_spark.io import load_events

    rows = E.queries()["win_streak_days"](spark, SF_ORACLE).collect()
    days = {r.user_id: r.n
            for r in load_events(spark, SF_ORACLE)
            .select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d"))
            .distinct().groupBy("user_id").agg(F.count("*").alias("n"))
            .collect()}
    for r in rows:
        assert r.longest_streak <= r.active_days == days[r.user_id]
        assert r.n_streaks >= 1


def test_q8_share_is_ratio_of_volumes(spark):
    for r in E.queries()["flagship_q8_market_share"](spark, SF_ORACLE).collect():
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.nation_volume <= r.total_volume + 0.01


def test_temperature_mix_allocation_laws(spark):
    """Largest-remainder allocation: quotas sum EXACTLY to the budget,
    every quota within 1 of its real-valued share, and temperature
    tau=0.5 compresses the spread (small sources get > proportional)."""
    import math

    rows = E.queries()["sample_temperature_mix"](spark, SF_ORACLE).collect()
    assert sum(r.quota for r in rows) == 1000
    total_w = sum(math.floor(math.sqrt(r.c) * 1e6) for r in rows)
    total_c = sum(r.c for r in rows)
    for r in rows:
        share = math.floor(math.sqrt(r.c) * 1e6) * 1000 / total_w
        assert share - 1 <= r.quota <= share + 1
        # temperature flattens: sub-proportional sources are boosted
        prop = r.c * 1000 / total_c
        if r.c < total_c / len(rows):
            assert r.quota >= math.floor(prop)
        assert r.n_downsampled == min(r.quota, r.c)


def test_train_val_test_split_laws(spark):
    from manual_data_ingest_spark.io import load_table

    rows = E.queries()["sample_train_val_test"](spark, SF_ORACLE).collect()
    total = sum(r.n_docs for r in rows)
    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    assert total == n_docs  # every doc in exactly one split
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) == {"train", "val", "test"}
    # hash buckets approximate 80/10/10 (binomial tolerance at n=500)
    assert 0.7 < by_split["train"] / total < 0.9
    assert 0.04 < by_split["val"] / total < 0.16
    assert 0.04 < by_split["test"] / total < 0.16
    # deterministic: a second run yields the identical table
    again = E.queries()["sample_train_val_test"](spark, SF_ORACLE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_span_digest_equals_text_keyed(spark):
    """The xxhash64-keyed shuffle must make identical keep decisions to
    the text-keyed twin — strategy differs, contract doesn't."""
    qs = E.queries()
    a = _rows(qs["dedup_span_chunks"](spark, SF_ORACLE))
    b = _rows(qs["dedup_span_chunks_digest"](spark, SF_ORACLE))
    assert a == b


def test_sketch_bins_near_equal_depth(spark):
    """Sketch-boundary bins must be near-equal-depth: every bin within
    the sketch's rank-error envelope of n/10, and bins conserve rows."""
    from manual_data_ingest_spark.io import load_table

    rows = E.queries()["agg_histogram_sketch_bins"](spark, SF_ORACLE).collect()
    n = load_table(spark, SF_ORACLE, "orders").count()
    assert sum(r.n for r in rows) == n
    assert len(rows) == 10
    for r in rows:
        assert abs(r.n - n / 10) <= n / 8, (r.bin, r.n, n)


def test_dp_release_noise_applied_and_bounded(spark):
    """The Laplace mechanism must actually perturb (not all zeros) and
    stay within the deterministic hash-uniform's worst-case envelope."""
    rows = E.queries()["ingest_dp_release"](spark, SF_ORACLE).collect()
    diffs = [abs(r.released_n - r.true_n) for r in rows]
    assert any(d > 0 for d in diffs), "noise never applied"
    assert all(d < 100 for d in diffs), diffs  # (1/eps)*ln range envelope
    assert all(r.epsilon == 0.5 for r in rows)


def test_kmeans_assignment_is_true_argmin(spark):
    """Every vector's winning distance must be ≤ its distance to EVERY
    final centroid — recomputed independently with numpy at sf0.001."""
    import numpy as np

    out = {r["cluster"]: r for r in
           E.queries()["ml_kmeans_embeddings"](spark, SF_SMALL).collect()}
    emb = (spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
           .select(F.col("vec_id").cast("long").alias("id"), "embedding")
           .collect())
    X = {r["id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb}
    n = len(X)
    assert sum(r["n_vecs"] for r in out.values()) == n

    # replay the exact trajectory: init = K lowest ids, 3 rounds,
    # centroids rounded 6dp (floor form) after every update
    K, ITERS = 8, 3
    ids = sorted(X)
    cent = {cl: np.floor(X[i] * 1e6 + 0.5) / 1e6
            for cl, i in enumerate(ids[:K])}
    for _ in range(ITERS):
        assign = {}
        for i in ids:
            d = {cl: float(((X[i] - c) ** 2).sum()) for cl, c in cent.items()}
            assign[i] = min(d, key=lambda cl: (d[cl], cl))
        cent = {cl: np.floor(np.mean([X[i] for i in ids if assign[i] == cl],
                                     axis=0) * 1e6 + 0.5) / 1e6
                for cl in set(assign.values())}
    sizes, inertia = {}, {}
    for i in ids:
        d = {cl: float(((X[i] - c) ** 2).sum()) for cl, c in cent.items()}
        cl = min(d, key=lambda cl: (d[cl], cl))
        sizes[cl] = sizes.get(cl, 0) + 1
        inertia[cl] = inertia.get(cl, 0.0) + d[cl]
    assert {cl: r["n_vecs"] for cl, r in out.items()} == sizes
    for cl, r in out.items():
        assert abs(r["inertia"] - inertia[cl]) < 1e-3


def test_triangle_count_matches_bruteforce(spark):
    """Degree-ordered count == naive triple-enumeration on the same
    mutual-top-8 edge set (sf0.001 graph is small enough to replay)."""
    row = E.queries()["graph_triangle_count"](spark, SF_SMALL).collect()[0]
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    os_ = {(r["l_orderkey"], r["l_suppkey"])
           for r in li.select("l_orderkey", "l_suppkey").distinct().collect()}
    from collections import defaultdict
    per_order = defaultdict(set)
    for ok, sk in os_:
        per_order[ok].add(sk)
    co = defaultdict(int)
    for sks in per_order.values():
        ss = sorted(sks)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                co[(ss[i], ss[j])] += 1
    # mutual top-8 by (co desc, neighbor id)
    nbrs = defaultdict(list)
    for (u, v), c in co.items():
        nbrs[u].append((-c, v))
        nbrs[v].append((-c, u))
    top = {n: {v for _, v in sorted(l)[:8]} for n, l in nbrs.items()}
    edges = {(u, v) for (u, v) in co
             if v in top[u] and u in top[v]}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    nodes = sorted(adj)
    tri = sum(1 for a in nodes for b in adj[a] if b > a
              for c in adj[a] & adj[b] if c > b)
    assert max((len(top[n]) for n in top), default=0) <= 8  # bounded degree
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri
    assert 0.0 <= row["closure_rate"] <= 1.0


def test_winsorized_stats_laws(spark):
    """Clipping can only shrink dispersion: wins_std ≤ raw std per
    group; the winsorized mean lies inside [p05, p95]; counts match."""
    out = {r["l_returnflag"]: r for r in
           E.queries()["agg_winsorized_stats"](spark, SF_ORACLE).collect()}
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    raw = {r["l_returnflag"]: r for r in
           li.groupBy("l_returnflag")
           .agg(F.count("*").alias("n"),
                F.stddev_pop("l_extendedprice").alias("sd")).collect()}
    assert set(out) == set(raw)
    for g, r in out.items():
        assert r["n"] == raw[g]["n"]
        assert r["wins_std"] <= raw[g]["sd"] + 1e-9
        assert r["p05"] <= r["wins_mean"] <= r["p95"]


def test_knn_confusion_matches_numpy_replay(spark):
    """Exact confusion-matrix replay with numpy at sf0.001 (cosine,
    k=5, id tie-breaks, majority with (count desc, label asc))."""
    import numpy as np

    out = {(r["true_label"], r["predicted_label"]): r["n_probes"]
           for r in E.queries()["ml_knn_classify"](spark, SF_SMALL).collect()}
    rows = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    X = {int(r["vec_id"]): (r["label"],
                            np.asarray(r["embedding"], dtype=np.float64))
         for r in rows}
    conf = {}
    for pid, (tl, pv) in X.items():
        if pid % 7 or pid >= 7 * 128:
            continue
        scored = sorted(
            ((-float(pv @ v / (np.linalg.norm(pv) * np.linalg.norm(v))), nid)
             for nid, (_, v) in X.items() if nid != pid))[:5]
        votes = {}
        for _, nid in scored:
            votes[X[nid][0]] = votes.get(X[nid][0], 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        conf[(tl, pred)] = conf.get((tl, pred), 0) + 1
    assert out == conf


def test_ols_matches_numpy_lstsq(spark):
    """Normal-equation betas ≈ numpy lstsq on the same design matrix;
    R² in (0, 1]."""
    import numpy as np

    row = E.queries()["ml_ols_normal_equations"](spark, SF_ORACLE).collect()[0]
    li = (spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
          .select("l_quantity", "l_discount", "l_extendedprice").collect())
    A = np.array([[1.0, r["l_quantity"], r["l_discount"]] for r in li])
    y = np.array([r["l_extendedprice"] for r in li])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert row["n"] == len(li)
    assert abs(row["beta0"] - beta[0]) < 1e-2 * max(1.0, abs(beta[0]))
    assert abs(row["beta1"] - beta[1]) < 1e-2 * max(1.0, abs(beta[1]))
    assert abs(row["beta2"] - beta[2]) < 1e-2 * max(1.0, abs(beta[2]))
    assert 0.0 < row["r2"] <= 1.0


def test_benford_is_a_probability_audit(spark):
    """Observed shares and expected shares each sum to ~1; counts sum
    to the order count; expected shares are exactly log10(1+1/d)."""
    import math

    rows = E.queries()["agg_benford_deviation"](spark, SF_ORACLE).collect()
    n_orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").count()
    assert sum(r["n"] for r in rows) == n_orders
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["exp_share"] == math.log10(1 + 1 / r["first_digit"])
        assert r["chi2_term"] >= 0.0


def test_pca_replays_power_trajectory(spark):
    """Exact numpy replay of the 5-step rounded power iteration (the
    fixture spectrum is nearly flat at sf0.001, so convergence to the
    true eigenvector is NOT the contract — the deterministic trajectory
    is); the eigenvalue must also lie within the covariance spectrum."""
    import numpy as np

    rows = E.queries()["ml_pca_power"](spark, SF_SMALL).collect()
    v = np.zeros(64)
    for r in rows:
        v[r["dim"] - 1] = r["loading"]
    eig_spark = rows[0]["eigval"]
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in
                  spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
                  .collect()])
    n = M.shape[0]
    s1 = M.sum(axis=0)
    C = np.floor(((M.T @ M) - np.outer(s1, s1) / n) / n * 1e9 + 0.5) / 1e9
    vv = np.full(64, 0.125)
    for _ in range(5):
        w = C @ vv
        vv = np.floor(w / np.linalg.norm(w) * 1e9 + 0.5) / 1e9
    assert np.allclose(v, np.floor(vv * 1e6 + 0.5) / 1e6, atol=2e-6)
    ray = float(vv @ (C @ vv))
    assert abs(eig_spark - ray) < 1e-4
    wspec = np.linalg.eigvalsh(np.cov(M, rowvar=False, bias=True))
    assert wspec[0] - 1e-6 <= eig_spark <= wspec[-1] + 1e-6
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4


def test_pq_replays_grouped_lloyd(spark):
    """Full numpy replay of the 8-subspace grouped Lloyd trajectory at
    sf0.001: populations and MSE per (subspace, code) match."""
    import numpy as np

    out = {(r["subspace"], r["code"]): r for r in
           E.queries()["sim_pq_quantize"](spark, SF_SMALL).collect()}
    rows = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    X = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
         for r in rows}
    ids = sorted(X)
    for s in range(8):
        sub = {i: X[i][s * 8:(s + 1) * 8] for i in ids}
        cent = {cl: np.floor(sub[i] * 1e6 + 0.5) / 1e6
                for cl, i in enumerate(ids[:4])}
        assign = {}
        for _ in range(2):
            for i in ids:
                d = {cl: float(((sub[i] - c) ** 2).sum())
                     for cl, c in cent.items()}
                assign[i] = min(d, key=lambda cl: (d[cl], cl))
            cent = {cl: np.floor(np.mean([sub[i] for i in ids
                                          if assign[i] == cl], axis=0)
                                 * 1e6 + 0.5) / 1e6
                    for cl in set(assign.values())}
        sizes, sse = {}, {}
        for i in ids:
            d = {cl: float(((sub[i] - c) ** 2).sum())
                 for cl, c in cent.items()}
            cl = min(d, key=lambda cl: (d[cl], cl))
            sizes[cl] = sizes.get(cl, 0) + 1
            sse[cl] = sse.get(cl, 0.0) + d[cl]
        for cl, nv in sizes.items():
            assert out[(s, cl)]["n_vecs"] == nv
            assert abs(out[(s, cl)]["mse"] - sse[cl] / nv) < 1e-4


def test_cuped_reduces_variance_consistently(spark):
    """var_cuped ≤ var_y, the reduction equals cov²/(var_x·var_y)
    (i.e. corr²), and a numpy replay from per-user cent sums agrees."""
    import numpy as np

    row = E.queries()["ml_cuped_adjustment"](spark, SF_ORACLE).collect()[0]
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet").collect()
    import collections
    pre, post = collections.defaultdict(int), collections.defaultdict(int)
    import datetime
    split = datetime.datetime(2024, 1, 16)
    for r in ev:
        cents = int(np.floor(r["value"] * 100.0 + 0.5))
        ts = r["ts"]
        if isinstance(ts, int):  # nanos under the engine session config
            ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=ts // 1000)
        if ts < split:
            pre[r["user_id"]] += cents
            post[r["user_id"]] += 0
        else:
            post[r["user_id"]] += cents
            pre[r["user_id"]] += 0
    users = sorted(pre)
    x = np.array([pre[u] for u in users], dtype=np.float64)
    y = np.array([post[u] for u in users], dtype=np.float64)
    varx, vary = x.var(), y.var()
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    assert row["n_users"] == len(users)
    assert row["var_cuped"] <= row["var_y"]
    assert abs(row["theta"] - cov / varx) < 1e-4
    assert abs(row["var_y"] - vary / 1e4) < 0.01
    assert abs(row["reduction_pct"] - 100.0 * cov * cov / (varx * vary)) < 0.01


def test_logistic_newton_matches_sklearn_free_replay(spark):
    """Exact numpy replay of the 2-step rounded IRLS trajectory at
    sf0.001, plus sanity: log-likelihood ≥ the β=0 baseline (each
    Newton step from 0 must improve fit on these counts)."""
    import numpy as np

    row = E.queries()["ml_logistic_newton"](spark, SF_SMALL).collect()[0]
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").collect()
    X = np.array([[1.0, r["o_totalprice"] / 100000.0,
                   r["o_orderdate"].month / 12.0] for r in o])
    y = np.array([1.0 if r["o_orderpriority"] in ("1-URGENT", "2-HIGH")
                  else 0.0 for r in o])
    r9 = lambda v: np.floor(v * 1e9 + 0.5) / 1e9
    beta = np.zeros(3)
    for _ in range(2):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = p * (1 - p)
        H = r9((X * w[:, None]).T @ X)
        g = r9(X.T @ (y - p))
        beta = r9(beta + np.linalg.solve(H, g))
    p = 1.0 / (1.0 + np.exp(-(X @ beta)))
    ll = float((y * np.log(p) + (1 - y) * np.log(1 - p)).sum())
    assert row["n"] == len(o)
    assert abs(row["beta0"] - beta[0]) < 2e-6
    assert abs(row["beta1"] - beta[1]) < 2e-6
    assert abs(row["beta2"] - beta[2]) < 2e-6
    assert abs(row["log_likelihood"] - ll) < 1e-2
    base_ll = len(o) * np.log(0.5)
    assert row["log_likelihood"] >= base_ll - 1e-6


def test_link_prediction_laws(spark):
    """Predicted pairs are NON-edges of the mutual-top-8 graph, jaccard
    ∈ (0,1], and each score equals cn/(du+dv−cn) recomputed from the
    brute-force graph replay at sf0.001."""
    rows = E.queries()["graph_link_prediction"](spark, SF_SMALL).collect()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    os_ = {(r["l_orderkey"], r["l_suppkey"])
           for r in li.select("l_orderkey", "l_suppkey").distinct().collect()}
    from collections import defaultdict
    per_order = defaultdict(set)
    for ok, sk in os_:
        per_order[ok].add(sk)
    co = defaultdict(int)
    for sks in per_order.values():
        ss = sorted(sks)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                co[(ss[i], ss[j])] += 1
    nbrs = defaultdict(list)
    for (u, v), c in co.items():
        nbrs[u].append((-c, v))
        nbrs[v].append((-c, u))
    top = {n: {v for _, v in sorted(l)[:8]} for n, l in nbrs.items()}
    edges = {(u, v) for (u, v) in co if v in top[u] and u in top[v]}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    for r in rows:
        u, v = r["u"], r["v"]
        assert (u, v) not in edges and (v, u) not in edges
        cn = len(adj[u] & adj[v])
        assert r["common_neighbors"] == cn
        expected = cn / (len(adj[u]) + len(adj[v]) - cn)
        assert abs(r["jaccard"] - expected) < 1e-6
        assert 0.0 < r["jaccard"] <= 1.0


def test_seasonal_backtest_uses_calendar_horizon(spark):
    """MAE/MAPE recompute exactly from a pandas replay that joins on
    day−7 (calendar), and every type's n_days ≤ 23 (30-day fixture −
    7-day warmup)."""
    rows = {r["event_type"]: r for r in
            E.queries()["win_seasonal_backtest"](spark, SF_ORACLE).collect()}
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet").collect()
    import collections
    import datetime
    daily = collections.defaultdict(int)
    for r in ev:
        ts = r["ts"]
        if isinstance(ts, int):
            ts = (datetime.datetime(1970, 1, 1)
                  + datetime.timedelta(microseconds=ts // 1000))
        day = ts.date()
        daily[(r["event_type"], day)] += int(r["value"] * 100.0 + 0.5)
    for et, row in rows.items():
        errs, actuals = [], []
        for (t, day), actual in daily.items():
            if t != et:
                continue
            prev = daily.get((t, day - datetime.timedelta(days=7)))
            if prev is not None:
                errs.append(abs(actual - prev))
                actuals.append(actual)
        assert row["n_days"] == len(errs) <= 23
        assert abs(row["mae"] - sum(errs) / len(errs) / 100.0) < 0.011
        assert abs(row["mape_pct"]
                   - 100.0 * sum(errs) / sum(actuals)) < 1e-3


def _event_rows_py(spark, sf):
    import datetime
    out = []
    for r in spark.read.parquet(f"{sf}/events.parquet").collect():
        ts = r["ts"]
        if isinstance(ts, int):
            ts = (datetime.datetime(1970, 1, 1)
                  + datetime.timedelta(microseconds=ts // 1000))
        out.append((r["user_id"], ts, r["event_type"],
                    int(r["value"] * 100.0 + 0.5)))
    return out


def test_feature_store_point_in_time_no_leakage(spark):
    """Full python replay at sf0.001: features use ONLY events strictly
    before each snapshot; labels only purchases in [snap, snap+7d)."""
    import datetime

    rows = {(r["user_id"], r["snapshot"]): r for r in
            E.queries()["pipeline_feature_store"](spark, SF_SMALL).collect()}
    ev = _event_rows_py(spark, SF_SMALL)
    snaps = [datetime.datetime(2024, 1, d) for d in (15, 22, 29)]
    expect = {}
    for s in snaps:
        key_s = s.strftime("%Y-%m-%d")
        per = {}
        for u, ts, et, cents in ev:
            if ts < s:
                f = per.setdefault(u, [0, 0, None, 0])
                f[0] += 1
                f[1] += cents
                rd = (s.date() - ts.date()).days
                f[2] = rd if f[2] is None else min(f[2], rd)
                f[3] += et == "error"
        labels = {u for u, ts, et, _ in ev
                  if et == "purchase" and s <= ts < s + datetime.timedelta(7)}
        for u, (freq, mon, rec, nerr) in per.items():
            expect[(u, key_s)] = (freq, mon, rec, int(u in labels))
    assert set(rows) == set(expect)
    for k, (freq, mon, rec, lab) in expect.items():
        r = rows[k]
        assert (r["frequency"], r["monetary_cents"], r["recency_days"],
                r["label"]) == (freq, mon, rec, lab)


def test_cusum_changepoint_is_argmax_of_replay(spark):
    """Python prefix-sum replay: the reported day maximizes |CUSUM|."""
    import collections

    rows = {r["event_type"]: r for r in
            E.queries()["agg_cusum_changepoint"](spark, SF_SMALL).collect()}
    daily = collections.defaultdict(int)
    for u, ts, et, cents in _event_rows_py(spark, SF_SMALL):
        daily[(et, ts.date())] += cents
    by_type = collections.defaultdict(list)
    for (et, day), x in sorted(daily.items()):
        by_type[et].append((day, x))
    for et, series in by_type.items():
        mean = sum(x for _, x in series) / len(series)
        run, best = 0.0, None
        for i, (day, x) in enumerate(series):
            run += x
            c = abs(run - (i + 1) * mean)
            if best is None or c > best[0] + 1e-9:
                best = (c, day)
        r = rows[et]
        assert r["changepoint_day"] == best[1].strftime("%Y-%m-%d")
        assert abs(r["max_abs_cusum"] - best[0] / 100.0) < 0.011
        assert r["n_days"] == len(series)


def test_skew_report_is_mean_normalized(spark):
    """Row counts sum to the table; the skew ratios average to 1; hot
    flags fire exactly above 1.5×."""
    rows = E.queries()["ingest_partition_skew_report"](spark,
                                                      SF_ORACLE).collect()
    n_orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").count()
    assert sum(r["n_rows"] for r in rows) == n_orders
    mean_ratio = sum(r["skew_vs_mean"] for r in rows) / len(rows)
    assert abs(mean_ratio - 1.0) < 1e-3
    for r in rows:
        assert r["is_hot"] == int(r["skew_vs_mean"] > 1.5)


def test_max_drawdown_replay(spark):
    """Python equity-curve replay: reported trough maximizes the
    running-peak-minus-equity gap."""
    import collections

    rows = {r["event_type"]: r for r in
            E.queries()["win_max_drawdown"](spark, SF_SMALL).collect()}
    daily = collections.defaultdict(int)
    for u, ts, et, cents in _event_rows_py(spark, SF_SMALL):
        daily[(et, ts.date())] += cents
    series = collections.defaultdict(list)
    for (et, day), x in sorted(daily.items()):
        series[et].append((day, x))
    for et, pts in series.items():
        eq, peak, best = 0, 0, None
        for day, x in pts:
            eq += x
            peak = max(peak, eq)
            dd = peak - eq
            if best is None or dd > best[0]:
                best = (dd, day, eq)
        r = rows[et]
        assert r["trough_day"] == best[1].strftime("%Y-%m-%d")
        assert abs(r["max_drawdown"] - best[0] / 100.0) < 0.011
        assert abs(r["equity_at_trough"] - best[2] / 100.0) < 0.011


def test_gdpr_erasure_cascade_is_consistent(spark):
    """Counts reconcile: n_after = n_before − n_erased; the lineitem
    erasure equals the lineitems of erased customers' orders; erased
    fractions are in (0,1)."""
    rows = {r["table_name"]: r for r in
            E.queries()["ingest_gdpr_erasure"](spark, SF_ORACLE).collect()}
    for r in rows.values():
        assert r["n_after"] == r["n_before"] - r["n_erased"]
        assert 0.0 <= r["erased_frac"] < 1.0
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    del_orders = {r["o_orderkey"] for r in
                  o.filter(F.col("o_custkey") % 97 == 0).collect()}
    n_li = li.filter(F.col("l_orderkey").isin(del_orders)).count()
    assert rows["lineitem"]["n_erased"] == n_li
    assert rows["orders"]["n_erased"] == len(del_orders)


def test_importance_sampling_upweights_long_docs(spark):
    """The weighted sampler's kept docs are longer on average than the
    corpus (that IS the importance weighting), and keep decisions are
    reproducible across invocations."""
    a = {r["lang"]: r for r in
         E.queries()["sample_importance_weighted"](spark, SF_ORACLE).collect()}
    b = {r["lang"]: r for r in
         E.queries()["sample_importance_weighted"](spark, SF_ORACLE).collect()}
    assert a.keys() == b.keys()
    for lang in a:
        assert a[lang] == b[lang]  # deterministic
        if a[lang]["n_kept"] > 20:
            assert a[lang]["kept_avg_words"] > a[lang]["all_avg_words"]


def test_srm_check_replays_and_is_calibrated(spark):
    """Arm counts replay exactly from the salted hash; χ² matches the
    closed form; a fair hash split at n=150 should not flag."""
    import hashlib

    row = E.queries()["ml_ab_srm_check"](spark, SF_ORACLE).collect()[0]
    users = {r["user_id"] for r in
             spark.read.parquet(f"{SF_ORACLE}/events.parquet")
             .select("user_id").distinct().collect()}
    arms = [int(hashlib.md5(f"{u}|ab".encode()).hexdigest()[:4], 16) % 2
            for u in users]
    n_a = arms.count(0)
    n = len(arms)
    assert (row["n_users"], row["n_arm_a"], row["n_arm_b"]) == (
        n, n_a, n - n_a)
    chi2 = ((n_a - n / 2) ** 2 + (n - n_a - n / 2) ** 2) / (n / 2)
    assert abs(row["chi2"] - chi2) < 1e-5
    assert row["srm_flag"] == int(chi2 > 3.841458820694124)


def test_ratio_delta_method_replay(spark):
    """Per-arm ratio and delta-method SE replay in numpy from per-user
    (purchase cents, event count) pairs."""
    import hashlib
    import collections
    import numpy as np

    rows = {r["arm"]: r for r in
            E.queries()["ml_ratio_delta_method"](spark, SF_ORACLE).collect()}
    per = collections.defaultdict(lambda: [0, 0])
    for u, ts, et, cents in _event_rows_py(spark, SF_ORACLE):
        per[u][1] += 1
        if et == "purchase":
            per[u][0] += cents
    by_arm = collections.defaultdict(list)
    for u, (x, y) in per.items():
        arm = int(hashlib.md5(f"{u}|ab".encode()).hexdigest()[:4], 16) % 2
        by_arm[arm].append((x, y))
    for arm, pairs in by_arm.items():
        x = np.array([p[0] for p in pairs], dtype=np.float64)
        y = np.array([p[1] for p in pairs], dtype=np.float64)
        n = len(pairs)
        r = x.sum() / y.sum()
        var = ((x.var() - 2 * r * ((x - x.mean()) * (y - y.mean())).mean()
                + r * r * y.var()) / (y.mean() ** 2) / n)
        out = rows[arm]
        assert out["n_users"] == n
        assert abs(out["revenue_per_event"] - r / 100.0) < 1e-5
        assert abs(out["std_err"] - np.sqrt(var) / 100.0) < 1e-5


def test_zipf_slope_is_negative_powerlawish(spark):
    """Slope must be negative (frequency decreases with rank), r² in
    (0,1], and the fit replays from the exact top-200 vocabulary."""
    import collections
    import numpy as np

    row = E.queries()["text_zipf_slope"](spark, SF_ORACLE).collect()[0]
    freq = collections.Counter()
    for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet").collect():
        for w in r["text"].split(" "):
            if w:
                freq[w] += 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    z = np.log(np.array([c for _, c in top], dtype=np.float64))
    slope, intercept = np.polyfit(x, z, 1)
    assert row["n_points"] == len(top)
    assert row["zipf_slope"] < 0
    assert abs(row["zipf_slope"] - slope) < 1e-3
    assert 0.0 < row["r2"] <= 1.0


def test_template_mask_counts_replay(spark):
    """Template families replay exactly from a python digit-mask."""
    import re
    import collections

    row = E.queries()["dedup_template_mask"](spark, SF_ORACLE).collect()[0]
    fam = collections.defaultdict(list)
    for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet").collect():
        fam[re.sub(r"[0-9]+", "<NUM>", r["text"])].append(r["doc_id"])
    dups = {k: v for k, v in fam.items() if len(v) > 1}
    assert row["n_templates"] == len(fam)
    assert row["n_templated"] == len(dups)
    assert row["n_docs_in_templates"] == sum(map(len, dups.values()))
    assert row["max_family"] == max(map(len, fam.values()))


def test_rfm_segments_partition_customers(spark):
    """Segment sizes sum to the customer-with-orders count and every
    segment label is from the fixed vocabulary."""
    rows = E.queries()["agg_rfm_segments"](spark, SF_ORACLE).collect()
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert {r["segment"] for r in rows} <= {
        "champion", "new", "at_risk", "hibernating", "core"}


def test_cohort_ltv_curve_is_monotone(spark):
    """Cumulative LTV never decreases along week_no within a cohort,
    and cohort sizes sum to the distinct-user count."""
    rows = E.queries()["agg_cohort_ltv_curve"](spark, SF_ORACLE).collect()
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(
            (r["week_no"], r["cum_ltv_per_user"], r["cohort_users"]))
    assert sum(v[0][2] for v in by_cohort.values()) == n_users
    for curve in by_cohort.values():
        curve.sort()
        ltvs = [p[1] for p in curve]
        assert ltvs == sorted(ltvs)  # monotone non-decreasing


def test_attribution_credits_at_most_one_touch_per_purchase(spark):
    """Attributed purchases ≤ total purchases; python replay of the
    last-touch pick (ts desc, touch_id) agrees at sf0.001."""
    import collections
    import datetime

    rows = {r["channel"]: r for r in
            E.queries()["pipeline_attribution"](spark, SF_SMALL).collect()}
    ev = sorted(_event_rows_py(spark, SF_SMALL), key=lambda e: e[1])
    raw = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    ids = {}
    for r in raw:
        ids[(r["user_id"], r["event_type"], int(r["value"] * 100 + 0.5),
             str(r["ts"]))] = r["event_id"]
    by_user = collections.defaultdict(list)
    for r in raw:
        ts = r["ts"]
        if isinstance(ts, int):
            ts = (datetime.datetime(1970, 1, 1)
                  + datetime.timedelta(microseconds=ts // 1000))
        by_user[r["user_id"]].append((ts, r["event_type"], r["event_id"],
                                      int(r["value"] * 100.0 + 0.5)))
    credit = collections.defaultdict(lambda: [0, 0])
    n_purch = 0
    for u, evs in by_user.items():
        for ts, et, eid, cents in evs:
            if et != "purchase":
                continue
            n_purch += 1
            cand = [(t2, -tid, et2) for t2, et2, tid, _ in evs
                    if et2 in ("click", "view", "signup")
                    and t2 < ts and t2 >= ts - datetime.timedelta(hours=1)]
            if cand:
                _, _, ch = max(cand)
                credit[ch][0] += 1
                credit[ch][1] += cents
    assert sum(r["n_attributed"] for r in rows.values()) <= n_purch
    for ch, r in rows.items():
        assert r["n_attributed"] == credit[ch][0]
        assert abs(r["attributed_revenue"] - credit[ch][1] / 100.0) < 0.011


def test_markov_rows_are_probability_rows(spark):
    """Each prev_type's probabilities sum to ~1 and transition counts
    conserve: total transitions = events − users (per-user chains)."""
    import collections

    rows = E.queries()["agg_markov_transition"](spark, SF_ORACLE).collect()
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in rows) == n_events - n_users
    by_prev = collections.defaultdict(float)
    for r in rows:
        by_prev[r["prev_type"]] += r["prob"]
    for tot in by_prev.values():
        assert abs(tot - 1.0) < 1e-4


def test_seasonality_strength_is_eta_squared(spark):
    """η² ∈ [0,1] and replays from a python variance decomposition."""
    import collections

    rows = {r["event_type"]: r for r in
            E.queries()["agg_seasonality_strength"](spark,
                                                    SF_ORACLE).collect()}
    daily = collections.defaultdict(int)
    for u, ts, et, cents in _event_rows_py(spark, SF_ORACLE):
        daily[(et, ts.date())] += cents
    series = collections.defaultdict(dict)
    for (et, day), x in daily.items():
        series[et][day] = x
    for et, days in series.items():
        xs = list(days.values())
        n = len(xs)
        mean = sum(xs) / n
        vtot = sum((x - mean) ** 2 for x in xs) / n
        groups = collections.defaultdict(list)
        for day, x in days.items():
            groups[day.weekday()].append(x)
        vb = sum(len(g) * (sum(g) / len(g) - mean) ** 2
                 for g in groups.values()) / n
        r = rows[et]
        assert 0.0 <= r["seasonality_strength"] <= 1.0
        assert abs(r["seasonality_strength"] - vb / vtot) < 1e-4
        assert r["n_days"] == n


# ----------------------------------------------------------------- r3 batch

def test_connected_components_covers_all_nodes_once(spark):
    """Component sizes must partition the node set; labels are min-ids,
    so every component id is <= every member (checked via min_node)."""
    from manual_data_ingest_spark.operators.graph import _mutual_topk_edges

    out = E.queries()["graph_connected_components"](spark, SF_ORACLE).collect()
    e = _mutual_topk_edges(spark, SF_ORACLE)
    n_nodes = (e.select(F.col("u").alias("n"))
               .unionAll(e.select(F.col("v_").alias("n")))
               .distinct().count())
    assert sum(r.n_nodes for r in out) == n_nodes
    for r in out:
        assert r.component == r.min_node <= r.max_node


def test_connected_components_known_graph(spark):
    """Hand-checkable 2-component graph via the same propagation code
    path shape: {1-2-3} and {10-11}; singleton 99 has no edges so it
    never enters the node set."""
    from pyspark.sql import Row

    adj_rows = [(1, 2), (2, 3), (10, 11)]
    adj = spark.createDataFrame(
        [Row(node=a, nbr=b) for a, b in adj_rows]
        + [Row(node=b, nbr=a) for a, b in adj_rows], "node long, nbr long")
    labels = adj.select("node").distinct().withColumn("comp", F.col("node"))
    for _ in range(8):
        nbr_min = (adj.join(labels.withColumnRenamed("node", "nbr"), "nbr")
                   .groupBy("node").agg(F.min("comp").alias("nc")))
        labels = (labels.join(nbr_min, "node", "left")
                  .select("node", F.least(
                      F.col("comp"),
                      F.coalesce(F.col("nc"), F.col("comp"))).alias("comp"))
                  .localCheckpoint(eager=True))
    got = {r.node: r.comp for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_naive_bayes_beats_majority_class(spark):
    """Resubstitution NB on lang-marked text must beat predicting the
    majority class — the model actually uses token evidence."""
    out = E.queries()["ml_naive_bayes"](spark, SF_ORACLE).collect()
    total = sum(r.n_docs for r in out)
    correct = sum(r.n_docs for r in out if r.actual == r.predicted)
    by_actual = {}
    for r in out:
        by_actual[r.actual] = by_actual.get(r.actual, 0) + r.n_docs
    majority = max(by_actual.values())
    assert correct / total > majority / total


def test_group_holdout_no_user_straddles_splits(spark):
    """The operator's defining law, checked directly on the assignment
    expression: every user maps to exactly one split."""
    from manual_data_ingest_spark.io import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    bucket = F.expr(
        "cast(conv(substring(md5(cast(user_id as string)), 1, 4), 16, 10)"
        " as int) % 10")
    split = (F.when(bucket <= 7, "train")
             .when(bucket == 8, "val").otherwise("test"))
    n_violations = (ev.select("user_id", split.alias("split")).distinct()
                    .groupBy("user_id").count()
                    .filter(F.col("count") > 1).count())
    assert n_violations == 0
    # and the report's event counts conserve the corpus
    out = E.queries()["sample_group_holdout"](spark, SF_ORACLE).collect()
    assert sum(r.n_events for r in out) == ev.count()


def test_ohlc_bars_replay(spark):
    """Brute-force python replay of one day's bars."""
    from manual_data_ingest_spark.io import load_table

    out = {(r.event_type, r.day): r
           for r in E.queries()["agg_ohlc_bars"](spark, SF_ORACLE).collect()}
    ev = (load_table(spark, SF_ORACLE, "events")
          .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
          .select("event_type", F.date_trunc("day", "ts").alias("day"),
                  "ts", "event_id", "value").collect())
    by_bar = {}
    for r in ev:
        by_bar.setdefault((r.event_type, r.day), []).append(r)
    for key, rows in list(by_bar.items())[:25]:
        rows.sort(key=lambda r: (r.ts, r.event_id))
        bar = out[key]
        assert bar.volume == len(rows)
        assert bar.open == round(rows[0].value, 6)
        assert bar.close == round(rows[-1].value, 6)
        assert bar.high == round(max(r.value for r in rows), 6)
        assert bar.low == round(min(r.value for r in rows), 6)


def test_phash_is_byte_order_invariant(spark):
    """The perceptual property the stand-in actually has: permuting a
    document's bytes leaves its signature unchanged (an md5 would not)."""
    from pyspark.sql import Row

    from manual_data_ingest_spark.registry import _QUERIES  # noqa: F401

    import numpy as np

    def sig(buf: bytes) -> int:
        arr = np.frombuffer(buf, dtype=np.uint8)
        counts = np.bincount(arr >> 4, minlength=16)
        nz = np.nonzero(counts)[0]
        a = counts[nz].sum() / float(len(nz))
        return int(((counts[nz] > a).astype(np.int64)
                    << nz.astype(np.int64)).sum())

    text = b"the quick brown fox jumps over the lazy dog"
    shuffled = bytes(sorted(text))
    assert sig(text) == sig(shuffled)
    # a DIFFERENT byte distribution (digits/punctuation vs lowercase
    # letters) moves the dominant histogram bin and changes the signature
    assert sig(text) != sig(b"0123456789!#$%&0123456789")


def test_sparse_tfidf_self_similarity_would_be_one(spark):
    """Normalization law: a probe's dot product with ITSELF is 1 —
    verified by rebuilding weights and checking norms."""
    from manual_data_ingest_spark.io import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = (tok.groupBy("doc_id", "token")
          .agg(F.count("*").cast("double").alias("tf")))
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n"))
    w = (tf.join(df, "token").crossJoin(F.broadcast(n))
         .select("doc_id",
                 (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("w")))
    norms = (w.groupBy("doc_id")
             .agg(F.sum(F.col("w") * F.col("w")).alias("ss"))
             .filter(F.col("ss") > 0)
             .select((F.abs(F.sqrt("ss") / F.sqrt("ss") - 1.0)).alias("err"))
             .agg(F.max("err").alias("m")).collect()[0].m)
    assert norms == 0.0
    # and the registered output's scores lie in (0, 1]
    out = E.queries()["sim_sparse_tfidf_topk"](spark, SF_ORACLE).collect()
    assert out and all(0.0 < r.score <= 1.000001 for r in out)


def test_freshness_lag_nonnegative_and_anchored(spark):
    out = E.queries()["ingest_freshness_slo"](spark, SF_ORACLE).collect()
    assert out and all(r.lag_hours >= 0 for r in out)
    # the freshest source has zero lag and passes the SLO
    freshest = min(out, key=lambda r: r.lag_hours)
    assert freshest.lag_hours == 0.0 and freshest.slo_ok == 1


def test_time_decay_score_bounded_by_plain_sum(spark):
    """exp(-age/30) <= 1, so every decayed score is <= the undecayed sum
    and > 0 for users with positive values."""
    from manual_data_ingest_spark.io import load_table

    out = {r.user_id: r.decayed_score
           for r in E.queries()["agg_time_decay_score"](spark, SF_ORACLE)
           .collect()}
    plain = {r.user_id: r.s for r in
             load_table(spark, SF_ORACLE, "events")
             .filter(F.col("value").isNotNull())
             .groupBy("user_id").agg(F.sum("value").alias("s")).collect()}
    for uid, dec in out.items():
        assert dec <= plain[uid] + 1e-6


def test_user_overlap_jaccard_bounds_and_symmetric_sizes(spark):
    out = E.queries()["agg_user_overlap_jaccard"](spark, SF_ORACLE).collect()
    assert out
    for r in out:
        assert r.type_a < r.type_b
        assert 0 < r.n_common <= min(r.n_a, r.n_b)
        expect = r.n_common / (r.n_a + r.n_b - r.n_common)
        assert abs(r.jaccard - round(expect, 6)) < 1e-9


def test_pareto_share_monotone_and_bounded(spark):
    out = sorted(E.queries()["win_pareto_share"](spark, SF_ORACLE).collect(),
                 key=lambda r: r.rnk)
    assert [r.rnk for r in out] == list(range(1, len(out) + 1))
    shares = [r.cum_share for r in out]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    assert 0 < shares[0] and shares[-1] <= 1.0
    # revenue ranks descend
    revs = [r.revenue for r in out]
    assert all(a >= b for a, b in zip(revs, revs[1:]))


def test_session_bounce_consistent_with_sessionize(spark):
    """Bounce KPIs must replay from win_sessionize's session table."""
    sess = E.queries()["win_sessionize"](spark, SF_ORACLE).collect()
    out = E.queries()["agg_session_bounce"](spark, SF_ORACLE).collect()[0]
    assert out.n_sessions == len(sess)
    assert out.n_bounces == sum(1 for s in sess if s.n_events == 1)
    assert out.max_session_events == max(s.n_events for s in sess)


def test_late_data_report_replay(spark):
    """Python replay of the high-watermark lateness per type."""
    from manual_data_ingest_spark.io import load_table

    ev = (load_table(spark, SF_ORACLE, "events")
          .filter(F.col("event_type").isNotNull())
          .select("event_type", "event_id", "ts").collect())
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r)
    got = {r.event_type: r
           for r in E.queries()["ingest_late_data_report"](spark, SF_ORACLE)
           .collect()}
    for t, rows in by_type.items():
        rows.sort(key=lambda r: r.event_id)
        hwm, n_late = None, 0
        for r in rows:
            if hwm is not None and r.ts < hwm:
                n_late += 1
            hwm = r.ts if hwm is None else max(hwm, r.ts)
        assert got[t].n_events == len(rows)
        assert got[t].n_late == n_late, t


def test_vocab_growth_monotone_and_exact_at_ten(spark):
    from manual_data_ingest_spark.io import load_table

    out = sorted(E.queries()["text_vocab_growth"](spark, SF_ORACLE).collect(),
                 key=lambda r: r.decile)
    toks = [r.n_tokens for r in out]
    vocab = [r.n_vocab for r in out]
    assert all(a <= b for a, b in zip(toks, toks[1:]))
    assert all(a <= b for a, b in zip(vocab, vocab[1:]))
    # decile 10 covers the whole corpus exactly
    d = load_table(spark, SF_ORACLE, "documents")
    total_tokens = d.select(F.explode(F.split("text", " "))).count()
    total_vocab = (d.select(F.explode(F.split("text", " ")).alias("t"))
                   .select("t").distinct().count())
    assert toks[-1] == total_tokens and vocab[-1] == total_vocab


def test_train_eval_split_holds_out_and_generalizes_worse(spark):
    """The held-out matrix covers only test docs, and held-out accuracy
    must not EXCEED resubstitution accuracy (the generalization gap is
    non-negative up to small-sample noise)."""
    held = E.queries()["pipeline_train_eval_split"](spark, SF_ORACLE).collect()
    resub = E.queries()["ml_naive_bayes"](spark, SF_ORACLE).collect()
    n_test = sum(r.n_docs for r in held)
    n_all = sum(r.n_docs for r in resub)
    assert 0 < n_test < n_all
    acc_held = sum(r.n_docs for r in held if r.actual == r.predicted) / n_test
    acc_resub = sum(r.n_docs for r in resub if r.actual == r.predicted) / n_all
    assert acc_held <= acc_resub + 0.05


def test_asof_tolerance_is_subset_of_unbounded_asof(spark):
    """Within-band matches must agree with the unbounded as-of pick;
    out-of-band purchases are NULL here but matched there (or NULL in
    both)."""
    unbounded = {r.event_id: r.click_ts
                 for r in E.queries()["join_asof"](spark, SF_ORACLE).collect()}
    banded = E.queries()["join_asof_tolerance"](spark, SF_ORACLE).collect()
    assert len(banded) == len(unbounded)
    n_matched = 0
    for r in banded:
        if r.matched:
            n_matched += 1
            # the banded pick IS the unbounded pick (same most-recent rule)
            assert r.click_ts == unbounded[r.event_id]
            assert (r.ts.timestamp() - r.click_ts.timestamp()) <= 2 * 3600
        else:
            u = unbounded[r.event_id]
            assert u is None or (r.ts.timestamp() - u.timestamp()) > 2 * 3600
    assert 0 < n_matched < len(banded)  # the band actually bites


def test_activity_heatmap_covers_corpus(spark):
    from manual_data_ingest_spark.io import load_table

    out = E.queries()["agg_activity_heatmap"](spark, SF_ORACLE).collect()
    ev = load_table(spark, SF_ORACLE, "events")
    assert sum(r.n_events for r in out) == ev.filter(
        F.col("ts").isNotNull()).count()
    for r in out:
        assert 1 <= r.dow <= 7 and 0 <= r.hod <= 23
        assert r.n_users <= r.n_events


def test_eval_metrics_replay_from_confusion(spark):
    conf = E.queries()["ml_naive_bayes"](spark, SF_ORACLE).collect()
    out = {r["class"]: r
           for r in E.queries()["ml_eval_metrics"](spark, SF_ORACLE).collect()}
    classes = {r.actual for r in conf} | {r.predicted for r in conf}
    for c in classes:
        tp = sum(r.n_docs for r in conf if r.actual == c and r.predicted == c)
        fp = sum(r.n_docs for r in conf if r.actual != c and r.predicted == c)
        fn = sum(r.n_docs for r in conf if r.actual == c and r.predicted != c)
        m = out[c]
        assert (m.tp, m.fp, m.fn) == (tp, fp, fn), c
        if tp + fp:
            assert m.precision_ == round(tp / (tp + fp), 6)
        if tp + fn:
            assert m.recall_ == round(tp / (tp + fn), 6)


def test_row_fingerprint_detects_single_cell_change(spark, tmp_path):
    """The operator's purpose: one changed cell changes the partition's
    digest while untouched partitions keep theirs."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = SF_ORACLE
    dst = str(tmp_path / "mut")
    os.makedirs(dst)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(f"{src}/{f}", f"{dst}/{f}")
    t = pq.read_table(f"{dst}/orders.parquet")
    prices = t.column("o_totalprice").to_pylist()
    prices[0] = (prices[0] or 0.0) + 0.01  # one cent, one row
    changed_status = t.column("o_orderstatus").to_pylist()[0]
    idx = t.schema.get_field_index("o_totalprice")
    t = t.set_column(idx, "o_totalprice",
                     pa.array(prices, type=t.schema.field(idx).type))
    pq.write_table(t, f"{dst}/orders.parquet")
    before = {r.partition_key: (r.xor_digest, r.n_rows)
              for r in E.queries()["ingest_row_fingerprint"](spark, src)
              .collect()}
    after = {r.partition_key: (r.xor_digest, r.n_rows)
             for r in E.queries()["ingest_row_fingerprint"](spark, dst)
             .collect()}
    assert before.keys() == after.keys()
    # the mutated partition's digest flips...
    assert before[changed_status] != after[changed_status]
    # ...and untouched partitions keep theirs
    for k in before:
        if k != changed_status:
            assert before[k] == after[k], k


def test_cross_source_dedup_finds_exactly_the_mirrored_docs(spark):
    """Every synthesized mirror (doc_id % 3 == 0) must form a group of
    exactly 2 docs / 2 sources keeping the original id; nothing else
    qualifies."""
    from manual_data_ingest_spark.io import load_table

    out = E.queries()["dedup_cross_source"](spark, SF_ORACLE).collect()
    d = load_table(spark, SF_ORACLE, "documents")
    # distinct texts among doc_id % 3 == 0 (identical texts merge groups)
    expected = (d.filter(F.col("doc_id") % 3 == 0)
                .select(F.md5(F.lower(F.trim("text")))).distinct().count())
    assert len(out) == expected
    for r in out:
        assert r.n_sources >= 2 and r.n_docs >= 2
        assert r.keep_id < 1_000_000  # original wins, never the mirror


def test_volume_anomaly_zscores_replay(spark):
    """Python replay of one type's trailing-window z-scores."""
    import statistics as st

    from manual_data_ingest_spark.io import load_table

    rows = (load_table(spark, SF_ORACLE, "events")
            .filter(F.col("event_type") == "click")
            .groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.count("*").alias("n"))
            .orderBy("day").collect())
    got = {r.day: r for r in
           E.queries()["ingest_volume_anomaly"](spark, SF_ORACLE).collect()
           if r.event_type == "click"}
    ns = [r.n for r in rows]
    for i, r in enumerate(rows):
        hist = ns[max(0, i - 7):i]
        g = got[r.day]
        if len(hist) >= 3 and len(set(hist)) > 1:
            mu, sigma = st.mean(hist), st.stdev(hist)
            assert g.zscore == round(abs(r.n - mu) / sigma, 6), r.day
            assert g.is_anomaly == (1 if abs(r.n - mu) / sigma > 3 else 0)
        elif len(hist) < 3:
            assert g.zscore is None


def test_top_terms_are_rare_not_stopwords(spark):
    """tf-idf must rank corpus-rare tokens above ubiquitous ones: no
    doc's top term may be a token present in >90% of documents."""
    from manual_data_ingest_spark.io import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    n_docs = d.count()
    df = (d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
          .distinct().groupBy("t").count().collect())
    ubiquitous = {r.t for r in df if r["count"] > 0.9 * n_docs}
    out = E.queries()["text_top_terms"](spark, SF_ORACLE).collect()
    top1 = [r.token for r in out if r.rn == 1]
    assert top1 and not (set(top1) & ubiquitous)


def _edge_docs_dir(spark, tmp_path, rows):
    """Write a tiny custom documents.parquet and return its dir."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    df = spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t) if t is not None else None)
         for i, t in enumerate(rows)], schema)
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _oracle_rows(name, sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    cur = con.execute(E.oracle_sql()[name])
    cols = [d[0] for d in cur.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(r[i] for i in idx) for r in cur.fetchall())
    con.close()
    return out


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


def test_vocab_growth_non_decimal_corpus_matches_oracle(spark, tmp_path):
    """11 docs ⇒ (max_id+1)*d rarely divisible by 10: the decile bound
    must floor identically on both engines (r3 advisor, medium)."""
    texts = [f"w{i} common w{i} extra{i % 3}" for i in range(11)]
    d = _edge_docs_dir(spark, tmp_path, texts)
    got = _spark_rows(E.queries()["text_vocab_growth"](spark, d))
    want = _oracle_rows("text_vocab_growth", d)
    assert got == want


def test_ngram_novelty_short_and_long_docs_match_oracle(spark, tmp_path):
    """Docs with <3 tokens emit NO grams (no fabricated partials) and
    docs with >201 tokens cap at the oracle's 199 start positions."""
    texts = ["one", "two words", "", " ".join(f"t{i % 7}" for i in range(260)),
             "alpha beta gamma delta"]
    d = _edge_docs_dir(spark, tmp_path, texts)
    got = _spark_rows(E.queries()["text_ngram_novelty"](spark, d))
    want = _oracle_rows("text_ngram_novelty", d)
    assert got == want


def test_jsonl_badrecords_lone_backslash_roundtrip(spark, tmp_path):
    """A lone backslash in text must escape to valid JSON: the corrupt
    count stays exactly the constructed every-10th-doc set."""
    texts = [("back\\slash and \"quote\" no" + str(i)) for i in range(20)]
    d = _edge_docs_dir(spark, tmp_path, texts)
    out = {r.status: r for r in
           E.queries()["scan_jsonl_badrecords"](spark, d).collect()}
    assert out["parsed"].n_rows == 18      # doc_id 0 and 10 truncated
    assert out["corrupt"].n_rows == 2
    assert out["parsed"].sum_chars == sum(
        len(t) for i, t in enumerate(texts) if i % 10 != 0)


def test_survival_curve_laws(spark):
    """KM survival must start ≤ 1, be strictly within (0, 1], and be
    NON-INCREASING in time; at-risk counts must be non-increasing too."""
    rows = sorted(
        E.queries()["agg_survival_km"](spark, SF_ORACLE).collect(),
        key=lambda r: r.duration_months)
    assert rows, "no event timepoints"
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 < r.survival <= prev_s + 1e-9, r
        assert r.n_events >= 1
        if prev_n is not None:
            assert r.n_at_risk <= prev_n, r
        prev_s, prev_n = r.survival, r.n_at_risk


def test_bootstrap_ci_brackets_estimate(spark):
    """The 95% bootstrap CI must contain the full-sample mean and be
    deterministic across runs (hash-derived weights, no RNG)."""
    q = E.queries()["ml_bootstrap_ci"]
    a = q(spark, SF_ORACLE).collect()[0]
    assert a.ci_lo <= a.mean_estimate <= a.ci_hi
    assert a.n_replicates == 100
    b = q(spark, SF_ORACLE).collect()[0]
    assert (a.ci_lo, a.ci_hi, a.mean_estimate) == (
        b.ci_lo, b.ci_hi, b.mean_estimate)


def test_cluster_profile_conserves_docs(spark):
    """Σ cluster_size × n_clusters over the profile = corpus size."""
    rows = E.queries()["dedup_cluster_profile"](spark, SF_ORACLE).collect()
    from manual_data_ingest_spark.io import load_table

    total = load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert all(r.n_docs == r.cluster_size * r.n_clusters for r in rows)


def test_label_propagation_covers_all_nations_deterministically(spark):
    """Every nation gets exactly one community; a second run returns
    the identical assignment (integer votes, min-label ties)."""
    q = E.queries()["graph_label_propagation"]
    a = _rows(q(spark, SF_ORACLE))
    assert len(a) == 25
    # sorted columns = (community, n_name, n_nationkey): key is index 2
    assert len({k[2] for k in a}) == 25  # one row per nation
    assert a == _rows(q(spark, SF_ORACLE))


def test_hhi_bounds(spark):
    """HHI lies in (0, 10000]; a nation with one customer would be
    exactly 10000 — fixture nations have many, so strictly below."""
    rows = E.queries()["agg_hhi_concentration"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.hhi <= 10000.0
        assert r.n_custs >= 1


def test_kcore_fixed_iterations_reach_fixpoint(spark):
    """graph_kcore runs a FIXED 8 peel rounds for cross-engine
    determinism; this pins that 8 rounds actually reach the k-core
    fixpoint on every fixture scale (pure-Python peel to convergence
    over the same adjacency, compared row-for-row)."""
    import duckdb

    from manual_data_ingest_spark.operators.graph import (
        _CC_EDGE_CTE, _KCORE_K)

    for sf_dir in (SF_SMALL, SF_ORACLE):
        con = duckdb.connect()
        for t in ("lineitem",):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM '{sf_dir}/{t}.parquet'")
        adj = con.execute(
            _CC_EDGE_CTE + " SELECT node, nbr FROM adj").fetchall()
        nbrs: dict[int, set[int]] = {}
        for a, b in adj:
            nbrs.setdefault(a, set()).add(b)
        surv = set(nbrs)
        while True:
            drop = {n for n in surv
                    if len(nbrs[n] & surv) < _KCORE_K}
            if not drop:
                break
            surv -= drop
        expect = sorted((n, len(nbrs[n] & surv)) for n in surv)
        got = sorted((r.node, r.core_deg) for r in
                     E.queries()["graph_kcore"](spark, sf_dir).collect())
        assert got == expect, sf_dir


def test_chunked_threshold_pairs_equals_blocked(spark, monkeypatch):
    """The chunk-pair decomposition must be row-identical to the
    one-matmul-per-label path — at the default chunk (4096: single
    chunk per fixture label, the degenerate identity) AND with the
    knob forced to 64 (sf0.1's 200 rows/label = 4 chunks, the
    multi-chunk path actually exercised)."""
    qs = E.queries()
    for sf_dir in (SF_ORACLE, "/root/testdata/sf0.1"):
        a = _rows(qs["sim_threshold_pairs"](spark, sf_dir))
        b = _rows(qs["sim_threshold_pairs_chunked"](spark, sf_dir))
        assert a == b, sf_dir
    monkeypatch.setenv("SPARK_GRAFT_SIM_CHUNK_ROWS", "64")
    a = _rows(qs["sim_threshold_pairs"](spark, "/root/testdata/sf0.1"))
    b = _rows(qs["sim_threshold_pairs_chunked"](spark, "/root/testdata/sf0.1"))
    assert a == b


def test_bloom_prefilter_no_false_negatives_and_fp_bound(spark):
    """The bloom membership test must pass EVERY true member (no false
    negatives — the correctness contract) and the false-positive rate
    at m=2^20, k=3 must stay under 1% on the largest fixture (the
    efficiency contract: the prefilter must actually cut the shuffle)."""
    from pyspark.sql import functions as F
    from manual_data_ingest_spark.io import load_table

    sf_dir = "/root/testdata/sf0.1"
    li = load_table(spark, sf_dir, "lineitem")
    keys = (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey"))
    # reconstruct the survivor set by running the operator's plan up to
    # the prefilter: compare counts through the exact semi join
    total = li.count()
    exact = li.join(keys, li.l_orderkey == keys.o_orderkey,
                    "left_semi").count()
    # the registered operator resolves fp's exactly, so its aggregate
    # equals the oracle; here pin the prefilter itself via the module's
    # internals
    import manual_data_ingest_spark.operators.joins as J
    out = E.queries()["join_bloom_prefilter"](spark, sf_dir)
    got = {r.l_returnflag: r.n_lines for r in out.collect()}
    want = {r.l_returnflag: r.cnt for r in
            li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi")
            .groupBy("l_returnflag").agg(F.count("*").alias("cnt"))
            .collect()}
    assert got == want  # no false negatives can survive this equality
    # fp bound: (k*n/m)^k with n≈sf0.1 urgent orders — well under 1%;
    # sanity-check the arithmetic stays true if fixtures regenerate
    n = keys.count()
    k, m = J._BLOOM_K, J._BLOOM_M
    import math
    fp = (1.0 - math.exp(-k * n / m)) ** k
    assert fp < 0.01, f"bloom sizing off: n={n} predicted fp={fp:.4f}"


def test_rrf_fusion_dominates_single_arm_rank(spark):
    """RRF sanity law: a neighbor ranked #1 by BOTH arms must be the
    fused #1 (its fused score 2/(61) is the maximum attainable)."""
    for sf_dir in (SF_ORACLE, "/root/testdata/sf0.1"):
        qs = E.queries()
        dense = {(r.probe_id, r.rn): r.neighbor_id
                 for r in qs["sim_topk"](spark, sf_dir).collect()}
        fused = {(r.probe_id, r.rn): r.neighbor_id
                 for r in qs["sim_rrf_fusion"](spark, sf_dir).collect()}
        quant = {(r.probe_id, r.rn): r.neighbor_id
                 for r in qs["sim_quantize_int8"](spark, sf_dir).collect()}
        for (pid, rn), nid in dense.items():
            if rn == 1 and quant.get((pid, 1)) == nid:
                assert fused[(pid, 1)] == nid, (sf_dir, pid)


def test_curriculum_buckets_are_quality_ordered(spark):
    """Bucket boundaries must respect the quality ordering: the minimum
    quality in bucket b must be >= the maximum in bucket b+1 (ntile on
    quality desc), and per-bucket seq must be 1..n_b dense."""
    out = E.queries()["pipeline_curriculum_order"](
        spark, SF_ORACLE).collect()
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert sorted(by_bucket) == [1, 2, 3, 4]
    for b in (1, 2, 3):
        assert (min(r.quality for r in by_bucket[b])
                >= max(r.quality for r in by_bucket[b + 1]))
    for b, rows in by_bucket.items():
        seqs = sorted(r.seq_in_bucket for r in rows)
        assert seqs == list(range(1, len(rows) + 1)), b


def test_neyman_budget_and_variance_preference(spark):
    """Allocations must (a) nearly exhaust the budget (integer
    rounding drift < strata count) and (b) shift budget toward
    higher-variance strata relative to proportional allocation:
    sum over strata of (alloc-prop)*sign(S_h - pooled) >= 0."""
    for sf_dir in (SF_ORACLE, "/root/testdata/sf0.1"):
        rows = E.queries()["sample_neyman_allocation"](
            spark, sf_dir).collect()
        total = sum(r.alloc_n for r in rows)
        assert abs(total - 1000) < len(rows), (sf_dir, total)
        mean_sd = sum(r.stratum_sd for r in rows) / len(rows)
        drift = sum((r.alloc_n - r.proportional_n)
                    * (1 if r.stratum_sd > mean_sd else -1) for r in rows)
        assert drift >= 0, (sf_dir, drift)


def test_hits_normalization_and_direction(spark):
    """HITS invariants: authority and hub vectors are L1-normalized
    (each sums to 1 within output rounding), all entries are
    non-negative, and scores are non-degenerate (>1 distinct value
    per vector on the trade graph)."""
    for sf_dir in (SF_SMALL, SF_ORACLE):
        rows = E.queries()["graph_hits"](spark, sf_dir).collect()
        assert len(rows) == 25
        sa = sum(r.authority for r in rows)
        sh = sum(r.hub for r in rows)
        assert abs(sa - 1.0) < 1e-4 and abs(sh - 1.0) < 1e-4, (sf_dir, sa, sh)
        assert all(r.authority >= 0 and r.hub >= 0 for r in rows)
        assert len({r.authority for r in rows}) > 1
        assert len({r.hub for r in rows}) > 1


def test_isotonic_calibration_is_monotone_and_pools(spark):
    """ml_isotonic_calibration's contract: iso_prob is NON-DECREASING
    in the score decile (the property PAV exists to enforce) while the
    raw pos_rate is NOT monotone on this fixture (so the test would
    catch an identity passthrough), and pooled blocks average to the
    raw rates they replaced (mass conservation)."""
    rows = sorted(E.queries()["ml_isotonic_calibration"](spark, SF_ORACLE)
                  .collect(), key=lambda r: r.score_decile)
    iso = [r.iso_prob for r in rows]
    raw = [r.pos_rate for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))
    assert any(a > b for a, b in zip(raw, raw[1:]))  # PAV had work to do
    # mass conservation: sum(iso * n) == sum(pos) within rounding
    tot_iso = sum(r.iso_prob * r.n for r in rows)
    tot_pos = sum(r.n_pos for r in rows)
    assert abs(tot_iso - tot_pos) < 1e-2


def test_conformal_coverage_guarantee_holds(spark):
    """ml_conformal_interval's contract IS the conformal guarantee:
    empirical calibration coverage = (#r <= q_hat)/n_cal must sit in
    [0.9, 0.9 + 2/n_cal) — k = ceil(0.9 (n+1)) smallest residual
    covers at least k/n and at most k/n + ties."""
    r = E.queries()["ml_conformal_interval"](spark, SF_ORACLE).first()
    assert r.k == -(-9 * (r.n_cal + 1) // 10)  # ceil(0.9 (n+1))
    assert 0.9 <= r.coverage < 0.9 + 2.0 / r.n_cal + 1e-9
    assert r.q90 > 0
