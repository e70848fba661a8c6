"""Batch↔stream parity and true multi-batch streaming tests (SURVEY.md §5.5).

The oracle sweep runs streaming ops with availableNow over ONE file =
one micro-batch. Here the events table is re-written as several files
and streamed with maxFilesPerTrigger=1, so state genuinely carries
across micro-batches — and watermark late-dropping actually fires.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from manual_data_ingest_spark.io import load_events
from manual_data_ingest_spark.streaming import ops as S
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def multi_file_events(spark, tmp_path_factory):
    """events at sf0.001 split into 4 files, mod-times forcing a
    deterministic processing order (FileStreamSource takes oldest first)."""
    d = str(tmp_path_factory.mktemp("events_multi"))
    ev = load_events(spark, SF_SMALL)
    # split by event_id ranges so each file spans the full time range —
    # every micro-batch advances the same users' state
    ev.withColumn("bucket", F.col("event_id") % 4) \
      .repartitionByRange(4, "bucket").write.mode("overwrite") \
      .partitionBy("bucket").parquet(d)
    files = sorted(str(p) for p in __import__("pathlib").Path(d).rglob("*.parquet"))
    for i, f in enumerate(files):
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    return d


def _stream_multi(spark, src_dir, build, output_mode):
    schema = spark.read.parquet(src_dir).schema
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src_dir))
    sink = f"parity_sink_{abs(hash((src_dir, output_mode, build.__name__))) % 10**8}"
    q = (build(st).writeStream.format("memory").queryName(sink)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(sink)


def test_tumbling_multibatch_equals_batch(spark, multi_file_events):
    def build(st):
        return (st.groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count("*").alias("cnt"))
                .select(F.col("window.start").alias("ws"), "event_type", "cnt"))

    got = _stream_multi(spark, multi_file_events, build, "complete")
    batch = (load_events(spark, SF_SMALL)
             .groupBy(F.window("ts", "1 hour"), "event_type")
             .agg(F.count("*").alias("cnt"))
             .select(F.col("window.start").alias("ws"), "event_type", "cnt"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_dedup_state_across_batches(spark, multi_file_events):
    # duplicate event_ids across DIFFERENT micro-batches must be
    # suppressed by the state store, not by intra-batch dedup
    def build(st):
        dup = st.withColumn("value", F.col("value") + 1)  # distinct payload
        return (st.unionByName(dup).dropDuplicates(["event_id"])
                .select("event_id"))

    got = _stream_multi(spark, multi_file_events, build, "append")
    total = load_events(spark, SF_SMALL).count()
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late rows behind the watermark are dropped by the stateful agg.

    Verified Spark semantic (this session, 4.1.2): the watermark that
    FILTERS batch N's input is the one computed after batch N-1, i.e. it
    lags the data by one batch. So batch 1's late row (event 3) still
    lands (effective watermark is epoch), while batch 2's late row
    (event 5) is dropped by the 11:50 watermark established after
    batch 1. Complete mode ignores watermarks; update mode filters.
    """
    d = str(tmp_path / "late")
    os.makedirs(d)
    batches = [
        [(1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 12:00:00")],
        [(3, 10, "2024-01-01 09:00:00"), (4, 10, "2024-01-01 12:30:00")],
        [(5, 10, "2024-01-01 09:05:00"), (6, 10, "2024-01-01 13:00:00")],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts_s string") \
            .select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
        f = f"{d}/batch{i}"
        df.coalesce(1).write.parquet(f)
        for p in __import__("pathlib").Path(f).rglob("*.parquet"):
            os.rename(p, f"{d}/part{i}.parquet")
            os.utime(f"{d}/part{i}.parquet",
                     (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    st = (spark.readStream.schema("event_id long, user_id long, ts timestamp")
          .option("maxFilesPerTrigger", "1").parquet(d + "/part*.parquet"))
    agg = (st.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour"), "user_id")
           .agg(F.collect_list("event_id").alias("ids")))
    sink = "late_drop_sink"
    q = (agg.writeStream.format("memory").queryName(sink)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    dropped = sum(so["numRowsDroppedByWatermark"]
                  for p in q.recentProgress for so in p["stateOperators"])
    seen = {i for r in spark.table(sink).collect() for i in r.ids}
    assert 5 not in seen          # late event dropped by the watermark
    assert dropped == 1           # and the drop is visible in metrics
    assert {1, 2, 3, 4, 6} <= seen  # everything else survives


def test_stateful_running_final_counts(spark, multi_file_events):
    # per-user running count carried across 4 micro-batches must end at
    # the batch groupBy count
    from pyspark.sql.streaming.state import GroupStateTimeout
    import pandas as pd

    def running(key, pdfs, state):
        cnt = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = list(range(cnt + 1, cnt + 1 + len(pdf)))
        state.update((out[-1],))
        yield pd.DataFrame({"event_id": pdf["event_id"].to_numpy(),
                            "user_id": pdf["user_id"].to_numpy(),
                            "running_cnt": out})

    def build(st):
        return st.groupBy("user_id").applyInPandasWithState(
            running, "event_id long, user_id long, running_cnt long",
            "cnt long", "append", GroupStateTimeout.NoTimeout)

    got = _stream_multi(spark, multi_file_events, build, "append")
    finals = (got.groupBy("user_id").agg(F.max("running_cnt").alias("c")))
    batch = load_events(spark, SF_SMALL).groupBy("user_id").count()
    lhs = {(r.user_id, r.c) for r in finals.collect()}
    rhs = {(r.user_id, r["count"]) for r in batch.collect()}
    assert lhs == rhs


def test_rocksdb_state_store_provider(spark, multi_file_events):
    """The production state backend (RocksDB provider, SURVEY §2.10
    scale notes) must produce identical results to the default
    HDFS-backed provider on a multi-batch stateful aggregation."""
    provider = ("org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        def build(st):
            return (st.groupBy("user_id")
                    .agg(F.count("*").alias("cnt"),
                         F.max("value").alias("mx")))

        got = _stream_multi(spark, multi_file_events, build, "complete")
        batch = (load_events(spark, SF_SMALL).groupBy("user_id")
                 .agg(F.count("*").alias("cnt"), F.max("value").alias("mx")))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, batch.collect()))
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)


def test_event_time_timeout_closes_final_session(spark, tmp_path):
    """Stateful sessionization with EventTimeTimeout: sessions close
    either when a later event reveals a gap (in-handler) or when the
    WATERMARK passes session_end with no further events — the timeout
    path, which is the only way the LAST session of a quiet key ever
    closes in a live stream. A later event from another user advances
    the global watermark past user 1's last session + gap, firing the
    timeout."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    d = str(tmp_path / "ev")
    os.makedirs(d)
    batches = [
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 10:10:00")],
        [(3, 1, "2024-01-01 12:00:00")],   # gap > 30 min → closes session 1
        [(4, 1, "2024-01-01 14:00:00")],   # closes session 2
        [(5, 2, "2024-01-01 16:00:00")],   # other user; watermark → 15:50
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts_s string") \
            .select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
        f = f"{d}/b{i}"
        df.coalesce(1).write.parquet(f)
        for p in __import__("pathlib").Path(f).rglob("*.parquet"):
            os.rename(p, f"{d}/part{i}.parquet")
            os.utime(f"{d}/part{i}.parquet", (1_700_000_000 + i * 10,) * 2)

    GAP_US = 30 * 60 * 1_000_000

    def sessionize(key, pdfs, state):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start, unit="us")],
                "n_events": [n], "closed_by": ["timeout"]})
            return
        rows = pd.concat(list(pdfs))
        ts_us = sorted(int(t.value // 1000) for t in rows["ts"])
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_us[0], ts_us[0], 0
        out = []
        for t in ts_us:
            if t - last > GAP_US:
                out.append((start, n))
                start, n = t, 0
            n += 1
            last = t
        state.update((start, last, n))
        state.setTimeoutTimestamp(last // 1000 + 30 * 60 * 1000)
        for s, c in out:
            yield pd.DataFrame({
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(s, unit="us")],
                "n_events": [c], "closed_by": ["gap"]})

    st = (spark.readStream.schema("event_id long, user_id long, ts timestamp")
          .option("maxFilesPerTrigger", "1").parquet(d + "/part*.parquet"))
    res = (st.withWatermark("ts", "10 minutes")
           .groupBy("user_id").applyInPandasWithState(
               sessionize,
               "user_id long, session_start timestamp, n_events long, "
               "closed_by string",
               "start long, last long, n long",
               "append", GroupStateTimeout.EventTimeTimeout))
    q = (res.writeStream.format("memory").queryName("tout_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(str(r.session_start), r.n_events, r.closed_by)
           for r in spark.table("tout_sink").collect() if r.user_id == 1}
    assert ("2024-01-01 10:00:00", 2, "gap") in got
    assert ("2024-01-01 12:00:00", 1, "gap") in got
    assert ("2024-01-01 14:00:00", 1, "timeout") in got  # watermark-closed


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once restart: a second availableNow run against the SAME
    checkpoint must process only files that arrived after the first run
    — the fault-tolerance contract every production stream relies on."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def add_file(i, rows):
        df = spark.createDataFrame(rows, "event_id long, v long")
        f = f"{src}/b{i}"
        df.coalesce(1).write.parquet(f)
        for p in __import__("pathlib").Path(f).rglob("*.parquet"):
            os.rename(p, f"{src}/part{i}.parquet")
            os.utime(f"{src}/part{i}.parquet", (1_700_000_000 + i,) * 2)

    def run_once():
        st = (spark.readStream.schema("event_id long, v long")
              .parquet(src + "/part*.parquet"))
        q = (st.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    add_file(0, [(1, 10), (2, 20)])
    add_file(1, [(3, 30)])
    run_once()
    assert spark.read.parquet(out).count() == 3
    add_file(2, [(4, 40)])
    run_once()  # resume: must append ONLY the new file's rows
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4]  # no reprocessing, no loss


def test_rate_source_produces_monotonic_stream(spark):
    """The rate source is the synthetic-stream generator (load tests,
    demos) — verify the engine consumes a non-file source end-to-end:
    monotonically increasing values, one row per (timestamp, value)."""
    st = (spark.readStream.format("rate")
          .option("rowsPerSecond", "50").load())
    q = (st.writeStream.format("memory").queryName("rate_sink")
         .outputMode("append").start())
    try:
        import time as _t
        deadline = _t.time() + 30
        while _t.time() < deadline:
            if spark.table("rate_sink").count() >= 20:
                break
            _t.sleep(1)
    finally:
        q.stop()
    rows = spark.table("rate_sink").collect()
    assert len(rows) >= 20
    vals = sorted(r.value for r in rows)
    assert vals == list(range(vals[0], vals[0] + len(vals)))  # gapless


def test_tws_state_carries_across_micro_batches(spark, tmp_path):
    """Force MULTIPLE micro-batches (maxFilesPerTrigger=1 over a
    day-split directory) and check the FINAL per-user state equals the
    single-batch batch answer — state must carry across batches, not
    reset. (The registered op runs single-batch on the fixture; this
    pins the multi-batch claim.)"""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout
    from manual_data_ingest_spark.io import load_events
    from tests.conftest import SF_SMALL

    ev = load_events(spark, SF_SMALL)
    src = str(tmp_path / "src")
    # three files with disjoint, time-ordered slices
    ev.filter(F.dayofmonth("ts") <= 10).coalesce(1).write.parquet(f"{src}/f=1")
    ev.filter((F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)) \
        .coalesce(1).write.parquet(f"{src}/f=2")
    ev.filter(F.dayofmonth("ts") > 20).coalesce(1).write.parquet(f"{src}/f=3")

    schema = spark.read.parquet(src).schema
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(f"{src}/*"))

    def ewma_fn(key_, pdfs, state):
        n, e = state.get if state.exists else (0, None)
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for x in pdf["value"]:
            e = x if e is None else 0.75 * e + 0.25 * x
        n += len(pdf)
        state.update((n, e))
        yield pd.DataFrame({"user_id": [key_[0]], "n_events": [n],
                            "ewma": [e]})

    res = st.groupBy("user_id").applyInPandasWithState(
        ewma_fn, outputStructType="user_id long, n_events long, ewma double",
        stateStructType="n long, ewma double", outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)
    name = "tws_multibatch"
    q = (res.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table(name)
    # append mode emits one row per (user, batch-with-data): the LAST
    # emission per user is the final state
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (out.withColumn("rn", F.row_number().over(w))
             .filter("rn = 1").select("user_id", "n_events", "ewma"))
    got = {(r.user_id): (r.n_events, round(r.ewma, 9))
           for r in final.collect()}
    spark.catalog.dropTempView(name)

    # batch reference: one global fold per user
    ref_rows = (ev.select("user_id", "ts", "event_id", "value")
                .sort("user_id", "ts", "event_id").collect())
    ref = {}
    for r in ref_rows:
        n, e = ref.get(r.user_id, (0, None))
        e = r.value if e is None else 0.75 * e + 0.25 * r.value
        ref[r.user_id] = (n + 1, e)
    ref = {u: (n, round(e, 9)) for u, (n, e) in ref.items()}
    assert got == ref


def test_dedup_within_watermark_evicts_state(spark, tmp_path):
    """The semantic that distinguishes dropDuplicatesWithinWatermark
    from plain dropDuplicates: a duplicate arriving AFTER the watermark
    passed its key's event time + delay finds the state EVICTED and is
    emitted AGAIN, while a duplicate whose key is still in state is
    suppressed. Batch 1 seeds X@10:00 and Y@12:00; the watermark after
    batch 1 is 11:50 — past X's state expiry (10:00 + 10 min) but not
    Y's (12:10). Batch 2 re-sends BOTH keys at ts 12:05 (fresh event
    time, so neither row is dropped as late input — a re-send with the
    ORIGINAL ts would be filtered as late before dedup ever sees it,
    verified while writing this test): X re-emits (state evicted),
    Y stays suppressed (state live). Timing details verified while
    writing this test: state cleanup runs at batch END under the
    batch's lagging watermark, so an intermediate batch must pass
    between seeding and re-sending for the eviction to have happened
    (2-batch versions observe live state); and the re-send needs a
    FRESH event time — with the original ts it is filtered as late
    input before dedup ever sees it. Plain dropDuplicates would
    suppress both keys forever, with unbounded state."""
    d = str(tmp_path / "ttl")
    os.makedirs(d)
    batches = [
        [(1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 12:00:00")],
        [(3, 10, "2024-01-01 12:01:00")],
        [(1, 10, "2024-01-01 12:05:00"), (2, 10, "2024-01-01 12:05:00")],
    ]
    for i, rows in enumerate(batches):
        df = (spark.createDataFrame(
                rows, "event_id long, user_id long, ts_s string")
              .select("event_id", "user_id",
                      F.to_timestamp("ts_s").alias("ts")))
        f = f"{d}/batch{i}"
        df.coalesce(1).write.parquet(f)
        for p in __import__("pathlib").Path(f).rglob("*.parquet"):
            os.rename(p, f"{d}/part{i}.parquet")
            os.utime(f"{d}/part{i}.parquet",
                     (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    st = (spark.readStream
          .schema("event_id long, user_id long, ts timestamp")
          .option("maxFilesPerTrigger", "1").parquet(d + "/part*.parquet"))
    dedup = (st.withWatermark("ts", "10 minutes")
             .dropDuplicatesWithinWatermark(["event_id"])
             .select("event_id"))
    sink = "ttl_dedup_sink"
    q = (dedup.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    counts = {}
    for r in spark.table(sink).collect():
        counts[r.event_id] = counts.get(r.event_id, 0) + 1
    spark.catalog.dropTempView(sink)
    assert counts[1] == 2, counts  # X: state evicted -> re-emitted
    assert counts[2] == 1, counts  # Y: still in state -> suppressed


def test_chained_stateful_multibatch_equals_batch(spark, tmp_path):
    """Two chained stateful aggregations with state carried across 4
    TIME-ORDERED micro-batches (weekly files — the realistic arrival
    order; the module's full-range-per-file fixture would make every
    later batch month-late data that the watermark correctly drops)
    must emit exactly the batch answer for every window the final
    watermark closed. Emission-lag note: the trailing availableNow
    flush batch re-emits both layers with the final watermark, so no
    window in the closed set may be missing — a chained-stateful
    regression that withholds one layer's flush shows up here."""
    d = str(tmp_path / "events_weekly")
    ev = load_events(spark, SF_SMALL)
    (ev.withColumn("wk", F.least(F.floor(F.dayofmonth("ts") / 8), F.lit(3)))
     .repartitionByRange(4, "wk").write.mode("overwrite")
     .partitionBy("wk").parquet(d))
    files = sorted(str(p) for p in __import__("pathlib").Path(d).rglob("*.parquet"))
    assert len(files) >= 4
    for i, f in enumerate(files):
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    def build(st):
        per_user = (st.filter(F.col("event_type") == "purchase")
                    .withWatermark("ts", "1 hour")
                    .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
                    .agg(F.count("*").alias("n")))
        return (per_user.groupBy("w")
                .agg(F.count("*").alias("n_buyers"),
                     F.sum("n").alias("n_purchases"))
                .select(F.col("w.start").alias("ws"),
                        "n_buyers", "n_purchases"))

    got = _stream_multi(spark, d, build, "append")
    evp = load_events(spark, SF_SMALL).filter(F.col("event_type") == "purchase")
    wm = evp.agg(F.max("ts")).collect()[0][0]
    batch = (evp.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
             .agg(F.count("*").alias("n"))
             .groupBy("w")
             .agg(F.count("*").alias("n_buyers"),
                  F.sum("n").alias("n_purchases"))
             .filter(F.col("w.end") <= F.expr(
                 f"timestamp'{wm}' - interval 1 hour"))
             .select(F.col("w.start").alias("ws"),
                     "n_buyers", "n_purchases"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_session_exact_gap_boundary(spark, tmp_path):
    """PINNED regression (r9, hypothesis counterexample [0, 1800]):
    Spark's session_window MERGES two events exactly gap-distance
    apart — each event's mergeable extent is [ts, ts+gap] inclusive —
    so the stream_session oracle's island rule must be '<=' (new
    session only when gap > 30:00). This fixture contains the exact
    boundary pair plus the one-second-either-side neighbors, and runs
    the REGISTERED op against its REGISTERED oracle, so a future
    regression in either side hash-fails here before the driver."""
    import datetime as dt

    import duckdb

    from manual_data_ingest_spark.registry import all_oracles, all_queries
    from tests.oracle_check import compare

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: exact 30:00 gap → ONE session of 2 (the bug class)
    # user 2: 29:59 gap → one session; user 3: 30:01 gap → two sessions
    for uid, offsets in ((1, [0, 1800]), (2, [0, 1799]), (3, [0, 1801])):
        for i, s in enumerate(offsets):
            rows.append((uid * 100 + i, base + dt.timedelta(seconds=s),
                         uid, "click", 1.0, "{}"))
    sf_dir = str(tmp_path / "sf_boundary")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet/*.parquet')")
    res = compare("stream_session",
                  all_queries()["stream_session"](spark, sf_dir),
                  con, all_oracles()["stream_session"])
    assert res.ok, res.detail
    # and the boundary pair really merged: user 1 has exactly 1 session
    got = {r.user_id: r.n_events for r in
           all_queries()["stream_session"](spark, sf_dir).collect()
           if r.user_id == 1}
    assert got == {1: 2}, got


def test_valid_ts_drops_are_observable(spark, tmp_path):
    """PARITY #57 (r9 advice): the event-time validity window drops
    out-of-window rows — but never silently. _valid_ts attaches an
    observe() metric; a streaming query over a fixture with pre-1990 /
    post-2100 / NULL timestamps must report the exact drop count on its
    progress feed while the output excludes those rows."""
    import datetime as dt

    from manual_data_ingest_spark.streaming.ops import _valid_ts

    rows = [(1, dt.datetime(1904, 2, 29), 1, "click", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
            (3, dt.datetime(2199, 12, 31), 1, "click", 1.0, "{}"),
            (4, None, 1, "click", 1.0, "{}"),
            (5, dt.datetime(2024, 1, 2), 1, "click", 1.0, "{}")]
    src = str(tmp_path / "events_src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    st = _valid_ts(spark.readStream.schema(schema).parquet(src))
    q = (st.select("event_id").writeStream.format("memory")
         .queryName("valid_ts_obs").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    kept = {r.event_id for r in spark.table("valid_ts_obs").collect()}
    assert kept == {2, 5}
    obs = {}
    for prog in q.recentProgress:
        for name, m in (prog["observedMetrics"] or {}).items():
            if name.startswith("ts_validity_"):
                obs["total"] = obs.get("total", 0) + m["rows_total"]
                obs["kept"] = obs.get("kept", 0) + m["rows_kept"]
                obs["dropped"] = obs.get("dropped", 0) + m["rows_dropped"]
    # rows_dropped emitted directly (r10 verdict task 8) — the NULL ts
    # counts as dropped, not just the out-of-window timestamps
    assert obs == {"total": 5, "kept": 2, "dropped": 3}, obs
