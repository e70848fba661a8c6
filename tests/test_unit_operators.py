"""Per-operator unit tests on tiny inline DataFrames (SURVEY.md §5.3).

Covers the edge cases the sf-fixture oracle sweep cannot: empty input,
single row, all-null keys, unicode text, and hand-computable expected
values for the algorithmic helpers (cosine, shingles, rolling hash,
SimHash blocking).
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from manual_data_ingest_spark.operators.similarity import (
    cosine, dot_unrolled, dot_fold)
from manual_data_ingest_spark.operators.dedup import _shingles
from tests.conftest import SF_SMALL


# ---------------------------------------------------------------- vectors

def test_dot_products_agree_and_match_python(spark):
    a = [float(i) for i in range(64)]
    b = [float(64 - i) for i in range(64)]
    expected = sum(x * y for x, y in zip(a, b))
    df = spark.createDataFrame([Row(a=a, b=b)],
                               "a array<float>, b array<float>")
    got = df.select(
        dot_unrolled("a", "b").alias("unrolled"),
        dot_fold(F.col("a"), F.col("b")).alias("fold"),
        cosine("a", "b").alias("cos")).first()
    assert got.unrolled == pytest.approx(expected)
    assert got.fold == pytest.approx(expected)
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    assert got.cos == pytest.approx(expected / (na * nb))


def test_cosine_self_is_one(spark):
    v = [1.5, -2.0, 3.25] + [0.0] * 61
    df = spark.createDataFrame([Row(a=v, b=v)],
                               "a array<float>, b array<float>")
    assert df.select(cosine("a", "b").alias("c")).first().c == pytest.approx(1.0)


# ---------------------------------------------------------------- shingles

def test_shingles_short_and_unicode(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"),       # 2 shingles of 5 tokens
         (2, "x y"),               # shorter than one shingle → 1 (clamped)
         (3, "héllo wörld ünïcode tøkens ok")],  # unicode survives
        "doc_id long, text string")
    got = {r["doc_id"]: r["sh"]
           for r in (_shingles(docs).groupBy("doc_id")
                     .agg(F.sort_array(F.collect_list("shingle")).alias("sh"))
                     .collect())}
    assert got[1] == ["a b c d e", "b c d e f"]
    assert got[2] == ["x y"]
    assert got[3] == ["héllo wörld ünïcode tøkens ok"]


# ---------------------------------------------------------------- edge cases

def test_groupby_all_null_keys(spark):
    df = spark.createDataFrame(
        [Row(k=None, v=1), Row(k=None, v=2), Row(k="a", v=3)],
        "k string, v int")
    got = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == {None: 3, "a": 3}  # nulls form ONE group (SQL semantics)


def test_cos_arrow_null_in_null_out_true_null(spark):
    """NULL embeddings must yield SQL NULL scores, not NaN: Spark orders
    NaN ABOVE every double, so a NaN score would rank a NULL-embedding
    row FIRST in sim_topk/sim_ann_* orderings (r2 advisor item)."""
    from manual_data_ingest_spark.operators.similarity import (
        cos_arrow, intdot_arrow)

    df = spark.createDataFrame(
        [Row(id=1, a=[1.0, 0.0], b=[1.0, 0.0]),
         Row(id=2, a=None, b=[1.0, 0.0]),
         Row(id=3, a=[0.0, 1.0], b=None)],
        "id int, a array<double>, b array<double>")
    got = (df.select("id", cos_arrow("a", "b").alias("cos"),
                     intdot_arrow("a", "b").alias("dot"))
           .collect())
    by_id = {r.id: r for r in got}
    assert by_id[1].cos == 1.0 and by_id[1].dot == 1.0
    assert by_id[2].cos is None and by_id[2].dot is None  # true NULL
    assert by_id[3].cos is None and by_id[3].dot is None
    # ordering check: NULL scores sort LAST under desc (NaN would sort first)
    order = [r.id for r in df.select(
        "id", cos_arrow("a", "b").alias("c")).orderBy(F.desc("c")).collect()]
    assert order[0] == 1


def test_join_null_keys_never_match(spark):
    left = spark.createDataFrame([Row(k=None, x=1), Row(k="a", x=2)],
                                 "k string, x int")
    right = spark.createDataFrame([Row(k=None, y=10), Row(k="a", y=20)],
                                  "k string, y int")
    inner = left.join(right, "k").collect()
    assert len(inner) == 1 and inner[0].k == "a"


def test_empty_input_pipelines(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert _shingles(empty).count() == 0
    agg = empty.groupBy("text").count().count()
    assert agg == 0


def test_single_row_window(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame([Row(k="a", v=5)], "k string, v int")
    w = Window.partitionBy("k").orderBy("v")
    r = df.select(F.row_number().over(w).alias("rn"),
                  F.sum("v").over(w).alias("s")).first()
    assert (r.rn, r.s) == (1, 5)


# ---------------------------------------------------------------- multimodal

def test_multimodal_decode_deterministic(spark):
    from manual_data_ingest_spark.operators.multimodal import multimodal_decode

    out = multimodal_decode(spark, SF_SMALL)
    assert out.columns == ["doc_id", "n_bytes", "width", "height",
                           "channels", "px_checksum", "thumb_w", "thumb_h"]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows  # non-empty
    r = rows[min(rows)]
    assert r.width == 1 + r.n_bytes % 640
    assert r.height == 1 + r.n_bytes % 480
    assert max(r.thumb_w, r.thumb_h) == 64  # aspect-preserving bound


def test_multimodal_px_checksum_matches_python(spark):
    from manual_data_ingest_spark.operators.multimodal import multimodal_decode
    from manual_data_ingest_spark.io import load_table

    doc = load_table(spark, SF_SMALL, "documents").orderBy("doc_id").first()
    got = (multimodal_decode(spark, SF_SMALL)
           .filter(F.col("doc_id") == doc.doc_id).first())
    assert got.px_checksum == sum(doc.text.encode()) % 2147483647
    assert got.n_bytes == len(doc.text.encode())


def test_excel_source_gated_cleanly(spark):
    from manual_data_ingest_spark.sources.scans import read_excel_sheet

    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_excel_sheet(spark, "/nonexistent.xlsx")


def test_lang_id_discriminates_on_real_markers(spark):
    """The fixture corpus collapses lang-id to 'en'; here the algorithm
    faces documents where each language's markers actually dominate —
    argmax, tie priority, and the 'und' fallback all exercised."""
    from manual_data_ingest_spark.functions.text import _marker_score, _lang_pred, _MARKERS

    docs = spark.createDataFrame(
        [(1, "der hund und die katze das haus"),      # de markers
         (2, "el gato y la casa los perros"),          # es markers
         (3, "le chat et les maisons une porte"),      # fr markers
         (4, "the quick brown fox jumps over a dog"),  # en markers
         (5, "xyzzy plugh quux"),                      # nothing → und
         (6, "the a der die das und")],                # de(4) beats en(2)
        "doc_id long, text string")
    scores = {l: _marker_score("spark", l) for l in _MARKERS}
    from pyspark.sql import functions as FF
    got = {r.doc_id: r.pred for r in docs.select(
        "doc_id", FF.expr(_lang_pred(scores)).alias("pred")).collect()}
    assert got == {1: "de", 2: "es", 3: "fr", 4: "en", 5: "und", 6: "de"}


def test_multimodal_frame_sample_handles_empty_media(spark):
    """Zero-length media must yield 0 frames + NULL first/last bytes
    (advisor-flagged IndexError in the designated real-media slot).
    Runs the REAL registered mapInPandas body."""
    from manual_data_ingest_spark.operators.multimodal import (
        _FRAME_SAMPLE_SCHEMA, _frame_sample_batches)

    df = spark.createDataFrame(
        [(1, bytearray(b"")), (2, bytearray(b"abc"))],
        "doc_id long, media binary")
    out = {r.doc_id: r for r in df.mapInPandas(
        _frame_sample_batches, schema=_FRAME_SAMPLE_SCHEMA).collect()}
    assert out[1].n_frames == 0
    assert out[1].first_frame_byte is None
    assert out[1].last_frame_byte is None
    assert out[2].n_frames == 1
    assert out[2].first_frame_byte == ord("a")


def test_multimodal_decode_invariant_to_arrow_batch_size(spark):
    """The module docstring claims batch sizes stay bounded via
    arrow.maxRecordsPerBatch when media rows are large — verify the
    result is IDENTICAL under a tiny batch bound (more, smaller Arrow
    batches through the same mapInPandas)."""
    from manual_data_ingest_spark.operators.multimodal import multimodal_decode

    base = sorted(map(tuple, multimodal_decode(spark, SF_SMALL).collect()))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        small = sorted(map(tuple, multimodal_decode(spark, SF_SMALL).collect()))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert base == small


# ----------------------------------------------- degenerate-input guards (r5)

def _degenerate_fixture(tmp_path, mutate_sql: str) -> str:
    """Copy the sf0.001 fixture into tmp_path with `orders` rewritten by
    a DuckDB SELECT (the other nine tables are copied verbatim)."""
    import shutil

    import duckdb

    src = SF_SMALL
    dst = str(tmp_path / "fixture")
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "orders.parquet":
            shutil.copy(f"{src}/{f}", f"{dst}/{f}")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders_src AS "
                f"SELECT * FROM read_parquet('{src}/orders.parquet')")
    con.execute(f"CREATE VIEW customer AS "
                f"SELECT * FROM read_parquet('{src}/customer.parquet')")
    con.execute(f"COPY ({mutate_sql}) TO '{dst}/orders.parquet' "
                f"(FORMAT PARQUET)")
    con.close()
    return dst


def test_propensity_degenerate_segment_is_excluded(spark, tmp_path):
    """r4 ADVICE: a segment whose orders are ALL treated (p=1) must be
    dropped by the positivity filter, not raise DIVIDE_BY_ZERO — and
    the engine must stay hash-identical to the oracle on that input."""
    import __spark_entry__ as E

    # force every BUILDING-segment order to URGENT (p=1 there)
    dst = _degenerate_fixture(tmp_path, """
        SELECT o.* REPLACE (
            CASE WHEN c.c_mktsegment = 'BUILDING' THEN '1-URGENT'
                 ELSE o.o_orderpriority END AS o_orderpriority)
        FROM orders_src o JOIN customer c ON o.o_custkey = c.c_custkey
    """)
    row = E.queries()["ml_propensity_weighting"](spark, dst).collect()[0]
    assert row.ate_ipw is not None  # other segments still identified

    import duckdb
    con = duckdb.connect()
    for name in ("orders", "customer"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{dst}/{name}.parquet')")
    orc = con.execute(E.oracle_sql()["ml_propensity_weighting"]).fetchone()
    con.close()
    # n_units shrinks to the positivity universe on BOTH engines
    assert (row.n_units, row.n_treated) == (orc[0], orc[1])
    assert row.ate_ipw == pytest.approx(orc[3], abs=1e-9)


def test_propensity_all_treated_returns_null_not_crash(spark, tmp_path):
    """Every order URGENT → every segment degenerate → the estimator
    universe is empty; NULLs, not DIVIDE_BY_ZERO."""
    import __spark_entry__ as E

    dst = _degenerate_fixture(
        tmp_path,
        "SELECT * REPLACE ('1-URGENT' AS o_orderpriority) FROM orders_src")
    row = E.queries()["ml_propensity_weighting"](spark, dst).collect()[0]
    assert row.n_units == 0
    assert row.ate_ipw is None


def test_runs_test_single_day_and_two_day_series(spark, tmp_path):
    """r4 ADVICE: a one-day series (n=1) and the balanced two-day series
    (2·n1·n0 = n → zero variance) must yield NULL z_score, not
    DIVIDE_BY_ZERO, and agree with the oracle."""
    import duckdb

    import __spark_entry__ as E

    for mutate, n_days in (
            ("SELECT * REPLACE (DATE '1995-06-01' AS o_orderdate) "
             "FROM orders_src", 1),
            # two days, one above / one below the mean by construction:
            # day 1 gets one cheap order, day 2 everything else
            ("SELECT * REPLACE (CASE WHEN o_orderkey = "
             "(SELECT min(o_orderkey) FROM orders_src) "
             "THEN DATE '1995-06-01' ELSE DATE '1995-06-02' END "
             "AS o_orderdate) FROM orders_src", 2)):
        dst = _degenerate_fixture(tmp_path / f"d{n_days}", mutate)
        row = E.queries()["agg_runs_test"](spark, dst).collect()[0]
        assert row.n_days == n_days
        assert row.z_score is None

        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"read_parquet('{dst}/orders.parquet')")
        orc = con.execute(E.oracle_sql()["agg_runs_test"]).fetchone()
        con.close()
        assert orc[0] == n_days and orc[4] is None


def test_sssp_converges_before_iteration_cap():
    """graph_sssp_weighted relaxes for at most _SSSP_ITERS = |V|−1 = 24
    rounds (Bellman-Ford's worst case) and EARLY-EXITS at the fixed
    point; the result is the true shortest-path table only if the fixed
    point arrives within the cap. Pin on every fixture SF that one
    EXTRA round past the cap changes nothing (duckdb replay of the
    generated oracle at k and k+1). A fixed 6-round heuristic was
    measured insufficient at sf0.001 — hence the |V|−1 cap."""
    import duckdb

    from manual_data_ingest_spark.operators.graph import (_SSSP_ITERS,
                                                          _sssp_oracle)
    from tests.oracle_check import duckdb_connect

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        con = duckdb_connect(sf_dir)
        a = sorted(map(tuple, con.execute(
            _sssp_oracle(_SSSP_ITERS)).fetchall()))
        b = sorted(map(tuple, con.execute(
            _sssp_oracle(_SSSP_ITERS + 1)).fetchall()))
        assert a == b, f"{sf_dir}: SSSP not converged at {_SSSP_ITERS} rounds"


def test_token_shard_balance():
    """pipeline_token_shard's serpentine deal must actually balance:
    per source, max/min shard token totals within 5% at every fixture
    SF (duckdb replay; the whole point of ranking before dealing)."""
    import duckdb

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        con = duckdb.connect()
        rows = con.execute(f"""
          WITH toks AS (
            SELECT source, doc_id,
                   len(string_split(text, ' '))::BIGINT AS n_tok
            FROM '{sf_dir}/documents.parquet'
          ), ranked AS (
            SELECT source, n_tok,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_tok DESC, doc_id) - 1 AS r
            FROM toks
          )
          SELECT source,
                 CASE WHEN (r // 8) % 2 = 0 THEN r % 8
                      ELSE 7 - (r % 8) END AS shard,
                 sum(n_tok) AS tot
          FROM ranked GROUP BY 1, 2""").fetchall()
        per_source = {}
        for src, shard, tot in rows:
            per_source.setdefault(src, []).append(int(tot))
        checked = 0
        for src, tots in per_source.items():
            # balance is only meaningful with enough serpentine blocks:
            # ≥10 docs/shard (sf0.001 has ~2 docs/source — skip)
            if len(tots) == 8 and sum(tots) and min(tots) > 0:
                n_docs = con.execute(f"""
                  SELECT count(*) FROM '{sf_dir}/documents.parquet'
                  WHERE source = ?""", [src]).fetchone()[0]
                if n_docs < 80:
                    continue
                ratio = max(tots) / min(tots)
                assert ratio <= 1.05, (sf_dir, src, ratio)
                checked += 1
        if sf_dir.endswith("sf0.1"):
            assert checked > 0


def test_holt_fold_matches_python_replay(spark):
    """win_holt_linear's struct fold must be BIT-EXACT against a pure-
    Python replay of the same IEEE op sequence over the same monthly
    series (the win_macd verification, pinned as a test): duckdb
    derives the exact-cents series, Python runs l/b with float
    arithmetic, and the 6dp-rounded triple must equal the operator's
    output exactly — any reassociation inside F.aggregate would show
    up as a last-bit flip straddling a rounding boundary eventually."""
    import duckdb
    import math

    import __spark_entry__ as E
    from tests.conftest import SF_ORACLE

    con = duckdb.connect()
    series = con.execute(f"""
        SELECT o_orderpriority, date_trunc('month', o_orderdate) AS mo,
               sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT) AS c
        FROM read_parquet('{SF_ORACLE}/orders.parquet')
        WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
              AND o_totalprice IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    by_pri: dict[str, list[float]] = {}
    for pri, _, c in series:
        by_pri.setdefault(pri, []).append(float(c) / 100.0)

    def rnd6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    expected = {}
    alpha, beta = 1.0 / 5.0, 1.0 / 10.0
    for pri, xs in by_pri.items():
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[1:]:
            ln = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (ln - l) + (1.0 - beta) * b
            l = ln
        expected[pri] = (len(xs), rnd6(l), rnd6(b), rnd6(l + b))

    got = {r["priority"]: (r["n_months"], r["level"], r["trend"],
                           r["forecast_next"])
           for r in E.queries()["win_holt_linear"](spark, SF_ORACLE)
           .collect()}
    assert got == expected
