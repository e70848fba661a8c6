"""Property-based invariants (SURVEY.md §5.4) via hypothesis.

Each property drives the engine's real transforms on generated inline
DataFrames. Example counts are kept small — every example is a Spark
job; the value is in the invariant, not the volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import Window

SETTINGS = dict(max_examples=12, deadline=None,
                suppress_health_check=list(HealthCheck))

texts = st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=20), min_size=0, max_size=12)


def _dedup(df):
    """The dedup_exact core: keep min id per normalized-text digest."""
    w = Window.partitionBy("d").orderBy("id")
    return (df.withColumn("d", F.md5(F.lower(F.trim("t"))))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select("id", "t", "d"))


@settings(**SETTINGS)
@given(ts=texts)
def test_dedup_idempotent_and_minimal(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), "id long, t string") \
        if ts else spark.createDataFrame([], "id long, t string")
    once = _dedup(df)
    twice = _dedup(once.select("id", "t"))
    a = sorted((r.id, r.t) for r in once.collect())
    b = sorted((r.id, r.t) for r in twice.collect())
    assert a == b  # idempotent
    # exactly one survivor per normalized text, and it's the min id
    norm = {}
    for i, t in enumerate(ts):
        norm.setdefault(t.lower().strip(), i)
    assert sorted(i for i, _ in a) == sorted(norm.values())


@settings(**SETTINGS)
@given(xs=st.lists(st.integers(0, 5), min_size=0, max_size=20),
       ys=st.lists(st.integers(0, 5), min_size=0, max_size=20))
def test_union_all_count_additive_and_join_bounds(spark, xs, ys):
    a = spark.createDataFrame([(x,) for x in xs] or [], "k int")
    b = spark.createDataFrame([(y,) for y in ys] or [], "k int")
    assert a.unionByName(b).count() == len(xs) + len(ys)
    semi = a.join(b, "k", "left_semi").count()
    inner = a.join(b, "k").count()
    assert semi <= inner <= len(xs) * len(ys) or (inner == 0)
    # anti + semi partition the left side's distinct reach over rows
    anti = a.join(b, "k", "left_anti").count()
    assert semi + anti == len(xs)


@settings(**SETTINGS)
@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                     min_size=1, max_size=25))
def test_window_rank_properties(spark, rows):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v int, id int")
    w = Window.partitionBy("k").orderBy("v", "id")
    out = df.select("k", F.row_number().over(w).alias("rn"),
                    F.rank().over(w).alias("rk"),
                    F.dense_rank().over(w).alias("dr")).collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r.k, []).append(r)
    for rs in by_k.values():
        rns = sorted(x.rn for x in rs)
        assert rns == list(range(1, len(rs) + 1))  # row_number is a permutation
        for x in rs:
            assert x.dr <= x.rk <= x.rn
