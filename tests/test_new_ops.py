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
    b = _rows(qs["sim_threshold_blas"](spark, SF_ORACLE))
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
    verify each approximate quantile's true rank is within bound."""
    from manual_data_ingest_spark.io import load_table

    got = {r.o_orderstatus: r
           for r in E.queries()["agg_approx_quantile"](spark, SF_ORACLE).collect()}
    orders = load_table(spark, SF_ORACLE, "orders") \
        .select("o_orderstatus", "o_totalprice").collect()
    by_status = {}
    for r in orders:
        by_status.setdefault(r.o_orderstatus, []).append(r.o_totalprice)
    for status, vals in by_status.items():
        vals.sort()
        n = len(vals)
        for p, attr in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            v = getattr(got[status], attr)
            import bisect
            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            target = p * n
            # true rank interval of v must be within n/1000 of target
            err = min(abs(lo - target), abs(hi - target))
            assert err <= n / 1000 + 1, (status, attr, err, n)


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

    got = E.queries()["agg_approx_distinct"](spark, SF_ORACLE).first()[0]
    exact = (load_table(spark, SF_ORACLE, "lineitem")
             .select("l_partkey").distinct().count())
    assert abs(got - exact) / exact < 0.15, (got, exact)


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
