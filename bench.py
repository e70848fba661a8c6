#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol), dual-scale since r3.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], one warmup + N timed
runs each, and prints ONE JSON line. Top-level keys keep the exact r1/r2
shape (cross-round comparability); the r2 verdict's ask — "promote the
4×-replica protocol to the canonical bench" — lands as a ``scales``
key: the SAME queries and the SAME DuckDB comparator run on 4× replica
dirs (tests/make_replicas.py: facts replicated with offset keys, dims
copied once). The ratio falls with data size at fixed plan because
Spark's per-query local-mode floor is constant while everything that
grows, grows slower than DuckDB's runtime — the 4× block is the
headline number for the 100 TB design claim; sf0.1 measures the floor.

    {"metric": ..., "value": <sf0.1 total sec>, "unit": "sec",
     "queries": {...}, "sf": 0.1, "duckdb": {...}, "ratio": {...},
     "median_ratio": ..., "scales": {"4x": {"queries": ..., "duckdb":
     ..., "ratio": ..., "median_ratio": ..., "queries_le_2x": ...}}}

Env knobs: BENCH_RUNS (timed runs/query, default 3), BENCH_SCALES
(comma list of replica multipliers, default "1,4"; "1" = plain sf dir).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TIMED_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
SCALES = [int(s) for s in os.environ.get("BENCH_SCALES", "1,4").split(",")]

# size shuffle partitions AND input splits to the benchmark SF
# (~100 MB at sf0.1): the BASELINE.md protocol's "partitions sized to
# the target SF" rule — measured 10-30% off the per-query floor
# (shuffle) and ~35% on scan-bound queries (splits; the fixture tables
# are single files, so default 128m splits give one scan task)
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
# third data-size knob (session.py): in one JVM, building+broadcasting
# a >2 MB hash relation loses to an 8-partition shuffle — measured
# full-bench A/B: total 14.6→13.5 s, wins on every join-bearing
# headline (q3 0.93→0.64). Explicit broadcast() hints are unaffected.
os.environ.setdefault("SPARK_GRAFT_AUTO_BROADCAST", "2097152")

#: headline queries — one per major operator family (SURVEY.md §2)
HEADLINE = [
    "flagship_q3",          # scan+filter+join+agg+topk
    "agg_pricing_summary",  # TPC-H Q1 hash agg
    "join_inner_equi",      # fact-dim join
    "join_asof",            # composed non-equi join
    "provenance_chain",     # 5-way join + rollup
    "win_topk_group",       # window group limit
    "win_moving_range",     # range-frame window
    "ingest_validate",      # multi-rule union
    "ingest_upsert_latest", # latest-wins upsert
    "dedup_exact",          # hash dedup (self-union)
    "dedup_near_jaccard",   # shingle posting lists, UNCAPPED (twin)
    "dedup_near_jaccard_capped",  # production path: posting-frequency cap
    "dedup_simhash",        # 32-bit simhash, 2^8 buckets (twin)
    "dedup_simhash_wide",   # production path: 60-bit fp, 2^15 buckets
    "sim_topk",             # broadcast probe brute-force baseline
    "sim_ann_lsh",          # sign-bit LSH bucketed ANN
    "sim_threshold_pairs",  # blocked similarity join, BLAS default (r2 swap)
    "sim_threshold_expr",   # same result, expression-path comparison twin
    "text_wordcount",       # explode + agg
    "text_fingerprint",     # rolling-hash windows (codegen expr stress)
    "multimodal_decode",    # mapInPandas Arrow binary batches
    "udf_pandas_scalar",    # Arrow UDF path
    "stream_session",       # streaming session windows
    "pipeline_llm_prep",    # end-to-end dedup+quality+lang manifest
]

#: deliberately-kept strategy-comparison twins: NOT the engine's
#: default answer for their task (each is the measured "what the naive
#: strategy costs" record beside its registered production sibling:
#: sim_threshold_expr vs sim_threshold_pairs' BLAS blocks,
#: dedup_near_jaccard's uncapped postings vs _capped / minhash,
#: dedup_simhash's 2^8 saturating buckets vs _wide's 2^15). Since r4
#: the production siblings are IN the headline set, so every family
#: still contributes to the default-paths median — the twin exclusion
#: stops charging the engine's score for queries whose docstrings say
#: "do not run this shape at scale". The headline total/median keep
#: the full set (twins included) for cross-round comparability; the
#: *_default keys show the engine's actual strategy performance.
TWINS = {"sim_threshold_expr", "dedup_near_jaccard", "dedup_simhash"}


def _sf_from_dir(d: str) -> float:
    name = os.path.basename(d.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _scale_dir(scale: int) -> str:
    """Fixture dir for a replica multiplier (1 = the plain sf dir)."""
    if scale == 1:
        return SF_DIR
    out = f"/tmp/mdis_bench_{scale}x"
    from tests.make_replicas import build  # idempotent (_COMPLETE marker)

    build(scale, SF_DIR, out)
    return out


def measure_floor(spark) -> float:
    """Spark local-mode fixed per-query cost, measured as a MINIMAL REAL
    query: parquet scan (5-row dim table) → shuffle aggregate → noop
    commit. A bare `range(1)` write measures only ~26 ms because it has
    no scan stage and no exchange; every benched query pays at least one
    of each, so this probe is the honest subtractable floor. Embedded
    DuckDB's equivalent is ~0, so sub-second ratios measure
    floor-vs-floor; `ratio_above_floor` subtracts this number
    (BASELINE.md floor analysis)."""
    from pyspark.sql import functions as F
    from manual_data_ingest_spark.io import load_table

    region = load_table(spark, SF_DIR, "region")

    def run() -> float:
        t0 = time.perf_counter()
        (region.groupBy("r_regionkey").agg(F.count("*").alias("n"))
         .write.mode("overwrite").format("noop").save())
        return time.perf_counter() - t0

    run()
    return round(statistics.median(run() for _ in range(5)), 4)


def bench_spark(spark, sf_dir: str) -> tuple[dict[str, float],
                                             dict[str, dict[str, int]]]:
    """Per-query median wall time plus job/stage counts (r11 verdict
    task 1: a floor-bound query is provably floor-bound when its cost
    is ~N stages × the per-stage scheduling constant, so the counts
    ship with the times). Counts come from the status tracker around
    one timed run; the warmup run before timing also builds every
    session-cached artifact (table plans, the LSH/IVF index
    checkpoints), so timed runs measure the query, not index builds."""
    import __spark_entry__ as E

    qs = E.queries()
    times: dict[str, float] = {}
    counts: dict[str, dict[str, int]] = {}
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    for name in HEADLINE:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench:{name}")

        def run() -> float:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if df.isStreaming:  # pragma: no cover — streaming ops return batch
                df.count()
            else:
                df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        run()  # warmup (also populates session caches — see docstring)
        before = set(tracker.getJobIdsForGroup(None))
        first = run()
        new_jobs = [j for j in tracker.getJobIdsForGroup(None)
                    if j not in before]
        n_stages = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info.isDefined():
                n_stages += len(info.get().stageIds())
        counts[name] = {"jobs": len(new_jobs), "stages": n_stages}
        rest = [run() for _ in range(TIMED_RUNS - 1)]
        times[name] = round(statistics.median([first] + rest), 4)
        spark.sparkContext.setJobDescription(None)
    return times, counts


def bench_duckdb(sf_dir: str) -> dict[str, float]:
    import duckdb
    import __spark_entry__ as E

    oracles = E.oracle_sql()
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):  # replica fixtures are part-file dirs
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{path}')")
    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in oracles:
            continue

        def run() -> float:
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            return time.perf_counter() - t0

        run()  # warmup
        times[name] = round(statistics.median(run() for _ in range(TIMED_RUNS)), 4)
    con.close()
    return times


def _ratios(spark_times: dict[str, float],
            duck_times: dict[str, float]) -> dict[str, float]:
    return {k: round(spark_times[k] / duck_times[k], 2)
            for k in spark_times if k in duck_times and duck_times[k] > 0}


def bench_scale(spark, scale: int) -> dict:
    sf_dir = _scale_dir(scale)
    # shuffle partitions track DATA SIZE (BASELINE.md protocol): 8 at
    # sf0.1, scaled with the replica multiplier — runtime-settable, so
    # one session serves every scale.
    base = int(os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"])
    spark.conf.set("spark.sql.shuffle.partitions", str(base * scale))
    spark_times, job_counts = bench_spark(spark, sf_dir)
    duck_times = bench_duckdb(sf_dir)
    ratio = _ratios(spark_times, duck_times)
    default_ratios = [v for k, v in ratio.items() if k not in TWINS]
    return {
        "dir": sf_dir,
        "queries": spark_times,
        "job_counts": job_counts,
        "duckdb": duck_times,
        "ratio": ratio,
        "median_ratio": round(statistics.median(ratio.values()), 2),
        "median_ratio_default_paths": round(
            statistics.median(default_ratios), 2),
        "value": round(sum(spark_times.values()), 4),
        "value_default_paths": round(
            sum(v for k, v in spark_times.items() if k not in TWINS), 4),
        "queries_le_2x": sum(1 for v in ratio.values() if v <= 2.0),
        "spark_wins": sum(1 for v in ratio.values() if v < 1.0),
    }


def main() -> None:
    from manual_data_ingest_spark.session import get_spark

    spark = get_spark("mdis-bench")
    per_scale = {f"{s}x": bench_scale(spark, s) for s in SCALES}
    # Reset shuffle partitions to the 1x base before probing the floor
    # (r3 advisor): the scale loop leaves base*last_scale set, and the
    # floor is subtracted from 1x numbers — it must pair with their
    # partition config for cross-round comparability.
    spark.conf.set("spark.sql.shuffle.partitions",
                   os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"])
    floor = measure_floor(spark)

    base = per_scale.get("1x") or per_scale[f"{SCALES[0]}x"]
    ratio_above_floor = {
        k: round(max(base["queries"][k] - floor, 0.0001) / base["duckdb"][k], 2)
        for k in base["queries"]
        if k in base["duckdb"] and base["duckdb"][k] > 0}
    out = {
        "metric": "headline query wall time, Spark local vs DuckDB comparator",
        "value": base["value"],
        "unit": "sec",
        "queries": base["queries"],
        "job_counts": base["job_counts"],
        "sf": _sf_from_dir(SF_DIR),
        "duckdb": base["duckdb"],
        "ratio": base["ratio"],
        "spark_query_floor_sec": floor,
        "ratio_above_floor": ratio_above_floor,
        "median_ratio": base["median_ratio"],
        "median_ratio_default_paths": base["median_ratio_default_paths"],
        "value_default_paths": base["value_default_paths"],
        "scales": {k: v for k, v in per_scale.items() if k != "1x"},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
