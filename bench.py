#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], one warmup + N timed
runs each, and prints ONE JSON line:

    {"metric": "...", "value": <total median sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, "duckdb": {...}, "ratio": {...}}

DuckDB comparator numbers (same parquet, same machine) ride along in
extra keys so every round records the ratio the acceptance bound cares
about (Spark ≤ 2× DuckDB per query at sf0.1).
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
    "dedup_near_jaccard",   # shingle inverted-index posting lists
    "dedup_simhash",        # simhash bit-sums + chunk-blocked pairs
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


def _sf_from_dir(d: str) -> float:
    name = os.path.basename(d.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


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


def bench_spark() -> tuple[dict[str, float], float]:
    from manual_data_ingest_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("mdis-bench")
    qs = E.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]

        def run() -> float:
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if df.isStreaming:  # pragma: no cover — streaming ops return batch
                df.count()
            else:
                df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        run()  # warmup
        times[name] = round(statistics.median(run() for _ in range(TIMED_RUNS)), 4)
    return times, measure_floor(spark)


def bench_duckdb() -> dict[str, float]:
    import duckdb
    import __spark_entry__ as E

    oracles = E.oracle_sql()
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{name}.parquet')")
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
    return times


def main() -> None:
    spark_times, floor = bench_spark()
    duck_times = bench_duckdb()
    ratio = {k: round(spark_times[k] / duck_times[k], 2)
             for k in spark_times if k in duck_times and duck_times[k] > 0}
    # the above-floor ratio subtracts Spark's fixed local-mode per-query
    # cost (measured, not assumed — see measure_floor): the throughput
    # comparison that survives scale-up, per BASELINE.md's floor analysis
    ratio_above_floor = {
        k: round(max(spark_times[k] - floor, 0.0001) / duck_times[k], 2)
        for k in spark_times if k in duck_times and duck_times[k] > 0}
    # deliberately-kept strategy-comparison twins: NOT the engine's
    # default answer for their task (sim_threshold_expr exists to record
    # the measured expression-vs-BLAS gap; sim_threshold_pairs is the
    # default). The headline total/median keep the full canonical set
    # for cross-round comparability; the *_default keys show the
    # engine's actual strategy performance.
    twins = {"sim_threshold_expr"}
    default_ratios = [v for k, v in ratio.items() if k not in twins]
    out = {
        "metric": "headline query wall time, Spark local vs DuckDB comparator",
        "value": round(sum(spark_times.values()), 4),
        "unit": "sec",
        "queries": spark_times,
        "sf": _sf_from_dir(SF_DIR),
        "duckdb": duck_times,
        "ratio": ratio,
        "spark_query_floor_sec": floor,
        "ratio_above_floor": ratio_above_floor,
        "median_ratio": round(statistics.median(ratio.values()), 2),
        "median_ratio_default_paths": round(
            statistics.median(default_ratios), 2),
        "value_default_paths": round(
            sum(v for k, v in spark_times.items() if k not in twins), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
