#!/usr/bin/env python
"""16x/64x replica stress runs for the weak-15 headline queries.

Usage: python3 tools/stress_scale.py SCALE [name ...]

Builds (or reuses) the /tmp/mdis_bench_{SCALE}x replica dir and times
each named registry query (default: the r11-verdict weak-15 list)
Spark-vs-DuckDB exactly like bench.py: noop sink, 1 warmup + median of
BENCH_RUNS (default 3), shuffle partitions scaled with the replica
multiplier. Prints one line per query plus a JSON tail — evidence rows
for SCALE.md (r11 verdict task 4: a floor-bound query at 1x that stays
work-bound ≤2x at 16x/64x is the scale argument, measured).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
os.environ.setdefault("SPARK_GRAFT_AUTO_BROADCAST", "2097152")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

#: the 15 default-path queries BENCH_r11 graded >2x (VERDICT.md weak list)
WEAK15 = [
    "flagship_q3", "agg_pricing_summary", "join_asof", "provenance_chain",
    "win_topk_group", "ingest_validate", "ingest_upsert_latest",
    "dedup_exact", "dedup_near_jaccard_capped", "dedup_simhash_wide",
    "sim_topk", "sim_ann_lsh", "text_wordcount", "stream_session",
    "pipeline_llm_prep",
]


def main() -> None:
    scale = int(sys.argv[1])
    names = sys.argv[2:] or WEAK15

    from manual_data_ingest_spark.session import get_spark
    import __spark_entry__ as E

    if scale == 1:
        sf_dir = SF_DIR
    else:
        from tests.make_replicas import build
        sf_dir = f"/tmp/mdis_bench_{scale}x"
        build(scale, SF_DIR, sf_dir)

    spark = get_spark("mdis-stress")
    base = int(os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"])
    spark.conf.set("spark.sql.shuffle.partitions", str(base * scale))

    qs, oracles = E.queries(), E.oracle_sql()

    import duckdb
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"stress{scale}x:{name}")

        def srun() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        srun()
        s = statistics.median(srun() for _ in range(RUNS))
        spark.sparkContext.setJobDescription(None)

        d = float("nan")
        if name in oracles:
            def drun() -> float:
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                return time.perf_counter() - t0

            drun()
            d = statistics.median(drun() for _ in range(RUNS))
        ratio = round(s / d, 2) if d == d and d > 0 else None
        out[name] = {"spark": round(s, 3), "duckdb": round(d, 3),
                     "ratio": ratio}
        print(f"{name:28s} spark={s:7.3f} duck={d:7.3f} ratio={ratio}",
              flush=True)
    print(json.dumps({"scale": scale, "results": out}))


if __name__ == "__main__":
    main()
