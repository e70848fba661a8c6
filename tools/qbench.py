#!/usr/bin/env python
"""Per-query micro-bench for plan A/B work (not the canonical bench).

Usage: python3 tools/qbench.py [--scale N] name [name ...]
Times each named registry query cold (fresh plan each run, median of 3
timed runs after 1 warmup) under the exact bench.py session config at
the given replica scale. Prints one line per query.
"""
from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from manual_data_ingest_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("mdis-qbench")
    base = int(os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"])
    spark.conf.set("spark.sql.shuffle.partitions", str(base * args.scale))
    if args.scale == 1:
        sf_dir = SF_DIR
    else:
        from tests.make_replicas import build
        sf_dir = f"/tmp/mdis_bench_{args.scale}x"
        build(args.scale, SF_DIR, sf_dir)

    qs = E.queries()
    for name in args.names:
        fn = qs[name]

        def run() -> float:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        run()
        times = [run() for _ in range(args.runs)]
        print(f"{name:32s} median={statistics.median(times):.4f} "
              f"all={[round(t, 4) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
