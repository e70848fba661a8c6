#!/usr/bin/env python
"""Full-registry temporal-edge oracle sweep — the date/time gate.

Fourth member of the mutation-gate family (null / adversarial-text /
extreme-numerics). Every temporal column (events.ts, l_shipdate,
o_orderdate) gets, on a deterministic row schedule (row j):

  j % 17 == 4  -> 1904-02-29T07:31:04.123456  (pre-epoch LEAP DAY:
                  negative epoch seconds exercise floor-vs-truncate
                  division, pre-epoch date_trunc/dayofweek/extract)
  j % 17 == 8  -> 2199-12-31T23:59:59.999999  (far future, end-of-day
                  µs boundary; inside pandas' ns range so the harness
                  itself stays exact)
  j % 17 == 12 -> 1970-01-01T00:00:00         (epoch zero)

A 100 TB corpus contains garbage 1900s dates and far-future
placeholders constantly; the divergence classes this exercises:
truncating `div` (Spark) vs flooring `//` (DuckDB) on negative
epochs, pre-epoch week/day-of-week origins, date_trunc and unix_*
conversions below zero, window/session bucketing across the epoch,
and the µs end-of-day boundary (PARITY #20's class at the far end).

Known-divergent remainder: NONE — 440/440 as of late r8. First run
found 9 divergers, all real (PARITY #54-#56): DuckDB's integer `//`
and `date_diff('week')` TRUNCATE toward zero / lose a week across the
epoch where Spark floors (all day/window buckets now use the exact
positive-mod floored spelling on both engines — functions/rounding.py
epoch_day and its oracle twin); Spark's event-time watermark
INITIALIZES AT EPOCH 0 (pre-1970 events are born late) and one
far-future event poisons it for the whole stream — the watermarked
streaming ops now gate event time at ingest (_VALID_TS_SQL, both
engines); Spark's date_add returns DATE and silently truncates
time-of-day (interval addition now); win_twap's cents·µs product
overflows int64 on multi-century gaps (DECIMAL/HUGEINT). Per-commit
net: tests/test_empty_input.py::test_temporal_edge_oracle_exact.
Any future diverger is a regression, not an adjudication candidate.

Usage:  python tools/temporal_sweep.py            # build + sweep
        python tools/temporal_sweep.py NAME ...   # subset
"""

from __future__ import annotations

import datetime as dt
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = "/tmp/mdis_temporal_sweep"

EDGES = {
    4: dt.datetime(1904, 2, 29, 7, 31, 4, 123456),
    8: dt.datetime(2199, 12, 31, 23, 59, 59, 999999),
    12: dt.datetime(1970, 1, 1, 0, 0, 0),
}


def _mutate(vals: list) -> list:
    out = []
    for j, v in enumerate(vals):
        if v is None:
            out.append(v)
        else:
            out.append(EDGES.get(j % 17, v))
    return out


def build_fixture(src: str = "/root/testdata/sf0.001",
                  dst: str = FIXTURE) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(f"{src}/{f}")
        cols = []
        for name, typ in zip(t.column_names, t.schema.types):
            col = t.column(name)
            if pa.types.is_timestamp(typ):
                cols.append(pa.array(_mutate(col.to_pylist()), type=typ))
            else:
                cols.append(col)
        pq.write_table(pa.table(cols, names=t.column_names),
                       f"{dst}/{f}")
    return dst


def main() -> None:
    from tests.oracle_check import run_all

    only = sys.argv[1:] or None
    sf_dir = build_fixture()
    results = run_all(sf_dir=sf_dir, only=only)
    bad = [(r.name, r.detail[:110]) for r in results if not r.ok]
    for name, detail in bad:
        print(f"BAD {name}: {detail}")
    print(f"SUMMARY: {len(results) - len(bad)}/{len(results)} OK "
          f"({len(bad)} divergent)")


if __name__ == "__main__":
    main()
