#!/usr/bin/env python
"""Full-registry boundary-tie oracle sweep — the exact-gap gate.

Fifth member of the mutation-gate family (null / adversarial-text /
extreme-numerics / temporal-edge). Those four mutate VALUES; none
injects exact INTER-ROW distances, which is how the r8 stream_session
bug (Spark merges sessions at exactly gap-distance, the oracle split)
survived all of them. This gate rewrites relationships:

- **events.ts**: each user's event timeline is rebuilt (order and
  per-user multiplicity preserved) so consecutive gaps cycle, phase-
  rotated by user_id, through every interval an operator declares:

      0 s        exact timestamp tie (asof/window tie-breaks)
      1 s        just past a tie
      600 s      the streaming watermark (10 min) exactly
      1800 s     the session gap (30 min) exactly  <- the r8 bug class
      3600 s     asof nearest/forward band + interval-overlap (1 h)
      7200 s     asof tolerance band (2 h) exactly
      86400 s    day-bucket / tumbling-window edge
      604800 s   7-day rolling-frame (win_rolling_wau/churn) edge

  Base times start 2024-01-01 + (user_id % 97) h: inside the declared
  streaming validity window [1990, 2100), so watermark ops see every
  row. The ±1 h nearest-asof band also creates exact-equidistant
  before/after candidates — any unpinned tie-break hash-diverges here.

- **supplier.s_acctbal**: row j%7∈{2,5} is planted exactly ±1000.0
  from o_totalprice[j] — join_band_bucketed's |o−s| ≤ 1000 edge. The
  blocked plan (δ-grid, explode ±1 bucket) must find boundary pairs
  the naive oracle theta-join finds.

A 100 TB corpus hits exact boundaries constantly (retry storms emit
identical timestamps; schedulers fire on round intervals), so "no
fixture row sits at the boundary" is not a defensible gate.

Usage:  python tools/boundary_sweep.py            # build + sweep all
        python tools/boundary_sweep.py NAME ...   # subset
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = "/tmp/mdis_boundary_sweep"

GAP_CYCLE_S = [0, 1800, 1, 3600, 600, 7200, 86400, 604800]
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in epoch µs


def _rebuild_events_ts(tbl):
    """Rewrite ts so each user's consecutive gaps walk GAP_CYCLE_S,
    phase-rotated by user_id. Original per-user order (ts, event_id)
    is preserved; all rewritten rows stay inside [1990, 2100)."""
    import numpy as np
    import pyarrow as pa

    ts_col = tbl.column("ts")
    ts_type = ts_type_orig = ts_col.type
    unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]

    df = tbl.select(["event_id", "user_id", "ts"]).to_pandas()
    order = np.lexsort((df["event_id"].to_numpy(), df["ts"].to_numpy(),
                        df["user_id"].to_numpy()))
    new_ts = np.empty(len(df), dtype="int64")
    users = df["user_id"].to_numpy()[order]
    k = len(GAP_CYCLE_S)
    cur_user, t_us, phase = None, 0, 0
    for pos in range(len(order)):
        idx = order[pos]
        u = users[pos]
        if u != cur_user:
            cur_user = u
            phase = int(u) % k
            t_us = BASE_US + (int(u) % 97) * 3_600_000_000
        else:
            t_us += GAP_CYCLE_S[phase % k] * 1_000_000
            phase += 1
        new_ts[idx] = (t_us * unit_per_s) // 10**6

    arr = pa.array(new_ts, type=pa.int64()).cast(
        pa.timestamp(ts_type_orig.unit))
    i = tbl.column_names.index("ts")
    return tbl.set_column(i, "ts", arr)


def _plant_band_edges(sup_tbl, orders_tbl):
    """supplier.s_acctbal rows j%7∈{2,5} := o_totalprice[j] ∓ 1000.0 —
    pairs exactly AT join_band_bucketed's band edge."""
    import pyarrow as pa

    bal = sup_tbl.column("s_acctbal").to_pylist()
    tp = orders_tbl.column("o_totalprice").to_pylist()
    for j in range(len(bal)):
        if bal[j] is None or j >= len(tp) or tp[j] is None:
            continue
        if j % 7 == 2:
            bal[j] = tp[j] - 1000.0
        elif j % 7 == 5:
            bal[j] = tp[j] + 1000.0
    i = sup_tbl.column_names.index("s_acctbal")
    return sup_tbl.set_column(
        i, "s_acctbal", pa.array(bal, type=sup_tbl.schema.field(i).type))


def build_fixture(src: str = "/root/testdata/sf0.001",
                  dst: str = FIXTURE) -> str:
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    orders = pq.read_table(f"{src}/orders.parquet")
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(f"{src}/{f}")
        if f == "events.parquet":
            t = _rebuild_events_ts(t)
        elif f == "supplier.parquet":
            t = _plant_band_edges(t, orders)
        pq.write_table(t, f"{dst}/{f}")
    return dst


def main() -> None:
    from tests.oracle_check import run_all

    only = sys.argv[1:] or None
    sf_dir = build_fixture()
    results = run_all(sf_dir=sf_dir, only=only)
    bad = [(r.name, r.detail[:140]) for r in results if not r.ok]
    for name, detail in bad:
        print(f"BAD {name}: {detail}")
    print(f"SUMMARY: {len(results) - len(bad)}/{len(results)} OK "
          f"({len(bad)} divergent)")


if __name__ == "__main__":
    main()
