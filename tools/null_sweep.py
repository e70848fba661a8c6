#!/usr/bin/env python
"""Full-registry null-injected oracle sweep — the round-close gate.

Builds the same null fixture as tests/test_empty_input.py's nulls_dir
(every non-key column NULL on every 10th row of sf0.001), then runs
EVERY registered operator through the driver-faithful oracle harness
against it. The pytest gate (tests/test_empty_input.py's
NULL_ORACLE_EXACT — count printed at run time, never hand-written) is
the per-commit subset; this sweep is the exhaustive version that found the
r6 ingest_clean_nulls cohort drop and the r7 batch (20 fixes: the
dedup null-text pairing blowup, manifest_diff presence confusion,
stream_stateful_running -inf leak, NULL-grouping-key join drops, null
sort-order divergences, format_string's "null" literal, the
binaryfile zero-byte skip).

Known-divergent remainder: NONE — the sweep is 440/440 as of late r8.
Every prior adjudicated class was burned down to an exact contract;
any future diverger is a regression, not an adjudication candidate.
  (Burn-down record: the ml-on-null-embeddings class — kmeans/knn/pca/
    sim_pq — was FIXED late r8: non-null vector/label contract on BOTH
    engines; ml_auc_roc joined the _SCORED_ONLY_SQL ranked-score
    family; the multimodal stubs now propagate decode(NULL) = NULL
    instead of coercing to b""; the two approx sketches became exact —
    approx_ok is vacuously TRUE for a group with zero non-null values,
    and a NULL event_type shard owns a sketch on both engines (bare
    count(DISTINCT) dropped it). The null-day time-series class —
    bollinger/survival/runs/acf — was FIXED r7: explicit non-null
    (day, value) series on both engines. flagship_q9 was FIXED r8:
    per-row BIGINT-cent quantization — the flagship_q11 rule —
    replaced the round-the-float-sum form whose group total sat
    exactly on a half-cent tie (577783.815). The CSV/JSON/partition
    format-null class was made EXECUTABLE r8 per the r7 verdict #5:
    the oracles of scan_csv_badrecords / scan_jsonl_badrecords /
    scan_schema_evolution / scan_manifest_pruned now state the
    designed null encoding, sink_merge_upsert's null-partition merge
    drop was a real bug fixed at the isin site, and all five joined
    NULL_ORACLE_EXACT.)

Usage:  python tools/null_sweep.py            # build + sweep
        python tools/null_sweep.py NAME ...   # subset
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = "/tmp/mdis_nulls_sweep"
KEYCOLS = {"doc_id", "vec_id", "event_id", "o_orderkey", "l_orderkey",
           "l_linenumber", "c_custkey", "s_suppkey", "p_partkey",
           "n_nationkey", "r_regionkey", "user_id", "ts"}


def build_fixture(src: str = "/root/testdata/sf0.001",
                  dst: str = FIXTURE) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(f"{src}/{f}")
        cols = []
        for i, cname in enumerate(t.column_names):
            col = t.column(i)
            if cname in KEYCOLS:
                cols.append(col)
                continue
            n = len(t)
            mask = pa.array([(j % 10) == 3 for j in range(n)])
            cols.append(pc.if_else(mask, pa.nulls(n, col.type),
                                   col.combine_chunks()))
        pq.write_table(pa.table(cols, names=t.column_names), f"{dst}/{f}")
    return dst


def main() -> None:
    from tests.oracle_check import run_all
    from tests.test_empty_input import NULL_ORACLE_EXACT

    print(f"per-commit pytest gate pins {len(NULL_ORACLE_EXACT)} ops "
          "hash-exact (tests/test_empty_input.py NULL_ORACLE_EXACT)")
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
