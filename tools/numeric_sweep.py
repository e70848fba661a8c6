#!/usr/bin/env python
"""Full-registry extreme-NUMERICS oracle sweep — the value-edge gate.

Third member of the mutation-gate family (tools/null_sweep.py: NULLs;
tools/adversarial_sweep.py: string edges). Every numeric non-key
column of every table gets, on a deterministic row schedule (row j,
per column):

  j % 13 == 3  -> 0        (zero: division/log/variance guards)
  j % 13 == 6  -> negated  (-v - 7 ints, -v - 1.25 floats: sign
                  classes — pmod vs %, first-digit extraction, sqrt/ln
                  domains, floor-rounding of negative halves)
  j % 13 == 9  -> large    (9973 ints, 876543.21 floats — kept INSIDE
                  the repo's exact-integer-moment envelopes on purpose:
                  the goal is semantic divergence, not engineered
                  int64 overflow at fixture scale)

Divergence classes this exercises that the null/text gates cannot:
Spark's F.pmod (always positive) vs SQL % (sign of dividend) on
negative keys, sqrt/log of non-positive arguments (NaN vs NULL vs
error), Benford/first-digit logic on signed and zero values,
zero-variance and zero-denominator guards under values the standard
fixture never produces, and negative-half floor rounding.

Known-divergent remainder: NONE — 440/440 as of late r8. First run
found 8 divergers, all real and all fixed (PARITY #51-#53): Spark's
floor() silently SATURATING money to long_min/10^d at ±2^63 (the
shared rounder now floors in doubles — a data-CORRUPTION class, worse
than a crash), two bigint-multiplication overflow ABORTS (both
engines error rather than promote; DECIMAL/HUGEINT factors now),
pmod-vs-% on negative keys (2 ops), and double-sum accumulation-order
divergence at magnitudes the 2dp-clean standard fixture never reaches
(exact-integer moment forms for Q1-shape revenue sums and the pandas
z-score). Per-commit net: tests/test_empty_input.py::
test_numeric_edge_oracle_exact (NUMERIC_ORACLE_EXACT). Any future
diverger is a regression, not an adjudication candidate.

Usage:  python tools/numeric_sweep.py            # build + sweep
        python tools/numeric_sweep.py NAME ...   # subset
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = "/tmp/mdis_numeric_sweep"

#: key/identity columns stay untouched (same contract as the null
#: sweep) — mutating identity breaks fixture construction invariants
#: (uniqueness) rather than exercising value semantics
KEYCOLS = {"doc_id", "vec_id", "event_id", "o_orderkey", "l_orderkey",
           "l_linenumber", "c_custkey", "s_suppkey", "p_partkey",
           "n_nationkey", "r_regionkey", "user_id", "ts"}


def _mutate_ints(vals: list) -> list:
    out = []
    for j, v in enumerate(vals):
        m = j % 13
        if v is None:
            out.append(v)
        elif m == 3:
            out.append(0)
        elif m == 6:
            out.append(-v - 7)
        elif m == 9:
            out.append(9973)
        else:
            out.append(v)
    return out


def _mutate_floats(vals: list) -> list:
    out = []
    for j, v in enumerate(vals):
        m = j % 13
        if v is None:
            out.append(v)
        elif m == 3:
            out.append(0.0)
        elif m == 6:
            out.append(-v - 1.25)
        elif m == 9:
            out.append(876543.21)
        else:
            out.append(v)
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
            if name in KEYCOLS:
                cols.append(col)
            elif pa.types.is_integer(typ):
                cols.append(pa.array(_mutate_ints(col.to_pylist()),
                                     type=typ))
            elif pa.types.is_floating(typ):
                cols.append(pa.array(_mutate_floats(col.to_pylist()),
                                     type=typ))
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
