#!/usr/bin/env python
"""Full-registry KEY-SKEW oracle sweep — the distribution gate.

Sixth member of the mutation-gate family (null / adversarial-text /
extreme-numerics / temporal-edge / boundary-tie). The first five
mutate values and inter-row distances; none mutates KEY FREQUENCY —
yet a 100 TB corpus is power-law in every key (one bot user owns a
third of the event stream, one crawl source half the documents, one
template text a fifth of the corpus). On a deterministic row schedule
this gate plants heavy hitters:

- events.user_id:    j%3==0 → the hot user (≈33% of all events) —
                     sessions, funnels, per-user asof joins, markov
                     chains all grow one giant key group
- events.event_type: j%7∈{0,1} → 'click' (dominant type)
- orders.o_custkey:  j%3==0 → the hot customer — the customer⋈orders
                     equi-join carries a skewed build/probe key
- lineitem.l_suppkey: j%4==0 → the hot supplier (supplier rollups)
- customer.c_nationkey: j%2==0 → one hot nation (regional rollups)
- documents.text:    j%5==r → one of 3 template texts (three ~3%
                     mega near-dup clusters: shingle postings, minhash
                     bands, simhash buckets all develop a hot bucket —
                     the regime posting-caps and band blocking exist
                     for; the UNCAPPED twins must still answer
                     exactly, just slower)
- documents.source:  j%2==0 → 'common_crawl' (hot source for the
                     mint/offset and per-source rollup family)
- embeddings.embedding: j%5==0 → one fixed vector (an ANN bucket that
                     holds 20% of the corpus; exact-dup cosine ties
                     stress tie-broken top-k ordering)

Parity must be INVARIANT to distribution: both engines see the same
skewed data, so any diverger is a real bug (a cap/blocking shortcut
whose dropped candidates the oracle keeps, a per-key assumption that
ties break differently in a giant group). Plan behavior under the
same skew is measured separately (join_skew_salted / join_skew_aqe
and SCALE.md) — this gate grades ANSWERS.

Known-divergent remainder: NONE — first full run (r9) found 2 real
divergers, both burned down to exact contracts the same session:
`sim_bm25_topk` ranked on an accumulation-order-sensitive float
group-sum (identical template docs tie exactly in DuckDB, one ulp
apart in Spark — rank now orders on the 6dp-rounded score, PARITY
#58a) and `text_js_divergence` built per-source totals as FILTERED
frames (empty when a source vanishes → cross join annihilates the
grid where the oracle's scalar subquery NULLs — now conditional-sum
one-row aggregates, PARITY #58b). Re-run after fixes: 442/442.
Per-commit net: tests/test_empty_input.py::test_key_skew_oracle_exact.
Any future diverger is a regression, not an adjudication candidate.

Usage:  python tools/skew_sweep.py            # build + sweep
        python tools/skew_sweep.py NAME ...   # subset
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = "/tmp/mdis_skew_sweep"

TEMPLATES = [
    "the quick brown fox jumps over the lazy dog again and again",
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
    "all work and no play makes jack a dull boy all work no play",
]
HOT_VECTOR = [0.125] * 64


def _first_non_null(col):
    for v in col:
        if v is not None:
            return v
    return None


def _plant(vals: list, schedule, hot):
    """hot may be a value or a callable j -> value."""
    out = []
    for j, v in enumerate(vals):
        if v is not None and schedule(j):
            out.append(hot(j) if callable(hot) else hot)
        else:
            out.append(v)
    return out


def build_fixture(src: str = "/root/testdata/sf0.001",
                  dst: str = FIXTURE) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    plans = {
        "events.parquet": {
            "user_id": (lambda j: j % 3 == 0, _first_non_null),
            "event_type": (lambda j: j % 7 in (0, 1), "click"),
        },
        "orders.parquet": {
            "o_custkey": (lambda j: j % 3 == 0, _first_non_null),
        },
        "lineitem.parquet": {
            "l_suppkey": (lambda j: j % 4 == 0, _first_non_null),
        },
        "customer.parquet": {
            "c_nationkey": (lambda j: j % 2 == 0, _first_non_null),
        },
        "documents.parquet": {
            "text": (lambda j: j % 5 == 0,
                     lambda j: TEMPLATES[(j // 5) % len(TEMPLATES)]),
            "source": (lambda j: j % 2 == 0, "common_crawl"),
        },
        "embeddings.parquet": {
            "embedding": (lambda j: j % 5 == 0, lambda j: HOT_VECTOR),
        },
    }
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(f"{src}/{f}")
        plan = plans.get(f)
        if plan:
            cols = []
            for name, typ in zip(t.column_names, t.schema.types):
                col = t.column(name)
                if name in plan:
                    schedule, hot = plan[name]
                    vals = col.to_pylist()
                    if hot is _first_non_null:
                        hot = _first_non_null(vals)
                    cols.append(pa.array(_plant(vals, schedule, hot),
                                         type=typ))
                else:
                    cols.append(col)
            t = pa.table(cols, names=t.column_names)
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
