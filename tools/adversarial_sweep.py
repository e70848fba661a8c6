#!/usr/bin/env python
"""Full-registry adversarial-TEXT oracle sweep — the string-edge gate.

The null sweep (tools/null_sweep.py) proved that fixture mutation is
the repo's highest-bug-yield check: inject a value class the standard
fixture never exercises, run EVERY registered operator through the
driver-faithful oracle harness, and every diverger is a real
cross-engine semantics question. This tool applies the same discipline
to STRING content. Every string column of every table gets, on a
deterministic row schedule (row j, per column):

  j % 11 == 2  -> original + a non-ASCII suffix (accents, CJK,
                  Cyrillic, astral-plane emoji — cycled)
  j % 11 == 5  -> empty string "" (NOT NULL — the null sweep owns NULL)
  j % 11 == 7  -> whitespace-only "  \t "
  j % 11 == 9  -> embedded structural chars: double quote, comma,
                  newline, tab, backslash ('he said "a,b"\\nline2\\tend\\')

Divergence classes this exercises that neither the standard fixture
nor the null fixture can: codepoint-vs-byte length semantics, unicode
case mapping, regex classes on non-ASCII, CSV/JSON quoting and escape
round-trips (scan_csv_roundtrip / scan_csv_multiline / sink_manifest_tsv
write these values and read them back), JSON parse failure on a
corrupted props column, empty-vs-whitespace tokenization, string sort
order of mixed-script values, md5-of-UTF-8, split/trim semantics.

Known-divergent remainder: NONE — 440/440 as of late r8. First run
found 29 divergers; every one was burned down to an exact contract
(burn-down record in the round log, SURVEY.md; engine facts in
PARITY.md #44-#50). The per-commit pytest subset is
tests/test_empty_input.py::test_adversarial_text_oracle_exact
(ADVERSARIAL_ORACLE_EXACT — the 29 once-divergent ops); this sweep is
the exhaustive close gate. Any future diverger is a regression, not
an adjudication candidate.

Usage:  python tools/adversarial_sweep.py            # build + sweep
        python tools/adversarial_sweep.py NAME ...   # subset
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = "/tmp/mdis_adversarial_sweep"

#: cycled non-ASCII suffixes — mild, real-world classes (no unpaired
#: surrogates, no zero-width trickery: the goal is cross-engine parity
#: on content a 100 TB web corpus actually contains)
UNICODE_SAMPLES = [
    "héllo wörld", "日本語テスト", "🚀🔥 emoji", "кириллица",
    "naïve café", "综合数据", "Ümläut ß", "한국어 텍스트",
]
STRUCTURAL = 'he said "a,b"\nline2\tend\\'


def _mutate(texts: list, colname: str) -> list:
    out = []
    for j, v in enumerate(texts):
        m = j % 11
        if v is None:
            out.append(v)
        elif m == 2:
            out.append(f"{v} {UNICODE_SAMPLES[j % len(UNICODE_SAMPLES)]}")
        elif m == 3 and colname == "props":
            # regex-passing-but-INVALID JSON under the r8 guard (r9
            # advice): Jackson leniently extracts from these, yyjson
            # rejects them — the strict flat-object grammar regex must
            # NULL them on BOTH engines. Cycle six classes: trailing
            # garbage ending in '}', concatenated objects, a trailing
            # comma (valid to yyjson only), a DUPLICATED key
            # (grammar-valid; engines split three ways — the key-once
            # contract leg owns it), and the two r10 grammar-tighten
            # classes (r9 advice, medium): a leading-zero number and a
            # raw control char inside a string value.
            out.append([f"{v} junk}}", f"{v}{{\"x\":1}}",
                        (v[:-1] + ",}") if v.endswith("}") else v,
                        (v[:-1] + ', "k": 9}') if v.endswith("}") else v,
                        '{"k": 012}', '{"s":"a\nb", "k": 4}']
                       [j % 6])
        elif m == 5:
            out.append("")
        elif m == 7:
            out.append("  \t ")
        elif m == 9:
            out.append(f"{v} {STRUCTURAL}")
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
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                cols.append(pa.array(_mutate(col.to_pylist(), name),
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
