"""The bounded-partition window lint runs green as a CI pin.

tools/window_audit.py mechanizes the r10 manual partitionBy sweep
(r10 verdict task 3); running it inside pytest means a new bounded-key
window over unbounded input — or a whitelist entry gone stale, or a
primitive losing its block subkey — fails the suite instead of waiting
for a round judge. Static AST only: no SparkSession, milliseconds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import window_audit  # noqa: E402


def test_no_unaudited_bounded_partition_windows():
    sites = window_audit._sites()
    assert len(sites) > 100  # the scan actually found the fleet
    flagged, used = [], set()
    for rel, ln, op, keys, exprs in sites:
        cls = window_audit.classify(keys, exprs)
        if cls in ("entity", "block", "splat-counts"):
            continue
        wkey = (rel, op, tuple(sorted(keys + exprs)))
        if wkey in window_audit.WHITELIST:
            used.add(wkey)
            continue
        flagged.append((rel, ln, op, keys + exprs))
    assert flagged == [], flagged
    assert sorted(set(window_audit.WHITELIST) - used) == []


def test_block_pins_hold():
    sites = window_audit._sites()
    by_owner: dict = {}
    for rel, ln, op, keys, exprs in sites:
        by_owner.setdefault((rel, op), []).append(keys + exprs)
    broken = []
    for pin in sorted(window_audit.BLOCK_PINS):
        keysets = by_owner.get(pin, [])
        if not any(any(k in window_audit.BLOCK_KEYS for k in ks)
                   for ks in keysets):
            broken.append(pin)
    assert broken == []
