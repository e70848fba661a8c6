"""Every registered query must run at sf0.001 — the smallest fixture,
where groups go empty, joins find no matches, and windows see single
rows. The oracle sweep covers sf0.01 and (manually, per round) sf0.1;
this guards the downward direction. One failure message lists every
broken operator, not just the first.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # fleet-sweep tier (pytest.ini)

import __spark_entry__ as E
from tests.conftest import SF_SMALL


def test_every_query_runs_at_smallest_sf(spark):
    failures = []
    for name, fn in E.queries().items():
        try:
            n = fn(spark, SF_SMALL).count()
            assert n >= 0
        except Exception as exc:  # collect all, report once
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)
