"""Cross-engine bit-reproducible rounding.

Native ``round()`` diverges between Spark and DuckDB exactly on decimal
ties: Spark rounds HALF_UP on the exact binary expansion of the double,
DuckDB computes ``std::round(x * 10^d) / 10^d``. Fixture prices are 2dp
decimals, so per-row products land on ``.xx5`` ties constantly (observed:
project_compute diverged by 0.01 on ~1/20k rows at sf0.01).

Fix: express rounding as explicit IEEE arithmetic — ``floor(x*10^d + 0.5)
/ 10^d``. Multiply, add, floor, divide are all exactly-specified IEEE-754
ops, so both engines produce bit-identical doubles. Half-up-toward-+inf
for negatives; fine for money/scores.

Use :func:`rnd` in Spark code and :func:`sql_rnd` in the oracle SQL twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, digits: int = 2) -> Column:
    """Deterministic cross-engine round-half-up of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    m = float(10 ** digits)
    return F.floor(c * m + F.lit(0.5)) / m


def sql_rnd(expr: str, digits: int = 2) -> str:
    """DuckDB twin of :func:`rnd` — paste into oracle SQL."""
    m = float(10 ** digits)
    return f"floor(({expr}) * {m} + 0.5) / {m}"
