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
    """Deterministic cross-engine round-half-up of a double column.

    The floor is computed IN DOUBLES (x − fmod(x,1), minus 1 when the
    remainder is negative) rather than with Spark's ``floor()``:
    Spark's floor returns LONG and silently SATURATES at ±2^63 —
    the numeric-edge sweep caught values collapsing to
    long_min/10^d — while DuckDB's floor stays DOUBLE. The double
    form agrees with the long form everywhere in long range (fmod is
    exact for doubles) and with DuckDB's floor beyond it (above 2^53
    fmod(x,1)=0, so floor(x)=x on both engines).
    """
    c = F.col(col) if isinstance(col, str) else col
    m = float(10 ** digits)
    x = c * m + F.lit(0.5)
    fr = x % F.lit(1.0)
    return (x - fr - F.when(fr < 0, F.lit(1.0)).otherwise(F.lit(0.0))) / m


def sql_rnd(expr: str, digits: int = 2) -> str:
    """DuckDB twin of :func:`rnd` — paste into oracle SQL."""
    m = float(10 ** digits)
    return f"floor(({expr}) * {m} + 0.5) / {m}"
