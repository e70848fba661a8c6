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

    Spark's native ``floor()`` returns LONG and silently SATURATES at
    ±2^63 — the numeric-edge sweep caught money collapsing to
    long_min/10^d — while DuckDB's floor stays DOUBLE. The guard keeps
    the cheap long floor on the common path (|x| ≤ 9e15, inside 2^53
    where long floor == double floor exactly) and switches to the
    double form ``x − pmod(x, 1)`` beyond it (pmod's remainder is
    non-negative, so the subtraction IS floor for either sign; above
    2^53 pmod(x,1)=0 and floor(x)=x on both engines). A/B-measured
    zero overhead vs the raw long floor; the branchless double form
    alone cost ~2.3× on a 600k-row projection.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = float(10 ** digits)
    x = c * m + F.lit(0.5)
    fl = F.when(x.between(-9.0e15, 9.0e15), F.floor(x).cast("double")) \
          .otherwise(x - F.pmod(x, F.lit(1.0)))
    return fl / m


def sql_rnd(expr: str, digits: int = 2) -> str:
    """DuckDB twin of :func:`rnd` — paste into oracle SQL."""
    m = float(10 ** digits)
    return f"floor(({expr}) * {m} + 0.5) / {m}"


def floordiv_long(col: Column, divisor: int) -> Column:
    """EXACT floored integer division of a long column — the Spark twin
    of DuckDB's ``//`` on BIGINTs.

    The naive ``(x / lit(d)).cast("long")`` is wrong twice (temporal-
    edge sweep): Spark's ``/`` is DOUBLE division, so (a) the cast
    TRUNCATES toward zero where ``//`` floors — off by one on every
    negative input — and (b) the double quotient can round UP across
    an integer boundary when the remainder is within half an ulp
    (measured: the last µs before a far-future midnight lands in the
    next day). ``x − pmod(x, d)`` is an exact long multiple of d, so
    the one division is exact and sign-correct.
    """
    r = F.pmod(col, F.lit(divisor))
    return ((col - r) / F.lit(divisor)).cast("long")


#: µs per day — the shared day-bucket divisor. Oracle twin: the
#: positive-mod spelling `(epoch_us(ts) − ((epoch_us(ts) % d) + d) % d)
#: // d` — NOT a bare `// d`: DuckDB's integer `//` TRUNCATES toward
#: zero (probed: −7 // 2 = −3), so pre-epoch timestamps would bucket
#: off-by-one against this helper's floor (temporal-edge sweep).
US_PER_DAY = 86400000000


def epoch_day(ts_col: Column) -> Column:
    """Floored epoch-day bucket of a timestamp column (µs precision)."""
    return floordiv_long(F.unix_micros(ts_col), US_PER_DAY)
