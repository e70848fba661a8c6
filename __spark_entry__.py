"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``manual_data_ingest_spark.registry``). The driver runs ``entry(spark)``
as a smoke check, then each ``queries()[name]`` at sf=0.01 compared
against ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from manual_data_ingest_spark.registry import all_oracles, all_queries  # noqa: E402
from manual_data_ingest_spark.session import ensure_engine_configs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_engine_configs(spark)
    return all_queries()["flagship_q3"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = all_queries()

    def _wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_configs(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: _wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracled query."""
    return all_oracles()
