"""Shared pytest fixtures: one engine SparkSession for the whole run.

Small local session (8 threads, 8 shuffle partitions) — unit tests run
on tiny data where scheduling overhead, not throughput, dominates.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from manual_data_ingest_spark.session import get_spark

    s = get_spark("mdis-tests", master="local[8]")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
