"""Shared Spark fixture for the test suite.

Mirrors the reference's test harness (``Meta_Guideline.md:3708-3715``:
local session, tiny shuffle partitioning) — small local[4] session,
UTC, AQE on, shuffle.partitions=4 so window/agg plans exercise real
exchanges without 200-partition overhead.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from aws_medallion_etl_spark import get_spark

    import tempfile

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # static conf: needed by bucketed-table tests (saveAsTable)
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
