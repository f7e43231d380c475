"""Shared fixtures: one local SparkSession per test run."""

from __future__ import annotations

import pytest

from geedim_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("geedim_spark_tests", master="local[4]",
                    extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
