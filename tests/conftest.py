"""Shared Spark session for the test suite (SURVEY.md §0.3 env facts)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("crawlspark-tests")
        # Tiny fixtures: AQE's re-planning jobs cost more than they save here
        # (measured 2-3x round latency); bench.py enables AQE at real scale.
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .getOrCreate()
    )
    yield s
    s.stop()
