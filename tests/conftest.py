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


@pytest.fixture(scope="session")
def crawl_run(spark, tmp_path_factory):
    """One full engine crawl shared by the smoke and oracle-equality suites:
    6-host depth-2 synthetic web, 20 seeds with canonicalization traps."""
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.sources import synthweb
    from crawlspark.storage import CrawlStorage

    cfg = CrawlConfig(max_depth=2, max_rounds=12, web_hosts=6, shuffle_partitions=4)
    storage = CrawlStorage(spark, tmp_path_factory.mktemp("crawl"))
    engine = CrawlEngine(spark, cfg, storage)
    seeds = synthweb.seed_list(cfg, n=20)
    summary = engine.run(seeds)
    return cfg, storage, engine, summary, seeds
