"""SURVEY.md §5 layers 4-5: resume-exactness after a mid-crawl kill, and
hot-domain skew + deletable-ban configs judged against the oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import oracle_crawler
from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.sources import synthweb
from crawlspark.storage import CrawlStorage


def _engine_state(storage):
    seen = {
        r["url_canon"] for r in storage.read_table("seen").select("url_canon").collect()
    }
    docs = (
        storage.read_table("documents")
        .select("round", "fetch_time", "host", "host_rank", "doc_id")
        .orderBy("round", "fetch_time", "host", "host_rank")
        .collect()
    )
    return seen, [(r["round"], r["doc_id"]) for r in docs]


def _assert_matches_oracle(storage, summary, cfg, seeds):
    res = oracle_crawler.crawl(cfg, seeds)
    seen, order = _engine_state(storage)
    assert seen == res.seen
    assert order == res.crawl_order
    assert summary["rounds"] == res.rounds


RESUME_CFG = CrawlConfig(max_depth=2, max_rounds=12, web_hosts=5, shuffle_partitions=4)


@pytest.fixture(scope="module")
def full_run(spark, tmp_path_factory):
    """One uninterrupted reference crawl shared by every resume test (each
    resume variant re-runs only its own interrupted half)."""
    cfg = RESUME_CFG
    seeds = synthweb.seed_list(cfg, n=15)
    store = CrawlStorage(spark, tmp_path_factory.mktemp("full-run"))
    summary = CrawlEngine(spark, cfg, store).run(seeds)
    return store, summary, cfg, seeds


def test_resume_exactness(spark, tmp_path, full_run):
    """Kill after round 2, resume with a fresh engine from the manifest —
    final tables must equal an uninterrupted run bit-for-bit
    (BASELINE.json:6,14 'resumes exactly')."""
    full_store, full_sum, cfg, seeds = full_run

    part_store = CrawlStorage(spark, tmp_path / "part")
    eng = CrawlEngine(spark, cfg, part_store)
    eng.bootstrap(seeds)
    eng.run_round(1)
    eng.run_round(2)
    # "crash": new engine + storage objects; state only from disk
    resumed_sum = CrawlEngine(
        spark, cfg, CrawlStorage(spark, tmp_path / "part")
    ).run()

    assert _engine_state(full_store) == _engine_state(
        CrawlStorage(spark, tmp_path / "part")
    )
    assert resumed_sum["rounds"] == full_sum["rounds"]
    assert resumed_sum["totals"] == full_sum["totals"]
    # resumed run skipped the already-committed rounds
    assert resumed_sum["rounds_run_this_session"] == full_sum["rounds"] - 2
    _assert_matches_oracle(full_store, full_sum, cfg, seeds)


def test_resume_overwrites_orphan_round_dirs(spark, tmp_path, full_run):
    """Crash INSIDE a round (after some sinks wrote, before the manifest
    commit): the next run must overwrite every orphan round dir — including
    a garbage Bloom sidecar — and still produce the uninterrupted run's
    exact state. Visibility is manifest-gated, so orphans are invisible
    until their round re-commits."""
    import pathlib

    full_store, full_sum, cfg, seeds = full_run

    part_store = CrawlStorage(spark, tmp_path / "part")
    eng = CrawlEngine(spark, cfg, part_store)
    eng.bootstrap(seeds)
    eng.run_round(1)
    # fake a mid-round-2 crash: garbage partial sinks for round 2, no manifest
    for table in ("frontier", "seen", "documents"):
        d = pathlib.Path(tmp_path / "part" / table / "round=00002")
        d.mkdir(parents=True, exist_ok=True)
        (d / "part-garbage.parquet").write_bytes(b"NOT A PARQUET FILE")
    orphan_blob = pathlib.Path(part_store.bloom_round_path(2))
    orphan_blob.mkdir(parents=True, exist_ok=True)
    (orphan_blob / "part-garbage.parquet").write_bytes(b"NOT A PARQUET FILE")

    resumed_sum = CrawlEngine(
        spark, cfg, CrawlStorage(spark, tmp_path / "part")
    ).run()
    assert _engine_state(full_store) == _engine_state(
        CrawlStorage(spark, tmp_path / "part")
    )
    assert resumed_sum["totals"] == full_sum["totals"]
    assert resumed_sum["rounds"] == full_sum["rounds"]


def test_hot_domain_skew_equality(spark, tmp_path):
    """G3 salting is a physical change only: with ~50% of links hitting one
    host, results must still match the oracle exactly."""
    cfg = CrawlConfig(
        max_depth=2,
        max_rounds=12,
        web_hosts=6,
        hot_host="host00.example",
        shuffle_partitions=4,
    )
    seeds = synthweb.seed_list(cfg, n=15)
    store = CrawlStorage(spark, tmp_path / "skew")
    summary = CrawlEngine(spark, cfg, store).run(seeds)
    _assert_matches_oracle(store, summary, cfg, seeds)
    # the skew is real: hot host dominates discovered URLs
    per_host = (
        store.read_table("seen")
        .withColumn("host", F.parse_url("url_canon", F.lit("HOST")))
        .groupBy("host")
        .count()
        .collect()
    )
    counts = {r["host"]: r["count"] for r in per_host}
    assert counts.get("host00.example", 0) >= 0.3 * sum(counts.values())


def test_pagerank_mode_partitioning_invariance(spark, tmp_path):
    """The "pagerank" priority ranks with exact fixed-point-integer math,
    which the module docstring claims is bit-identical across
    partitionings — pin it IN THE LOOP: the same pagerank-mode crawl at
    shuffle width 4 and an awkward prime width 13 must produce
    byte-identical seen and documents tables (order, clock, spans)."""

    def state(width: int, sub: str):
        cfg = CrawlConfig(
            max_depth=2, max_rounds=8, web_hosts=6,
            hot_host="host00.example", priority_mode="pagerank",
            shuffle_partitions=width,
        )
        seeds = synthweb.seed_list(cfg, n=20)
        store = CrawlStorage(spark, tmp_path / sub)
        summary = CrawlEngine(spark, cfg, store).run(seeds)
        seen = sorted(
            (r["url_hash"], r["url_canon"], r["round"])
            for r in store.read_table("seen").collect()
        )
        docs = sorted(
            (r["round"], r["fetch_time"], r["host"], r["host_rank"],
             r["doc_id"], str(r["spans"]))
            for r in store.read_table("documents").collect()
        )
        return summary["totals"], summary["rounds"], seen, docs

    assert state(4, "w4") == state(13, "w13")


def test_deletable_ban_equality(spark, tmp_path):
    """A4 cuckoo path: host banned until unban_round, then crawled; engine
    must match the oracle on ordering, seen set and rounds."""
    cfg = CrawlConfig(
        max_depth=1,
        max_rounds=10,
        web_hosts=42,  # smallest fixture with a banned host (host41.example)
        unban_round=3,
        shuffle_partitions=4,
    )
    seeds = synthweb.seed_list(cfg, n=42)
    store = CrawlStorage(spark, tmp_path / "ban")
    summary = CrawlEngine(spark, cfg, store).run(seeds)
    _assert_matches_oracle(store, summary, cfg, seeds)


def test_salting_balances_hot_host_partitions(spark):
    """G3 physical check (SURVEY.md §5 layer 5): with one host holding 50%
    of URLs, a plain host partition has a 0.5-fraction straggler; the
    (host_hash, salt) repartition must spread the hot host's rows so the
    max/mean partition ratio stays bounded."""
    from pyspark.sql import functions as F

    n = 20_000
    df = (
        spark.range(n)
        .withColumn(
            "host",
            F.when(F.col("id") % 2 == 0, F.lit("hot.example")).otherwise(
                F.format_string("host%03d.example", (F.col("id") % 100))
            ),
        )
        .withColumn("url_canon", F.format_string("http://%s/p%d", "host", "id"))
        .withColumn("host_hash", F.pmod(F.xxhash64("host"), F.lit(32)).cast("int"))
    )
    parts = 16
    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64("url_canon"), F.lit(parts * 64))
    ).repartition(parts, "host_hash", "salt")
    sizes = [
        r["count"]
        for r in salted.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    ]
    assert len(sizes) == parts
    ratio = max(sizes) / (n / parts)
    assert ratio < 1.6, f"salted partitions still skewed: {sizes}"
    # and the unsalted layout really is pathological (sanity of the fixture)
    unsalted = df.repartition(parts, "host_hash")
    u_sizes = [
        r["count"]
        for r in unsalted.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    ]
    assert max(u_sizes) / (n / parts) > 4.0
