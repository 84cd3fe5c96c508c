"""End-to-end engine smoke: small synthetic web, full crawl to exhaustion,
structural invariants (SURVEY.md §7 step 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.sources import synthweb
from crawlspark.storage import CrawlStorage


@pytest.fixture(scope="module")
def crawl(crawl_run):
    cfg, storage, engine, summary, _seeds = crawl_run
    return cfg, storage, engine, summary


def test_crawl_exhausts(crawl):
    _, _, _, summary = crawl
    assert summary["exhausted"]
    assert summary["rounds"] >= 2
    assert summary["totals"]["fetched"] > 0


def test_documents_schema_and_spans(crawl, spark):
    _, storage, _, _ = crawl
    docs = storage.read_table("documents")
    assert docs.count() > 0
    # contract schema (BASELINE.json:15): spans array<struct<kind,text,media_ref,offset>>
    span_type = docs.schema["spans"].dataType.elementType
    assert [f.name for f in span_type.fields] == ["kind", "text", "media_ref", "offset"]
    # offsets are 0..n-1 in order for every 200 doc
    bad = docs.filter(F.col("status") == 200).filter(
        ~F.expr(
            "forall(transform(spans, (s,i) -> s.offset = i), x -> x)"
        )
    )
    assert bad.count() == 0
    # every 200 document has >=1 text and >=1 media span
    no_media = docs.filter(F.col("status") == 200).filter(
        F.expr("size(filter(spans, s -> s.kind = 'media')) = 0")
    )
    assert no_media.count() == 0


def test_seen_set_unique_and_consistent(crawl):
    _, storage, _, _ = crawl
    seen = storage.read_table("seen")
    assert seen.count() == seen.select("url_hash").distinct().count()
    # every fetched doc is in seen
    docs = storage.read_table("documents")
    missing = docs.join(seen, "url_hash", "left_anti")
    assert missing.count() == 0


def test_no_url_fetched_twice(crawl):
    _, storage, _, _ = crawl
    docs = storage.read_table("documents")
    assert docs.count() == docs.select("url_hash").distinct().count()


def test_politeness_budget_respected(crawl, spark):
    cfg, storage, _, _ = crawl
    docs = storage.read_table("documents")
    robots = {r["host"]: r for r in synthweb.robots_table(cfg)}
    per = docs.groupBy("round", "host").count().collect()
    for row in per:
        delay = robots.get(row["host"], {"crawl_delay": 1.0})["crawl_delay"]
        budget = max(1, int(cfg.round_seconds // delay))
        assert row["count"] <= budget, (row, budget)


def test_banned_hosts_never_fetched(crawl):
    cfg, storage, _, _ = crawl
    banned = [r["host"] for r in synthweb.robots_table(cfg) if r["banned"]]
    docs = storage.read_table("documents")
    if banned:
        assert docs.filter(F.col("host").isin(banned)).count() == 0


def test_metrics_totals_match_tables(crawl):
    _, storage, _, summary = crawl
    docs_n = storage.read_table("documents").count()
    assert summary["totals"]["fetched"] == docs_n


def test_empty_and_invalid_seed_lists(spark, tmp_path):
    """Degenerate inputs: no seeds / only invalid (non-http, malformed)
    seeds must bootstrap an empty frontier and exhaust immediately."""
    cfg = CrawlConfig(web_hosts=4, shuffle_partitions=4, max_rounds=3)
    eng = CrawlEngine(spark, cfg, CrawlStorage(spark, tmp_path / "a"))
    summary = eng.run(["ftp://x.example/a", "not a url", "mailto:a@b", ""])
    assert summary["exhausted"] and summary["totals"].get("fetched", 0) == 0


def test_fetch_cpu_work_does_not_change_results(spark, tmp_path):
    """CrawlConfig.fetch_cpu_work is a pure CPU burn inside the fetch stage
    (the jobs/compute_scaling.py parallel-fraction knob): every table a
    crawl produces must be byte-identical with it on or off."""
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.sources import synthweb
    from crawlspark.storage import CrawlStorage

    def state(work: int, sub: str):
        cfg = CrawlConfig(max_depth=2, max_rounds=6, web_hosts=5,
                          shuffle_partitions=4, fetch_cpu_work=work)
        store = CrawlStorage(spark, tmp_path / sub)
        summary = CrawlEngine(spark, cfg, store).run(
            synthweb.seed_list(cfg, n=15)
        )
        seen = sorted(
            (r["url_hash"], r["url_canon"], r["round"])
            for r in store.read_table("seen").collect()
        )
        docs = sorted(
            (r["round"], r["fetch_time"], r["host"], r["host_rank"],
             str(r["spans"]))
            for r in store.read_table("documents").collect()
        )
        return summary["totals"], summary["rounds"], seen, docs

    assert state(0, "off") == state(50, "on")


def test_fetch_rows_target_sizes_from_per_url_cost():
    """_fetch_rows_target: heavy per-URL work shrinks the rows-per-partition
    target so mid-size rounds saturate the configured width (round-4 probe
    finding: 2000-row targets left a ~4 ms/URL round 16-wide on 32 cores);
    light work keeps the measured sandbox default; pathological work levels
    are floored so tasks never degenerate to single rows."""
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import _fetch_rows_target

    assert _fetch_rows_target(CrawlConfig()) == CrawlConfig().fetch_rows_per_partition
    # ~4 ms/URL (the round-4 probe's level): 100 ms target -> 25 rows
    assert _fetch_rows_target(CrawlConfig(fetch_cpu_work=2000)) == 25
    # with that target a 1000-URL round on 32 cores opens the full width
    assert -(-1000 // 25) >= 32
    # ~0.2 ms/URL: still fatter partitions, never above the light default
    assert 8 <= _fetch_rows_target(CrawlConfig(fetch_cpu_work=100)) <= 2000
    # absurd per-URL cost floors at 8 rows, not 0/1
    assert _fetch_rows_target(CrawlConfig(fetch_cpu_work=10**9)) == 8
