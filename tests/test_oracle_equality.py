"""SURVEY.md §5 layer 3: engine vs sequential oracle under identical seed
list + politeness budget — the three judged invariants of BASELINE.json:14/15:
URL-seen-set equality, crawl-ordering equality, span-sequence equality.
Plus per-round metric equality (fetch/dedup/skip counters, BASELINE.json:6).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import oracle_crawler


@pytest.fixture(scope="module")
def oracle(crawl_run):
    cfg, _storage, _engine, _summary, seeds = crawl_run
    return oracle_crawler.crawl(cfg, seeds)


def test_url_seen_set_equality(crawl_run, oracle):
    _, storage, _, _, _ = crawl_run
    engine_seen = {
        r["url_canon"] for r in storage.read_table("seen").select("url_canon").collect()
    }
    assert engine_seen == oracle.seen


def test_rounds_to_exhaustion_equal(crawl_run, oracle):
    _, _, _, summary, _ = crawl_run
    assert summary["rounds"] == oracle.rounds
    assert summary["exhausted"]


def test_crawl_ordering_equality(crawl_run, oracle):
    """Total crawl order (round, fetch_time, host, host_rank) must match the
    sequential oracle exactly, URL for URL."""
    _, storage, _, _, _ = crawl_run
    rows = (
        storage.read_table("documents")
        .select("round", "fetch_time", "host", "host_rank", "doc_id")
        .orderBy("round", "fetch_time", "host", "host_rank")
        .collect()
    )
    engine_order = [(r["round"], r["doc_id"]) for r in rows]
    assert engine_order == oracle.crawl_order
    # and the virtual clock itself matches
    engine_clock = [(r["round"], r["fetch_time"], r["host_rank"]) for r in rows]
    oracle_clock = [(d.round, d.fetch_time, d.host_rank) for d in oracle.docs]
    assert engine_clock == oracle_clock


def test_span_sequence_equality(crawl_run, oracle):
    """Per-row invariant (BASELINE.json:15): span sequence (kind, text,
    media_ref, order) equal per document."""
    _, storage, _, _, _ = crawl_run
    rows = storage.read_table("documents").select("doc_id", "spans").collect()
    engine_spans = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rows
    }
    oracle_spans = {
        d.url_canon: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d.spans
        ]
        for d in oracle.docs
    }
    assert engine_spans == oracle_spans


def test_per_round_metrics_equality(crawl_run, oracle):
    _, storage, _, summary, _ = crawl_run
    keys = (
        "frontier_size fetched ok_200 skipped_robots skipped_politeness "
        "skipped_banned candidates deduped new_urls"
    ).split()
    for om in oracle.per_round:
        em = storage.manifest(om["round"])
        assert em is not None, f"no manifest for round {om['round']}"
        got = {k: em[k] for k in keys}
        want = {k: om[k] for k in keys}
        assert got == want, f"round {om['round']}: {got} != {want}"
