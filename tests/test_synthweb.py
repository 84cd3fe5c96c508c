"""Synthetic web generator invariants (FIXTURES.md §6)."""

from __future__ import annotations

from crawlspark.config import CrawlConfig
from crawlspark.functions.canon import canonicalize_url
from crawlspark.sources import synthweb


def test_deterministic():
    cfg = CrawlConfig()
    a = synthweb.page("http://host00.example/alpha/start", cfg)
    b = synthweb.page("http://host00.example/alpha/start", cfg)
    assert a == b


def test_spans_shape():
    cfg = CrawlConfig()
    checked_media = checked_text = 0
    for i in range(200):
        url = f"http://host{i % 20:02d}.example/w{i}/p"
        status, spans, links = synthweb.page(url, cfg)
        if status != 200:
            assert spans == [] and links == []
            continue
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        for s in spans:
            if s["kind"] == "text":
                assert s["text"] and s["media_ref"] is None
                checked_text += 1
            else:
                assert s["kind"] == "media"
                assert s["media_ref"] and s["text"] is None
                checked_media += 1
    assert checked_text > 0 and checked_media > 0


def test_links_canonicalizable():
    """Every absolute link the web emits canonicalizes to an http URL on a
    known host; relative links resolve against the page."""
    cfg = CrawlConfig()
    hostset = set(synthweb.hosts(cfg))
    from urllib.parse import urljoin

    found_trap = found_rel = 0
    for i in range(300):
        url = f"http://host{i % 20:02d}.example/seg{i}/p"
        status, _, links = synthweb.page(url, cfg)
        for href in links:
            if "://" not in href:
                found_rel += 1
                href = urljoin(url, href)
            if any(t in href for t in ("#", ":80", "HTTP", "../", "/./", "?b=")):
                found_trap += 1
            c = canonicalize_url(href)
            assert c is not None
            host = c.split("://")[1].split("/")[0]
            assert host in hostset
    assert found_trap > 10 and found_rel > 10


def test_seed_duplicates_exist():
    cfg = CrawlConfig()
    seeds = synthweb.seed_list(cfg, 100)
    canon = [canonicalize_url(s) for s in seeds]
    assert all(c is not None for c in canon)
    assert len(set(canon)) < len(canon)  # traps collapse


def test_robots_table_shape():
    cfg = CrawlConfig()
    rows = synthweb.robots_table(cfg)
    assert len(rows) == cfg.web_hosts
    for r in rows:
        assert 1.0 <= r["crawl_delay"] <= 5.0
        assert r["rules"][-1] == {"allow": True, "prefix": "/"}
