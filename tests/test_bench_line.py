"""The driver parses exactly ONE stdout JSON line from bench.py and keeps
only the last ~2000 characters of stdout; round 2's line embedded every
nested probe block, outgrew that window, and the round's headline was
recorded as `parsed: null`. These tests pin the contract: the compact line
always parses, always carries the headline fields, and never exceeds the
tail-capture window — even for a worst-case fat result dict."""

import json

import bench


def _fat_result() -> dict:
    # worst realistic case: every part present, a 50-query corpus with long
    # names, and float timings with full repr precision
    queries = {
        f"a_quite_long_query_name_number_{i:02d}": round(123.456 + i, 3)
        for i in range(50)
    }
    probe = {
        "local8": {"throughput_urls_per_sec": 4215.7, "wall_sec": 37.01,
                   "fetched": 133641, "seen": 147253, "rounds": 4},
        "local32": {"throughput_urls_per_sec": 5136.2, "wall_sec": 29.23,
                    "fetched": 133641, "seen": 147253, "rounds": 4},
        "all_walls_sec": [29.2, 37.0, 35.6, 31.7],
        "run_order_cores": [32, 8, 8, 32],
        "scaling_efficiency": 0.305,
        "efficiency_vs_hw_ceiling": 0.345,
        "rounds_equal": True,
        "fetched_equal": True,
        "seen_equal": True,
    }
    return {
        "queries": queries,
        "big_crawl": dict(probe),
        "crawl": dict(probe),
        "docproc_scaling": {
            "local8": {"docs_per_sec": 15000.1},
            "local32": {"docs_per_sec": 33300.9},
            "scaling_efficiency": 0.53,
            "efficiency_vs_hw_ceiling": 0.67,
        },
        "hardware_calibration": {
            "hardware_ceiling_efficiency": 0.806,
            "raw": {"n8": 1.0, "n32": 0.8},
        },
        "skipped_parts": [],
    }


def test_compact_line_fits_tail_capture():
    encoded = bench.build_compact_line(_fat_result(), 5136.2, 460.12, 0.1)
    assert len(encoded) <= 1900, len(encoded)
    assert "\n" not in encoded


def test_compact_line_headline_fields_parse():
    d = json.loads(bench.build_compact_line(_fat_result(), 5136.2, 460.12, 0.1))
    assert d["metric"] == "urls_fetched_deduped_per_sec"
    assert d["value"] == 5136.2
    assert d["unit"] == "urls/sec"
    assert d["sf"] == 0.1
    # scaling evidence for the contract's two-cluster-size criterion
    assert d["big_crawl"]["local8"] == 4215.7
    assert d["big_crawl"]["local32"] == 5136.2
    assert d["big_crawl"]["scaling_efficiency"] == 0.305
    assert d["big_crawl"]["deterministic"] is True


def test_compact_line_minimal_result():
    # budget-skipped runs still produce a parseable headline
    d = json.loads(
        bench.build_compact_line(
            {"queries": {"q": 1.0}, "skipped_parts": ["bigcrawl", "crawl"]},
            33.4, 33.4, 0.01,
        )
    )
    assert d["value"] == 33.4
    assert d["skipped_parts"] == ["bigcrawl", "crawl"]


def test_bench_query_names_exist_in_registry():
    """Every query name bench.py times must exist in the __spark_entry__
    registry — a rename/merge there (round 4 merged token_count +
    bpe_token_count into token_counts) must fail HERE, not as a KeyError
    halfway through a recorded bench run."""
    import inspect

    import __spark_entry__ as em

    src = inspect.getsource(bench.bench_queries)
    registered = set(em.queries())
    # the names list is the literal between 'names = [' and the closing ']'
    block = src.split("names = [", 1)[1].split("]", 1)[0]
    names = [ln.strip().strip('",') for ln in block.splitlines() if '"' in ln]
    assert names, "failed to parse the bench names list"
    missing = [n for n in names if n not in registered]
    assert not missing, f"bench times unregistered queries: {missing}"
