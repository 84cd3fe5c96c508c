"""Property + golden tests for URL canonicalization (SURVEY.md §5 layer 1).

JVM-free: exercises the pure-pandas path shared by engine and oracle.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.functions.canon import (
    canonicalize_series,
    canonicalize_url,
    host_of,
    resolve_series,
)

GOLDEN = [
    # C1 lowercase scheme+host
    ("HTTP://EX.COM/Path", "http://ex.com/Path"),
    # C2 strip fragment
    ("http://ex.com/a#frag", "http://ex.com/a"),
    # C3 sort query (stable for duplicate keys)
    ("http://ex.com/?b=2&a=1", "http://ex.com/?a=1&b=2"),
    ("http://ex.com/?b=2&a=1&b=1", "http://ex.com/?a=1&b=2&b=1"),
    # C4 default port removal
    ("http://ex.com:80/a", "http://ex.com/a"),
    ("https://ex.com:443/a", "https://ex.com/a"),
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),
    # C5 percent normalization: uppercase hex, decode unreserved
    ("http://ex.com/%7euser", "http://ex.com/~user"),
    ("http://ex.com/a%2fb", "http://ex.com/a%2Fb"),
    # C6 dot segments
    ("http://ex.com/a/./b/../c", "http://ex.com/a/c"),
    ("http://ex.com/../a", "http://ex.com/a"),
    # C7 empty path
    ("http://ex.com", "http://ex.com/"),
    ("http://ex.com?a=1", "http://ex.com/?a=1"),
    # C11 scheme filter
    ("ftp://ex.com/a", None),
    ("mailto:x@y.z", None),
    ("javascript:void(0)", None),
    ("", None),
    (None, None),
    # combined trap
    (
        "HTTP://Host01.EXAMPLE:80/alpha/./x/../p3?z=9&a=1#sec",
        "http://host01.example/alpha/p3?a=1&z=9",
    ),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_golden(raw, expected):
    assert canonicalize_url(raw) == expected


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_series_matches_scalar(raw, expected):
    out = canonicalize_series(pd.Series([raw]))
    assert out.iloc[0] == expected or (out.iloc[0] is None and expected is None)


url_strategy = st.builds(
    lambda scheme, host, port, path, q, frag: (
        f"{scheme}://{host}{port}{path}{q}{frag}"
    ),
    scheme=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    host=st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.\-]{0,20}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,4}", fullmatch=True),
    q=st.sampled_from(["", "?a=1", "?b=2&a=1", "?x=%20y"]),
    frag=st.sampled_from(["", "#f", "#a/b"]),
)


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_idempotent(url):
    c1 = canonicalize_url(url)
    if c1 is not None:
        assert canonicalize_url(c1) == c1, f"not idempotent: {url!r} -> {c1!r}"


@settings(max_examples=200, deadline=None)
@given(url_strategy)
def test_series_scalar_agreement(url):
    assert canonicalize_series(pd.Series([url])).iloc[0] == canonicalize_url(url)


def test_fast_path_and_slow_path_mix():
    urls = pd.Series(
        [
            "http://host00.example/alpha/p1",  # fast path
            "HTTP://HOST00.EXAMPLE/alpha/p1",  # slow path, same canon
            "http://host00.example:80/alpha/p1#z",  # slow path, same canon
            "http://host00.example/img0.png",  # fast path with dot
            None,
        ]
    )
    out = canonicalize_series(urls)
    assert out.iloc[0] == out.iloc[1] == out.iloc[2] == "http://host00.example/alpha/p1"
    assert out.iloc[3] == "http://host00.example/img0.png"
    assert out.iloc[4] is None


def test_resolve_series():
    base = pd.Series(["http://ex.com/a/b/page"] * 3 + [None])
    href = pd.Series(["../x", "y/z", "HTTP://OTHER.COM/Q#f", "x"])
    out = resolve_series(base, href)
    assert out.iloc[0] == "http://ex.com/a/x"
    assert out.iloc[1] == "http://ex.com/a/b/y/z"
    assert out.iloc[2] == "http://other.com/Q"
    assert out.iloc[3] is None


def test_host_of():
    assert host_of("http://ex.com/a") == "ex.com"
    assert host_of("http://ex.com:8080/a") == "ex.com"
