"""Robots/politeness matching (SURVEY.md §2.5, R1–R3).

Semantics: RFC 9309 longest-prefix match — among all rules whose prefix
matches the URL path, the longest prefix wins; ties prefer Allow; no match →
allowed. [typical — SURVEY.md §0.1 item 4; the reference checkout was empty.]

The matcher is one pure function (`allowed`) shared by the sequential oracle,
plus a pandas-vectorized batch form (`allowed_series`) used inside the Spark
engine after the broadcast robots join (R1): rules arrive as the joined
``rules`` array column, one Arrow batch at a time. Host budgets (P3) are pure
column expressions (JVM-side) and live in scheduler.py.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["allowed", "allowed_series", "path_of"]


def path_of(url_canon: str) -> str:
    """Path+query of a canonical URL (rules match on the path part)."""
    rest = url_canon.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


def allowed(path: str, rules) -> bool:
    """Longest-prefix-match Allow/Disallow; ties → Allow; no match → allow.

    ``rules`` may be a list of dicts (oracle) or a numpy array of dicts (how
    Arrow hands an array<struct> column to a pandas UDF) — hence len(), not
    truthiness."""
    if rules is None or len(rules) == 0:
        return True
    best_len = -1
    best_allow = True
    for r in rules:
        # r is a dict {"allow","prefix"} (oracle) or a Row (Spark join output)
        prefix = r["prefix"]
        if prefix is not None and path.startswith(prefix):
            plen = len(prefix)
            al = bool(r["allow"])
            if plen > best_len or (plen == best_len and al):
                best_len, best_allow = plen, al
    return best_allow


def allowed_series(paths: pd.Series, rules_col: pd.Series) -> pd.Series:
    """Vectorized batch form: most hosts carry the single catch-all
    ``[{allow:True, prefix:'/'}]`` rule — detected once per batch and
    short-circuited; only multi-rule hosts pay the per-row match."""
    n = len(paths)
    out = pd.Series(True, index=paths.index)
    trivial = rules_col.map(
        lambda rs: rs is None
        or (len(rs) == 1 and bool(rs[0]["allow"]) and rs[0]["prefix"] == "/")
    )
    idx = out.index[~trivial]
    if len(idx):
        out.loc[idx] = [
            allowed(p, rs)
            for p, rs in zip(paths.loc[idx], rules_col.loc[idx])
        ]
    return out if n else pd.Series(dtype=bool)
