"""Local replica of the driver's correctness gate (__spark_entry__.py:3-8):
run every queries() entry at sf0.01 and compare against its oracle_sql() via
DuckDB — row count, column names, and exact values (the driver hashes values,
so exact equality here is the honest preflight). Rows-only entries are
checked for rows>0 and stable schema."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def _canon_cell(v) -> str:
    """Render a cell the way a value-hasher sees it: type-faithful.

    An int 123 and a float 123.0 render differently on purpose — the driver's
    value-hash distinguishes them (that is exactly how round 1's DuckDB
    HUGEINT-vs-BIGINT bug escaped a check_dtype=False comparison).
    """
    import numpy as np

    if v is None or (isinstance(v, float) and v != v):
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_frame(pdf: pd.DataFrame) -> list[list[str]]:
    return [[_canon_cell(v) for v in row] for row in pdf.itertuples(index=False)]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "spans" in df.columns


ORACLE = entrymod.oracle_sql()
ALL = entrymod.queries()


def test_every_oracle_key_has_query():
    assert set(ORACLE) <= set(ALL)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_duckdb(name, spark, duck):
    got = _normalize(ALL[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(ORACLE[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want)
    got_c, want_c = _canon_frame(got), _canon_frame(want)
    for i, (g, w) in enumerate(zip(got_c, want_c)):
        assert g == w, f"{name} row {i}: spark={g} oracle={w}"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLE)))
def test_rows_only_queries_run(name, spark):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
