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
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLE)))
def test_rows_only_queries_run(name, spark):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
