"""Every oracle_sql() entry must be valid DuckDB SQL over the
registered views — catches oracle syntax/semantic drift without a
Spark session (full value parity runs in tools/selfcheck.py)."""

import os

import duckdb
import pytest

from ferenda_spark import queries as catalog

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_every_query_has_callable():
    qs = catalog.queries()
    assert len(qs) >= 30
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    qs, os_ = set(catalog.queries()), set(catalog.oracle_sql())
    assert os_ <= qs
    # the bulk of the catalog must be oracle-checked
    assert len(os_) / len(qs) >= 0.75


@pytest.mark.parametrize("name", sorted(catalog.oracle_sql()))
def test_oracle_executes(con, name):
    rel = con.sql(catalog.oracle_sql()[name])
    rows = rel.fetchall()
    assert rel.columns  # has a schema
    assert isinstance(rows, list)
