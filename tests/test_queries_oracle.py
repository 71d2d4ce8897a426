"""Mimic the driver's oracle gate: run each queries() entry in Spark AND
its oracle_sql() twin in DuckDB, compare row count + schema + values
(order-insensitive).  Catching parity breaks here is cheaper than in the
driver's CORRECTNESS round."""

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat() + "T00:00:00"
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect())


def _duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    rows = res.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, sorted(tuple(_norm(row[i]) for i in order) for row in rows)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    s_cols, s_rows = _spark_rows(QUERIES[name](spark, SF_DIR))
    d_cols, d_rows = _duck_rows(duck, ORACLES[name])
    assert s_cols == d_cols, f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    if s_rows != d_rows:
        for a, b in zip(s_rows, d_rows):
            assert a == b, f"{name}: first differing row\n spark={a}\n duck ={b}"
    # some queries are legitimately empty at sf0.001 (they are non-empty
    # at the driver's sf0.01)
    may_be_empty = {"dedup_exact", "anti_join", "sim_near_dup"}
    assert len(s_rows) > 0 or name in may_be_empty, \
        f"{name}: zero rows - weak test"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"url", "text", "n_pages"}
