"""Driver-contract smoke: entry() returns rows with a stable schema; a
representative subset of queries() matches oracle_sql() on DuckDB at
sf0.001 (the full sweep lives in tools/selfcheck.py, run at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import TABLES, canon_rows

SF_DIR = "/root/testdata/sf0.001"
SUBSET = [
    "q1_pricing_summary",
    "q_rollup",
    "q_url_canonicalize",
    "q_token_stats",
    "q_quality_lang",
    "q_embedding_topk",
    "q_span_counts",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "score" in df.columns and "chunk_id" in df.columns


def test_queries_have_oracles_or_note():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 15


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_subset(spark, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR).toPandas()
    odf = duck.sql(oracles[name]).df()
    scols, srows = canon_rows(sdf)
    ocols, orows = canon_rows(odf)
    assert scols == ocols
    assert srows == orows
