"""URL canonicalization: expected values, Spark↔DuckDB dialect parity,
hash key properties."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from azure_blob_crawler_spark.functions.urls import (
    canonical_url,
    canonicalize_sql,
    url_hash,
    url_host,
)

CASES = [
    ("https://Example.COM/a/b.txt", "https://example.com/a/b.txt"),
    ("HTTPS://EXAMPLE.com:443/a/b.txt", "https://example.com/a/b.txt"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # a scheme's NON-default port is a distinct origin — never stripped
    ("http://example.com:443/a", "http://example.com:443/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),
    ("https://example.com/a/b.txt#frag", "https://example.com/a/b.txt"),
    ("https://example.com/a//b///c", "https://example.com/a/b/c"),
    ("https://example.com/a/./b/./c.txt", "https://example.com/a/b/c.txt"),
    ("https://example.com/a/b/../c.txt", "https://example.com/a/c.txt"),
    ("https://example.com/a/b/c/../../d.txt", "https://example.com/a/d.txt"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    ("https://example.com/a?q=1&r=2", "https://example.com/a?q=1&r=2"),
    ("https://example.com/a?q=1#f", "https://example.com/a?q=1"),
    ("  https://example.com/a  ", "https://example.com/a"),
]


def test_canonical_expected(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [e for _, e in CASES]


def test_duckdb_dialect_parity(spark):
    con = duckdb.connect()
    raw = pd.DataFrame({"url": [u for u, _ in CASES]})
    con.register("raw", raw)
    sql = canonicalize_sql("url", "duckdb", from_clause="raw")
    duck = con.sql(f"select canon from ({sql})").df()["canon"].tolist()
    assert duck == [e for _, e in CASES]


SORT_CASES = [
    ("https://e.com/a?b=2&a=1", "https://e.com/a?a=1&b=2"),
    ("https://e.com/a?a=1&b=2", "https://e.com/a?a=1&b=2"),
    # same-key duplicates keep their original relative order (stable)
    ("https://e.com/a?b=2&a=9&b=1&a=0", "https://e.com/a?a=9&a=0&b=2&b=1"),
    ("https://e.com/a?z", "https://e.com/a?z"),          # valueless param
    ("https://e.com/a?b&a=1", "https://e.com/a?a=1&b"),
    ("https://e.com/a?b=x%26y&a=1", "https://e.com/a?a=1&b=x%26y"),
    ("https://e.com/a", "https://e.com/a"),              # no query at all
    ("https://E.com:443/p/../q?b=2&a=1#f", "https://e.com/q?a=1&b=2"),
]


def test_sort_query_three_way_parity(spark):
    """Opt-in query-param sorting: expected values, Spark Column form,
    DuckDB dialect, and the Python twin all agree; default stays verbatim."""
    from azure_blob_crawler_spark.functions.urls import canonical_url_py

    df = spark.createDataFrame([(u,) for u, _ in SORT_CASES], ["url"])
    got = [
        r["c"]
        for r in df.select(canonical_url("url", sort_query=True).alias("c")).collect()
    ]
    assert got == [e for _, e in SORT_CASES]
    assert [canonical_url_py(u, sort_query=True) for u, _ in SORT_CASES] == [
        e for _, e in SORT_CASES
    ]
    con = duckdb.connect()
    con.register("raw2", pd.DataFrame({"url": [u for u, _ in SORT_CASES]}))
    sql = canonicalize_sql("url", "duckdb", from_clause="raw2", sort_query=True)
    duck = con.sql(f"select canon from ({sql})").df()["canon"].tolist()
    assert duck == [e for _, e in SORT_CASES]
    # spark-dialect inline expression agrees too
    expr = canonicalize_sql("url", "spark", sort_query=True)
    got_inline = [r["c"] for r in df.select(F.expr(expr).alias("c")).collect()]
    assert got_inline == [e for _, e in SORT_CASES]
    # and the default (sort_query off) leaves params verbatim
    plain = [
        r["c"] for r in df.select(canonical_url("url").alias("c")).collect()
    ]
    assert plain[0].endswith("?b=2&a=1")


def test_hash_and_host(spark):
    df = spark.createDataFrame(
        [("https://Example.com/a#f",), ("https://example.com/a",)], ["url"]
    ).select(canonical_url("url").alias("canon"))
    df = df.select("canon", url_hash("canon").alias("h"), url_host("canon").alias("host"))
    rows = df.collect()
    # canonically equal urls hash equal
    assert rows[0]["h"] == rows[1]["h"]
    assert rows[0]["host"] == "example.com"


def test_hash_no_collision_smoke(spark):
    n = 20000
    df = (
        spark.range(n)
        .select(F.concat(F.lit("https://h.example.com/p/"), F.col("id")).alias("u"))
        .select(url_hash(F.col("u")).alias("h"))
    )
    assert df.distinct().count() == n
