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
