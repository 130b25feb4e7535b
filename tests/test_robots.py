"""robots.txt parsing + Disallow admission (north-rule politeness input)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from azure_blob_crawler_spark.functions.robots import (
    filter_allowed,
    is_disallowed,
    robots_rules,
    robots_rules_sql,
    url_path_of,
)

ROBOTS = [
    ("a.com", "User-agent: *\nCrawl-delay: 2.5\nDisallow: /private\nDisallow: /tmp\nAllow: /\n"),
    ("b.com", "User-Agent: *\ncrawl-DELAY: 7\nDisallow: /x/y\n"),
    ("c.com", "User-agent: *\nAllow: /\n"),           # no directives
    ("d.com", "Disallow: /only\n"),                   # minimal file
]


def test_robots_rules_parse(spark):
    df = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    rows = {r["host"]: r for r in robots_rules(df).collect()}
    assert rows["a.com"]["crawl_delay_s"] == 2.5
    assert rows["a.com"]["disallow"] == ["/private", "/tmp"]
    assert rows["b.com"]["crawl_delay_s"] == 7.0  # case-insensitive
    assert rows["b.com"]["disallow"] == ["/x/y"]
    assert rows["c.com"]["crawl_delay_s"] is None
    assert rows["c.com"]["disallow"] == []
    assert rows["d.com"]["disallow"] == ["/only"]


def test_robots_rules_duckdb_parity(spark):
    df = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    got = {
        r["host"]: (r["crawl_delay_s"], list(r["disallow"]))
        for r in robots_rules(df).collect()
    }
    con = duckdb.connect()
    con.register("raw", pd.DataFrame(ROBOTS, columns=["host", "robots_txt"]))
    frags = robots_rules_sql("host", "robots_txt")
    duck = con.sql(
        f"select {frags['host']} as host, {frags['crawl_delay_s']} as d, "
        f"{frags['disallow']} as dis from raw"
    ).fetchall()
    want = {h: (d, list(dis)) for h, d, dis in duck}
    assert got == want


def test_url_path_and_disallow(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/private/x.txt", ["/private"], True),
            ("https://a.com/public/x.txt", ["/private"], False),
            ("https://a.com", ["/private"], False),       # bare host → path '/'
            ("https://a.com/p?q=/private", ["/private"], False),  # query ignored
            ("https://a.com/tmp", ["/private", "/tmp"], True),
            # embedded absolute URL in the query: the OUTER path decides
            ("https://a.com/p?next=https://b.com/private/x", ["/private"], False),
            ("https://a.com/private/p?next=https://b.com/ok", ["/private"], True),
        ],
        "url string, dis array<string>, expect boolean",
    )
    rows = df.select(
        "url", "expect", is_disallowed(F.col("url"), F.col("dis")).alias("got"),
        url_path_of(F.col("url")).alias("path"),
    ).collect()
    for r in rows:
        assert r["got"] == r["expect"], (r["url"], r["path"])


def test_claim_round_enforces_disallow(spark):
    """A robots table with parsed rules gates the claim; without a disallow
    column the scheduler behaves exactly as before."""
    from azure_blob_crawler_spark.operators.scheduler import claim_round

    frontier = spark.createDataFrame(
        [
            ("u1", "a.com", "https://a.com/private/1", 0, 1, "pending", 0),
            ("u2", "a.com", "https://a.com/ok/2", 0, 2, "pending", 0),
            ("u3", "b.com", "https://b.com/private/3", 0, 3, "pending", 0),
        ],
        "url_hash string, host string, url string, depth int, "
        "discovery_seq long, state string, attempts int",
    )
    rules = spark.createDataFrame(
        [("a.com", None, ["/private"]), ("b.com", None, [])],
        "host string, crawl_delay_s double, disallow array<string>",
    )
    got = sorted(r["url"] for r in claim_round(frontier, rules, round_size=10).collect())
    assert got == ["https://a.com/ok/2", "https://b.com/private/3"]
    plain = rules.select("host", "crawl_delay_s")
    got_plain = claim_round(frontier, plain, round_size=10).count()
    assert got_plain == 3


def test_filter_allowed(spark):
    frontier = spark.createDataFrame(
        [
            (1, "a.com", "https://a.com/private/1"),
            (2, "a.com", "https://a.com/ok/2"),
            (3, "b.com", "https://b.com/private/3"),  # b.com has no rules
        ],
        "id long, host string, url string",
    )
    rules = spark.createDataFrame(
        [("a.com", None, ["/private"])],
        "host string, crawl_delay_s double, disallow array<string>",
    )
    kept = sorted(r["id"] for r in filter_allowed(frontier, rules).collect())
    assert kept == [2, 3]


ROBOTS_GROUPED = """# example
User-agent: badbot
Disallow: /

User-agent: sparkcrawler
User-agent: otherbot
Crawl-delay: 2.5
Disallow: /private
Disallow: /tmp

User-agent: *
Crawl-delay: 9
Disallow: /all
"""


def test_grouped_parse_python():
    from azure_blob_crawler_spark.functions.robots import parse_robots_grouped_py

    # specific group wins over badbot's blanket and the * fallback
    delay, dis = parse_robots_grouped_py(ROBOTS_GROUPED, "SparkCrawler/1.0")
    assert delay == 2.5 and dis == ["/private", "/tmp"]
    # unknown agent falls back to *
    delay, dis = parse_robots_grouped_py(ROBOTS_GROUPED, "someone-else")
    assert delay == 9.0 and dis == ["/all"]
    # the blanket group applies only to badbot
    delay, dis = parse_robots_grouped_py(ROBOTS_GROUPED, "badbot")
    assert delay is None and dis == ["/"]
    # no matching group at all → no rules
    assert parse_robots_grouped_py("User-agent: x\nDisallow: /q", "y") == (None, [])
    # empty Disallow (allow-everything) adds no prefix
    assert parse_robots_grouped_py("User-agent: *\nDisallow:", "y") == (None, [])
    # directives before any User-agent line are ignored
    assert parse_robots_grouped_py("Disallow: /x\nUser-agent: *\nDisallow: /y", "z") == (
        None,
        ["/y"],
    )


def test_grouped_rules_spark_matches_python(spark):
    from azure_blob_crawler_spark.functions.robots import (
        parse_robots_grouped_py,
        robots_rules_grouped,
    )

    texts = [
        ("a.com", ROBOTS_GROUPED),
        ("b.com", "User-agent: *\nDisallow: /only\nCrawl-delay: 1"),
        ("c.com", "User-agent: badbot\nDisallow: /\n"),
        ("d.com", None),
    ]
    df = spark.createDataFrame(texts, "host string, robots_txt string")
    got = {
        r["host"]: (r["crawl_delay_s"], list(r["disallow"]))
        for r in robots_rules_grouped(df).collect()
    }
    for host, txt in texts:
        want_delay, want_dis = parse_robots_grouped_py(txt or "")
        assert got[host] == (want_delay, want_dis), host


def test_grouped_rules_feed_filter_allowed(spark):
    """The grouped table is a drop-in rules source for Disallow admission."""
    from azure_blob_crawler_spark.functions.robots import robots_rules_grouped

    raw = spark.createDataFrame(
        [("a.com", ROBOTS_GROUPED)], "host string, robots_txt string"
    )
    rules = robots_rules_grouped(raw)
    frontier = spark.createDataFrame(
        [
            (1, "a.com", "https://a.com/private/x"),
            (2, "a.com", "https://a.com/ok"),
            (3, "a.com", "https://a.com/tmp/y"),
        ],
        "id long, host string, url string",
    )
    kept = sorted(r["id"] for r in filter_allowed(frontier, rules).collect())
    assert kept == [2]
