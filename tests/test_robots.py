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
    assert rows["a.com"]["allow"] == ["/"]  # the Disallow lines don't leak in
    assert rows["b.com"]["crawl_delay_s"] == 7.0  # case-insensitive
    assert rows["b.com"]["disallow"] == ["/x/y"]
    assert rows["b.com"]["allow"] == []
    assert rows["c.com"]["crawl_delay_s"] is None
    assert rows["c.com"]["disallow"] == []
    assert rows["d.com"]["disallow"] == ["/only"]


def test_robots_rules_duckdb_parity(spark):
    df = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    got = {
        r["host"]: (r["crawl_delay_s"], list(r["disallow"]), list(r["allow"]))
        for r in robots_rules(df).collect()
    }
    con = duckdb.connect()
    con.register("raw", pd.DataFrame(ROBOTS, columns=["host", "robots_txt"]))
    frags = robots_rules_sql("host", "robots_txt")
    duck = con.sql(
        f"select {frags['host']} as host, {frags['crawl_delay_s']} as d, "
        f"{frags['disallow']} as dis, {frags['allow']} as alw from raw"
    ).fetchall()
    want = {h: (d, list(dis), list(alw)) for h, d, dis, alw in duck}
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
    delay, dis, alw = parse_robots_grouped_py(ROBOTS_GROUPED, "SparkCrawler/1.0")
    assert delay == 2.5 and dis == ["/private", "/tmp"] and alw == []
    # unknown agent falls back to *
    delay, dis, _ = parse_robots_grouped_py(ROBOTS_GROUPED, "someone-else")
    assert delay == 9.0 and dis == ["/all"]
    # the blanket group applies only to badbot
    delay, dis, _ = parse_robots_grouped_py(ROBOTS_GROUPED, "badbot")
    assert delay is None and dis == ["/"]
    # no matching group at all → no rules
    assert parse_robots_grouped_py("User-agent: x\nDisallow: /q", "y") == (None, [], [])
    # empty Disallow (allow-everything) adds no prefix
    assert parse_robots_grouped_py("User-agent: *\nDisallow:", "y") == (None, [], [])
    # directives before any User-agent line are ignored
    assert parse_robots_grouped_py("Disallow: /x\nUser-agent: *\nDisallow: /y", "z") == (
        None,
        ["/y"],
        [],
    )
    # Allow lines are collected into the winning group
    txt = "User-agent: *\nDisallow: /private\nAllow: /private/press\n"
    assert parse_robots_grouped_py(txt, "any") == (None, ["/private"], ["/private/press"])


def test_grouped_agent_prefix_matching():
    """RFC 9309 matches a group whose token is a PREFIX of the product token
    — an unrelated short substring like 'ark' must not capture
    'sparkcrawler', and the longest matching prefix wins."""
    from azure_blob_crawler_spark.functions.robots import parse_robots_grouped_py

    txt = (
        "User-agent: ark\nDisallow: /ark-only\n\n"
        "User-agent: spark\nDisallow: /spark\n\n"
        "User-agent: sparkcrawler\nDisallow: /exact\n\n"
        "User-agent: *\nDisallow: /star\n"
    )
    # 'ark' is a substring but not a prefix → never selected
    assert parse_robots_grouped_py(txt, "sparkcrawler")[1] == ["/exact"]
    # shorter prefix picked only when the longer group is absent
    txt2 = "User-agent: ark\nDisallow: /a\n\nUser-agent: spark\nDisallow: /s\n"
    assert parse_robots_grouped_py(txt2, "sparkcrawler") == (None, ["/s"], [])
    # nothing prefixes → * fallback
    assert parse_robots_grouped_py(txt, "zebrabot")[1] == ["/star"]


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
        ("e.com", "User-agent: *\nDisallow: /p\nAllow: /p/ok\nAllow: /q\n"),
    ]
    df = spark.createDataFrame(texts, "host string, robots_txt string")
    got = {
        r["host"]: (r["crawl_delay_s"], list(r["disallow"]), list(r["allow"]))
        for r in robots_rules_grouped(df).collect()
    }
    for host, txt in texts:
        assert got[host] == parse_robots_grouped_py(txt or ""), host


def test_allow_longest_match_precedence(spark):
    """RFC 9309 §2.2.2: the longest matching rule of either kind decides;
    equal-length ties resolve to allow."""
    frontier = spark.createDataFrame(
        [
            (1, "a.com", "https://a.com/private/doc"),        # blocked
            (2, "a.com", "https://a.com/private/press/release"),  # Allow carve-out
            (3, "a.com", "https://a.com/public/x"),           # no rule matches
            (4, "b.com", "https://b.com/p/x"),                # tie '/p' vs '/p' → allow
            (5, "b.com", "https://b.com/pq"),                 # '/p' dis matches, allow '/p' too
            (6, "c.com", "https://c.com/site/a"),             # longer Disallow beats short Allow
        ],
        "id long, host string, url string",
    )
    rules = spark.createDataFrame(
        [
            ("a.com", None, ["/private"], ["/private/press"]),
            ("b.com", None, ["/p"], ["/p"]),
            ("c.com", None, ["/site/a"], ["/site"]),
        ],
        "host string, crawl_delay_s double, disallow array<string>, allow array<string>",
    )
    kept = sorted(r["id"] for r in filter_allowed(frontier, rules).collect())
    assert kept == [2, 3, 4, 5]
    # the same verdicts from the pure-Python twin
    from azure_blob_crawler_spark.functions.robots import is_disallowed_py

    rule_map = {r[0]: (r[2], r[3]) for r in rules.collect()}
    for row in frontier.collect():
        dis, alw = rule_map[row["host"]]
        assert is_disallowed_py(row["url"], dis, alw) == (row["id"] in (1, 6)), row["url"]


def test_allow_precedence_property(spark):
    """Engine column expression ≡ Python twin over generated rule sets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from azure_blob_crawler_spark.functions.robots import is_disallowed_py

    seg = st.sampled_from(["a", "b", "ab", "x1", "press"])
    prefix = st.lists(seg, min_size=1, max_size=3).map(lambda s: "/" + "/".join(s))
    case = st.tuples(
        prefix,  # path
        st.lists(prefix, max_size=3),  # disallow
        st.lists(prefix, max_size=3),  # allow
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(case, min_size=1, max_size=8))
    def check(cases):
        rows = [
            (i, f"https://h.com{path}", dis, alw)
            for i, (path, dis, alw) in enumerate(cases)
        ]
        df = spark.createDataFrame(
            rows, "id long, url string, dis array<string>, alw array<string>"
        )
        got = {
            r["id"]: r["d"]
            for r in df.select(
                "id", is_disallowed(F.col("url"), F.col("dis"), F.col("alw")).alias("d")
            ).collect()
        }
        for i, (path, dis, alw) in enumerate(cases):
            assert got[i] == is_disallowed_py(f"https://h.com{path}", dis, alw), (
                path, dis, alw,
            )

    check()


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


def test_single_and_grouped_tiers_agree_on_allow(spark):
    """On a single-group file, the Catalyst-native tier and the grouped
    pandas-UDF tier produce the same (delay, disallow, allow) rules."""
    from azure_blob_crawler_spark.functions.robots import robots_rules_grouped

    txt = (
        "User-agent: *\nCrawl-delay: 3\n"
        "Disallow: /private\nAllow: /private/press\nDisallow: /tmp\nAllow: /ok\n"
    )
    df = spark.createDataFrame([("a.com", txt)], "host string, robots_txt string")
    single = robots_rules(df).collect()[0]
    grouped = robots_rules_grouped(df).collect()[0]
    assert single["crawl_delay_s"] == grouped["crawl_delay_s"] == 3.0
    assert list(single["disallow"]) == list(grouped["disallow"]) == ["/private", "/tmp"]
    assert list(single["allow"]) == list(grouped["allow"]) == ["/private/press", "/ok"]
