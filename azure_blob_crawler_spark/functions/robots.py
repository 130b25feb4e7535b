"""robots.txt parsing + disallow filtering as native column expressions.

The north rule's politeness scheduler enforces robots crawl-delay budgets;
this module turns raw robots.txt text into the scheduler's rules table and
adds Disallow-prefix admission. The reference has no robots handling (its
input is a trusted blob container) — this is crawl-fidelity the engine adds.

Scope (documented): the single-group subset — directives are read file-wide
as if under ``User-agent: *`` (the common shape for synthetic corpora and
most small sites). Per-agent group resolution would need stateful line
parsing, which is not expressible as a pure column transform; a grouped
``applyInPandas`` variant can be layered if per-agent targeting is needed.

Both directives parse with the same regexes in Spark and DuckDB
(``robots_rules_sql``), so the rules table is correctness-oracled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DELAY_RX = r"(?i)crawl-delay:\s*([0-9]+\.?[0-9]*)"
_DISALLOW_RX = r"(?i)disallow:\s*(/\S*)"


def robots_rules(df: DataFrame, host_col: str = "host", text_col: str = "robots_txt") -> DataFrame:
    """(host, crawl_delay_s, disallow) from raw robots.txt text.

    ``crawl_delay_s`` is the first Crawl-delay directive (null when absent →
    scheduler default applies); ``disallow`` is every Disallow path prefix.
    Fully Catalyst-native (regexp extraction, codegen'd)."""
    delay_str = F.regexp_extract(F.col(text_col), _DELAY_RX, 1)
    return df.select(
        F.col(host_col).alias("host"),
        F.when(delay_str != "", delay_str.cast("double")).alias("crawl_delay_s"),
        F.regexp_extract_all(F.col(text_col), F.lit(_DISALLOW_RX), 1).alias("disallow"),
    )


def robots_rules_sql(host_expr: str, text_expr: str) -> dict[str, str]:
    """DuckDB twins of ``robots_rules`` columns (oracle)."""
    delay = f"regexp_extract({text_expr}, '(?i)crawl-delay:\\s*([0-9]+\\.?[0-9]*)', 1)"
    return {
        "host": host_expr,
        "crawl_delay_s": f"case when {delay} <> '' then {delay}::double end",
        "disallow": f"regexp_extract_all({text_expr}, '(?i)disallow:\\s*(/\\S*)', 1)",
    }


def url_path_of(url: Column) -> Column:
    """Path component ('' → '/') of an absolute URL, native.

    Splits on the FIRST '://' — a URL embedding another absolute URL in its
    query (``https://a.com/p?next=https://b.com/x``, a common redirect
    shape the canonicalizer preserves) must not shift the parse to the
    embedded URL's path, which the last-occurrence ``substring_index``
    form did."""
    sch = F.split_part(url, F.lit("://"), F.lit(1))
    rest = F.substring_index(F.substr(url, F.length(sch) + F.lit(4)), "?", 1)
    slash = F.instr(rest, "/")
    path = F.when(slash > 0, F.substring(rest, slash, 1_000_000)).otherwise(F.lit("/"))
    return path


def is_disallowed(url: Column, disallow: Column) -> Column:
    """True when the URL's path starts with any Disallow prefix."""
    path = url_path_of(url)
    return F.exists(disallow, lambda p: path.startswith(p))


def filter_allowed(frontier: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Drop frontier rows whose path a robots Disallow prefix covers.

    Broadcast join on host (rules are per-host and small relative to the
    frontier); rows for hosts with no rules pass through."""
    r = F.broadcast(rules.select("host", F.col("disallow").alias("__dis")))
    joined = frontier.join(r, "host", "left")
    keep = F.col("__dis").isNull() | ~is_disallowed(F.col(url_col), F.col("__dis"))
    return joined.filter(keep).drop("__dis")
