"""robots.txt parsing + disallow filtering as native column expressions.

The north rule's politeness scheduler enforces robots crawl-delay budgets;
this module turns raw robots.txt text into the scheduler's rules table and
adds Disallow-prefix admission. The reference has no robots handling (its
input is a trusted blob container) — this is crawl-fidelity the engine adds.

Two parsing tiers:

- ``robots_rules`` — the single-group subset: directives read file-wide as
  if under ``User-agent: *``. Fully Catalyst-native and dialect-paired with
  DuckDB (``robots_rules_sql``), so this tier is correctness-oracled.
- ``robots_rules_grouped`` — RFC-9309-style per-agent group resolution
  (``User-agent:`` runs open a group; the group with the longest agent
  token matching ours wins, ``*`` as fallback). Group parsing is stateful
  line scanning, so this tier is an Arrow-batched pandas UDF with a pure-
  Python twin (``parse_robots_grouped_py``) pinned by tests. A site with
  ``User-agent: badbot / Disallow: /`` no longer blankets this engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DELAY_RX = r"(?i)crawl-delay:\s*([0-9]+\.?[0-9]*)"
_DISALLOW_RX = r"(?i)disallow:\s*(/\S*)"
# multiline-anchored so the 'allow:' tail of every 'Disallow:' line does not
# match — only lines whose first field is Allow
_ALLOW_RX = r"(?im)^\s*allow:\s*(/\S*)"


def robots_rules(df: DataFrame, host_col: str = "host", text_col: str = "robots_txt") -> DataFrame:
    """(host, crawl_delay_s, disallow, allow) from raw robots.txt text.

    ``crawl_delay_s`` is the first Crawl-delay directive (null when absent →
    scheduler default applies); ``disallow``/``allow`` are every Disallow /
    Allow path prefix (RFC 9309 longest-match precedence between them is
    applied at admission time by ``is_disallowed``). Fully Catalyst-native
    (regexp extraction, codegen'd)."""
    delay_str = F.regexp_extract(F.col(text_col), _DELAY_RX, 1)
    return df.select(
        F.col(host_col).alias("host"),
        F.when(delay_str != "", delay_str.cast("double")).alias("crawl_delay_s"),
        F.regexp_extract_all(F.col(text_col), F.lit(_DISALLOW_RX), 1).alias("disallow"),
        F.regexp_extract_all(F.col(text_col), F.lit(_ALLOW_RX), 1).alias("allow"),
    )


def robots_rules_sql(host_expr: str, text_expr: str) -> dict[str, str]:
    """DuckDB twins of ``robots_rules`` columns (oracle)."""
    delay = f"regexp_extract({text_expr}, '(?i)crawl-delay:\\s*([0-9]+\\.?[0-9]*)', 1)"
    return {
        "host": host_expr,
        "crawl_delay_s": f"case when {delay} <> '' then {delay}::double end",
        "disallow": f"regexp_extract_all({text_expr}, '(?i)disallow:\\s*(/\\S*)', 1)",
        "allow": f"regexp_extract_all({text_expr}, '(?im)^\\s*allow:\\s*(/\\S*)', 1)",
    }


ENGINE_AGENT = "sparkcrawler"


def parse_robots_grouped_py(
    text: str, agent: str = ENGINE_AGENT
) -> tuple[float | None, list[str], list[str]]:
    """Group-resolved (crawl_delay_s, disallow_prefixes, allow_prefixes)
    for ``agent``.

    RFC 9309 shape: consecutive ``User-agent:`` lines share one group; a
    directive line closes the agent run. The applicable group is the one
    whose agent token is the longest case-insensitive PREFIX of our product
    token (RFC 9309 §2.2.1 — substring containment would let an unrelated
    short token like 'ark' capture 'sparkcrawler'); ``*`` applies only when
    no specific group matches. Unknown fields (Sitemap:) close agent runs
    but are otherwise ignored; Disallow/Allow values not starting with '/'
    (including the empty allow-everything form) add no prefix."""
    groups: list[dict] = []
    cur: dict | None = None
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if cur is None or cur["closed"]:
                cur = {"agents": [], "delay": None, "dis": [], "alw": [], "closed": False}
                groups.append(cur)
            cur["agents"].append(value.lower())
        elif cur is not None:
            cur["closed"] = True
            if field == "disallow":
                if value.startswith("/"):
                    cur["dis"].append(value)
            elif field == "allow":
                if value.startswith("/"):
                    cur["alw"].append(value)
            elif field == "crawl-delay":
                try:
                    cur["delay"] = float(value)
                except ValueError:
                    pass
    agent_l = agent.lower()
    best, best_len = None, -1
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                if best_len < 0:
                    best, best_len = g, 0
            elif a and agent_l.startswith(a) and len(a) > best_len:
                best, best_len = g, len(a)
    if best is None:
        return (None, [], [])
    return (best["delay"], list(best["dis"]), list(best["alw"]))


def robots_rules_grouped(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = ENGINE_AGENT,
) -> DataFrame:
    """Per-agent (host, crawl_delay_s, disallow) rules table.

    Same output schema as ``robots_rules`` — drop-in for
    ``scheduler.claim_round``/``filter_allowed`` — but directives are
    resolved to the group targeting ``agent``. Stateful line parsing runs
    as one Arrow-batched pandas UDF call per batch (no per-row Python
    round trips)."""

    @F.pandas_udf("crawl_delay_s double, disallow array<string>, allow array<string>")
    def parse(texts: pd.Series) -> pd.DataFrame:
        rows = [parse_robots_grouped_py(t, agent) for t in texts.fillna("")]
        return pd.DataFrame(
            {
                "crawl_delay_s": [r[0] for r in rows],
                "disallow": [r[1] for r in rows],
                "allow": [r[2] for r in rows],
            }
        )

    return df.select(
        F.col(host_col).alias("host"), parse(F.col(text_col)).alias("__r")
    ).select("host", "__r.crawl_delay_s", "__r.disallow", "__r.allow")


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


def _match_len(path: Column, prefixes: Column) -> Column:
    """Length of the longest prefix in ``prefixes`` matching ``path`` (0 when
    none match or the array is null/empty). Catalyst-native higher-order
    filter/transform/array_max — codegen'd, no UDF."""
    matching = F.filter(prefixes, lambda p: path.startswith(p))
    return F.coalesce(F.array_max(F.transform(matching, F.length)), F.lit(0))


def is_disallowed(url: Column, disallow: Column, allow: Column | None = None) -> Column:
    """RFC 9309 longest-match admission verdict for one URL.

    Without ``allow`` (legacy two-column rules): true when the URL's path
    starts with any Disallow prefix. With ``allow``: the longest matching
    rule of EITHER kind decides, ties resolve to allow (RFC 9309 §2.2.2) —
    so ``Disallow: /private`` + ``Allow: /private/press`` admits
    ``/private/press/x`` while still blocking the rest of ``/private``."""
    path = url_path_of(url)
    if allow is None:
        return F.exists(disallow, lambda p: path.startswith(p))
    return _match_len(path, disallow) > _match_len(path, allow)


def is_disallowed_py(url: str, disallow: list[str], allow: list[str] | None = None) -> bool:
    """Pure-Python twin of ``is_disallowed`` (property-test parity)."""
    rest = url.split("://", 1)[1] if "://" in url else url
    rest = rest.split("?", 1)[0]
    slash = rest.find("/")
    path = rest[slash:] if slash >= 0 else "/"
    dis_len = max((len(p) for p in (disallow or []) if path.startswith(p)), default=0)
    alw_len = max((len(p) for p in (allow or []) if path.startswith(p)), default=0)
    if allow is None:
        return dis_len > 0
    return dis_len > alw_len


def filter_allowed(frontier: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Drop frontier rows a robots rule excludes (longest-match precedence
    between Disallow and Allow when the rules table carries an ``allow``
    column; plain Disallow-prefix admission otherwise).

    Broadcast join on host (rules are per-host and small relative to the
    frontier); rows for hosts with no rules pass through."""
    has_allow = "allow" in rules.columns
    cols = ["host", F.col("disallow").alias("__dis")] + (
        [F.col("allow").alias("__alw")] if has_allow else []
    )
    r = F.broadcast(rules.select(*cols))
    joined = frontier.join(r, "host", "left")
    verdict = is_disallowed(
        F.col(url_col), F.col("__dis"), F.col("__alw") if has_allow else None
    )
    keep = F.col("__dis").isNull() | ~verdict
    out = joined.filter(keep).drop("__dis")
    return out.drop("__alw") if has_allow else out
