"""Property-based invariants (hypothesis) — pure-Python components only, so
these run fast and explore the input space the example tests can't."""

import re

from hypothesis import example, given, settings
from hypothesis import strategies as st

from azure_blob_crawler_spark.functions.urls import canonical_url_py, url_host_py
from azure_blob_crawler_spark.operators.chunker import chunk_text, count_tokens
from azure_blob_crawler_spark.operators.seen import CuckooChain

# words ≤ 8 chars so one word = one lexer token (keeps the budget invariant
# strict; the documented oversize-tail-word exception needs >8-char tokens)
words = st.text(alphabet="abcdefgh", min_size=1, max_size=8)
texts = st.lists(
    st.tuples(st.lists(words, min_size=1, max_size=30), st.sampled_from(". ! ? ".split())),
    min_size=0,
    max_size=20,
).map(lambda sents: " ".join(" ".join(ws) + p for ws, p in sents))


@settings(max_examples=60, deadline=None)
@given(texts, st.integers(8, 64), st.integers(0, 8))
def test_chunk_budget_and_coverage(text, max_tokens, overlap):
    chunks = chunk_text(text, max_tokens=max_tokens, overlap_tokens=overlap)
    in_words = re.findall(r"[a-h]+", text)
    if not in_words:
        assert chunks == [] or chunks == [text]
        return
    # 1. every chunk within budget + overlap: the reference's overlap path
    #    prepends up to ``overlap`` tokens to a sentence that alone fits the
    #    budget WITHOUT re-checking (chunking.py:104-111), so max+overlap is
    #    the true bound — found by hypothesis, verified against the cited
    #    reference logic
    if len(chunks) > 1 or chunks != [text]:
        for c in chunks:
            assert count_tokens(c) <= max_tokens + overlap
    # 2. chunks are non-empty after strip
    assert all(c.strip() for c in chunks)
    # 3. every input word appears in some chunk (no content loss)
    joined = " ".join(chunks)
    out_words = set(re.findall(r"[a-h]+", joined))
    assert set(in_words) <= out_words
    # 4. word order preserved: input word sequence is a subsequence of the
    #    concatenated output (overlap only repeats, never reorders)
    out_seq = re.findall(r"[a-h]+", joined)
    it = iter(out_seq)
    assert all(w in it for w in in_words)


url_paths = st.lists(
    st.one_of(st.sampled_from([".", ".."]), st.text(alphabet="abc0", min_size=1, max_size=4)),
    max_size=6,
)


@settings(max_examples=100, deadline=None)
@given(
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.text(alphabet="abcXYZ", min_size=1, max_size=8),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    url_paths,
    st.sampled_from(["", "?q=1", "#frag", "?q=1#frag"]),
)
def test_canonical_idempotent_and_sane(scheme, host, port, segs, tail):
    url = f"{scheme}://{host}.example.com{port}/" + "/".join(segs) + tail
    c1 = canonical_url_py(url)
    # idempotence: canonicalizing a canonical URL is a no-op
    assert canonical_url_py(c1) == c1
    # scheme+host lowercased, fragment gone, no dot segments remain
    assert c1.split("://")[0] == scheme.lower()
    assert "#" not in c1
    path = c1.split("://", 1)[1].split("?", 1)[0]
    assert "/./" not in path and "/../" not in path + "/"
    host_out = url_host_py(c1)
    assert host_out == host_out.lower()
    # the scheme's OWN default port is stripped; any other port is a
    # distinct origin and kept (http://h:443 ≠ http://h)
    default = {"http": ":80", "https": ":443"}[scheme.lower()]
    if port in ("", default):
        assert ":" not in host_out
    else:
        assert host_out.endswith(port)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=500, unique=True))
def test_cuckoo_no_false_negatives(keys):
    # deliberately undersized: growth must preserve every key
    cf = CuckooChain.sized(16)
    for k in keys:
        cf.insert(k)
    assert all(cf.contains(k) for k in keys)
    rt = CuckooChain.from_bytes(cf.to_bytes())
    assert all(rt.contains(k) for k in keys)


# fields may collide with OPERATOR words (GE, eq, …) — the position-aware
# translator must treat them as identifiers in field position (hypothesis-
# found round 4). Only not/and/or are excluded: 'not' is reserved in field
# position, and and/or field names would break this test's conjunction
# counting (they remain valid engine inputs).
odata_fields = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda f: f.lower() not in ("not", "and", "or")
)
odata_ops = st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le"])
odata_values = st.one_of(
    st.integers(-10**6, 10**6).map(str),
    st.from_regex(r"-?\d+\.\d+", fullmatch=True),
    st.text(alphabet="abc xyz0", max_size=8).map(lambda s: "'" + s.replace("'", "''") + "'"),
    st.sampled_from(["true", "false", "null"]),
)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(odata_fields, odata_ops, odata_values), min_size=1, max_size=4),
    st.sampled_from(["and", "or"]),
)
def test_odata_translator_total_on_valid_grammar(terms, conj):
    """Every expression in the supported grammar translates; the output
    contains only SQL comparators (never raw OData op words as operators)."""
    from azure_blob_crawler_spark.operators.query import _ODATA_OPS, odata_filter_to_sql

    expr = f" {conj} ".join(f"{f} {op} {v}" for f, op, v in terms)
    sql = odata_filter_to_sql(expr)
    # every comparison operator was rewritten to its SQL symbol, in order
    toks = sql.split()
    got_ops = [t for t in toks if t in ("=", "<>", ">", ">=", "<", "<=")]
    assert got_ops == [_ODATA_OPS[op] for _, op, _ in terms]
    assert toks.count(conj.upper()) == len(terms) - 1
    assert sql.count("'") % 2 == 0  # quotes stay balanced


@settings(max_examples=60, deadline=None)
@example("'0")  # hypothesis-found: dangling quote must not pass through
@example("name eq 'a")
@example("'")
@given(st.text(max_size=40))
def test_odata_translator_never_passes_junk(junk):
    """Arbitrary text either translates (pure supported tokens) or raises —
    no silent passthrough of unvalidated SQL."""
    import re as _re

    from azure_blob_crawler_spark.operators.query import odata_filter_to_sql

    try:
        sql = odata_filter_to_sql(junk)
    except ValueError:
        return
    # accepted ⇒ every emitted token is from the safe alphabet
    for tok in sql.split():
        assert (
            tok in ("AND", "OR", "NOT", "(", ")", "=", "<>", ">", ">=", "<", "<=",
                     "true", "false", "null")
            or _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tok)
            or _re.fullmatch(r"-?\d+(\.\d+)?", tok)
            or _re.fullmatch(r"'(?:[^']|'')*'", tok)
        ), tok


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.from_regex(r"/[a-z0-9/]{0,12}", fullmatch=True), max_size=5),
    st.one_of(st.none(), st.floats(0.1, 99, allow_nan=False).map(lambda f: round(f, 2))),
)
def test_robots_text_roundtrip(prefixes, delay):
    """Generated robots.txt parses back to exactly its directives through
    the MODULE's regexes (the ones both the Spark and DuckDB sides use)."""
    import re as _re

    from azure_blob_crawler_spark.functions.robots import _DELAY_RX, _DISALLOW_RX

    txt = "User-agent: *\n"
    if delay is not None:
        txt += f"Crawl-delay: {delay}\n"
    for p in prefixes:
        txt += f"Disallow: {p}\n"
    txt += "Allow: /\n"
    got_delay = _re.search(_DELAY_RX, txt)
    assert (got_delay is None) == (delay is None)
    if delay is not None:
        assert float(got_delay.group(1)) == delay
    assert _re.findall(_DISALLOW_RX, txt) == prefixes


agent_tokens = st.from_regex(r"[a-z][a-z0-9-]{0,8}", fullmatch=True)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(agent_tokens, min_size=1, max_size=3, unique=True),
            st.one_of(st.none(), st.floats(0.1, 99, allow_nan=False).map(lambda f: round(f, 1))),
            st.lists(st.from_regex(r"/[a-z0-9/]{0,10}", fullmatch=True), max_size=4),
        ),
        min_size=1,
        max_size=4,
    ),
    st.booleans(),
)
def test_grouped_robots_roundtrip(groups, add_star):
    """Rendered multi-group robots.txt parses back to the RIGHT group for an
    agent that appears in exactly one group; agents in no group resolve to
    the '*' group iff one exists."""
    from azure_blob_crawler_spark.functions.robots import parse_robots_grouped_py

    lines = []
    for agents, delay, prefixes in groups:
        for a in agents:
            lines.append(f"User-agent: {a}")
        if delay is not None:
            lines.append(f"Crawl-delay: {delay}")
        for p in prefixes:
            lines.append(f"Disallow: {p}")
        if delay is None and not prefixes:
            lines.append("Allow: /")  # close the agent run like real files do
        lines.append("")
    star_delay, star_dis = 77.0, ["/starred"]
    if add_star:
        lines += ["User-agent: *", f"Crawl-delay: {star_delay}",
                  f"Disallow: {star_dis[0]}", ""]
    txt = "\n".join(lines)

    # an agent token appearing in exactly one group resolves to that group
    # (unless a token from another group is a PREFIX of it — RFC-9309
    # longest-prefix matching makes that the expected winner, so skip those)
    all_tokens = [a for agents, _, _ in groups for a in agents]
    for agents, delay, prefixes in groups:
        # the "Allow: /" run-closer is itself captured as an allow prefix
        exp_alw = ["/"] if (delay is None and not prefixes) else []
        for a in agents:
            if all_tokens.count(a) != 1:
                continue
            if any(t != a and a.startswith(t) for t in all_tokens):
                continue
            got = parse_robots_grouped_py(txt, a)
            assert got == (delay, prefixes, exp_alw), (a, txt)

    # unknown agent: '*' group iff present
    unknown = "zz-unmatched-agent-9"
    if not any(unknown.startswith(t) for t in all_tokens):
        got = parse_robots_grouped_py(txt, unknown)
        assert got == (
            (star_delay, star_dis, []) if add_star else (None, [], [])
        )
