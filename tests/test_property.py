"""Property-based invariants (hypothesis) — pure-Python components only, so
these run fast and explore the input space the example tests can't."""

import re

from hypothesis import given, settings
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
