"""Recorded-tiktoken fixtures: exercise make_counter('tiktoken')'s REAL
tokenizer path (chunker.py — reference chunking.py:37-56) without the
package, by installing a fake ``tiktoken`` whose encoder replays a recorded
count table and raises for unknown strings (driving the reference's char/4
estimate, settings.py:77).

Two tables, deliberately separate:
- RECORDED — real cl100k_base counts for stable, well-known strings;
  re-verified against the real tokenizer whenever tiktoken IS importable,
  so the fixture can never silently drift from cl100k_base.
- SYNTH — explicit made-up counts (documented as such) used to pin
  chunk_text/_tail_overlap boundary arithmetic under a non-lexer counter;
  boundary behavior depends only on the counts fed in, not on whose
  tokenizer produced them."""

import importlib
import json
import sys
import types
from pathlib import Path

import pytest

from azure_blob_crawler_spark import config

RECORDED = {
    k: v
    for k, v in json.loads(
        (Path(__file__).parent / "fixtures" / "tiktoken_cl100k_counts.json").read_text()
    ).items()
    if not k.startswith("_")
}


class _TableEncoding:
    """Replays a count table; unknown text raises (→ char/4 fallback)."""

    def __init__(self, table):
        self.table = table

    def encode(self, text):
        if text not in self.table:
            raise KeyError(f"no recorded count for {text!r}")
        return list(range(self.table[text]))


def _counter_over(monkeypatch, table):
    fake = types.ModuleType("tiktoken")
    fake.get_encoding = lambda name: _TableEncoding(table)
    monkeypatch.setitem(sys.modules, "tiktoken", fake)
    import azure_blob_crawler_spark.operators.chunker as chunker

    return chunker.make_counter("tiktoken")


def test_recorded_counts_drive_the_tiktoken_path(monkeypatch):
    counter = _counter_over(monkeypatch, RECORDED)
    for text, want in RECORDED.items():
        assert counter(text) == want, text


def test_encode_failure_uses_char4_fallback(monkeypatch):
    """Unknown strings (incl. unicode) fall back to the reference's
    max(1, len(text)//4) estimate — settings.py:77."""
    counter = _counter_over(monkeypatch, RECORDED)
    for text in ("héllo wörld", "日本語のテキスト", "x", "a completely unrecorded sentence"):
        want = max(1, len(text) // config.FALLBACK_CHARS_PER_TOKEN)
        assert counter(text) == want, text


def test_chunk_boundaries_under_injected_counter(monkeypatch):
    """Budget arithmetic under a non-lexer counter: 4+4 fits an 8-token
    budget, the third sentence starts the next chunk."""
    from azure_blob_crawler_spark.operators.chunker import chunk_text

    doc = "Alpha beta. Gamma delta. Epsilon zeta."
    synth = {doc: 10, "Alpha beta": 4, "Gamma delta": 4, "Epsilon zeta": 4}
    counter = _counter_over(monkeypatch, synth)
    got = chunk_text(doc, max_tokens=8, overlap_tokens=0, counter=counter)
    assert got == ["Alpha beta Gamma delta", "Epsilon zeta"]
    # whole-doc fast path when the budget covers the counter's total
    assert chunk_text(doc, max_tokens=10, overlap_tokens=0, counter=counter) == [doc]


def test_tail_overlap_under_injected_counter(monkeypatch):
    """Word-suffix overlap selection follows the injected per-word counts
    (2-token budget keeps exactly the last two 1-token words)."""
    from azure_blob_crawler_spark.operators.chunker import chunk_text

    doc = "Alpha beta. Gamma delta. Epsilon zeta."
    synth = {
        doc: 10,
        "Alpha beta": 4,
        "Gamma delta": 4,
        "Epsilon zeta": 4,
        "Alpha": 1,
        "beta": 1,
        "Gamma": 1,
        "delta": 1,
        "Gamma delta Epsilon zeta": 6,
    }
    counter = _counter_over(monkeypatch, synth)
    got = chunk_text(doc, max_tokens=8, overlap_tokens=2, counter=counter)
    assert got == ["Alpha beta Gamma delta", "Gamma delta Epsilon zeta"]


def test_recorded_table_matches_real_tiktoken_when_available():
    """Honesty gate: with the real package present every recorded count must
    equal len(cl100k_base.encode(s)) — the fixtures cannot drift."""
    tiktoken = pytest.importorskip("tiktoken")
    enc = tiktoken.get_encoding("cl100k_base")
    for text, want in RECORDED.items():
        assert len(enc.encode(text)) == want, text


def test_real_module_unaffected_after_fixture(monkeypatch):
    """The fake module never leaks: a fresh make_counter outside the
    monkeypatch degrades to the lexer as before."""
    _counter_over(monkeypatch, RECORDED)
    monkeypatch.delitem(sys.modules, "tiktoken")
    import azure_blob_crawler_spark.operators.chunker as chunker

    importlib.reload(chunker)
    c = chunker.make_counter("tiktoken")
    assert c("a b c") == 3  # lexer semantics
