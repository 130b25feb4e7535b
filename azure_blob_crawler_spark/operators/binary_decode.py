"""Real binary document decoding — stdlib-only DOCX and (simple) PDF tiers.

The reference decodes binary blobs with PyPDF2 / python-docx
(shared/processing/file_extractor.py:118-204). Neither package ships in
this container, but their *commonly exercised* subset needs no third-party
code at all:

- **DOCX** is a ZIP (``zipfile``) holding ``word/document.xml``; paragraph
  text is the concatenation of ``w:t`` runs under each body-level ``w:p``
  (exactly ``python-docx``'s ``Document.paragraphs[i].text`` for body
  paragraphs — the surface file_extractor.py:163-171 iterates). Full
  fidelity for the paragraph-text path.
- **PDF**: a minimal content-stream text extractor for the dominant simple
  case — uncompressed or filtered streams (``/FlateDecode`` via ``zlib``,
  ``/LZWDecode`` per §7.4.4 with EarlyChange, ``/ASCII85Decode`` and
  ``/ASCIIHexDecode``, chained in order; 8-bit ``/Predictor`` 2/PNG
  post-passes invert via the PNG decoder's shared unfilter; image codecs
  stay declared limits), text shown
  via ``Tj`` / ``'`` / ``TJ`` with literal ``(…)`` or hex ``<…>``
  strings, newlines at line-advance operators (``Td TD T* '``). Pages
  come from the REAL page tree: the trailer's ``/Root`` (or the
  ``/Type /Catalog`` object) → ``/Pages`` → ``/Kids`` recursion →
  each ``/Type /Page``'s ``/Contents`` (single ref or array), so pages
  order by tree position regardless of object order in the file, and a
  multi-stream page concatenates its streams. Objects are indexed by
  scanning ``N G obj … endobj`` headers (stream bodies skipped) rather
  than trusting xref byte offsets — same objects, resilient to the
  off-by-ones real-world writers leave behind. Files with no walkable
  tree fall back to content streams in document order. PDF 1.5
  ``/Type /ObjStm`` containers are expanded (their ``/N`` × ``objnum
  offset`` header + ``/First``-based bodies, ISO 32000-1 §7.5.7) so
  compressed-storage catalogs/page trees walk the same way; xref
  streams themselves never need parsing because objects are found by
  scanning, and ``/Root`` falls back to the ``/Type /Catalog`` object.
  Composite (Type0 / CID, e.g. Identity-H-encoded subset TrueType) and
  remapped simple fonts decode through their ``/ToUnicode`` CMap: the
  page's ``/Resources /Font`` dict (own or inherited from a ``/Pages``
  ancestor, ISO 32000-1 §7.7.3.4) is resolved, each font's CMap stream
  is parsed (``codespacerange`` code width, ``bfchar`` pairs,
  ``bfrange`` in both base-increment and array forms, multi-code-unit
  UTF-16BE destinations), and show-string bytes step code-width-wise
  through the mapping while ``Tf`` tracks the current font. Fonts
  without a ToUnicode keep the latin-1 byte interpretation.
  DECLARED LIMITS (PyPDF2 territory): no encryption, no
  glyph-name/Differences fallback when a font ships no ToUnicode.

Decoded page/paragraph text feeds the SAME span builders as the text tier
(operators/extraction.py) so markers, blank-page skipping and ordering stay
pinned by one set of tests; ``make_extract_spans_binary_udf`` is the
Arrow-vectorized entry point for ``binaryFile``-sourced crawls.
"""

from __future__ import annotations

import base64
import io
import re
import zipfile
import zlib
from xml.etree import ElementTree

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from azure_blob_crawler_spark.operators.extraction import (
    SPANS_TYPE,
    _docx_spans,
    _pdf_spans,
    extract_spans_py,
)

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def docx_paragraphs(data: bytes) -> list[str]:
    """Body-level paragraph texts of a .docx (python-docx parity: one entry
    per ``w:p`` directly under ``w:body``; a paragraph's text is its
    ``w:t`` runs concatenated, tabs/breaks as-is)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        xml = zf.read("word/document.xml")
    root = ElementTree.fromstring(xml)
    body = root.find(f"{_W_NS}body")
    if body is None:
        return []
    out = []
    for child in body:
        if child.tag == f"{_W_NS}p":
            out.append("".join(t.text or "" for t in child.iter(f"{_W_NS}t")))
    return out


_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
# one content-stream token at a time: string, name, operator, number
_PDF_TOKEN = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # literal string with escapes
    rb"|<[0-9A-Fa-f\s]*>"      # hex string
    rb"|/[^\s/<>\[\]()]+"      # name (font selections: /F1 12 Tf)
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+"         # operators
    rb"|[-+.0-9]+"             # numbers
)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_literal(tok: bytes) -> bytes:
    """Raw bytes of a PDF literal string token ``(…)`` (escapes + octal)."""
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt.isdigit():
                oct_digits = body[i + 1 : i + 4]
                m = re.match(rb"[0-7]{1,3}", oct_digits)
                out.append(int(m.group(0), 8) & 0xFF)
                i += 1 + len(m.group(0))
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _pdf_hex(tok: bytes) -> bytes:
    hx = re.sub(rb"\s", b"", tok[1:-1])
    if len(hx) % 2:
        hx += b"0"  # PDF spec: odd final digit is padded with 0
    return bytes.fromhex(hx.decode("ascii"))


def _cmap_decode(raw: bytes, cmap: "tuple[int, dict[int, str]]") -> str:
    """Map show-string bytes through a ToUnicode CMap: step ``width`` bytes
    per code, unmapped codes → U+FFFD (a torn trailing partial code is
    dropped, matching reader behavior for malformed subset strings)."""
    width, mapping = cmap
    return "".join(
        mapping.get(int.from_bytes(raw[i : i + width], "big"), "�")
        for i in range(0, len(raw) - width + 1, width)
    )


def _stream_text(
    content: bytes, fonts: "dict[bytes, tuple[int, dict[int, str]] | None] | None" = None
) -> str:
    """Shown text of one content stream: strings from Tj/'/TJ in order,
    newline at line-advance operators. ``fonts`` maps resource names
    (``b'F1'``) to a parsed ToUnicode CMap (or None); ``Tf`` switches the
    current font, and show strings under a CMap-carrying font decode
    code-width-wise instead of byte-per-char latin-1."""
    parts: list[str] = []
    pending: list[bytes] = []  # raw string bytes seen since the last show op
    cur_cmap: "tuple[int, dict[int, str]] | None" = None
    last_name: bytes | None = None

    def _decode(raws: list[bytes]) -> "list[str]":
        if cur_cmap is not None:
            return [_cmap_decode(r, cur_cmap) for r in raws]
        return [r.decode("latin-1") for r in raws]

    for m in _PDF_TOKEN.finditer(content):
        tok = m.group(0)
        if tok.startswith(b"("):
            pending.append(_pdf_literal(tok))
        elif tok.startswith(b"<"):
            pending.append(_pdf_hex(tok))
        elif tok.startswith(b"/"):
            last_name = tok[1:]
        elif tok == b"Tf":
            cur_cmap = (fonts or {}).get(last_name)
        elif tok in (b"Tj", b"TJ", b"'", b'"'):
            parts.extend(_decode(pending))
            pending = []
            if tok in (b"'", b'"'):  # show-with-line-advance
                parts.append("\n")
        elif tok in (b"Td", b"TD", b"T*"):
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
            pending = []
        elif tok == b"ET":
            pending = []
    return "".join(parts)


_OBJ_HEAD = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_KW = re.compile(rb"\bstream\b")  # \b rejects the tail of 'endstream'


def _pdf_objects(data: bytes) -> dict[int, bytes]:
    """obj number → body bytes for every ``N G obj … endobj`` in the file.
    A body's ``stream … endstream`` section is skipped before looking for
    ``endobj`` so binary stream data can't truncate the object."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_HEAD.finditer(data):
        start = m.end()
        end = data.find(b"endobj", start)
        sm = _STREAM_KW.search(data, start, end if end != -1 else len(data))
        if sm:
            es = data.find(b"endstream", sm.end())
            if es != -1:
                end = data.find(b"endobj", es)
        if end == -1:
            continue
        # last occurrence wins: an incrementally-updated PDF appends the
        # replacement object (and its xref) after the original
        objs[int(m.group(1))] = data[start:end]
    # PDF 1.5 compressed object storage: expand /Type /ObjStm containers so
    # the page-tree walk sees their dict-only objects too. Top-level objects
    # keep precedence (an incremental update that replaces a compressed
    # object writes it top-level).
    for body in [b for b in objs.values() if re.search(rb"/Type\s*/ObjStm\b", b)]:
        for num, obj in _objstm_objects(body).items():
            objs.setdefault(num, obj)
    return objs


def _ref(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _ref_list(body: bytes, key: bytes) -> list[int]:
    """Refs of ``/Key [a 0 R b 0 R …]``, or the single ``/Key a 0 R``."""
    m = re.search(rb"/" + key + rb"\s*\[(.*?)\]", body, re.DOTALL)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    r = _ref(body, key)
    return [r] if r is not None else []


def _balanced_dict(body: bytes, key: bytes, objs: dict[int, bytes]) -> bytes | None:
    """Bytes of ``/Key << … >>`` (balanced ``<< >>`` scan, so nested dicts
    survive) or the referenced object's body for ``/Key N 0 R``; None when
    the key is absent."""
    m = re.search(rb"/" + key + rb"\s*(<<|(\d+)\s+\d+\s+R)", body)
    if not m:
        return None
    if m.group(2) is not None:
        return objs.get(int(m.group(2)))
    i = m.start(1)
    depth, j = 0, i
    while j < len(body) - 1:
        two = body[j : j + 2]
        if two == b"<<":
            depth += 1
            j += 2
        elif two == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return body[i:j]
        else:
            j += 1
    return None


def _utf16be_hex(hx: bytes) -> str:
    if len(hx) % 2:
        hx = b"0" + hx
    return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", errors="replace")


_BF_ARRAY = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", re.DOTALL)
_BF_TRIPLE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_BF_PAIR = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")


def _parse_cmap(raw: bytes) -> "tuple[int, dict[int, str]] | None":
    """ToUnicode CMap → (code byte-width, code → unicode string). Handles
    ``bfchar`` pairs, ``bfrange`` in base-increment form (ISO 32000-1
    §9.10.3: the destination's last code unit increments across the range)
    and array form, and multi-code-unit UTF-16BE destinations (ligatures).
    Code width comes from ``codespacerange``'s low bound (Identity-H → 2);
    None when the stream maps nothing."""
    mapping: dict[int, str] = {}
    width = None
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", raw, re.DOTALL)
    if m:
        hx = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if hx:
            width = max(1, len(hx[0]) // 2)
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", raw, re.DOTALL):
        body = sec.group(1)
        for lo, _hi, arr in _BF_ARRAY.findall(body):
            for i, dst in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                mapping[int(lo, 16) + i] = _utf16be_hex(dst)
        body = _BF_ARRAY.sub(b"", body)  # keep triples from re-matching array rows
        for lo, hi, dst in _BF_TRIPLE.findall(body):
            lo_i, span = int(lo, 16), min(int(hi, 16) - int(lo, 16) + 1, 65536)
            base, pad = int(dst, 16), len(dst)
            for i in range(span):
                mapping[lo_i + i] = _utf16be_hex(b"%0*X" % (pad, base + i))
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", raw, re.DOTALL):
        for src, dst in _BF_PAIR.findall(sec.group(1)):
            mapping[int(src, 16)] = _utf16be_hex(dst)
    if not mapping:
        return None
    if width is None:
        width = 2 if max(mapping) > 0xFF else 1
    return width, mapping


def _page_fonts(
    objs: dict[int, bytes],
    resources: bytes | None,
    cmap_cache: "dict[int, tuple[int, dict[int, str]] | None]",
) -> "dict[bytes, tuple[int, dict[int, str]] | None] | None":
    """Resource name → parsed ToUnicode CMap (or None) for a page's
    ``/Resources /Font`` dict. CMaps are parsed once per font object
    across the document (``cmap_cache``)."""
    if resources is None:
        return None
    font_dict = _balanced_dict(resources, b"Font", objs)
    if font_dict is None:
        return None
    fonts: "dict[bytes, tuple[int, dict[int, str]] | None]" = {}
    for fm in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", font_dict):
        name, fnum = fm.group(1), int(fm.group(2))
        if fnum not in cmap_cache:
            cmap = None
            tu = _ref(objs.get(fnum, b""), b"ToUnicode")
            if tu is not None:
                raw = _raw_stream(objs.get(tu, b""))[1]
                if raw is not None:
                    cmap = _parse_cmap(raw)
            cmap_cache[fnum] = cmap
        fonts[name] = cmap_cache[fnum]
    return fonts or None


def _walk_page_tree(
    objs: dict[int, bytes],
    num: int,
    seen: set[int],
    out: "list[tuple[list[int], bytes | None]]",
    depth: int = 0,
    inherited_res: bytes | None = None,
) -> None:
    """Depth-first /Pages → /Kids recursion collecting each /Type /Page's
    (content-stream refs, effective /Resources) in tree order — Resources
    inherit from the nearest /Pages ancestor (§7.7.3.4) — cycle + depth
    guarded."""
    if depth > 64 or num in seen:
        return
    seen.add(num)
    body = objs.get(num)
    if body is None:
        return
    res = _balanced_dict(body, b"Resources", objs) or inherited_res
    if re.search(rb"/Type\s*/Page\b", body):
        out.append((_ref_list(body, b"Contents"), res))
        return
    for kid in _ref_list(body, b"Kids"):
        _walk_page_tree(objs, kid, seen, out, depth + 1, res)


def _lzw_decode_pdf(data: bytes) -> bytes:
    """PDF LZWDecode (ISO 32000-1 §7.4.4): MSB-first variable-width codes
    starting at 9 bits, Clear=256, EOD=257, EarlyChange=1 (code width grows
    one code early, at 511/1023/2047)."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
            out += entry
            prev = entry
            # EarlyChange: the encoder bumps when ITS next free code hits
            # 2^w - 1; the decoder's table lags one entry behind, so it
            # bumps at 2^w - 2 to stay aligned on the same code boundary
            # (libtiff's "less 1 for early change").
            if next_code >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


_PARMS_UNSUPPORTED = object()  # sentinel: /DecodeParms present but unparseable


def _parse_parms_dict(d: bytes) -> "dict[str, int]":
    def g(key: bytes, default: int) -> int:
        mm = re.search(rb"/" + key + rb"\s+(\d+)", d)
        return int(mm.group(1)) if mm else default

    return {
        "pred": g(b"Predictor", 1),
        "columns": g(b"Columns", 1),
        "colors": g(b"Colors", 1),
        "bpc": g(b"BitsPerComponent", 8),
    }


def _decode_parms_list(dict_part: bytes, filters: "list[bytes]"):
    """Per-filter predictor parameters from /DecodeParms (or /DP), aligned
    with the /Filter chain. Three shapes per §7.3.8: direct dict (applies to
    the chain's predictor-capable filters), array (`[null <<...>>]`, entry i
    pairing with filter i), and indirect reference (`N 0 R`) — the last is
    unresolvable here, so it returns ``_PARMS_UNSUPPORTED`` and the caller
    drops the stream instead of treating undifferenced bytes as valid text."""
    m = re.search(rb"/(?:DecodeParms|DP)(?![A-Za-z])\s*", dict_part)
    if not m:
        return [None] * len(filters)
    rest = dict_part[m.end():]
    if rest.startswith(b"<<"):
        mm = re.match(rb"<<(.*?)>>", rest, re.DOTALL)
        if not mm:
            return _PARMS_UNSUPPORTED
        return [_parse_parms_dict(mm.group(1))] * len(filters)
    if rest.startswith(b"["):
        out: "list[dict[str, int] | None]" = []
        pos = 1
        while pos < len(rest):
            ws = re.match(rb"\s+", rest[pos:])
            if ws:
                pos += ws.end()
                continue
            if rest.startswith(b"]", pos):
                out.extend([None] * (len(filters) - len(out)))
                return out
            if rest.startswith(b"null", pos):
                out.append(None)
                pos += 4
                continue
            if rest.startswith(b"<<", pos):
                mm = re.match(rb"<<(.*?)>>", rest[pos:], re.DOTALL)
                if not mm:
                    return _PARMS_UNSUPPORTED
                out.append(_parse_parms_dict(mm.group(1)))
                pos += mm.end()
                continue
            return _PARMS_UNSUPPORTED  # indirect ref or unknown token
        return _PARMS_UNSUPPORTED  # unterminated array
    return _PARMS_UNSUPPORTED  # indirect reference (`N 0 R`) or scalar


def _unpredict(raw: bytes, parms: "dict[str, int]") -> bytes | None:
    """Invert the /Predictor post-pass on Flate/LZW output (§7.4.4.4):
    2 = TIFF horizontal differencing, ≥10 = PNG row filters (tag byte per
    row, shared with the PNG decoder's unfilter). 8-bit components only;
    None signals unsupported."""
    pred, columns, colors, bpc = (
        parms["pred"], parms["columns"], parms["colors"], parms["bpc"],
    )
    if pred <= 1:
        return raw
    if bpc != 8:
        return None
    stride = columns * colors
    if pred == 2:  # TIFF: per-component left-delta → cumsum along the row
        n = len(raw) // stride
        arr = np.frombuffer(raw, np.uint8, n * stride).reshape(n, columns, colors)
        return np.add.accumulate(arr, axis=1, dtype=np.uint8).tobytes()
    if pred >= 10:  # PNG filters, one tag byte per row
        from azure_blob_crawler_spark.operators.multimodal import _unfilter_png

        n = len(raw) // (1 + stride)
        rows = np.frombuffer(raw, np.uint8, n * (1 + stride)).reshape(n, 1 + stride)
        try:
            return _unfilter_png(rows, max(1, colors)).tobytes()
        except ValueError:
            return None
    return None


def _apply_filters(dict_part: bytes, raw: bytes) -> bytes | None:
    """Run the stream's /Filter chain (name or array, in order):
    Flate, LZW (with optional /Predictor post-pass), ASCII85, ASCIIHex.
    None for unsupported members (DCTDecode, JPX, ...) — honest limits."""
    m = _FILTER_RE.search(dict_part)
    if not m:
        return raw
    filters = re.findall(rb"/([A-Za-z0-9]+)", m.group(1))
    parms_list = _decode_parms_list(dict_part, filters)
    if parms_list is _PARMS_UNSUPPORTED:
        return None
    for f, parms in zip(filters, parms_list):
        try:
            if f == b"FlateDecode" or f == b"Fl":
                raw = zlib.decompress(raw.strip(b"\r\n"))
                if parms:
                    raw = _unpredict(raw, parms)
                    if raw is None:
                        return None
            elif f == b"LZWDecode" or f == b"LZW":
                raw = _lzw_decode_pdf(raw.strip(b"\r\n"))
                if parms:
                    raw = _unpredict(raw, parms)
                    if raw is None:
                        return None
            elif f == b"ASCII85Decode" or f == b"A85":
                body = re.sub(rb"\s", b"", raw)
                body = body.removeprefix(b"<~").removesuffix(b"~>").removesuffix(b"~")
                raw = base64.a85decode(body)
            elif f == b"ASCIIHexDecode" or f == b"AHx":
                hx = re.sub(rb"[\s>]", b"", raw)
                if len(hx) % 2:
                    hx += b"0"
                raw = bytes.fromhex(hx.decode("ascii"))
            else:
                return None  # DCTDecode, JBIG2, JPX, Crypt — declared limit
        except (zlib.error, ValueError):
            return None
    return raw


def _raw_stream(body: bytes) -> tuple[bytes | None, bytes | None]:
    """(stream dict, decoded stream bytes) of an object body — bytes is
    None when there is no stream or the filter chain is unsupported."""
    sm = _STREAM_RE.search(body)
    if not sm:
        return None, None
    dict_part, raw = sm.groups()
    return dict_part, _apply_filters(dict_part, raw)


def _decode_stream(
    body: bytes,
    fonts: "dict[bytes, tuple[int, dict[int, str]] | None] | None" = None,
) -> str | None:
    """Text of the object body's content stream ('' when it shows nothing,
    None when there is no stream / an unsupported filter)."""
    raw = _raw_stream(body)[1]
    return None if raw is None else _stream_text(raw, fonts)


def _objstm_objects(body: bytes) -> dict[int, bytes]:
    """Objects packed in a PDF 1.5 ``/Type /ObjStm`` container: the stream
    opens with ``/N`` pairs of ``objnum offset`` integers, object bodies
    start at ``/First`` + offset (ISO 32000-1 §7.5.7). Streams themselves
    cannot live inside an ObjStm, so every entry is a dict-only object —
    exactly what the page-tree walk needs."""
    dict_part, raw = _raw_stream(body)
    if raw is None:
        return {}
    n = re.search(rb"/N\s+(\d+)", dict_part)
    first = re.search(rb"/First\s+(\d+)", dict_part)
    if not n or not first:
        return {}
    first = int(first.group(1))
    head = raw[:first].split()
    pairs = [
        (int(head[2 * i]), int(head[2 * i + 1]))
        for i in range(min(int(n.group(1)), len(head) // 2))
    ]
    out = {}
    for i, (objnum, off) in enumerate(pairs):
        end = pairs[i + 1][1] if i + 1 < len(pairs) else len(raw) - first
        out[objnum] = raw[first + off : first + end]
    return out


def _pdf_pages_via_tree(data: bytes) -> list[str] | None:
    """Page texts in page-TREE order (multi-stream pages concatenated), or
    None when the file has no walkable catalog/page tree."""
    try:
        objs = _pdf_objects(data)
        if not objs:
            return None
        root = None
        tm = re.search(rb"trailer(.*?)(?:startxref|%%EOF)", data, re.DOTALL)
        if tm:
            root = _ref(tm.group(1), b"Root")
        if root is None:  # xref-stream files carry /Root in the catalog only
            root = next(
                (n for n, b in objs.items() if re.search(rb"/Type\s*/Catalog\b", b)),
                None,
            )
        if root is None:
            return None
        pages_root = _ref(objs.get(root, b""), b"Pages")
        if pages_root is None:
            return None
        page_refs: "list[tuple[list[int], bytes | None]]" = []
        _walk_page_tree(objs, pages_root, set(), page_refs)
        if not page_refs:
            return None
        out = []
        cmap_cache: "dict[int, tuple[int, dict[int, str]] | None]" = {}
        for refs, res in page_refs:
            fonts = _page_fonts(objs, res, cmap_cache)
            texts = [
                t for r in refs
                if (t := _decode_stream(objs.get(r, b""), fonts)) is not None
            ]
            out.append("".join(texts).strip())
        return out
    except Exception:
        return None  # degenerate file → document-order fallback


def pdf_page_texts(data: bytes) -> list[str]:
    """Per-page text of a simple PDF: page-tree order when the catalog is
    walkable (object order in the file is irrelevant; a page's multiple
    content streams concatenate), else content streams in document order.
    Streams that are not content (fonts, images, xref streams) rarely
    produce text tokens and yield '' — dropped."""
    via_tree = _pdf_pages_via_tree(data)
    if via_tree is not None:
        return via_tree
    pages = []
    for dict_part, raw in _STREAM_RE.findall(data):
        body = _apply_filters(dict_part, raw)
        if body is None:
            continue  # unsupported filter chain — declared limit
        text = _stream_text(body).strip()
        if text:
            pages.append(text)
    return pages


def looks_like_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"


def looks_like_docx(data: bytes) -> bool:
    if data[:2] != b"PK":
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return "word/document.xml" in zf.namelist()
    except zipfile.BadZipFile:
        return False


def extract_spans_binary_py(name: str, data: bytes, size_bytes: int) -> list[dict]:
    """Binary-aware span extraction: real PDF/DOCX decode when the bytes
    carry the magic, else lossy-utf8 + the text tier (same fallback the
    reference's decode path takes for unknown bytes)."""
    data = data or b""
    if looks_like_pdf(data):
        # reuse the text tier's page-span builder via its \f wire format —
        # markers, blank-page skipping and offsets stay single-sourced
        return _pdf_spans("\f".join(pdf_page_texts(data)))
    if looks_like_docx(data):
        return _docx_spans("\n".join(docx_paragraphs(data)))
    text = data.decode("utf-8", errors="replace")
    return extract_spans_py(name, text, size_bytes)


def make_extract_spans_binary_udf():
    @F.pandas_udf(SPANS_TYPE)
    def extract_spans_binary(
        names: pd.Series, datas: pd.Series, sizes: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                extract_spans_binary_py(n or "", bytes(d) if d is not None else b"", int(s or 0))
                for n, d, s in zip(names, datas, sizes)
            ]
        )

    return extract_spans_binary
