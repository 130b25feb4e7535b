"""Real binary DOCX/PDF decoding (stdlib tiers) — fixtures built in-test,
span output single-sourced through the text tier's builders."""

import io
import zipfile
import zlib

from pyspark.sql import functions as F

from azure_blob_crawler_spark import config
from azure_blob_crawler_spark.operators.binary_decode import (
    docx_paragraphs,
    extract_spans_binary_py,
    looks_like_docx,
    looks_like_pdf,
    make_extract_spans_binary_udf,
    pdf_page_texts,
)

_DOC_XML = """<?xml version="1.0"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
 <w:body>
  <w:p><w:r><w:t>Para one</w:t></w:r><w:r><w:t> continued</w:t></w:r></w:p>
  <w:p><w:r><w:t>Para two</w:t></w:r></w:p>
  <w:tbl><w:tr><w:tc><w:p><w:r><w:t>inside table</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
  <w:p><w:r><w:t>Para three</w:t></w:r></w:p>
 </w:body>
</w:document>"""


def make_docx(xml: str = _DOC_XML, n_extra_paras: int = 0) -> bytes:
    if n_extra_paras:
        paras = "".join(
            f"<w:p><w:r><w:t>Extra {i}</w:t></w:r></w:p>" for i in range(n_extra_paras)
        )
        xml = xml.replace("</w:body>", paras + "</w:body>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("word/document.xml", xml)
    return buf.getvalue()


def make_pdf() -> bytes:
    """Two content streams: one plain (literal + hex + escapes + line ops),
    one FlateDecode-compressed."""
    s1 = b"BT /F1 12 Tf 72 700 Td (Hello world) Tj T* <4279746573> Tj T* (Caf\\351 \\(ok\\)) Tj ET"
    s2z = zlib.compress(b"BT (Page two) Tj ET")
    parts = [b"%PDF-1.4\n"]
    parts.append(
        b"1 0 obj << /Length %d >> stream\n%s\nendstream endobj\n" % (len(s1), s1)
    )
    parts.append(
        b"2 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj\n"
        % (len(s2z), s2z)
    )
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def test_docx_paragraphs_body_level_only():
    data = make_docx()
    assert looks_like_docx(data) and not looks_like_pdf(data)
    # run concatenation within a paragraph; table paragraphs excluded
    assert docx_paragraphs(data) == ["Para one continued", "Para two", "Para three"]


def test_docx_spans_section_windows():
    # 3 body paras + 40 extra = 43 → sections of 20/20/3
    data = make_docx(n_extra_paras=40)
    spans = extract_spans_binary_py("f.docx", data, len(data))
    assert [s["kind"] for s in spans] == ["section"] * 3
    assert spans[0]["text"].startswith(f"{config.SECTION_PREFIX}1{config.PAGE_SUFFIX}")
    assert spans[2]["text"].count("\n") == 3  # marker + 3 paragraphs


def test_pdf_page_texts_plain_and_flate():
    data = make_pdf()
    assert looks_like_pdf(data)
    pages = pdf_page_texts(data)
    assert pages == ["Hello world\nBytes\nCafé (ok)", "Page two"]


def test_pdf_spans_markers_and_order():
    data = make_pdf()
    spans = extract_spans_binary_py("f.pdf", data, len(data))
    assert [s["kind"] for s in spans] == ["page", "page"]
    assert spans[0]["text"].startswith(f"{config.PAGE_PREFIX}1{config.PAGE_SUFFIX}\n")
    assert spans[1]["text"] == f"{config.PAGE_PREFIX}2{config.PAGE_SUFFIX}\nPage two"


def make_tree_pdf(shuffle: bool = True) -> bytes:
    """Three-page PDF with a REAL catalog/page tree: nested /Pages nodes,
    page 1 split across TWO content streams (array /Contents), and — when
    ``shuffle`` — objects written physically out of page order, so only a
    tree walk can order the pages correctly."""
    streams = {
        10: b"BT (Page one, part A. ) Tj ET",
        11: zlib.compress(b"BT (part B.) Tj ET"),
        12: b"BT (Page two) Tj ET",
        13: b"BT (Page three) Tj ET",
    }
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 3 >>",
        # nested interior node holding pages 1 and 2
        3: b"<< /Type /Pages /Kids [4 0 R 5 0 R] /Count 2 /Parent 2 0 R >>",
        4: b"<< /Type /Page /Parent 3 0 R /Contents [10 0 R 11 0 R] >>",
        5: b"<< /Type /Page /Parent 3 0 R /Contents 12 0 R >>",
        6: b"<< /Type /Page /Parent 2 0 R /Contents 13 0 R >>",
    }
    order = [13, 6, 12, 5, 11, 10, 4, 3, 2, 1] if shuffle else sorted(objs) + sorted(streams)
    parts = [b"%PDF-1.4\n"]
    for n in order:
        if n in streams:
            s = streams[n]
            filt = b" /Filter /FlateDecode" if n == 11 else b""
            parts.append(
                b"%d 0 obj << /Length %d%s >> stream\n%s\nendstream endobj\n"
                % (n, len(s), filt, s)
            )
        else:
            parts.append(b"%d 0 obj %s endobj\n" % (n, objs[n]))
    parts.append(b"trailer << /Size 14 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    return b"".join(parts)


def test_pdf_page_tree_orders_and_concatenates():
    data = make_tree_pdf(shuffle=True)
    # document order would yield [three, two, partB, partA]; the tree walk
    # must order pages 1..3 and concatenate page 1's two streams
    assert pdf_page_texts(data) == [
        "Page one, part A. part B.",
        "Page two",
        "Page three",
    ]
    assert pdf_page_texts(make_tree_pdf(shuffle=False)) == pdf_page_texts(data)
    spans = extract_spans_binary_py("t.pdf", data, len(data))
    assert spans[0]["text"].endswith("Page one, part A. part B.")
    assert len(spans) == 3


def test_pdf_incremental_update_newest_object_wins():
    base = make_tree_pdf(shuffle=False)
    # incremental update: append a replacement for page 3's content stream
    patch = (
        b"13 0 obj << /Length 23 >> stream\nBT (Page three v2) Tj ET\nendstream endobj\n"
        b"trailer << /Size 14 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    )
    assert pdf_page_texts(base + patch)[2] == "Page three v2"


def test_pdf_degenerate_tree_falls_back_to_stream_order():
    # a catalog pointing at a missing /Pages object → document-order tier
    data = (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 9 0 R >> endobj\n"
        b"2 0 obj << /Length 19 >> stream\nBT (Only page) Tj ET\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_page_texts(data) == ["Only page"]
    # self-referential kids must not loop
    cyc = (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [2 0 R] >> endobj\n"
        b"3 0 obj << /Length 19 >> stream\nBT (Loop free) Tj ET\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_page_texts(cyc) == ["Loop free"]


def make_objstm_pdf() -> bytes:
    """PDF 1.5-style file: the catalog and the whole page tree live inside
    a Flate-compressed /Type /ObjStm (built forward per ISO 32000-1
    §7.5.7: N pairs of 'objnum offset', bodies at /First + offset); only
    the content streams are top-level objects. No trailer dict — /Root is
    only discoverable by expanding the container and finding /Catalog."""
    packed = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents [10 0 R 11 0 R] >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 12 0 R >>",
    }
    bodies, head, off = [], [], 0
    for num, body in packed.items():
        head.append(b"%d %d" % (num, off))
        bodies.append(body)
        off += len(body) + 1
    header = b" ".join(head) + b"\n"
    payload = header + b"\n".join(bodies) + b"\n"
    z = zlib.compress(payload)
    streams = {
        10: b"BT (Compressed tree, part A ) Tj ET",
        11: b"BT (and part B) Tj ET",
        12: b"BT (Second page) Tj ET",
    }
    parts = [b"%PDF-1.5\n"]
    # content streams physically before the container, reverse page order
    for n in (12, 11, 10):
        s = streams[n]
        parts.append(
            b"%d 0 obj << /Length %d >> stream\n%s\nendstream endobj\n" % (n, len(s), s)
        )
    parts.append(
        b"20 0 obj << /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >> "
        b"stream\n%s\nendstream endobj\n" % (len(packed), len(header), len(z), z)
    )
    parts.append(b"startxref\n0\n%%EOF\n")
    return b"".join(parts)


def test_pdf_objstm_tree_walks_in_page_order():
    data = make_objstm_pdf()
    # document order would be [Second page, and part B, Compressed tree…];
    # only expanding the ObjStm yields the catalog and the tree order
    assert pdf_page_texts(data) == [
        "Compressed tree, part A and part B",
        "Second page",
    ]


def test_pdf_objstm_top_level_update_wins():
    # incremental update appends a TOP-LEVEL replacement for a page dict
    # that also exists compressed — top-level takes precedence
    patch = (
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 13 0 R >> endobj\n"
        b"13 0 obj << /Length 24 >> stream\nBT (Second page v2) Tj ET\nendstream endobj\n"
        b"startxref\n0\n%%EOF\n"
    )
    assert pdf_page_texts(make_objstm_pdf() + patch)[1] == "Second page v2"


def test_binary_fallback_is_text_tier():
    spans = extract_spans_binary_py("notes.txt", b"plain body", 10)
    assert spans == [{"kind": "text", "text": "plain body", "media_ref": None, "offset": 0}]
    # unknown binary → media placeholder, like the text tier
    spans = extract_spans_binary_py("x.zip", b"PK\x03\x04junk", 10)
    assert spans[0]["kind"] == "media"


def test_binary_udf_matches_python_twin(spark):
    rows = [
        ("a.pdf", make_pdf()),
        ("b.docx", make_docx()),
        ("c.txt", b"hello"),
    ]
    df = spark.createDataFrame(
        [(n, bytearray(d), len(d)) for n, d in rows],
        "name string, data binary, size long",
    )
    udf = make_extract_spans_binary_udf()
    got = {
        r["name"]: [row.asDict() for row in r["spans"]]
        for r in df.select("name", udf("name", "data", "size").alias("spans")).collect()
    }
    for n, d in rows:
        assert got[n] == extract_spans_binary_py(n, d, len(d)), n


def test_binary_spans_feed_reassembly(spark):
    """Decoded spans flow through the Catalyst-native pages/full_content
    reassembly exactly like text-tier spans."""
    from azure_blob_crawler_spark.operators.extraction import with_extraction

    udf = make_extract_spans_binary_udf()
    data = make_pdf()
    df = spark.createDataFrame(
        [("a.pdf", bytearray(data), len(data))], "name string, data binary, size long"
    ).withColumn("spans", udf("name", "data", "size"))
    row = with_extraction(df).collect()[0]
    assert row["use_pages"] is True
    assert len(row["pages"]) == 2
    assert "Page two" in row["full_content"] and "Hello world" in row["full_content"]


def make_cmap_pdf() -> bytes:
    """Two-page PDF with a Type0 (Identity-H) font whose ToUnicode CMap
    exercises every mapping form — bfchar pairs, base-increment bfrange,
    array bfrange, and a multi-code-unit (ligature) destination — plus a
    plain simple font, with /Resources INHERITED from the /Pages node
    (pages carry none). Built spec-forward from ISO 32000-1 §9.10.3."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n"
        b"<0001> <0048>\n"  # 0x0001 -> 'H'
        b"<0002> <00660069>\n"  # 0x0002 -> 'fi' (two code units from one CID)
        b"endbfchar\n"
        b"2 beginbfrange\n"
        b"<0010> <0012> <0065>\n"  # 0x10..0x12 -> 'e' 'f' 'g' (last unit increments)
        b"<0020> <0021> [<006C> <006F>]\n"  # 0x20 -> 'l', 0x21 -> 'o'
        b"endbfrange\n"
        b"endcmap\nend\n"
    )
    cmap_z = zlib.compress(cmap)
    streams = {
        # codes 0001 0010 0020 0020 0021 -> Hello; 0002 -> fi; then a
        # mid-stream switch to the simple font shows latin-1 bytes as-is
        10: b"BT /F1 12 Tf <00010010002000200021> Tj <0002> Tj /F2 9 Tf (!) Tj ET",
        11: b"BT /F2 10 Tf (plain latin) Tj ET",
    }
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 "
            b"/Resources << /Font << /F1 7 0 R /F2 8 0 R >> >> >>"
        ),
        3: b"<< /Type /Page /Parent 2 0 R /Contents 10 0 R >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R >>",
        7: (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Noto "
            b"/Encoding /Identity-H /ToUnicode 9 0 R >>"
        ),
        8: b"<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica >>",
    }
    parts = [b"%PDF-1.4\n"]
    for n, body in objs.items():
        parts.append(b"%d 0 obj %s endobj\n" % (n, body))
    parts.append(
        b"9 0 obj << /Length %d /Filter /FlateDecode >> stream\n%s\nendstream endobj\n"
        % (len(cmap_z), cmap_z)
    )
    for n, s in streams.items():
        parts.append(
            b"%d 0 obj << /Length %d >> stream\n%s\nendstream endobj\n" % (n, len(s), s)
        )
    parts.append(b"trailer << /Size 12 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    return b"".join(parts)


def test_pdf_tounicode_cmap_decodes_cid_text():
    assert pdf_page_texts(make_cmap_pdf()) == ["Hellofi!", "plain latin"]


def test_pdf_cmap_unmapped_code_is_replacement_char():
    data = make_cmap_pdf().replace(b"<0002>", b"<0099>")  # 0x0099 not mapped
    assert pdf_page_texts(data)[0] == "Hello�!"


def test_pdf_cmap_one_byte_codespace():
    from azure_blob_crawler_spark.operators.binary_decode import (
        _parse_cmap,
        _stream_text,
    )

    cmap = _parse_cmap(
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"2 beginbfchar\n<41> <0391>\n<42> <0392>\nendbfchar\n"
    )
    assert cmap == (1, {0x41: "Α", 0x42: "Β"})
    # literal strings route through the CMap too, one byte per code
    out = _stream_text(b"BT /G1 1 Tf (AB) Tj ET", {b"G1": cmap})
    assert out == "ΑΒ"


def test_pdf_font_without_tounicode_keeps_latin1():
    # same stream, no fonts resolved -> legacy byte-per-char behavior
    from azure_blob_crawler_spark.operators.binary_decode import _stream_text

    assert _stream_text(b"BT /F9 12 Tf (caf\xe9) Tj ET") == "caf\xe9"
    assert _stream_text(b"BT /F9 12 Tf (caf\xe9) Tj ET", {b"F9": None}) == "caf\xe9"


def _lzw_encode_pdf(data: bytes) -> bytes:
    """Spec-forward PDF/TIFF LZW encoder (ISO 32000-1 §7.4.4, EarlyChange=1):
    MSB-first variable-width codes, Clear first, string-table build, width
    bump one code early (when the next free code reaches 2^w - 1)."""
    bits: list[int] = []
    width = 9

    def emit(code):
        bits.extend(((code >> (width - 1 - k)) & 1) for k in range(width))

    emit(256)  # Clear
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    s = b""
    for ch in data:
        c = bytes([ch])
        if s + c in table:
            s += c
            continue
        emit(table[s])
        table[s + c] = next_code
        next_code += 1
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        s = c
    if s:
        emit(table[s])
    emit(257)  # EOD
    out = bytearray()
    for i in range(0, len(bits), 8):
        chunk = bits[i : i + 8]
        byte = 0
        for b in chunk:
            byte = (byte << 1) | b
        byte <<= 8 - len(chunk)
        out.append(byte)
    return bytes(out)


def test_pdf_lzw_decode_roundtrip():
    from azure_blob_crawler_spark.operators.binary_decode import _lzw_decode_pdf

    for payload in (
        b"ABABABABABAB",
        b"BT (lzw page) Tj ET" * 40,
        bytes(range(256)) * 30,  # > 510 table entries → 9→10-bit width bump
        b"",
    ):
        assert _lzw_decode_pdf(_lzw_encode_pdf(payload)) == payload


def test_pdf_filter_chains():
    """Streams through /LZWDecode, /ASCII85Decode, /ASCIIHexDecode and the
    chained [/ASCII85Decode /FlateDecode] form all decode; an unsupported
    chain member or /Predictor drops the stream, not the document."""
    import base64

    content = b"BT (filtered page) Tj ET"
    lzw = _lzw_encode_pdf(content)
    a85_flate = base64.a85encode(zlib.compress(content)) + b"~>"
    ahx = content.hex().encode() + b">"

    def pdf_with(stream: bytes, filt: bytes) -> bytes:
        return (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            + b"4 0 obj << /Length %d /Filter %s >> stream\n%s\nendstream endobj\n"
            % (len(stream), filt, stream)
            + b"trailer << /Root 1 0 R >>\n%%EOF\n"
        )

    from azure_blob_crawler_spark.operators.binary_decode import pdf_page_texts

    assert pdf_page_texts(pdf_with(lzw, b"/LZWDecode")) == ["filtered page"]
    assert pdf_page_texts(
        pdf_with(base64.a85encode(content) + b"~>", b"/ASCII85Decode")
    ) == ["filtered page"]
    assert pdf_page_texts(pdf_with(ahx, b"/ASCIIHexDecode")) == ["filtered page"]
    assert pdf_page_texts(
        pdf_with(a85_flate, b"[/ASCII85Decode /FlateDecode]")
    ) == ["filtered page"]
    # unsupported member → stream skipped, no crash
    assert pdf_page_texts(pdf_with(b"\xff\xd8junk", b"/DCTDecode")) == [""]


def test_pdf_predictors():
    """Flate output carrying a /Predictor post-pass: PNG Up rows (tag 2)
    and TIFF horizontal differencing, both built forward per §7.4.4.4."""
    from azure_blob_crawler_spark.operators.binary_decode import pdf_page_texts
    import numpy as np

    content = b"BT (predicted page) Tj ET"
    cols = 8
    padded = content + b" " * (-len(content) % cols)
    rows = np.frombuffer(padded, np.uint8).reshape(-1, cols)
    # forward PNG Up filter: row - previous row (mod 256), tag byte 2
    prev = np.zeros(cols, np.uint8)
    png_rows = bytearray()
    for r in rows:
        png_rows += b"\x02" + (r - prev).tobytes()
        prev = r
    # forward TIFF predictor 2: per-row horizontal difference
    tiff = np.concatenate(
        [rows[:, :1], (rows[:, 1:] - rows[:, :-1])], axis=1
    ).tobytes()

    def pdf_with(stream: bytes, filt: bytes) -> bytes:
        return (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            + b"4 0 obj << /Length %d /Filter %s >> stream\n%s\nendstream endobj\n"
            % (len(stream), filt, stream)
            + b"trailer << /Root 1 0 R >>\n%%EOF\n"
        )

    assert pdf_page_texts(
        pdf_with(
            zlib.compress(bytes(png_rows)),
            b"/FlateDecode /DecodeParms << /Predictor 12 /Columns 8 >>",
        )
    ) == ["predicted page"]
    assert pdf_page_texts(
        pdf_with(
            zlib.compress(tiff),
            b"/FlateDecode /DecodeParms << /Predictor 2 /Columns 8 >>",
        )
    ) == ["predicted page"]
    # 16-bit components stay a declared limit → stream dropped, not a crash
    assert pdf_page_texts(
        pdf_with(
            zlib.compress(bytes(png_rows)),
            b"/FlateDecode /DecodeParms << /Predictor 12 /Columns 4 "
            b"/BitsPerComponent 16 >>",
        )
    ) == [""]
