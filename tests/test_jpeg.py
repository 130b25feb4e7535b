"""Baseline JPEG decoder vs a spec-forward in-test encoder.

The encoder below implements T.81's FORWARD direction (level shift → DCT →
quantize → zigzag → DC-diff + AC run-length → canonical Huffman → byte
stuffing → markers); the decoder must invert every stage. With all-ones
quant tables the only loss is coefficient rounding, so the roundtrip bound
is tight (|err| ≤ 4 per pixel, orthonormal-DCT worst case of ±0.5 per
coefficient); subsampled-chroma fixtures compare against the exact
subsample→upsample pipeline replicated here.
"""

import numpy as np
import pytest

from azure_blob_crawler_spark.operators import multimodal as MM
from azure_blob_crawler_spark.operators.jpeg import (
    DCT_C,
    ZIGZAG,
    decode_jpeg_py,
    looks_like_jpeg,
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


def _canonical_tables():
    """All-8-bit-long canonical Huffman tables (valid: < 255 symbols per
    table, so the all-ones code is never assigned). Returns (counts,
    symbols, code_of) per class."""
    dc_syms = list(range(12))
    ac_syms = [r << 4 for r in range(16)] + [  # EOBn (r<15) + ZRL (0xF0)
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    def build(symbols):
        counts = [0] * 16
        counts[7] = len(symbols)  # all codes length 8
        code_of = {sym: (i, 8) for i, sym in enumerate(symbols)}
        return counts, bytes(symbols), code_of
    return build(dc_syms), build(ac_syms)


def _category(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value → (size s, s-bit raw code)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    return np.rint((DCT_C @ (block - 128.0) @ DCT_C.T) / q).astype(np.int64)


def _component_planes(img: np.ndarray, chroma_samp: tuple[int, int]):
    """Shared forward front half: color transform, chroma box-subsample,
    MCU-pad. Returns (padded comps, hmax, vmax, mcux, mcuy)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [(1, 1, 1, img.astype(np.float64))]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        hs, vs = chroma_samp
        chroma = []
        for plane in (cb, cr):
            if (hs, vs) != (1, 1):
                ph = -(-h // vs) * vs
                pw = -(-w // hs) * hs
                p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
                plane = p.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
            chroma.append(plane)
        comps = [(1, hs, vs, y), (2, 1, 1, chroma[0]), (3, 1, 1, chroma[1])]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for cid, hs, vs, plane in comps:
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(
            plane,
            ((0, max(0, ph - plane.shape[0])), (0, max(0, pw - plane.shape[1]))),
            mode="edge",
        )[:ph, :pw]
        padded.append((cid, hs, vs, p))
    return padded, hmax, vmax, mcux, mcuy


def encode_jpeg(
    img: np.ndarray, chroma_samp: tuple[int, int] = (1, 1),
    q_val: int = 1, restart_interval: int = 0,
) -> bytes:
    """Minimal baseline encoder: gray (h,w) or RGB (h,w,3); luma always
    1×1-per-MCU-unit scaled by the chroma sampling factors."""
    h, w = img.shape[:2]
    q = np.full((8, 8), float(q_val))
    (dc_counts, dc_syms, dc_code), (ac_counts, ac_syms, ac_code) = _canonical_tables()
    padded, hmax, vmax, mcux, mcuy = _component_planes(img, chroma_samp)

    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in padded}
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = {cid: 0 for cid in pred}
            for cid, hs, vs, p in padded:
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        zz = _fdct_quant(p[y0 : y0 + 8, x0 : x0 + 8], q)
                        scan = zz.reshape(64)[ZIGZAG]  # scan[k] = block[zigzag k]
                        diff = int(scan[0]) - pred[cid]
                        pred[cid] = int(scan[0])
                        s, raw = _category(diff)
                        c, ln = dc_code[s]
                        bw.write(c, ln)
                        bw.write(raw, s)
                        run = 0
                        last_nz = max(np.nonzero(scan)[0]) if scan.any() else 0
                        for k in range(1, 64):
                            v = int(scan[k])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                c, ln = ac_code[0xF0]
                                bw.write(c, ln)
                                run -= 16
                            s, raw = _category(v)
                            c, ln = ac_code[(run << 4) | s]
                            bw.write(c, ln)
                            bw.write(raw, s)
                            run = 0
                        if last_nz < 63:
                            c, ln = ac_code[0x00]  # EOB
                            bw.write(c, ln)
            mcu_index += 1
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    qzz = q.reshape(64)[ZIGZAG].astype(np.uint8)
    out += seg(0xDB, bytes([0x00]) + qzz.tobytes())
    ncomp = len(padded)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for cid, hs, vs, _ in padded:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for cid, *_ in padded:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _emit_eobn(bw, ac_code, n):
    """EOBn symbol: run-length exponent r, then r extra bits (T.81 G.1.2.2:
    EOB run = 2^r + extra)."""
    r = n.bit_length() - 1
    c, ln = ac_code[r << 4]
    bw.write(c, ln)
    if r:
        bw.write(n - (1 << r), r)


def _encode_dc_scan(bw, units, dc_code, ah, al, dri=0):
    """Progressive DC scan: first pass (Ah=0) codes diffs of c0 >> Al,
    refinement passes send the Al bit raw. ``units`` mirrors the decoder's
    traversal (MCU-interleaved or single-component)."""
    pred: dict = {}
    rst = 0
    for u, unit in enumerate(units):
        if dri and u and u % dri == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            pred = {}
        for cid, blk in unit:
            if ah == 0:
                v = int(blk[0]) >> al
                diff = v - pred.get(cid, 0)
                pred[cid] = v
                s, raw = _category(diff)
                c, ln = dc_code[s]
                bw.write(c, ln)
                bw.write(raw, s)
            else:
                bw.write((int(blk[0]) >> al) & 1, 1)


def _encode_ac_first_scan(bw, blocks, ac_code, ss, se, al):
    """Progressive AC first pass over one component's blocks: coefficients
    at the Al point transform (truncate toward zero), ZRL, and EOB runs
    deferred across all-zero-band blocks."""

    def val(x):
        x = int(x)
        return -((-x) >> al) if x < 0 else x >> al

    pend = 0
    for blk in blocks:
        vs_ = [val(blk[k]) for k in range(ss, se + 1)]
        nz = [j for j, v in enumerate(vs_) if v]
        if not nz:
            pend += 1
            if pend == 0x7FFF:
                _emit_eobn(bw, ac_code, pend)
                pend = 0
            continue
        if pend:
            _emit_eobn(bw, ac_code, pend)
            pend = 0
        run = 0
        for j in range(nz[-1] + 1):
            v = vs_[j]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, ln = ac_code[0xF0]
                bw.write(c, ln)
                run -= 16
            s, raw = _category(v)
            c, ln = ac_code[(run << 4) | s]
            bw.write(c, ln)
            bw.write(raw, s)
            run = 0
        if nz[-1] < se - ss:
            pend = 1
    if pend:
        _emit_eobn(bw, ac_code, pend)


def _encode_ac_refine_scan(bw, blocks, ac_code, ss, se, al):
    """Progressive AC refinement (Ah=Al+1): correction bits for
    history-nonzero coefficients ride after each symbol; new ±1<<Al
    coefficients code (zero-history-run, 1) + sign; EOB runs carry the
    covered blocks' correction bits in traversal order."""
    pend_n = 0
    pend_bits: list[int] = []

    def flush_eob():
        nonlocal pend_n, pend_bits
        if pend_n:
            _emit_eobn(bw, ac_code, pend_n)
            for b in pend_bits:
                bw.write(b, 1)
            pend_n, pend_bits = 0, []

    for blk in blocks:
        mags = [abs(int(blk[k])) for k in range(ss, se + 1)]
        hist_nz = [(m >> (al + 1)) != 0 for m in mags]
        newpos = [
            j for j, m in enumerate(mags)
            if not hist_nz[j] and (m >> al) & 1
        ]
        if not newpos:
            pend_n += 1
            pend_bits.extend(
                (m >> al) & 1 for m, hz in zip(mags, hist_nz) if hz
            )
            if pend_n == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        buf: list[int] = []
        for j in range(newpos[-1] + 1):
            m = mags[j]
            if hist_nz[j]:
                buf.append((m >> al) & 1)
            elif (m >> al) & 1:
                c, ln = ac_code[(run << 4) | 1]
                bw.write(c, ln)
                bw.write(1 if int(blk[ss + j]) > 0 else 0, 1)
                for b in buf:
                    bw.write(b, 1)
                run, buf = 0, []
            else:
                run += 1
                if run == 16:
                    c, ln = ac_code[0xF0]
                    bw.write(c, ln)
                    for b in buf:
                        bw.write(b, 1)
                    run, buf = 0, []
        if newpos[-1] < len(mags) - 1:  # band tail → this block opens an EOB run
            pend_n = 1
            pend_bits = [
                (mags[j] >> al) & 1
                for j in range(newpos[-1] + 1, len(mags))
                if hist_nz[j]
            ]
    flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray, chroma_samp: tuple[int, int] = (1, 1),
    q_val: int = 1, band_split: int = 6, dri_dc: int = 0,
) -> bytes:
    """Spec-forward progressive encoder (T.81 Annex G): DC first at Al=1 +
    DC refinement, then per-component AC first passes at Al=1 over two
    spectral bands, then the matching AC refinements at Al=0. Coefficients
    are IDENTICAL to ``encode_jpeg``'s, so a correct decoder must produce
    bit-identical pixels for the two encodings."""
    h, w = img.shape[:2]
    q = np.full((8, 8), float(q_val))
    (dc_counts, dc_syms, dc_code), (ac_counts, ac_syms, ac_code) = _canonical_tables()
    padded, hmax, vmax, mcux, mcuy = _component_planes(img, chroma_samp)

    czz = {}
    dims_true = {}
    for cid, hs, vs, p in padded:
        bh, bwid = p.shape[0] // 8, p.shape[1] // 8
        arr = np.zeros((bh, bwid, 64), np.int64)
        for by in range(bh):
            for bx in range(bwid):
                arr[by, bx] = _fdct_quant(
                    p[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8], q
                ).reshape(64)[ZIGZAG]
        czz[cid] = arr
        dims_true[cid] = (
            -(-(-(-h * vs // vmax)) // 8),
            -(-(-(-w * hs // hmax)) // 8),
        )

    def comp_blocks(cid):
        th, tw = dims_true[cid]
        return [czz[cid][i // tw, i % tw] for i in range(th * tw)]

    if len(padded) == 1:
        units = [[(padded[0][0], b)] for b in comp_blocks(padded[0][0])]
    else:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for cid, hs, vs, _ in padded:
                    for by in range(vs):
                        for bx in range(hs):
                            unit.append((cid, czz[cid][my * vs + by, mx * hs + bx]))
                units.append(unit)

    sos_all = bytes([len(padded)]) + b"".join(
        bytes([cid, 0x00]) for cid, *_ in padded
    )
    scans = []  # (sos payload, entropy bytes, dri for this scan)
    bw = _BitWriter()
    _encode_dc_scan(bw, units, dc_code, ah=0, al=1, dri=dri_dc)
    bw.flush()
    scans.append((sos_all + bytes([0, 0, 0x01]), bytes(bw.out), dri_dc))
    bw = _BitWriter()
    _encode_dc_scan(bw, units, dc_code, ah=1, al=0)
    bw.flush()
    scans.append((sos_all + bytes([0, 0, 0x10]), bytes(bw.out), 0))
    bands = [(1, band_split - 1), (band_split, 63)]
    for ah, al in ((0, 1), (1, 0)):
        for ss, se in bands:
            for cid, *_ in padded:
                bw = _BitWriter()
                enc = _encode_ac_first_scan if ah == 0 else _encode_ac_refine_scan
                enc(bw, comp_blocks(cid), ac_code, ss, se, al)
                bw.flush()
                scans.append(
                    (bytes([1, cid, 0x00, ss, se, (ah << 4) | al]), bytes(bw.out), 0)
                )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    qzz = q.reshape(64)[ZIGZAG].astype(np.uint8)
    out += seg(0xDB, bytes([0x00]) + qzz.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(padded)])
    for cid, hs, vs, _ in padded:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
    cur_dri = 0
    for sos_payload, bits, dri in scans:
        if dri != cur_dri:
            out += seg(0xDD, dri.to_bytes(2, "big"))
            cur_dri = dri
        out += seg(0xDA, sos_payload) + bits
    out += b"\xff\xd9"
    return bytes(out)


def _gradient_rgb(h, w, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.float64)
    g = (yy * 255 // max(h - 1, 1)).astype(np.float64)
    b = rng.integers(100, 156, size=(h, w)).astype(np.float64)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def test_jpeg_gray_roundtrip_tight():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)  # odd width → crop
    got = decode_jpeg_py(encode_jpeg(img))
    assert got.shape == img.shape
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4


def test_jpeg_rgb_444_roundtrip():
    img = _gradient_rgb(16, 16)
    got = decode_jpeg_py(encode_jpeg(img))
    assert got.shape == img.shape
    # color transform is float-exact both ways; only DCT rounding remains
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 5


def test_jpeg_420_subsampling():
    img = _gradient_rgb(20, 22, seed=9)
    got = decode_jpeg_py(encode_jpeg(img, chroma_samp=(2, 2)))
    assert got.shape == img.shape
    # replicate the encoder's lossy chroma path exactly: box-average 2x2,
    # nearest-upsample, inverse transform — then only DCT rounding remains
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h, w = y.shape
    exp = []
    for plane in (cb, cr):
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        small = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        exp.append(np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)[:h, :w])
    cbu, cru = exp
    r2 = y + 1.402 * (cru - 128.0)
    g2 = y - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0)
    b2 = y + 1.772 * (cbu - 128.0)
    want = np.clip(np.rint(np.stack([r2, g2, b2], axis=2)), 0, 255)
    assert np.max(np.abs(got.astype(float) - want)) <= 6


def test_jpeg_quantized_lossy_but_close():
    img = _gradient_rgb(32, 32, seed=3)
    got = decode_jpeg_py(encode_jpeg(img, q_val=8))
    err = got.astype(float) - img.astype(float)
    assert np.sqrt(np.mean(err**2)) < 12.0  # smooth image, modest quant


def test_jpeg_restart_markers():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    data = encode_jpeg(img, restart_interval=2)
    assert any(
        data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7 for i in range(2, len(data) - 2)
    ), "fixture must actually contain RSTn markers"
    got = decode_jpeg_py(data)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4


def test_jpeg_rejects_unsupported():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(encode_jpeg(img))
    sof_at = data.find(bytes([0xFF, 0xC0]))
    data[sof_at + 1] = 0xC9  # arithmetic-coded sequential
    with pytest.raises(ValueError, match="SOF9"):
        decode_jpeg_py(bytes(data))
    assert looks_like_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_py(b"notajpeg")


def test_jpeg_progressive_matches_sequential_exactly():
    """The progressive scan script reconstructs the SAME quantized
    coefficients as the sequential encoding (DC: floor-shift + parity OR;
    AC: truncate-toward-zero + magnitude correction), so pixels must be
    bit-identical between the two decodes."""
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_py(encode_jpeg_progressive(gray)),
        decode_jpeg_py(encode_jpeg(gray)),
    )
    # color 4:2:0 on non-multiple dims: luma's true block grid (3×3) is
    # smaller than its MCU-padded grid (4×4), exercising the
    # non-interleaved AC traversal dims
    img = _gradient_rgb(20, 22, seed=9)
    assert np.array_equal(
        decode_jpeg_py(encode_jpeg_progressive(img, chroma_samp=(2, 2))),
        decode_jpeg_py(encode_jpeg(img, chroma_samp=(2, 2))),
    )


def test_jpeg_progressive_eob_runs_and_quant():
    """Heavy quantization on a smooth image zeroes most AC bands, forcing
    multi-block EOB runs in both first and refinement passes (and ZRL in
    sparse high bands)."""
    img = _gradient_rgb(48, 40, seed=2)
    assert np.array_equal(
        decode_jpeg_py(encode_jpeg_progressive(img, q_val=16)),
        decode_jpeg_py(encode_jpeg(img, q_val=16)),
    )
    flat = np.full((40, 40), 200, np.uint8)
    flat[12, 31] = 90  # lone detail: one block with sparse high-band AC
    assert np.array_equal(
        decode_jpeg_py(encode_jpeg_progressive(flat, q_val=4)),
        decode_jpeg_py(encode_jpeg(flat, q_val=4)),
    )


def test_jpeg_progressive_dc_restart_markers():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    data = encode_jpeg_progressive(img, dri_dc=2)
    assert any(
        data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
        for i in range(2, len(data) - 2)
    ), "fixture must actually contain RSTn markers"
    assert np.array_equal(
        decode_jpeg_py(data), decode_jpeg_py(encode_jpeg(img))
    )


def test_jpeg_progressive_ac_refine_zrl_unit():
    """Unit-level: a hand-built band exercising every refine branch — a
    correction bit mid-run, a >16-zero-history gap (ZRL with embedded
    correction), a new negative coefficient, and an EOB tail carrying
    correction bits for two covered blocks."""
    from azure_blob_crawler_spark.operators.jpeg import _BitReader
    from azure_blob_crawler_spark.operators.jpeg import _ac_refine, _HuffTable

    (_, _, _), (ac_counts, ac_syms, ac_code) = _canonical_tables()
    tbl = _HuffTable(list(ac_counts), ac_syms)
    ss, se = 1, 40
    # final coefficient values (band positions 1..40)
    blkA = np.zeros(64, np.int32)
    blkA[3] = 5       # history 4 (=2<<1), refine bit 1
    blkA[22] = -1     # new negative after an 18-zero-history gap → ZRL
    blkA[30] = -4     # history -4, refine bit 0 (in EOB tail)
    blkB = np.zeros(64, np.int32)
    blkB[7] = 3       # history 2, refine bit 1 — covered by the EOB run
    final = [blkA.copy(), blkB.copy()]
    bw = _BitWriter()
    _encode_ac_refine_scan(bw, final, ac_code, ss, se, al=0)
    bw.flush()
    # decode into the history state (values at Ah=1 precision)
    hist = []
    for f in final:
        h_ = f.copy()
        for k in range(ss, se + 1):
            v = int(f[k])
            h_[k] = (abs(v) >> 1 << 1) * (1 if v >= 0 else -1)
        hist.append(h_)
    reader = _BitReader(bytes(bw.out))
    eobrun = [0]
    for h_ in hist:
        _ac_refine(h_, reader, tbl, ss, se, 0, eobrun)
    assert np.array_equal(hist[0], final[0])
    assert np.array_equal(hist[1], final[1])


def test_jpeg_progressive_via_decode_media_stdlib(spark):
    img = _gradient_rgb(16, 12, seed=7)
    data = encode_jpeg_progressive(img)
    rows = [("p1", "d1", bytearray(data))]
    df = spark.createDataFrame(rows, "media_ref string, doc_id string, bytes binary")
    got = {r["media_ref"]: r for r in MM.decode_media_stdlib(df, thumb=4).collect()}
    assert got["p1"]["ok"] == "ok" and got["p1"]["kind"] == "image"
    assert (got["p1"]["width"], got["p1"]["height"]) == (12, 16)


def test_jpeg_via_decode_media_stdlib(spark):
    img = _gradient_rgb(16, 12, seed=7)
    data = encode_jpeg(img)
    rows = [("j1", "d1", bytearray(data))]
    df = spark.createDataFrame(rows, "media_ref string, doc_id string, bytes binary")
    got = {r["media_ref"]: r for r in MM.decode_media_stdlib(df, thumb=4).collect()}
    assert got["j1"]["ok"] == "ok" and got["j1"]["kind"] == "image"
    assert (got["j1"]["width"], got["j1"]["height"]) == (12, 16)
    assert len(got["j1"]["thumb"]) == 16
