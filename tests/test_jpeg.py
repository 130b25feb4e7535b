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
    ac_syms = [0x00, 0xF0] + [
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


def encode_jpeg(
    img: np.ndarray, chroma_samp: tuple[int, int] = (1, 1),
    q_val: int = 1, restart_interval: int = 0,
) -> bytes:
    """Minimal baseline encoder: gray (h,w) or RGB (h,w,3); luma always
    1×1-per-MCU-unit scaled by the chroma sampling factors."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full((8, 8), float(q_val))
    (dc_counts, dc_syms, dc_code), (ac_counts, ac_syms, ac_code) = _canonical_tables()

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
    data[sof_at + 1] = 0xC2  # progressive
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg_py(bytes(data))
    assert looks_like_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_py(b"notajpeg")


def test_jpeg_via_decode_media_stdlib(spark):
    img = _gradient_rgb(16, 12, seed=7)
    data = encode_jpeg(img)
    rows = [("j1", "d1", bytearray(data))]
    df = spark.createDataFrame(rows, "media_ref string, doc_id string, bytes binary")
    got = {r["media_ref"]: r for r in MM.decode_media_stdlib(df, thumb=4).collect()}
    assert got["j1"]["ok"] == "ok" and got["j1"]["kind"] == "image"
    assert (got["j1"]["width"], got["j1"]["height"]) == (12, 16)
    assert len(got["j1"]["thumb"]) == 16
