"""Baseline JPEG decoding — stdlib + numpy only.

Closes the largest remaining gap in the media tier (JPEG dominates real
crawls; the reference treats all media as a binary placeholder span,
file_extractor.py:103-106, so ANY real decode is strictly beyond parity).
Supported profile — the overwhelmingly common one on the web:

- baseline sequential DCT (SOF0) and extended sequential (SOF1), 8-bit,
  Huffman-coded, 1 (grayscale) or 3 (YCbCr/JFIF) components, any
  sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart markers (DRI/RSTn),
  0xFF00 byte stuffing, multi-table DQT/DHT segments;
- progressive DCT (SOF2, T.81 Annex G): multi-scan coefficient
  accumulation with spectral selection + successive approximation — DC
  first/refinement scans (interleaved or single-component), AC
  first/refinement scans (per-component, EOB-run across blocks, ZRL and
  correction-bit semantics per G.2), restart markers resetting EOB runs
  and DC predictions, final dequantize+IDCT once all scans have landed;
- NOT supported (raise → per-row ``decode-error`` under
  ``decode_media_stdlib``, never task death): hierarchical (SOF3/5-7),
  arithmetic coding, 12-bit precision, CMYK/4-component.

Decode path per the spec (ITU T.81): marker parse → per-MCU Huffman
decode (DC diff + AC run-length with ZRL/EOB) → dezigzag → dequantize →
float IDCT (orthonormal DCT-II basis, numpy matmul per block) → nearest
upsampling of subsampled chroma → JFIF YCbCr→RGB.

The Huffman bit-walk is per-symbol Python (a table-driven state machine);
the numeric stages are vectorized numpy. That is the honest performance
tier for a from-scratch decoder — a production deployment swaps this
module for Pillow-SIMD/libjpeg-turbo behind the same
``decode_media_stdlib`` row contract.
"""

from __future__ import annotations

import numpy as np

# zigzag order: index i of the scan → (row, col) in the 8×8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal DCT-II basis: block = C.T @ coeffs @ C inverts the forward
# coeffs = C @ block @ C.T (both 8×8 matmuls; exact to float rounding)
_k = np.arange(8)
DCT_C = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
DCT_C[0] /= np.sqrt(2.0)


def idct2(coeffs: np.ndarray) -> np.ndarray:
    return DCT_C.T @ coeffs @ DCT_C


class _HuffTable:
    """Canonical JPEG Huffman table: (code_length, code) → symbol, walked
    bit-by-bit via the canonical min/max-code-per-length recurrence."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_base = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            self.min_code[ln] = code
            self.val_base[ln] = k - code
            code += counts[ln - 1]
            k += counts[ln - 1]
            self.max_code[ln] = code - 1
            code <<= 1
        self.symbols = symbols

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.bit()
            if code <= self.max_code[ln]:
                return self.symbols[self.val_base[ln] + code]
        raise ValueError("invalid Huffman code")


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 de-stuffing;
    ``sync_marker`` handles RSTn byte-alignment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.buf = (self.buf << 8) | 0  # pad: spec allows 1-fill/0-fill tails
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2  # stuffed byte
                else:
                    # a real marker (RSTn handled by sync_marker) — don't consume
                    self.buf = (self.buf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8
        # trim consumed high bits: without this, buf grows one byte per fill
        # forever and every shift copies the whole bignum — O(n²) in
        # entropy-data size (a few hundred KB of scan data effectively hangs
        # the per-row decode instead of finishing)
        self.buf &= (1 << self.nbits) - 1

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the RSTn marker at the current position."""
        self.buf, self.nbits = 0, 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, n: int) -> int:
    """JPEG EXTEND: n-bit magnitude v → signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg_py(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 array (h, w) gray or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    progressive = False
    coeffs: dict[int, np.ndarray] | None = None  # cid → (bh, bw, 64) zigzag
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT — may hold several tables
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.float64)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, j + 1)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT — may hold several tables
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                tbl = _HuffTable(counts, seg[j + 17 : j + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if seg[0] != 8:
                raise ValueError(f"{seg[0]}-bit precision unsupported")
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            scan_cids = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
                scan_cids.append(cid)
            if not progressive:
                return _decode_scan(
                    data, i + 2 + seg_len, frame, scan_tables, qt,
                    huff_dc, huff_ac, restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            if coeffs is None:
                hmax = max(c[1] for c in frame[2])
                vmax = max(c[2] for c in frame[2])
                mcux = -(-frame[1] // (8 * hmax))
                mcuy = -(-frame[0] // (8 * vmax))
                coeffs = {
                    cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                    for cid, hs, vs, _ in frame[2]
                }
            i = _decode_prog_scan(
                data, i + 2 + seg_len, frame, scan_cids, scan_tables,
                ss, se, a >> 4, a & 0x0F, coeffs, huff_dc, huff_ac,
                restart_interval,
            )
            continue
        i += 2 + seg_len
    if progressive and coeffs is not None:
        return _finish_progressive(frame, coeffs, qt)
    raise ValueError("no SOS segment found")


def _decode_scan(data, start, frame, scan_tables, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    reader = _BitReader(data[start:])
    pred = {cid: 0 for cid, *_ in comps}
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_index and mcu_index % dri == 0:
                reader.sync_restart()
                pred = {cid: 0 for cid in pred}
            for cid, hs, vs, tq in comps:
                dc_tbl = huff_dc[scan_tables[cid][0]]
                ac_tbl = huff_ac[scan_tables[cid][1]]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.float64)
                        s = dc_tbl.decode(reader)
                        diff = _extend(reader.bits(s), s)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = ac_tbl.decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz
                        px = idct2(blk.reshape(8, 8) * q) + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_index += 1

    return _assemble(planes, comps, h, w, hmax, vmax)


def _assemble(planes, comps, h, w, hmax, vmax):
    """Pixel planes → final image: crop, nearest-upsample subsampled
    chroma to the luma grid, JFIF YCbCr→RGB (shared by the sequential and
    progressive paths)."""
    if len(comps) == 1:
        out = planes[comps[0][0]][:h, :w]
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _comp_block_dims(frame, cid):
    """True (non-MCU-padded) block-grid dims of one component — the
    traversal grid for single-component (non-interleaved) scans, T.81
    A.1.1/G.1: ceil(ceil(dim·sampling/max_sampling)/8)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    hs, vs = next((c[1], c[2]) for c in comps if c[0] == cid)
    bw = -(-(-(-w * hs // hmax)) // 8)
    bh = -(-(-(-h * vs // vmax)) // 8)
    return bh, bw


def _decode_prog_scan(
    data, start, frame, scan_cids, scan_tables, ss, se, ah, al,
    coeffs, huff_dc, huff_ac, dri,
):
    """One progressive scan (T.81 Annex G.2) accumulated into ``coeffs``
    (zigzag-order int32 per block). Returns the offset of the next marker
    in ``data``."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(data[start:])
    p1 = 1 << al

    if ss == 0:  # DC scan — interleaved MCU order, or one component's grid
        if se != 0:
            raise ValueError("progressive scan with Ss=0 must have Se=0")
        pred = {cid: 0 for cid in scan_cids}
        if len(scan_cids) == 1:
            cid = scan_cids[0]
            bh, bw = _comp_block_dims(frame, cid)
            units = [[(cid, idx // bw, idx % bw)] for idx in range(bh * bw)]
        else:
            by_cid = {c[0]: (c[1], c[2]) for c in comps}
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    unit = []
                    for cid in scan_cids:
                        hs, vs = by_cid[cid]
                        for by in range(vs):
                            for bx in range(hs):
                                unit.append((cid, my * vs + by, mx * hs + bx))
                    units.append(unit)
        for u, unit in enumerate(units):
            if dri and u and u % dri == 0:
                reader.sync_restart()
                pred = {cid: 0 for cid in pred}
            for cid, by, bx in unit:
                blk = coeffs[cid][by, bx]
                if ah == 0:
                    s = huff_dc[scan_tables[cid][0]].decode(reader)
                    pred[cid] += _extend(reader.bits(s), s)
                    blk[0] = pred[cid] << al
                elif reader.bit():
                    blk[0] |= p1
    else:  # AC scan — always a single component (G.1.1.1.1)
        if len(scan_cids) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        cid = scan_cids[0]
        bh, bw = _comp_block_dims(frame, cid)
        ac = huff_ac[scan_tables[cid][1]]
        eobrun = [0]
        for idx in range(bh * bw):
            if dri and idx and idx % dri == 0:
                reader.sync_restart()
                eobrun[0] = 0
            blk = coeffs[cid][idx // bw, idx % bw]
            if ah == 0:
                _ac_first(blk, reader, ac, ss, se, al, eobrun)
            else:
                _ac_refine(blk, reader, ac, ss, se, al, eobrun)

    j = start + reader.pos
    while j + 1 < len(data) and not (
        data[j] == 0xFF
        and data[j + 1] != 0x00
        and not (0xD0 <= data[j + 1] <= 0xD7)
    ):
        j += 1
    return j


def _ac_first(blk, reader, ac, ss, se, al, eobrun):
    """AC first-pass scan for one block: run-length coefficients at the
    Al point transform, with EOB runs spanning blocks (G.1.2.2)."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = ac.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun[0] = (1 << r) - 1
            if r:
                eobrun[0] += reader.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.bits(s), s) << al
        k += 1


def _ac_refine(blk, reader, ac, ss, se, al, eobrun):
    """AC refinement scan for one block (G.1.2.3 / jdphuff semantics):
    correction bits for history-nonzero coefficients, new ±1<<Al
    insertions at zero-history positions, EOB runs covering the band
    tail's correction bits."""
    p1, m1 = 1 << al, -1 << al

    def correct(pos):
        if reader.bit() and (blk[pos] & p1) == 0:
            blk[pos] += p1 if blk[pos] >= 0 else m1

    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = ac.decode(reader)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.bits(r)
                    break
                newval = 0  # ZRL: traverse 16 zero-history positions
            else:
                newval = p1 if reader.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= se and newval:
                blk[k] = newval
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun[0] -= 1


def _finish_progressive(frame, coeffs, qt):
    """All scans landed: dequantize + IDCT every block (vectorized across
    blocks per component) and assemble exactly like the sequential path."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, hs, vs, tq in comps:
        arr = coeffs[cid]
        bh, bw = arr.shape[:2]
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        nat[..., ZIGZAG] = arr
        blocks = nat.reshape(bh, bw, 8, 8) * qt[tq]
        px = np.einsum("ij,xyjk,kl->xyil", DCT_C.T, blocks, DCT_C) + 128.0
        planes[cid] = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _assemble(planes, comps, h, w, hmax, vmax)


def looks_like_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"
