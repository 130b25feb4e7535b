"""Pure-Python twin of Spark's ``xxhash64`` expression (seed 42).

The search index buckets postings by ``pmod(xxhash64(term), n_buckets)``.
Serving a query needs the bucket ids of a handful of literal terms — a
driver-side constant — but computing them THROUGH the engine costs one
single-task Spark job per query (the r4 workaround for createDataFrame's
cost). xxHash64 is a public, fixed algorithm, so the driver can compute the
same 64-bit value in microseconds with no job at all; parity with the JVM
expression is pinned by tests/test_search_index.py over edge-case lengths
(empty, <4, <8, 31/32/33, >32 bytes — every branch of the algorithm).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """xxHash64 of ``data`` — bit-identical to Spark's ``xxhash64`` on a
    string/binary column (which hashes the UTF-8 bytes with seed 42) and
    returned as the same SIGNED 64-bit value."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            k = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h = ((_rotl((h ^ ((_rotl((k * _P2) & _M64, 31) * _P1) & _M64)) & _M64, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl((h ^ ((k * _P1) & _M64)) & _M64, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl((h ^ ((data[i] * _P5) & _M64)) & _M64, 11) * _P1) & _M64
        i += 1
    h = ((h ^ (h >> 33)) * _P2) & _M64
    h = ((h ^ (h >> 29)) * _P3) & _M64
    h = h ^ (h >> 32)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = 42) -> int:
    return xxhash64_bytes(s.encode("utf-8"), seed)
