"""URL-seen set: bloom-filter fast path + exact anti-join, with a
bucket-partitioned cuckoo filter for O(1)-memory membership state.

The reference has NO seen-set (at-least-once Service Bus delivery, duplicates
possible — servicebus_client.py:84-189); the north rule adds one. Design:

1. **Bloom fast path** — a numpy bitarray built distributedly with
   ``mapInPandas`` (one partial bitmap per partition, OR-reduced) and
   broadcast back; candidates that the bloom says "definitely new" skip the
   expensive exact check entirely. At 10^10 keys production shards the bloom
   per bucket; the build path here already computes per-partition partials.
2. **Exact check** — left-anti join against the seen table on ``url_hash``
   (bucketed storage ⇒ Iceberg storage-partitioned join; here AQE handles
   it). No false positives/negatives, the bloom only prunes its input.
3. **Cuckoo filter** (per bucket, 16-bit fingerprints, 4 slots/bucket) —
   supports deletion and bounded memory; state is a binary blob per store
   bucket, probed/updated via grouped ``applyInPandas`` so each Spark task
   touches exactly one filter shard. Used as the compact alternative to the
   exact table when the engine runs membership-only mode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_blob_crawler_spark import config

# --- bloom filter -----------------------------------------------------------


class Bloom:
    """Plain numpy Bloom filter over int64 keys (split-and-mix rehash)."""

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bits if bits is not None else np.zeros((n_bits + 63) // 64, dtype=np.uint64)

    @staticmethod
    def sized(expected: int, fpp: float = config.BLOOM_FPP) -> "Bloom":
        expected = max(expected, 1)
        m = int(-expected * np.log(fpp) / (np.log(2) ** 2)) + 64
        k = max(1, round(0.693 * m / expected))
        return Bloom(m, min(k, 8))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        x = keys.astype(np.uint64)
        # splitmix64-style avalanche, one variant per hash index
        out = np.empty((self.n_hashes, len(x)), dtype=np.uint64)
        for i in range(self.n_hashes):
            salt = np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
            z = x + salt
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[i] = (z ^ (z >> np.uint64(31))) % np.uint64(self.n_bits)
        return out

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys)
        np.bitwise_or.at(self.bits, pos // 64, np.uint64(1) << (pos % np.uint64(64)))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = (self.bits[pos // 64] >> (pos % np.uint64(64))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)


def build_bloom(seen_hashes: DataFrame, expected: int, col: str = "url_hash") -> Bloom:
    """Distributed build: per-partition partial bitmaps, OR-reduced on the
    driver (bitmap count = partition count, each ~m/8 bytes)."""
    proto = Bloom.sized(expected)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    def partial(batches):
        bloom = Bloom(n_bits, n_hashes)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                bloom.add(pdf[col].to_numpy(dtype=np.int64))
        if any_rows:
            yield pd.DataFrame({"bits": [bloom.bits.tobytes()]})

    parts = seen_hashes.select(col).mapInPandas(partial, "bits binary").collect()
    out = Bloom(n_bits, n_hashes)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    return out


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame | None,
    hash_col: str = "url_hash",
    expected_seen: int | None = None,
) -> DataFrame:
    """Rows of ``candidates`` whose hash is not in ``seen`` — bloom-pruned
    exact anti-join. ``candidates`` must be unique on ``hash_col``."""
    if seen is None:
        return candidates
    if expected_seen is None:
        expected_seen = seen.count()
    if expected_seen == 0:
        return candidates
    bloom = build_bloom(seen, expected_seen, hash_col)
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((bloom.n_bits, bloom.n_hashes, bloom.bits.tobytes()))

    @F.pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        n_bits, n_hashes, raw = bc.value
        b = Bloom(n_bits, n_hashes, np.frombuffer(raw, dtype=np.uint64))
        return pd.Series(b.might_contain(h.to_numpy(dtype=np.int64)))

    tagged = candidates.withColumn("__maybe", maybe_seen(F.col(hash_col)))
    definitely_new = tagged.filter(~F.col("__maybe")).drop("__maybe")
    suspects = tagged.filter(F.col("__maybe")).drop("__maybe")
    confirmed_new = suspects.join(seen.select(hash_col), hash_col, "left_anti")
    return definitely_new.unionByName(confirmed_new)


# --- cuckoo filter ------------------------------------------------------------

_EMPTY = np.uint16(0)
_MAX_KICKS = 500


class CuckooFilter:
    """16-bit-fingerprint, 4-slot-bucket cuckoo filter over int64 keys.

    Supports insert/contains/delete in O(1); serializes to a flat byte blob
    (one per store bucket) so per-round state updates rewrite only touched
    shards.
    """

    SLOTS = 4

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        self.n_buckets = n_buckets
        self.table = (
            table if table is not None else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        )

    @staticmethod
    def sized(expected: int) -> "CuckooFilter":
        n = 1
        while n * CuckooFilter.SLOTS * 0.95 < max(expected, 4):
            n *= 2
        return CuckooFilter(n)

    def to_bytes(self) -> bytes:
        return int(self.n_buckets).to_bytes(8, "little") + self.table.tobytes()

    @staticmethod
    def from_bytes(raw: bytes) -> "CuckooFilter":
        n = int.from_bytes(raw[:8], "little")
        table = np.frombuffer(raw[8:], dtype=np.uint16).reshape(n, CuckooFilter.SLOTS).copy()
        return CuckooFilter(n, table)

    def _fp_and_index(self, key: int) -> tuple[int, int]:
        z = (key * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z ^= z >> 29
        fp = (z & 0xFFFF) or 1  # fingerprint 0 is the empty marker
        idx = (z >> 16) % self.n_buckets
        return fp, idx

    def _alt_index(self, idx: int, fp: int) -> int:
        return (idx ^ ((fp * 0x5BD1E995) & 0xFFFFFFFF)) % self.n_buckets

    def contains(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def _try_put(self, idx: int, fp: int) -> bool:
        row = self.table[idx]
        empty = np.nonzero(row == _EMPTY)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def insert(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        if (self.table[i1] == fp).any() or (self.table[i2] == fp).any():
            return True  # already present (fingerprint-level)
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            return True
        # evict: deterministic kick chain (slot chosen by fp, not RNG)
        idx = i1 if (fp & 1) else i2
        for kick in range(_MAX_KICKS):
            slot = (fp + kick) % self.SLOTS
            fp, self.table[idx][slot] = int(self.table[idx][slot]), fp
            idx = self._alt_index(idx, fp)
            if self._try_put(idx, fp):
                return True
        return False  # table over-full

    def delete(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        for idx in (i1, self._alt_index(i1, fp)):
            hits = np.nonzero(self.table[idx] == fp)[0]
            if len(hits):
                self.table[idx][hits[0]] = _EMPTY
                return True
        return False


def cuckoo_probe(
    candidates: DataFrame,
    filters: DataFrame,
    n_store_buckets: int = config.SEEN_BUCKETS,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Tag candidates with cuckoo membership, co-grouped per store bucket.

    ``filters``: (bucket int, blob binary). Each task deserializes exactly
    one shard — memory per task is one filter, regardless of total keys.
    """
    cand = candidates.withColumn(
        "__cb", F.pmod(F.col(hash_col), F.lit(n_store_buckets)).cast("int")
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", maybe_seen boolean"

    def probe(key, cand_pdf, filt_pdf):
        cand_pdf = cand_pdf.drop(columns=["__cb"])
        if len(filt_pdf):
            cf = CuckooFilter.from_bytes(filt_pdf["blob"].iloc[0])
            cand_pdf["maybe_seen"] = [
                cf.contains(int(h)) for h in cand_pdf[hash_col]
            ]
        else:
            cand_pdf["maybe_seen"] = False
        return cand_pdf

    grouped_c = cand.groupBy("__cb")
    grouped_f = filters.withColumnRenamed("bucket", "__cb").groupBy("__cb")
    return grouped_c.cogroup(grouped_f).applyInPandas(probe, out_schema)


def cuckoo_insert(
    new_keys: DataFrame,
    filters: DataFrame | None,
    n_store_buckets: int = config.SEEN_BUCKETS,
    hash_col: str = "url_hash",
    shard_capacity: int = 1 << 16,
) -> DataFrame:
    """Insert keys, returning the updated (bucket, blob) shards (only shards
    with new keys are emitted — merge them into the store)."""
    keys = new_keys.select(hash_col).withColumn(
        "__cb", F.pmod(F.col(hash_col), F.lit(n_store_buckets)).cast("int")
    )

    def upd(key, keys_pdf, filt_pdf):
        if len(filt_pdf):
            cf = CuckooFilter.from_bytes(filt_pdf["blob"].iloc[0])
        else:
            cf = CuckooFilter.sized(shard_capacity)
        for h in keys_pdf[hash_col]:
            cf.insert(int(h))
        return pd.DataFrame({"bucket": [key[0]], "blob": [cf.to_bytes()]})

    grouped_k = keys.groupBy("__cb")
    if filters is None:
        empty = keys.sparkSession.createDataFrame([], "bucket int, blob binary")
        grouped_f = empty.withColumnRenamed("bucket", "__cb").groupBy("__cb")
    else:
        grouped_f = filters.withColumnRenamed("bucket", "__cb").groupBy("__cb")
    return grouped_k.cogroup(grouped_f).applyInPandas(upd, "bucket int, blob binary")
