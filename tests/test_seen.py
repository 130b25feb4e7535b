"""Seen-set: bloom no-false-negatives, filter_unseen exactness, cuckoo
filter membership/delete/serialization, distributed probe/insert."""

import numpy as np
from pyspark.sql import functions as F

from azure_blob_crawler_spark.operators.seen import (
    Bloom,
    CuckooFilter,
    build_bloom,
    cuckoo_insert,
    cuckoo_probe,
    filter_unseen,
)


def test_bloom_no_false_negatives():
    b = Bloom.sized(10_000, 0.01)
    keys = np.arange(10_000, dtype=np.int64) * 7919 - 5_000_000
    b.add(keys)
    assert b.might_contain(keys).all()


def test_bloom_fpp_bound():
    b = Bloom.sized(10_000, 0.01)
    b.add(np.arange(10_000, dtype=np.int64))
    probe = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fpp = b.might_contain(probe).mean()
    assert fpp < 0.03


def test_filter_unseen_exact(spark):
    seen = spark.range(0, 1000).select(F.col("id").alias("url_hash"))
    cand = spark.range(500, 1500).select(F.col("id").alias("url_hash"), F.lit("x").alias("p"))
    fresh = filter_unseen(cand, seen)
    got = sorted(r["url_hash"] for r in fresh.collect())
    assert got == list(range(1000, 1500))


def test_filter_unseen_empty_seen(spark):
    cand = spark.range(10).select(F.col("id").alias("url_hash"))
    empty = spark.range(0).select(F.col("id").alias("url_hash"))
    assert filter_unseen(cand, empty).count() == 10


def test_cuckoo_membership_and_delete():
    cf = CuckooFilter.sized(5000)
    keys = [k * 2654435761 % (2**63) for k in range(5000)]
    for k in keys:
        assert cf.insert(k)
    assert all(cf.contains(k) for k in keys)  # no false negatives
    # fpp on disjoint probes
    probes = [(10**12 + i) for i in range(20_000)]
    fp = sum(cf.contains(p) for p in probes) / len(probes)
    assert fp < 0.01
    # delete restores absence (fingerprint-level)
    assert cf.delete(keys[0])
    # round-trip serialization
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert all(cf2.contains(k) for k in keys[1:100])


def test_cuckoo_distributed_probe_insert(spark):
    keys = spark.range(1000).select(F.col("id").alias("url_hash"))
    shards = cuckoo_insert(keys, None, n_store_buckets=8)
    shards.persist()
    assert shards.count() == 8
    cand = spark.range(900, 1100).select(F.col("id").alias("url_hash"))
    tagged = cuckoo_probe(cand, shards, n_store_buckets=8)
    rows = {r["url_hash"]: r["maybe_seen"] for r in tagged.collect()}
    assert all(rows[k] for k in range(900, 1000))  # no false negatives
    new_misses = sum(not rows[k] for k in range(1000, 1100))
    assert new_misses >= 95  # ≤5% fp on new keys
    shards.unpersist()
