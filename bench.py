"""Headline benchmark — run the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Also reports ``urls_per_sec`` (frontier canonicalize+hash+dedup+claim over a
natively generated 1M-URL frontier) — the BASELINE.json primary metric at
reduced scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from azure_blob_crawler_spark.functions.urls import canonical_url, url_hash, url_host  # noqa: E402
from azure_blob_crawler_spark.operators.scheduler import claim_round  # noqa: E402
from azure_blob_crawler_spark.session import get_spark  # noqa: E402
from azure_blob_crawler_spark.sources.synthetic import robots_df, seed_frontier_df  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q_events_tumbling",
    "q_window_rank",
    "q_token_stats",
    "q_url_canonicalize",
    "q_minhash_dedup",
    "q_embedding_topk",
    "q_chunk_stats",
    "q_bm25_search",
    "q_hybrid_search",
    "q_simhash_pairs",
    "q_embedding_near_dups",
]

FRONTIER_N = int(os.environ.get("BENCH_FRONTIER_N", "1000000"))


def minhash_dedup_full(spark, sf_dir: str) -> "object":
    """Production minhash tier over the FULL documents table. The contract
    query q_minhash_dedup now restricts to an 800-doc slice so its DuckDB
    oracle stays tractable; the bench keeps timing the xxhash64 tier at
    full scale so the series stays comparable across rounds."""
    from azure_blob_crawler_spark.operators import dedup as DD

    t = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return DD.minhash_dedup(t, "text", "doc_id", threshold=0.4).select(
        "doc_id", "lang", "n_chars"
    )


def frontier_dedup_claim(spark, n: int) -> int:
    """Native-generation 1M-URL frontier → canonicalize → hash → dedup →
    politeness claim of 100k. Returns the claimed (budget-limited) row count."""
    seeds = seed_frontier_df(spark, n)
    frontier = (
        seeds.withColumn("url", canonical_url("url"))
        .withColumn("host", url_host(F.col("url")))
        .withColumn("url_hash", url_hash(F.col("url")))
        .dropDuplicates(["url_hash"])
        .withColumn("state", F.lit("pending"))
        .withColumn("attempts", F.lit(0))
    )
    claimed = claim_round(frontier, robots_df(spark), round_size=100_000, round_seconds=1000.0)
    return claimed.count()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(int(cpus), 8))
    spark.range(1).count()  # warm the JVM before timing

    qs = entrymod.queries()
    qs["q_minhash_dedup"] = minhash_dedup_full  # full-scale production tier
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)

    t0 = time.time()
    n_dedup = frontier_dedup_claim(spark, FRONTIER_N)
    frontier_sec = time.time() - t0
    times["frontier_dedup_claim_1m"] = round(frontier_sec, 3)

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "urls_per_sec": round(FRONTIER_N / frontier_sec),
                "claimed_urls": n_dedup,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
