"""Merge write-amplification evidence (round-1 verdict item 3): bytes
written by a 50k-row MERGE into a 10M-row frontier table.

The round-1 design rewrote every touched bucket — once the delta spread
across all 64 buckets (any delta ≥ ~64 random keys), every commit rewrote
the ENTIRE table. Merge-on-read appends delta files and reconciles at read
(newest generation wins per key), so bytes written ∝ delta. This script
measures both sides of that claim on a real table:

  python tools/bench_merge.py [table_rows] [delta_rows] [n_buckets]

``n_buckets`` defaults to config.SEEN_BUCKETS (64); pass 512+ to evidence
that commit bytes stay ∝ delta and probe/merge parallelism scales with the
bucket count (the 10^10-key shape — see config.seen_buckets_for).

Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from azure_blob_crawler_spark.session import get_spark  # noqa: E402
from azure_blob_crawler_spark.sources.store import SnapshotStore  # noqa: E402


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    delta_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-merge", cores=cpus, shuffle_partitions=max(int(cpus), 8))
    root = tempfile.mkdtemp(prefix="merge-bench-")
    try:
        st = SnapshotStore(spark, root)
        base = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v"), F.lit("pending").alias("s")
        )
        n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64
        st.create("t", base, key="k", n_buckets=n_buckets)
        table_bytes = du(root)

        upd = spark.range(delta_n).select(
            (F.col("id") * 211).alias("k"), F.lit(-1).alias("v"), F.lit("done").alias("s")
        )
        before = du(root)
        t0 = time.time()
        summary = st.merge("t", upd, strategy="mor")
        merge_sec = time.time() - t0
        written = du(root) - before

        # read-side cost after the append (reconciled count)
        t0 = time.time()
        n_after = st.read("t").count()
        read_sec = time.time() - t0

        print(
            json.dumps(
                {
                    "table_rows": n,
                    "delta_rows": delta_n,
                    "table_bytes": table_bytes,
                    "merge_bytes_written": written,
                    "full_rewrite_ratio": round(table_bytes / max(written, 1), 1),
                    "merge_seconds": round(merge_sec, 2),
                    "reconciled_read_seconds": round(read_sec, 2),
                    "rows_after_merge": n_after,
                    "touched_buckets": len(summary.get("touched_buckets", [])),
                    "mode": summary.get("mode"),
                    "n_buckets": n_buckets,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
