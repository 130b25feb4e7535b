"""Scale-adaptive input parallelism for compute-heavy operators.

A single parquet file written as one row group scans as ONE task no matter
how many cores the cluster has (row groups are the unit of split
assignment), so per-row-expensive operators — minhash signatures, corpus
tokenization, LSH banding — serialize on one core while the rest idle
(guide §2.5 "input skew: one huge unsplittable file… repartition
immediately after the read").

``fan_out`` raises the partition count to a multiple of the cluster's
default parallelism ONLY when the input has fewer partitions than that —
at production scale the scan already carries more partitions than cores and
the call is a no-op, so this is not a local-mode constant: the target
derives from ``sparkContext.defaultParallelism`` wherever the session runs.

Only apply it upstream of partition-order-insensitive computation (hashing,
tokenization, per-row scoring). Do NOT apply it upstream of float
aggregations whose oracle comparison depends on a stable summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# fanning a delta below this many rows per target partition costs more in
# per-task overhead (scheduling, Arrow round-trips) than the parallelism
# returns — measured on the crawl's per-round index update, where fanning
# ~150-row deltas into cores×2 partitions cost ~+30% per round
MIN_ROWS_PER_TASK = 32


def fan_out(df: DataFrame, per_core: int = 2, rows_hint: int | None = None) -> DataFrame:
    """Round-robin repartition to ``per_core × defaultParallelism`` when the
    input is under-partitioned; identity otherwise.

    The cost when it fires is one exchange of the (narrow — callers project
    first) input; the win is every downstream per-row computation running
    wide. ``getNumPartitions`` is plan metadata — no job. Callers must pass
    a scan/base DataFrame (no upstream shuffle), so the RDD conversion never
    triggers adaptive-stage execution.

    ``rows_hint``: callers that already know the input's row count (e.g. a
    crawl round's counted chunk delta) pass it so a small delta is NOT
    fanned — partition count says nothing about row count, and 64 tasks of
    two rows each is pure overhead. ``None`` (unknown) fans out.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * per_core
    if rows_hint is not None and rows_hint < target * MIN_ROWS_PER_TASK:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
