"""Distributed deterministic global sequence assignment.

``Window.orderBy(...)`` with no partition moves every row to a single task
(Spark warns ``WindowExec: No Partition Defined``) — at web scale that is the
round's serial stage. This operator assigns the identical 1-based global
row_number in three bounded steps (the classic zipWithIndex construction,
expressed in DataFrame ops):

1. range-partition on the order key (so partition i's keys all sort before
   partition i+1's),
2. per-partition ``row_number`` (parallel windows, one per partition id),
3. driver-side prefix-sum of the per-partition counts (a dozen-row collect)
   added as an offset via a literal map — no join, no extra shuffle.

The output sequence is a pure function of the row set and the order key —
range boundaries may vary run-to-run, but (partition ASC, within-partition
rank) always reproduces the same total order, so the assigned numbers are
identical to the single-partition window's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Inputs bounded under this row count sort comfortably in ONE task — the
# two-phase machinery (2 eager checkpoints + a counts collect, ~4 extra
# jobs) would cost more than it saves. The sequence values are identical
# either way. 2^18 narrow rows is a few tens of MB through one sort task —
# well under a shuffle partition's normal working set — and every bounded
# caller (claim_round's round_size, hybrid's pooled legs) has already
# funneled its rows through a TakeOrdered/limit, so the single window adds
# no new serial stage the plan didn't have (r6: the 100k-row claim spent
# ~2.8 s in two-phase bookkeeping vs ~0.1 s in the single window).
SMALL_INPUT_ROWS = 1 << 18


def assign_global_seq(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str,
    start: int = 1,
    bounded_rows: int | None = None,
    input_materialized: bool = False,
) -> DataFrame:
    """Add ``out_col`` = start, start+1, ... in the total order of
    ``order_cols`` (which must be a total order — include a tiebreaker).

    ``bounded_rows``: a statically-known upper bound on ``df``'s row count
    (e.g. a preceding ``limit`` or an already-computed ``count``). When it
    fits one task, numbering runs as a constant-partition window — same
    values, none of the two-phase overhead, and no accidental
    whole-table single-task sort can slip through because the caller had
    to PROVE the bound to get this path.

    ``input_materialized``: set True when ``df`` is already persisted or
    checkpointed. Otherwise the two-phase path materializes it first —
    range partitioning SAMPLES its input before shuffling, so an
    unmaterialized expensive lineage would be evaluated twice.

    The two-phase path materializes via eager localCheckpoints (read by
    the sampling, count, and numbering passes; no long-lived cache entry
    is left behind)."""
    if bounded_rows is not None and bounded_rows <= SMALL_INPUT_ROWS:
        # a single-task window IS the right plan here — the caller proved
        # the bound, so this is a small TakeOrdered-style sort, not an
        # accidental whole-table funnel (a constant partition key would
        # just be folded away by Catalyst anyway)
        w = Window.orderBy(*order_cols)
        return df.withColumn(
            out_col, (F.lit(start - 1) + F.row_number().over(w)).cast("long")
        )
    if not input_materialized:
        df = df.localCheckpoint(eager=True)
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=True)
    counts = sorted(
        (int(r["__pid"]), int(r["cnt"]))
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets: list[Column] = []
    acc = start - 1
    for pid, cnt in counts:
        offsets.extend([F.lit(pid), F.lit(acc)])
        acc += cnt
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offset_of = F.create_map(*offsets)
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.withColumn(
            out_col,
            (offset_of[F.col("__pid")] + F.row_number().over(w_local)).cast("long"),
        )
        .drop("__pid")
    )
