"""assign_global_seq: two-phase numbering equals the single-partition
global window, on skewed/tied/empty inputs."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from azure_blob_crawler_spark.operators.sequence import assign_global_seq


def test_matches_global_window(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("a"),
        (F.col("id") * 2654435761 % 1000).alias("b"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    got = assign_global_seq(df, ["a", "b", "url"], "seq", start=100)
    w = Window.orderBy("a", "b", "url")
    want = df.withColumn("seq", (F.lit(99) + F.row_number().over(w)).cast("long"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_dense_start_and_range(spark):
    df = spark.range(500).select(F.col("id").alias("k"))
    out = assign_global_seq(df, ["k"], "seq", start=7)
    rows = {r["k"]: r["seq"] for r in out.collect()}
    assert rows[0] == 7 and rows[499] == 506
    assert sorted(rows.values()) == list(range(7, 507))


def test_bounded_path_matches_two_phase(spark):
    """The small-input constant-partition path assigns the same values as
    the two-phase path."""
    df = spark.range(3000).select(
        (F.col("id") % 13).alias("a"), F.col("id").alias("b")
    )
    fast = assign_global_seq(df, ["a", "b"], "seq", start=5, bounded_rows=3000)
    slow = assign_global_seq(df, ["a", "b"], "seq", start=5)
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_bounded_path_matches_two_phase_above_old_threshold(spark):
    """r6 raised SMALL_INPUT_ROWS 2^14 → 2^18: a bounded input in the newly
    single-window region (e.g. the bench's 100k-row claim) must still
    assign the exact two-phase values."""
    from azure_blob_crawler_spark.operators.sequence import SMALL_INPUT_ROWS

    n = 20_000
    assert (1 << 14) < n <= SMALL_INPUT_ROWS  # the region this test pins
    df = spark.range(n).select(
        (F.col("id") % 977).alias("a"), F.col("id").alias("b")
    )
    fast = assign_global_seq(df, ["a", "b"], "seq", bounded_rows=n)
    slow = assign_global_seq(df, ["a", "b"], "seq")
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    out = assign_global_seq(df, ["k"], "seq")
    assert out.count() == 0
    assert "seq" in out.columns


def test_parallel_numbering_no_single_partition_window(spark):
    """The physical plan's window specs all carry a partition key — the
    numbering never funnels the whole input through one task."""
    df = spark.range(5000).select(F.col("id").alias("k"))
    out = assign_global_seq(df, ["k"], "seq")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, line


def test_claim_round_two_phase_matches_plain_window(spark):
    """claim_round with round_size above the bounded threshold takes the
    two-phase rank path; claim_rank must equal the single-window rank."""
    from pyspark.sql import Window

    from azure_blob_crawler_spark.operators import sequence as SEQ
    from azure_blob_crawler_spark.operators.scheduler import _priority, claim_round

    n = SEQ.SMALL_INPUT_ROWS + 5000
    frontier = spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".ex.com/p"), F.col("id")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string"), F.lit(".ex.com")).alias("host"),
        F.col("id").alias("url_hash"),
        (F.col("id") % 3).cast("int").alias("depth"),
        F.col("id").alias("discovery_seq"),
        F.lit("pending").alias("state"),
        F.lit(0).cast("int").alias("attempts"),
    )
    robots = spark.createDataFrame([("h0.ex.com", 0.001)], "host string, crawl_delay_s double")
    claimed = claim_round(frontier, robots, round_size=n, round_seconds=1000.0)
    got = {r["url_hash"]: r["claim_rank"] for r in claimed.collect()}
    # plain single-window reference over the same eligible set
    ref_rows = claim_round(frontier, robots, round_size=n, round_seconds=1000.0) \
        .drop("claim_rank")
    w = Window.orderBy(*_priority())
    want = {
        r["url_hash"]: r["rk"]
        for r in ref_rows.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want
