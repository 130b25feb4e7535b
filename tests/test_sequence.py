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
