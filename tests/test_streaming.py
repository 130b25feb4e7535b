"""Structured Streaming: incremental link ingest with dedup-into-frontier,
and watermarked windowed aggregation."""

import os

from pyspark.sql import functions as F

from azure_blob_crawler_spark.sources.store import SnapshotStore
from azure_blob_crawler_spark.streaming.rounds import (
    stream_ingest_links,
    windowed_event_counts,
)


def write_links(spark, path, rows):
    spark.createDataFrame(rows, "url string, depth int, discovery_seq long").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_ingest_links_dedup(spark, tmp_path):
    links_dir = str(tmp_path / "links")
    os.makedirs(links_dir)
    store = SnapshotStore(spark, str(tmp_path / "store"))

    write_links(spark, links_dir, [
        ("https://A.example.com/x.txt", 1, 100),
        ("https://a.example.com/x.txt#f", 1, 101),  # canonical dup of the above
        ("https://b.example.com/y.txt", 1, 102),
    ])
    stream_ingest_links(spark, links_dir, store)
    got1 = {r["url"] for r in store.read("frontier").collect()}
    assert got1 == {"https://a.example.com/x.txt", "https://b.example.com/y.txt"}

    # second batch: one repeat (must not duplicate or reset state), one new
    write_links(spark, links_dir, [
        ("https://b.example.com/y.txt", 2, 103),
        ("https://c.example.com/z.txt", 1, 104),
    ])
    stream_ingest_links(spark, links_dir, store)
    rows = {r["url"]: r for r in store.read("frontier").collect()}
    assert set(rows) == {
        "https://a.example.com/x.txt",
        "https://b.example.com/y.txt",
        "https://c.example.com/z.txt",
    }
    assert rows["https://b.example.com/y.txt"]["depth"] == 1  # stored row untouched


def test_windowed_event_counts(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from wincounts").collect()
    assert len(got) > 0
    # cross-check one bucket against the batch computation
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n")
    )
    bmap = {(r["wstart"], r["event_type"]): r["n"] for r in batch.collect()}
    for r in got:
        assert bmap[(r["wstart"], r["event_type"])] == r["n"]


def test_stream_unseen_urls_stateful(spark, tmp_path):
    """First-seen semantics hold WITHIN a drain, ACROSS micro-batch files,
    and ACROSS separate availableNow runs (state lives in the checkpoint)."""
    from azure_blob_crawler_spark.streaming.rounds import stream_unseen_urls

    links_dir = str(tmp_path / "links")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(links_dir)

    write_links(spark, links_dir, [
        ("https://a.example.com/1.txt", 0, 1),
        ("https://a.example.com/1.txt#frag", 0, 2),   # canonical dup, same drain
        ("https://b.example.com/2.txt", 0, 3),
    ])
    stream_unseen_urls(spark, links_dir, out_dir, ckpt)
    got1 = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {"https://a.example.com/1.txt", "https://b.example.com/2.txt"}

    # a later drain with a repeat + a new URL: the repeat must be suppressed
    # by the CHECKPOINTED filter state, not batch-local memory
    write_links(spark, links_dir, [
        ("https://b.example.com/2.txt", 1, 4),
        ("https://c.example.com/3.txt", 1, 5),
    ])
    stream_unseen_urls(spark, links_dir, out_dir, ckpt)
    rows = [r for r in spark.read.parquet(out_dir).collect()]
    urls = sorted(r["url"] for r in rows)
    assert urls == [
        "https://a.example.com/1.txt",
        "https://b.example.com/2.txt",
        "https://c.example.com/3.txt",
    ]
    # every emitted hash unique — the operator IS the seen-set
    hashes = [r["url_hash"] for r in rows]
    assert len(hashes) == len(set(hashes))
