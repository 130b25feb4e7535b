"""Work-item wire-format parsing (servicebus_processor.py:160-209 parity)
and binary→text lossy UTF-8 decode (file_extractor.py:85,94)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from azure_blob_crawler_spark.operators.ingest import (
    make_decode_utf8_udf,
    parse_work_items,
    workitem_parse_sql,
)

MESSAGES = [
    # Event Grid array — first element wins
    ('m1', '[{"data":{"url":"https://acct.blob.core.windows.net/cont1/dir/a.txt"}},'
           '{"data":{"url":"https://acct.blob.core.windows.net/other/b.txt"}}]'),
    # direct format
    ('m2', '{"blob_name":"x/y/z.pdf","container_name":"cdirect"}'),
    # single Event Grid event
    ('m3', '{"data":{"url":"https://acct.blob.core.windows.net/cont3/only.docx"}}'),
    # invalid JSON → dropped (reference completes without processing)
    ('m4', 'not json at all'),
    # valid JSON, no blob info → dropped
    ('m5', '{"something":"else"}'),
    # url with too few parts → dropped
    ('m6', '[{"data":{"url":"https://hostonly"}}]'),
]


def test_parse_work_items(spark):
    df = spark.createDataFrame(MESSAGES, "msg_id string, body string")
    out = {r["msg_id"]: r for r in parse_work_items(df).collect()}
    assert set(out) == {"m1", "m2", "m3"}
    assert out["m1"]["msg_format"] == "event_grid_array"
    assert out["m1"]["container_name"] == "cont1"
    assert out["m1"]["blob_name"] == "dir/a.txt"
    assert out["m2"]["msg_format"] == "direct"
    assert out["m2"]["container_name"] == "cdirect"
    assert out["m2"]["blob_name"] == "x/y/z.pdf"
    assert out["m3"]["msg_format"] == "event_grid_single"
    assert out["m3"]["blob_name"] == "only.docx"


def test_parse_work_items_duckdb_parity(spark):
    """Engine ↔ oracle dialect parity on the valid-JSON messages."""
    valid = [m for m in MESSAGES if m[0] in ("m1", "m2", "m3", "m5", "m6")]
    df = spark.createDataFrame(valid, "msg_id string, body string")
    got = {
        r["msg_id"]: (r["msg_format"], r["container_name"], r["blob_name"])
        for r in parse_work_items(df).collect()
    }
    con = duckdb.connect()
    con.register("msgs", pd.DataFrame(valid, columns=["msg_id", "body"]))
    frags = workitem_parse_sql("body")
    duck = con.sql(
        f"select msg_id, {frags['msg_format']} as f, {frags['container_name']} as c, "
        f"{frags['blob_name']} as b from msgs"
    ).df()
    want = {
        r.msg_id: (r.f, r.c, r.b) for r in duck.itertuples() if r.f is not None
    }
    assert got == want


def test_decode_utf8_lossy(spark):
    rows = [
        ("a", "héllo wörld".encode()),
        ("b", b"ok \xff\xfe broken \xc3"),  # invalid sequences dropped
        ("c", None),
        ("d", b""),
    ]
    df = spark.createDataFrame(rows, "k string, raw binary")
    out = {r["k"]: r["t"] for r in df.select("k", make_decode_utf8_udf()(F.col("raw")).alias("t")).collect()}
    assert out["a"] == "héllo wörld"
    assert out["b"] == b"ok \xff\xfe broken \xc3".decode("utf-8", errors="ignore")
    assert out["b"] == "ok  broken "
    assert out["c"] is None
    assert out["d"] == ""


def test_decode_binary_file_roundtrip(spark, tmp_path):
    """spark.read.format('binaryFile') → lossy decode → span extraction:
    the first thing a real binary-blob user does (round-1 missing #2)."""
    p = tmp_path / "blobs"
    p.mkdir()
    (p / "doc1.txt").write_bytes("alpha beta. gamma delta.".encode())
    (p / "doc2.txt").write_bytes(b"good prefix \xff\xfe then more")
    df = spark.read.format("binaryFile").load(str(p))
    decoded = df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
        make_decode_utf8_udf()(F.col("content")).alias("text"),
    )
    got = {r["name"]: r["text"] for r in decoded.collect()}
    assert got["doc1.txt"] == "alpha beta. gamma delta."
    assert got["doc2.txt"] == "good prefix  then more"
