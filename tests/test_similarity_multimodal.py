"""ANN similarity (brute force vs IVF recall) and multimodal plumbing."""

import numpy as np
import pytest

from azure_blob_crawler_spark.operators import multimodal as MM
from azure_blob_crawler_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(400)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()


def test_brute_force_topk_deterministic(emb):
    q = [float(x) for x in np.random.default_rng(1).standard_normal(64)]
    a = [r["vec_id"] for r in SIM.brute_force_topk(emb, q, k=10).collect()]
    b = [r["vec_id"] for r in SIM.brute_force_topk(emb, q, k=10).collect()]
    assert a == b and len(a) == 10


def test_ivf_recall(emb):
    q = [float(x) for x in np.random.default_rng(2).standard_normal(64)]
    exact = {r["vec_id"] for r in SIM.brute_force_topk(emb, q, k=10).collect()}
    cents = SIM.train_centroids(emb, n_cells=8, sample=400)
    with_cells = SIM.assign_cells(emb, cents).persist()
    got = {r["vec_id"] for r in SIM.ivf_topk(with_cells, cents, q, k=10, n_probe=4).collect()}
    assert len(exact & got) >= 6  # ≥60% recall probing half the cells
    full = {r["vec_id"] for r in SIM.ivf_topk(with_cells, cents, q, k=10, n_probe=8).collect()}
    assert full == exact  # probing all cells = exact


def test_media_plumbing(spark):
    from azure_blob_crawler_spark.sources.synthetic import documents_with_spans

    docs = documents_with_spans(spark, "/root/testdata/sf0.001")
    media = MM.synth_media_df(spark, docs).persist()
    assert media.count() > 0
    assert media.schema == MM.MEDIA_SCHEMA
    feats = MM.fake_feature_extractor(media)
    row = feats.select("media_ref", "features").first()
    assert len(row["features"]) == MM.FEATURE_DIM
    # deterministic across invocations
    row2 = MM.fake_feature_extractor(media).select("media_ref", "features").first()
    assert row["features"] == row2["features"]


def test_decode_stub_raises(spark):
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame([{"media_ref": "x", "doc_id": "d", "kind": "image",
                       "mime": "image/jpeg", "bytes": b"123", "width": 1,
                       "height": 1, "duration_ms": 0}]), schema=MM.MEDIA_SCHEMA
    )
    with pytest.raises(NotImplementedError):
        MM.decode_media(media)


def test_frame_sample_plan(spark):
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame([{"media_ref": "v", "doc_id": "d", "kind": "video",
                       "mime": "video/mp4", "bytes": b"x", "width": 0,
                       "height": 0, "duration_ms": 3500}]), schema=MM.MEDIA_SCHEMA
    )
    frames = MM.frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The on-disk IVF probe must (a) return exactly the in-memory probe's
    result and (b) show the cell predicate as a PartitionFilter in the scan
    (unprobed cells' files never open)."""
    from azure_blob_crawler_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = SIM.train_centroids(emb, n_cells=8, sample=256)
    with_cells = SIM.assign_cells(emb, cents)
    idx = str(tmp_path / "ivf")
    SIM.write_ivf_index(with_cells, idx)

    qv = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    from_index = SIM.ivf_topk_from_index(spark, idx, cents, qv, k=5, n_probe=3)
    in_mem = SIM.ivf_topk(with_cells, cents, qv, k=5, n_probe=3)
    assert [r["vec_id"] for r in from_index.collect()] == [
        r["vec_id"] for r in in_mem.collect()
    ]
    plan = from_index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]


def _make_ppm(w, h):
    """Deterministic P6 gradient image + its numpy ground truth."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = (np.arange(w)[None, :] * 255 // max(w - 1, 1)).astype(np.uint8)
    img[:, :, 1] = (np.arange(h)[:, None] * 255 // max(h - 1, 1)).astype(np.uint8)
    img[:, :, 2] = 7
    header = f"P6\n# gradient\n{w} {h}\n255\n".encode()
    return header + img.tobytes(), img


def _make_wav(rate=8000, freq=440.0, seconds=0.5, n_ch=2):
    import io
    import wave

    t = np.arange(int(rate * seconds)) / rate
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype(np.int16)
    frames = np.repeat(x, n_ch).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(frames)
    return buf.getvalue()


def test_decode_ppm_and_resize_exact():
    data, img = _make_ppm(20, 12)
    got = MM.decode_ppm_py(data)
    assert np.array_equal(got, img)
    small = MM.resize_nearest(img[:, :, 0], 4, 4)
    rows = (np.arange(4) * 12 // 4)
    cols = (np.arange(4) * 20 // 4)
    assert np.array_equal(small, img[:, :, 0][rows][:, cols])


def test_decode_wav_params_and_rms():
    data = _make_wav()
    meta = MM.decode_wav_py(data)
    assert meta["sample_rate"] == 8000 and meta["n_channels"] == 2
    assert meta["duration_ms"] == 500
    # RMS of a 0.5-amplitude sine ≈ 0.5/√2
    assert abs(meta["rms"] - 0.5 / np.sqrt(2)) < 0.01


def test_decode_media_stdlib_dataframe(spark):
    """Real decode through the mapInPandas contract: PPM and WAV rows decode
    genuinely; codec-needing bytes come back with the reason, not an error."""
    ppm, img = _make_ppm(16, 16)
    wav = _make_wav(seconds=0.25, n_ch=1)
    rows = [
        ("img1", "d1", bytearray(ppm)),
        ("aud1", "d2", bytearray(wav)),
        ("jpg1", "d3", bytearray(b"\xff\xd8\xff\xe0 jpeg-ish")),
        ("torn", "d4", bytearray(b"P6\n4 4\n255\n\x00")),  # truncated pixels
    ]
    df = spark.createDataFrame(rows, "media_ref string, doc_id string, bytes binary")
    got = {r["media_ref"]: r for r in MM.decode_media_stdlib(df, thumb=4).collect()}
    assert got["img1"]["ok"] == "ok" and got["img1"]["kind"] == "image"
    assert (got["img1"]["width"], got["img1"]["height"]) == (16, 16)
    gray = img.mean(axis=2)
    want_thumb = (MM.resize_nearest(gray, 4, 4).astype(np.float32) / 255.0).ravel()
    assert np.allclose(got["img1"]["thumb"], want_thumb, atol=1e-6)
    assert got["aud1"]["ok"] == "ok" and got["aud1"]["kind"] == "audio"
    assert got["aud1"]["duration_ms"] == 250 and got["aud1"]["sample_rate"] == 8000
    assert got["jpg1"]["ok"].startswith("codec-not-available")
    assert got["torn"]["ok"].startswith("decode-error")
