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
