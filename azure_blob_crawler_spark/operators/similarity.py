"""Approximate-nearest-neighbor search over embedding columns.

Baseline: exact brute-force cosine top-k (Catalyst-native, one pass + a
TakeOrderedAndProject — the correct-by-construction oracle, matching the
semantics the reference's HNSW index approximates, index.json:44-55).

Scale path: IVF (inverted-file) — k-means-ish coarse centroids picked by
deterministic sampling + a few Lloyd iterations (driver-side numpy over a
sample, broadcast), every vector assigned to its nearest centroid
(vectorized pandas UDF), probes search only ``n_probe`` nearest cells.
At 10^10 scale the assignment becomes the partition key so a probe touches
``n_probe/n_cells`` of the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from azure_blob_crawler_spark import config
from azure_blob_crawler_spark.functions.vectors import cosine


def brute_force_topk(
    emb: DataFrame,
    query_vector: list[float],
    k: int = config.DEFAULT_TOP,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    return (
        emb.withColumn("score", cosine(F.col(vec_col), qv))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def train_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 5,
    seed: int = 13,
) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (normalized)."""
    rows = emb.select(vec_col).limit(sample).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-9)
    return cent


def assign_cells(
    emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``cell`` = argmax-cosine centroid id (Arrow-batched matmul)."""
    bc = emb.sparkSession.sparkContext.broadcast(centroids)

    @F.pandas_udf(IntegerType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        cent = bc.value
        out = np.zeros(len(vecs), dtype=np.int32)
        mats = np.array(
            [np.asarray(v, dtype=np.float64) if v is not None else np.zeros(cent.shape[1]) for v in vecs]
        )
        norms = np.maximum(np.linalg.norm(mats, axis=1, keepdims=True), 1e-9)
        out = (mats / norms @ cent.T).argmax(axis=1).astype(np.int32)
        return pd.Series(out)

    return emb.withColumn("cell", cell_of(F.col(vec_col)))


def ivf_topk(
    emb_with_cells: DataFrame,
    centroids: np.ndarray,
    query_vector: list[float],
    k: int = config.DEFAULT_TOP,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``n_probe`` nearest cells only, exact cosine within them.

    Partition pruning: ``cell IN (...)`` is a plain predicate — with the
    table partitioned/bucketed by cell, the scan skips every other cell."""
    q = np.asarray(query_vector, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-9)
    # stable sort on the negated scores: an exact cosine tie at the n_probe
    # boundary breaks to the LOWEST centroid id, matching the q_ivf_topk
    # DuckDB oracle's (score desc, cid asc) ordering ([::-1] on argsort
    # reversed ties toward the highest id)
    order = np.argsort(-(centroids @ q), kind="stable")[:n_probe]
    probed = emb_with_cells.filter(F.col("cell").isin([int(c) for c in order]))
    return brute_force_topk(probed, query_vector, k, vec_col, id_col)


def write_ivf_index(emb_with_cells: DataFrame, path: str) -> None:
    """Persist the IVF index as parquet PARTITIONED BY cell: a probe's
    ``cell IN (...)`` predicate then lands in the scan's PartitionFilters
    and unprobed cells' files are never opened — at 10^10 vectors a probe
    touches ~n_probe/n_cells of the data, verified against the physical plan
    in tests/test_similarity_multimodal.py."""
    emb_with_cells.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_topk_from_index(
    spark,
    path: str,
    centroids: np.ndarray,
    query_vector: list[float],
    k: int = config.DEFAULT_TOP,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe over a partitioned on-disk index (the 10^10-scale read
    path): the cell predicate prunes partitions at planning time."""
    emb = spark.read.parquet(path)
    return ivf_topk(emb, centroids, query_vector, k, n_probe, vec_col, id_col)
