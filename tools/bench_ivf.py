"""IVF probe-advantage evidence at index scale (round-3 verdict item 7).

Builds an on-disk IVF index over 10^6 deterministic synthetic vectors
partitioned into N_CELLS cells, then measures a probe (n_probe cells) vs an
all-cells probe over the SAME index: wall time, parquet files opened, and
bytes scanned. The claim under test: probe cost ∝ n_probe / n_cells because
the ``cell IN (...)`` predicate lands in the scan's PartitionFilters and
unprobed cells' files are never opened.

Usage: python tools/bench_ivf.py [n_vectors] [n_cells] [n_probe]
Prints one JSON line; numbers recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_blob_crawler_spark.operators import similarity as SIM  # noqa: E402
from azure_blob_crawler_spark.session import get_spark  # noqa: E402

DIM = 32


def synth_vectors(spark, n: int):
    """Deterministic pseudo-random vectors, generated executor-side from the
    row id (no data shipped from the driver): component j of row i is
    sin(i * p_j + q_j) over fixed prime-ish multipliers."""
    a = np.array([0.618 * (j + 1) + 0.137 for j in range(DIM)])
    b = np.array([1.618 * (j + 3) for j in range(DIM)])

    @F.pandas_udf("array<double>")
    def vec_of(ids: pd.Series) -> pd.Series:
        x = ids.to_numpy(dtype=np.float64)[:, None]
        m = np.sin(x * a[None, :] + b[None, :])
        return pd.Series(list(m))

    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec_of(F.col("id")).alias("embedding")
    )


def dir_stats(path: str, cells: list[int] | None = None) -> tuple[int, int]:
    """(n_files, total_bytes) across the index — restricted to the given
    cells' partition dirs when provided."""
    n_files = total = 0
    for entry in os.listdir(path):
        if not entry.startswith("cell="):
            continue
        if cells is not None and int(entry.split("=", 1)[1]) not in cells:
            continue
        d = os.path.join(path, entry)
        for f in os.listdir(d):
            fp = os.path.join(d, f)
            if os.path.isfile(fp) and f.endswith(".parquet"):
                n_files += 1
                total += os.path.getsize(fp)
    return n_files, total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_ivf", cores=cpus, shuffle_partitions=max(int(cpus), 8))
    spark.range(1).count()

    emb = synth_vectors(spark, n)
    t0 = time.time()
    cents = SIM.train_centroids(emb, n_cells=n_cells, sample=4096)
    with_cells = SIM.assign_cells(emb, cents)
    path = os.path.join(tempfile.mkdtemp(prefix="ivf_"), "index")
    SIM.write_ivf_index(with_cells, path)
    build_s = time.time() - t0

    qv = [float(x) for x in np.sin(np.arange(DIM) * 0.77 + 0.3)]

    def timed(np_):
        best = None
        for _ in range(3):
            t0 = time.time()
            SIM.ivf_topk_from_index(spark, path, cents, qv, k=10, n_probe=np_).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    probe_s = timed(n_probe)
    all_s = timed(n_cells)

    q = np.asarray(qv) / np.linalg.norm(qv)
    probed = [int(c) for c in np.argsort(-(cents @ q), kind="stable")[:n_probe]]
    files_probe, bytes_probe = dir_stats(path, probed)
    files_all, bytes_all = dir_stats(path)

    print(json.dumps({
        "n_vectors": n, "n_cells": n_cells, "n_probe": n_probe, "dim": DIM,
        "build_sec": round(build_s, 2),
        "probe_sec": round(probe_s, 3), "allprobe_sec": round(all_s, 3),
        "wall_ratio": round(probe_s / all_s, 4),
        "files_probe": files_probe, "files_all": files_all,
        "bytes_probe": bytes_probe, "bytes_all": bytes_all,
        "bytes_ratio": round(bytes_probe / bytes_all, 4),
        "cell_fraction": round(n_probe / n_cells, 4),
        "cpus": int(cpus),
    }))


if __name__ == "__main__":
    main()
