"""SnapshotStore — versioned, bucket-partitioned parquet tables with atomic
manifest commits, MERGE upserts, row-level deletes, snapshot summaries and
time travel.

This is the engine's storage layer standing in for Iceberg (no Iceberg
runtime jar ships in this container). The interface is deliberately
Iceberg-shaped so a cluster deployment swaps it for real Iceberg tables
(``MERGE INTO``, snapshot summary properties, ``VERSION AS OF``) without
touching operator code:

- every table is hash-bucketed on its key (``pmod(xxhash64(key), B)`` —
  Iceberg's ``bucket(B, key)`` partition transform);
- a MERGE only rewrites the buckets its updates touch; untouched buckets'
  files are *reused* across snapshots (Iceberg manifest-reuse semantics), so
  commit cost scales with the delta, not the table — the property that makes
  a 10^10-row frontier/seen table updatable per crawl round;
- a snapshot = JSON manifest {version → bucket → data path, summary};
  commits are atomic via write-temp + ``os.replace`` of the CURRENT pointer
  (single-writer: the Spark driver, exactly like an Iceberg catalog commit);
- readers always see the last committed snapshot; a crash mid-write leaves
  only orphan data dirs (GC'able), never a torn table.

The reference analogue of MERGE-on-key is the search index's
``@search.action=upload`` upsert (shared/azure_clients/search_client.py:70-121)
and the queue's complete/abandon state transitions
(servicebus_client.py:191-264) — both are idempotent-by-key, which is exactly
what makes crash-replay safe here.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- paths/manifests ---------------------------------------------------

    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def current_version(self, name: str) -> int:
        cur = os.path.join(self._tdir(name), "CURRENT")
        if not os.path.exists(cur):
            return 0
        with open(cur) as f:
            return int(f.read().strip())

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    def _manifest(self, name: str, version: int | None = None) -> dict:
        version = version or self.current_version(name)
        with open(os.path.join(self._tdir(name), f"v{version:06d}.json")) as f:
            return json.load(f)

    def _commit(self, name: str, manifest: dict) -> None:
        tdir = self._tdir(name)
        version = manifest["version"]
        tmp = os.path.join(tdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(tdir, f"v{version:06d}.json"))
        tmp2 = os.path.join(tdir, f".tmpcur-{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(str(version))
        os.replace(tmp2, os.path.join(tdir, "CURRENT"))

    def summary(self, name: str, version: int | None = None) -> dict:
        return self._manifest(name, version).get("summary", {})

    def history(self, name: str) -> list[dict]:
        out = []
        for v in range(1, self.current_version(name) + 1):
            try:
                m = self._manifest(name, v)
            except FileNotFoundError:
                continue  # expired snapshot
            out.append({"version": v, "summary": m.get("summary", {})})
        return out

    # --- bucketing ----------------------------------------------------------

    @staticmethod
    def _bucket_col(key_cols: list[str], n_buckets: int):
        return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")

    def _write_buckets(self, name: str, df: DataFrame, version: int) -> str:
        rel = os.path.join("data", f"v{version:06d}")
        out = os.path.join(self._tdir(name), rel)
        # cluster rows by bucket before the partitioned write: without this,
        # every task fans out one file per bucket (tasks × buckets small
        # files per commit); with it, one file per bucket
        df.repartition("__bucket").write.mode("overwrite").partitionBy("__bucket").parquet(out)
        return rel

    def _bucket_paths(self, name: str, manifest: dict, buckets=None) -> list[str]:
        tdir = self._tdir(name)
        sel = manifest["buckets"]
        if buckets is not None:
            wanted = {str(b) for b in buckets}
            sel = {b: p for b, p in sel.items() if b in wanted}
        return [os.path.join(tdir, p) for p in sorted(set(sel.values()))]

    @staticmethod
    def _existing_bucket_dirs(base: str) -> dict[str, str]:
        """bucket id -> relative partition dir actually written."""
        out = {}
        if os.path.isdir(base):
            for entry in os.listdir(base):
                if entry.startswith("__bucket="):
                    out[entry.split("=", 1)[1]] = entry
        return out

    # --- public API ----------------------------------------------------------

    def create(
        self,
        name: str,
        df: DataFrame,
        key: str | list[str],
        n_buckets: int = 16,
        summary: dict | None = None,
    ) -> None:
        key_cols = [key] if isinstance(key, str) else list(key)
        os.makedirs(self._tdir(name), exist_ok=True)
        version = self.current_version(name) + 1
        tagged = df.withColumn("__bucket", self._bucket_col(key_cols, n_buckets))
        rel = self._write_buckets(name, tagged, version)
        base = os.path.join(self._tdir(name), rel)
        buckets = {
            b: os.path.join(rel, d) for b, d in self._existing_bucket_dirs(base).items()
        }
        self._commit(
            name,
            {
                "version": version,
                "key": key_cols,
                "n_buckets": n_buckets,
                "buckets": buckets,
                "summary": summary or {},
            },
        )

    def read(self, name: str, version: int | None = None) -> DataFrame:
        m = self._manifest(name, version)
        paths = self._bucket_paths(name, m)
        if not paths:
            raise ValueError(f"table {name} is empty and schema-less at v{m['version']}")
        return self.spark.read.parquet(*paths)

    def merge(
        self,
        name: str,
        updates: DataFrame,
        delete: bool = False,
        summary: dict | None = None,
    ) -> dict:
        """MERGE INTO semantics on the table key.

        - matched rows are replaced by the update row (or deleted when
          ``delete=True``);
        - unmatched update rows are inserted (ignored when deleting);
        - only buckets present in ``updates`` are rewritten.

        Returns the commit summary (incl. touched-bucket lineage — the
        north rule's per-partition lineage record).
        """
        m = self._manifest(name)
        key_cols, n_buckets = m["key"], m["n_buckets"]
        up = updates.withColumn("__bucket", self._bucket_col(key_cols, n_buckets))
        up = up.dropDuplicates(key_cols)  # MERGE requires unique source keys
        up.persist()
        try:
            touched = sorted(r["__bucket"] for r in up.select("__bucket").distinct().collect())
            cur_paths = self._bucket_paths(name, m, buckets=touched)
            all_paths = self._bucket_paths(name, m)
            if all_paths:
                base_cols = list(self.spark.read.parquet(*all_paths[:1]).columns)
            else:
                base_cols = [c for c in up.columns if c != "__bucket"]
            if cur_paths:
                current = self.spark.read.parquet(*cur_paths).withColumn(
                    "__bucket", self._bucket_col(key_cols, n_buckets)
                )
            else:
                current = None

            if delete:
                merged = (
                    current.join(up.select(*key_cols), key_cols, "left_anti")
                    if current is not None
                    else None
                )
            else:
                src = up.select(*base_cols, "__bucket").withColumn("__pri", F.lit(0))
                if current is not None:
                    tgt = current.select(*base_cols, "__bucket").withColumn("__pri", F.lit(1))
                    unioned = src.unionByName(tgt)
                else:
                    unioned = src
                w = Window.partitionBy(*key_cols).orderBy("__pri")
                merged = (
                    unioned.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn", "__pri")
                )

            version = self.current_version(name) + 1
            new_buckets = dict(m["buckets"])
            for b in touched:
                new_buckets.pop(str(b), None)
            if merged is not None:
                rel = self._write_buckets(name, merged, version)
                base = os.path.join(self._tdir(name), rel)
                for b, d in self._existing_bucket_dirs(base).items():
                    new_buckets[b] = os.path.join(rel, d)
            commit_summary = dict(summary or {})
            commit_summary["touched_buckets"] = touched
            self._commit(
                name,
                {
                    "version": version,
                    "key": key_cols,
                    "n_buckets": n_buckets,
                    "buckets": new_buckets,
                    "summary": commit_summary,
                },
            )
            return commit_summary
        finally:
            up.unpersist()

    def overwrite(self, name: str, df: DataFrame, summary: dict | None = None) -> None:
        m = self._manifest(name)
        self.create(name, df, key=m["key"], n_buckets=m["n_buckets"], summary=summary)

    def rollback(self, name: str, version: int) -> None:
        m = self._manifest(name, version)
        m = dict(m, version=self.current_version(name) + 1, summary={"rollback_to": version})
        self._commit(name, m)

    def expire_snapshots(self, name: str, keep_last: int = 2) -> dict:
        """Iceberg ``expireSnapshots`` parity (and the reference's
        delete-after-processing GC, document_processor.py:344-358): drop all
        but the last ``keep_last`` manifests and delete data directories no
        kept manifest references. Readers of kept versions are unaffected —
        file reuse means a bucket dir may serve many snapshots, so liveness
        is computed over the union of kept manifests."""
        import shutil

        tdir = self._tdir(name)
        current = self.current_version(name)
        keep = set(range(max(1, current - keep_last + 1), current + 1))
        live_dirs: set[str] = set()
        for v in keep:
            for rel in self._manifest(name, v)["buckets"].values():
                # bucket paths look like data/v000007/__bucket=3
                live_dirs.add(rel.split("/__bucket=")[0])
        removed_files = removed_manifests = 0
        data_root = os.path.join(tdir, "data")
        if os.path.isdir(data_root):
            for entry in os.listdir(data_root):
                rel = os.path.join("data", entry)
                if rel not in live_dirs:
                    shutil.rmtree(os.path.join(data_root, entry), ignore_errors=True)
                    removed_files += 1
        for v in range(1, current + 1):
            if v not in keep:
                path = os.path.join(tdir, f"v{v:06d}.json")
                if os.path.exists(path):
                    os.remove(path)
                    removed_manifests += 1
        return {
            "kept_versions": sorted(keep),
            "removed_data_dirs": removed_files,
            "removed_manifests": removed_manifests,
        }
