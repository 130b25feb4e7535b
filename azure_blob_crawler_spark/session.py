"""SparkSession construction with scale-oriented defaults.

AQE (incl. skew-join handling) is on, Arrow is on for pandas-UDF transfer,
shuffle partitions default to the core count so local runs mirror a
cluster's executor-count-proportional sizing.
"""

from __future__ import annotations

import os

import pandas  # noqa: F401 — resolvable annotation target for the warm-up UDF

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-crawl-frontier",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores in ("*",) else max(int(cores), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Spawn the Python UDF worker daemon once at session construction.

    The first pandas-UDF job in a session pays daemon startup + Arrow init
    (~1-2 s measured); without this it lands on whichever operator happens
    to hit Python first. One tiny identity-UDF job moves that cost into
    session setup — pure engine warm-up, no query data touched."""
    if getattr(spark, "_py_workers_warm", False):
        return
    try:
        from pyspark.sql import functions as F

        @F.pandas_udf("long")
        def _ident(s: "pandas.Series") -> "pandas.Series":
            return s

        n = spark.sparkContext.defaultParallelism
        spark.range(n, numPartitions=n).select(_ident("id")).write.format(
            "noop"
        ).mode("overwrite").save()
        spark._py_workers_warm = True
    except Exception:
        pass  # warm-up is best-effort; never block session creation
