"""SparkSession factory.

Local defaults mirror the driver harness (local[$SPARK_GRAFT_CPUS]); the same
builder settings are what we would ship to a 1000-executor cluster — AQE on,
adaptive partition coalescing, skew-join handling, and Arrow for the few
Pandas-UDF paths. Nothing here is local-mode-specific except `master`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "domanda-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-ready defaults.

    AQE handles runtime re-planning (broadcast conversion, partition
    coalescing, skew-join splitting) so the same plan survives a 100x
    scale-up; `shuffle_partitions` is only the pre-AQE upper bound.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # split generated code into smaller methods: the 94-column domanda
        # projection otherwise exceeds JIT limits and pays a failed-compile
        # penalty before falling back (measured: 16.5s -> 13.5s first run)
        .config("spark.sql.codegen.methodSplitThreshold", "256")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
