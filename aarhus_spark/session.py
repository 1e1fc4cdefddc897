"""SparkSession factory with the engine's pinned configs (SURVEY §4.3)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aarhus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # size post-shuffle partitions by BYTES, not core count: with
        # parallelismFirst=true (the default) AQE refuses to coalesce
        # below defaultParallelism, so tiny shuffles schedule 32 tasks
        # and every sink writes 32 shard files; byte-driven coalescing
        # is the scale-correct behavior (guide §2.2/§6 — partitions in
        # the 100MB-1GB band, output files worth opening) and removes
        # the per-task scheduling + small-file overhead at every size.
        # Both knobs stay env-overridable for cluster tuning.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("AARHUS_AQE_PARALLELISM_FIRST", "false"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("AARHUS_ADVISORY_PARTITION", "64m"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("AARHUS_ARROW_BATCH", "10000"))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.memory", os.environ.get("AARHUS_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
