"""SparkSession factory.

Pins the configuration that correctness and scale depend on:

- ``spark.sql.session.timeZone=UTC`` — the reference stores DATE as epoch
  days and TIMESTAMP as epoch millis with JVM-zone semantics
  (``sync/StandardReadMappings.java:111-152``); pinning UTC makes Spark's
  session-TZ micros agree with both that model and the DuckDB oracle.
- AQE on — runtime re-planning (partition coalescing, skew-join splitting,
  dynamic broadcast) replaces every hand-tuned constant the reference
  hard-codes (fetch size / batch size / queue bound, ``BASELINE.md``).
- Arrow on — vectorized transfer for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cpt-database-sync-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster, drop ``master`` and submit with spark-submit; every
    other setting below is cluster-size-independent (AQE adapts partition
    counts at runtime).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
