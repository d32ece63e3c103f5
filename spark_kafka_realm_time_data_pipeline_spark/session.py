"""SparkSession factory for the engine.

The reference (``/root/reference/sparkpykafkajoin.py:42-45``) builds a bare
``SparkSession`` with default configs on Spark 2.3.4 — no AQE, 200 shuffle
partitions, no tuning. The new engine sets a 100 TB-minded posture from the
start:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  SMJ->BHJ conversion) — Spark 3+/4 built-ins the reference predates.
- ``spark.sql.shuffle.partitions`` sized to local cores for tests; on a real
  cluster this is overridden (or left to AQE coalescing with a high initial
  value).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for the Pandas-UDF extension operators (vectorized transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spark-graft-engine",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's scale posture.

    On a cluster, ``master`` comes from spark-submit; ``local[N]`` is only the
    fallback for the test/bench environment.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the synthetic corpus writes TIMESTAMP(NANOS) parquet, which Spark
        # refuses natively; read as long and convert at the source layer
        # (sources/files.py) — DuckDB likewise truncates nanos to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{n}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
