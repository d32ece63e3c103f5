"""Batch file sources over the synthetic corpus.

The reference's only sources are Kafka topics (``sparkpykafkajoin.py:48-54``,
``:136-142``); the engine adds first-class batch scans (parquet — columnar,
vectorized, predicate/column pushdown) as the bounded analog, which is what
the DuckDB-oracle harness exercises.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..schemas import TABLES

# Corpus columns written as parquet TIMESTAMP(NANOS): Spark reads them as
# long (spark.sql.legacy.parquet.nanosAsLong) and we convert to micros here,
# matching DuckDB's nanos->micros truncation so oracle comparisons agree.
_NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan. Catalyst handles column pruning + filter
    pushdown; at 100 TB the same call reads a partitioned table and prunes
    partitions — no code change."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(
                col, F.timestamp_micros(F.floor(F.col(col) / F.lit(1000)).cast("long"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (the reference's
    createOrReplaceTempView pattern, sparkpykafkajoin.py:91-93)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
