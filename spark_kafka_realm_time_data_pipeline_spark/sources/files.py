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


def convert_nano_ts(df: DataFrame, name: str) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns arrive as long (nanosAsLong) —
    convert to micros. Integer division, NOT floor(x/1000): doubles lose
    precision at ~1.7e18 nanos (> 2^53) and round 1 µs high on ~12% of
    rows, breaking hash parity with the DuckDB oracle."""
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan. Catalyst handles column pruning + filter
    pushdown; at 100 TB the same call reads a partitioned table and prunes
    partitions — no code change."""
    return convert_nano_ts(spark.read.parquet(table_path(sf_dir, name)), name)


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming scan of the same corpus table (file source): the bounded
    analog of the reference's Kafka topic scans (sparkpykafkajoin.py:48-54).
    The file source needs a declared schema (no inference on streams) — read
    it from the parquet footer, which is a metadata-only operation."""
    schema = spark.read.parquet(table_path(sf_dir, name)).schema
    # FileStreamSource requires a directory basePath; select the one table's
    # file with a glob filter over the corpus dir.
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    return convert_nano_ts(df, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (the reference's
    createOrReplaceTempView pattern, sparkpykafkajoin.py:91-93)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
