"""Numeric-parity helpers.

Double-precision aggregation order differs between Spark (parallel partial
aggregates) and the DuckDB oracle, so double sums are not bit-stable. The
engine's discipline: aggregate in exact DECIMAL arithmetic, cast to DOUBLE at
the very end — bit-identical on both engines and schema-stable (plain
DOUBLE). SURVEY.md §7 "hard parts" (1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: str | Column) -> Column:
    """Exact decimal(12,2) sum, emitted as double (the oracle twin ORA_DSUM
    is pinned to the same precision — use ``dec`` directly for other
    precisions and write the matching SQL inline)."""
    return F.sum(dec(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Exact decimal(12,2) sum divided by count in double — both operands
    are bit-identical across engines, so the IEEE division is too."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c)


# DuckDB-side SQL twins (format with the column expression)
ORA_DSUM = "CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE)"
ORA_DAVG = "CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE) / COUNT({c})"
