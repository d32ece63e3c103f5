"""Space-filling-curve data layout (Z-order) for multi-dimension pruning.

At 100 TB a parquet lake is pruned by file-level min/max statistics. A sort
on one column gives perfect pruning on that column and none on any other;
interleaving the bits of two (or more) key columns into a Z-value and
range-partitioning + sorting on it gives each file a small bounding BOX in
key space, so filters on EITHER dimension prune files. This is the layout
trick behind Delta/Iceberg `OPTIMIZE ZORDER BY` — here expressed with plain
Catalyst bit arithmetic (shiftleft/shiftright/bitwiseAND), no UDFs, fully
whole-stage-codegen'd.

The reference has no storage layout at all (its data lives in Kafka topics);
this module is part of the engine's batch-lake posture (SURVEY.md §7 step 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def bits_for(max_key: int) -> int:
    """Bit width covering a key domain [0, max_key] — pass a column max (or
    a known domain bound) so :func:`zvalue` never silently truncates.
    Capped at 31 so two interleaved keys stay within a signed 64-bit long."""
    return min(max(int(max_key).bit_length(), 1), 31)


def zvalue(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton/Z-value: interleave the low ``bits`` bits of ``x`` (even bit
    positions) and ``y`` (odd positions) into one BIGINT.

    Pure integer expression — Catalyst constant-folds the shift amounts and
    codegen emits straight-line long arithmetic; cost is O(bits) ops/row
    with zero shuffles.  ``bits=16`` covers keys up to 65535; keys ABOVE the
    bound have their high bits dropped, aliasing distinct keys to one
    Z-value — clustering quality degrades silently (results stay correct;
    only pruning suffers).  Size ``bits`` from the key domain via
    :func:`bits_for` (e.g. ``bits_for(df.agg(F.max("k")).first()[0])``);
    the z-value stays < 2^(2*bits) <= 2^62.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(y.cast("bigint"), i).bitwiseAND(1), 2 * i + 1)
    return z


def zvalue_sql(x: str, y: str, bits: int = DEFAULT_BITS) -> str:
    """ANSI-SQL twin of :func:`zvalue` (DuckDB `>> << &` on BIGINT) — the
    oracle replays the exact interleave so the check is hash-exact."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(df: DataFrame, x: str, y: str, n_files: int, bits: int = DEFAULT_BITS) -> DataFrame:
    """Re-layout ``df`` for two-dimension pruning: range-partition by
    Z-value into ``n_files`` partitions and sort within each, so every
    output file's (x, y) min/max stats form a tight bounding box.

    Shuffle cost: ONE range-exchange (same as any repartitionByRange); the
    payoff is permanent scan-time pruning on both keys.  Use on write:
    ``zorder_layout(df, "k1", "k2", 1024).write.parquet(...)``.
    """
    z = zvalue(F.col(x), F.col(y), bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def compact_small_files(
    spark, src_dir: str, out_dir: str, target_bytes: int
) -> dict:
    """Small-files compaction EXECUTOR — the rewrite the planner
    (`q_compaction_plan`) only reports: bin-pack the table's data files
    into `target_bytes` output groups by contiguous roll-over packing and
    rewrite each group as exactly ONE file, in a single Spark job.

    Shape (the Iceberg `rewriteDataFiles` / Delta `OPTIMIZE` move, in
    plain open Spark):
    - the file manifest is DRIVER-SIDE METADATA (name + size per data
      file), as in any table format; packing it is integer arithmetic
      over |files| rows, never row data;
    - the rewrite is ONE distributed plan: scan all input files, tag each
      row with its file's assigned bucket via a broadcast manifest join
      on `input_file_name()`, hash-repartition on the bucket id, and
      `write.partitionBy(bucket)` — each bucket lands wholly in one task,
      so each output directory holds exactly one data file.  No driver
      loop over groups, no per-group job storm: 10k small files compact
      in one shuffle.

    Returns {"n_input_files", "n_output_files", "out_dir"}; the caller
    verifies content preservation (that is the oracle's job — a rewrite
    that loses or duplicates rows must fail the value hash)."""
    import os

    parts = sorted(
        f
        for f in os.listdir(src_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    sizes = [os.path.getsize(os.path.join(src_dir, f)) for f in parts]
    buckets, start = [], 0
    for sz in sizes:
        buckets.append(start // target_bytes)
        start += sz
    manifest = spark.createDataFrame(
        list(zip(parts, buckets)), "file_name string, compact_bucket bigint"
    )
    df = spark.read.parquet(src_dir).withColumn(
        "file_name", F.substring_index(F.input_file_name(), "/", -1)
    )
    (
        df.join(F.broadcast(manifest), "file_name")
        .drop("file_name")
        .repartition("compact_bucket")
        .write.mode("overwrite")
        .partitionBy("compact_bucket")
        .parquet(out_dir)
    )
    n_out = 0
    for root, _dirs, files in os.walk(out_dir):
        n_out += sum(
            1 for f in files if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return {
        "n_input_files": len(parts),
        "n_output_files": n_out,
        "out_dir": out_dir,
    }
