"""Z-order layout tests: the write-path operator must actually cluster —
each output partition's (x, y) bounding box must be far smaller than the
global key box, which is exactly what makes file-level min/max stats prune
on BOTH dimensions (operators/layout.py)."""

import pyspark.sql.functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators.layout import (
    zorder_layout,
    zvalue,
    zvalue_sql,
)
from spark_kafka_realm_time_data_pipeline_spark.sources.files import load_table

from conftest import SF_DIR


def test_zvalue_interleaves_known_bits(spark):
    # x=0b101 (bits at even positions), y=0b011 (odd positions):
    # z = 1<<0 | 1<<1 | 1<<3 | 1<<4 = 27
    row = (
        spark.range(1)
        .select(zvalue(F.lit(5), F.lit(3), bits=4).alias("z"))
        .collect()[0]
    )
    assert row.z == 27


def test_zvalue_sql_twin_matches(spark):
    import duckdb

    df = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey").limit(200)
    spark_z = sorted(
        r.z
        for r in df.select(
            zvalue(F.col("l_partkey"), F.col("l_suppkey")).alias("z")
        ).collect()
    )
    con = duckdb.connect()
    duck_z = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {zvalue_sql('l_partkey', 'l_suppkey')} FROM "
            f"(SELECT l_partkey, l_suppkey FROM read_parquet('{SF_DIR}/lineitem.parquet') "
            "LIMIT 200)"
        ).fetchall()
    )
    assert spark_z == duck_z


def test_zorder_layout_tightens_bounding_boxes(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    n_parts = 8
    laid = zorder_layout(li, "l_partkey", "l_suppkey", n_parts)
    boxes = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("dx"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("dy"),
        )
        .collect()
    )
    # repartitionByRange may emit fewer non-empty partitions on small or
    # skewed key domains — the bounding-box areas below are the real property
    assert 2 <= len(boxes) <= n_parts
    glob = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("dx"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("dy"),
    ).collect()[0]
    global_area = (glob.dx + 1) * (glob.dy + 1)
    # every partition's key-space box must be a small fraction of the global
    # box — this is the property that yields two-dimensional min/max pruning
    for b in boxes:
        assert (b.dx + 1) * (b.dy + 1) < 0.5 * global_area, b
    mean_area = sum((b.dx + 1) * (b.dy + 1) for b in boxes) / len(boxes)
    assert mean_area < 0.3 * global_area
