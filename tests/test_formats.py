"""Source-format breadth: the engine reads/writes more than parquet.

The corpus ships as parquet; a real pipeline also lands CSV/JSON/ORC.  Each
format round-trips a typed sample losslessly with an explicit schema (the
engine's no-inference discipline, SURVEY §1.2)."""

import pytest
from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.sources.files import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def sample(spark):
    # timestamps rendered to micros strings for the CSV/JSON legs
    # deterministic selection: an unordered limit could pick different rows
    # on each of the two executions (write job vs collect)
    return (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
            "user_id",
            "event_type",
            "value",
        )
        .filter(F.col("event_id") < 200)
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip(spark, sample, fmt, tmp_path):
    out = str(tmp_path / f"events_{fmt}")
    writer = sample.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(out)

    reader = spark.read.format(fmt).schema(
        "event_id long, ts_s string, user_id long, event_type string, value double"
    )
    if fmt == "csv":
        reader = reader.option("header", "true")
    back = reader.load(out)

    orig = {tuple(r) for r in sample.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig, f"{fmt} round-trip mismatch"
