"""Golden streaming replay + watermark semantics.

§5.2 of SURVEY.md: replay the reference's wire formats through the real
Structured Streaming path (memory sink, availableNow) and assert against
expected rows derived from the reference logs — e.g. the join of
eventstream.log:8 with redisstream.log:8 gives
(Ashley.Khatib@test.com, -16.0, 1965).
"""

import base64
import json
import os
import time

import pytest
from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.streaming.pipeline import (
    build_streaming_stedi,
)
from spark_kafka_realm_time_data_pipeline_spark.streaming.runner import run_to_memory


from conftest import make_envelope


def _envelope(name: str, email: str, birthday: str) -> str:
    return make_envelope(
        {"customerName": name, "email": email, "phone": "8015551212",
         "birthDay": birthday}
    )


def _event(customer: str, score: float, risk_date: str) -> str:
    return json.dumps({"customer": customer, "score": score, "riskDate": risk_date})


# Customers from redisstream.log / dump.rdb; events from eventstream.log /
# stedi.log (FIXTURES.md §2-§4).
CUSTOMERS = [
    ("Sam Test", "sam.test@test.com", "2001-01-03"),
    ("Ashley Khatib", "Ashley.Khatib@test.com", "1965-01-01"),
    ("Sean Howard", "Sean.Howard@test.com", "1958-01-01"),
]
EVENTS = [
    ("Ashley.Khatib@test.com", -16.0, "2023-03-20T15:05:09.155Z"),
    ("Sean.Howard@test.com", -3.0, "2023-03-20T15:05:11.179Z"),
    ("Unknown.Person@test.com", 9.0, "2023-03-20T15:05:13.000Z"),  # no customer -> dropped
]
GOLDEN = {
    ("Ashley.Khatib@test.com", -16.0, "Ashley.Khatib@test.com", "1965"),
    ("Sean.Howard@test.com", -3.0, "Sean.Howard@test.com", "1958"),
}


def _write_stream_dir(spark, tmpdir, rows):
    df = spark.createDataFrame(rows, "value string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    path = os.path.join(tmpdir)
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return spark.readStream.schema("value string, ts timestamp").parquet(path)


def test_golden_reference_join(spark, tmp_path):
    """The reference flagship (sparkpykafkajoin.py:184-209) replayed through
    the watermarked streaming join on its own wire formats."""
    t0 = "2023-03-20 15:00:00"
    cust_rows = [(_envelope(*c), t0) for c in CUSTOMERS]
    ev_rows = [(_event(*e), t0) for e in EVENTS]
    cust_stream = _write_stream_dir(spark, str(tmp_path / "cust"), cust_rows)
    ev_stream = _write_stream_dir(spark, str(tmp_path / "ev"), ev_rows)

    joined = build_streaming_stedi(
        spark, cust_stream, ev_stream, watermark="2 hours", join_window_seconds=3600
    )
    out = run_to_memory(joined, spark)
    got = {(r.customer, r.score, r.email, r.birthYear) for r in out.collect()}
    assert got == GOLDEN


def test_unbounded_parity_join(spark, tmp_path):
    """watermark=None is the reference's exact semantics (no state bound)."""
    t0 = "2023-03-20 15:00:00"
    cust_stream = _write_stream_dir(
        spark, str(tmp_path / "cust"), [(_envelope(*c), t0) for c in CUSTOMERS]
    )
    ev_stream = _write_stream_dir(
        spark, str(tmp_path / "ev"), [(_event(*e), t0) for e in EVENTS]
    )
    joined = build_streaming_stedi(spark, cust_stream, ev_stream, watermark=None)
    out = run_to_memory(joined, spark)
    got = {(r.customer, r.score, r.email, r.birthYear) for r in out.collect()}
    assert got == GOLDEN


def test_checkpoint_resume_processes_only_new_data(spark, tmp_path):
    """Exactly-once-ish recovery (the reference's checkpointLocation,
    sparkpykafkajoin.py:207): restart a stream against the same checkpoint
    and only files that arrived after the first run are processed."""
    import glob
    import shutil

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def add_file(name, rows):
        outdir = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, "k long").coalesce(1).write.parquet(outdir)
        part = glob.glob(os.path.join(outdir, "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    out = str(tmp_path / "out")

    def run_once():
        # memory sink doesn't support recovery; the parquet sink does —
        # it's also the realistic target for a checkpointed pipeline
        stream = spark.readStream.schema("k long").parquet(str(src))
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        total = sum(p["numInputRows"] for p in q.recentProgress)
        q.stop()
        return total

    add_file("a", [(1,), (2,)])
    assert run_once() == 2
    add_file("b", [(3,)])
    # second run resumes from the checkpoint: only file b is new
    assert run_once() == 1
    # and the sink holds each row exactly once
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2, 3]


def test_watermark_drops_late_data(spark, tmp_path):
    """Three micro-batches (maxFilesPerTrigger=1): batch 1 carries the data,
    batch 2 advances the watermark past the first window (emitting it with
    n=2), and a batch-3 event inside that closed window is LATE and must be
    dropped — the defect-regression test for reference defect (b)
    (unbounded state / no late-data policy, sparkpykafkajoin.py:184-187).

    Note Spark applies the late filter with the watermark of the batch being
    processed, which is derived from data committed in EARLIER batches — so
    the watermark-advancing data must land two batches before the late row.
    """
    import glob
    import shutil

    src = tmp_path / "late"
    os.makedirs(src)
    schema = "event_ts timestamp, v int"

    def mk(rows):
        return spark.createDataFrame(rows, "event_ts string, v int").withColumn(
            "event_ts", F.col("event_ts").cast("timestamp")
        )

    batches = [
        mk([("2024-01-01 10:00:00", 1), ("2024-01-01 10:05:00", 1),
            ("2024-01-01 11:30:00", 1)]),
        mk([("2024-01-01 12:30:00", 1)]),  # -> watermark 12:20 for batch 3
        mk([("2024-01-01 10:30:00", 1),    # LATE: window [10:00,11:00) closed
            ("2024-01-01 12:40:00", 1)]),
    ]
    # the file source lists plain files (not parquet output dirs); order is
    # (modTime, path), so stamp strictly increasing mtimes
    now = time.time()
    for i, batch in enumerate(batches, start=1):
        outdir = str(tmp_path / f"w{i}")
        batch.coalesce(1).write.parquet(outdir)
        part = glob.glob(os.path.join(outdir, "part-*.parquet"))[0]
        dest = str(src / f"b{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (now - 300 + i * 60, now - 300 + i * 60))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("event_ts", "10 minutes")
        .groupBy(F.window("event_ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("n"))
        .select(F.col("w.start").cast("string").alias("start"), "n")
    )
    out = run_to_memory(agg, spark, output_mode="append")
    got = {(r.start, r.n) for r in out.collect()}
    # late 10:30 row dropped: [10:00,11:00) emitted once with n=2 (no
    # resurrected duplicate window row); [11:00,12:00) closed with n=1; the
    # [12:00,13:00) window is still open at final watermark and withheld
    assert got == {("2024-01-01 10:00:00", 2), ("2024-01-01 11:00:00", 1)}


def test_streaming_ppl_gate_equals_batch_keep_side(spark):
    """The staged-model streaming gate must reproduce the batch filter's
    keep-side exactly: same docs kept, same integer scores — the bounded
    replay's per-batch scoring is the batch plan partitioned in time."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.curation import (
        lm_perplexity_filter,
    )
    from spark_kafka_realm_time_data_pipeline_spark.queries import registry
    from spark_kafka_realm_time_data_pipeline_spark.sources.files import load_table

    from conftest import SF_DIR

    got = {
        (r["doc_id"], r["n_bigrams"], r["total_bits"], r["avg_milli_bits"])
        for r in registry()["streaming_ppl_gate"].fn(spark, SF_DIR).collect()
    }
    want = {
        (r["doc_id"], r["n_bigrams"], r["total_bits"], r["avg_milli_bits"])
        for r in lm_perplexity_filter(load_table(spark, SF_DIR, "documents"))
        .filter("keep")
        .collect()
    }
    assert got == want
    assert got  # non-degenerate: the gate actually keeps something


def test_streaming_chained_windows_equals_direct_rollup(spark):
    """Chained hour->6-hour stateful aggregation must equal the direct
    6-hour batch aggregate (epoch-aligned windows nest exactly).  Also
    guards the sentinel-pushdown trap: the marker filter lives on the
    RETURNED batch frame because an in-plan filter on the grouping key
    gets pushed below the watermark node and beheads the flush sentinel
    (the failure mode was the final 6-hour window stranded in state)."""
    from spark_kafka_realm_time_data_pipeline_spark.queries import registry
    from spark_kafka_realm_time_data_pipeline_spark.sources.files import load_table

    from conftest import SF_DIR

    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in registry()["streaming_chained_windows"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    want = {
        (str(r["ws"]), r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.window("ts", "6 hours").alias("w6"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w6.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == want


def test_rocksdb_replay_results_identical(spark):
    """RocksDB state-store pin: the session DEFAULT provider is RocksDB
    (session.py), but every bounded registry replay runs the HDFS-backed
    override (runner.REPLAY_STATE_PROVIDER) for speed.  Prove the override
    is purely an execution-strategy choice: the chained stateful window
    query — two stacked watermark aggregations, the deepest state user in
    the suite — must produce byte-identical rows under
    RocksDBStateStoreProvider."""
    from spark_kafka_realm_time_data_pipeline_spark.queries import registry
    from spark_kafka_realm_time_data_pipeline_spark.streaming import runner

    from conftest import SF_DIR

    fn = registry()["streaming_chained_windows"].fn
    hdfs_rows = {tuple(r) for r in fn(spark, SF_DIR).collect()}
    orig = runner.REPLAY_STATE_PROVIDER
    runner.REPLAY_STATE_PROVIDER = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        rocks_rows = {tuple(r) for r in fn(spark, SF_DIR).collect()}
    finally:
        runner.REPLAY_STATE_PROVIDER = orig
    assert rocks_rows == hdfs_rows
    assert len(rocks_rows) > 0
