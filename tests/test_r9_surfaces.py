"""Semantic invariants for the r9 additions — the Python Data Source
envelope wire, the stream-stream full-outer interval join, and the
df.observe() metrics fold.  The oracle hash proves engine parity; these
pin the meaning (wire-law equivalence, outer-row completeness,
telemetry == truth) the hash can't express.
"""

import base64
import json

from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.queries import registry
from spark_kafka_realm_time_data_pipeline_spark.sources.envelope_source import (
    SOURCE_NAME,
    envelope_value,
    register,
)

from conftest import SF_DIR


def _run(spark, name):
    return registry()[name].fn(spark, SF_DIR)


def test_envelope_value_wire_law():
    """The pure-Python generator emits the documented envelope: base64
    'Customer' key, one zSetEntry whose element decodes to the synthetic
    identity for key k."""
    env = json.loads(envelope_value(42))
    assert base64.b64decode(env["key"]) == b"Customer"
    assert env["existType"] == "NONE" and env["Ch"] is False
    doc = json.loads(base64.b64decode(env["zSetEntries"][0]["element"]))
    assert doc["customerName"] == "Customer#000000042"
    assert doc["email"] == "user42@test.com"
    assert doc["birthDay"] == "1948-05-24"  # 1940-01-01 + (42*73) % 21915 days


def test_envelope_pyds_equals_parquet_reencode_path(spark):
    """The registered source + Catalyst decode chain produces exactly the
    rows the parquet-re-encode path (envelope_roundtrip) produces — the
    two wire synthesizers implement one law."""
    via_source = {tuple(r) for r in _run(spark, "envelope_pyds_roundtrip").collect()}
    via_parquet = {tuple(r) for r in _run(spark, "envelope_roundtrip").collect()}
    assert via_source == via_parquet and via_source


def test_envelope_pyds_partitioning(spark):
    """numPartitions splits the key range without loss or duplication."""
    register(spark)
    df = spark.read.format(SOURCE_NAME).option("n", 10).option("numPartitions", 3).load()
    assert df.rdd.getNumPartitions() == 3
    vals = [json.loads(r.value) for r in df.collect()]
    docs = {json.loads(base64.b64decode(v["zSetEntries"][0]["element"]))["email"] for v in vals}
    assert docs == {f"user{k}@test.com" for k in range(10)}


def test_full_outer_join_equals_batch(spark):
    """The watermark-eviction full outer (with flush sentinels) equals the
    batch full-outer interval join row-for-row — matched pairs AND both
    sides' null-extended unmatched rows."""
    from spark_kafka_realm_time_data_pipeline_spark.queries.streaming import _INTERVAL_S

    def _key(t):  # None-safe sort (outer rows carry nulls)
        return tuple((x is None, x or 0) for x in t)

    got = sorted(
        (tuple(r) for r in _run(spark, "streaming_full_outer_join").collect()),
        key=_key,
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    want = sorted(
        (tuple(r)
        for r in p.join(
            c,
            F.expr(
                f"p_uid = c_uid AND c_ts >= p_ts - INTERVAL {_INTERVAL_S} SECONDS"
                " AND c_ts <= p_ts"
            ),
            "full_outer",
        )
        .select(F.coalesce("p_uid", "c_uid").alias("user_id"), "purchase_id", "click_id")
        .collect()),
        key=_key,
    )
    assert got == want
    # both outer shapes actually occur in the corpus (the test would be
    # vacuous on data where everything matches)
    assert any(r[1] is None for r in got) and any(r[2] is None for r in got)


def test_pyds_sink_round_trip_and_layout(spark, tmp_path):
    """The Python stream writer two-phase commit: committed files carry
    the batch prefix, no staging litter survives, and the read-back rows
    equal the stream's input."""
    import os

    from spark_kafka_realm_time_data_pipeline_spark.sources.envelope_source import (
        SOURCE_NAME,
    )

    register(spark)
    src = spark.createDataFrame(
        [(i, f"c{i}") for i in range(20)], "id long, name string"
    )
    src_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    src.repartition(4).write.parquet(src_dir)
    stream = spark.readStream.schema("id long, name string").parquet(src_dir)
    q = (
        stream.writeStream.format(SOURCE_NAME)
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    files = os.listdir(out_dir)
    assert files and all(f.startswith("batch-") for f in files), files
    back = spark.read.schema("id long, name string").json(f"{out_dir}/batch-*")
    assert {tuple(r) for r in back.collect()} == {(i, f"c{i}") for i in range(20)}


def test_state_store_inspect_equals_truth(spark):
    """Checkpointed aggregation state read via the state data source
    equals a direct batch aggregation of the same table."""
    got = {
        r.event_type: (r.n_events, round(r.sum_value, 2))
        for r in _run(spark, "state_store_inspect").collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        r.event_type: (r.n_events, round(r.sum_value, 2))
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_compaction_collapses_files_one_per_bucket(spark, tmp_path):
    """48 fragment files bin-pack into far fewer buckets, exactly one
    data file per bucket directory, and the row multiset is preserved."""
    import os

    from spark_kafka_realm_time_data_pipeline_spark.operators.layout import (
        compact_small_files,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    docs.repartition(48).write.parquet(frag)
    stats = compact_small_files(spark, frag, out, target_bytes=1 << 20)
    assert stats["n_input_files"] == 48
    assert 0 < stats["n_output_files"] < 48
    bucket_dirs = [d for d in os.listdir(out) if d.startswith("compact_bucket=")]
    assert len(bucket_dirs) == stats["n_output_files"]
    for d in bucket_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        assert len(files) == 1, (d, files)
    back = spark.read.parquet(out).drop("compact_bucket")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_observed_metrics_equal_truth(spark):
    """Folded per-batch observe() telemetry == direct batch aggregation."""
    row = _run(spark, "streaming_observed_metrics").collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    truth = ev.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    ).collect()[0]
    assert row.n_rows == truth.n_rows
    assert row.n_purchases == truth.n_purchases
    assert row.n_null_props == 0  # the data-quality gate holds
    assert abs(row.sum_value - truth.sum_value) < 1e-9
    assert row.min_event_id == truth.min_event_id
    assert row.max_event_id == truth.max_event_id


def test_except_all_intersect_all_multiset_law(spark):
    """Bag algebra identity: for every key,
    count(exceptAll) = max(nA - nB, 0) and count(intersectAll) =
    min(nA, nB) — the law the ALL variants exist to uphold (and the
    distinct EXCEPT/INTERSECT collapse would break)."""
    na = {r.k: r.n for r in _run(spark, "set_except_all").groupBy("k").count()
          .withColumnRenamed("count", "n").collect()}
    ni = {r.k: r.n for r in _run(spark, "set_intersect_all").groupBy("k").count()
          .withColumnRenamed("count", "n").collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    counts = (
        o.groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.count("*").alias("n_a"),
            F.sum(
                F.when(F.col("o_orderpriority").startswith("1"), 1).otherwise(0)
            ).alias("n_b"),
        )
        .collect()
    )
    for r in counts:
        assert na.get(r.k, 0) == max(r.n_a - r.n_b, 0), f"exceptAll law at k={r.k}"
        assert ni.get(r.k, 0) == min(r.n_a, r.n_b), f"intersectAll law at k={r.k}"
    assert any(v > 1 for v in na.values()), "difference must retain multiplicity"
    assert any(v > 1 for v in ni.values()), "intersection must retain multiplicity"


def test_agg_moments_match_closed_form(spark):
    """Spark's streaming skewness/kurtosis == the closed-form population
    moments (the definition the DuckDB oracle replays), computed here
    independently in Python."""
    import math

    rows = {r.l_returnflag: r for r in _run(spark, "agg_moments").collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    data = {}
    for r in li.select("l_returnflag", "l_quantity").collect():
        data.setdefault(r.l_returnflag, []).append(float(r.l_quantity))
    for flag, xs in data.items():
        n = len(xs)
        mean = sum(xs) / n
        m2 = sum((v - mean) ** 2 for v in xs) / n
        m3 = sum((v - mean) ** 3 for v in xs) / n
        m4 = sum((v - mean) ** 4 for v in xs) / n
        got = rows[flag]
        assert abs(got.skew_qty - m3 / m2**1.5) < 1e-5, flag
        assert abs(got.kurt_qty - (m4 / m2**2 - 3)) < 1e-5, flag
        assert abs(got.var_qty - m2 * n / (n - 1)) < 1e-5, flag
        assert abs(got.stddev_qty - math.sqrt(m2 * n / (n - 1))) < 1e-5, flag


def test_binaryfile_staging_is_idempotent_and_split_by_file(spark):
    """Second invocation reuses the staged blob dir (no rewrite), and the
    binaryFile scan yields exactly one row per staged doc — blobs are
    never split mid-file."""
    import glob
    import os

    df1 = _run(spark, "binaryfile_source")
    n1 = df1.count()
    # locate the staged dir via the path column of the raw scan
    some_doc = df1.limit(1).collect()[0].doc_id
    df2 = _run(spark, "binaryfile_source")
    assert df2.count() == n1
    ids = [r.doc_id for r in df2.collect()]
    assert len(ids) == len(set(ids)) == n1  # one row per file per doc
    assert some_doc in ids


def test_rate_source_generator_is_deterministic(spark):
    """Two independent availableNow replays of the rate-micro-batch
    producer yield identical aggregates (pinned startTimestamp +
    rowsPerBatch => same values every run)."""
    a = sorted(map(tuple, _run(spark, "streaming_rate_source").collect()))
    b = sorted(map(tuple, _run(spark, "streaming_rate_source").collect()))
    assert a == b
    assert sum(r[1] for r in a) == 5000  # total rows = rowsPerBatch
