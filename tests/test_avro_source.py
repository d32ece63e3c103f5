"""Pure-Python Avro container codec + pyavro Python Data Source: byte
round-trip of the primitive codec, block indexing, the Spark read path's
schema/partitioning contract, and the distributed per-partition write."""

import io
import json
import os

import pytest

from spark_kafka_realm_time_data_pipeline_spark.sources import avro_source as A

FIELDS = [("k", "long"), ("x", "double"), ("s", "string"), ("b", "boolean")]


def test_varlong_zigzag_roundtrip_extremes():
    for n in (0, -1, 1, 63, -64, 2**31, -(2**31), 2**62, -(2**62)):
        buf = io.BytesIO()
        A._write_varlong(buf, n)
        buf.seek(0)
        assert A._read_varlong(buf) == n, n


def test_container_roundtrip_both_codecs(tmp_path):
    rows = [
        (i - 50, float(i) * -1.5, "s" * (i % 7), i % 3 == 0) for i in range(1000)
    ]
    for codec in ("deflate", "null"):
        p = str(tmp_path / f"t_{codec}.avro")
        assert A.write_avro(p, FIELDS, rows, codec=codec, rows_per_block=128) == 1000
        schema, got_codec, blocks = A.index_blocks(p)
        assert got_codec == codec
        assert len(blocks) == 8  # 1000 rows / 128 per block, ragged last
        assert sum(c for _, c, _ in blocks) == 1000
        got = [
            r
            for (o, c, s) in blocks
            for r in A.read_block(p, o, c, s, codec, FIELDS)
        ]
        assert got == rows


def test_writer_is_deterministic(tmp_path):
    rows = [(i, 0.5 * i, f"v{i}", False) for i in range(300)]
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    A.write_avro(p1, FIELDS, rows)
    A.write_avro(p2, FIELDS, rows)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_empty_file_yields_empty_frame(tmp_path, spark):
    p = str(tmp_path / "empty.avro")
    A.write_avro(p, FIELDS, [])
    A.register(spark)
    df = spark.read.format("pyavro").option("path", p).load()
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<k:bigint,x:double,s:string,b:boolean>"


def test_spark_read_matches_blocks_and_splits(tmp_path, spark):
    rows = [(i, float(i), f"r{i}", i % 2 == 0) for i in range(5000)]
    p = str(tmp_path / "big.avro")
    A.write_avro(p, FIELDS, rows, rows_per_block=1000)
    A.register(spark)
    # block boundaries stay the split points: max_partition_bytes=1 forces
    # one InputPartition per container block (the OCF split contract)
    df = (
        spark.read.format("pyavro")
        .option("path", p)
        .option("max_partition_bytes", "1")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    got = sorted((r.k, r.x, r.s, r.b) for r in df.collect())
    assert got == rows
    # default target coalesces these small adjacent blocks into one task
    # (per-task data-source overhead would otherwise dominate the decode)
    # without changing the data
    coalesced = spark.read.format("pyavro").option("path", p).load()
    assert coalesced.rdd.getNumPartitions() == 1
    assert sorted((r.k, r.x, r.s, r.b) for r in coalesced.collect()) == rows


def test_boolean_decode_strict_and_header_negative_map_count():
    # spec booleans are exactly 0x00/0x01; mainstream readers (==0x01
    # compare) would silently decode a stray 0x02 as false — this reader
    # is deliberately stricter and raises, since our writer never emits
    # such a byte and it can only mean corruption
    assert A._read_value(io.BytesIO(b"\x01"), "boolean") is True
    assert A._read_value(io.BytesIO(b"\x00"), "boolean") is False
    with pytest.raises(ValueError, match="boolean"):
        A._read_value(io.BytesIO(b"\x02"), "boolean")
    # spec-legal negative metadata-map count (abs(n) entries prefixed by a
    # byte size) must parse, not misalign into a decode failure
    schema_json = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "k", "type": "long"}]}
    )
    body = io.BytesIO()
    for k, v in (("avro.schema", schema_json), ("avro.codec", "null")):
        for s in (k, v):
            raw = s.encode()
            A._write_varlong(body, len(raw))
            body.write(raw)
    buf = io.BytesIO()
    buf.write(A._MAGIC)
    A._write_varlong(buf, -2)
    A._write_varlong(buf, len(body.getvalue()))
    buf.write(body.getvalue())
    A._write_varlong(buf, 0)
    buf.write(b"\x00" * 16)
    buf.seek(0)
    schema, codec, _sync = A._read_header(buf)
    assert codec == "null"
    assert schema["fields"][0]["name"] == "k"


def test_partitioned_write_one_file_per_partition_roundtrip(tmp_path, spark):
    rows = [(i, float(i) * 0.25, f"r{i}", i % 3 == 0) for i in range(4000)]
    df = spark.createDataFrame(
        rows, "k long, x double, s string, b boolean"
    ).repartition(4, "k")
    out = str(tmp_path / "parts")
    summary = A.write_avro_partitioned(df, out, FIELDS, rows_per_block=500).collect()
    # one container file per partition, executor-side, no driver rows
    files = sorted(f for f in os.listdir(out) if f.endswith(".avro"))
    assert files == [f"part-{i:05d}.avro" for i in range(4)]
    assert sorted(r.partition_id for r in summary) == [0, 1, 2, 3]
    assert sum(r.n_rows for r in summary) == 4000
    A.register(spark)
    back = spark.read.format("pyavro").option("path", out).load()
    # block-granular splits ACROSS the file set (>=1 block per file)
    assert back.rdd.getNumPartitions() >= 4
    assert sorted((r.k, r.x, r.s, r.b) for r in back.collect()) == rows


def test_mixed_schema_directory_rejected_at_plan_time(tmp_path):
    A.write_avro(str(tmp_path / "a.avro"), FIELDS, [(1, 1.0, "x", True)])
    A.write_avro(str(tmp_path / "b.avro"), [("only", "long")], [(2,)])
    with pytest.raises(ValueError, match="schema/codec mismatch"):
        A.index_container_set(str(tmp_path))


def test_decode_block_cols_rejects_unknown_type():
    # the cursor decoder must refuse unsupported field types up front
    # (not silently misparse them through the boolean branch)
    with pytest.raises(ValueError, match="unsupported avro type: int"):
        A._decode_block_cols(b"\x00", 1, [("k", "int")])


def test_container_roundtrip_property():
    """Hypothesis sweep: random row sets (full-range longs, finite
    doubles, unicode strings, bools) survive write -> block index ->
    block decode bit-exactly under both codecs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=20),
        st.booleans(),
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(row, min_size=0, max_size=50), st.sampled_from(["null", "deflate"]))
    def inner(rows, codec):
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.avro")
            assert A.write_avro(p, FIELDS, rows, codec=codec, rows_per_block=7) == len(rows)
            schema, got_codec, blocks = A.index_blocks(p)
            assert got_codec == codec
            got = [
                r
                for (o, c, s) in blocks
                for r in A.read_block(p, o, c, s, codec, FIELDS)
            ]
            assert got == [tuple(r) for r in rows]

    inner()
