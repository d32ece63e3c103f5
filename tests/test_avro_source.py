"""Pure-Python Avro container codec + pyavro Python Data Source: byte
round-trip of the primitive codec, block indexing, and the Spark read
path's schema/partitioning contract."""

import io

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
    df = spark.read.format("pyavro").option("path", p).load()
    # one InputPartition per container block — the split contract
    assert df.rdd.getNumPartitions() == 5
    got = sorted((r.k, r.x, r.s, r.b) for r in df.collect())
    assert got == rows
