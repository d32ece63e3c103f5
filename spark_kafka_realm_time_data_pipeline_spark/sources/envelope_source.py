"""Spark 4 Python Data Source for the Redis-CDC customer envelope wire.

The reference's ingest edge is a Kafka Connect Redis source emitting CDC
envelope JSON onto the ``redis-server`` topic (Guide.ipynb cell 2;
consumed by sparkpykafkajoin.py:48-54).  This module is the idiomatic
Spark-4 home for that wire in an environment with no broker: a custom
``DataSource`` registered via ``spark.dataSource.register`` that GENERATES
the envelope rows — the engine-side analog of the reference's Python
event producer (S4) — as both a batch reader and a micro-batch stream
reader, so ``spark.read.format("customer_envelope")`` and
``spark.readStream.format(...)`` both work with ordinary options.

The wire derivation is the repo's standard synthetic identity
(streaming/pipeline.py EMAIL_SQL / BIRTHDAY_SQL, FIXTURES.md §1/§5):
customer key k in [0, n) ->

    name     = 'Customer#' + zero-pad9(k)          (the corpus's c_name law)
    email    = 'user{k}@test.com'
    birthDay = date'1940-01-01' + (k*73) % 21915 days
    value    = envelope JSON wrapping base64(customer JSON)

The JSON produced here only has to be SEMANTICALLY identical to the
Catalyst ``encode_customer_envelope`` output (the decode chain parses it
with from_json, which ignores member order/whitespace) — byte layout is
not part of the contract and is not claimed.

Scale shape: generation is embarrassingly parallel — the key range is
split into ``numPartitions`` independent ``InputPartition``s, each worker
materializes only its own slice, and the decode chain downstream is the
usual Catalyst JSON path.  The streaming reader tracks a single integer
offset (next unemitted key) exactly like a Kafka partition offset; each
micro-batch covers [start, end) and is re-splittable, so replay after
failure is deterministic from the checkpointed offset.
"""

from __future__ import annotations

import base64
import json
from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

SOURCE_NAME = "customer_envelope"
_EPOCH = date(1940, 1, 1)
_KEY_B64 = base64.b64encode(b"Customer").decode("ascii")


def envelope_value(k: int) -> str:
    """The envelope JSON for customer key ``k`` (wire law above)."""
    doc = json.dumps(
        {
            "customerName": f"Customer#{k:09d}",
            "email": f"user{k}@test.com",
            "phone": "8015551212",
            "birthDay": (_EPOCH + timedelta(days=(k * 73) % 21915)).isoformat(),
        }
    )
    return json.dumps(
        {
            "key": _KEY_B64,
            "existType": "NONE",
            "Ch": False,
            "Incr": False,
            "zSetEntries": [
                {"element": base64.b64encode(doc.encode()).decode("ascii"), "score": "0.0"}
            ],
        }
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _split(start: int, end: int, parts: int) -> list[_RangePartition]:
    n = max(end - start, 0)
    parts = max(min(parts, n), 1)
    step = -(-n // parts) if n else 1
    return [
        _RangePartition(s, min(s + step, end)) for s in range(start, end, step)
    ] or [_RangePartition(start, start)]


class _EnvelopeBatchReader(DataSourceReader):
    def __init__(self, n: int, num_partitions: int):
        self.n = n
        self.num_partitions = num_partitions

    def partitions(self):
        return _split(0, self.n, self.num_partitions)

    def read(self, partition: _RangePartition):
        for k in range(partition.start, partition.end):
            yield (envelope_value(k),)


class _EnvelopeStreamReader(DataSourceStreamReader):
    """Kafka-like single-partition offset ([0, n) keys, micro-batched in
    ``batch_size`` chunks); each batch's key range is split for parallel
    read like the batch side."""

    def __init__(self, n: int, num_partitions: int, batch_size: int):
        self.n = n
        self.num_partitions = num_partitions
        self.batch_size = batch_size

    def initialOffset(self):
        return {"next": 0}

    def latestOffset(self):
        # advance at most one batch_size per micro-batch; availableNow
        # keeps triggering until this reaches n
        return {"next": self.n}

    def partitions(self, start, end):
        return _split(int(start["next"]), int(end["next"]), self.num_partitions)

    def read(self, partition: _RangePartition):
        for k in range(partition.start, partition.end):
            yield (envelope_value(k),)

    def commit(self, end):
        pass


class _JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Kafka-producer analog as a Python stream SINK: each partition task
    writes its micro-batch slice to a private staging file (task attempt
    scoped, so a re-run never corrupts a reader), and ``commit`` renames
    the whole batch's files into place atomically-enough for a
    list-after-commit reader; ``abort`` discards the staging files.  The
    two-phase layout is the same contract the parquet sink's
    ``_temporary`` dirs implement — stated in Python so the API surface
    is demonstrated end to end."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        staging = os.path.join(
            self.path, f".staging-{part:05d}-{uuid.uuid4().hex[:8]}.jsonl"
        )
        n = 0
        with open(staging, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommitMessage(staging, n)

    def commit(self, messages, batchId):
        import os

        for m in messages:
            if m is None or m.n_rows == 0:
                if m is not None:
                    os.remove(m.path)
                continue
            final = os.path.join(
                self.path,
                f"batch-{batchId:08d}-{os.path.basename(m.path)[len('.staging-'):]}",
            )
            os.rename(m.path, final)

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class EnvelopeDataSource(DataSource):
    """Reader options: ``n`` (number of customers, required),
    ``numPartitions`` (default 8).  Writer options: ``path`` (directory
    for the JSON-lines sink)."""

    @classmethod
    def name(cls):
        return SOURCE_NAME

    def schema(self):
        return "value string"

    def _params(self):
        n = int(self.options["n"])
        parts = int(self.options.get("numpartitions", 8))
        return n, parts

    def reader(self, schema):
        return _EnvelopeBatchReader(*self._params())

    def streamReader(self, schema):
        n, parts = self._params()
        return _EnvelopeStreamReader(n, parts, batch_size=n)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options["path"])


def register(spark) -> None:
    """Register the source for this session (idempotent — re-registering
    the same name just replaces the entry).

    The class is shipped to the planner/worker Python processes by
    cloudpickle; those processes don't inherit the driver's sys.path (the
    streaming source runner fails with ModuleNotFoundError when the
    session was launched outside the repo), so this module is registered
    for pickle-BY-VALUE — the source carries its own code, exactly like a
    lambda would, and needs no import on the other side."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(EnvelopeDataSource)
