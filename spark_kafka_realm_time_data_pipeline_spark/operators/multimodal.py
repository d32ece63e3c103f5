"""Multimodal column pattern: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only place Python touches executor data, amortized per
batch, never per row).

The container has no image/audio libraries, so the real decoder is STUBBED
(``decode_image`` raises NotImplementedError); ``fake_decode_features`` is a
deterministic stand-in exercising the exact same Spark plumbing — schema,
batch iteration, partitioning — that a real decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

FEATURE_SCHEMA = "doc_id long, n_bytes int, n_frames int, byte_feature long"


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the multimodal column pattern to the documents table: payload
    (binary) + metadata struct.  On a real corpus the payload comes off the
    source (parquet/kafka) already binary."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.octet_length("text").alias("n_bytes"),
            (F.col("doc_id") % 1000).alias("shard"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder stub — no imaging libs in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_decode_features for the plumbing path"
    )


def _fake_feature_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    import pandas as pd

    payloads = pdf["payload"].map(lambda b: b or b"")
    n_bytes = payloads.map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int32"),
            # stand-ins for decoded properties (frame count, pixel checksum)
            "n_frames": (n_bytes % 7).astype("int32"),
            "byte_feature": payloads.map(lambda b: int(sum(b[:8]))).astype("int64"),
        }
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_checksum long"
FRAME_SIZE = 32  # bytes per fake "frame"
FRAME_STRIDE = 4  # sample every 4th frame


def _fake_frame_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic frame-sampling stand-in: chop the payload into
    FRAME_SIZE-byte frames, keep every FRAME_STRIDE-th, checksum each.  A
    real video decoder slots in here with the identical one-to-many batch
    shape (one input row -> n output rows)."""
    import pandas as pd

    out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_checksum": []}
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        payload = payload or b""
        n_frames = max((len(payload) + FRAME_SIZE - 1) // FRAME_SIZE, 1)
        for idx in range(0, n_frames, FRAME_STRIDE):
            chunk = payload[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
            out["doc_id"].append(doc_id)
            out["frame_idx"].append(idx)
            out["frame_bytes"].append(len(chunk))
            out["frame_checksum"].append(int(sum(chunk)))
    return pd.DataFrame(out)


def sample_frames(binary_docs: DataFrame) -> DataFrame:
    """One-to-many mapInPandas: binary payload -> sampled frame rows.  The
    row-expanding variant of the multimodal pattern (video frame sampling,
    audio chunking)."""
    return _map_payload_batches(binary_docs, _fake_frame_batch, FRAME_SCHEMA)


RESIZE_CHARS = 64
RESIZE_SCHEMA = "doc_id long, orig_chars int, resized_chars int, resized_checksum long"


def _fake_resize_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic resize stand-in: truncate/NUL-pad the decoded text to
    RESIZE_CHARS characters and checksum Unicode code points (a real image
    resize slots in with the identical batch shape: one row in, one
    fixed-size row out).  Character/code-point semantics (not bytes) so the
    DuckDB oracle — which has no blob byte access — replays it exactly for
    ANY text, not just ASCII."""
    import pandas as pd

    texts = pdf["payload"].map(lambda b: (b or b"").decode("utf-8"))
    resized = texts.map(lambda s: s[:RESIZE_CHARS].ljust(RESIZE_CHARS, "\x00"))
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "orig_chars": texts.map(len).astype("int32"),
            "resized_chars": resized.map(len).astype("int32"),
            "resized_checksum": resized.map(
                lambda s: sum(ord(c) for c in s)
            ).astype("int64"),
        }
    )


def _map_payload_batches(binary_docs: DataFrame, batch_fn, schema: str) -> DataFrame:
    """Shared mapInPandas wrapper for the multimodal operators: narrow map
    over (doc_id, payload), keeps scan partitioning, Arrow both ways."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield batch_fn(pdf)

    return binary_docs.select("doc_id", "payload").mapInPandas(run, schema)


def resize_payloads(binary_docs: DataFrame) -> DataFrame:
    """Arrow-batched fixed-size normalization — the resize member of the
    multimodal quartet (decode / extract / resize / frame-sample)."""
    return _map_payload_batches(binary_docs, _fake_resize_batch, RESIZE_SCHEMA)


def extract_features(binary_docs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column; swap
    ``_fake_feature_batch`` for a real decoder and the plan is unchanged."""
    return _map_payload_batches(binary_docs, _fake_feature_batch, FEATURE_SCHEMA)
