"""Multimodal column pattern: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only place Python touches executor data, amortized per
batch, never per row).

The container has no imaging LIBRARIES, but BMP needs none: the feature
path round-trips every payload through a REAL 24-bit BMP container —
``encode_bmp`` (deterministic: pixel bytes cycle the payload bytes, so the
oracle can replay the stats analytically) and ``decode_bmp`` (a genuine
pure-Python parser: file/info headers via struct, bottom-up row order,
4-byte row stride padding).  Swapping in a JPEG/PNG decoder changes one
function; the Spark plumbing — schema, batch iteration, partitioning — is
identical.  PNG decodes for real too — chunk walk + CRC32 validation +
stdlib-zlib IDAT inflate + per-row filter reversal (Sub/Up/Average/Paeth).
Audio likewise decodes through a pure-Python WAV (RIFF / 16-bit PCM)
codec; only codecs needing non-stdlib libraries (JPEG/MP3/AAC) and video
remain env-blocked stubs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

FEATURE_SCHEMA = "doc_id long, width int, height int, n_pixels int, pixel_sum long"

# BMP geometry derived from payload length: varies width/height across docs
# (so the decoder's stride/padding handling is actually exercised — w*3 is
# not always a multiple of 4) while staying analytically replayable.
BMP_W_BASE, BMP_W_MOD = 4, 13
BMP_H_BASE, BMP_H_MOD = 4, 5


def encode_bmp(data: bytes) -> bytes:
    """Pack ``data`` into a REAL bottom-up 24-bit BMP: pixel byte j (in
    top-down raster order) is ``data[j % len(data)]`` (0x00 if empty), the
    geometry derives from the payload length, rows are written bottom-up
    with 4-byte stride padding — a standards-conforming file any BMP
    reader opens.  Deterministic, so the DuckDB oracle can compute the
    decoded pixel stats without parsing BMP at all."""
    n = len(data)
    w = BMP_W_BASE + n % BMP_W_MOD
    h = BMP_H_BASE + n % BMP_H_MOD
    total = 3 * w * h
    raster = bytes(data[j % n] for j in range(total)) if n else bytes(total)
    pad = (-3 * w) % 4
    row_bytes = []
    for i in range(h - 1, -1, -1):  # bottom-up row order
        row_bytes.append(raster[i * 3 * w : (i + 1) * 3 * w] + b"\x00" * pad)
    pixel_data = b"".join(row_bytes)
    file_size = 54 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + pixel_data


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit uncompressed BMP: validate the magic, read the pixel
    offset and dimensions from the headers, walk the bottom-up rows with
    stride padding, and return (width, height, top-down raster bytes)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    stride = (width * 3 + 3) // 4 * 4
    rows = []
    for r in range(height):  # file rows are bottom-up; reassemble top-down
        start = pixel_off + r * stride
        rows.append(payload[start : start + width * 3])
    rows.reverse()
    return width, height, b"".join(rows)


# --- PNG (8-bit grayscale, zlib IDAT, all five row filters) ------------------
#
# PNG needs no imaging library: the container is chunks + CRC32 + a zlib
# stream of filtered scanlines, all stdlib.  The encoder below writes a
# standards-conforming file (any PNG reader opens it) and deliberately
# cycles the row filter type 0..4 so the decoder's filter-reversal code
# (Sub/Up/Average/Paeth) is genuinely exercised on every image, not just
# filter-None.  Pixel byte j (top-down raster) is data[j % n], so the
# DuckDB oracle replays decoded stats analytically, same law as BMP.

PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_W_BASE, PNG_W_MOD = 5, 11
PNG_H_BASE, PNG_H_MOD = 3, 7


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to the
    linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(data: bytes) -> bytes:
    """Pack ``data`` into a REAL 8-bit grayscale PNG: pixel byte j (in
    top-down raster order) is ``data[j % len(data)]`` (0x00 if empty),
    geometry derives from the payload length, and each scanline is
    filtered with filter type ``row % 5`` before the zlib deflate — so a
    decoder must reverse None/Sub/Up/Average/Paeth to get the raster back.
    Deterministic, so the DuckDB oracle computes decoded pixel stats
    without parsing PNG at all."""
    import zlib

    n = len(data)
    w = PNG_W_BASE + n % PNG_W_MOD
    h = PNG_H_BASE + n % PNG_H_MOD
    total = w * h
    raster = bytes(data[j % n] for j in range(total)) if n else bytes(total)
    prior = bytes(w)
    filtered = bytearray()
    for r in range(h):
        row = raster[r * w : (r + 1) * w]
        ftype = r % 5
        filtered.append(ftype)
        for x in range(w):
            left = row[x - 1] if x else 0
            up = prior[x]
            upleft = prior[x - 1] if x else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, upleft)
            filtered.append((row[x] - pred) & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray8, no interlace
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Parse an 8-bit grayscale PNG for real: validate the signature, walk
    the chunk list verifying each CRC32, parse IHDR, inflate the
    concatenated IDAT stream with stdlib zlib, and reverse the per-row
    filters (None/Sub/Up/Average/Paeth, bpp=1).  Returns (width, height,
    top-down raster bytes)."""
    import zlib

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    off, w = len(PNG_SIG), None
    idat = bytearray()
    while off + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, off)
        ctype = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + size]
        (crc,) = struct.unpack_from(">I", payload, off + 8 + size)
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG variant: depth={depth} color={color} "
                    f"interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        off += 12 + size
    if w is None:
        raise ValueError("missing IHDR chunk")
    filtered = zlib.decompress(bytes(idat))
    if len(filtered) != h * (w + 1):
        raise ValueError("IDAT length does not match geometry")
    prior = bytes(w)
    rows = []
    for r in range(h):
        ftype = filtered[r * (w + 1)]
        line = filtered[r * (w + 1) + 1 : (r + 1) * (w + 1)]
        row = bytearray(w)
        for x in range(w):
            left = row[x - 1] if x else 0
            up = prior[x]
            upleft = prior[x - 1] if x else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            elif ftype == 4:
                pred = _paeth(left, up, upleft)
            else:
                raise ValueError(f"bad filter type {ftype}")
            row[x] = (line[x] + pred) & 0xFF
        prior = bytes(row)
        rows.append(prior)
    return w, h, b"".join(rows)


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


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload.  BMP decodes for real (pure Python, no
    libraries); other formats are env-blocked — no imaging libs in this
    container."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "only BMP and PNG decode without an imaging library; JPEG/video "
        "decode requires libs not present in this environment"
    )


def _bmp_feature_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Encode each payload into a real BMP, decode it back with the real
    parser, and emit decoded pixel statistics.  The encode leg stands in
    for 'the corpus already stores images'; the decode leg is the actual
    work a feature-extraction pass does at scale."""
    import pandas as pd

    out = {"doc_id": [], "width": [], "height": [], "n_pixels": [], "pixel_sum": []}
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        width, height, raster = decode_image(encode_bmp(payload or b""))
        out["doc_id"].append(doc_id)
        out["width"].append(width)
        out["height"].append(height)
        out["n_pixels"].append(width * height)
        out["pixel_sum"].append(int(sum(raster)))
    return pd.DataFrame(
        {
            "doc_id": out["doc_id"],
            "width": pd.Series(out["width"], dtype="int32"),
            "height": pd.Series(out["height"], dtype="int32"),
            "n_pixels": pd.Series(out["n_pixels"], dtype="int32"),
            "pixel_sum": pd.Series(out["pixel_sum"], dtype="int64"),
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
    over (doc_id, payload), Arrow both ways.  Python-worker parallelism is
    partition-bound, so the compact rows are fanned out to the session's
    parallelism first (see dedup.fan_out) — a handful of parquet splits
    would otherwise cap the decode at a handful of Python workers."""
    from .dedup import fan_out

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield batch_fn(pdf)

    return fan_out(binary_docs.select("doc_id", "payload")).mapInPandas(run, schema)


def resize_payloads(binary_docs: DataFrame) -> DataFrame:
    """Arrow-batched fixed-size normalization — the resize member of the
    multimodal quartet (decode / extract / resize / frame-sample)."""
    return _map_payload_batches(binary_docs, _fake_resize_batch, RESIZE_SCHEMA)


def extract_features(binary_docs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column: a real BMP
    container round-trip per payload (see _bmp_feature_batch); swap the
    decoder for JPEG/PNG and the plan is unchanged."""
    return _map_payload_batches(binary_docs, _bmp_feature_batch, FEATURE_SCHEMA)


# --- WAV (RIFF / 16-bit PCM) codec -------------------------------------------

WAV_RATE_BASE = 8000  # Hz; actual rate varies with payload length so the
WAV_RATE_MOD = 5  # fmt-chunk parse is exercised, not a constant
AUDIO_SCHEMA = "doc_id long, n_samples int, sample_rate int, amp_sum long, peak int"


def encode_wav(data: bytes) -> bytes:
    """Pack ``data`` into a REAL mono 16-bit PCM WAV — RIFF header, fmt
    chunk, data chunk: byte b becomes the signed sample (b - 128) * 256 and
    the sample rate derives from the payload length.  Standards-conforming
    (any WAV reader plays it) and deterministic, so the DuckDB oracle can
    replay the decoded stats from the text bytes without parsing RIFF."""
    n = len(data)
    rate = WAV_RATE_BASE + (n % WAV_RATE_MOD) * 1000
    samples = struct.pack(f"<{n}h", *((b - 128) * 256 for b in data)) if n else b""
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(samples))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )


def decode_wav(payload: bytes) -> tuple[int, "object"]:
    """Parse a RIFF/WAVE container for real: validate the magic, walk the
    word-aligned chunk list to find fmt (must be PCM / mono / 16-bit) and
    data, and reinterpret the data chunk as signed little-endian int16
    samples (a zero-copy numpy view — the batch path stays vectorized)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, rate, samples = 12, None, None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant: fmt={fmt_tag} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            import numpy as np

            samples = np.frombuffer(body[: size // 2 * 2], dtype="<i2")
        off += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples


def decode_audio(payload: bytes) -> tuple[int, "object"]:
    """Decode an audio payload.  WAV/PCM decodes for real (pure Python, no
    libraries); compressed codecs are env-blocked — no audio libs in this
    container."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "only WAV/PCM decodes without an audio library; MP3/AAC/OGG decode "
        "requires libs not present in this environment"
    )


def _wav_feature_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Encode each payload into a real WAV, decode it back with the real
    RIFF parser, and emit decoded waveform statistics — the audio analog
    of _bmp_feature_batch."""
    import pandas as pd

    out = {"doc_id": [], "n_samples": [], "sample_rate": [], "amp_sum": [], "peak": []}
    import numpy as np

    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        rate, samples = decode_audio(encode_wav(payload or b""))
        amps = np.abs(np.asarray(samples, dtype=np.int64))
        out["doc_id"].append(doc_id)
        out["n_samples"].append(len(samples))
        out["sample_rate"].append(rate)
        out["amp_sum"].append(int(amps.sum()))
        out["peak"].append(int(amps.max()) if len(amps) else 0)
    return pd.DataFrame(
        {
            "doc_id": out["doc_id"],
            "n_samples": pd.Series(out["n_samples"], dtype="int32"),
            "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
            "amp_sum": pd.Series(out["amp_sum"], dtype="int64"),
            "peak": pd.Series(out["peak"], dtype="int32"),
        }
    )


def extract_audio_features(binary_docs: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction: a real WAV container
    round-trip per payload; swap the decoder for MP3/AAC and the plan is
    unchanged."""
    return _map_payload_batches(binary_docs, _wav_feature_batch, AUDIO_SCHEMA)


def _png_feature_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Encode each payload into a real PNG and decode it back with the
    real parser — CRC-checked chunk walk, zlib inflate, five-filter
    scanline reversal — then emit decoded pixel statistics.  The PNG
    analog of _bmp_feature_batch (grayscale: 1 byte/pixel)."""
    import pandas as pd

    out = {"doc_id": [], "width": [], "height": [], "n_pixels": [], "pixel_sum": []}
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        width, height, raster = decode_image(encode_png(payload or b""))
        out["doc_id"].append(doc_id)
        out["width"].append(width)
        out["height"].append(height)
        out["n_pixels"].append(width * height)
        out["pixel_sum"].append(int(sum(raster)))
    return pd.DataFrame(
        {
            "doc_id": out["doc_id"],
            "width": pd.Series(out["width"], dtype="int32"),
            "height": pd.Series(out["height"], dtype="int32"),
            "n_pixels": pd.Series(out["n_pixels"], dtype="int32"),
            "pixel_sum": pd.Series(out["pixel_sum"], dtype="int64"),
        }
    )


def extract_png_features(binary_docs: DataFrame) -> DataFrame:
    """Arrow-batched PNG feature extraction: a real compressed-container
    round-trip per payload (deflate on encode, inflate + filter reversal
    on decode) — the closest this sandbox gets to production image decode
    without an imaging library."""
    return _map_payload_batches(binary_docs, _png_feature_batch, FEATURE_SCHEMA)
