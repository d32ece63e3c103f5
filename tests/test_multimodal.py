"""BMP / PNG / WAV codec tests — pure Python, no Spark session needed.

Each decoder must be a real parser, not merely the encoder's inverse: the
independent-writer tests decode files hand-packed byte-by-byte in the test
(BMP with stride padding, PNG with a split IDAT stream).
"""

import struct

from spark_kafka_realm_time_data_pipeline_spark.operators.multimodal import (
    BMP_H_BASE,
    BMP_H_MOD,
    BMP_W_BASE,
    BMP_W_MOD,
    decode_bmp,
    encode_bmp,
)


def test_bmp_roundtrip_cycles_payload_bytes():
    data = b"hello bmp world"
    n = len(data)
    w, h, raster = decode_bmp(encode_bmp(data))
    assert w == BMP_W_BASE + n % BMP_W_MOD
    assert h == BMP_H_BASE + n % BMP_H_MOD
    assert len(raster) == 3 * w * h
    assert raster == bytes(data[j % n] for j in range(3 * w * h))


def test_decode_handles_independent_writer_with_stride_padding():
    # 3x2 24-bit BMP packed by hand: row stride = 12 (9 pixel bytes + 3 pad).
    # Top row pixels 1..9, bottom row 10..18; file stores rows bottom-up.
    w, h, stride = 3, 2, 12
    top = bytes(range(1, 10))
    bottom = bytes(range(10, 19))
    pixel_data = bottom + b"\x00" * 3 + top + b"\x00" * 3
    payload = (
        struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
        + pixel_data
    )
    assert len(pixel_data) == h * stride
    dw, dh, raster = decode_bmp(payload)
    assert (dw, dh) == (w, h)
    assert raster == top + bottom  # reassembled top-down, padding stripped


def test_empty_payload_encodes_zero_pixels():
    w, h, raster = decode_bmp(encode_bmp(b""))
    assert (w, h) == (BMP_W_BASE, BMP_H_BASE)
    assert raster == bytes(3 * w * h)
    assert sum(raster) == 0


def test_png_roundtrip_exercises_all_five_filters():
    from spark_kafka_realm_time_data_pipeline_spark.operators.multimodal import (
        PNG_H_BASE,
        PNG_H_MOD,
        PNG_W_BASE,
        PNG_W_MOD,
        decode_png,
        encode_png,
    )

    # len 44 -> h = 3 + 44 % 7 = 5 rows: filters None/Sub/Up/Average/Paeth
    data = bytes((i * 37 + 11) % 256 for i in range(44))
    n = len(data)
    w, h, raster = decode_png(encode_png(data))
    assert w == PNG_W_BASE + n % PNG_W_MOD
    assert h == PNG_H_BASE + n % PNG_H_MOD == 5
    assert raster == bytes(data[j % n] for j in range(w * h))


def test_png_decode_handles_independent_writer_with_split_idat():
    """A real PNG writer may split the zlib stream across several IDAT
    chunks; hand-pack a 3x2 gray8 image (filter-None rows) that way."""
    import zlib

    from spark_kafka_realm_time_data_pipeline_spark.operators.multimodal import (
        PNG_SIG,
        decode_png,
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    raster = bytes(range(1, 7))
    stream = zlib.compress(b"\x00" + raster[:3] + b"\x00" + raster[3:])
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    payload = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", stream[:4])
        + chunk(b"IDAT", stream[4:])
        + chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (3, 2, raster)


def test_png_decode_rejects_corrupt_crc_and_rgb_variant():
    import re
    import zlib

    import pytest

    from spark_kafka_realm_time_data_pipeline_spark.operators.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    tampered = bytearray(encode_png(b"tamper"))
    tampered[len(tampered) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(tampered))

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)  # color type 2 = RGB
    rgb = (
        PNG_SIG
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(ValueError, match=re.escape("unsupported PNG variant")):
        decode_png(rgb)


def test_wav_roundtrip_maps_bytes_to_samples():
    from spark_kafka_realm_time_data_pipeline_spark.operators.multimodal import (
        WAV_RATE_BASE,
        WAV_RATE_MOD,
        decode_wav,
        encode_wav,
    )

    data = b"audio payload bytes!"
    rate, samples = decode_wav(encode_wav(data))
    assert rate == WAV_RATE_BASE + (len(data) % WAV_RATE_MOD) * 1000
    assert list(samples) == [(b - 128) * 256 for b in data]


def test_wav_decode_rejects_stereo():
    import pytest

    from spark_kafka_realm_time_data_pipeline_spark.operators.multimodal import (
        decode_wav,
    )

    stereo = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="unsupported WAV variant"):
        decode_wav(stereo)


def test_wav_decode_skips_unknown_chunks():
    """A writer may insert LIST/INFO chunks between fmt and data; the
    word-aligned chunk walk must skip them."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    wav = encode_wav(b"xy")
    fmt_chunk = wav[12:36]
    data_chunk = wav[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded to even
    rebuilt = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt_chunk) + len(extra) + len(data_chunk))
        + b"WAVE" + fmt_chunk + extra + data_chunk
    )
    rate, samples = decode_wav(rebuilt)
    assert list(samples) == [(ord("x") - 128) * 256, (ord("y") - 128) * 256]
