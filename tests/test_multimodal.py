"""BMP codec tests — pure Python, no Spark session needed.

The decoder must be a real BMP parser, not merely the encoder's inverse:
test 2 decodes a BMP hand-packed byte-by-byte in the test (independent
writer), with a width whose row stride needs padding.
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
