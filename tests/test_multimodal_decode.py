"""Real-decode seam: the mapInPandas codec stage must actually parse
uncompressed raster payloads (PPM P6, 24-bpp BMP) with stdlib byte parsing —
dimensions come from the HEADERS, not from byte-length arithmetic — and must
reserve NotImplementedError for genuinely compressed codecs (JPEG/PNG).
Payloads are synthesized in-test, so the expected geometry is known exactly.
"""

from __future__ import annotations

import struct

import pytest

from e_commerce_data_warehouse_recommendation_system_spark.operators.multimodal import (
    PATCH,
    DECODE_SCHEMA,
    _decode_payload,
    decode_image_batch,
)


def _ppm(width: int, height: int, comment: bool = False) -> bytes:
    header = b"P6\n"
    if comment:
        header += b"# synthesized by tests\n"
    header += f"{width} {height}\n255\n".encode()
    return header + bytes((x * 7) % 256 for x in range(width * height * 3))


def _bmp(width: int, height: int, top_down: bool = False) -> bytes:
    row = (width * 3 + 3) // 4 * 4
    pixels = bytes((x * 3) % 256 for x in range(row * height))
    h = -height if top_down else height
    file_size = 54 + len(pixels)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    )
    return header + pixels


def test_parse_dispatch_and_errors():
    assert _decode_payload(_ppm(12, 9)) == (12, 9)
    assert _decode_payload(_ppm(5, 4, comment=True)) == (5, 4)
    assert _decode_payload(_bmp(10, 6)) == (10, 6)
    assert _decode_payload(_bmp(7, 3, top_down=True)) == (7, 3)  # negative height
    with pytest.raises(NotImplementedError):  # compressed codec class
        _decode_payload(b"\xff\xd8\xff\xe0rest-of-jpeg")
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\nrest-of-png")
    with pytest.raises(ValueError):  # truncated pixel data is a data error
        _decode_payload(_ppm(12, 9)[:-5])
    with pytest.raises(ValueError):
        _decode_payload(b"GIF89a...")


def test_real_decode_through_mapinpandas(spark):
    """End-to-end through the SAME Arrow stage production uses: synthesized
    payloads in a binary column, real_decode=True, parsed dims + patch
    counts in the typed-metadata output."""
    rows = [
        (1, _ppm(48, 32)),
        (2, _bmp(33, 17)),  # width forces row padding (33*3 = 99 -> 100)
        (3, _ppm(16, 16, comment=True)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in df.mapInPandas(
            lambda it: decode_image_batch(it, real_decode=True), schema=DECODE_SCHEMA
        ).collect()
    }
    assert (out[1].width, out[1].height) == (48, 32)
    assert (out[2].width, out[2].height) == (33, 17)
    assert (out[3].width, out[3].height) == (16, 16)
    for doc_id, payload in rows:
        r = out[doc_id]
        assert r.byte_len == len(payload)
        expected = ((r.width + PATCH - 1) // PATCH) * ((r.height + PATCH - 1) // PATCH)
        assert r.n_patches == expected


def test_compressed_payload_fails_loudly_in_stage(spark):
    """A compressed payload inside a real-decode batch must surface
    NotImplementedError through the executor, not silently fake dims."""
    df = spark.createDataFrame([(9, b"\xff\xd8\xff\xe0jpeg")], "doc_id long, payload binary")
    with pytest.raises(Exception, match="compressed|NotImplemented"):
        df.mapInPandas(
            lambda it: decode_image_batch(it, real_decode=True), schema=DECODE_SCHEMA
        ).collect()
