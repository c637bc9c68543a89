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


def _wav(channels: int, rate: int, n_samples: int, bits: int = 16, fmt: int = 1,
         pad_chunk: bool = False) -> bytes:
    data = bytes((x * 5) % 256 for x in range(n_samples * channels * (bits // 8)))
    fmt_body = struct.pack(
        "<HHIIHH", fmt, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    chunks = b""
    if pad_chunk:  # odd-sized chunk before fmt: exercises 2-byte alignment
        chunks += b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    chunks += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_parse_and_errors():
    from e_commerce_data_warehouse_recommendation_system_spark.operators.multimodal import (
        _parse_wav,
    )

    assert _parse_wav(_wav(1, 8000, 100)) == (1, 8000, 100)
    assert _parse_wav(_wav(2, 44100, 57)) == (2, 44100, 57)
    assert _parse_wav(_wav(2, 16000, 31, pad_chunk=True)) == (2, 16000, 31)
    with pytest.raises(NotImplementedError):  # ADPCM = compressed class
        _parse_wav(_wav(1, 8000, 10, fmt=2))
    with pytest.raises(ValueError):
        _parse_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):  # truncated data chunk
        _parse_wav(_wav(1, 8000, 100)[:-20])


def test_real_audio_probe_through_mapinpandas(spark):
    from e_commerce_data_warehouse_recommendation_system_spark.operators.multimodal import (
        AUDIO_SCHEMA,
        probe_audio_batch,
    )

    rows = [(1, _wav(1, 8000, 4000)), (2, _wav(2, 44100, 44100))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in df.mapInPandas(
            lambda it: probe_audio_batch(it, real_decode=True), schema=AUDIO_SCHEMA
        ).collect()
    }
    assert (out[1].channels, out[1].sample_rate, out[1].n_samples) == (1, 8000, 4000)
    assert out[1].ms_duration == 500
    assert (out[2].channels, out[2].sample_rate, out[2].n_samples) == (2, 44100, 44100)
    assert out[2].ms_duration == 1000


def _avi(width: int, height: int, n_frames: int, usec_per_frame: int,
         junk_first: bool = False) -> bytes:
    """Minimal RIFF/AVI: optional junk chunk, then LIST hdrl with an avih
    main header (56-byte standard body)."""
    avih_body = struct.pack(
        "<5I", usec_per_frame, 0, 0, 0, n_frames
    ) + struct.pack("<3I", 0, 1, 0) + struct.pack("<2I", width, height) + b"\x00" * 16
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih_body)) + avih_body
    chunks = b""
    if junk_first:
        chunks += b"JUNK" + struct.pack("<I", 5) + b"xxxxx" + b"\x00"
    chunks += b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"AVI " + chunks


def test_avi_parse_and_errors():
    from e_commerce_data_warehouse_recommendation_system_spark.operators.multimodal import (
        _parse_avi,
    )

    # 40000 us/frame = 25.000 fps
    assert _parse_avi(_avi(640, 480, 250, 40000)) == (640, 480, 250, 25000)
    # odd-size junk chunk forces the 2-byte alignment path
    assert _parse_avi(_avi(1920, 1080, 24, 33333, junk_first=True)) == (
        1920, 1080, 24, 30000,
    )
    with pytest.raises(ValueError):  # WAV magic is not AVI
        _parse_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError):  # zero us/frame is degenerate
        _parse_avi(_avi(640, 480, 10, 0))
    with pytest.raises(ValueError):  # container with no header list
        _parse_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    # cut mid-avih: declared size intact, bytes missing -> data-error
    # class (ValueError), never a leaked struct.error
    with pytest.raises(ValueError):
        _parse_avi(_avi(640, 480, 250, 40000)[:40])


def test_real_video_probe_through_mapinpandas(spark):
    from e_commerce_data_warehouse_recommendation_system_spark.operators.multimodal import (
        VIDEO_SCHEMA,
        probe_video_batch,
    )

    rows = [(1, _avi(640, 480, 250, 40000)), (2, _avi(320, 240, 60, 16667))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in df.mapInPandas(
            lambda it: probe_video_batch(it, real_decode=True), schema=VIDEO_SCHEMA
        ).collect()
    }
    assert (out[1].width, out[1].height, out[1].n_frames) == (640, 480, 250)
    assert out[1].fps_milli == 25000
    assert out[1].ms_duration == 10000  # 250 frames at 25 fps
    assert (out[2].width, out[2].height) == (320, 240)
