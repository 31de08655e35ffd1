"""Real image-header decode: stdlib byte parsing of PNG/JPEG/GIF/BMP.

Fixtures include REAL canonical file bytes (a 1x1 PNG and 1x1 GIF as
produced by standard encoders), not just our own synthesized headers, so
the parser is pinned against the formats as they exist in the wild.
"""

from __future__ import annotations

import base64
import struct

from marketpipe_spark.operators.multimodal import parse_media_header

# Canonical tiny files (public, encoder-produced bytes).
PNG_1x1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
GIF_1x1 = base64.b64decode(
    "R0lGODlhAQABAIAAAP///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
)


def _jpeg(w: int, h: int, sof: int = 0xC0, leading_segments: bytes = b"") -> bytes:
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + leading_segments
        + bytes([0xFF, sof]) + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01"
    )


def test_real_png_and_gif_bytes():
    assert parse_media_header(PNG_1x1) == ("png", 1, 1)
    assert parse_media_header(GIF_1x1) == ("gif", 1, 1)


def test_png_large_dims_big_endian():
    b = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
         + struct.pack(">II", 70000, 35000) + b"\x08\x06\x00\x00\x00")
    assert parse_media_header(b) == ("png", 70000, 35000)


def test_jpeg_baseline_and_progressive():
    assert parse_media_header(_jpeg(640, 480)) == ("jpeg", 640, 480)
    assert parse_media_header(_jpeg(640, 480, sof=0xC2)) == ("jpeg", 640, 480)


def test_jpeg_walks_past_comment_exif_and_dht():
    com = b"\xff\xfe" + struct.pack(">H", 5) + b"abc"
    exif = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00\x01\x02"
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"  # 0xC4 is NOT a SOF
    b = _jpeg(123, 45, sof=0xC1, leading_segments=com + exif + dht)
    assert parse_media_header(b) == ("jpeg", 123, 45)


def test_jpeg_without_sof_is_unknown():
    assert parse_media_header(b"\xff\xd8\xff\xd9") == ("unknown", None, None)


def test_bmp_topdown_height_reports_magnitude():
    b = b"BM" + b"\x00" * 16 + struct.pack("<ii", 1920, -1080) + b"\x00" * 10
    assert parse_media_header(b) == ("bmp", 1920, 1080)


def test_gif_little_endian_dims():
    b = b"GIF87a" + struct.pack("<HH", 300, 200) + b"\xf7\x00\x00"
    assert parse_media_header(b) == ("gif", 300, 200)


def test_garbage_and_truncations_are_unknown():
    for b in (b"", b"not media", PNG_1x1[:15], GIF_1x1[:8], b"\xff\xd8",
              b"BM\x00\x00", b"\x89PNG\r\n\x1a\nXXXXIHDR"):
        assert parse_media_header(b)[0] == "unknown"


def test_extract_media_meta_real_headers_end_to_end(spark):
    """Arrow-batched mapInPandas path over real payload bytes: true dims for
    parseable formats, honest unknown/NULL for the rest."""
    from marketpipe_spark.operators.multimodal import extract_media_meta

    rows = [
        (1, PNG_1x1),
        (2, GIF_1x1),
        (3, _jpeg(64, 32)),
        (4, b"plain text payload"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_media_meta(df).collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("png", 1, 1)
    assert (out[2].format, out[2].width, out[2].height) == ("gif", 1, 1)
    assert (out[3].format, out[3].width, out[3].height) == ("jpeg", 64, 32)
    assert (out[4].format, out[4].width, out[4].height) == ("unknown", None, None)
    assert out[1].n_bytes == len(PNG_1x1)
