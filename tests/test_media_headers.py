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


def _wav(ch=1, sr=8000, bps=16, frames=8000, extra_chunk=False):
    ba = ch * (bps // 8)
    data_size = frames * ba
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, ch, sr, sr * ba, ba, bps
    )
    junk = (b"LIST" + struct.pack("<I", 5) + b"abcde\x00") if extra_chunk else b""
    data = b"data" + struct.pack("<I", data_size)
    return b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE" + fmt + junk + data


def _mp4_box(t: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + t + payload


def test_wav_header_fields_and_duration():
    from marketpipe_spark.operators.multimodal import parse_audio_header

    assert parse_audio_header(_wav()) == ("wav", 1, 8000, 16, 1000)
    assert parse_audio_header(_wav(ch=2, sr=44100, frames=44100)) == (
        "wav", 2, 44100, 16, 1000,
    )
    # odd-sized chunk before data: word-alignment walk must survive it
    assert parse_audio_header(_wav(extra_chunk=True))[0] == "wav"
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00AVI ")[0] == "unknown"
    assert parse_audio_header(b"")[0] == "unknown"


def test_webp_all_three_subformats():
    assert parse_media_header(
        b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8L"
        + struct.pack("<I", 5) + bytes([0x2F])
        + struct.pack("<I", (299 | (199 << 14)))
    ) == ("webp", 300, 200)
    assert parse_media_header(
        b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8X"
        + struct.pack("<I", 10) + b"\x00" * 4
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    ) == ("webp", 640, 480)
    lossy = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 "
        + struct.pack("<I", 10) + b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240)
    )
    assert parse_media_header(lossy) == ("webp", 320, 240)
    # RIFF but not a known VP8 chunk
    assert parse_media_header(
        b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"XXXX" + b"\x00" * 10
    )[0] == "unknown"


def test_mp4_box_walk():
    from marketpipe_spark.operators.multimodal import parse_video_header

    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", 1000, 90000) + b"\x00" * 80,
    )
    tkhd = _mp4_box(
        b"tkhd", b"\x00\x00\x00\x00" + b"\x00" * 72 + struct.pack(">II", 1280 << 16, 720 << 16)
    )
    mp4 = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _mp4_box(
        b"moov", mvhd + _mp4_box(b"trak", tkhd)
    )
    assert parse_video_header(mp4) == ("mp4", 1280, 720, 90000)
    # mvhd version 1 (64-bit times)
    mvhd_v1 = _mp4_box(
        b"mvhd",
        b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(">I", 600) + struct.pack(">Q", 1200)
        + b"\x00" * 80,
    )
    mp4b = _mp4_box(b"ftyp", b"isom") + _mp4_box(b"moov", mvhd_v1)
    assert parse_video_header(mp4b) == ("mp4", None, None, 2000)
    assert parse_video_header(b"nonsense....")[0] == "unknown"


def test_extract_audio_meta_end_to_end(spark):
    from marketpipe_spark.operators.multimodal import extract_audio_meta

    rows = [(1, _wav()), (2, _wav(ch=2, sr=16000, frames=32000)), (3, b"text")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in extract_audio_meta(df).collect()}
    assert (out[1].format, out[1].channels, out[1].sample_rate, out[1].duration_ms) == (
        "wav", 1, 8000, 1000,
    )
    assert (out[2].channels, out[2].sample_rate, out[2].duration_ms) == (2, 16000, 2000)
    assert (out[3].format, out[3].channels) == ("unknown", None)
