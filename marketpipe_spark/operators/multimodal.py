"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched ``mapInPandas``.

Metadata extraction is REAL across the three modalities, stdlib-only:
:func:`parse_media_header` decodes PNG / JPEG / GIF / BMP / WebP image
dimensions, :func:`parse_audio_header` decodes WAV channel/rate/bits/
duration from the RIFF chunk list, and :func:`parse_video_header` walks
ISO-BMFF (MP4) boxes for track dimensions and mvhd duration. Payloads in
any other format come back honestly as ``format='unknown'`` with NULL
fields — never fake numbers. Full pixel/sample decode (image resize,
audio resample, video frame-sample) needs libs not present in this
container, so those KERNELS remain clearly-marked stubs, while everything
Spark-side is real and tested: binary column handling, explicit output
schemas, Arrow batch iteration, and partition-parallel execution.

Scale notes: payloads travel as parquet binary columns; mapInPandas streams
Arrow record batches so executor memory holds one batch of payloads, not a
partition of decoded frames. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` for wide media rows.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata produced by the header decoder.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

#: JPEG start-of-frame markers that carry dimensions: SOF0..SOF15 minus the
#: non-frame C4 (DHT), C8 (JPG extension), CC (DAC).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_media_header(b: bytes) -> tuple[str, int | None, int | None]:
    """Decode (format, width, height) from a media payload's header bytes.

    Pure stdlib parsing of the five ubiquitous fixed-header image formats:

    - PNG: 8-byte signature, then the IHDR chunk's big-endian u32 pair.
    - GIF (87a/89a): logical-screen little-endian u16 pair at offset 6.
    - JPEG: walk the marker segments (skipping APPn/EXIF/DHT/etc.) to the
      first start-of-frame marker; height/width are big-endian u16 at
      offsets 5/7 of the SOF payload. Handles baseline (SOF0) through
      progressive (SOF2) and the rest of the SOF family.
    - BMP: BITMAPINFOHEADER little-endian i32 pair at offset 18 (height is
      negative for top-down rows — dimensions report the magnitude).
    - WebP: all three container layouts — VP8 lossy (sync-coded 14-bit
      dims), VP8L lossless (packed minus-one dims), VP8X extended
      (24-bit little-endian canvas, minus-one coded).

    Anything else — truncated headers included — returns
    ``('unknown', None, None)``; callers surface that explicitly rather
    than inventing dimensions.
    """
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", abs(w), abs(h))
    if len(b) >= 16 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        sub = b[12:16]
        if sub == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":
            # lossy: 3-byte frame tag, sync code, then 14-bit LE dims
            w = struct.unpack("<H", b[26:28])[0] & 0x3FFF
            h = struct.unpack("<H", b[28:30])[0] & 0x3FFF
            return ("webp", w, h)
        if sub == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
            bits = struct.unpack("<I", b[21:25])[0]
            return ("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        if sub == b"VP8X" and len(b) >= 30:
            # extended: 24-bit LE canvas dims, minus-one coded
            w = int.from_bytes(b[24:27], "little") + 1
            h = int.from_bytes(b[27:30], "little") + 1
            return ("webp", w, h)
        return ("unknown", None, None)
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:  # lost marker sync: corrupt stream
                break
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte, resynchronize
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
                continue
            if marker == 0xD9 or marker == 0xDA:
                break  # EOI / start-of-scan before any SOF: no dimensions
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if seg_len < 2:
                break
            if marker in _JPEG_SOF:
                if i + 9 > len(b) or seg_len < 7:
                    break
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
    return ("unknown", None, None)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the opaque binary media column (here: utf-8 bytes of the text —
    a stand-in payload with the same Spark-side shape as real media).
    Spread across the cluster so the Python decode workers run in parallel
    even when the input arrives as one small file."""
    from .similarity import spread

    return spread(docs, "doc_id").withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_media_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched): size and
    content hash for every payload, plus REAL header-decoded format and
    dimensions (:func:`parse_media_header`; NULL dims for formats the
    header parser doesn't cover — explicit, never fabricated)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            meta = [parse_media_header(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda p: hashlib.sha256(bytes(p)).hexdigest()),
                    "format": [m[0] for m in meta],
                    "width": pd.Series([m[1] for m in meta], dtype="Int32"),
                    "height": pd.Series([m[2] for m in meta], dtype="Int32"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(batches, MEDIA_META_SCHEMA)


def resize_media(
    docs_with_payload: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """STUB image-resize KERNEL: payload → fixed-size resized payload +
    before/after dims. Source dims come from the REAL header parser
    (:func:`parse_media_header`; NULL for unknown formats); the pixel
    resample itself would be ``PIL.Image.open(...).resize((w, h)).tobytes()``
    — unavailable here, so the stub emits a deterministic
    ``target_w × target_h``-byte strided re-sample of the payload so output
    SIZE and schema behave exactly like the real op (constant bytes-per-row
    downstream — the property batch sizing relies on). Spark-side plumbing
    (binary in → binary out through Arrow) is real.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("src_width", T.IntegerType(), True),
            T.StructField("src_height", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("resized", T.BinaryType(), False),
        ]
    )
    n_out = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) or b"\x00"
                _, sw, sh = parse_media_header(b)
                # strided nearest-neighbor fake: sample n_out bytes evenly
                step = max(len(b) // n_out, 1)
                resized = (b[::step] * (n_out // max(len(b[::step]), 1) + 1))[:n_out]
                rows.append((int(doc_id), sw, sh, target_w, target_h, resized))
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_width", "src_height", "width", "height", "resized"]
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(batches, out_schema)


def frame_sample(docs_with_payload: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB video-frame-sampling shape: emits one row per sampled offset with
    a slice fingerprint. Real impl would demux frames; the Spark-side fan-out
    (one input row → many output rows through mapInPandas) is the part that
    matters and is real."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("frame_sha", T.StringType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for off in range(0, len(b), every_n_bytes):
                    rows.append(
                        (
                            int(doc_id),
                            off,
                            hashlib.sha256(b[off : off + every_n_bytes]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "offset", "frame_sha"])

    return docs_with_payload.select("doc_id", "payload").mapInPandas(batches, out_schema)


#: Typed audio metadata (header decode — no sample data is read).
AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def parse_audio_header(b: bytes) -> tuple:
    """Decode (format, channels, sample_rate, bits_per_sample, duration_ms)
    from a WAV (RIFF/WAVE) payload's chunk headers — stdlib bytes work, no
    audio library, no sample decode. Walks the chunk list (chunks are
    word-aligned) for ``fmt `` (PCM layout) and ``data`` (payload size);
    duration = data bytes / byte rate. Anything else returns
    ``('unknown', None, None, None, None)``."""
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        fmt = data_size = None
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            csz = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(b):
                _, ch, sr, br, _ba, bps = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
                fmt = (ch, sr, br, bps)
            elif cid == b"data":
                data_size = csz
            i += 8 + csz + (csz & 1)  # chunks pad to even offsets
        if fmt:
            ch, sr, br, bps = fmt
            dur = (data_size * 1000) // br if (data_size is not None and br) else None
            return ("wav", ch, sr, bps, dur)
    return ("unknown", None, None, None, None)


def parse_video_header(b: bytes) -> tuple:
    """Decode (format, width, height, duration_ms) from an ISO-BMFF (MP4)
    payload's box structure: ``ftyp`` identifies the container, ``moov/
    mvhd`` carries timescale+duration (v0 and v1 layouts), ``moov/trak/
    tkhd`` carries 16.16-fixed track dimensions. Box walking is stdlib
    bytes work; no frame is decoded. 64-bit (largesize) boxes and anything
    non-BMFF return ``('unknown', None, None, None)``."""

    def boxes(i: int, end: int):
        while i + 8 <= end:
            sz = struct.unpack(">I", b[i : i + 4])[0]
            if sz < 8:  # largesize (1) / to-end (0) unsupported; corrupt guard
                return
            yield b[i + 4 : i + 8], i + 8, min(i + sz, end)
            i += sz

    if len(b) < 12 or b[4:8] != b"ftyp":
        return ("unknown", None, None, None)
    w = h = dur = None
    for typ, s, e in boxes(0, len(b)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in boxes(s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                ver = b[s2]
                if ver == 1 and e2 - s2 >= 32:
                    ts = struct.unpack(">I", b[s2 + 20 : s2 + 24])[0]
                    du = struct.unpack(">Q", b[s2 + 24 : s2 + 32])[0]
                else:
                    ts, du = struct.unpack(">II", b[s2 + 12 : s2 + 20])
                if ts:
                    dur = du * 1000 // ts
            elif t2 == b"trak":
                for t3, s3, e3 in boxes(s2, e2):
                    if t3 == b"tkhd":
                        off = s3 + (88 if b[s3] == 1 else 76)
                        if off + 8 <= e3:
                            ww, hh = struct.unpack(">II", b[off : off + 8])
                            if ww and hh:
                                w, h = ww >> 16, hh >> 16
    return ("mp4", w, h, dur)


def extract_audio_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched WAV header decode over a binary payload column —
    the audio sibling of :func:`extract_media_meta`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            meta = [parse_audio_header(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "format": [m[0] for m in meta],
                    "channels": pd.Series([m[1] for m in meta], dtype="Int32"),
                    "sample_rate": pd.Series([m[2] for m in meta], dtype="Int32"),
                    "bits_per_sample": pd.Series([m[3] for m in meta], dtype="Int32"),
                    "duration_ms": pd.Series([m[4] for m in meta], dtype="Int64"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, AUDIO_META_SCHEMA
    )


#: Typed video metadata (container-header decode — no frame is read).
VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def extract_video_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched ISO-BMFF (MP4) header decode over a binary payload
    column — the video sibling of :func:`extract_media_meta`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            meta = [parse_video_header(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "format": [m[0] for m in meta],
                    "width": pd.Series([m[1] for m in meta], dtype="Int32"),
                    "height": pd.Series([m[2] for m in meta], dtype="Int32"),
                    "duration_ms": pd.Series([m[3] for m in meta], dtype="Int64"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, VIDEO_META_SCHEMA
    )
