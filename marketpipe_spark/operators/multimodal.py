"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched ``mapInPandas``.

Image-dimension extraction is REAL: :func:`parse_media_header` decodes
PNG / JPEG / GIF / BMP headers with stdlib bytes work (no PIL), covering
the formats whose dimensions live in a fixed-layout header. Payloads in
any other format come back honestly as ``format='unknown'`` with NULL
dimensions — never fake numbers. Full pixel decode (image resize, audio
resample, video frame-sample) needs libs not present in this container,
so those KERNELS remain clearly-marked stubs, while everything Spark-side
is real and tested: binary column handling, explicit output schemas,
Arrow batch iteration, and partition-parallel execution.

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

    Pure stdlib parsing of the four ubiquitous fixed-header image formats:

    - PNG: 8-byte signature, then the IHDR chunk's big-endian u32 pair.
    - GIF (87a/89a): logical-screen little-endian u16 pair at offset 6.
    - JPEG: walk the marker segments (skipping APPn/EXIF/DHT/etc.) to the
      first start-of-frame marker; height/width are big-endian u16 at
      offsets 5/7 of the SOF payload. Handles baseline (SOF0) through
      progressive (SOF2) and the rest of the SOF family.
    - BMP: BITMAPINFOHEADER little-endian i32 pair at offset 18 (height is
      negative for top-down rows — dimensions report the magnitude).

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
