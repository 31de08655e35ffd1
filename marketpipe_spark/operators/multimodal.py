"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched ``mapInPandas``.

Real media decode (image resize, audio resample, video frame-sample) needs
libs not present in this container — the decode kernels are STUBBED with a
clearly-marked deterministic fake, but everything Spark-side is real and
tested: binary column handling, explicit output schemas, Arrow batch
iteration, and partition-parallel execution. Swapping ``_fake_decode`` for
PIL/ffmpeg is a one-function change.

Scale notes: payloads travel as parquet binary columns; mapInPandas streams
Arrow record batches so executor memory holds one batch of payloads, not a
partition of decoded frames. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` for wide media rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata produced by the (stub) decoder.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic fake of an image-header decode.

    A real implementation would be e.g. ``PIL.Image.open(io.BytesIO(p)).size``;
    that library is unavailable here, so dimensions derive deterministically
    from the payload length (keeps tests and oracles exact).
    """
    n = len(payload)
    return (n % 1024, (n * 7) % 768)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the opaque binary media column (here: utf-8 bytes of the text —
    a stand-in payload with the same Spark-side shape as real media).
    Spread across the cluster so the Python decode workers run in parallel
    even when the input arrives as one small file."""
    from .similarity import spread

    return spread(docs, "doc_id").withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_media_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda p: hashlib.sha256(bytes(p)).hexdigest()),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(batches, MEDIA_META_SCHEMA)


def resize_media(
    docs_with_payload: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """STUB image-resize shape: payload → fixed-size resized payload +
    before/after dims. The real kernel would be
    ``PIL.Image.open(...).resize((w, h)).tobytes()``; the stub emits a
    deterministic ``target_w × target_h``-byte strided re-sample of the
    payload so output SIZE and schema behave exactly like the real op
    (constant bytes-per-row downstream — the property batch sizing relies
    on). Spark-side plumbing (binary in → binary out through Arrow) is real.
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
                sw, sh = _fake_decode(b)
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
