"""JSONL document-corpus source/sink — the interchange format every large
text-corpus distribution uses (one JSON object per line, optionally
gzip-compressed per file: the CommonCrawl/RedPajama/Dolma convention).

Beyond-reference surface: the reference ingests only vendor OHLCV JSON
(reference: src/marketpipe/ingestion/, tests/resources/sample_ohlcv_data.json
— covered by :func:`providers.bars_from_json`); a training-data pipeline
additionally needs corpus-shaped text ingestion with schema enforcement
and malformed-line accounting.

Scale design: ``spark.read.json`` on line-delimited input splits cleanly
across executors (gzip members are per-FILE atomic — many .jsonl.gz files
parallelize, one giant one does not, which is the distribution convention
anyway); the explicit schema skips Spark's sampling-based inference pass
entirely (no extra scan) and PERMISSIVE mode funnels malformed lines into
``_corrupt_record`` instead of failing the job — they are counted and
dropped, never silently coerced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The lake's documents schema (TESTDATA.md documents.parquet shape).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    synthesize_ids: bool = False,
) -> DataFrame:
    """Read a JSONL corpus into the documents shape.

    - Rows must carry ``text``; rows with NULL/unparseable text are dropped
      (counted via :func:`corrupt_line_count`, not silently).
    - ``lang`` / ``source`` are optional (NULL when absent); ``n_chars`` is
      recomputed from the text (never trusted from the file).
    - ``doc_id``: taken from ``id_col`` when present. With
      ``synthesize_ids=True`` a missing id is derived as ``xxhash64(text)``
      — a PURE FUNCTION of content, so re-ingesting the same corpus yields
      the same ids on any partitioning/cluster (``zipWithIndex`` or
      ``monotonically_increasing_id`` would be layout-dependent — the
      deterministic-membership discipline of operators/sampling.py).
      Content-hash ids mean exact duplicate texts collapse to one id,
      which downstream exact dedup would do anyway.
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(text_col, T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    raw = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .json(path)
    )
    good = raw.filter(
        F.col("_corrupt_record").isNull() & F.col(text_col).isNotNull()
    )
    did = F.col(id_col)
    if synthesize_ids:
        did = F.coalesce(F.col(id_col), F.xxhash64(F.col(text_col)))
    return good.select(
        did.cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.col("lang"),
        F.col("source"),
        F.length(text_col).cast("long").alias("n_chars"),
    ).filter(F.col("doc_id").isNotNull())


def corrupt_line_count(spark: SparkSession, path: str, text_col: str = "text") -> int:
    """Count lines the PERMISSIVE read rejected (malformed JSON or missing
    text) — the ingest-quality observation a pipeline logs per batch.
    Bounded driver scalar (one count), not a collect."""
    schema = T.StructType(
        [
            T.StructField(text_col, T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    raw = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .json(path)
    )
    return raw.filter(
        F.col("_corrupt_record").isNotNull() | F.col(text_col).isNull()
    ).count()


def write_documents_jsonl(
    df: DataFrame, path: str, compress: bool = False
) -> None:
    """Write documents back out as JSONL (optionally gzip per part file) —
    the export leg of the interchange: partitioned part files, one JSON
    object per line, schema-stable column order."""
    w = df.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    )
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
