"""Training-data export: sharded JSONL + manifest.

The reference exports CSV reports (K5); the document-pipeline analog is
JSONL shards — the interchange format training jobs consume. Sharding is
governed by ``maxRecordsPerFile`` (bounded shard size without a global
sort); the manifest is one FS-listing sweep (control plane, no data I/O),
giving downstream loaders shard paths + sizes + a row-count checksum.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .session import tune


def export_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    compression: str | None = "gzip",
    partition_by: list[str] | None = None,
) -> dict:
    """Write ``df`` as JSONL shards (optionally hive-partitioned by e.g.
    split/lang) and a ``_manifest.json`` beside them
    (underscore-prefixed so Spark readers skip it, like ``_SUCCESS``). Returns the manifest."""
    tune(df.sparkSession)
    w = df.write.mode("overwrite").option("maxRecordsPerFile", str(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
    manifest = build_manifest(df.sparkSession, path)
    # Count the WRITTEN shards, not df: re-executing the upstream plan costs
    # a full pipeline run at scale, and the checksum should attest what
    # actually landed on disk. The known schema skips JSON schema inference
    # (which would read the whole dataset a second time just to plan).
    manifest["n_rows"] = df.sparkSession.read.schema(df.schema).json(path).count()
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def build_manifest(spark: SparkSession, path: str) -> dict:
    """Shard inventory via the Hadoop FS API (HDFS/S3-portable)."""
    from .lake import _hadoop_fs

    fs, hpath, _ = _hadoop_fs(spark, path)
    shards = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")) :
            continue
        shards.append({"path": p, "bytes": st.getLen()})
    shards.sort(key=lambda s: s["path"])
    return {"n_shards": len(shards), "total_bytes": sum(s["bytes"] for s in shards), "shards": shards}


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Load an exported JSONL dataset (partitioned or flat)."""
    return tune(spark).read.json(path)
