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


def export_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    payload_cols: dict[str, str] | None = None,
    n_shards: int = 4,
    salt: str = "shuffle-v1",
) -> dict:
    """Write ``df`` as WebDataset-style tar shards — the sequential-read
    container multimodal training jobs consume (one ``shard-NNNNN.tar``
    per shard; each row contributes ``<key>.json`` with its metadata plus
    one member per binary payload column, e.g. ``<key>.jpg``).

    Rows are placed by the same deterministic hash order as
    ``sampling.training_order`` (shard = md5_60(salt|key) mod n_shards,
    position = second independent hash), so the training order is
    reproducible across runs/engines/layouts, and tar bytes themselves are
    deterministic (members in position order; zeroed mtime/uid/gid) — two
    exports of the same data are byte-identical, which makes shard
    checksums meaningful.

    ``payload_cols`` maps binary column name → member extension
    (``{"payload": "jpg"}``); remaining columns go into the JSON member.

    Scale shape (100 TB): one map-only hash pass, ONE exchange keyed by
    shard (each shard's rows meet in exactly one task via groupBy +
    applyInPandas), a per-shard in-task sort, and a local tar build
    written atomically (temp file + rename — task retries cannot leave a
    torn shard). A shard must fit a task: size ``n_shards`` so shards land
    at the WebDataset-conventional 0.1-1 GB (10⁹ docs × 1 KB / 10⁴ shards
    ≈ 100 MB), exactly the knob ``training_order`` documents. Returns the
    manifest (shard inventory + per-shard row counts).

    Filesystem contract: shard tasks write with POSIX ``open``/``rename``,
    so ``path`` must be visible to every executor (local mode, NFS/Lustre,
    or a FUSE-mounted object store). For HDFS/S3 proper, point ``path`` at
    a mount or copy the shards up afterwards — tar append semantics don't
    map onto object-store streaming writers.
    """
    import io
    import tarfile

    import pandas as pd
    from pyspark.sql import functions as F

    from .operators.sampling import _row_hash

    tune(df.sparkSession)
    payload_cols = payload_cols or {}
    meta_cols = [c for c in df.columns if c not in payload_cols]
    os.makedirs(path, exist_ok=True)

    shard = F.pmod(_row_hash(key_col, salt), F.lit(n_shards)).cast("long")
    order = _row_hash(key_col, salt + ":order")
    staged = df.withColumn("_shard", shard).withColumn("_ord", order)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(["_ord", key_col]).reset_index(drop=True)
        fname = f"shard-{sid:05d}.tar"
        os.makedirs(path, exist_ok=True)  # executor-side (shared FS contract)
        tmp = os.path.join(path, f"._tmp-{fname}")
        with tarfile.open(tmp, "w") as tar:
            for _, row in pdf.iterrows():
                key = str(row[key_col])
                meta = {c: row[c] for c in meta_cols if c not in ("_shard", "_ord")}
                blob = json.dumps(meta, sort_keys=True, default=str).encode()
                for name, data in [(f"{key}.json", blob)] + [
                    (f"{key}.{ext}", bytes(row[c]) if row[c] is not None else b"")
                    for c, ext in payload_cols.items()
                ]:
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
        os.replace(tmp, os.path.join(path, fname))
        return pd.DataFrame(
            {"shard": [sid], "n_rows": [len(pdf)], "file": [fname]}
        )

    stats = (
        staged.groupBy("_shard")
        .applyInPandas(write_shard, "shard long, n_rows long, file string")
        .collect()
    )
    manifest = {
        "format": "webdataset-tar",
        "n_shards": len(stats),
        "n_rows": int(sum(r.n_rows for r in stats)),
        "shards": sorted(
            (
                {
                    "file": r.file,
                    "shard": r.shard,
                    "n_rows": r.n_rows,
                    "bytes": os.path.getsize(os.path.join(path, r.file)),
                }
                for r in stats
            ),
            key=lambda s: s["shard"],
        ),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
