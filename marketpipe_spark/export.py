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
    root = hpath.toString().rstrip("/") + "/"
    shards = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        # Skip hidden/underscore files AND files under hidden/underscore
        # directories WITHIN the export root (the streaming file sink's
        # _spark_metadata log holds plain-named files like "0" that only
        # the path reveals; the root itself may legitimately live under a
        # dotted directory).
        rel = p.split(root, 1)[-1]
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
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


def export_stream_jsonl(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Continuously export a streaming DataFrame as JSONL shards — the
    incremental leg of :func:`export_jsonl`: each micro-batch appends new
    shards; Spark's file-sink commit log (``_spark_metadata`` +
    ``checkpoint``) makes delivery exactly-once across restarts, so a
    nightly training-data drop becomes "the stream has simply kept up"
    rather than a full re-export.

    Returns the started ``StreamingQuery``. With ``available_now`` the
    query drains everything currently available and stops at the next
    ``awaitTermination()`` — the batch-refresh pattern; pass ``False`` for
    a long-running continuous export. After (each) termination,
    :func:`build_manifest` regenerates the shard inventory (it skips the
    sink's metadata directory).

    Scale shape: the sink only appends files per micro-batch partition —
    no global state, no driver bottleneck; partition_by gives
    hive-partitioned shards exactly like the batch exporter.
    """
    tune(stream_df.sparkSession)
    w = (
        stream_df.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_webdataset(
    spark: SparkSession,
    path: str,
    payload_exts: tuple[str, ...] = (),
):
    """Load WebDataset-style tar shards written by :func:`export_webdataset`
    back into a DataFrame: one task per shard streams its tar sequentially
    (the access pattern the format exists for) and yields
    ``(shard, key, meta_json)`` plus one binary column per extension in
    ``payload_exts``. Row order within a shard is the tar member order —
    i.e. the deterministic training order the writer laid down.

    Same shared-filesystem contract as the writer. The shard list is a
    driver-side directory listing (bounded by shard count, not rows).
    """
    import pandas as pd

    shard_files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".tar") and not f.startswith(("_", "."))
    )
    if not shard_files:
        raise FileNotFoundError(f"no .tar shards under {path}")
    sdf = tune(spark).createDataFrame(
        [(i, f) for i, f in enumerate(shard_files)], "shard long, shard_path string"
    ).repartition(len(shard_files), "shard")

    cols = ["shard", "key", "meta_json", *payload_exts]

    def load(batches):
        import tarfile

        for pdf in batches:
            for shard, sp in zip(pdf["shard"], pdf["shard_path"]):
                rows = []
                with tarfile.open(sp) as tar:
                    groups: dict[str, dict[str, bytes]] = {}
                    order: list[str] = []
                    for m in tar.getmembers():
                        key, _, ext = m.name.rpartition(".")
                        if key not in groups:
                            groups[key] = {}
                            order.append(key)
                        groups[key][ext] = tar.extractfile(m).read()
                    for key in order:
                        members = groups[key]
                        row = {
                            "shard": int(shard),
                            "key": key,
                            "meta_json": members.get("json", b"").decode(),
                        }
                        for e in payload_exts:
                            row[e] = members.get(e)
                        rows.append(row)
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    schema = "shard long, key string, meta_json string" + "".join(
        f", {e} binary" for e in payload_exts
    )
    return sdf.mapInPandas(load, schema)
