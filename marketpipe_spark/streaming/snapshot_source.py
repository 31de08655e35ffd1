"""Snapshot tables as a REAL Structured Streaming source — the Delta
"table streaming" capability, built on PySpark 4's Python DataSource API.

``spark.readStream.format("snapshot_changes").option("root", ...)`` turns
the versioned COW table (snapshots.py) into a streaming CDC feed:

- **Offsets ARE version numbers.** ``initialOffset`` starts at the
  ``startingVersion`` option (0 = the empty base, so the first micro-batch
  is the INITIAL SNAPSHOT as inserts — the changes_since bootstrap
  contract); ``latestOffset`` reads the current latest manifest. Spark's
  offset log + ``commit()`` give exactly-once delivery per version
  interval across restarts — the engine-managed version of what
  ``changes_since``'s explicit ack() does.
- **Input is churn-bounded, file-granular.** ``partitions(start, end)``
  diffs the two manifests' file SETS (immutable data files present in
  both versions cannot produce a change) and emits one InputPartition per
  differing file, tagged with its side — the same pruning as batch
  ``table_changes``, so a 2k-row upsert into a million-file table streams
  a handful of files.
- **Workers read parquet via Arrow.** ``read()`` yields pyarrow
  RecordBatches straight from the data file (zero Python row loops), plus
  the ``_side`` tag column.

The source emits SIDE-TAGGED ROWS (``_side`` 0 = old version's image,
1 = new version's image); per-key classification needs both sides of a
key co-located, which is a shuffle — exactly what the ENGINE should do,
not a worker-side Python join. :func:`classify_batch` applies the shared
CDC kernel (``snapshots.classify_changes``) to each micro-batch inside
``foreachBatch``, so streaming and batch classification are the same code
by construction. :func:`stream_snapshot_changes` wires both ends together
and drains with AvailableNow.

Scale notes: offsets/manifests are driver-side metadata reads; the data
plane is parquet scans of only the churned files, Arrow-batched. The
local-path backing matches the sandbox; object-store roots would read
through pyarrow's filesystem layer in ``read()`` (same interface).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

_SIDE_COL = "_side"


def _snap_dir(root: str) -> str:
    return os.path.join(root, "_snapshots")


def _versions(root: str) -> list[int]:
    d = _snap_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _manifest_files(root: str, version: int) -> list[str]:
    if version == 0:
        return []
    with open(os.path.join(_snap_dir(root), f"v{version}.json")) as f:
        m = json.load(f)
    sidecar = m.get("files_parquet")
    if sidecar:
        import pyarrow.parquet as pq

        return (
            pq.read_table(os.path.join(_snap_dir(root), sidecar))
            .column("path")
            .to_pylist()
        )
    return m["files"]


class _FilePartition(InputPartition):
    def __init__(self, path: str, side: int):
        self.path = path
        self.side = side


class SnapshotChangesStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        starting_version: int,
        max_versions: int | None = None,
        clamp_base: int | None = None,
    ):
        self._root = root
        self._start = starting_version
        self._max = max_versions
        self._clamp_base = clamp_base

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        vs = _versions(self._root)
        latest = vs[-1] if vs else self._start
        if self._max is not None:
            # Version-bounded draining (r10): AvailableNow's Python-source
            # fallback computes ONE target offset per run, so clamping the
            # reported latest to clampBase + maxVersionsPerBatch bounds the
            # batch to a version window; the outer drain loop
            # (stream_snapshot_changes) advances the base from the
            # checkpoint's committed offset between runs.
            base = self._clamp_base if self._clamp_base is not None else self._start
            latest = max(base, min(latest, base + self._max))
        return {"version": latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        v_from, v_to = int(start["version"]), int(end["version"])
        if v_to <= v_from:
            return []
        from_files = set(_manifest_files(self._root, v_from))
        to_files = set(_manifest_files(self._root, v_to))
        parts: list[InputPartition] = [
            _FilePartition(os.path.join(self._root, f), 0)
            for f in sorted(from_files - to_files)
        ] + [
            _FilePartition(os.path.join(self._root, f), 1)
            for f in sorted(to_files - from_files)
        ]
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in pq.ParquetFile(partition.path).iter_batches():
            side = pa.array([partition.side] * batch.num_rows, pa.int32())
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [side],
                names=list(batch.schema.names) + [_SIDE_COL],
            )

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing to reclaim here


class SnapshotChangesDataSource(DataSource):
    """``format("snapshot_changes")`` — options:

    - ``root`` (required): snapshot table root;
    - ``startingVersion`` (default ``"0"``): first offset; 0 delivers the
      initial snapshot as inserts, ``"latest"`` skips history and streams
      only commits after stream start;
    - ``maxVersionsPerBatch`` (optional): clamp how many source versions a
      single micro-batch may span (see ``latestOffset``); used with
      ``clampBase`` by the bounded drain loop.
    """

    @classmethod
    def name(cls) -> str:
        return "snapshot_changes"

    def _root(self) -> str:
        root = self.options.get("root")
        if not root:
            raise ValueError("snapshot_changes needs .option('root', <table root>)")
        return root

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import IntegerType, StructField, StructType

        import pyarrow.parquet as pq

        root = self._root()
        vs = _versions(root)
        if not vs:
            raise FileNotFoundError(f"no snapshots at {root}")
        files = _manifest_files(root, vs[-1])
        if not files:
            raise FileNotFoundError(f"latest snapshot at {root} is empty")
        arrow = pq.read_schema(os.path.join(root, files[0]))
        base = from_arrow_schema(arrow)
        return StructType(list(base.fields) + [StructField(_SIDE_COL, IntegerType())])

    def streamReader(self, schema) -> SnapshotChangesStreamReader:
        opt = self.options.get("startingVersion", "0")
        root = self._root()
        if str(opt) == "latest":
            vs = _versions(root)
            start = vs[-1] if vs else 0
        else:
            start = int(opt)
        max_v = self.options.get("maxVersionsPerBatch")
        clamp = self.options.get("clampBase")
        return SnapshotChangesStreamReader(
            root,
            start,
            max_versions=int(max_v) if max_v is not None else None,
            clamp_base=int(clamp) if clamp is not None else None,
        )


def register_snapshot_source(spark: SparkSession) -> None:
    """Register the format with the session (idempotent)."""
    spark.dataSource.register(SnapshotChangesDataSource)


def classify_batch(batch: DataFrame, keys: list[str]) -> DataFrame:
    """Per-micro-batch CDC classification: split the side-tagged rows and
    run the SAME kernel as batch ``table_changes``."""
    from ..snapshots import classify_changes

    old = batch.where(f"{_SIDE_COL} = 0").drop(_SIDE_COL)
    new = batch.where(f"{_SIDE_COL} = 1").drop(_SIDE_COL)
    return classify_changes(old, new, keys)


def _last_committed_offset_version(checkpoint: str) -> int | None:
    """The version offset of the newest COMMITTED micro-batch in a stream
    checkpoint — read driver-side from Spark's offset/commit logs (tiny
    JSON files). Returns None when nothing committed yet or the layout is
    unrecognized (callers fall back to an unbounded drain, never wrongness:
    the engine's own offset log still guards exactly-once)."""
    root = checkpoint
    if root.startswith("file:"):
        root = root[len("file:") :] or "/"
    cdir = os.path.join(root, "commits")
    odir = os.path.join(root, "offsets")
    try:
        ids = [int(n) for n in os.listdir(cdir) if n.isdigit()]
        if not ids:
            return None
        with open(os.path.join(odir, str(max(ids)))) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        return int(json.loads(lines[-1])["version"])
    except Exception:
        return None


def stream_snapshot_changes(
    spark: SparkSession,
    root: str,
    keys: list[str],
    apply,
    starting_version: int | str = 0,
    checkpoint: str | None = None,
    max_versions_per_batch: int | None = None,
) -> None:
    """Drain the snapshot table's pending versions (AvailableNow): each
    micro-batch is classified with the shared CDC kernel and handed to
    ``apply(changes_df, batch_id)`` — the engine-checkpointed sibling of
    :func:`snapshots.changes_since`. Restarting with the same
    ``checkpoint`` resumes from the last committed version offset.

    ``max_versions_per_batch`` (r10, requires ``checkpoint``): the Python
    DataSource API has no SupportsTriggerAvailableNow, so a plain drain
    lands the WHOLE backlog in one batch (Spark logs the fallback
    warning). With a bound set, the drain becomes a loop of AvailableNow
    runs whose reader clamps its reported latest offset to ``committed +
    bound`` — each run is one version-bounded micro-batch, the engine
    offset log still guards exactly-once, and a crash mid-backlog resumes
    at the committed boundary. The loop stops when the checkpoint's
    committed offset reaches the table's latest version (or stops
    advancing — e.g. an unparsable offset layout degrades to the single
    big-batch behavior rather than spinning)."""
    register_snapshot_source(spark)

    def _each(batch: DataFrame, batch_id: int) -> None:
        apply(classify_batch(batch, keys), batch_id)

    def _run_once(clamp_base: int | None, bounded: bool = True) -> None:
        reader = (
            spark.readStream.format("snapshot_changes")
            .option("root", root)
            .option("startingVersion", str(starting_version))
        )
        if bounded and max_versions_per_batch is not None:
            reader = reader.option("maxVersionsPerBatch", str(max_versions_per_batch))
            if clamp_base is not None:
                reader = reader.option("clampBase", str(clamp_base))
        writer = (
            reader.load().writeStream.foreachBatch(_each).trigger(availableNow=True)
        )
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        q = writer.start()
        q.awaitTermination()

    if max_versions_per_batch is None or checkpoint is None:
        _run_once(None, bounded=False)
        return
    while True:
        committed = _last_committed_offset_version(checkpoint)
        _run_once(committed)
        vs = _versions(root)
        latest = vs[-1] if vs else 0
        now_committed = _last_committed_offset_version(checkpoint)
        if now_committed is not None and now_committed >= latest:
            return
        if now_committed is None:
            # The offset/commit log is not readable from the driver (e.g.
            # a non-POSIX checkpoint path): the clamp base cannot advance,
            # so a bounded loop would stall mid-backlog. Degrade to the
            # documented single-big-batch behavior — one UNBOUNDED drain
            # finishes the backlog; the engine offset log still guards
            # exactly-once.
            _run_once(None, bounded=False)
            return
        if now_committed == committed:
            return  # no progress this run — don't spin
