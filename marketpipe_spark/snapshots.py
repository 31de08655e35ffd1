"""Versioned copy-on-write table snapshots — time travel for the parquet lake.

The Delta/Iceberg capability the manifest module (file-stats skipping) does
not provide: MULTI-VERSION reads. Every commit writes NEW immutable data
files plus one JSON manifest listing the version's full live file set, so

- readers pin a version and see an immutable snapshot (no torn reads while
  a writer lands),
- ``read_table(root, version=N)`` time-travels to any retained version,
- upserts are file-granular copy-on-write: only data files that actually
  contain matching keys are rewritten; untouched files are carried by
  reference into the next manifest (the Delta `MERGE` file-pruning model),
- old versions stay readable until :func:`expire_snapshots` drops them.

Reference analog: the lake's in-place keep-last upsert
(reference: src/marketpipe/infrastructure/storage/parquet_engine.py:126-170)
mutates partitions destructively — a reader racing that rewrite sees a mix
of old and new files — and serializes writers with a fasteners file lock
(reference: src/marketpipe/infrastructure/storage/parquet_engine.py:97-99).
The snapshot commit protocol replaces both with optimistic concurrency:
immutable data files + a conditional-put manifest publish.

Concurrency model (writer-safe since r8):

- **Publishing a manifest is a compare-and-set.** ``v{N}.json`` is created
  with a create-if-absent primitive (:meth:`SnapshotFS.try_publish`); two
  writers racing the same parent produce exactly one winner — the loser
  gets :class:`CommitConflict`, never a silent overwrite.
- **Losers rebase or retry.** An upsert that loses the race re-reads the
  new latest and (a) REBASES when the winning commit is provably disjoint
  — it removed none of the loser's affected files and its added files
  contain none of the loser's keys (one key-pruned probe scan of just the
  added files) — or (b) fully re-runs detection + merge against the new
  parent. Either way the result is the serial keep-last order of the
  commit timestamps; no update is lost. Abandoned attempts leave only
  unreferenced data files, which :func:`expire_snapshots` reclaims.
- **Conditional put per filesystem**: :class:`LocalFS` publishes with
  ``os.link`` (atomic create-if-absent on POSIX); :class:`HadoopFS`
  publishes with no-overwrite ``FileSystem.rename`` (atomic on HDFS; on
  S3A the exists+rename pair is best-effort — a strict S3 deployment
  injects a ``SnapshotFS`` whose ``try_publish`` maps to S3 conditional
  put / GCS ``if-generation-match``, the documented extension point).

Scale design:

- **Data-file writes are distributed** (plain ``df.write.parquet`` into a
  per-commit staging dir, then renamed into ``data/``); the driver touches
  only file NAMES.
- **Affected-file detection is distributed**: one semi-join of the live
  rows (tagged with ``input_file_name()``) against the incoming keys —
  the driver collects only the distinct affected path list (bounded by the
  file count, the same contract as Delta's driver-side file planning).
  Collected URIs are canonicalized (percent-decoding + scheme/authority
  parsing) and every one must resolve to a manifest member — a mismatch
  fails loudly instead of double-writing rows.
- **The manifest is O(files) JSON.** At millions of files, swap the JSON
  body for a parquet manifest table read through the same conditional-put
  commit; the protocol (immutable data files + CAS manifest pointer) is
  unchanged.
- **Manifest IO goes through** :class:`SnapshotFS`, so ``file:``, ``hdfs:``
  and ``s3a:`` roots all work: plain paths use :class:`LocalFS`,
  scheme-qualified roots resolve a :class:`HadoopFS` from the live
  session's Hadoop configuration.
"""

from __future__ import annotations

import datetime as _dt
import functools
import json
import operator
import os
import posixpath
import uuid
from typing import Protocol
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

__all__ = [
    "CommitConflict",
    "SnapshotFS",
    "LocalFS",
    "HadoopFS",
    "S3SimFS",
    "write_table",
    "upsert_table",
    "delete_where",
    "restore_table",
    "read_table",
    "register_snapshot_view",
    "version_as_of",
    "table_history",
    "table_changes",
    "classify_changes",
    "changes_since",
    "incremental_agg",
    "compact_table",
    "table_skip_stats",
    "snapshot_fsck",
    "refresh_mv",
    "expire_snapshots",
]

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"

#: Broadcast gate for the affected-file key probe, in distinct keys.
_BROADCAST_KEY_ROWS = 1_000_000

#: Commit attempts before giving up under sustained contention.
_MAX_COMMIT_RETRIES = 20

#: CAS retry backoff: full-jitter exponential, seconds. Base/cap keep the
#: worst-case added latency small (≤ ~2.5 s over all 20 attempts) while
#: desynchronizing writers that lost the same publish — a tight retry loop
#: makes N contending writers re-collide every round (and against an
#: object store turns the conflict into a 412-request storm).
_CAS_BACKOFF_BASE = 0.01
_CAS_BACKOFF_CAP = 0.25


def _cas_backoff(attempt: int) -> None:
    """Sleep a full-jitter exponential backoff before CAS retry ``attempt``
    (0-based; attempt 0 retries immediately — first conflicts are usually
    one racing writer, not a storm)."""
    if attempt <= 0:
        return
    import random
    import time

    time.sleep(random.random() * min(_CAS_BACKOFF_CAP, _CAS_BACKOFF_BASE * (2 ** attempt)))


class CommitConflict(Exception):
    """Another writer published this version first. Retryable: re-read the
    latest manifest and rebase or re-run the write against the new parent
    (the built-in writers do this automatically up to a retry bound)."""


# ---------------------------------------------------------------------------
# filesystem abstraction


class SnapshotFS(Protocol):
    """Minimal filesystem surface the snapshot protocol needs. The one
    correctness-critical member is :meth:`try_publish` — the conditional
    put that makes concurrent commits safe. Implementations for other
    stores (e.g. S3 with ``If-None-Match``) plug in via the ``fs=``
    parameter on every public function."""

    def listdir(self, path: str) -> list[str]: ...  # names, [] if missing
    def read_text(self, path: str) -> str: ...
    def write_text(self, path: str, text: str) -> None: ...
    def read_bytes(self, path: str) -> bytes: ...
    def write_bytes(self, path: str, data: bytes) -> None: ...
    def try_publish(self, tmp: str, final: str) -> bool: ...  # atomic create-if-absent
    def rename(self, src: str, dst: str) -> None: ...
    def delete(self, path: str) -> None: ...
    def exists(self, path: str) -> bool: ...
    def mtime(self, path: str) -> float: ...  # seconds since epoch
    def mkdirs(self, path: str) -> None: ...
    def rmtree(self, path: str) -> None: ...


class LocalFS:
    """POSIX filesystem. ``try_publish`` hard-links the temp manifest to its
    final name — ``link(2)`` fails with EEXIST if the name is taken, which
    is the atomic create-if-absent CAS (``os.replace`` would silently
    overwrite the racing winner). ``file:``-scheme paths are accepted and
    stripped to their POSIX path."""

    @staticmethod
    def _p(path: str) -> str:
        return _local_path(path)

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        return os.listdir(p) if os.path.isdir(p) else []

    def read_text(self, path: str) -> str:
        with open(self._p(path)) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        with open(self._p(path), "w") as f:
            f.write(text)

    def read_bytes(self, path: str) -> bytes:
        with open(self._p(path), "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        with open(self._p(path), "wb") as f:
            f.write(data)

    def try_publish(self, tmp: str, final: str) -> bool:
        tmp, final = self._p(tmp), self._p(final)
        try:
            os.link(tmp, final)
        except FileExistsError:
            return False
        finally:
            # The temp name is never reused; drop it win or lose.
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
        return True

    def rename(self, src: str, dst: str) -> None:
        os.replace(self._p(src), self._p(dst))

    def delete(self, path: str) -> None:
        try:
            os.remove(self._p(path))
        except FileNotFoundError:
            pass

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._p(path))

    def mkdirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def rmtree(self, path: str) -> None:
        import shutil

        shutil.rmtree(self._p(path), ignore_errors=True)


class HadoopFS:
    """Hadoop ``FileSystem`` bridge (via the live session's JVM) so snapshot
    roots can be ``hdfs://...`` / ``s3a://...`` paths. ``try_publish`` uses
    no-overwrite ``rename`` — atomic on HDFS; on object stores without
    atomic no-overwrite rename, inject a store-native conditional-put FS
    instead (module docstring)."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._io = jvm.org.apache.commons.io.IOUtils
        self._charset = jvm.java.nio.charset.StandardCharsets.UTF_8
        self._fs = self._Path(root).getFileSystem(spark._jsc.hadoopConfiguration())

    def listdir(self, path: str) -> list[str]:
        p = self._Path(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._Path(path))
        try:
            return self._io.toString(stream, self._charset)
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        self.write_bytes(path, text.encode("utf-8"))

    def read_bytes(self, path: str) -> bytes:
        stream = self._fs.open(self._Path(path))
        try:
            return bytes(self._io.toByteArray(stream))
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        out = self._fs.create(self._Path(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def try_publish(self, tmp: str, final: str) -> bool:
        src, dst = self._Path(tmp), self._Path(final)
        # exists() pre-check narrows the race window on stores whose rename
        # overwrites; HDFS rename itself refuses an existing destination.
        if self._fs.exists(dst) or not self._fs.rename(src, dst):
            self._fs.delete(src, False)
            return False
        return True

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def delete(self, path: str) -> None:
        self._fs.delete(self._Path(path), False)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._Path(path))

    def mtime(self, path: str) -> float:
        return self._fs.getFileStatus(self._Path(path)).getModificationTime() / 1000.0

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._Path(path), True)


class S3SimFS:
    """Object-store CONTRACT DOUBLE: local-disk-backed, but every operation
    follows S3 semantics (post-2020 strong consistency) instead of POSIX —
    the third leg of the snapshot FS matrix next to :class:`LocalFS` and
    :class:`HadoopFS`.

    - **No rename.** Objects are immutable blobs under flat keys; "rename"
      is copy-bytes + delete-source, NOT atomic — exactly what an S3 SDK
      does, so a test passing here never depended on atomic rename.
    - **try_publish = conditional PUT** (``If-None-Match: *``): the object
      is created iff the key does not exist, in one atomic operation; on
      precondition failure the temp object is deleted and the CAS loses.
      (Locally: ``O_CREAT|O_EXCL`` — the same create-if-absent atomicity
      the S3 conditional write provides.)
    - **Unordered listings.** ``listdir`` deterministically shuffles names
      (seeded per path) so nothing can accidentally rely on lexicographic
      ``ListObjectsV2`` order the protocol doesn't promise.
    - **Fault injection** for retry-policy tests: ``fail_publish_n=k``
      makes the next ``k`` conditional puts fail as transient conflicts
      (the 409/412-storm regime); ``publishes`` counts attempts.

    The snapshot DATA files still live on the local disk at the same paths
    (Spark's parquet IO is scheme-routed separately); this class governs
    the METADATA protocol — the part whose correctness depends on store
    semantics.
    """

    def __init__(self, fail_publish_n: int = 0):
        self._inner = LocalFS()
        self.fail_publish_n = fail_publish_n
        self.publishes = 0

    # reads/writes: plain object GET/PUT (whole-blob, no partial update)
    def read_text(self, path: str) -> str:
        return self._inner.read_text(path)

    def write_text(self, path: str, text: str) -> None:
        self._inner.write_text(path, text)

    def read_bytes(self, path: str) -> bytes:
        return self._inner.read_bytes(path)

    def write_bytes(self, path: str, data: bytes) -> None:
        self._inner.write_bytes(path, data)

    def listdir(self, path: str) -> list[str]:
        import random as _random
        import zlib as _zlib

        names = self._inner.listdir(path)
        # Process-stable seed (built-in hash() is salted per interpreter via
        # PYTHONHASHSEED — an ordering-sensitive failure would flake between
        # runs instead of reproducing).
        _random.Random(_zlib.crc32(path.encode()) & 0xFFFF).shuffle(names)
        return names

    def try_publish(self, tmp: str, final: str) -> bool:
        self.publishes += 1
        if self.fail_publish_n > 0:
            self.fail_publish_n -= 1
            self._inner.delete(tmp)
            return False
        data = self._inner.read_bytes(tmp)
        ok = True
        try:
            # Conditional PUT: create-if-absent in one atomic step.
            fd = os.open(
                _local_path(final), os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644
            )
            try:
                os.write(fd, data)
            finally:
                os.close(fd)
        except FileExistsError:
            ok = False
        self._inner.delete(tmp)
        return ok

    def rename(self, src: str, dst: str) -> None:
        # S3 has no rename: server-side copy, then delete the source.
        self._inner.write_bytes(dst, self._inner.read_bytes(src))
        self._inner.delete(src)

    def delete(self, path: str) -> None:
        self._inner.delete(path)

    def exists(self, path: str) -> bool:
        return self._inner.exists(path)

    def mtime(self, path: str) -> float:
        return self._inner.mtime(path)

    def mkdirs(self, path: str) -> None:
        # Buckets have no directories; creating "prefixes" is a no-op. The
        # local backing store still needs parents for O_EXCL creates.
        self._inner.mkdirs(path)

    def rmtree(self, path: str) -> None:
        self._inner.rmtree(path)


def _has_scheme(path: str) -> bool:
    p = urlparse(path)
    return bool(p.scheme) and len(p.scheme) > 1  # len>1: not a drive letter


def _resolve_fs(
    root: str, spark: SparkSession | None, fs: SnapshotFS | None
) -> SnapshotFS:
    if fs is not None:
        return fs
    if _has_scheme(root) and urlparse(root).scheme != "file":
        if spark is None:
            raise ValueError(
                f"scheme-qualified root {root!r} needs a SparkSession (HadoopFS) "
                "or an explicit fs="
            )
        return HadoopFS(spark, root)
    return LocalFS()


def _local_path(root: str) -> str:
    """file:-scheme roots still use LocalFS; strip the scheme for os calls."""
    if _has_scheme(root):
        p = urlparse(root)
        if p.scheme == "file":
            return unquote(p.path)
    return root


def _join(root: str, *parts: str) -> str:
    return posixpath.join(root, *parts)


def _root_data_path(root: str) -> str:
    """Canonical absolute path of ``root`` as :func:`F.input_file_name`'s
    URIs will render it: scheme-qualified roots keep only the URI path;
    plain local roots are made absolute."""
    if _has_scheme(root):
        return urlparse(root).path
    return os.path.abspath(root)


def _canon_rel(file_uri: str, root_path: str) -> str:
    """Manifest-relative path of an ``input_file_name()`` result.

    ``input_file_name`` returns a percent-encoded URI whose scheme may be
    ``file:``/``hdfs:``/``s3a:``; decode and parse it rather than prefix-
    stripping (the r7 bug: ``relpath`` on the raw URI silently produced
    garbage paths that matched nothing, so affected files were BOTH carried
    and rewritten — duplicate rows)."""
    p = urlparse(file_uri)
    path = unquote(p.path) if p.scheme else file_uri
    return posixpath.relpath(path, root_path)


# ---------------------------------------------------------------------------
# manifest protocol


def _snap_root(root: str) -> str:
    return _join(root, _SNAP_DIR)


def _versions(root: str, fs: SnapshotFS) -> list[int]:
    out = []
    for name in fs.listdir(_snap_root(root)):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


#: Above this live-file count the manifest's file list moves out of the
#: JSON body into a sidecar PARQUET file (columnar, zstd-compressed,
#: readable without parsing a giant JSON array) — the millions-of-files
#: regime. The commit protocol is unchanged: the sidecar is written first
#: under a commit-unique name, then the small JSON pointer is published
#: with the same conditional put; a losing writer's sidecar is an orphan
#: that :func:`expire_snapshots` reclaims. Overridable for tests/tuning.
PARQUET_MANIFEST_MIN_FILES = int(
    os.environ.get("MP_SNAPSHOT_PARQUET_MANIFEST_MIN", "100000")
)

#: Roll manifest METADATA (version/parent/note/n_files/committed_at — not
#: file lists) into a checkpoint file every N commits, Delta-checkpoint
#: style (r10). Without it, every metadata walk (``version_as_of``,
#: ``table_history``) reads one JSON per retained version — at 10⁴+
#: commits the metadata scan, not the data, becomes the read-path
#: bottleneck. With it, readers load ONE checkpoint + the ≤ N-commit
#: suffix of newer manifests: resolution cost ∝ suffix, not history.
SNAPSHOT_CHECKPOINT_EVERY = int(
    os.environ.get("MP_SNAPSHOT_CHECKPOINT_EVERY", "100")
)

_CKPT_PREFIX = "checkpoint-v"


def _checkpoint_path(root: str, version: int) -> str:
    return _join(_snap_root(root), f"{_CKPT_PREFIX}{version}.json")


def _checkpoint_versions(names: list[str]) -> list[int]:
    out = []
    for n in names:
        if n.startswith(_CKPT_PREFIX) and n.endswith(".json"):
            try:
                out.append(int(n[len(_CKPT_PREFIX) : -5]))
            except ValueError:
                continue
    return sorted(out)


def _latest_checkpoint(
    root: str, fs: SnapshotFS, names: list[str] | None = None
) -> tuple[int, dict] | None:
    """Newest checkpoint as ``(version, {version: meta-entry})``, or None.
    Corrupt/unreadable checkpoints degrade to None — every caller falls
    back to per-manifest reads, so a bad checkpoint can slow a walk but
    never wrong it."""
    if names is None:
        names = fs.listdir(_snap_root(root))
    cks = _checkpoint_versions(names)
    if not cks:
        return None
    try:
        doc = json.loads(fs.read_text(_checkpoint_path(root, cks[-1])))
        return cks[-1], {int(e["version"]): e for e in doc.get("entries", [])}
    except Exception:
        return None


_META_KEYS = ("version", "parent", "note", "n_files", "committed_at")


def _manifest_meta_all(root: str, fs: SnapshotFS) -> list[dict]:
    """Metadata rows for every RETAINED version, oldest first — served from
    checkpoint + suffix: one listdir, one checkpoint read, and a manifest
    read only for versions newer than the checkpoint (or for gaps a
    checkpoint predating expiry doesn't cover). The shared walk under
    :func:`table_history` and :func:`version_as_of`."""
    names = fs.listdir(_snap_root(root))
    vs = sorted(
        int(n[1:-5])
        for n in names
        if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
    )
    ck = _latest_checkpoint(root, fs, names)
    entries = ck[1] if ck else {}
    out = []
    for v in vs:
        e = entries.get(v)
        if e is None:
            m = _read_manifest(root, v, fs, hydrate=False)
            e = {k: m.get(k) for k in _META_KEYS}
        out.append(e)
    return out


def _maybe_write_checkpoint(root: str, version: int, fs: SnapshotFS) -> None:
    """Roll up a metadata checkpoint at every ``SNAPSHOT_CHECKPOINT_EVERY``-th
    commit — incremental (prior checkpoint + the manifests since), and
    best-effort: the commit that triggered it has already PUBLISHED, so a
    checkpoint failure degrades walk cost, never durability. No publish
    race: only the single writer that won v=N writes checkpoint-vN."""
    if SNAPSHOT_CHECKPOINT_EVERY <= 0 or version % SNAPSHOT_CHECKPOINT_EVERY:
        return
    try:
        entries = _manifest_meta_all(root, fs)
        fs.write_text(
            _checkpoint_path(root, version),
            json.dumps({"checkpoint_version": version, "entries": entries}),
        )
    except Exception:
        pass


def _read_manifest(
    root: str, version: int, fs: SnapshotFS, hydrate: bool = True
) -> dict:
    """Load a version manifest. ``hydrate=False`` skips loading the parquet
    file-list sidecar — metadata-only callers (history listings) shouldn't
    pull a multi-MB file list per version just to print ``n_files``."""
    m = json.loads(fs.read_text(_join(_snap_root(root), f"v{version}.json")))
    sidecar = m.get("files_parquet")
    if sidecar and hydrate:
        import io as _io

        import pyarrow.parquet as pq

        data = fs.read_bytes(_join(_snap_root(root), sidecar))
        m["files"] = pq.read_table(_io.BytesIO(data)).column("path").to_pylist()
    return m


def _commit(
    root: str, files: list[str], note: str, parent: int | None, fs: SnapshotFS
) -> int:
    """Conditional-put manifest commit: write ``v{N}.json`` under a unique
    temp name, then publish with create-if-absent. Raises
    :class:`CommitConflict` if another writer owns v{N} — the version
    sequence is linearized by whoever wins each publish. File lists past
    :data:`PARQUET_MANIFEST_MIN_FILES` are stored as a parquet sidecar."""
    fs.mkdirs(_snap_root(root))
    version = (parent if parent is not None else 0) + 1
    files = sorted(files)
    body = {
        "version": version,
        "parent": parent,
        "note": note,
        "n_files": len(files),
        # Commit wall-clock (ISO-8601 UTC) — the time-travel key for
        # read_table(as_of=...). Written by whichever writer WINS the CAS,
        # so timestamps are monotone-enough per table for "state as of T"
        # (ties/regressions from clock skew resolve by version order).
        "committed_at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
    }
    if len(files) >= PARQUET_MANIFEST_MIN_FILES:
        import io as _io

        import pyarrow as pa
        import pyarrow.parquet as pq

        sidecar = f"v{version}-{uuid.uuid4().hex[:8]}.files.parquet"
        buf = _io.BytesIO()
        pq.write_table(
            pa.table({"path": pa.array(files, pa.string())}), buf, compression="zstd"
        )
        fs.write_bytes(_join(_snap_root(root), sidecar), buf.getvalue())
        body["files_parquet"] = sidecar
        body["files"] = []
    else:
        body["files"] = files
    path = _join(_snap_root(root), f"v{version}.json")
    tmp = _join(_snap_root(root), f".v{version}-{uuid.uuid4().hex}.json.tmp")
    fs.write_text(tmp, json.dumps(body))
    if not fs.try_publish(tmp, path):
        raise CommitConflict(
            f"v{version} at {root} was published by a concurrent writer"
        )
    _maybe_write_checkpoint(root, version, fs)
    return version


def _land_data_files(
    df: DataFrame, root: str, version_hint: int, fs: SnapshotFS
) -> list[str]:
    """Write ``df`` distributed into a staging dir, then move the part files
    under ``data/`` with commit-unique names. Returns lake-relative paths.
    The files are immutable once landed — a commit retry reuses them (same
    rows regardless of which parent the manifest ends up under)."""
    fs.mkdirs(_join(root, _DATA_DIR))
    stage = _join(root, f"_stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    out: list[str] = []
    i = 0
    for name in sorted(fs.listdir(stage)):
        if not name.endswith(".parquet"):
            continue
        rel = _join(_DATA_DIR, f"c{version_hint:06d}-{uuid.uuid4().hex[:8]}-{i}.parquet")
        fs.rename(_join(stage, name), _join(root, rel))
        out.append(rel)
        i += 1
    fs.rmtree(stage)
    return out


def _latest(root: str, fs: SnapshotFS) -> int | None:
    vs = _versions(root, fs)
    return vs[-1] if vs else None


# ---------------------------------------------------------------------------
# public API


def write_table(
    df: DataFrame,
    root: str,
    mode: str = "append",
    note: str = "",
    fs: SnapshotFS | None = None,
) -> int:
    """Commit ``df`` as a new snapshot version.

    ``mode="append"`` carries the parent's live files by reference and adds
    the new ones; ``mode="overwrite"`` starts the live set fresh (old files
    remain on disk for time travel until :func:`expire_snapshots`).
    Loses to a concurrent writer? The landed data files are parent-
    independent, so the commit simply retries against the new latest.
    Returns the new version number."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    fs = _resolve_fs(root, df.sparkSession, fs)
    new_files = _land_data_files(df, root, (_latest(root, fs) or 0) + 1, fs)
    for _attempt in range(_MAX_COMMIT_RETRIES):
        parent = _latest(root, fs)
        live = list(new_files)
        if mode == "append" and parent is not None:
            live += _read_manifest(root, parent, fs)["files"]
        try:
            return _commit(
                root, live, note or f"{mode} {len(new_files)} files", parent, fs
            )
        except CommitConflict:
            _cas_backoff(_attempt)
            continue
    raise CommitConflict(
        f"write_table lost the commit race {_MAX_COMMIT_RETRIES} times at {root}"
    )


def version_as_of(root: str, as_of: str, fs: SnapshotFS | None = None) -> int:
    """The latest retained version committed AT OR BEFORE ``as_of`` (an
    ISO-8601 timestamp; a bare date reads as that day's midnight UTC;
    naive timestamps are taken as UTC) — Delta's ``TIMESTAMP AS OF``
    resolution. Raises LookupError when every retained version is newer
    (the pre-history read) or when no retained manifest carries a commit
    timestamp. Metadata-only: reads manifests, never data; ties and
    writer clock skew resolve by version order (the scan takes the LAST
    version whose timestamp qualifies)."""
    fs = _resolve_fs(root, None, fs)
    want = _dt.datetime.fromisoformat(as_of)
    if want.tzinfo is None:
        want = want.replace(tzinfo=_dt.timezone.utc)
    best, stamped = None, False
    # checkpoint + suffix, not one read per retained manifest (r10):
    # resolution cost ∝ commits since the last checkpoint, not history.
    for m in _manifest_meta_all(root, fs):
        ts = m.get("committed_at")
        if ts is None:
            continue
        stamped = True
        if _dt.datetime.fromisoformat(ts) <= want:
            best = m["version"]
    if best is None:
        detail = (
            "no retained manifest carries committed_at"
            if not stamped
            else f"every retained version was committed after {as_of}"
        )
        raise LookupError(f"no snapshot at {root} as of {as_of}: {detail}")
    return best


def read_table(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    fs: SnapshotFS | None = None,
    as_of: str | None = None,
) -> DataFrame:
    """Read a pinned snapshot (default: latest). The returned plan lists the
    manifest's exact file set — concurrent commits cannot change what this
    DataFrame reads. ``as_of`` (ISO timestamp) time-travels by commit
    wall-clock via :func:`version_as_of` — mutually exclusive with
    ``version``."""
    tune(spark)
    fs = _resolve_fs(root, spark, fs)
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version= or as_of=, not both")
        version = version_as_of(root, as_of, fs)
    v = version if version is not None else _latest(root, fs)
    if v is None:
        raise FileNotFoundError(f"no snapshots at {root}")
    m = _read_manifest(root, v, fs)
    if not m["files"]:
        raise FileNotFoundError(f"snapshot v{v} at {root} is empty")
    return spark.read.parquet(*[_join(root, f) for f in m["files"]])


def register_snapshot_view(
    spark: SparkSession,
    root: str,
    name: str,
    version: int | None = None,
    as_of: str | None = None,
    fs: SnapshotFS | None = None,
) -> DataFrame:
    """Register a (pinned or latest) snapshot as a temp view so plain
    ``spark.sql`` / the ``query`` CLI can read a versioned table — the SQL
    surface over time travel. The view pins the manifest's exact file set
    at registration time; re-register to follow new commits."""
    df = read_table(spark, root, version=version, fs=fs, as_of=as_of)
    df.createOrReplaceTempView(name)
    return df


def _any_key_null(keys: list[str]):
    """TRUE when ANY key column is NULL — the upsert batch-contract
    violation the pre-pass aggregate counts."""
    return functools.reduce(operator.or_, [F.col(k).isNull() for k in keys])


def _added_files_overlap_keys(
    spark: SparkSession,
    root: str,
    added: list[str],
    key_probe: DataFrame,
    keys: list[str],
) -> bool:
    """Does any row in ``added`` (files committed by the racing writer)
    carry one of our upsert keys? One key-column-pruned scan of JUST the
    added files, semi-joined against the key set, first-hit short-circuit."""
    probe = spark.read.parquet(*[_join(root, f) for f in sorted(added)]).select(*keys)
    return probe.join(key_probe, keys, "left_semi").limit(1).count() > 0


def upsert_table(
    spark: SparkSession,
    new: DataFrame,
    root: str,
    keys: list[str],
    note: str = "",
    dedup_order: str | list[str] | None = None,
    fs: SnapshotFS | None = None,
) -> int:
    """File-granular copy-on-write keep-last upsert.

    Live files that contain NO row matching ``new``'s key set are carried
    by reference (never read beyond the key column, never rewritten).
    Affected files are rewritten as (their non-matching rows) ∪ ``new`` —
    new rows win on key collision, the lake's keep-last contract
    (reference: src/marketpipe/infrastructure/storage/parquet_engine.py:163
    drop_duplicates(keep='last')). Returns the new version; the parent
    version still reads the pre-image.

    Batch contract (validated in ONE pre-pass aggregate, which also sizes
    the broadcast gate — no separate count job):

    - key columns must be non-NULL (fails loudly otherwise — a NULL key
      can never be matched by the equi-join detection);
    - duplicate keys WITHIN the batch either fail loudly or, when
      ``dedup_order`` names ordering column(s), keep the row with the
      greatest ordering value per key (keep-last).

    Concurrency: losing the manifest CAS triggers rebase-or-retry — see
    the module docstring. Data files landed by an abandoned attempt are
    unreferenced and reclaimed by :func:`expire_snapshots`.
    """
    fs = _resolve_fs(root, spark, fs)
    st = new.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("nk"),
        F.sum(F.when(_any_key_null(keys), 1).otherwise(0)).alias("n_null"),
    ).collect()[0]
    if st["n_null"]:
        raise ValueError(
            f"upsert batch has {st['n_null']} rows with NULL in key columns "
            f"{keys} — snapshot keys must be non-NULL"
        )
    if st["nk"] < st["n"]:
        if dedup_order is None:
            raise ValueError(
                f"upsert batch has duplicate keys ({st['n']} rows, {st['nk']} "
                f"distinct {keys}); pass dedup_order=<column(s)> to keep-last "
                "within the batch, or pre-deduplicate"
            )
        from pyspark.sql.window import Window as W

        order_cols = [dedup_order] if isinstance(dedup_order, str) else list(dedup_order)
        w = W.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
        new = (
            new.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    parent = _latest(root, fs)
    if parent is None:
        return write_table(new, root, mode="overwrite", note=note or "initial upsert", fs=fs)

    new_keys = new.select(*keys).distinct()
    # Broadcast gate sized from the pre-pass aggregate (nk = exact distinct
    # key count) — small key sets broadcast, big ones shuffle-join.
    key_probe = F.broadcast(new_keys) if st["nk"] <= _BROADCAST_KEY_ROWS else new_keys
    root_path = _root_data_path(root)

    for _attempt in range(_MAX_COMMIT_RETRIES):
        live = _read_manifest(root, parent, fs)["files"]
        live_set = set(live)
        # Key-columns-only scan (column pruning reaches the parquet reader) —
        # the detection pass never reads payload columns.
        cur = spark.read.parquet(*[_join(root, f) for f in live]).select(
            F.input_file_name().alias("_file"), *[F.col(k) for k in keys]
        )
        affected_rows = cur.join(key_probe, keys).select("_file").distinct().collect()
        affected = {_canon_rel(r["_file"], root_path) for r in affected_rows}
        unresolved = affected - live_set
        if unresolved:
            raise RuntimeError(
                f"affected-file probe returned paths outside the v{parent} "
                f"manifest at {root}: {sorted(unresolved)[:5]} — URI "
                "canonicalization does not match this filesystem layout"
            )
        carried = [f for f in live if f not in affected]
        if affected:
            old_affected = spark.read.parquet(
                *[_join(root, f) for f in sorted(affected)]
            )
            survivors = old_affected.join(new_keys, keys, "left_anti")
            merged = survivors.unionByName(new.select(*old_affected.columns))
        else:
            merged = new
        new_files = _land_data_files(merged, root, parent + 1, fs)
        try:
            return _commit(
                root,
                carried + new_files,
                note or f"upsert: rewrote {len(affected)} files, carried {len(carried)}",
                parent,
                fs,
            )
        except CommitConflict:
            rebased = _try_rebase(
                spark, root, fs, live_set, affected, new_files, key_probe, keys, note
            )
            if rebased is not None:
                return rebased
            # Overlapping commit: full retry against the new latest. The
            # files just landed are now orphans (expire reclaims them).
            _cas_backoff(_attempt)
            parent = _latest(root, fs)
            continue
    raise CommitConflict(
        f"upsert lost the commit race {_MAX_COMMIT_RETRIES} times at {root}"
    )


def _try_rebase(
    spark: SparkSession,
    root: str,
    fs: SnapshotFS,
    base_live: set[str],
    affected: set[str],
    new_files: list[str],
    key_probe: DataFrame,
    keys: list[str],
    note: str,
) -> int | None:
    """After losing the manifest CAS: commit the already-merged result on
    top of the new latest iff the intervening commits are provably disjoint
    from this upsert — they removed none of our affected files (their
    content is baked into our merge) and their added files contain none of
    our keys (one pruned probe scan). Returns the committed version, or
    None when the writes genuinely overlap and a full re-merge is needed.

    Soundness: every base-live file NOT in ``affected`` was proven key-free
    by the detection join, so carrying ``latest_live - affected`` plus our
    merged files preserves both keep-last (our keys exist only in our
    files) and the other writer's effect (their adds/removes pass through
    untouched) — the serial order 'winner, then us'.

    The CAS retry is bounded like every other commit path: after
    :data:`_MAX_COMMIT_RETRIES` lost publishes (sustained contention, or an
    FS whose try_publish maps transient failures to conflict) it returns
    None and the caller falls back to the outer full-retry loop instead of
    livelocking here."""
    for _attempt in range(_MAX_COMMIT_RETRIES):
        latest = _latest(root, fs)
        latest_live = set(_read_manifest(root, latest, fs)["files"])
        removed = base_live - latest_live
        added = sorted(latest_live - base_live)
        if removed & affected:
            return None
        if added and _added_files_overlap_keys(spark, root, added, key_probe, keys):
            return None
        carried = sorted(latest_live - affected)
        try:
            return _commit(
                root,
                carried + new_files,
                (note or "upsert") + f" (rebased onto v{latest})",
                latest,
                fs,
            )
        except CommitConflict:
            _cas_backoff(_attempt)
            continue  # someone else landed again; re-check against base_live
    return None  # rebase exhausted its retry budget; outer loop re-merges


def delete_where(
    spark: SparkSession,
    root: str,
    predicate,
    note: str = "",
    fs: SnapshotFS | None = None,
) -> int:
    """File-granular copy-on-write DELETE: rows matching ``predicate`` (a
    SQL string or Column) are removed in a new version. Files containing
    NO matching row are carried by reference (detected with one pruned
    scan tagged by ``input_file_name``); affected files are rewritten as
    their non-matching rows. The parent version still reads the pre-image
    — this is the GDPR-eraser / retention-delete surface next to
    :func:`upsert_table`.

    Concurrency: losing the manifest CAS re-runs detection + rewrite
    against the new latest (predicate deletes don't rebase — a rebase
    would need to prove the interleaved commit's added files match
    nothing, which costs the same scan as the retry)."""
    fs = _resolve_fs(root, spark, fs)
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    for _attempt in range(_MAX_COMMIT_RETRIES):
        parent = _latest(root, fs)
        if parent is None:
            raise FileNotFoundError(f"no snapshots at {root}")
        live = _read_manifest(root, parent, fs)["files"]
        root_path = _root_data_path(root)
        cur = spark.read.parquet(*[_join(root, f) for f in live])
        affected_rows = (
            cur.select(F.input_file_name().alias("_file"), pred.alias("_m"))
            .where(F.col("_m"))
            .select("_file")
            .distinct()
            .collect()
        )
        affected = {_canon_rel(r["_file"], root_path) for r in affected_rows}
        unresolved = affected - set(live)
        if unresolved:
            raise RuntimeError(
                f"delete_where probe returned paths outside the v{parent} "
                f"manifest at {root}: {sorted(unresolved)[:5]}"
            )
        carried = [f for f in live if f not in affected]
        if not affected:
            # Nothing matches: still commit (an auditable no-op version).
            new_files: list[str] = []
        else:
            # SQL DELETE removes only TRUE rows: a NULL-evaluating predicate
            # keeps the row. Plain ~pred would silently drop it (~NULL is
            # NULL, filtered out) — inconsistently, since identical rows in
            # unaffected files are carried by reference.
            survivors = spark.read.parquet(
                *[_join(root, f) for f in sorted(affected)]
            ).where(~F.coalesce(pred, F.lit(False)))
            new_files = _land_data_files(survivors, root, parent + 1, fs)
        try:
            return _commit(
                root,
                carried + new_files,
                note
                or f"delete: rewrote {len(affected)} files, carried {len(carried)}",
                parent,
                fs,
            )
        except CommitConflict:
            _cas_backoff(_attempt)
            continue
    raise CommitConflict(
        f"delete_where lost the commit race {_MAX_COMMIT_RETRIES} times at {root}"
    )


def restore_table(
    spark: SparkSession | None,
    root: str,
    version: int,
    note: str = "",
    fs: SnapshotFS | None = None,
) -> int:
    """ROLL BACK: re-commit version ``version``'s exact live file set as a
    NEW version (Delta RESTORE). Pure manifest operation — zero data
    files are read or written; the rolled-back-over versions remain
    readable until expiry, so a bad upsert is undone without losing the
    audit trail. Requires the target version to still be retained."""
    fs = _resolve_fs(root, spark, fs)
    target = _read_manifest(root, version, fs)
    for _attempt in range(_MAX_COMMIT_RETRIES):
        parent = _latest(root, fs)
        try:
            return _commit(
                root,
                list(target["files"]),
                note or f"restore v{version}",
                parent,
                fs,
            )
        except CommitConflict:
            _cas_backoff(_attempt)
            continue
    raise CommitConflict(
        f"restore lost the commit race {_MAX_COMMIT_RETRIES} times at {root}"
    )


def table_history(root: str, fs: SnapshotFS | None = None) -> list[dict]:
    """All retained versions, oldest first: version, parent, note, n_files,
    committed_at (ISO-8601 UTC; None on manifests written before timestamps
    were recorded). Metadata only — file-list sidecars are not hydrated,
    and the walk reads checkpoint + suffix (r10), not one JSON per
    version."""
    fs = _resolve_fs(root, None, fs)
    return [dict(m) for m in _manifest_meta_all(root, fs)]


def snapshot_fsck(root: str, fs: SnapshotFS | None = None) -> dict:
    """Integrity check of the snapshot store — metadata-only, no Spark job:

    - every retained manifest's data files exist (``missing_files`` is the
      torn-store signal: an external process deleted data a version still
      references — reads of that version will fail);
    - the parent chain is consistent (each manifest's ``parent`` is an
      older retained version or expired);
    - ``orphan_files``: data files referenced by NO retained manifest
      (abandoned commit attempts / expired-version leftovers —
      reclaimable by :func:`expire_snapshots`, not an error);
    - ``orphan_sidecars``: parquet manifest sidecars with no JSON pointer.

    Returns counts plus bounded example lists; ``ok`` is True iff nothing
    is missing and the chain is consistent."""
    fs = _resolve_fs(root, None, fs)
    vs = _versions(root, fs)
    referenced: set[str] = set()
    missing: list[str] = []
    chain_breaks: list[str] = []
    live_sidecars: set[str] = set()
    vset = set(vs)
    for v in vs:
        m = _read_manifest(root, v, fs)
        if m.get("files_parquet"):
            live_sidecars.add(m["files_parquet"])
        p = m.get("parent")
        if p is not None and p >= v:
            chain_breaks.append(f"v{v}: parent v{p} is not older")
        # (parents simply expired from vset are fine — not a chain break)
        for f in m["files"]:
            referenced.add(f)
            if not fs.exists(_join(root, f)):
                missing.append(f"v{v}:{f}")
    on_disk = {
        _join(_DATA_DIR, name)
        for name in fs.listdir(_join(root, _DATA_DIR))
        if name.endswith(".parquet")
    }
    orphans = sorted(on_disk - referenced)
    snap_names = fs.listdir(_snap_root(root))
    orphan_sidecars = sorted(
        n for n in snap_names if n.endswith(".files.parquet") and n not in live_sidecars
    )
    return {
        "ok": not missing and not chain_breaks,
        "versions": len(vs),
        "referenced_files": len(referenced),
        "missing_files": len(missing),
        "missing_examples": missing[:10],
        "chain_breaks": chain_breaks[:10],
        "orphan_files": len(orphans),
        "orphan_examples": orphans[:10],
        "orphan_sidecars": len(orphan_sidecars),
    }


def refresh_mv(
    spark: SparkSession,
    src_root: str,
    mv_root: str,
    keys: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    consumer_id: str,
    checkpoints,
    fs: SnapshotFS | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    avg_cols: list[str] | None = None,
) -> int | None:
    """One incremental MATERIALIZED-VIEW refresh cycle, end to end: the
    operational composition of the pieces —

    1. :func:`changes_since` gives the consumer's pending version interval
       (first call bootstraps with the initial snapshot, so the MV starts
       complete);
    2. :func:`incremental_agg` applies the interval's deltas to the MV's
       CURRENT stored rows (``base=`` — refresh cost ∝ churn + affected
       groups, never the source table);
    3. the result lands as a new version of the MV's OWN snapshot table
       (itself time-travelable and CDC-consumable downstream) whose manifest
       note records the applied SOURCE version;
    4. only then is the position acknowledged — a crash between write and
       ack is recovered on the next call by reading the applied source
       version back out of the MV's manifest note and re-acking it, so the
       interval's deltas are never applied twice (exactly-once).

    Returns the MV's new version, or None when the source had nothing new.
    """
    fs_r = _resolve_fs(src_root, spark, fs)
    vs = _versions(src_root, fs_r)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {src_root}")
    latest = vs[-1]
    last = checkpoints.last_processed(consumer_id, src_root)
    v_from = int(last) if last is not None else 0
    # Crash recovery: the manifest note of every MV commit records the
    # applied source version ("mv refresh <src> vA->vB"). If the newest
    # such note shows a version AHEAD of the checkpoint, the previous cycle
    # crashed between write_table and checkpoints.save — the MV already
    # contains that interval's deltas, so re-ack and resume from there
    # instead of applying them a second time. Metadata-only (hydrate=False),
    # and robust to non-refresh commits (compaction) interleaved on the MV:
    # we walk back to the newest refresh note. Recovery only applies while
    # the noted version is still RETAINED at the source: if it expired, an
    # operator who reset the checkpoint (the documented remedy) must get
    # the v_from=0 full rebuild, not a re-ack into the same LookupError.
    fs_mv = _resolve_fs(mv_root, spark, fs)
    _note_prefix = f"mv refresh {src_root} v"
    vset = set(vs)
    for mv_v in reversed(_versions(mv_root, fs_mv)):
        note = (
            _read_manifest(mv_root, mv_v, fs_mv, hydrate=False).get("note") or ""
        )
        if not note.startswith(_note_prefix):
            continue
        try:
            applied = int(note.rsplit("->v", 1)[1])
        except (IndexError, ValueError):
            break
        if applied > v_from and applied in vset:
            checkpoints.save(consumer_id, {src_root: applied})
            v_from = applied
        break
    if v_from != latest and v_from != 0 and v_from not in vs:
        raise LookupError(
            f"MV consumer {consumer_id!r} checkpoint points at expired "
            f"v{v_from} of {src_root} (retained: v{vs[0]}..v{latest}); reset "
            "the checkpoint to rebuild the view from the initial snapshot"
        )
    if v_from >= latest:
        return None
    base = None
    if v_from > 0:
        base = read_table(spark, mv_root, fs=fs)
    out = incremental_agg(
        spark,
        src_root,
        keys,
        group_cols,
        sum_cols,
        v_from=v_from,
        v_to=latest,
        fs=fs,
        base=base,
        min_cols=min_cols,
        max_cols=max_cols,
        avg_cols=avg_cols,
    )
    mv_v = write_table(
        out,
        mv_root,
        mode="overwrite",
        note=f"mv refresh {src_root} v{v_from}->v{latest}",
        fs=fs,
    )
    checkpoints.save(consumer_id, {src_root: latest})
    return mv_v


def table_skip_stats(
    root: str,
    x_col: str,
    y_col: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    version: int | None = None,
    fs: SnapshotFS | None = None,
) -> dict:
    """Row-group pruning potential of a SNAPSHOT version's live file set
    for a box predicate — :func:`bucketing.row_group_skip_stats` over the
    manifest's exact files instead of a directory listing. Reads parquet
    FOOTERS only (control plane, no data pages, no Spark job). The
    before/after comparison for :func:`compact_table`'s ``zorder``."""
    import pyarrow.parquet as pq

    fs = _resolve_fs(root, None, fs)
    v = version if version is not None else _latest(root, fs)
    if v is None:
        raise FileNotFoundError(f"no snapshots at {root}")
    files = [_local_path(_join(root, f)) for f in _read_manifest(root, v, fs)["files"]]
    total = skippable = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(len(md.schema))}
        for rg in range(md.num_row_groups):
            total += 1
            for col, (lo, hi) in ((x_col, x_range), (y_col, y_range)):
                st = md.row_group(rg).column(names[col]).statistics
                if st is not None and (st.max < lo or st.min > hi):
                    skippable += 1
                    break
    return {
        "version": v,
        "n_files": len(files),
        "n_row_groups": total,
        "n_skippable": skippable,
        "skip_ppm": (skippable * 1_000_000) // max(total, 1),
    }


def expire_snapshots(
    root: str,
    keep_last: int = 2,
    fs: SnapshotFS | None = None,
    min_age_seconds: float = 3600.0,
) -> dict:
    """Drop all but the newest ``keep_last`` manifests and delete data files
    referenced by NO retained manifest — including orphans from abandoned
    commit attempts. Returns counts. The retention knob is the
    storage/time-travel trade every snapshot store exposes.

    ``min_age_seconds`` (default 1h) protects IN-FLIGHT writers: a
    concurrent upsert lands its data files BEFORE publishing a manifest,
    and during a rebase/retry window those files are unreferenced — an
    unguarded expiry would delete them out from under the commit (the
    same hazard Delta's VACUUM retention threshold exists for). Only
    unreferenced files older than the threshold are reclaimed; pass 0 to
    force immediate reclamation when no writer can be live."""
    fs = _resolve_fs(root, None, fs)
    vs = _versions(root, fs)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    import time as _time

    cutoff = _time.time() - min_age_seconds
    drop, keep = vs[:-keep_last], vs[-keep_last:]
    referenced: set[str] = set()
    kept_sidecars: set[str] = set()
    for v in keep:
        m = _read_manifest(root, v, fs)
        referenced.update(m["files"])
        if m.get("files_parquet"):
            kept_sidecars.add(m["files_parquet"])

    def _old_enough(path: str) -> bool:
        if min_age_seconds <= 0:
            return True
        try:
            return fs.mtime(path) <= cutoff
        except Exception:
            return False  # can't prove age -> keep (safe side)

    removed_files = 0
    for name in fs.listdir(_join(root, _DATA_DIR)):
        rel = _join(_DATA_DIR, name)
        if rel not in referenced and _old_enough(_join(root, rel)):
            fs.delete(_join(root, rel))
            removed_files += 1
    for v in drop:
        fs.delete(_join(_snap_root(root), f"v{v}.json"))
    # Parquet manifest sidecars of dropped versions AND of commit attempts
    # that lost the publish race are now unreferenced — reclaim them.
    snap_names = fs.listdir(_snap_root(root))
    for name in snap_names:
        if (
            name.endswith(".files.parquet")
            and name not in kept_sidecars
            and _old_enough(_join(_snap_root(root), name))
        ):
            fs.delete(_join(_snap_root(root), name))
    # Superseded metadata checkpoints: only the newest is ever read, so the
    # rest are reclaimable (entries covering dropped versions in the kept
    # checkpoint are harmless — readers intersect with retained manifests).
    for cv in _checkpoint_versions(snap_names)[:-1]:
        fs.delete(_checkpoint_path(root, cv))
    return {
        "dropped_versions": len(drop),
        "kept_versions": len(keep),
        "deleted_files": removed_files,
    }


def table_changes(
    spark: SparkSession,
    root: str,
    keys: list[str],
    v_from: int,
    v_to: int | None = None,
    fs: SnapshotFS | None = None,
    include_old: bool = False,
) -> DataFrame:
    """Change data feed between two snapshot versions: one row per changed
    key with ``_change IN ('insert', 'update', 'delete')`` plus the
    key columns and the new-image payload (NULL for deletes).

    The diff is a single full-outer join of the two pinned snapshots on
    ``keys`` — the CDC derivation downstream consumers (incremental
    materialized views, replication, audit) read instead of re-scanning
    the whole table. An update is any key present in both versions whose
    non-key payload differs (struct equality — NULL-safe via ``<=>``).

    NULL-key semantics: the join condition is ``eqNullSafe`` and presence
    is tracked with explicit marker columns, so a legitimately-NULL key
    value diffs as one key (insert/update/delete classified correctly)
    rather than exploding into a spurious delete+insert pair. (Tables
    maintained through :func:`upsert_table` reject NULL keys at write
    time, but CDC must also be correct over externally-written versions.)

    ``include_old=True`` additionally emits the PRE-image payload struct
    as ``_old`` (NULL for inserts) — what delta-driven consumers
    (:func:`incremental_agg`) need to retract the replaced contribution.

    Scale — the INPUT is churn-bounded, not just the output: data files
    are immutable, so a file present in BOTH manifests is byte-identical
    in both versions and cannot produce a change; the diff therefore
    reads ONLY the symmetric difference of the two file sets (the files
    the intervening commits rewrote, added, or dropped) and joins those.
    A 2k-row upsert into a million-file table diffs a handful of files,
    regardless of table size. One shuffle join on the key columns over
    that bounded input. Key columns must identify rows uniquely in each
    version (the upsert keep-last contract guarantees this for tables
    maintained through :func:`upsert_table`).
    """
    tune(spark)
    fs = _resolve_fs(root, spark, fs)
    v_to_r = v_to if v_to is not None else _latest(root, fs)
    # v_from=0 is the explicit empty base (versions start at 1): every row
    # live at v_to comes back as an insert — the CDC "initial snapshot".
    from_files = [] if v_from == 0 else _read_manifest(root, v_from, fs)["files"]
    to_files = _read_manifest(root, v_to_r, fs)["files"]
    old_only = sorted(set(from_files) - set(to_files))
    new_only = sorted(set(to_files) - set(from_files))
    schema_src = old_only or new_only or to_files or from_files
    if not schema_src:
        raise FileNotFoundError(
            f"both v{v_from} and v{v_to_r} at {root} are empty — nothing to diff"
        )
    proto = spark.read.parquet(_join(root, schema_src[0]))

    def _side_read(files: list[str]) -> DataFrame:
        if not files:
            return proto.limit(0)
        return spark.read.parquet(*[_join(root, f) for f in files])

    old = _side_read(old_only)
    new = _side_read(new_only)
    return classify_changes(old, new, keys, include_old=include_old)


def classify_changes(
    old: DataFrame, new: DataFrame, keys: list[str], include_old: bool = False
) -> DataFrame:
    """The CDC classification kernel: given the OLD-version rows and the
    NEW-version rows of the (churn-bounded) differing file sets, emit one
    row per changed key with ``_change IN ('insert','update','delete')``
    and the new image (``_old`` pre-image when ``include_old``). NULL-safe
    on keys and payload (``eqNullSafe`` + presence markers). Shared by
    :func:`table_changes` (batch) and the streaming snapshot-CDC source's
    per-micro-batch transform (streaming/snapshot_source.py) so both
    surfaces classify identically by construction."""
    payload = [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        F.struct(*payload).alias("_old_p"),
        F.lit(True).alias("_old_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        F.struct(*payload).alias("_new_p"),
        F.lit(True).alias("_new_present"),
    )
    cond = functools.reduce(
        operator.and_,
        [F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}")) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    old_present = F.coalesce(F.col("_old_present"), F.lit(False))
    new_present = F.coalesce(F.col("_new_present"), F.lit(False))
    change = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(~F.col("_old_p").eqNullSafe(F.col("_new_p")), F.lit("update"))
    )
    out_keys = [
        F.when(new_present, F.col(f"_nk_{k}")).otherwise(F.col(f"_ok_{k}")).alias(k)
        for k in keys
    ]
    extra = [F.col("_old_p").alias("_old")] if include_old else []
    return (
        j.withColumn("_change", change)
        .where(F.col("_change").isNotNull())
        .select(*out_keys, F.col("_change"), F.col("_new_p").alias("_new"), *extra)
    )


def incremental_agg(
    spark: SparkSession,
    root: str,
    keys: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    v_from: int,
    v_to: int | None = None,
    fs: SnapshotFS | None = None,
    base: DataFrame | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    avg_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance from the change feed:
    ``groupBy(group_cols).agg(SUM(sum_cols), COUNT(*))`` at ``v_to``,
    computed as the ``v_from`` aggregate PLUS the CDC deltas — inserts
    add their contribution, deletes retract theirs, updates retract the
    pre-image and add the post-image (group migration included: an update
    that moves a row between groups emits a retraction in the old group
    and an addition in the new one). Groups whose row count reaches zero
    are dropped, matching a direct recompute.

    Sums accumulate as ``DECIMAL(38,6)`` so the incremental result is
    BIT-IDENTICAL to recomputing over ``v_to`` (decimal addition is exact
    and order-independent; float sums would drift between the two paths).
    Output: ``group_cols + [sum_<c> ...] + n_rows``.

    Scale: the base aggregate scans ``v_from`` once — or, in steady
    state, is the PREVIOUS refresh's output passed back via ``base``
    (columns ``group_cols + [sum_<c>] + n_rows`` plus any min/max columns,
    e.g. the materialized view's stored rows), in which case a refresh
    costs ONE churn-bounded diff join + a delta-sized aggregation —
    independent of table size, the reason CDC exists. The group-side
    combine is a full-outer null-safe join on the (small) group dimension.

    ``min_cols`` / ``max_cols`` maintain ``min_<c>`` / ``max_<c>``. Unlike
    SUM/COUNT these are NOT retraction-closed: deleting the group's
    current minimum needs to learn the runner-up. The maintenance is
    delta-first with a targeted rescan fallback —

    - inserts fold in for free (``least(base_min, min(inserted))``);
    - a retraction whose old value is ABOVE the stored min provably
      cannot change it (all v_from values ≥ min) — fold-free;
    - only groups where a retracted value EQUALS the stored extreme are
      DIRTY: those (and only those) are re-aggregated from ``v_to`` with
      a semi-join — aggregation cost ∝ dirty groups, not the view. In
      steady state retractions rarely hit the exact extreme, so most
      refreshes never rescan (the dirty branch short-circuits to an
      empty plan when no group qualifies);
    - when the interval provably contains NO retraction at all — a
      metadata-only manifest check: immutable data files mean any
      delete/update must remove one of ``v_from``'s files — the plan is
      built WITHOUT the dirty/rescan machinery (and without the
      retraction union branch): the append-dominated steady state pays
      for fold-only maintenance.

    ``avg_cols`` (⊆ ``sum_cols``) adds derived ``avg_<c> =
    sum_<c> / n_rows`` — double division of the EXACT decimal sum, so
    incremental and recomputed averages are bit-identical too.
    """
    dec = "decimal(38,6)"
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    avg_cols = list(avg_cols or [])
    if not set(avg_cols) <= set(sum_cols):
        raise ValueError(f"avg_cols {avg_cols} must be a subset of sum_cols {sum_cols}")
    ext = [("min", c) for c in min_cols] + [("max", c) for c in max_cols]

    # Metadata-only retraction check: data files are immutable, so a
    # delete/update in (v_from, v_to] MUST remove at least one of
    # v_from's files from the manifest (COW rewrites remove the affected
    # file; deletes drop it). If v_from's file set survives intact into
    # v_to, every CDC row in the interval is an insert — the retraction
    # union branch drops out of the delta, and for MIN/MAX the fold-only
    # path is exact so the whole dirty-flag + targeted-rescan machinery
    # (a second v_to scan subtree + semi-join + patch join) is omitted
    # from the plan. This is the append-dominated steady state of a
    # 100 TB fact table; the decision costs two manifest reads the CDC
    # derivation performs anyway.
    fs_r = _resolve_fs(root, spark, fs)
    v_to_r = v_to if v_to is not None else _latest(root, fs_r)
    from_files = [] if v_from == 0 else _read_manifest(root, v_from, fs_r)["files"]
    no_retractions = not (
        set(from_files) - set(_read_manifest(root, v_to_r, fs_r)["files"])
    )

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy(*group_cols).agg(
            *[F.sum(F.col(c).cast(dec)).alias(f"sum_{c}") for c in sum_cols],
            F.count(F.lit(1)).alias("n_rows"),
            *[getattr(F, k)(c).alias(f"{k}_{c}") for k, c in ext],
        )

    if base is None:
        # v_from=0 is the empty base (the initial-snapshot interval): the
        # delta carries every row as an insert, so the base aggregate is
        # the empty frame in the output schema.
        src = (
            read_table(spark, root, version=v_to, fs=fs).limit(0)
            if v_from == 0
            else read_table(spark, root, version=v_from, fs=fs)
        )
        base = _agg(src)
    else:
        base = base.select(
            *group_cols,
            *[F.col(f"sum_{c}").cast(dec).alias(f"sum_{c}") for c in sum_cols],
            F.col("n_rows").cast("long"),
            *[F.col(f"{k}_{c}") for k, c in ext],
        )
    # ``ch`` (the CDC feed) and ``merged`` (the base+delta combine) are NOT
    # pinned (measured): an interleaved A/B at sf0.1 put pins on them at
    # 1.04x (snapshot_incremental_agg) and 1.24x (.._minmax) — both frames
    # are exchange-terminated, so runtime ReuseExchange already dedups the
    # shared subtrees across consumers and the pin jobs are pure overhead.
    ch = table_changes(spark, root, keys, v_from, v_to, fs=fs, include_old=True)

    def _side(struct: str, col: str):
        # Key columns live at the CDC top level; payload columns inside
        # the image struct. For the old side the top-level key equals the
        # row's key in BOTH versions (keys identify rows), so it is valid.
        return F.col(col) if col in keys else F.col(f"{struct}.{col}")

    # Retracted-side extreme columns are only consulted by the dirty-flag
    # machinery, which the append-only plan omits entirely.
    ret_ext = [] if no_retractions else ext

    def _contrib(struct: str, sign: int, change_in: tuple[str, str]) -> DataFrame:
        return ch.where(F.col("_change").isin(*change_in)).select(
            *[_side(struct, g).alias(g) for g in group_cols],
            *[
                (F.lit(sign) * _side(struct, c).cast(dec)).alias(f"d_{c}")
                for c in sum_cols
            ],
            F.lit(sign).cast("long").alias("dn"),
            # Extreme-maintenance inputs: the inserted-side candidates and
            # the retracted-side extremes, NULL on the opposite side so the
            # grouped min/max ignores them.
            *[
                (_side(struct, c) if sign > 0 else F.lit(None).cast(ch.schema["_new"].dataType[c].dataType)).alias(f"ins_{k}_{c}")
                for k, c in ext
            ],
            *[
                (_side(struct, c) if sign < 0 else F.lit(None).cast(ch.schema["_new"].dataType[c].dataType)).alias(f"ret_{k}_{c}")
                for k, c in ret_ext
            ],
        )

    adds = _contrib("_new", 1, ("insert", "update"))
    contribs = (
        adds
        if no_retractions
        else _contrib("_old", -1, ("delete", "update")).unionByName(adds)
    )
    delta = contribs.groupBy(*group_cols).agg(
        *[F.sum(f"d_{c}").alias(f"d_{c}") for c in sum_cols],
        F.sum("dn").alias("dn"),
        # min over inserted values / min over retracted values (resp.
        # max) — all the delta knows about the group's extremes.
        *[getattr(F, k)(f"ins_{k}_{c}").alias(f"ins_{k}_{c}") for k, c in ext],
        *[getattr(F, k)(f"ret_{k}_{c}").alias(f"ret_{k}_{c}") for k, c in ret_ext],
    )
    b = base.select(
        *[F.col(g).alias(f"_bg_{g}") for g in group_cols],
        *[F.col(f"sum_{c}") for c in sum_cols],
        "n_rows",
        *[F.col(f"{k}_{c}") for k, c in ext],
    )
    d = delta.select(
        *[F.col(g).alias(f"_dg_{g}") for g in group_cols],
        *[F.col(f"d_{c}") for c in sum_cols],
        "dn",
        *[F.col(f"ins_{k}_{c}") for k, c in ext],
        *[F.col(f"ret_{k}_{c}") for k, c in ret_ext],
    )
    cond = functools.reduce(
        operator.and_,
        [F.col(f"_bg_{g}").eqNullSafe(F.col(f"_dg_{g}")) for g in group_cols],
    )
    j = b.join(d, cond, "full_outer")
    zero = F.lit(0).cast(dec)
    out_groups = [
        F.coalesce(F.col(f"_bg_{g}"), F.col(f"_dg_{g}")).alias(g) for g in group_cols
    ]
    sums = [
        (F.coalesce(F.col(f"sum_{c}"), zero) + F.coalesce(F.col(f"d_{c}"), zero))
        .cast(dec)
        .alias(f"sum_{c}")
        for c in sum_cols
    ]
    n = (
        F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))
    ).cast("long")

    def _avg_out(cols) -> list:
        # Double division of the EXACT decimal sum: deterministic and
        # identical between the incremental and recomputed paths (both
        # divide the same exact numerator by the same count). Decimal
        # division would also work but rounds differently across engines,
        # which would break oracle parity for no precision gain.
        return [
            (F.col(f"sum_{c}").cast("double") / F.col("n_rows")).alias(f"avg_{c}")
            for c in cols
        ]

    if not ext:
        out = j.select(*out_groups, *sums, n.alias("n_rows")).where(
            F.col("n_rows") > 0
        )
        return out.select("*", *_avg_out(avg_cols)) if avg_cols else out

    # Extreme maintenance. A group is DIRTY for (k, c) iff a retraction hit
    # the stored extreme exactly (every v_from value is bounded by the
    # extreme, so a retraction strictly inside the range can never move
    # it). Dirty groups get re-aggregated from v_to — aggregation work ∝
    # dirty groups; clean groups fold the inserted-side candidate in
    # directly. Brand-new groups (no base) are always clean: every current
    # row arrived through the delta, so the inserted candidate IS the
    # extreme.
    fold = {"min": F.least, "max": F.greatest}
    if no_retractions:
        # Proven append-only above (manifest check): no group can be
        # dirty, so fold-only is exact and the plan carries no second
        # v_to scan, no semi-join, no patch join.
        out = j.select(
            *out_groups,
            *sums,
            n.alias("n_rows"),
            *[
                fold[k](F.col(f"{k}_{c}"), F.col(f"ins_{k}_{c}")).alias(f"{k}_{c}")
                for k, c in ext
            ],
        ).where(F.col("n_rows") > 0)
        return out.select("*", *_avg_out(avg_cols)) if avg_cols else out
    dirty_flags = [
        (
            F.col("n_rows").isNotNull()
            & F.col(f"ret_{k}_{c}").isNotNull()
            & (F.col(f"ret_{k}_{c}") == F.col(f"{k}_{c}"))
        ).alias(f"_dirty_{k}_{c}")
        for k, c in ext
    ]
    exts = [
        fold[k](F.col(f"{k}_{c}"), F.col(f"ins_{k}_{c}")).alias(f"{k}_{c}")
        for k, c in ext
    ]
    merged = j.select(
        *out_groups, *sums, n.alias("n_rows"), *exts, *dirty_flags
    ).where(F.col("n_rows") > 0)
    any_dirty = functools.reduce(
        operator.or_, [F.col(f"_dirty_{k}_{c}") for k, c in ext]
    )
    dirty_groups = merged.where(any_dirty).select(*group_cols)
    rescan = (
        read_table(spark, root, version=v_to_r, fs=fs)
        .join(dirty_groups, group_cols, "left_semi")
        .groupBy(*group_cols)
        .agg(*[getattr(F, k)(c).alias(f"_rs_{k}_{c}") for k, c in ext])
    )
    # No pinned join strategy: the dirty set is usually tiny (AQE
    # broadcasts it at runtime) but is unbounded in the worst case — a
    # forced broadcast would be the OOM antipattern dim_join documents.
    patched = merged.join(rescan, group_cols, "left")
    final_ext = [
        F.when(F.col(f"_dirty_{k}_{c}"), F.col(f"_rs_{k}_{c}"))
        .otherwise(F.col(f"{k}_{c}"))
        .alias(f"{k}_{c}")
        for k, c in ext
    ]
    out = patched.select(
        *group_cols,
        *[F.col(f"sum_{c}") for c in sum_cols],
        "n_rows",
        *final_ext,
    )
    return out.select("*", *_avg_out(avg_cols)) if avg_cols else out


def changes_since(
    spark: SparkSession,
    root: str,
    keys: list[str],
    consumer_id: str,
    checkpoints,
    fs: SnapshotFS | None = None,
    include_old: bool = False,
    bootstrap: str = "snapshot",
):
    """Exactly-once incremental CDC consumption (the Delta "table
    streaming" pattern on the repo's batch-incremental chassis): returns
    ``(changes_df, ack)`` where ``changes_df`` is :func:`table_changes`
    from the consumer's last-acknowledged version to the current latest
    (``None`` when there is nothing new), and ``ack()`` persists the new
    position AFTER the caller has durably applied the feed — crash
    between apply and ack replays the same closed version interval, so a
    downstream writer that is idempotent per interval (e.g.
    :func:`incremental_agg` + an upsert keyed on the group) gets
    exactly-once effect.

    ``checkpoints`` is a :class:`streaming.incremental.CheckpointStore`
    (positions are version numbers in the ``last_processed_ns`` slot —
    the store is schema-agnostic about units).

    Bootstrap: a brand-new consumer's first interval is the INITIAL
    SNAPSHOT — every row live at the current latest version arrives as an
    ``insert`` (a diff against the empty base v0), so the downstream state
    starts complete rather than missing whatever predates the oldest
    retained version. Pass ``bootstrap="none"`` to skip the initial
    snapshot and deliver only changes committed after the first call.

    A persisted checkpoint that points at an EXPIRED version (the retention
    window moved past it) raises a descriptive error instead of a raw
    missing-manifest read — the consumer's state no longer has a valid
    handoff base and must re-bootstrap deliberately.

    Input cost is churn-bounded (``table_changes`` reads only the file
    sets that differ between the two manifests).
    """
    if bootstrap not in ("snapshot", "none"):
        raise ValueError(f"bootstrap must be snapshot|none, got {bootstrap!r}")
    fs = _resolve_fs(root, spark, fs)
    vs = _versions(root, fs)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {root}")
    latest = vs[-1]
    last = checkpoints.last_processed(consumer_id, root)
    if last is None:
        if bootstrap == "none":
            # Skip the initial snapshot: pin the position at latest so the
            # next call diffs from here. Persisting immediately is safe —
            # there is nothing to apply for this interval.
            checkpoints.save(consumer_id, {root: latest})
            return None, lambda: None
        v_from = 0  # empty base: full current state as inserts
    else:
        v_from = int(last)
        if v_from != latest and v_from not in vs:
            raise LookupError(
                f"consumer {consumer_id!r} checkpoint points at v{v_from} of "
                f"{root}, which retention has expired (retained: v{vs[0]}.."
                f"v{latest}); reset the checkpoint to re-bootstrap from the "
                "initial snapshot"
            )
    if v_from >= latest:
        return None, lambda: None
    df = table_changes(
        spark, root, keys, v_from=v_from, v_to=latest, fs=fs, include_old=include_old
    )

    def ack() -> None:
        checkpoints.save(consumer_id, {root: latest})

    return df, ack


def compact_table(
    spark: SparkSession,
    root: str,
    target_files: int = 1,
    note: str = "",
    fs: SnapshotFS | None = None,
    zorder: list[str] | None = None,
    target_file_mb: int | None = None,
    zorder_bits: int = 16,
) -> int:
    """OPTIMIZE: rewrite the latest snapshot's live set into
    ``target_files`` files as a NEW version (rows identical, layout
    consolidated). Old versions keep reading their own files until
    :func:`expire_snapshots`. The small-files problem is the steady-state
    failure mode of frequent upserts — compaction is the maintenance pass
    every snapshot store schedules. Losing the commit race re-runs the
    compaction over the new latest (compacting a stale version would
    silently drop the interleaved commit's rows).

    ``zorder=[cols]`` is OPTIMIZE ZORDER: the rewrite range-partitions on
    the Morton interleave of the named integer columns and sorts within
    each file, so every output file/row group covers a small box of the
    key space and parquet footer min/max stats prune reads on ANY of the
    z-columns, not just a leading sort key (one column degenerates to a
    plain range sort). Measure with :func:`table_skip_stats` before/after.

    ``target_file_mb`` sizes the output from Catalyst's estimate of the
    live set (file-footer byte sizes — no job) instead of a fixed file
    count: ``ceil(estimated_bytes / target_file_mb)``."""
    fs = _resolve_fs(root, spark, fs)
    for _attempt in range(_MAX_COMMIT_RETRIES):
        parent = _latest(root, fs)
        if parent is None:
            raise FileNotFoundError(f"no snapshots at {root}")
        cur = read_table(spark, root, version=parent, fs=fs)
        n_out = target_files
        if target_file_mb is not None:
            from .plans.registry import plan_size_bytes

            est = plan_size_bytes(cur)
            n_out = max(1, -(-est // (target_file_mb << 20)))
        if zorder:
            if len(zorder) == 1:
                zkey = F.col(zorder[0])
            else:
                from .bucketing import zorder_key, zorder_key_n

                zcols = [F.col(c) for c in zorder]
                zkey = (
                    zorder_key(*zcols, bits=zorder_bits)
                    if len(zorder) == 2
                    else zorder_key_n(zcols, bits=zorder_bits)
                )
            laid = (
                cur.withColumn("_z", zkey)
                .repartitionByRange(int(n_out), "_z")
                .sortWithinPartitions("_z")
                .drop("_z")
            )
            what = f"compact zorder({','.join(zorder)})"
        else:
            laid = cur.repartition(int(n_out))
            what = "compact"
        new_files = _land_data_files(laid, root, parent + 1, fs)
        try:
            return _commit(
                root, new_files, note or f"{what} -> {len(new_files)} files", parent, fs
            )
        except CommitConflict:
            _cas_backoff(_attempt)
            continue
    raise CommitConflict(
        f"compact lost the commit race {_MAX_COMMIT_RETRIES} times at {root}"
    )
