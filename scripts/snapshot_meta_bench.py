#!/usr/bin/env python3
"""Metadata-checkpoint scale cell: as-of resolution on a LONG history.

Builds a 1,000-commit snapshot table's METADATA (manifests only — the
walks under test never touch data files, so no Spark is needed) under
both FS params, then measures:

- ``as_of_s`` / ``history_s``: wall for ``version_as_of`` (resolving a
  mid-history timestamp) and ``table_history`` WITH checkpoints (every
  100 commits) vs WITHOUT (``MP_SNAPSHOT_CHECKPOINT_EVERY=0`` rebuild of
  the same history);
- ``reads_with`` / ``reads_without``: read_text calls per as-of walk —
  the structural claim (checkpoint + suffix vs one JSON per version);
- invariance: both layouts resolve the SAME version, ``snapshot_fsck``
  reports ok on both, and ``expire_snapshots`` keeps identical version
  sets (and reclaims superseded checkpoints).

Merges a ``metadata_checkpoint`` section into SNAPSHOT_BENCH.json.

Usage: python scripts/snapshot_meta_bench.py [--commits 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class CountingFS:
    def __init__(self, inner):
        self._inner = inner
        self.reads = 0

    def read_text(self, path):
        self.reads += 1
        return self._inner.read_text(path)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def build(root: str, commits: int, fs, S) -> None:
    for i in range(commits):
        S._commit(root, [], f"meta c{i}", i or None, fs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=1000)
    args = ap.parse_args()

    from marketpipe_spark import snapshots as S
    from marketpipe_spark.snapshots import (
        LocalFS,
        S3SimFS,
        expire_snapshots,
        snapshot_fsck,
        table_history,
        version_as_of,
    )

    results: dict[str, dict] = {}
    for fs_name, mk_fs in (("local", LocalFS), ("s3sim", S3SimFS)):
        cell: dict = {"commits": args.commits}
        with tempfile.TemporaryDirectory() as td:
            for tag, every in (("with_ckpt", 100), ("no_ckpt", 0)):
                S.SNAPSHOT_CHECKPOINT_EVERY = every
                root = os.path.join(td, tag)
                fs = mk_fs()
                fs.mkdirs(os.path.join(root, "data"))
                t0 = time.time()
                build(root, args.commits, fs, S)
                cell[f"build_s_{tag}"] = round(time.time() - t0, 2)
            for tag in ("with_ckpt", "no_ckpt"):
                root = os.path.join(td, tag)
                # each table resolves ITS OWN mid-history commit timestamp
                mid = S._read_manifest(
                    root, args.commits // 2, mk_fs(), hydrate=False
                )["committed_at"]
                cfs = CountingFS(mk_fs())
                t0 = time.time()
                v = version_as_of(root, mid, fs=cfs)
                cell[f"as_of_s_{tag}"] = round(time.time() - t0, 3)
                cell[f"as_of_reads_{tag}"] = cfs.reads
                cell[f"as_of_version_{tag}"] = v
                t0 = time.time()
                h = table_history(root, fs=mk_fs())
                cell[f"history_s_{tag}"] = round(time.time() - t0, 3)
                cell[f"history_len_{tag}"] = len(h)
                rep = snapshot_fsck(root, fs=mk_fs())
                cell[f"fsck_ok_{tag}"] = rep["ok"]
            assert cell["as_of_version_with_ckpt"] == cell["as_of_version_no_ckpt"]
            assert cell["history_len_with_ckpt"] == cell["history_len_no_ckpt"]
            # expiry invariance + checkpoint reclamation
            for tag in ("with_ckpt", "no_ckpt"):
                root = os.path.join(td, tag)
                expire_snapshots(root, keep_last=10, fs=mk_fs(), min_age_seconds=0)
            ha = [m["version"] for m in table_history(os.path.join(td, "with_ckpt"), fs=mk_fs())]
            hb = [m["version"] for m in table_history(os.path.join(td, "no_ckpt"), fs=mk_fs())]
            assert ha == hb, (ha, hb)
            cell["post_expiry_versions"] = len(ha)
            cell["ckpts_after_expiry"] = len(
                S._checkpoint_versions(mk_fs().listdir(S._snap_root(os.path.join(td, "with_ckpt"))))
            )
        results[fs_name] = cell
        print(f"{fs_name}: {json.dumps(cell)}", file=sys.stderr)

    path = os.path.join(REPO, "SNAPSHOT_BENCH.json")
    doc: dict = {}
    if os.path.exists(path):
        try:
            doc = json.load(open(path))
        except Exception:
            doc = {}
    doc["metadata_checkpoint"] = results
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"metadata_checkpoint": results}))


if __name__ == "__main__":
    main()
