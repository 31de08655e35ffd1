"""Snapshot table protocol: time travel, COW upsert file pruning, expiry.

The WHOLE module runs twice — once over the POSIX :class:`LocalFS` and once
over the S3-semantics contract double :class:`S3SimFS` (conditional-PUT
publish, copy+delete rename, unordered listings) — so every protocol test,
including the deterministic two-writer races and expiry, is proven under
object-store semantics, not just the filesystem the sandbox happens to have.
"""

from __future__ import annotations

import os

import pytest

from marketpipe_spark.snapshots import (
    S3SimFS,
    expire_snapshots,
    read_table,
    table_history,
    upsert_table,
    write_table,
)


@pytest.fixture(params=["local", "s3sim"], autouse=True)
def snapshot_fs_matrix(request, monkeypatch):
    """Route default-FS resolution (fs=None) to the parametrized store.
    Tests that pass an explicit ``fs=`` keep it (the gated-race wrappers
    pick their inner store from this fixture instead)."""
    if request.param == "local":
        yield "local"
        return
    from marketpipe_spark import snapshots as S

    orig = S._resolve_fs

    def routed(root, spark, fs):
        if fs is None and not S._has_scheme(root):
            return S3SimFS()
        return orig(root, spark, fs)

    monkeypatch.setattr(S, "_resolve_fs", routed)
    yield "s3sim"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_versions_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "snap")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b2 = spark.createDataFrame([(3, "c")], "id long, v string")
    v1 = write_table(b1, root, mode="append", note="first")
    v2 = write_table(b2, root, mode="append", note="second")
    assert (v1, v2) == (1, 2)
    assert _rows(read_table(spark, root, version=1)) == [(1, "a"), (2, "b")]
    assert _rows(read_table(spark, root)) == [(1, "a"), (2, "b"), (3, "c")]
    hist = table_history(root)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["parent"] == 1


def test_overwrite_keeps_old_version_readable(spark, tmp_path):
    root = str(tmp_path / "snap")
    write_table(spark.createDataFrame([(1, "a")], "id long, v string"), root)
    write_table(
        spark.createDataFrame([(9, "z")], "id long, v string"), root, mode="overwrite"
    )
    assert _rows(read_table(spark, root)) == [(9, "z")]
    assert _rows(read_table(spark, root, version=1)) == [(1, "a")]


def test_upsert_is_file_granular_cow(spark, tmp_path):
    root = str(tmp_path / "snap")
    # Two single-file commits -> live set has (at least) two distinct files
    # with disjoint key ranges.
    write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1),
        root,
    )
    write_table(
        spark.createDataFrame([(10, "x"), (11, "y")], "id long, v string").coalesce(1),
        root,
        mode="append",
    )
    hist = table_history(root)
    live_before = set(
        __import__("json").load(
            open(os.path.join(root, "_snapshots", f"v{hist[-1]['version']}.json"))
        )["files"]
    )
    # Upsert touches only the file containing id=2.
    v3 = upsert_table(
        spark,
        spark.createDataFrame([(2, "B!")], "id long, v string"),
        root,
        keys=["id"],
    )
    m3 = __import__("json").load(
        open(os.path.join(root, "_snapshots", f"v{v3}.json"))
    )
    carried = set(m3["files"]) & live_before
    rewritten = live_before - set(m3["files"])
    assert len(carried) == 1 and len(rewritten) == 1  # one file untouched, one COW'd
    assert _rows(read_table(spark, root)) == [
        (1, "a"),
        (2, "B!"),
        (10, "x"),
        (11, "y"),
    ]
    # Pre-image still reads exactly the old rows (time travel across upsert).
    assert _rows(read_table(spark, root, version=2)) == [
        (1, "a"),
        (2, "b"),
        (10, "x"),
        (11, "y"),
    ]


def test_upsert_into_empty_table_bootstraps(spark, tmp_path):
    root = str(tmp_path / "snap")
    v = upsert_table(
        spark,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        root,
        keys=["id"],
    )
    assert v == 1
    assert _rows(read_table(spark, root)) == [(1, "a")]


def test_expire_deletes_only_unreferenced_files(spark, tmp_path):
    root = str(tmp_path / "snap")
    write_table(spark.createDataFrame([(1, "a")], "id long, v string"), root)
    write_table(
        spark.createDataFrame([(2, "b")], "id long, v string"), root, mode="overwrite"
    )
    write_table(
        spark.createDataFrame([(3, "c")], "id long, v string"), root, mode="append"
    )
    out = expire_snapshots(root, keep_last=2, min_age_seconds=0)
    assert out["dropped_versions"] == 1 and out["kept_versions"] == 2
    # v1's file (overwritten away in v2) is unreferenced by v2/v3 -> deleted.
    assert out["deleted_files"] >= 1
    # Retained versions still read.
    assert _rows(read_table(spark, root, version=2)) == [(2, "b")]
    assert _rows(read_table(spark, root)) == [(2, "b"), (3, "c")]
    import pytest

    with pytest.raises(FileNotFoundError):
        read_table(spark, root, version=1)


def test_table_changes_classifies_cdc(spark, tmp_path):
    from marketpipe_spark.snapshots import table_changes

    root = str(tmp_path / "snap")
    write_table(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, v string, x double",
        ),
        root,
    )
    upsert_table(
        spark,
        spark.createDataFrame(
            [(2, "B!", 20.0), (4, "d", 40.0)], "id long, v string, x double"
        ),
        root,
        keys=["id"],
    )
    ch = {
        r["id"]: (r["_change"], tuple(r["_new"]) if r["_new"] else None)
        for r in table_changes(spark, root, ["id"], v_from=1, v_to=2).collect()
    }
    assert ch == {2: ("update", ("B!", 20.0)), 4: ("insert", ("d", 40.0))}
    # Deleting = overwrite without the row; diff v2 -> v3 shows it.
    write_table(
        spark.createDataFrame([(2, "B!", 20.0)], "id long, v string, x double"),
        root,
        mode="overwrite",
    )
    ch2 = {
        r["id"]: r["_change"]
        for r in table_changes(spark, root, ["id"], v_from=2, v_to=3).collect()
    }
    assert ch2 == {1: "delete", 3: "delete", 4: "delete"}


def test_compact_preserves_rows_and_history(spark, tmp_path):
    from marketpipe_spark.snapshots import compact_table

    root = str(tmp_path / "snap")
    for i in range(4):  # four tiny single-file commits -> 4 live files
        write_table(
            spark.createDataFrame([(i, f"r{i}")], "id long, v string").coalesce(1),
            root,
            mode="append",
        )
    before = _rows(read_table(spark, root))
    v = compact_table(spark, root, target_files=1)
    hist = {h["version"]: h["n_files"] for h in table_history(root)}
    assert hist[v] == 1 and hist[v - 1] == 4
    assert _rows(read_table(spark, root)) == before
    assert _rows(read_table(spark, root, version=v - 1)) == before  # pre-image intact


# ---------------------------------------------------------------------------
# r8: concurrent writers, NULL-key CDC, batch contract, path schemes


def test_commit_cas_rejects_second_writer(tmp_path):
    """Two writers racing the same parent version: exactly one wins the
    conditional put; the loser gets CommitConflict, never a silent
    overwrite (the r7 race: last os.replace won and orphaned the other)."""
    import pytest

    from marketpipe_spark.snapshots import CommitConflict, LocalFS, _commit

    root = str(tmp_path / "snap")
    fs = LocalFS()
    assert _commit(root, ["data/a.parquet"], "w1", None, fs) == 1
    with pytest.raises(CommitConflict):
        _commit(root, ["data/b.parquet"], "w2", None, fs)
    # The winner's manifest is intact.
    import json

    m = json.load(open(os.path.join(root, "_snapshots", "v1.json")))
    assert m["note"] == "w1" and m["files"] == ["data/a.parquet"]


class _GatedFS:
    """FS wrapper that parks the first publish until released —
    deterministic interleaving for the two-writer tests. Wraps whichever
    store the module matrix is running over (LocalFS by default)."""

    def __init__(self, inner=None):
        import threading

        from marketpipe_spark.snapshots import LocalFS

        self._inner = inner if inner is not None else LocalFS()
        self.reached = threading.Event()
        self.go = threading.Event()
        self.conflicts = 0

    def try_publish(self, tmp, final):
        self.reached.set()
        assert self.go.wait(timeout=120), "gate never released"
        ok = self._inner.try_publish(tmp, final)
        if not ok:
            self.conflicts += 1
        return ok

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _two_file_table(spark, root):
    write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1),
        root,
    )
    write_table(
        spark.createDataFrame([(10, "x"), (11, "y")], "id long, v string").coalesce(1),
        root,
        mode="append",
    )


def test_concurrent_disjoint_upserts_rebase(spark, tmp_path, snapshot_fs_matrix):
    """Writer A (insert of a brand-new key) loses the CAS to writer B
    (update of id=2). Their file sets are disjoint, so A rebases: both
    effects land, versions are linear, nothing is lost."""
    import threading

    root = str(tmp_path / "snap")
    _two_file_table(spark, root)

    gated = _GatedFS(
        S3SimFS() if snapshot_fs_matrix == "s3sim" else None
    )
    result = {}

    def writer_a():
        result["v"] = upsert_table(
            spark,
            spark.createDataFrame([(99, "new")], "id long, v string"),
            root,
            keys=["id"],
            fs=gated,
        )

    ta = threading.Thread(target=writer_a)
    ta.start()
    assert gated.reached.wait(timeout=120)
    # B commits v3 while A is parked at its publish of v3.
    upsert_table(
        spark,
        spark.createDataFrame([(2, "B!")], "id long, v string"),
        root,
        keys=["id"],
    )
    gated.go.set()
    ta.join(timeout=300)
    assert not ta.is_alive() and gated.conflicts == 1
    assert result["v"] == 4
    hist = table_history(root)
    assert [h["version"] for h in hist] == [1, 2, 3, 4]
    assert [h["parent"] for h in hist] == [None, 1, 2, 3]
    assert "rebased" in hist[-1]["note"]
    assert _rows(read_table(spark, root)) == [
        (1, "a"),
        (2, "B!"),
        (10, "x"),
        (11, "y"),
        (99, "new"),
    ]
    # The pre-race version still reads its own image.
    assert _rows(read_table(spark, root, version=3)) == [
        (1, "a"),
        (2, "B!"),
        (10, "x"),
        (11, "y"),
    ]


def test_concurrent_overlapping_upserts_retry_keep_last(spark, tmp_path, snapshot_fs_matrix):
    """Both writers update id=2. The loser may NOT rebase (the winner's new
    file carries its key) — it re-runs the merge against the new parent, so
    the serial order is 'winner then loser' and the loser's value is the
    final keep-last image. No update is silently dropped."""
    import threading

    root = str(tmp_path / "snap")
    _two_file_table(spark, root)

    gated = _GatedFS(
        S3SimFS() if snapshot_fs_matrix == "s3sim" else None
    )

    def writer_a():
        upsert_table(
            spark,
            spark.createDataFrame([(2, "A2")], "id long, v string"),
            root,
            keys=["id"],
            fs=gated,
        )

    ta = threading.Thread(target=writer_a)
    ta.start()
    assert gated.reached.wait(timeout=120)
    upsert_table(
        spark,
        spark.createDataFrame([(2, "B2")], "id long, v string"),
        root,
        keys=["id"],
    )
    gated.go.set()
    ta.join(timeout=300)
    assert not ta.is_alive() and gated.conflicts == 1
    hist = table_history(root)
    assert [h["version"] for h in hist] == [1, 2, 3, 4]
    # v3 = B's commit, v4 = A re-merged on top of it: A wins keep-last.
    assert _rows(read_table(spark, root, version=3))[1] == (2, "B2")
    assert _rows(read_table(spark, root)) == [
        (1, "a"),
        (2, "A2"),
        (10, "x"),
        (11, "y"),
    ]
    # The abandoned first attempt's files are orphans; expiry reclaims them
    # and every retained version still reads.
    import json

    referenced = set()
    for h in hist:
        referenced.update(
            json.load(open(os.path.join(root, "_snapshots", f"v{h['version']}.json")))["files"]
        )
    on_disk = {os.path.join("data", n) for n in os.listdir(os.path.join(root, "data"))}
    assert on_disk - referenced, "expected orphaned files from the aborted attempt"
    out = __import__("marketpipe_spark.snapshots", fromlist=["expire_snapshots"]).expire_snapshots(
        root, keep_last=len(hist), min_age_seconds=0
    )
    assert out["deleted_files"] == len(on_disk - referenced)
    assert _rows(read_table(spark, root)) == [(1, "a"), (2, "A2"), (10, "x"), (11, "y")]


def test_upsert_rejects_null_keys_and_intra_batch_dups(spark, tmp_path):
    import pytest

    root = str(tmp_path / "snap")
    write_table(spark.createDataFrame([(1, "a")], "id long, v string"), root)
    with pytest.raises(ValueError, match="NULL"):
        upsert_table(
            spark,
            spark.createDataFrame([(None, "x")], "id long, v string"),
            root,
            keys=["id"],
        )
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_table(
            spark,
            spark.createDataFrame([(5, "x"), (5, "y")], "id long, v string"),
            root,
            keys=["id"],
        )
    # With dedup_order, keep-last within the batch (greatest ordering value).
    upsert_table(
        spark,
        spark.createDataFrame(
            [(5, "x", 1), (5, "y", 2)], "id long, v string, seq long"
        ).select("id", "v"),
        root,
        keys=["id"],
        dedup_order="v",  # 'y' > 'x'
    )
    assert _rows(read_table(spark, root)) == [(1, "a"), (5, "y")]


def test_table_changes_null_key_is_one_update(spark, tmp_path):
    """A legitimately-NULL key value must diff as ONE key (eqNullSafe join),
    not a spurious delete+insert pair (the r7 `==` join bug)."""
    from marketpipe_spark.snapshots import table_changes

    root = str(tmp_path / "snap")
    write_table(
        spark.createDataFrame([(None, 1.0), (7, 2.0)], "id long, x double"), root
    )
    write_table(
        spark.createDataFrame([(None, 9.0), (7, 2.0)], "id long, x double"),
        root,
        mode="overwrite",
    )
    ch = table_changes(spark, root, ["id"], v_from=1, v_to=2).collect()
    assert len(ch) == 1
    assert ch[0]["id"] is None and ch[0]["_change"] == "update"
    assert ch[0]["_new"]["x"] == 9.0


def test_file_scheme_root_roundtrip(spark, tmp_path):
    """file:-scheme roots work end to end through the FS abstraction."""
    root = "file:" + str(tmp_path / "snap")
    write_table(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), root)
    upsert_table(
        spark,
        spark.createDataFrame([(2, "B!")], "id long, v string"),
        root,
        keys=["id"],
    )
    assert _rows(read_table(spark, root)) == [(1, "a"), (2, "B!")]
    assert [h["version"] for h in table_history(root)] == [1, 2]


def test_hadoop_fs_bridge_roundtrip(spark, tmp_path):
    """HadoopFS (the hdfs:/s3a: path) exercised against the local scheme:
    manifest IO, CAS publish, data-file renames all through the JVM
    FileSystem — proves the non-POSIX deployment path works."""
    import pytest

    from marketpipe_spark.snapshots import CommitConflict, HadoopFS, _commit

    root = "file:" + str(tmp_path / "snap")
    fs = HadoopFS(spark, root)
    v1 = write_table(
        spark.createDataFrame([(1, "a")], "id long, v string"), root, fs=fs
    )
    v2 = upsert_table(
        spark,
        spark.createDataFrame([(1, "A"), (2, "b")], "id long, v string"),
        root,
        keys=["id"],
        fs=fs,
    )
    assert (v1, v2) == (1, 2)
    assert _rows(read_table(spark, root, fs=fs)) == [(1, "A"), (2, "b")]
    assert _rows(read_table(spark, root, version=1, fs=fs)) == [(1, "a")]
    # The CAS refuses an already-published version through this FS too.
    with pytest.raises(CommitConflict):
        _commit(root, [], "late", 1, fs)


def test_parquet_manifest_sidecar(spark, tmp_path, monkeypatch):
    """Past the file-count threshold the manifest's file list lives in a
    zstd parquet sidecar; reads/upserts/expiry are transparent to it and
    expiry reclaims sidecars of dropped versions."""
    import json

    import marketpipe_spark.snapshots as snap

    monkeypatch.setattr(snap, "PARQUET_MANIFEST_MIN_FILES", 2)
    root = str(tmp_path / "snap")
    write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").repartition(3),
        root,
    )
    m1 = json.load(open(os.path.join(root, "_snapshots", "v1.json")))
    assert m1["files"] == [] and m1["files_parquet"].endswith(".files.parquet")
    assert _rows(read_table(spark, root)) == [(1, "a"), (2, "b")]
    # COW upsert reads the sidecar list and commits another sidecar version.
    upsert_table(
        spark,
        spark.createDataFrame([(2, "B!")], "id long, v string"),
        root,
        keys=["id"],
    )
    assert _rows(read_table(spark, root)) == [(1, "a"), (2, "B!")]
    # Overwrite to a single small file -> inline JSON again (below threshold
    # only if < 2 files; repartition(1) gives exactly 1).
    write_table(
        spark.createDataFrame([(9, "z")], "id long, v string").repartition(1),
        root,
        mode="overwrite",
    )
    m3 = json.load(open(os.path.join(root, "_snapshots", "v3.json")))
    assert m3["files"] and "files_parquet" not in m3
    sidecars = [
        n for n in os.listdir(os.path.join(root, "_snapshots"))
        if n.endswith(".files.parquet")
    ]
    assert len(sidecars) == 2  # v1 + v2
    out = expire_snapshots(root, keep_last=1, min_age_seconds=0)
    assert out["dropped_versions"] == 2
    assert not [
        n for n in os.listdir(os.path.join(root, "_snapshots"))
        if n.endswith(".files.parquet")
    ]
    assert _rows(read_table(spark, root)) == [(9, "z")]


def test_delete_where_is_file_granular_cow(spark, tmp_path):
    """Predicate delete rewrites only files containing matching rows; the
    pre-image stays readable; a no-match delete is an auditable no-op
    version."""
    import json

    from marketpipe_spark.snapshots import delete_where

    root = str(tmp_path / "snap")
    _two_file_table(spark, root)  # file A: ids 1,2; file B: ids 10,11
    live = json.load(open(os.path.join(root, "_snapshots", "v2.json")))["files"]
    v3 = delete_where(spark, root, "id = 2")
    m3 = json.load(open(os.path.join(root, "_snapshots", f"v{v3}.json")))
    assert len(set(m3["files"]) & set(live)) == 1  # B carried
    assert _rows(read_table(spark, root)) == [(1, "a"), (10, "x"), (11, "y")]
    assert _rows(read_table(spark, root, version=2)) == [
        (1, "a"),
        (2, "b"),
        (10, "x"),
        (11, "y"),
    ]
    v4 = delete_where(spark, root, "id = 999")  # matches nothing
    m4 = json.load(open(os.path.join(root, "_snapshots", f"v{v4}.json")))
    assert set(m4["files"]) == set(m3["files"])
    # Column predicate form + full-file delete drops the file entirely.
    from pyspark.sql import functions as F

    delete_where(spark, root, F.col("id") >= 10)
    assert _rows(read_table(spark, root)) == [(1, "a")]


def test_restore_rolls_back_without_data_io(spark, tmp_path):
    """RESTORE re-commits an old manifest's exact file set as a new
    version — pure manifest commit, bad upsert undone, audit retained."""
    import json

    from marketpipe_spark.snapshots import restore_table

    root = str(tmp_path / "snap")
    _two_file_table(spark, root)
    upsert_table(
        spark,
        spark.createDataFrame([(2, "OOPS")], "id long, v string"),
        root,
        keys=["id"],
    )
    assert _rows(read_table(spark, root))[1] == (2, "OOPS")
    v4 = restore_table(spark, root, version=2)
    m2 = json.load(open(os.path.join(root, "_snapshots", "v2.json")))
    m4 = json.load(open(os.path.join(root, "_snapshots", f"v{v4}.json")))
    assert m4["files"] == m2["files"]  # byte-identical file set, no rewrite
    assert _rows(read_table(spark, root)) == [(1, "a"), (2, "b"), (10, "x"), (11, "y")]
    # The bad version remains readable until expiry (audit trail).
    assert _rows(read_table(spark, root, version=3))[1] == (2, "OOPS")


def test_incremental_agg_matches_recompute(spark, tmp_path):
    """IVM: base aggregate + CDC deltas == direct recompute, including
    group MIGRATION (update moves a row between groups), group VANISH
    (count reaches zero -> dropped), and NULL group values."""
    from marketpipe_spark.snapshots import incremental_agg

    root = str(tmp_path / "snap")
    write_table(
        spark.createDataFrame(
            [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 30.0), (4, None, 5.0)],
            "id long, grp string, x double",
        ),
        root,
    )
    # v2: migrate id=3 g2->g1 (g2 vanishes), update id=1 in place,
    # delete id=4 (NULL group vanishes), insert id=9 into new group g3.
    write_table(
        spark.createDataFrame(
            [(1, "g1", 11.0), (2, "g1", 20.0), (3, "g1", 30.0), (9, "g3", 1.0)],
            "id long, grp string, x double",
        ),
        root,
        mode="overwrite",
    )

    def direct(version):
        from pyspark.sql import functions as F

        return {
            r["grp"]: (float(r["s"]), r["n"])
            for r in read_table(spark, root, version=version)
            .groupBy("grp")
            .agg(
                F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }

    out = incremental_agg(
        spark, root, keys=["id"], group_cols=["grp"], sum_cols=["x"], v_from=1, v_to=2
    )
    got = {r["grp"]: (float(r["sum_x"]), r["n_rows"]) for r in out.collect()}
    assert got == direct(2)
    assert "g2" not in got and None not in got and got["g3"] == (1.0, 1)


def test_incremental_agg_base_reuse_matches(spark, tmp_path):
    """Steady-state IVM: passing the previous refresh's rows as base=
    yields the same result as recomputing the base from v_from."""
    from marketpipe_spark.snapshots import incremental_agg

    root = str(tmp_path / "snap")
    write_table(
        spark.createDataFrame(
            [(i, f"g{i % 3}", float(i)) for i in range(30)],
            "id long, grp string, x double",
        ),
        root,
    )
    upsert_table(
        spark,
        spark.createDataFrame(
            [(5, "g0", 100.0), (77, "g9", 7.0)], "id long, grp string, x double"
        ),
        root,
        keys=["id"],
    )
    from pyspark.sql import functions as F

    mv1 = (
        read_table(spark, root, version=1)
        .groupBy("grp")
        .agg(
            F.sum(F.col("x").cast("decimal(38,6)")).alias("sum_x"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    args = dict(keys=["id"], group_cols=["grp"], sum_cols=["x"], v_from=1, v_to=2)
    without = sorted(map(tuple, incremental_agg(spark, root, **args).collect()))
    with_base = sorted(
        map(tuple, incremental_agg(spark, root, **args, base=mv1).collect())
    )
    assert without == with_base
    assert any(r[0] == "g9" for r in with_base)  # new group from the insert


def test_expire_protects_in_flight_files(spark, tmp_path):
    """Default retention age: a freshly-landed unreferenced file (what an
    in-flight writer looks like mid-commit) survives expiry; with
    min_age_seconds=0 it is reclaimed."""
    from marketpipe_spark.snapshots import expire_snapshots

    root = str(tmp_path / "snap")
    write_table(spark.createDataFrame([(1, "a")], "id long, v string"), root)
    write_table(
        spark.createDataFrame([(2, "b")], "id long, v string"), root, mode="overwrite"
    )
    out = expire_snapshots(root, keep_last=1)  # default 1h age guard
    assert out["deleted_files"] == 0  # v1's file is young -> protected
    out = expire_snapshots(root, keep_last=1, min_age_seconds=0)
    assert out["deleted_files"] >= 1
    assert _rows(read_table(spark, root)) == [(2, "b")]


def test_changes_since_exactly_once_consumption(spark, tmp_path):
    """Incremental CDC consumer: first call delivers the INITIAL SNAPSHOT
    (all live rows as inserts); ack() advances the position; un-acked
    intervals replay; nothing-new returns None."""
    from marketpipe_spark.snapshots import changes_since
    from marketpipe_spark.streaming.incremental import CheckpointStore

    root = str(tmp_path / "snap")
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))
    write_table(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), root)

    df, ack = changes_since(spark, root, ["id"], "mv1", ckpt)
    # Bootstrap: the full current state arrives as inserts, so rows that
    # predate the consumer are not silently skipped.
    assert {r["id"]: r["_change"] for r in df.collect()} == {
        1: "insert",
        2: "insert",
    }
    ack()

    upsert_table(
        spark,
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        root,
        keys=["id"],
    )
    df, ack = changes_since(spark, root, ["id"], "mv1", ckpt)
    got = {r["id"]: r["_change"] for r in df.collect()}
    assert got == {2: "update", 3: "insert"}
    # Crash before ack -> same interval replays.
    df2, ack2 = changes_since(spark, root, ["id"], "mv1", ckpt)
    assert {r["id"]: r["_change"] for r in df2.collect()} == got
    ack2()
    df3, _ = changes_since(spark, root, ["id"], "mv1", ckpt)
    assert df3 is None  # caught up
    # Next commit produces only ITS interval.
    upsert_table(
        spark,
        spark.createDataFrame([(9, "z")], "id long, v string"),
        root,
        keys=["id"],
    )
    df4, ack4 = changes_since(spark, root, ["id"], "mv1", ckpt)
    assert {r["id"]: r["_change"] for r in df4.collect()} == {9: "insert"}
    # Independent consumers keep independent positions: a NEW consumer
    # bootstraps with the full current state as inserts.
    df5, _ = changes_since(spark, root, ["id"], "mv2", ckpt)
    assert {r["id"]: r["_change"] for r in df5.collect()} == {
        1: "insert",
        2: "insert",
        3: "insert",
        9: "insert",
    }
    # bootstrap="none" skips the initial snapshot: only future changes.
    df6, _ = changes_since(spark, root, ["id"], "mv3", ckpt, bootstrap="none")
    assert df6 is None
    upsert_table(
        spark,
        spark.createDataFrame([(7, "q")], "id long, v string"),
        root,
        keys=["id"],
    )
    df7, _ = changes_since(spark, root, ["id"], "mv3", ckpt, bootstrap="none")
    assert {r["id"]: r["_change"] for r in df7.collect()} == {7: "insert"}


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE removes only rows where the predicate is TRUE. Rows where
    it evaluates to NULL (e.g. NULL column vs sym = 'X') must SURVIVE —
    including rows co-located in a rewritten (affected) file, which a naive
    .where(~pred) would silently drop because ~NULL is NULL."""
    from marketpipe_spark.snapshots import delete_where

    root = str(tmp_path / "snap")
    # ONE file so every NULL row is co-located with a true match.
    df = spark.createDataFrame(
        [(1, "X"), (2, None), (3, "Y"), (4, None)], "id long, sym string"
    ).coalesce(1)
    write_table(df, root)
    delete_where(spark, root, "sym = 'X'")
    assert _rows(read_table(spark, root)) == [(2, None), (3, "Y"), (4, None)]
    # Column form, inequality: NULL <> 'Y' is NULL -> row survives too.
    from pyspark.sql import functions as F

    delete_where(spark, root, F.col("sym") != "Y")
    assert _rows(read_table(spark, root)) == [(2, None), (3, "Y"), (4, None)]


def test_changes_since_expired_checkpoint_is_descriptive(spark, tmp_path):
    """A persisted position that retention has expired raises LookupError
    with a re-bootstrap hint, not a raw missing-manifest read error."""
    import pytest

    from marketpipe_spark.snapshots import changes_since
    from marketpipe_spark.streaming.incremental import CheckpointStore

    root = str(tmp_path / "snap")
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))
    write_table(spark.createDataFrame([(1, "a")], "id long, v string"), root)
    df, ack = changes_since(spark, root, ["id"], "c1", ckpt)
    ack()  # position = v1
    for i in range(3):
        upsert_table(
            spark,
            spark.createDataFrame([(10 + i, "x")], "id long, v string"),
            root,
            keys=["id"],
        )
    expire_snapshots(root, keep_last=2, min_age_seconds=0)  # v1, v2 gone
    with pytest.raises(LookupError, match="re-bootstrap"):
        changes_since(spark, root, ["id"], "c1", ckpt)


def test_table_history_reports_commit_timestamps(spark, tmp_path):
    root = str(tmp_path / "snap")
    write_table(spark.createDataFrame([(1, "a")], "id long, v string"), root)
    write_table(spark.createDataFrame([(2, "b")], "id long, v string"), root)
    hist = table_history(root)
    stamps = [h["committed_at"] for h in hist]
    assert all(isinstance(s, str) and "T" in s for s in stamps)
    assert stamps == sorted(stamps)  # same-process commits are monotone


def test_s3sim_conditional_put_contract(tmp_path):
    """The S3 contract double itself: conditional PUT admits exactly one
    writer per key; rename is copy+delete (source gone, bytes moved);
    listings are non-lexicographic but complete."""
    import json

    from marketpipe_spark.snapshots import CommitConflict, _commit

    root = str(tmp_path / "snap")
    fs = S3SimFS()
    assert _commit(root, ["data/a.parquet"], "w1", None, fs) == 1
    with pytest.raises(CommitConflict):
        _commit(root, ["data/b.parquet"], "w2", None, fs)
    m = json.load(open(os.path.join(root, "_snapshots", "v1.json")))
    assert m["note"] == "w1" and m["files"] == ["data/a.parquet"]
    # rename = copy + delete
    src, dst = str(tmp_path / "x.bin"), str(tmp_path / "y.bin")
    fs.write_bytes(src, b"payload")
    fs.rename(src, dst)
    assert not fs.exists(src) and fs.read_bytes(dst) == b"payload"
    # listing: complete, order not promised
    names = fs.listdir(str(tmp_path))
    assert "y.bin" in names


def test_s3sim_transient_publish_failures_are_retried(spark, tmp_path):
    """A 412-storm (every publish rejected k times) is absorbed by the
    bounded backoff retry loop — the commit still lands, with exactly
    k + 1 publish attempts."""
    root = str(tmp_path / "snap")
    fs = S3SimFS(fail_publish_n=3)
    v = write_table(
        spark.createDataFrame([(1, "a")], "id long, v string"), root, fs=fs
    )
    assert v == 1 and fs.publishes == 4
    assert _rows(read_table(spark, root, fs=fs)) == [(1, "a")]


def test_s3sim_exhausted_publish_budget_raises(spark, tmp_path):
    from marketpipe_spark.snapshots import CommitConflict, _MAX_COMMIT_RETRIES

    root = str(tmp_path / "snap")
    fs = S3SimFS(fail_publish_n=_MAX_COMMIT_RETRIES + 1)
    with pytest.raises(CommitConflict, match="lost the commit race"):
        write_table(
            spark.createDataFrame([(1, "a")], "id long, v string"), root, fs=fs
        )


def test_incremental_agg_minmax_retracting_deletes(spark, tmp_path):
    """MIN/MAX maintenance across a CDC sequence engineered so deletes and
    updates RETRACT group extremes (the non-retraction-closed case): the
    incremental result must hash-equal a direct recompute, including the
    dirty-group rescan, new-group bootstrap, and AVG-from-SUM/COUNT."""
    from marketpipe_spark.snapshots import incremental_agg

    root = str(tmp_path / "snap")
    # v1: two groups. g1 min=1 max=9; g2 min=5 max=5.
    write_table(
        spark.createDataFrame(
            [(1, "g1", 1.0), (2, "g1", 9.0), (3, "g1", 4.0), (4, "g2", 5.0)],
            "id long, g string, x double",
        ),
        root,
    )
    # v2: delete g1's MAX (id=2 retracts 9.0 -> dirty max), update g1's MIN
    # away (id=1: 1.0 -> 6.0, retract-min + insert), move id=3 to a NEW
    # group g3 (group migration), leave g2 untouched.
    write_table(
        spark.createDataFrame(
            [(1, "g1", 6.0), (3, "g3", 4.0), (4, "g2", 5.0)],
            "id long, g string, x double",
        ),
        root,
        mode="overwrite",
    )
    out = incremental_agg(
        spark,
        root,
        keys=["id"],
        group_cols=["g"],
        sum_cols=["x"],
        v_from=1,
        v_to=2,
        min_cols=["x"],
        max_cols=["x"],
        avg_cols=["x"],
    )
    got = {
        r["g"]: (
            float(r["sum_x"]),
            r["n_rows"],
            r["min_x"],
            r["max_x"],
            r["avg_x"],
        )
        for r in out.collect()
    }
    assert got == {
        "g1": (6.0, 1, 6.0, 6.0, 6.0),
        "g2": (5.0, 1, 5.0, 5.0, 5.0),
        "g3": (4.0, 1, 4.0, 4.0, 4.0),
    }
    # Direct recompute parity (same expression shapes).
    from pyspark.sql import functions as F

    direct = {
        r["g"]: (
            float(r["sum_x"]),
            r["n_rows"],
            r["min_x"],
            r["max_x"],
            r["avg_x"],
        )
        for r in read_table(spark, root, version=2)
        .groupBy("g")
        .agg(
            F.sum(F.col("x").cast("decimal(38,6)")).alias("sum_x"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
        )
        .withColumn("avg_x", F.col("sum_x").cast("double") / F.col("n_rows"))
        .collect()
    }
    assert got == direct


def test_incremental_agg_minmax_steady_state_base_reuse(spark, tmp_path):
    """Steady state: the previous refresh's output (with min/max columns)
    feeds back as `base`, and a non-extreme retraction folds WITHOUT a
    rescan changing anything (the clean-branch path)."""
    from marketpipe_spark.snapshots import incremental_agg

    root = str(tmp_path / "snap")
    write_table(
        spark.createDataFrame(
            [(1, "g", 1.0), (2, "g", 5.0), (3, "g", 9.0)],
            "id long, g string, x double",
        ),
        root,
    )
    mv = incremental_agg(
        spark, root, ["id"], ["g"], ["x"], v_from=1, v_to=1,
        min_cols=["x"], max_cols=["x"],
    )
    # v2 deletes the MIDDLE value (5.0): neither extreme retracted -> clean.
    write_table(
        spark.createDataFrame(
            [(1, "g", 1.0), (3, "g", 9.0)], "id long, g string, x double"
        ),
        root,
        mode="overwrite",
    )
    out = incremental_agg(
        spark, root, ["id"], ["g"], ["x"], v_from=1, v_to=2,
        min_cols=["x"], max_cols=["x"], base=mv,
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (float(r["sum_x"]), r["n_rows"], r["min_x"], r["max_x"]) == (
        10.0,
        2,
        1.0,
        9.0,
    )


def test_incremental_agg_minmax_append_only_skips_rescan_plan(spark, tmp_path):
    """An interval whose commits only ADD files (pure appends) provably
    contains no retraction, so the MIN/MAX maintenance plan must carry
    neither the dirty-group rescan (no second v_to scan, no semi-join)
    nor the retraction union branch — metadata-only decision — while the
    result still hash-equals a direct recompute (including a new group
    and a new global extreme arriving through the appends)."""
    from pyspark.sql import functions as F

    from marketpipe_spark.snapshots import incremental_agg, read_table

    root = str(tmp_path / "snap")
    write_table(
        spark.createDataFrame(
            [(1, "g1", 3.0), (2, "g1", 7.0)], "id long, g string, x double"
        ),
        root,
    )
    # v2/v3: appends only — a new group, and a new MIN for g1.
    write_table(
        spark.createDataFrame([(3, "g2", 5.0)], "id long, g string, x double"),
        root,
        mode="append",
    )
    write_table(
        spark.createDataFrame([(4, "g1", 1.0)], "id long, g string, x double"),
        root,
        mode="append",
    )
    out = incremental_agg(
        spark, root, ["id"], ["g"], ["x"], v_from=1, v_to=3,
        min_cols=["x"], max_cols=["x"], avg_cols=["x"],
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "LeftSemi" not in plan  # no dirty-group rescan subtree
    got = {
        r["g"]: (float(r["sum_x"]), r["n_rows"], r["min_x"], r["max_x"], r["avg_x"])
        for r in out.collect()
    }
    direct = {
        r["g"]: (float(r["sum_x"]), r["n_rows"], r["min_x"], r["max_x"], r["avg_x"])
        for r in read_table(spark, root, version=3)
        .groupBy("g")
        .agg(
            F.sum(F.col("x").cast("decimal(38,6)")).alias("sum_x"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
        )
        .withColumn("avg_x", F.col("sum_x").cast("double") / F.col("n_rows"))
        .collect()
    }
    assert got == direct == {
        "g1": (11.0, 3, 1.0, 7.0, 11.0 / 3),
        "g2": (5.0, 1, 5.0, 5.0, 5.0),
    }
    # Control: the retracting-interval plan DOES carry the rescan.
    write_table(
        spark.createDataFrame(
            [(1, "g1", 3.0), (3, "g2", 5.0), (4, "g1", 1.0)],
            "id long, g string, x double",
        ),
        root,
        mode="overwrite",
    )
    out2 = incremental_agg(
        spark, root, ["id"], ["g"], ["x"], v_from=3, v_to=4,
        min_cols=["x"], max_cols=["x"],
    )
    plan2 = out2._sc._jvm.PythonSQLUtils.explainString(
        out2._jdf.queryExecution(), "formatted"
    )
    assert "LeftSemi" in plan2


def test_read_as_of_timestamp_resolution(spark, tmp_path):
    """version_as_of picks the LAST version committed at or before the
    timestamp; pre-history reads and both-pinned misuse fail loudly."""
    from marketpipe_spark.snapshots import version_as_of

    root = str(tmp_path / "snap")
    write_table(spark.createDataFrame([(1, "a")], "id long, v string"), root)
    write_table(
        spark.createDataFrame([(2, "b")], "id long, v string"), root, mode="overwrite"
    )
    hist = table_history(root)
    ts1, ts2 = hist[0]["committed_at"], hist[1]["committed_at"]
    assert version_as_of(root, ts1) == 1
    assert version_as_of(root, ts2) == 2
    assert version_as_of(root, "2999-01-01") == 2  # after everything: latest
    assert _rows(read_table(spark, root, as_of=ts1)) == [(1, "a")]
    assert _rows(read_table(spark, root, as_of=ts2)) == [(2, "b")]
    with pytest.raises(LookupError, match="committed after"):
        version_as_of(root, "2000-01-01")
    with pytest.raises(ValueError, match="not both"):
        read_table(spark, root, version=1, as_of=ts1)


def test_compact_zorder_improves_row_group_pruning(spark, tmp_path):
    """OPTIMIZE ZORDER on a snapshot table: before compaction every file
    spans the full (x, y) range (zero pruning for a box predicate); after
    compact_table(zorder=[x, y]) the files tile the key space and footer
    stats skip most row groups. Rows identical, history intact, expiry
    reclaims the pre-compaction files."""
    from pyspark.sql import functions as F

    from marketpipe_spark.snapshots import compact_table, table_skip_stats

    root = str(tmp_path / "snap")
    # Four commits, each covering the FULL x and y ranges -> every file's
    # min/max envelope contains any box: nothing skippable.
    for i in range(4):
        df = spark.range(i * 400_000, (i + 1) * 400_000).select(
            F.col("id"),
            (F.col("id") % 1000).alias("x"),
            (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("y"),
        )
        write_table(df.coalesce(1), root, mode="append")
    box = ((0, 99), (0, 99))
    before = table_skip_stats(root, "x", "y", *box)
    assert before["skip_ppm"] == 0
    rows_before = _rows(read_table(spark, root))

    v = compact_table(spark, root, zorder=["x", "y"], target_file_mb=1)
    after = table_skip_stats(root, "x", "y", *box, version=v)
    assert after["n_files"] > 1  # target_file_mb sized a real fan-out
    assert after["skip_ppm"] >= 500_000, after  # at least half now skip
    assert _rows(read_table(spark, root)) == rows_before
    hist = table_history(root)
    assert hist[-1]["version"] == v and "zorder(x,y)" in hist[-1]["note"]
    # Pre-image still readable until expiry; expiry reclaims old files.
    assert _rows(read_table(spark, root, version=v - 1)) == rows_before
    out = expire_snapshots(root, keep_last=1, min_age_seconds=0)
    assert out["deleted_files"] >= 4
    assert _rows(read_table(spark, root)) == rows_before


def test_snapshot_fsck_detects_missing_and_orphans(spark, tmp_path):
    from marketpipe_spark.snapshots import snapshot_fsck

    root = str(tmp_path / "snap")
    write_table(
        spark.createDataFrame([(1, "a")], "id long, v string").coalesce(1), root
    )
    write_table(
        spark.createDataFrame([(2, "b")], "id long, v string").coalesce(1),
        root,
        mode="overwrite",
    )
    rep = snapshot_fsck(root)
    assert rep["ok"] and rep["versions"] == 2 and rep["missing_files"] == 0
    assert rep["orphan_files"] == 0  # v1's file is still referenced by v1
    # Expire v1 but keep its (now-unreferenced) file young -> orphan.
    expire_snapshots(root, keep_last=1)  # age guard keeps the file on disk
    rep2 = snapshot_fsck(root)
    assert rep2["ok"] and rep2["versions"] == 1 and rep2["orphan_files"] >= 1
    # Delete a referenced data file out from under the store -> NOT ok.
    import json as _json

    live = _json.load(open(os.path.join(root, "_snapshots", "v2.json")))["files"]
    os.remove(os.path.join(root, live[0]))
    rep3 = snapshot_fsck(root)
    assert not rep3["ok"] and rep3["missing_files"] == 1


def test_refresh_mv_end_to_end_exactly_once(spark, tmp_path):
    """The operational MV loop: bootstrap from the initial snapshot, then
    churn-bounded refreshes against the stored view, exactly-once via the
    checkpoint; the MV hash-equals a direct recompute after every cycle."""
    from pyspark.sql import functions as F

    from marketpipe_spark.snapshots import refresh_mv
    from marketpipe_spark.streaming.incremental import CheckpointStore

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))

    def direct():
        return sorted(
            (r["g"], float(r["sum_x"]), r["n_rows"], r["min_x"])
            for r in read_table(spark, src)
            .groupBy("g")
            .agg(
                F.sum(F.col("x").cast("decimal(38,6)")).alias("sum_x"),
                F.count(F.lit(1)).alias("n_rows"),
                F.min("x").alias("min_x"),
            )
            .collect()
        )

    def mv_rows():
        return sorted(
            (r["g"], float(r["sum_x"]), r["n_rows"], r["min_x"])
            for r in read_table(spark, mv).collect()
        )

    write_table(
        spark.createDataFrame(
            [(1, "g1", 1.0), (2, "g1", 9.0), (3, "g2", 5.0)],
            "id long, g string, x double",
        ),
        src,
    )
    v = refresh_mv(
        spark, src, mv, ["id"], ["g"], ["x"], "mv1", ckpt, min_cols=["x"]
    )
    assert v == 1 and mv_rows() == direct()
    # Caught up: no new version, no MV commit.
    assert refresh_mv(spark, src, mv, ["id"], ["g"], ["x"], "mv1", ckpt, min_cols=["x"]) is None
    # Churn: delete g1's min (dirty rescan) + new group.
    write_table(
        spark.createDataFrame(
            [(2, "g1", 9.0), (3, "g2", 5.0), (4, "g3", 7.0)],
            "id long, g string, x double",
        ),
        src,
        mode="overwrite",
    )
    v2 = refresh_mv(
        spark, src, mv, ["id"], ["g"], ["x"], "mv1", ckpt, min_cols=["x"]
    )
    assert v2 == 2 and mv_rows() == direct()


def test_refresh_mv_replay_after_crash_is_idempotent(spark, tmp_path):
    """Crash BETWEEN write_table and checkpoints.save must not double-apply
    the interval on replay: recovery reads the applied source version back
    out of the MV manifest note, re-acks, and returns without touching the
    MV (regression test for the r9 exactly-once hole)."""
    from pyspark.sql import functions as F

    from marketpipe_spark.snapshots import refresh_mv
    from marketpipe_spark.streaming.incremental import CheckpointStore

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))

    write_table(
        spark.createDataFrame(
            [(1, "g1", 1.0), (2, "g1", 9.0), (3, "g2", 5.0)],
            "id long, g string, x double",
        ),
        src,
    )
    assert refresh_mv(spark, src, mv, ["id"], ["g"], ["x"], "mvc", ckpt) == 1
    # New source version, then a refresh whose ack "crashes".
    write_table(
        spark.createDataFrame([(4, "g1", 2.0)], "id long, g string, x double"),
        src,
    )

    class CrashingCkpt:
        def __init__(self, inner):
            self.inner = inner

        def last_processed(self, *a):
            return self.inner.last_processed(*a)

        def save(self, *a):
            raise RuntimeError("simulated crash before ack")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        refresh_mv(spark, src, mv, ["id"], ["g"], ["x"], "mvc", CrashingCkpt(ckpt))
    # The MV write landed (v2) but the checkpoint still points at v1.
    assert ckpt.last_processed("mvc", src) == 1

    def mv_rows():
        return sorted(
            (r["g"], float(r["sum_x"]), r["n_rows"])
            for r in read_table(spark, mv).collect()
        )

    expected = sorted(
        (r["g"], float(r["sum_x"]), r["n_rows"])
        for r in read_table(spark, src)
        .groupBy("g")
        .agg(
            F.sum(F.col("x").cast("decimal(38,6)")).alias("sum_x"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    assert mv_rows() == expected
    # Replay with a working checkpoint store: must be a metadata-only no-op
    # (no new MV version, sums NOT doubled) that recovers the ack.
    assert refresh_mv(spark, src, mv, ["id"], ["g"], ["x"], "mvc", ckpt) is None
    assert ckpt.last_processed("mvc", src) == 2
    assert mv_rows() == expected
    # And the loop continues normally afterwards.
    write_table(
        spark.createDataFrame([(5, "g3", 7.0)], "id long, g string, x double"),
        src,
    )
    assert refresh_mv(spark, src, mv, ["id"], ["g"], ["x"], "mvc", ckpt) is not None
    expected2 = sorted(
        (r["g"], float(r["sum_x"]), r["n_rows"])
        for r in read_table(spark, src)
        .groupBy("g")
        .agg(
            F.sum(F.col("x").cast("decimal(38,6)")).alias("sum_x"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    assert mv_rows() == expected2


class _CountingFS:
    """Delegating FS wrapper that counts read_text calls — the metric the
    checkpoint exists to bound."""

    def __init__(self, inner):
        self._inner = inner
        self.reads = 0

    def read_text(self, path):
        self.reads += 1
        return self._inner.read_text(path)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_manifest_checkpoint_bounds_metadata_walks(spark, tmp_path, monkeypatch):
    """With a checkpoint every 5 commits, version_as_of/table_history read
    checkpoint + suffix (reads ∝ commits since checkpoint, not history),
    and return exactly what per-manifest walks return — including after
    every checkpoint is deleted (fallback path)."""
    from marketpipe_spark import snapshots as S
    from marketpipe_spark.snapshots import version_as_of

    monkeypatch.setattr(S, "SNAPSHOT_CHECKPOINT_EVERY", 5)
    root = str(tmp_path / "snap")
    for i in range(12):
        write_table(
            spark.createDataFrame([(i, i)], "id long, x long"), root, note=f"c{i}"
        )
    fs = S._resolve_fs(root, None, None)
    names = fs.listdir(S._snap_root(root))
    assert "checkpoint-v5.json" in names and "checkpoint-v10.json" in names

    truth = [S._read_manifest(root, v, fs, hydrate=False) for v in range(1, 13)]
    hist = table_history(root)
    assert [
        (m["version"], m["parent"], m["note"], m["n_files"], m["committed_at"])
        for m in hist
    ] == [
        (t["version"], t["parent"], t["note"], t["n_files"], t.get("committed_at"))
        for t in truth
    ]

    cfs = _CountingFS(fs)
    assert version_as_of(root, truth[-1]["committed_at"], fs=cfs) == 12
    # 1 checkpoint + suffix manifests (v11, v12) — NOT 12 manifest reads.
    assert cfs.reads <= 4, f"walk read {cfs.reads} files, checkpoint not used"
    assert version_as_of(root, truth[6]["committed_at"], fs=fs) == 7

    # Remove every checkpoint: identical answers via per-manifest fallback.
    for n in fs.listdir(S._snap_root(root)):
        if n.startswith("checkpoint-"):
            fs.delete(S._join(S._snap_root(root), n))
    assert [m["version"] for m in table_history(root)] == list(range(1, 13))
    assert version_as_of(root, truth[6]["committed_at"]) == 7


def test_expire_reclaims_superseded_checkpoints(spark, tmp_path, monkeypatch):
    """Expiry keeps only the newest checkpoint; walks over the expired
    table stay correct (checkpoint entries for dropped versions are
    ignored) and fsck still reports ok."""
    from marketpipe_spark import snapshots as S
    from marketpipe_spark.snapshots import snapshot_fsck, version_as_of

    monkeypatch.setattr(S, "SNAPSHOT_CHECKPOINT_EVERY", 3)
    root = str(tmp_path / "snap")
    for i in range(11):
        write_table(
            spark.createDataFrame([(i, i)], "id long, x long"), root, note=f"c{i}"
        )
    fs = S._resolve_fs(root, None, None)
    assert S._checkpoint_versions(fs.listdir(S._snap_root(root))) == [3, 6, 9]
    expire_snapshots(root, keep_last=2, min_age_seconds=0)
    assert S._checkpoint_versions(fs.listdir(S._snap_root(root))) == [9]
    hist = table_history(root)
    assert [m["version"] for m in hist] == [10, 11]
    assert version_as_of(root, hist[-1]["committed_at"]) == 11
    rep = snapshot_fsck(root)
    assert rep["ok"] and rep["versions"] == 2


def test_refresh_mv_checkpoint_reset_after_expiry_rebuilds(spark, tmp_path):
    """The documented remedy for an expired checkpoint — reset and rebuild
    from the initial snapshot — must WORK: crash recovery may not re-ack a
    noted source version that is no longer retained (review r10: the
    unguarded recovery re-raised the same LookupError forever)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from marketpipe_spark.snapshots import expire_snapshots, refresh_mv
    from marketpipe_spark.streaming.incremental import CheckpointStore

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = CheckpointStore(spark, str(tmp_path / "ckpt"))
    for i in range(3):
        write_table(
            spark.createDataFrame([(i, f"g{i % 2}", float(i))], "id long, g string, x double"),
            src,
        )
    assert refresh_mv(spark, src, mv, ["id"], ["g"], ["x"], "mvr", ckpt) is not None
    # More commits, then expire everything but the newest: the acked
    # version (3) is gone from retention.
    for i in range(3, 6):
        write_table(
            spark.createDataFrame([(i, f"g{i % 2}", float(i))], "id long, g string, x double"),
            src,
        )
    expire_snapshots(src, keep_last=1, min_age_seconds=0)
    with _pytest.raises(LookupError, match="expired"):
        refresh_mv(spark, src, mv, ["id"], ["g"], ["x"], "mvr", ckpt)
    # The remedy: reset the checkpoint -> full rebuild, NOT the same error.
    fresh = CheckpointStore(spark, str(tmp_path / "ckpt2"))
    assert refresh_mv(spark, src, mv, ["id"], ["g"], ["x"], "mvr", fresh) is not None
    got = sorted(
        (r["g"], float(r["sum_x"]), r["n_rows"])
        for r in read_table(spark, mv).collect()
    )
    want = sorted(
        (r["g"], float(r["sum_x"]), r["n_rows"])
        for r in read_table(spark, src)
        .groupBy("g")
        .agg(
            F.sum(F.col("x").cast("decimal(38,6)")).alias("sum_x"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    assert got == want
