"""Snapshot table protocol: time travel, COW upsert file pruning, expiry."""

from __future__ import annotations

import os

from marketpipe_spark.snapshots import (
    expire_snapshots,
    read_table,
    table_history,
    upsert_table,
    write_table,
)


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
    out = expire_snapshots(root, keep_last=2)
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
