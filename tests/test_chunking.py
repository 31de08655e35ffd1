"""Chunking + packing operators (operators/chunking.py)."""

from __future__ import annotations

import pytest

from marketpipe_spark.operators.chunking import chunk_documents, pack_documents


def test_chunk_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame([(1, text), (2, "solo")], "doc_id long, text string")
    out = sorted(chunk_documents(docs, chunk_tokens=10, overlap=3).collect(),
                 key=lambda r: (r.doc_id, r.chunk_seq))
    d1 = [r for r in out if r.doc_id == 1]
    # stride 7: starts at tokens 1, 8, 15, 22 -> 4 chunks, last is a 4-token tail
    assert [r.n_tokens for r in d1] == [10, 10, 10, 4]
    assert d1[0].chunk.split()[:3] == ["w0", "w1", "w2"]
    assert d1[1].chunk.split()[0] == "w7"  # overlap of 3: chunk 2 starts at token 8
    assert d1[0].chunk.split()[-3:] == d1[1].chunk.split()[:3]  # shared context
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk == "solo" and d2[0].n_tokens == 1


def test_chunk_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, overlap=10)


def test_pack_documents_offsets(spark):
    # one shard (mod 1): doc token counts 4, 4, 4 with budget 10
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * 4)) for i in range(3)], "doc_id long, text string"
    )
    out = {r.bin_seq: r for r in pack_documents(docs, budget=10, n_shards=1, shard_mode="mod").collect()}
    # offsets 0, 4, 8 -> all three start inside bin 0 (total 12 overruns by the tail)
    assert out[0].n_docs == 3 and out[0].total_tokens == 12

    # oversized doc clamps to the budget and owns the bins it spans
    big = spark.createDataFrame(
        [(1, " ".join(["t"] * 100)), (2, "a b")], "doc_id long, text string"
    )
    rows = pack_documents(big, budget=10, n_shards=1, shard_mode="mod").collect()
    assert sum(r.n_docs for r in rows) == 2
    assert sum(r.total_tokens for r in rows) == 12  # 100 clamped to 10, plus 2


def test_stratified_sample_properties(spark):
    from marketpipe_spark.operators.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(400)], "doc_id long, lang string"
    )
    out = stratified_sample(docs, "lang", {"en": 0.3, "de": 1.0})
    rows = out.collect()
    by_lang = {"en": 0, "de": 0}
    for r in rows:
        by_lang[r.lang] += 1
    assert by_lang["de"] == 200  # fraction 1.0 keeps everything
    assert 30 <= by_lang["en"] <= 90  # ~30% of 200, hash-uniform
    # deterministic: same call, same rows
    again = {r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.3, "de": 1.0}).collect()}
    assert {r.doc_id for r in rows} == again
    # different salt draws a different (but same-sized-ish) sample
    other = {r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.3, "de": 1.0}, salt="x").collect()}
    assert other != {r.doc_id for r in rows}


def test_split_partition_and_stability(spark):
    from marketpipe_spark.operators.sampling import with_split

    docs = spark.createDataFrame([(i, "t") for i in range(500)], "doc_id long, text string")
    out = with_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 500  # every row in exactly one split
    counts = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # stable under repartitioning
    re = {(r.doc_id, r.split) for r in with_split(docs.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert {(r.doc_id, r.split) for r in rows} == re


def test_jsonl_export_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from marketpipe_spark.export import export_jsonl, read_jsonl
    from marketpipe_spark.operators.sampling import with_split

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 else "de") for i in range(100)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "export")
    manifest = export_jsonl(
        with_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}),
        out,
        max_records_per_file=20,
        partition_by=["split"],
    )
    assert manifest["n_rows"] == 100 and manifest["n_shards"] >= 3
    assert manifest["total_bytes"] == sum(s["bytes"] for s in manifest["shards"])
    import json, os

    assert json.load(open(os.path.join(out, "_manifest.json")))["n_rows"] == 100

    back = read_jsonl(spark, out)
    assert back.count() == 100
    assert set(back.columns) == {"doc_id", "text", "lang", "split"}
    # partition column round-trips; every doc keeps its split
    orig = {r.doc_id: r.split for r in with_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert {r.doc_id: r.split for r in back.collect()} == orig


def test_dedup_lines_keeps_first_occurrence(spark):
    from marketpipe_spark.operators.chunking import dedup_lines

    text = "header\nbody one\nheader\nbody two\nfooter\nfooter"
    docs = spark.createDataFrame([(1, text), (2, "clean\ndoc")], "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_lines(docs).collect()}
    assert out[1].cleaned_text == "header\nbody one\nbody two\nfooter"
    assert out[1].n_lines == 6 and out[1].n_unique_lines == 4
    assert out[2].cleaned_text == "clean\ndoc" and out[2].n_unique_lines == 2


def test_token_budget_sample_greedy_prefix_properties(spark):
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    out = token_budget_sample(docs, budget=700).collect()
    assert out  # live selection
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        # Budget respected per group; cum_tokens is a consistent running sum.
        assert max(r.cum_tokens for r in rows) <= 700
        assert sum(r.n_tokens for r in rows) == max(r.cum_tokens for r in rows)
    # Proper subset (budget binds on this corpus: ~1.3k tokens per source).
    assert len(out) < docs.count()
    # Deterministic + refreshable: doubling the corpus with NEW ids keeps
    # every previously-selected doc whose hash prefix still fits selected.
    again = {(r.source, r.doc_id) for r in token_budget_sample(docs, budget=700).collect()}
    assert again == {(r.source, r.doc_id) for r in out}
    # Partition-invariant.
    rep = {(r.source, r.doc_id) for r in token_budget_sample(docs.repartition(7), budget=700).collect()}
    assert rep == again


def test_winnow_fingerprints_guarantee_and_density(spark):
    from marketpipe_spark.operators.dedup import winnow_fingerprints

    # Two docs sharing a long run of tokens must share a selected
    # fingerprint — the winnowing guarantee for overlaps >= window+k-1 tokens.
    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, "prefix junk words " + shared + " suffix alpha beta"),
        (2, "completely other start " + shared + " different ending here"),
        (3, "no overlap with anything else at all whatsoever today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, k=3, window=4)
    fp = {}
    for r in out.collect():
        fp.setdefault(r.doc_id, set()).add(r.gram_hash)
    assert fp[1] & fp[2], "shared 10-token run must yield a common fingerprint"
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])
    # Density: winnowing selects ~2/(w+1) of grams, far fewer than all.
    n_grams_1 = len(rows[0][1].split()) - 2
    assert len(fp[1]) < n_grams_1
    # Short doc (fewer grams than window) still emits >= 1 fingerprint.
    tiny = spark.createDataFrame([(9, "alpha beta gamma")], "doc_id long, text string")
    assert winnow_fingerprints(tiny, k=3, window=4).count() == 1
    # Partition invariance on real data.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, winnow_fingerprints(docs, k=3, window=4).collect()))
    b = sorted(map(tuple, winnow_fingerprints(docs.repartition(13), k=3, window=4).collect()))
    assert a == b


def test_nearest_centroid_label_recovers_separable_clusters(spark):
    from marketpipe_spark.operators.projection import nearest_centroid_label

    # Three well-separated synthetic classes: centroid labeling must be 100%.
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for label, base in [(0, [10.0, 0, 0, 0]), (1, [0, 10.0, 0, 0]), (2, [0, 0, 10.0, 0])]:
        for i in range(20):
            v = (np.array(base) + rng.normal(0, 0.5, 4)).tolist()
            rows.append((label * 100 + i, label, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    out = nearest_centroid_label(df).collect()
    assert len(out) == 60
    assert all(r.correct for r in out)
    assert all(r.pred_label == r.true_label for r in out)
    # Frozen-centroid mode: score AGAINST centroids fit on a subset.
    from marketpipe_spark.operators.projection import group_centroids

    cent = group_centroids(df.filter("vec_id % 2 = 0"), "label")
    out2 = nearest_centroid_label(df, centroids=cent).collect()
    assert all(r.correct for r in out2)


def test_nearest_centroid_label_internal_names_collision_proof(spark):
    # ADVICE r10: internal projected columns used to be named _vn/_c{i};
    # a caller id_col with one of those names raised an ambiguous-column
    # error. The __ncl_ prefix must make caller names like _vn/_c0 safe.
    from marketpipe_spark.operators.projection import nearest_centroid_label

    rows = [
        (i, i % 2, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    out = nearest_centroid_label(
        df.withColumnRenamed("vec_id", "_vn"), id_col="_vn"
    ).collect()
    assert len(out) == 8 and all(r.correct for r in out)
    out2 = nearest_centroid_label(
        df.withColumnRenamed("vec_id", "_c0"), id_col="_c0"
    ).collect()
    assert len(out2) == 8 and all(r.correct for r in out2)


def test_export_webdataset_roundtrip_and_determinism(spark, tmp_path):
    import hashlib
    import json as _json
    import tarfile

    from pyspark.sql import functions as F

    from marketpipe_spark.export import export_webdataset
    from marketpipe_spark.operators.sampling import training_order

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "source", "text")
        .withColumn("payload", F.encode(F.substring("text", 1, 8), "utf-8"))
    )
    out1 = str(tmp_path / "wds1")
    m = export_webdataset(docs, out1, payload_cols={"payload": "bin"}, n_shards=4)
    assert m["n_shards"] == 4 and m["n_rows"] == docs.count()

    # Read every shard back: each doc contributes a .json and a .bin member;
    # metadata round-trips; payload bytes match.
    seen = {}
    order_in_tar = {}
    for s in m["shards"]:
        with tarfile.open(f"{out1}/{s['file']}") as tar:
            names = tar.getnames()
            keys = [n[:-5] for n in names if n.endswith(".json")]
            order_in_tar[s["shard"]] = [int(k) for k in keys]
            for k in keys:
                meta = _json.loads(tar.extractfile(f"{k}.json").read())
                blob = tar.extractfile(f"{k}.bin").read()
                seen[int(k)] = (meta["lang"], meta["source"], blob)
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(seen) == set(rows)
    for k, (lang, source, blob) in seen.items():
        assert (lang, source) == (rows[k].lang, rows[k].source)
        assert blob == bytes(rows[k].payload)

    # In-shard member order IS the training_order position order.
    to = training_order(docs, n_shards=4)
    expected = {}
    for r in sorted(to.collect(), key=lambda r: (r.shard, r.pos)):
        expected.setdefault(r.shard, []).append(r.doc_id)
    assert order_in_tar == expected

    # Byte-determinism: a second export produces identical shard bytes.
    out2 = str(tmp_path / "wds2")
    export_webdataset(docs.repartition(7), out2, payload_cols={"payload": "bin"}, n_shards=4)
    for s in m["shards"]:
        h1 = hashlib.md5(open(f"{out1}/{s['file']}", "rb").read()).hexdigest()
        h2 = hashlib.md5(open(f"{out2}/{s['file']}", "rb").read()).hexdigest()
        assert h1 == h2, s["file"]
    # Manifest agrees with the filesystem.
    disk = _json.load(open(f"{out1}/_manifest.json"))
    assert disk["n_rows"] == m["n_rows"] and len(disk["shards"]) == 4


def test_read_webdataset_roundtrips_in_training_order(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from marketpipe_spark.export import export_webdataset, read_webdataset

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "text")
        .withColumn("payload", F.encode(F.substring("text", 1, 6), "utf-8"))
    )
    out = str(tmp_path / "wds")
    export_webdataset(docs, out, payload_cols={"payload": "bin"}, n_shards=3)
    back = read_webdataset(spark, out, payload_exts=("bin",))
    rows = back.collect()
    assert len(rows) == docs.count()
    orig = {str(r.doc_id): r for r in docs.collect()}
    for r in rows:
        meta = _json.loads(r.meta_json)
        assert meta["lang"] == orig[r.key].lang
        assert bytes(r.bin) == bytes(orig[r.key].payload)
    # Within-shard row order is the tar member order (training order).
    from marketpipe_spark.operators.sampling import training_order

    to = {r.doc_id: (r.shard, r.pos) for r in training_order(docs, n_shards=3).collect()}
    per_shard: dict[int, list[int]] = {}
    for r in rows:
        per_shard.setdefault(r.shard, []).append(int(r.key))
    for shard, keys in per_shard.items():
        expect = sorted((k for k in keys), key=lambda k: to[k][1])
        assert keys == expect, shard


def test_export_stream_jsonl_exactly_once_across_restart(spark, tmp_path):
    import shutil

    from pyspark.sql import functions as F

    from marketpipe_spark.export import build_manifest, export_stream_jsonl, read_jsonl

    src = str(tmp_path / "incoming")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    first = docs.filter(F.col("doc_id") % 2 == 0)
    first.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = export_stream_jsonl(stream, out, ckpt)
    q.awaitTermination()
    n1 = read_jsonl(spark, out).count()
    assert n1 == first.count()

    # More files arrive; a RESTARTED query exports only the delta.
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    q2 = export_stream_jsonl(spark.readStream.schema(docs.schema).parquet(src), out, ckpt)
    q2.awaitTermination()
    back = read_jsonl(spark, out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()  # no dupes
    # Manifest skips the streaming sink's _spark_metadata log.
    m = build_manifest(spark, out)
    assert m["n_shards"] > 0
    assert all("_spark_metadata" not in s["path"] for s in m["shards"])
    shutil.rmtree(ckpt)
