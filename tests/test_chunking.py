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
