"""Training-data pipeline tour: raw documents → clean/curate → PII scrub →
segment dedup → near-dup dedup → decontaminate → split → tokenize →
deterministic shuffle → sharded JSONL export.

Drives the LLM-pipeline operator family end to end on the driver-provided
``documents`` table — the workflow a 100 TB corpus job would run, at toy
scale. Every step is the deterministic, shuffle-disciplined operator the
registry verifies against the DuckDB oracle; this script only composes
them.

Run it:

    python examples/training_data_pipeline.py [workdir] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marketpipe_spark.export import export_jsonl, read_jsonl  # noqa: E402
from marketpipe_spark.operators.dedup import minhash_near_duplicates  # noqa: E402
from marketpipe_spark.operators.sampling import training_order  # noqa: E402
from marketpipe_spark.operators.textclean import (  # noqa: E402
    curate_corpus,
    ngram_contamination,
    scrub_pii,
    segment_dedup,
)
from marketpipe_spark.operators.tokenizer import (  # noqa: E402
    bpe_token_stats,
    bpe_train,
    word_frequencies,
)
from marketpipe_spark.session import get_spark  # noqa: E402


def run(workdir: str, sf_dir: str = "/root/testdata/sf0.01", spark=None) -> dict:
    spark = spark or get_spark("training-data-pipeline", master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_raw = docs.count()
    print(f"\n=== 1. Raw corpus: {n_raw} documents")

    print("=== 2. Clean + quality-filter + exact-dedup + split (curate_corpus)")
    curated = curate_corpus(docs).cache()
    n_curated = curated.count()
    print(f"    survivors: {n_curated} ({n_raw - n_curated} dropped)")

    print("=== 2b. PII scrub (emails / cards / IPv4 / phones)")
    scrubbed = scrub_pii(curated, text_col="clean_text")
    n_pii = scrubbed.agg(
        F.sum(F.col("n_emails") + F.col("n_cards") + F.col("n_ips") + F.col("n_phones"))
    ).collect()[0][0]
    curated = scrubbed.drop("clean_text").withColumnRenamed("scrubbed_text", "clean_text")
    print(f"    redactions: {n_pii} (synthetic corpus carries no PII; the pass is the point)")

    print("=== 2c. Corpus-level exact segment dedup (C4 line-dedup shape)")
    seg = segment_dedup(curated, text_col="clean_text", seg_tokens=3)
    dropped_segs = seg.agg(F.sum(F.col("n_segments") - F.col("n_kept"))).collect()[0][0]
    curated = (
        curated.drop("clean_text")
        .join(seg.select("doc_id", "clean_text"), "doc_id")
        .cache()
    )
    print(f"    repeated segments removed: {dropped_segs}")

    print("=== 3. Near-duplicate pruning (MinHash+LSH, keep the smaller doc_id)")
    pairs = minhash_near_duplicates(docs, threshold=0.5)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = curated.join(losers, "doc_id", "left_anti").cache()
    print(f"    near-dup losers removed: {n_curated - deduped.count()}")

    print("=== 4. Decontamination vs a held-out eval set (word-5-gram overlap)")
    evalset = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    leaked = (
        ngram_contamination(evalset, deduped.select("doc_id", "clean_text").withColumnRenamed("clean_text", "text"), n=5)
        .filter(F.col("n_leaked") > 0)
        .select("doc_id")
    )
    clean = deduped.join(leaked, "doc_id", "left_anti").cache()
    print(f"    contaminated docs removed: {deduped.count() - clean.count()}")

    print("=== 5. Train a BPE tokenizer on the surviving corpus (120 merges)")
    corpus_text = clean.select(F.col("clean_text").alias("text"))
    wf = word_frequencies(corpus_text)
    print(f"    vocabulary: {wf.count()} distinct words (synthetic corpus — "
          "120 merges can fully tokenize it; tokens/word floors at 1.0)")
    merges = bpe_train(wf, n_merges=120)
    stats = bpe_token_stats(
        clean.select("doc_id", F.col("clean_text").alias("text")), merges
    )
    agg = stats.agg(
        F.sum("n_tokens").alias("tok"),
        F.sum("n_words").alias("words"),
        F.min(F.col("roundtrip_ok").cast("int")).alias("all_ok"),
    ).collect()[0]
    assert agg["all_ok"] == 1, "tokenizer roundtrip must be lossless"
    print(f"    {agg['tok']} tokens over {agg['words']} words "
          f"({agg['tok']/max(agg['words'],1):.2f} tokens/word), roundtrip OK")

    print("=== 6. Export sharded JSONL with a manifest, partitioned by split")
    out = os.path.join(workdir, "export")
    final = clean.select(
        "doc_id", "lang", "split", F.col("clean_text").alias("text")
    )
    print("    deterministic training order: hash-derived shard + in-shard position")
    final = final.join(training_order(final, n_shards=4), "doc_id")
    manifest = export_jsonl(final, out, max_records_per_file=200, partition_by=["split"])
    print(f"    {manifest['n_rows']} rows in {manifest['n_shards']} shards "
          f"({manifest['total_bytes']} bytes)")
    back = read_jsonl(spark, out)
    assert back.count() == manifest["n_rows"]
    per_split = {r["split"]: r["n"] for r in
                 back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"    split sizes: {json.dumps(per_split, sort_keys=True)}")

    print("=== 7. Export WebDataset-style tar shards (multimodal loader format)")
    from marketpipe_spark.export import export_webdataset

    wds = export_webdataset(
        final.drop("shard", "pos"), os.path.join(workdir, "wds"), n_shards=4
    )
    print(f"    {wds['n_rows']} rows in {wds['n_shards']} deterministic tar shards")
    assert wds["n_rows"] == manifest["n_rows"]
    return {"raw": n_raw, "exported": manifest["n_rows"], "splits": per_split}


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mp_tdp_")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    run(wd, sf)
    print("\npipeline complete.")
