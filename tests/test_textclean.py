"""Unit tests for text cleaning, repetition signals, and n-gram
decontamination (operators/textclean.py) on planted fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketpipe_spark.operators.textclean import (
    clean_documents,
    ngram_contamination,
    ngram_hashes,
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_clean_documents_strips_urls_and_masks_emails(spark):
    d = _docs(
        spark,
        [
            ("a", "see https://example.com/x?y=1 and http://foo.bar now"),
            ("b", "mail bob.smith+tag@corp.example.com   please"),
            ("c", "plain   text\twith\nweird   spacing"),
        ],
    )
    out = {r.doc_id: r for r in clean_documents(d).collect()}
    assert out["a"].n_urls == 2 and out["a"].n_emails == 0
    assert out["a"].clean_text == "see and now"
    assert out["b"].n_emails == 1
    assert out["b"].clean_text == "mail <EMAIL> please"
    assert out["c"].clean_text == "plain text with weird spacing"


def test_repetition_signals_flags_boilerplate(spark):
    d = _docs(
        spark,
        [
            ("spam", "buy now buy now buy now buy now"),
            ("ok", "the quick brown fox jumps over lazy dogs"),
        ],
    )
    out = {r.doc_id: r for r in repetition_signals(d).collect()}
    assert out["spam"].n_tokens == 8 and out["spam"].n_distinct_tokens == 2
    assert out["spam"].dup_token_ratio == 0.75
    assert out["spam"].top_token_frac == 0.5
    assert out["ok"].dup_token_ratio == 0.0


def test_ngram_hashes_count_and_short_doc_guard(spark):
    d = _docs(spark, [("a", "one two three four five six"), ("short", "one two three")])
    out = ngram_hashes(d, n=5).groupBy("doc_id").count().collect()
    counts = {r.doc_id: r["count"] for r in out}
    # 6 tokens -> 2 five-grams; 3 tokens -> none (guarded, not a descending sequence)
    assert counts == {"a": 2}


def test_ngram_contamination_finds_planted_leak(spark):
    train = _docs(
        spark,
        [
            ("t1", "alpha beta gamma delta epsilon zeta eta"),
            ("t2", "unrelated corpus content goes here today friends"),
        ],
    )
    test = _docs(
        spark,
        [
            # shares the 5-gram "beta gamma delta epsilon zeta" with t1
            ("leaky", "xx beta gamma delta epsilon zeta yy"),
            ("clean", "totally different words that never appeared before"),
        ],
    )
    out = {r.doc_id: r for r in ngram_contamination(train, test, n=5).collect()}
    assert out["leaky"].n_leaked >= 1
    assert out["leaky"].leak_frac > 0
    assert out["clean"].n_leaked == 0 and out["clean"].leak_frac == 0.0


def test_curate_corpus_filters_dedups_and_splits(spark):
    from marketpipe_spark.operators.textclean import curate_corpus

    long_ok = " ".join(f"tok{i}" for i in range(25))
    d = _docs(
        spark,
        [
            ("1", long_ok),
            ("2", long_ok + "  https://dup.example  "),  # same after cleaning -> dedup
            ("3", "too short"),
            ("4", "spam " * 30),  # repetitive -> filtered
            ("5", " ".join(f"w{i}" for i in range(30))),
        ],
    )
    out = curate_corpus(d, min_tokens=20).collect()
    ids = sorted(r.doc_id for r in out)
    # 3 dropped (short), 4 dropped (dup_token_ratio), 2 deduped into 1
    assert ids == ["1", "5"]
    for r in out:
        assert r.split in ("train", "val", "test")
        assert r.n_tokens >= 20 and r.fp is not None


def test_curate_cli_roundtrip(spark, tmp_path):
    from marketpipe_spark.cli import main

    src = str(tmp_path / "docs")
    dst = str(tmp_path / "curated")
    rows = [(str(i), " ".join(f"t{i}w{j}" for j in range(30)), "en") for i in range(8)]
    spark.createDataFrame(rows, "doc_id string, text string, lang string").write.parquet(src)
    assert main(["curate", src, dst]) == 0
    back = spark.read.parquet(dst)
    assert back.count() == 8
    assert {"doc_id", "lang", "split", "n_tokens", "text"} <= set(back.columns)


def test_clean_then_signals_compose(spark):
    d = _docs(spark, [("a", "spam spam https://x.io spam  spam")])
    cleaned = clean_documents(d).select("doc_id", F.col("clean_text").alias("text"))
    sig = repetition_signals(cleaned).collect()[0]
    assert sig.n_tokens == 4 and sig.n_distinct_tokens == 1
    assert sig.dup_token_ratio == 0.75


# ---------------------------------------------------------------------------
# SymSpell edit-distance-1 pairs

def test_edit1_pairs_finds_planted_typos(spark):
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.dedup import edit1_token_pairs

    toks = spark.createDataFrame(
        [("kitchen",), ("kitchen",), ("kitchn",), ("kitchenz",), ("mitchen",),
         ("banana",), ("bananas",), ("orange",), ("zebra",)],
        "tok string",
    )
    got = {
        (r["tok_a"], r["tok_b"])
        for r in edit1_token_pairs(toks, "tok").collect()
    }
    assert ("kitchen", "kitchn") in got      # deletion
    assert ("kitchen", "kitchenz") in got    # insertion
    assert ("kitchen", "mitchen") in got     # substitution
    assert ("banana", "bananas") in got
    assert all(a != b for a, b in got)
    assert not any("orange" in p or "zebra" in p for p in got)


def test_edit1_pairs_no_cross_join_plan(spark):
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.dedup import edit1_token_pairs

    toks = spark.createDataFrame([("abcd",), ("abce",)], "tok string")
    plan = edit1_token_pairs(toks, "tok")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ngram_contamination_family_equivalent_leaks(spark):
    """xxhash64 (production) and md5_60 (oracle-verification) families find
    the same leaked-gram counts — only the hash space differs."""
    from marketpipe_spark.operators.textclean import ngram_contamination

    train = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "q r s t u v w x")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [(10, "a b c d e z z z"), (11, "m n o p q q q q")], "doc_id long, text string"
    )
    md5 = {r.doc_id: (r.n_grams, r.n_leaked) for r in ngram_contamination(train, test, n=5).collect()}
    xxh = {
        r.doc_id: (r.n_grams, r.n_leaked)
        for r in ngram_contamination(train, test, n=5, family="xxhash64").collect()
    }
    assert md5 == xxh
    assert md5[10] == (4, 1)  # "a b c d e" leaked from train doc 1


def test_duplicated_spans_flags_cross_doc_spans_only(spark):
    from marketpipe_spark.operators.textclean import duplicated_spans

    shared = " ".join(f"w{i}" for i in range(20))          # 20-token span
    rows = [
        (1, shared + " tail1 " + " ".join(f"a{i}" for i in range(19))),
        (2, "head2 " + shared),                            # shares the span with doc 1
        (3, " ".join(f"b{i}" for i in range(40))),         # unique content
        (4, "too short"),                                  # < 20 tokens: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicated_spans(df, window=20).collect()}
    assert set(out) == {1, 2, 3}            # doc 4 has no windows
    assert out[3].n_dup == 0
    # doc 2 has 2 window positions, exactly one of which is the shared span
    assert out[2].n_windows == 2 and out[2].n_dup == 1
    assert out[1].n_dup >= 1                 # the shared span's position in doc 1
    assert abs(out[2].dup_frac - 0.5) < 1e-12


def test_duplicated_spans_hash_families_agree(spark):
    from marketpipe_spark.operators.textclean import duplicated_spans

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, duplicated_spans(df, window=10, hash_family="xxhash64").collect()))
    b = sorted(map(tuple, duplicated_spans(df, window=10, hash_family="md5_60").collect()))
    assert a == b


def test_scrub_pii_masks_and_counts_each_class(spark):
    from marketpipe_spark.operators.textclean import scrub_pii

    rows = [
        (1, "mail me at jo.doe+x@corp.example.org or visit 192.168.1.10"),
        (2, "card 4111-1111-1111-1111 backup 5500-0000-0000-0004 tel +44 207 946 0958"),
        (3, "nothing sensitive here"),
        (4, "a@b.io b@c.io"),  # two emails
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert (out[1].n_emails, out[1].n_ips) == (1, 1)
    assert "<EMAIL>" in out[1].scrubbed_text and "<IP>" in out[1].scrubbed_text
    assert "jo.doe" not in out[1].scrubbed_text and "192.168" not in out[1].scrubbed_text
    assert (out[2].n_cards, out[2].n_phones) == (2, 1)
    assert out[2].scrubbed_text.count("<CARD>") == 2 and "<PHONE>" in out[2].scrubbed_text
    assert (out[3].n_emails, out[3].n_cards, out[3].n_ips, out[3].n_phones) == (0, 0, 0, 0)
    assert out[3].scrubbed_text == out[3].text
    assert out[4].n_emails == 2 and out[4].scrubbed_text == "<EMAIL> <EMAIL>"


def test_scrub_pii_no_double_counting_across_classes(spark):
    from marketpipe_spark.operators.textclean import scrub_pii

    # The card digits sit inside an email local part: the email mask removes
    # them first, so the card pattern must see nothing.
    df = spark.createDataFrame(
        [(1, "x4111-1111-1111-1111@spam.example.com")], "doc_id long, text string"
    )
    r = scrub_pii(df).collect()[0]
    assert (r.n_emails, r.n_cards) == (1, 0)
    assert r.scrubbed_text == "<EMAIL>"


def test_segment_dedup_keeps_first_occurrence_and_rebuilds(spark):
    from marketpipe_spark.operators.textclean import segment_dedup

    seg = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
    rows = [
        (1, seg + " unique one two three four five six seven eight nine"),
        (2, seg),                                    # exact repeat of doc 1's first segment
        (3, "totally different words " + "x " * 6),  # no repeats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in segment_dedup(df, seg_tokens=10).collect()}
    assert out[1].n_segments == 2 and out[1].n_kept == 2
    assert out[2].n_segments == 1 and out[2].n_kept == 0 and out[2].clean_text == ""
    assert out[3].n_kept == out[3].n_segments
    assert out[1].clean_text.startswith("alpha beta")


def test_segment_dedup_partition_invariant(spark):
    from marketpipe_spark.operators.textclean import segment_dedup

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, segment_dedup(df, seg_tokens=3).collect()))
    b = sorted(map(tuple, segment_dedup(df.repartition(13), seg_tokens=3).collect()))
    assert a == b


def test_scrub_pii_idempotent(spark):
    """Scrubbing already-scrubbed text must be a no-op: replacement tokens
    contain no digits or @-addresses, so no pattern can re-fire."""
    from marketpipe_spark.operators.textclean import scrub_pii

    rows = [
        (1, "a@b.io 10.0.0.1 +1 555 123 4567 card 4111-1111-1111-1111"),
        (2, "plain text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = scrub_pii(df).select("doc_id", F.col("scrubbed_text").alias("text"))
    twice = {r.doc_id: r for r in scrub_pii(once).collect()}
    for r in twice.values():
        assert (r.n_emails, r.n_cards, r.n_ips, r.n_phones) == (0, 0, 0, 0)
        assert r.scrubbed_text == r.text


def test_training_order_deterministic_and_balanced(spark):
    from marketpipe_spark.operators.sampling import training_order

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, training_order(df, n_shards=8).collect()))
    b = sorted(map(tuple, training_order(df.repartition(11), n_shards=8).collect()))
    assert a == b  # layout-independent
    n = df.count()
    assert len(a) == n
    by_shard = {}
    for _, shard, pos in a:
        assert 0 <= shard < 8
        by_shard.setdefault(shard, []).append(pos)
    # positions are contiguous 1..len within every shard (a total order)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # uniform hashing: no shard more than 2x the fair share at n=500
    assert max(len(v) for v in by_shard.values()) < 2 * (n / 8)


def test_segment_dedup_kept_equals_distinct_segments(spark):
    """Corpus-level conservation: exactly one copy of every distinct segment
    survives, so sum(n_kept) must equal the number of distinct segment
    strings — the invariant that makes this dedup (not sampling)."""
    from marketpipe_spark.operators.textclean import segment_dedup

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = segment_dedup(df, seg_tokens=3)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]

    t = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    segs = (
        df.select(F.col("doc_id"), t.alias("t"))
        .select(
            F.explode(F.expr("sequence(0, (size(t) + 2) div 3 - 1)")).alias("i"), F.col("t")
        )
        .select(F.array_join(F.slice(F.col("t"), F.col("i") * 3 + 1, 3), " ").alias("seg"))
    )
    assert total_kept == segs.distinct().count()


def test_boilerplate_strip_drops_all_occurrences(spark):
    from marketpipe_spark.operators.textclean import boilerplate_strip

    boiler = "all rights reserved"  # 3 tokens, appears in 3 docs
    rows = [
        (1, boiler + " unique alpha beta"),
        (2, boiler + " other gamma delta"),
        (3, boiler),
        (4, "nothing shared here at all six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in boilerplate_strip(df, seg_tokens=3, max_docs=2).collect()}
    # The boilerplate segment is stripped from EVERY document (segment_dedup
    # would have kept doc 1's copy).
    for d in (1, 2, 3):
        assert out[d].n_boiler == 1, d
        assert boiler not in out[d].clean_text
    assert out[1].clean_text == "unique alpha beta"
    assert out[3].clean_text == ""
    assert out[4].n_boiler == 0
    assert out[4].clean_text == "nothing shared here at all six"
    # max_docs=3 tolerates three occurrences -> nothing stripped.
    out3 = {r.doc_id: r for r in boilerplate_strip(df, seg_tokens=3, max_docs=3).collect()}
    assert all(r.n_boiler == 0 for r in out3.values())


def test_boilerplate_strip_partition_invariant(spark):
    from marketpipe_spark.operators.textclean import boilerplate_strip

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, boilerplate_strip(df, seg_tokens=3, max_docs=2).collect()))
    b = sorted(
        map(tuple, boilerplate_strip(df.repartition(13), seg_tokens=3, max_docs=2).collect())
    )
    assert a == b
    assert any(r[2] > 0 for r in a)  # the corpus genuinely exercises the strip path


def test_dsir_weights_prefers_target_like_documents(spark):
    """DSIR (arXiv:2302.03169): documents from the target language must be
    kept at a higher rate than non-target ones, the boundary must be live
    (both keeps and drops), and the scoring must be partition-invariant."""
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.sampling import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = dsir_weights(docs, target=F.col("lang") == "en", buckets=4096)
    rows = {r.doc_id: r for r in w.collect()}
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    assert set(rows) == set(langs)

    kept_en = sum(1 for d, r in rows.items() if r.keep and langs[d] == "en")
    n_en = sum(1 for d in langs.values() if d == "en")
    kept_other = sum(1 for d, r in rows.items() if r.keep and langs[d] != "en")
    n_other = len(langs) - n_en
    assert 0 < kept_en < n_en and 0 < kept_other < n_other  # live boundary
    assert kept_en / n_en > kept_other / n_other  # target-like preferred

    w2 = dsir_weights(docs.repartition(13), target=F.col("lang") == "en", buckets=4096)
    assert sorted(map(tuple, w2.collect())) == sorted(map(tuple, w.collect()))


def test_gumbel_topk_sample_is_weighted_and_scale_shaped(spark):
    """Gumbel top-k: a dominant-weight row always wins, the set is a pure
    function of ids (partition-invariant), and the plan is
    TakeOrderedAndProject (partial per-partition top-k), not a global sort."""
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.sampling import gumbel_topk_sample

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 7, F.lit(10_000_000_000)).otherwise(F.lit(0)).alias("w_micro"),
    )
    top = gumbel_topk_sample(df, k=20, weight_micro_col="w_micro")
    ids = {r.doc_id for r in top.collect()}
    assert len(ids) == 20 and 7 in ids  # dominant logit always sampled

    ids2 = {r.doc_id for r in gumbel_topk_sample(df.repartition(13), k=20, weight_micro_col="w_micro").collect()}
    assert ids2 == ids

    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_decontaminate_spans_removes_only_covered_tokens(spark):
    """Span erasure is surgical: only tokens covered by a matched n-gram die,
    surrounding text survives, a full-duplicate train doc is fully scrubbed,
    and short docs (< n tokens) pass through untouched."""
    from marketpipe_spark.operators.textclean import decontaminate_spans

    train = spark.createDataFrame(
        [
            (1, "alpha beta THE SECRET EVAL PROMPT gamma delta"),
            (2, "the secret eval prompt"),      # exact duplicate of test content
            (3, "totally unrelated words here"),
            (4, "tiny doc"),                    # shorter than n
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(99, "the secret eval prompt appears in a benchmark")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontaminate_spans(train, test, n=4).collect()}

    assert out[1].n_removed == 4
    assert out[1].clean_text == "alpha beta gamma delta"
    assert out[2].n_removed == 4 and out[2].clean_text == ""
    assert out[3].n_removed == 0 and out[3].clean_text == "totally unrelated words here"
    assert out[4].n_removed == 0 and out[4].clean_text == "tiny doc"

    out2 = {
        r.doc_id: r for r in decontaminate_spans(train.repartition(5), test, n=4).collect()
    }
    assert {k: (v.n_removed, v.clean_text) for k, v in out.items()} == {
        k: (v.n_removed, v.clean_text) for k, v in out2.items()
    }


def test_ngram_novelty_first_doc_is_fully_novel_and_ppm_exact(spark):
    rows = [
        (1, "w1 w2 w3 w4"),          # grams: (w1 w2 w3), (w2 w3 w4) — both first here
        (2, "w1 w2 w3 w9 w9 w9"),    # 4 distinct grams; (w1 w2 w3) seen in doc 1
        (3, "zz zz"),                # < n tokens: no gram rows, absent from output
    ]
    from marketpipe_spark.operators.textclean import ngram_novelty

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_grams"], out[1]["n_novel"], out[1]["novelty_ppm"]) == (2, 2, 1_000_000)
    # doc 2 grams: w1w2w3 (old), w2w3w9 / w3w9w9 / w9w9w9 (novel) -> 3/4
    assert (out[2]["n_grams"], out[2]["n_novel"], out[2]["novelty_ppm"]) == (4, 3, 750_000)


def test_ngram_novelty_families_agree_on_ppm(spark):
    rows = [(i, f"tok{i % 3} a b c d tok{i % 2}") for i in range(12)]
    from marketpipe_spark.operators.textclean import ngram_novelty

    df = spark.createDataFrame(rows, "doc_id long, text string")
    md5 = ngram_novelty(df, n=3, family="md5_60").orderBy("doc_id").collect()
    xx = ngram_novelty(df, n=3, family="xxhash64").orderBy("doc_id").collect()
    assert [tuple(r) for r in md5] == [tuple(r) for r in xx]


def test_token_psi_flags_planted_drift_and_near_zero_when_stable(spark):
    from marketpipe_spark.operators.textclean import token_psi

    a = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(50)], "doc_id long, text string"
    )
    same = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(50, 80)], "doc_id long, text string"
    )
    shifted = spark.createDataFrame(
        [(i, "omega psi chi phi " * 5) for i in range(50, 80)], "doc_id long, text string"
    )
    stable = sum(r["psi_x1e9"] for r in token_psi(a, same).collect()) / 1e9
    drifted = sum(r["psi_x1e9"] for r in token_psi(a, shifted).collect()) / 1e9
    assert abs(stable) < 0.01
    assert drifted > 1.0  # full vocabulary replacement is extreme drift
    # every bucket row carries exact counts
    row = {r["token"]: r for r in token_psi(a, shifted).collect()}
    assert row["alpha"]["n_a"] == 250 and row["alpha"]["n_b"] == 0


def test_token_psi_other_bucket_aggregates_tail(spark):
    from marketpipe_spark.operators.textclean import token_psi

    a = spark.createDataFrame(
        [(i, " ".join(f"tail{i}_{j}" for j in range(3)) + " head head") for i in range(30)],
        "doc_id long, text string",
    )
    out = {r["token"]: r for r in token_psi(a, a, top_k=5).collect()}
    assert "__other__" in out
    # tail tokens (90 distinct, one occurrence each) all fold into __other__
    assert out["__other__"]["n_a"] >= 85
