"""Trained-BPE tokenizer (marketpipe_spark/operators/tokenizer.py):
deterministic merge learning, lossless greedy encoding, distributed stats."""

from __future__ import annotations

from conftest import SF_ORACLE

from marketpipe_spark.operators.tokenizer import (
    EOW,
    bpe_encode_word,
    bpe_token_stats,
    bpe_token_summary,
    bpe_train,
    word_frequencies,
)


def _wf(spark, rows):
    return word_frequencies(
        spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "doc_id long, text string")
    )


def test_merges_on_known_corpus(spark):
    """Sennrich's canonical shape: a corpus dominated by 'low'-family words
    must learn 'l'+'o' (and then 'lo'+'w') among its first merges."""
    wf = _wf(spark, ["low low low lower lowest", "low lower newest widest"])
    merges = bpe_train(wf, n_merges=4)
    # 'o'+'w' and 'l'+'o' tie at 7; the lexicographic tie-break
    # deterministically picks ('o','w'), then 'l'+'ow' completes 'low'.
    assert merges[0] == ("o", "w")
    assert merges[1] == ("l", "ow")
    assert merges[2] == ("low", EOW)


def test_training_is_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    m1 = bpe_train(word_frequencies(docs.coalesce(1)), n_merges=60)
    m8 = bpe_train(word_frequencies(docs.repartition(8)), n_merges=60)
    assert m1 == m8  # exact counts + lexicographic ties ⇒ layout-independent


def test_encode_is_lossless_and_total():
    merges = [("l", "o"), ("lo", "w"), ("w", EOW)]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lowlow", "zebra", "l", "émile", "low-ish"):
        enc = bpe_encode_word(w, ranks)
        assert "".join(enc)[: -len(EOW)] == w  # lossless
        assert enc[-1].endswith(EOW)
    # ranked greed: 'low' becomes a single 'low</w>' via l+o, lo+w, w+eow?
    # merge order only allows pairs that exist after prior merges:
    assert bpe_encode_word("low", ranks) == ("low", EOW)


def test_more_merges_never_increase_tokens(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(200)
    wf = word_frequencies(docs)
    small = bpe_train(wf, n_merges=20)
    big = bpe_train(wf, n_merges=120)
    assert small == big[:20]  # merge learning is prefix-stable
    n_small = sum(r.n_tokens for r in bpe_token_stats(docs, small).collect())
    n_big = sum(r.n_tokens for r in bpe_token_stats(docs, big).collect())
    assert n_big <= n_small
    assert n_big < n_small  # 120 merges must actually compress this corpus


def test_summary_roundtrips_real_corpus(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = bpe_token_summary(docs, n_merges=80).collect()
    assert len(out) == docs.count()
    assert all(r.roundtrip_ok for r in out)
    assert all(r.n_tokens >= r.n_words for r in out)  # ≥1 token per word
