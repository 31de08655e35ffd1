"""Document chunking and token-budget packing — the two shaping operators a
training-data pipeline runs between cleaning and tokenization.

Both are pure JVM column expressions (array ops + windows): no UDFs, no
Python on the hot path, and both are SQL-expressible so the driver's oracle
gate checks them value-for-value.

Scale design:
- ``chunk_documents`` is map-only: each doc expands to ceil(n/stride) chunk
  rows via one ``sequence``+``transform`` — no shuffle at all.
- ``pack_documents`` assigns docs to fixed-token-budget bins with a running
  sum per shard: docs hash into ``n_shards`` independent shards and the
  greedy sequential fill runs inside each shard's window. One shuffle on
  (shard); shard count scales the parallelism, the window never sees more
  than one shard's docs. (A single global bin sequence would serialize —
  the shard key is the 100 TB knob.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

TOKEN_SPLIT_RE = r"\s+"


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 100,
    overlap: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into whitespace-token chunks of ``chunk_tokens``
    with ``overlap`` tokens of context between consecutive chunks. Emits
    (doc_id, chunk_seq, n_tokens, chunk): chunk starts at token
    1, 1+stride, ... (stride = chunk_tokens − overlap); the final chunk may
    be short."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE)
    chunks = F.expr(
        f"transform(sequence(1, size(_toks), {stride}), "
        f"s -> struct(s AS start, slice(_toks, s, {chunk_tokens}) AS toks))"
    )
    out = (
        docs.withColumn("_toks", toks)
        .filter(F.size("_toks") >= 1)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            (((F.col("c.start") - 1) / stride).cast("long") + 1).alias("chunk_seq"),
            F.size("c.toks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "c.toks").alias("chunk"),
        )
    )
    return out


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """C4-style intra-document cleaning: drop repeated lines within each
    document, keeping the FIRST occurrence in order (boilerplate headers/
    footers repeat; prose doesn't). Map-only array expression — the
    order-preserving distinct is built explicitly (first-occurrence filter),
    since engines disagree on whether their ``array_distinct`` keeps order.
    Emits the cleaned text plus before/after line counts for filter rules.
    """
    lines = F.split(F.col(text_col), F.lit(sep))
    kept = F.expr(
        f"filter(transform(sequence(1, size(_lines)), "
        f"i -> CASE WHEN array_position(slice(_lines, 1, i-1), element_at(_lines, i)) = 0 "
        f"THEN element_at(_lines, i) END), x -> x IS NOT NULL)"
    )
    return (
        docs.withColumn("_lines", lines)
        .withColumn("_kept", kept)
        .select(
            F.col(id_col),
            F.concat_ws(sep, "_kept").alias("cleaned_text"),
            F.size("_lines").cast("long").alias("n_lines"),
            F.size("_kept").cast("long").alias("n_unique_lines"),
        )
    )


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_mode: str = "hash",
) -> DataFrame:
    """Offset-based sequential packing — the concat-then-slice semantics LLM
    trainers use: per shard, docs (ordered by id) concatenate into one
    virtual token stream and each doc belongs to the budget-sized bin
    containing its start offset (a bin may overrun by one doc's tail, like
    sequence packing before truncation). Returns per-bin stats
    (shard, bin_seq, n_docs, total_tokens, first_doc, last_doc).

    ``shard_mode``: 'hash' (xxhash64, default — robust to skewed id ranges)
    or 'mod' (id % n_shards — reproducible in any engine; what the oracle
    uses)."""
    n_tok = F.size(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE)).cast("long")
    shard = (
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        if shard_mode == "hash"
        else F.pmod(F.col(id_col), F.lit(n_shards))
    )
    d = docs.select(
        F.col(id_col),
        shard.alias("shard"),
        F.least(n_tok, F.lit(budget)).alias("n_tokens"),  # oversized docs clamp to one bin
    )
    w = W.partitionBy("shard").orderBy(id_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    # bin boundary whenever the cumulative total crosses a budget multiple:
    # bin = floor((cumsum - n_tokens) / budget) of the PRE-doc total
    binned = d.withColumn("_cum", F.sum("n_tokens").over(w)).select(
        id_col,
        "shard",
        "n_tokens",
        (((F.col("_cum") - F.col("n_tokens")) / budget).cast("long")).alias("bin_seq"),
    )
    return binned.groupBy("shard", "bin_seq").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
