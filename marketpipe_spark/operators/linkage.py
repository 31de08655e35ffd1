"""Record linkage — blocked nearest-neighbor fuzzy field matching.

MarketPipe's ``query`` surface is arbitrary analytical SQL over the lake
(reference: src/marketpipe/cli/query.py:11-40); entity resolution — "which
records are probably the same real-world thing" — is the classic data-
cleaning workload layered on such a store, and the one the LLM-pipeline
near-dup family (MinHash/SimHash, token_edit_pairs) does not cover: those
match LONG text by set similarity, while linkage matches SHORT structured
fields (phones, names, codes) by edit distance.

The distributed recipe is the standard blocking strategy: records are
grouped by a cheap deterministic block key (here a domain prefix), pairs
are enumerated ONLY within a block, and each record reports its nearest
neighbor by exact Levenshtein distance (deterministic (dist, id)
tie-break). Blocking is what makes it scale — O(sum of block^2) instead
of O(n^2) — and the per-block cap bounds the quadratic term the way the
LSH paths cap bucket skew: blocks larger than ``max_block`` keep their
``max_block`` lowest-id members as match CANDIDATES (deterministic, so
both engines agree), and every record still gets a match row. A 100 TB
deployment with mega-blocks should refine the block key (more prefix
digits) rather than raise the cap; the cap turns a runaway block into a
bounded computation instead of a job-killing shuffle.

``levenshtein`` is the classic unweighted edit distance in BOTH Spark
(JVM codegen, no UDF) and DuckDB, so parity is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nearest_field_match(
    df: DataFrame,
    id_col: str,
    field_col: str,
    block_col: str,
    max_block: int = 2000,
) -> DataFrame:
    """For every row, the nearest other row in its block by Levenshtein
    distance on ``field_col``.

    Returns ``(id, match_id, dist)`` — one row per input record whose
    block has at least one other member. Candidates are the block's
    ``max_block`` lowest-id members (the deterministic quadratic-term
    cap); the winner is min by ``(dist, match_id)``, a total order.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(field_col).alias("f"),
        F.col(block_col).alias("blk"),
    )
    wcap = Window.partitionBy("blk").orderBy("id")
    cand = (
        base.withColumn("rn", F.row_number().over(wcap))
        .where(F.col("rn") <= max_block)
        .select("id", "f", "blk")
    )
    # Levenshtein is symmetric, so among candidates each unordered pair is
    # scored ONCE (u < v) and mirrored — halving the edit-distance work,
    # which dominates the operator's cost. Non-candidate records (only
    # present past the cap) still score one-directionally against the
    # candidate set. Output is identical to the naive both-directions
    # join, so the oracle keeps the simple full form.
    a = cand.alias("a")
    c = cand.alias("c")
    half = a.join(
        c, (F.col("a.blk") == F.col("c.blk")) & (F.col("a.id") < F.col("c.id"))
    ).select(
        F.col("a.id").alias("id"),
        F.col("c.id").alias("match_id"),
        F.levenshtein(F.col("a.f"), F.col("c.f")).cast("long").alias("dist"),
    )
    mirrored = half.unionByName(
        half.select(
            F.col("match_id").alias("id"),
            F.col("id").alias("match_id"),
            "dist",
        )
    )
    rest = base.join(cand.select("id"), "id", "left_anti").alias("r")
    rest_pairs = rest.join(
        c, (F.col("r.blk") == F.col("c.blk")) & (F.col("r.id") != F.col("c.id"))
    ).select(
        F.col("r.id").alias("id"),
        F.col("c.id").alias("match_id"),
        F.levenshtein(F.col("r.f"), F.col("c.f")).cast("long").alias("dist"),
    )
    pairs = mirrored.unionByName(rest_pairs)
    wbest = Window.partitionBy("id").orderBy("dist", "match_id")
    return (
        pairs.withColumn("_rn", F.row_number().over(wbest))
        .where(F.col("_rn") == 1)
        .select("id", "match_id", "dist")
    )


def nearest_field_match_sql(
    src_sql: str, max_block: int = 2000
) -> str:
    """CTE list reproducing :func:`nearest_field_match`. ``src_sql`` must
    select ``id``, ``f`` (the field) and ``blk``; exposes
    ``nearest(id, match_id, dist)``."""
    return f"""lbase AS MATERIALIZED ({src_sql}),
lcand AS MATERIALIZED (
  SELECT id, f, blk FROM (
    SELECT id, f, blk, ROW_NUMBER() OVER (PARTITION BY blk ORDER BY id) AS rn
    FROM lbase
  ) WHERE rn <= {max_block}
),
lpairs AS (
  SELECT a.id AS id, c.id AS match_id,
         CAST(levenshtein(a.f, c.f) AS BIGINT) AS dist
  FROM lbase a JOIN lcand c ON a.blk = c.blk AND a.id <> c.id
),
nearest AS (
  SELECT id, match_id, dist FROM (
    SELECT id, match_id, dist,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, match_id) AS rn
    FROM lpairs
  ) WHERE rn = 1
)"""
