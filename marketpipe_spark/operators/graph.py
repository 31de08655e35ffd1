"""Iterative graph centrality — PageRank over an edge list.

The registry's graph coverage so far is connectivity (``dedup_clusters``'s
min-label connected components); this adds the other canonical dataflow
graph algorithm: fixed-iteration PageRank, the scoring pass a curation
pipeline runs over a link / co-occurrence / co-purchase graph to pick
authoritative nodes (CommonCrawl-style harmonic/PageRank domain ranking).

Everything is INTEGER arithmetic so the result is bit-stable across
engines, partitionings, and summation orders (the registry's parity bar):
scores are fixed-point fractions of ``scale`` (default 1e12), every
division is truncating integer ``DIV``, and the damping split is ppm.
Doubles never appear — ``sum(score DIV deg) * damping_ppm`` reaches ~8.5e17,
past double's 2^53 exact-integer range, so float math here would not just
risk parity, it would lose real bits.

Scale design (100 TB): per iteration exactly one shuffle join of the score
vector against the (pinned) degree-annotated edge list on ``src`` plus one
hash aggregation on ``dst`` — the textbook distributed PageRank step, linear
in |E| per round with map-side partial sums. The edge list is pinned once
(``_pin``: localCheckpoint, or DISK_ONLY persist under ``MP_PIN_MODE=persist``)
and each iteration's score frame is checkpointed so plans do not nest across
rounds. No driver-side collection of nodes or edges; the only driver scalar
is |N| (one count, needed as a literal in the init/teleport expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _pin

PPM = 1_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_ppm: int = 850_000,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Returns ``(id, score)`` for every node appearing in ``edges``; scores
    are fixed-point fractions of ``scale``. Semantics (replicated literally
    by the SQL oracle):

    - ``s0(v) = scale DIV n`` for all ``n`` distinct nodes;
    - each round, ``v`` sends ``s(v) DIV outdeg(v)`` along every out-edge;
    - ``s'(u) = base + (sum of arrivals) * damping_ppm DIV 1e6`` with
      ``base = (1e6 - damping_ppm) * (scale DIV n) DIV 1e6`` (teleport);
      nodes with no in-edges keep just ``base``.

    Sink handling: nodes that appear only as ``dst`` have no out-edges and
    leak their mass (the "dangling mass is dropped" PageRank variant) —
    callers wanting the symmetric variant pass an edge list with both
    directions, as :func:`bipartite_edges` does, where no node is a sink.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = _pin(e.join(deg, "src"))
    nodes = _pin(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    s0 = scale // n
    base = (PPM - damping_ppm) * s0 // PPM

    scores = nodes.withColumn("score", F.lit(s0).cast("long"))
    for _ in range(iterations):
        arrived = (
            ed.join(scores, ed.src == scores.id)
            .select("dst", F.expr("score DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("acc"))
        )
        scores = (
            nodes.join(arrived, nodes.id == arrived.dst, "left_outer")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"coalesce(acc, 0L) * {damping_ppm} DIV {PPM}")
                ).cast("long").alias("score"),
            )
            .localCheckpoint(eager=True)
        )
    return scores


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping_ppm: int = 850_000,
    scale: int = 1_000_000_000_000,
    n_nodes_sql: str | None = None,
) -> str:
    """DuckDB CTE chain reproducing :func:`pagerank` literally, one unrolled
    CTE per iteration (``s0`` .. ``s{iterations}``). ``edges_sql`` must
    select ``src, dst``; the caller embeds the result after its own WITH
    clauses. |N| cannot be inlined as a Python literal (it depends on the
    scale factor), so ``s0``/``base`` are computed with the same integer
    expressions over a one-row ``cnt`` CTE.
    """
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "dg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, dg.deg FROM e JOIN dg USING (src))",
        "nd AS (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nd)",
        f"k AS (SELECT {scale} // n AS s0, ({PPM} - {damping_ppm}) * ({scale} // n) // {PPM} AS base FROM cnt)",
        "s0 AS (SELECT id, (SELECT s0 FROM k) AS s FROM nd)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""s{i} AS (
  SELECT nd.id,
         CAST((SELECT base FROM k)
              + COALESCE(x.acc, 0) * {damping_ppm} // {PPM} AS BIGINT) AS s
  FROM nd LEFT JOIN (
    SELECT ed.dst AS id, CAST(SUM(p.s // ed.deg) AS BIGINT) AS acc
    FROM ed JOIN s{i - 1} p ON ed.src = p.id GROUP BY ed.dst
  ) x USING (id)
)"""
        )
    return ",\n".join(parts) + f"\nSELECT id, s AS score FROM s{iterations}"


def bipartite_edges(
    pairs: DataFrame, left: str, right: str
) -> DataFrame:
    """Symmetric edge list for a bipartite relation: left nodes get even ids
    (``2*key``), right nodes odd (``2*key+1``) so the two key spaces cannot
    collide, and every pair is emitted in both directions (no sinks, so
    :func:`pagerank` conserves mass up to integer truncation)."""
    lid = (F.col(left).cast("long") * 2).alias("src")
    rid = (F.col(right).cast("long") * 2 + 1).alias("dst")
    fwd = pairs.select(lid, rid)
    rev = pairs.select(
        (F.col(right).cast("long") * 2 + 1).alias("src"),
        (F.col(left).cast("long") * 2).alias("dst"),
    )
    return fwd.unionByName(rev)
