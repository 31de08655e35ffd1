"""Graph-centrality queries — PageRank over driver-table relations.

MarketPipe's ``query`` command accepts arbitrary analytical SQL
(reference: src/marketpipe/cli/query.py:11-40); graph scoring is the one
analytical family its engine (and plain SQL) cannot express without
iteration, so it is implemented as a driver-loop of join+agg rounds
(``operators/graph.py``) and verified against an UNROLLED DuckDB CTE chain
— the same iterative-vs-unrolled strategy ``dedup_clusters`` uses for
connected components, here extended to weighted fixed-point scores.

The graph: the customer–part co-purchase bipartite relation (distinct
(o_custkey, l_partkey) pairs through orders ⋈ lineitem), both directions,
so PageRank surfaces parts bought by well-connected customers and
customers buying widely-bought parts — the authority-scoring pass a
curation pipeline runs over, e.g., a domain–document link graph.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register, t

_ITERS = 5

_EDGES_SQL = """
SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
UNION
SELECT DISTINCT l_partkey * 2 + 1 AS src, o_custkey * 2 AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""


def _pagerank_sql() -> str:
    from ..operators.graph import pagerank_oracle_sql

    body = pagerank_oracle_sql(_EDGES_SQL, iterations=_ITERS)
    # Project the node id back to (node_type, key) — the 2k/2k+1 encoding is
    # an internal namespace trick, not an output contract.
    tail = f"SELECT id, s AS score FROM s{_ITERS}"
    body = body.replace("\n" + tail, f",\nfin AS (SELECT id, s FROM s{_ITERS})")
    return f"""
WITH {body}
SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type,
       CAST(id // 2 AS BIGINT) AS node_key,
       CAST(s AS BIGINT) AS score
FROM fin
"""


@register(
    "copurchase_pagerank",
    _pagerank_sql(),
    doc=f"integer fixed-point PageRank ({_ITERS} iterations, 0.85 damping) over the customer-part co-purchase bipartite graph",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_pagerank(spark, sf_dir):
    from ..operators.graph import bipartite_edges, pagerank

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = o.join(li, o.o_orderkey == li.l_orderkey).select("o_custkey", "l_partkey")
    scores = pagerank(bipartite_edges(pairs, "o_custkey", "l_partkey"), iterations=_ITERS)
    return scores.select(
        F.when(F.col("id") % 2 == 0, F.lit("customer")).otherwise(F.lit("part")).alias("node_type"),
        F.expr("id DIV 2").cast("long").alias("node_key"),
        F.col("score").cast("long").alias("score"),
    )
