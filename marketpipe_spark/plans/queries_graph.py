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


# Item co-occurrence graph: parts are connected when some order contains
# both. Baskets are capped at 4 items (deterministically the lowest part
# keys) so the per-basket pair fan-out is bounded — the cap genuinely bites
# on TPC-H's 5-7-lineitem orders, so the truncation logic is exercised on
# both engines, and at 100 TB it is what stops one mega-basket from
# generating a quadratic pair blow-up.
_MAX_BASKET = 4
_BASKET_SQL = "SELECT l_orderkey AS bk, l_partkey AS item FROM lineitem"
_COOC_SQL = (
    "SELECT a.item AS u, c.item AS v FROM bcap a "
    "JOIN bcap c ON a.bk = c.bk AND a.item < c.item GROUP BY a.item, c.item"
)


def _capped(spark, sf_dir):
    """Capped order baskets as (bk, items) ARRAYS — every consumer below
    (co-occurrence edges, association rules) enumerates pairs map-side
    from the array, so the pair-row form never materializes."""
    from ..operators.baskets import capped_basket_arrays

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return capped_basket_arrays(li, "l_orderkey", "l_partkey", _MAX_BASKET)


def _triangles_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import triangle_oracle_sql

    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
{triangle_oracle_sql(_COOC_SQL)}
SELECT id AS part_key, deg, triangles, lcc_micro FROM tstats
"""


@register(
    "copurchase_triangles",
    _triangles_sql(),
    doc="degree-ordered triangle counts and local clustering coefficient per part over the capped-basket co-occurrence graph",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_triangles(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges, triangle_stats

    stats = triangle_stats(cooccurrence_edges(_capped(spark, sf_dir)))
    return stats.select(
        F.col("id").alias("part_key"), "deg", "triangles", "lcc_micro"
    )


_LPA_ITERS = 4


def _communities_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import label_propagation_oracle_sql

    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
{label_propagation_oracle_sql(_COOC_SQL, iterations=_LPA_ITERS)}
SELECT id AS part_key, label AS community FROM l{_LPA_ITERS}
"""


@register(
    "copurchase_communities",
    _communities_sql(),
    doc=f"deterministic synchronous label propagation ({_LPA_ITERS} rounds, self-vote, min-label tie-break) over the co-occurrence graph",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_communities(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges, label_propagation

    labels = label_propagation(
        cooccurrence_edges(_capped(spark, sf_dir)), iterations=_LPA_ITERS
    )
    return labels.select(
        F.col("id").alias("part_key"), F.col("label").alias("community")
    )


_KCORE_ROUNDS = 6


def _kcore_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import kcore_layers_oracle_sql

    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
{kcore_layers_oracle_sql(_COOC_SQL, rounds=_KCORE_ROUNDS)}
SELECT id AS part_key, peel_round, last_deg FROM layers
"""


@register(
    "copurchase_kcore",
    _kcore_sql(),
    doc=f"onion decomposition ({_KCORE_ROUNDS}-round peel at the data-derived average-degree threshold): peel round + decision-time degree per part — non-degenerate even when the bare core is empty",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_kcore(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges, kcore_layers

    layers = kcore_layers(
        cooccurrence_edges(_capped(spark, sf_dir)), k=None, rounds=_KCORE_ROUNDS
    )
    return layers.select(
        F.col("id").alias("part_key"), "peel_round", "last_deg"
    )


def _rules_sql() -> str:
    from ..operators.baskets import association_rules_sql

    return association_rules_sql(
        _BASKET_SQL, _MAX_BASKET, min_support=2, top_n=100
    )


@register(
    "basket_rules",
    _rules_sql(),
    doc="top-100 pairwise association rules (support/confidence/lift, integer micro-units) over capped order baskets",
    tags=("baskets", "joins", "aggregation"),
)
def q_basket_rules(spark, sf_dir):
    from ..operators.baskets import association_rules

    return association_rules(_capped(spark, sf_dir), min_support=2, top_n=100)


_REACH_HOPS = 3
_SEEDS_SQL = "SELECT DISTINCT u AS id FROM gs ORDER BY id LIMIT 10"


def _reach_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import khop_reach_oracle_sql

    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
{khop_reach_oracle_sql(_COOC_SQL, _SEEDS_SQL, hops=_REACH_HOPS)}
SELECT id AS part_key, hop FROM reach
"""


@register(
    "copurchase_reach",
    _reach_sql(),
    doc=f"BFS reachability: minimum hop distance (<= {_REACH_HOPS}) from the 10 lowest part keys over the co-occurrence graph — frontier expansion with novelty anti-joins",
    tags=("graph", "joins"),
)
def q_copurchase_reach(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges, khop_reach

    e = cooccurrence_edges(_capped(spark, sf_dir))
    nodes = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .distinct()
    )
    seeds = nodes.orderBy("id").limit(10)
    reach = khop_reach(e, seeds, hops=_REACH_HOPS)
    return reach.select(F.col("id").alias("part_key"), "hop")


# Weighted co-occurrence: edge cost = 1e6 DIV (co-purchase count) — strongly
# co-purchased parts are "close". Integer weights keep the min-plus sums
# engine-exact.
_SSSP_ROUNDS = 4
_COOC_W_SQL = (
    "SELECT a.item AS u, c.item AS v, 1000000 // CAST(COUNT(*) AS BIGINT) AS w "
    "FROM bcap a JOIN bcap c ON a.bk = c.bk AND a.item < c.item "
    "GROUP BY a.item, c.item"
)
_SSSP_SEEDS_SQL = "SELECT DISTINCT u AS id FROM ws ORDER BY id LIMIT 10"


def _cheap_paths_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import bounded_sssp_oracle_sql

    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
{bounded_sssp_oracle_sql(_COOC_W_SQL, _SSSP_SEEDS_SQL, rounds=_SSSP_ROUNDS)}
SELECT id AS part_key, dist AS dist_micro FROM sdist
"""


@register(
    "copurchase_cheap_paths",
    _cheap_paths_sql(),
    doc=f"bounded weighted shortest paths ({_SSSP_ROUNDS}-round Bellman-Ford, min-plus integer relaxation) from the 10 lowest part keys over the count-weighted co-occurrence graph",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_cheap_paths(spark, sf_dir):
    from ..operators.graph import bounded_sssp

    from ..operators.baskets import basket_pairs

    wedges = (
        basket_pairs(_capped(spark, sf_dir))
        .groupBy("u", "v")
        .agg(F.expr("1000000 DIV CAST(COUNT(*) AS BIGINT)").alias("w"))
    )
    nodes = (
        wedges.select(F.col("u").alias("id"))
        .unionByName(wedges.select(F.col("v").alias("id")))
        .distinct()
    )
    seeds = nodes.orderBy("id").limit(10)
    dist = bounded_sssp(wedges, seeds, rounds=_SSSP_ROUNDS)
    return dist.select(F.col("id").alias("part_key"), F.col("dist").alias("dist_micro"))


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


_LP_MAX_CENTER_DEG = 32
_LP_TOP_N = 100


def _link_prediction_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import link_prediction_oracle_sql

    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
{link_prediction_oracle_sql(_COOC_SQL, max_center_deg=_LP_MAX_CENTER_DEG)}
SELECT b AS part_u, c AS part_v, cn AS common_neighbors, ra_micro, jaccard_micro
FROM lp_scored
ORDER BY ra_micro DESC, cn DESC, b, c LIMIT {_LP_TOP_N}
"""


@register(
    "copurchase_link_prediction",
    _link_prediction_sql(),
    doc=f"top-{_LP_TOP_N} predicted co-purchase links: resource-allocation / common-neighbor / Jaccard scores over non-adjacent part pairs (hub centers > deg {_LP_MAX_CENTER_DEG} excluded — the skew bound)",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_link_prediction(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges, link_prediction

    scored = link_prediction(
        cooccurrence_edges(_capped(spark, sf_dir)),
        max_center_deg=_LP_MAX_CENTER_DEG,
        top_n=_LP_TOP_N,
    )
    return scored.select(
        F.col("b").alias("part_u"),
        F.col("c").alias("part_v"),
        F.col("cn").alias("common_neighbors"),
        "ra_micro",
        "jaccard_micro",
    )


_PPR_ITERS = 4


def _ppr_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import personalized_pagerank_oracle_sql

    body = personalized_pagerank_oracle_sql(
        "SELECT * FROM gsym", "SELECT id FROM ppr_seeds", iterations=_PPR_ITERS
    )
    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
cooc AS ({_COOC_SQL}),
gsym AS (SELECT u AS src, v AS dst FROM cooc UNION ALL SELECT v AS src, u AS dst FROM cooc),
ppr_seeds AS (SELECT DISTINCT src AS id FROM gsym ORDER BY id LIMIT 10),
{body}
SELECT id AS part_key, CAST(s AS BIGINT) AS score FROM pp{_PPR_ITERS}
"""


@register(
    "copurchase_ppr",
    _ppr_sql(),
    doc=f"personalized PageRank ({_PPR_ITERS} iterations, teleport to the 10 lowest part keys) over the symmetric co-occurrence graph — seed-expansion relevance scoring",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_ppr(spark, sf_dir):
    from ..operators.baskets import basket_pairs
    from ..operators.graph import personalized_pagerank

    cooc = basket_pairs(_capped(spark, sf_dir)).distinct()
    gsym = cooc.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        cooc.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    seeds = gsym.select(F.col("src").alias("id")).distinct().orderBy("id").limit(10)
    scores = personalized_pagerank(gsym, seeds, iterations=_PPR_ITERS)
    return scores.select(
        F.col("id").alias("part_key"), F.col("score").cast("long").alias("score")
    )


_HB_ROUNDS = 3


def _harmonic_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import hyperball_oracle_sql

    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
{hyperball_oracle_sql(_COOC_SQL, rounds=_HB_ROUNDS)}
SELECT id AS part_key, ball_x1000, harmonic_x1000 FROM hb_out
"""


@register(
    "copurchase_harmonic",
    _harmonic_sql(),
    doc=f"HyperBall ({_HB_ROUNDS} rounds, m=32 HLL registers): per-part ball-size estimate and harmonic centrality over the co-occurrence graph — the sketch+graph composition that replaces all-pairs BFS at scale",
    tags=("graph", "sketch", "joins", "aggregation"),
)
def q_copurchase_harmonic(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges, hyperball_harmonic

    hb = hyperball_harmonic(
        cooccurrence_edges(_capped(spark, sf_dir)), rounds=_HB_ROUNDS
    )
    return hb.select(
        F.col("id").alias("part_key"), "ball_x1000", "harmonic_x1000"
    )


_WALKS_PER_NODE = 2
_WALK_STEPS = 4


def _walks_sql() -> str:
    from ..operators.baskets import capped_baskets_sql
    from ..operators.graph import deterministic_walks_oracle_sql

    return f"""
WITH {capped_baskets_sql(_BASKET_SQL, _MAX_BASKET)},
{deterministic_walks_oracle_sql(_COOC_SQL, walks_per_node=_WALKS_PER_NODE, steps=_WALK_STEPS)}
SELECT id AS part_key, visits FROM wk_out
"""


@register(
    "copurchase_walks",
    _walks_sql(),
    doc=f"deterministic random-walk corpus ({_WALKS_PER_NODE} walks x {_WALK_STEPS} hops from every part, md5_60 step choice): per-part visit counts — the DeepWalk/node2vec corpus generator, bit-reproducible on any engine",
    tags=("graph", "sampling", "joins"),
)
def q_copurchase_walks(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges, deterministic_walks

    wv = deterministic_walks(
        cooccurrence_edges(_capped(spark, sf_dir)),
        walks_per_node=_WALKS_PER_NODE,
        steps=_WALK_STEPS,
    )
    return wv.select(F.col("id").alias("part_key"), "visits")


# ---------------------------------------------------------------------------
# Size-3 frequent itemsets — the Apriori step up from the pairwise rules.
# Items are BRANDS (order -> distinct p_brand through lineitem ⋈ part): a
# 25-value item space, so triadic co-occurrence is dense and the support
# ranking is meaningful at every SF (partkey triples are birthday-sparse).
# Triples are enumerated map-side from the capped sorted basket array
# (TRIPLES_EXPR, C(cap, 3)-bounded); the oracle spells them as a three-way
# self-join over the capped row form — the equivalence proof of the array
# rewrite, same contract as the pair entries.

_TRI_CAP = 5
_TRI_MIN_SUPPORT = 5
_TRI_TOP_N = 50
_BRAND_BASKET_SQL = (
    "SELECT l_orderkey AS bk, p_brand AS item "
    "FROM lineitem JOIN part ON l_partkey = p_partkey"
)


def _frequent_triples_sql() -> str:
    from ..operators.baskets import frequent_triples_sql

    return frequent_triples_sql(
        _BRAND_BASKET_SQL, _TRI_CAP, min_support=_TRI_MIN_SUPPORT, top_n=_TRI_TOP_N
    )


@register(
    "frequent_brand_triples",
    _frequent_triples_sql(),
    doc=f"top-{_TRI_TOP_N} size-3 frequent brand itemsets per order basket (map-side C(cap,3) triple enumeration, three-way self-join oracle)",
    tags=("aggregation", "joins", "baskets"),
)
def q_frequent_brand_triples(spark, sf_dir):
    from ..operators.baskets import capped_basket_arrays, frequent_triples

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bb = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_orderkey", F.col("p_brand").alias("brand")
    )
    arrays = capped_basket_arrays(bb, "l_orderkey", "brand", _TRI_CAP)
    return frequent_triples(
        arrays, min_support=_TRI_MIN_SUPPORT, top_n=_TRI_TOP_N
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities over the DIRECTED customer→part purchase relation
# (customers are hubs — they point at parts; parts are authorities). The
# mean-1 integer renormalization each half-round keeps every value exact
# and bounded: with scale 1e4 even total mass concentration on one node
# keeps the normalization product N·scale·N·scale ≈ 1.2e17 < 2^63 at
# sf0.1's 35k nodes (the documented worst-case bound; real inboxes are
# deg-bounded far below it).

_HITS_ITERS = 4
_HITS_SCALE = 10_000

_HITS_EDGES_SQL = """
SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""


def _hits_sql() -> str:
    from ..operators.graph import hits_oracle_sql

    body = hits_oracle_sql(_HITS_EDGES_SQL, iterations=_HITS_ITERS, scale=_HITS_SCALE)
    chain, tail = body.rsplit("\nSELECT", 1)
    return f"""
WITH {chain},
hfin AS (SELECT{tail})
SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type,
       CAST(id // 2 AS BIGINT) AS node_key,
       hub AS hub_score, auth AS auth_score
FROM hfin
"""


@register(
    "copurchase_hits",
    _hits_sql(),
    doc=f"HITS hubs/authorities over the directed customer->part graph ({_HITS_ITERS} rounds, exact mean-1 integer renormalization, unrolled-CTE oracle)",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_hits(spark, sf_dir):
    from ..operators.graph import hits

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    sc = hits(edges, iterations=_HITS_ITERS, scale=_HITS_SCALE)
    return sc.select(
        F.when(F.col("id") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("part"))
        .alias("node_type"),
        F.expr("id DIV 2").cast("long").alias("node_key"),
        F.col("hub").alias("hub_score"),
        F.col("auth").alias("auth_score"),
    )


# ---------------------------------------------------------------------------
# WEIGHTED PageRank over the co-purchase bipartite relation: edge weight =
# purchase multiplicity (how many orders connect the customer to the
# part), both directions — mass now splits by how OFTEN a relation was
# exercised, the real-curation-graph variant (uniform pagerank treats one
# incidental purchase like a hundred repeat buys). Same 2k/2k+1 node
# namespacing, same round shape, weighted-division oracle.

_WPR_EDGES_SQL = """
SELECT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst, CAST(COUNT(*) AS BIGINT) AS w
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_custkey, l_partkey
UNION ALL
SELECT l_partkey * 2 + 1 AS src, o_custkey * 2 AS dst, CAST(COUNT(*) AS BIGINT) AS w
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_custkey, l_partkey
"""


def _wpagerank_sql() -> str:
    from ..operators.graph import pagerank_weighted_oracle_sql

    body = pagerank_weighted_oracle_sql(_WPR_EDGES_SQL, iterations=_ITERS)
    tail = f"SELECT id, s AS score FROM ws{_ITERS}"
    body = body.replace("\n" + tail, f",\nwfin AS (SELECT id, s FROM ws{_ITERS})")
    return f"""
WITH {body}
SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type,
       CAST(id // 2 AS BIGINT) AS node_key,
       CAST(s AS BIGINT) AS score
FROM wfin
"""


@register(
    "copurchase_pagerank_weighted",
    _wpagerank_sql(),
    doc=f"weighted PageRank ({_ITERS} rounds): mass splits by purchase multiplicity instead of uniformly — the real-graph variant of copurchase_pagerank",
    tags=("graph", "joins", "aggregation"),
)
def q_copurchase_pagerank_weighted(spark, sf_dir):
    from ..operators.graph import pagerank_weighted

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    fwd = pairs.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
        "w",
    )
    rev = pairs.select(
        (F.col("l_partkey") * 2 + 1).alias("src"),
        (F.col("o_custkey") * 2).alias("dst"),
        "w",
    )
    sc = pagerank_weighted(fwd.unionByName(rev), iterations=_ITERS)
    return sc.select(
        F.when(F.col("id") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("part"))
        .alias("node_type"),
        F.expr("id DIV 2").cast("long").alias("node_key"),
        F.col("score").cast("long").alias("score"),
    )
