"""PageRank operator: golden structures, exactness, and distribution
invariants (the oracle-parity harness covers the registry entry; these pin
the operator's semantics on graphs small enough to reason about)."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketpipe_spark.operators.graph import bipartite_edges, pagerank

SCALE = 1_000_000_000_000


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def test_pagerank_star_center_dominates(spark):
    # Undirected star: center 0, leaves 1..4. Center receives from every
    # leaf; each leaf only from the center's split mass.
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    s = _scores(pagerank(df, iterations=5))
    assert len(s) == 5
    leaves = [s[i] for i in range(1, 5)]
    assert len(set(leaves)) == 1  # symmetry → identical leaf scores
    assert s[0] > 2 * leaves[0]  # hub authority


def test_pagerank_cycle_is_uniform_and_conserves_mass(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    s = _scores(pagerank(df, iterations=4))
    assert len(set(s.values())) == 1  # rotational symmetry
    # deg=1 everywhere → the only losses are the ppm damping truncations:
    # mass stays within a few ppm of scale.
    assert abs(sum(s.values()) - SCALE) < 1_000_000 * 6


def test_pagerank_matches_float_reference(spark):
    # Small directed graph vs a plain float PageRank with the same
    # teleport/damping: integer truncation must not disturb the RANKING.
    edges = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 3), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    s = _scores(pagerank(df, iterations=20))

    nodes = sorted({x for e in edges for x in e})
    deg = {n: sum(1 for a, _ in edges if a == n) for n in nodes}
    fs = {n: 1 / len(nodes) for n in nodes}
    for _ in range(20):
        nxt = {n: 0.15 / len(nodes) for n in nodes}
        for a, b in edges:
            nxt[b] += 0.85 * fs[a] / deg[a]
        fs = nxt
    assert sorted(nodes, key=lambda n: s[n]) == sorted(nodes, key=lambda n: fs[n])
    # and the values agree to ~ppm of scale (truncation is one unit per DIV)
    for n in nodes:
        # node 4 is a source (never a dst): its float mass also decays
        assert abs(s[n] / SCALE - fs[n]) < 1e-3


def test_pagerank_partition_invariant(spark):
    edges = [(i % 17, (i * 7) % 17) for i in range(200) if i % 17 != (i * 7) % 17]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = _scores(pagerank(df, iterations=3))
    b = _scores(pagerank(df.repartition(13, "dst"), iterations=3))
    assert a == b


def test_bipartite_edges_disjoint_namespaces_and_symmetry(spark):
    pairs = spark.createDataFrame([(1, 1), (1, 2), (3, 2)], "c long, p long")
    e = bipartite_edges(pairs, "c", "p")
    rows = {(r["src"], r["dst"]) for r in e.collect()}
    assert (2, 3) in rows and (3, 2) in rows  # c=1 ↔ p=1, both directions
    srcs = {s for s, _ in rows} | {d for _, d in rows}
    assert {x % 2 for x in srcs} == {0, 1}
    assert len(rows) == 6
