"""Relational mining tour: baskets → graph analytics → skyline → linkage.

Companion to analytics_tour.py, driving the round-5 beyond-reference
operator families on a small synthetic retail dataset built in-memory:
capped market baskets, association rules, the co-occurrence graph
(triangles, communities, onion decomposition, BFS reach, weighted
shortest paths, PageRank), a Pareto frontier, and fuzzy record linkage.
Everything is deterministic and offline.

Run it:

    python examples/relational_mining_tour.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from marketpipe_spark.session import get_spark  # noqa: E402


def run(workdir: str = ".", spark=None) -> None:
    spark = spark or get_spark(
        "relational-mining-tour", master="local[4]", shuffle_partitions=4
    )

    print("\n=== 1. Synthetic baskets (40 orders over 12 products)")
    rows = []
    for bk in range(40):
        # two overlapping product communities + a bridge item
        base = [0, 1, 2, 3] if bk % 2 == 0 else [6, 7, 8, 9]
        rows += [(bk, item) for item in base[: 2 + bk % 3]]
        if bk % 5 == 0:
            rows.append((bk, 5))  # bridge product
    raw = spark.createDataFrame(rows, "bk long, item long")

    from marketpipe_spark.operators.baskets import association_rules, capped_basket_arrays

    baskets = capped_basket_arrays(raw, "bk", "item", max_basket=4)
    rules = association_rules(baskets, min_support=3, top_n=5)
    print("top association rules (support/conf/lift in micro-units):")
    rules.show(5, truncate=False)

    print("\n=== 2. Co-occurrence graph: triangles, communities, onion, reach")
    from marketpipe_spark.operators.graph import (
        bounded_sssp,
        cooccurrence_edges,
        kcore_layers,
        khop_reach,
        label_propagation,
        triangle_stats,
    )

    edges = cooccurrence_edges(baskets)
    tri = triangle_stats(edges)
    print("highest-clustering products:")
    tri.orderBy(F.desc("lcc_micro"), "id").show(5)

    comm = label_propagation(edges, iterations=4)
    n_comm = comm.select("label").distinct().count()
    print(f"label propagation found {n_comm} communities")

    layers = kcore_layers(edges, k=None, rounds=4)
    print("onion decomposition (peel round per product):")
    layers.groupBy("peel_round").count().orderBy("peel_round").show()

    seeds = edges.select(F.col("u").alias("id")).distinct().orderBy("id").limit(1)
    reach = khop_reach(edges, seeds, hops=2)
    print(f"2-hop reach from the lowest product id: {reach.count()} products")

    wedges = edges.withColumn("w", F.lit(10))
    dist = bounded_sssp(wedges, seeds, rounds=3)
    print("bounded shortest paths (weight 10 per hop):")
    dist.orderBy("dist", "id").show(5)

    print("\n=== 3. Pareto frontier: cheapest-yet-popular products")
    from marketpipe_spark.operators.skyline import skyline2d

    pop = (baskets.select(F.explode("items").alias("item"))
           .groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n_orders")))
    priced = pop.withColumn("neg_price_cents", -(F.col("item") * 37 % 500) - 100)
    frontier = skyline2d(priced, "neg_price_cents", "n_orders")
    print("frontier (maximize popularity, minimize price):")
    frontier.orderBy("item").show()

    print("\n=== 4. Record linkage: nearest product-code match")
    from marketpipe_spark.operators.linkage import nearest_field_match

    codes = priced.select(
        F.col("item").alias("id"),
        F.format_string("SKU-%03d", (F.col("item") * 7 % 100).cast("int")).alias("f"),
        F.lit("cat-A").alias("blk"),
    )
    matches = nearest_field_match(codes, "id", "f", "blk")
    print("nearest code neighbours (edit distance):")
    matches.orderBy("id").show(5)

    print("relational mining tour complete.")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else ".")
