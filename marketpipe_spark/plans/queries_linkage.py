"""Record-linkage queries — blocked nearest-neighbor fuzzy matching.

See :mod:`marketpipe_spark.operators.linkage` for the operator and the
blocking/cap scale story.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.linkage import nearest_field_match, nearest_field_match_sql
from .registry import register, t

# Block by brand (the natural catalog block: name collisions and typos
# matter within a brand), candidates capped at the 2000 lowest-key parts
# per block. The driver's part names are short adjective+noun strings, so
# the nearest-distance distribution is genuinely mixed (exact duplicates
# at dist 0, one-edit variants, and unrelated names) — every branch of the
# match logic is live.
_PART_SRC_SQL = """
SELECT p_partkey AS id, p_name AS f, p_brand AS blk
FROM part
"""

SQL_PART_NEAREST = f"""
WITH {nearest_field_match_sql(_PART_SRC_SQL, max_block=2000)}
SELECT id AS p_partkey, match_id AS match_partkey, dist FROM nearest
"""


@register(
    "part_name_match",
    SQL_PART_NEAREST,
    doc="record linkage: each part's nearest same-brand part name by exact Levenshtein (capped blocking, deterministic (dist,id) tie-break)",
    tags=("linkage", "joins", "window"),
)
def q_part_name_match(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    src = p.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("f"),
        F.col("p_brand").alias("blk"),
    )
    out = nearest_field_match(src, "id", "f", "blk", max_block=2000)
    return out.select(
        F.col("id").alias("p_partkey"),
        F.col("match_id").alias("match_partkey"),
        "dist",
    )


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: blocked similarity pairs -> connected
# components -> one GOLDEN RECORD per entity with deterministic
# survivorship rules (canonical name = the lowest-key member's name via
# min_by — a total order; max price is order-independent). This is the
# master-data pass downstream of record linkage: part_name_match scores
# the nearest neighbor, this entry merges the epsilon-neighborhood graph
# into entities. Spark runs the iterative min-label propagation
# (dedup_clusters); the oracle computes the same components with a
# recursive CTE over the same pair predicate.

_ER_DIST = 2


def _golden_sql() -> str:
    from ..operators.linkage import blocked_similarity_pairs_sql

    src = "SELECT p_partkey AS id, p_name AS f, p_brand FROM part"
    return f"""
WITH RECURSIVE {blocked_similarity_pairs_sql(src, ["p_brand"], max_dist=_ER_DIST)},
eredges AS (SELECT id_a AS src, id_b AS dst FROM simpairs
            UNION SELECT id_b, id_a FROM simpairs),
erreach(src, dst) AS (
  SELECT src, dst FROM eredges
  UNION
  SELECT r.src, e.dst FROM erreach r JOIN eredges e ON r.dst = e.src
),
ercl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         FROM erreach GROUP BY src),
erg AS (SELECT p.p_partkey, COALESCE(ercl.cluster_id, p.p_partkey) AS entity_id,
               p.p_name, p.p_retailprice
        FROM part p LEFT JOIN ercl ON p.p_partkey = ercl.doc_id)
SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       min_by(p_name, p_partkey) AS canonical_name,
       max(p_retailprice) AS max_retail
FROM erg GROUP BY entity_id
"""


@register(
    "part_golden_records",
    _golden_sql(),
    doc=f"entity resolution: same-brand parts within Levenshtein {_ER_DIST} merged by connected components, one golden record per entity (min-key canonical, deterministic survivorship)",
    tags=("linkage", "dedup", "joins"),
)
def q_part_golden_records(spark, sf_dir):
    from ..operators.dedup import dedup_clusters
    from ..operators.linkage import blocked_similarity_pairs

    p = t(spark, sf_dir, "part")
    src = p.select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("f"), "p_brand"
    )
    pairs = blocked_similarity_pairs(src, "id", "f", ["p_brand"], max_dist=_ER_DIST)
    cl = dedup_clusters(pairs)
    g = p.join(cl, p.p_partkey == cl.doc_id, "left_outer").select(
        F.coalesce("cluster_id", "p_partkey").alias("entity_id"),
        "p_partkey",
        "p_name",
        "p_retailprice",
    )
    return g.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.expr("min_by(p_name, p_partkey)").alias("canonical_name"),
        F.max("p_retailprice").alias("max_retail"),
    )
