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
