"""Snapshot-table CDC queries — the change-data-feed path oracle-verified.

These entries drive the REAL snapshot subsystem (``marketpipe_spark.
snapshots``: versioned manifests on disk, COW upsert, conditional-put
commits) end to end on driver testdata, then hand the resulting
:func:`table_changes` feed to the DuckDB oracle, which reconstructs the
same three versions declaratively from the base ``orders`` table. That
makes the whole write → upsert → overwrite → diff pipeline part of the
value-hash correctness gate, not just unit-tested.

Version recipe (deterministic in ``o_orderkey``, so both engines agree):

- **v1** = orders with ``o_orderkey % 10 <> 0`` (payload: custkey, status,
  totalprice — doubles pass through parquet untouched, hash-stable);
- **v2** = v1 upserted with the batch ``o_orderkey % 3 = 0`` whose status
  is rewritten to ``'U'`` (keys in v1 → updates; keys with ``% 10 = 0``
  → inserts);
- **v3** = overwrite of v2 filtered to ``o_orderkey % 7 <> 0`` (deletes).

``snapshot_changes`` diffs v1 → v3, so all three CDC classes are live in
one entry. The table is rebuilt under a deterministic temp root per
(session, sf_dir) — reruns start clean.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..snapshots import (
    incremental_agg,
    read_table,
    table_changes,
    upsert_table,
    write_table,
)
from .registry import register, t

_PAYLOAD = ("o_custkey", "o_orderstatus", "o_totalprice")


#: (session id, sf_dir) → (session, built root). One build per session: the
#: fixture is deterministic given sf_dir, and rebuilding on every entry call
#: would rmtree file paths a sibling entry's PREBUILT plan still references
#: (data files are uuid-named, so a rebuild is not path-stable).
_VERSIONS_CACHE: dict[tuple[int, str], tuple[object, str]] = {}


def _build_versions(spark, sf_dir: str) -> str:
    """Materialize the three-version snapshot table for ``sf_dir`` under a
    per-(session, sf_dir) temp root, once per session.

    The Spark applicationId is part of the root tag: two concurrent
    sessions pointed at the same sf_dir would otherwise share the root,
    and this function's rmtree would race the other session's reads and
    commits mid-query."""
    ckey = (id(spark), sf_dir)
    ent = _VERSIONS_CACHE.get(ckey)
    if ent is not None and ent[0] is spark:
        return ent[1]
    tag = hashlib.md5(
        f"{spark.sparkContext.applicationId}|{sf_dir}".encode()
    ).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"mp_snapshot_cdc_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    orders = t(spark, sf_dir, "orders").select("o_orderkey", *_PAYLOAD)
    write_table(
        orders.where(F.col("o_orderkey") % 10 != 0), root, mode="overwrite", note="v1"
    )
    batch = orders.where(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_orderstatus", F.lit("U")
    )
    upsert_table(spark, batch, root, keys=["o_orderkey"], note="v2 upsert")
    v2 = read_table(spark, root, version=2)
    write_table(
        v2.where(F.col("o_orderkey") % 7 != 0), root, mode="overwrite", note="v3"
    )
    _VERSIONS_CACHE[ckey] = (spark, root)
    return root


SQL_SNAPSHOT_CHANGES = """
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 0
),
batch AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
),
v2 AS (
  SELECT * FROM batch
  UNION ALL
  SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
),
v3 AS (
  SELECT * FROM v2 WHERE o_orderkey % 7 <> 0
),
diff AS (
  SELECT
    COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
    CASE
      WHEN o.o_orderkey IS NULL THEN 'insert'
      WHEN n.o_orderkey IS NULL THEN 'delete'
      WHEN NOT (o.o_custkey IS NOT DISTINCT FROM n.o_custkey
                AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
        THEN 'update'
    END AS change,
    n.o_custkey AS new_custkey,
    n.o_orderstatus AS new_status,
    n.o_totalprice AS new_totalprice
  FROM v1 o FULL OUTER JOIN v3 n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey, change, new_custkey, new_status, new_totalprice
FROM diff WHERE change IS NOT NULL
"""


@register(
    "snapshot_changes",
    SQL_SNAPSHOT_CHANGES,
    doc=(
        "change data feed across a real snapshot table (write v1, COW upsert "
        "v2, overwrite v3 on disk; diff v1->v3 covers insert/update/delete); "
        "oracle reconstructs the versions declaratively from orders"
    ),
    tags=("snapshots", "cdc", "joins"),
)
def q_snapshot_changes(spark, sf_dir):
    root = _build_versions(spark, sf_dir)
    ch = table_changes(spark, root, ["o_orderkey"], v_from=1, v_to=3)
    return ch.select(
        "o_orderkey",
        F.col("_change").alias("change"),
        F.col("_new.o_custkey").alias("new_custkey"),
        F.col("_new.o_orderstatus").alias("new_status"),
        F.col("_new.o_totalprice").alias("new_totalprice"),
    )


SQL_SNAPSHOT_INCR_AGG = """
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 0
),
batch AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
),
v2 AS (
  SELECT * FROM batch
  UNION ALL
  SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
),
v3 AS (
  SELECT * FROM v2 WHERE o_orderkey % 7 <> 0
)
SELECT o_orderstatus,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_price,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM v3 GROUP BY o_orderstatus
"""


@register(
    "snapshot_incremental_agg",
    SQL_SNAPSHOT_INCR_AGG,
    doc=(
        "incremental materialized-view maintenance: the v1 aggregate plus "
        "CDC deltas (inserts add, deletes retract, updates migrate between "
        "groups) reproduces the v3 aggregate bit-for-bit — the oracle "
        "recomputes v3 directly, so parity proves base+delta == recompute; "
        "refresh cost is churn-bounded, not table-bounded"
    ),
    tags=("snapshots", "cdc", "agg"),
)
def q_snapshot_incremental_agg(spark, sf_dir):
    root = _build_versions(spark, sf_dir)
    out = incremental_agg(
        spark,
        root,
        keys=["o_orderkey"],
        group_cols=["o_orderstatus"],
        sum_cols=["o_totalprice"],
        v_from=1,
        v_to=3,
    )
    return out.select(
        "o_orderstatus",
        F.col("sum_o_totalprice").cast("double").alias("sum_price"),
        "n_rows",
    )


SQL_SNAPSHOT_INCR_AGG_MINMAX = """
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 0
),
batch AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
),
v2 AS (
  SELECT * FROM batch
  UNION ALL
  SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
),
v3 AS (
  SELECT * FROM v2 WHERE o_orderkey % 7 <> 0
)
SELECT o_orderstatus,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_price,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS DOUBLE)
         / COUNT(*) AS avg_price
FROM v3 GROUP BY o_orderstatus
"""


@register(
    "snapshot_incremental_agg_minmax",
    SQL_SNAPSHOT_INCR_AGG_MINMAX,
    doc=(
        "incremental MV maintenance for non-retraction-closed aggregates: "
        "MIN/MAX fold inserts in directly and re-aggregate ONLY groups "
        "where a retraction hit the stored extreme (the v1->v3 sequence "
        "contains extreme-retracting deletes — v3 drops every 7th key); "
        "AVG derives from the exact decimal SUM/COUNT; the oracle "
        "recomputes v3 directly, so parity proves delta+rescan == recompute"
    ),
    tags=("snapshots", "cdc", "agg"),
)
def q_snapshot_incremental_agg_minmax(spark, sf_dir):
    root = _build_versions(spark, sf_dir)
    out = incremental_agg(
        spark,
        root,
        keys=["o_orderkey"],
        group_cols=["o_orderstatus"],
        sum_cols=["o_totalprice"],
        v_from=1,
        v_to=3,
        min_cols=["o_totalprice"],
        max_cols=["o_totalprice"],
        avg_cols=["o_totalprice"],
    )
    return out.select(
        "o_orderstatus",
        F.col("sum_o_totalprice").cast("double").alias("sum_price"),
        "n_rows",
        F.col("min_o_totalprice").alias("min_price"),
        F.col("max_o_totalprice").alias("max_price"),
        F.col("avg_o_totalprice").alias("avg_price"),
    )


SQL_SNAPSHOT_READ_AS_OF = """
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 0
),
batch AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT * FROM batch
UNION ALL
SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
"""


@register(
    "snapshot_read_as_of",
    SQL_SNAPSHOT_READ_AS_OF,
    doc=(
        "timestamp time-travel: read_table(as_of=<v2's committed_at>) must "
        "resolve to exactly version 2's file set (Delta TIMESTAMP AS OF "
        "resolution over manifest commit timestamps, metadata-only); the "
        "oracle rebuilds v2 declaratively, so parity proves the timestamp "
        "scan picks the right manifest, through a SQL-registered view"
    ),
    tags=("snapshots", "timetravel"),
)
def q_snapshot_read_as_of(spark, sf_dir):
    from ..snapshots import register_snapshot_view, table_history

    root = _build_versions(spark, sf_dir)
    ts2 = next(h["committed_at"] for h in table_history(root) if h["version"] == 2)
    # The SQL surface: register the pinned-by-timestamp snapshot as a view
    # and query it with plain spark.sql.
    register_snapshot_view(spark, root, "snap_as_of_v2", as_of=ts2)
    return spark.sql(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM snap_as_of_v2"
    )


@register(
    "stream_snapshot_cdc",
    SQL_SNAPSHOT_CHANGES,
    doc=(
        "snapshot table consumed as a REAL Structured Streaming source "
        "(PySpark Python DataSource: version-number offsets, churn-bounded "
        "file partitions, Arrow record-batch reads) drained AvailableNow "
        "from v1; per-micro-batch classification runs the SAME CDC kernel "
        "as batch table_changes — IDENTICAL oracle as snapshot_changes, so "
        "parity proves the streaming path end to end"
    ),
    tags=("snapshots", "cdc", "streaming"),
)
def q_stream_snapshot_cdc(spark, sf_dir):
    import uuid as _uuid

    from ..streaming.snapshot_source import stream_snapshot_changes

    root = _build_versions(spark, sf_dir)
    # Production sink shape: each micro-batch's classified changes land as
    # parquet (no driver round-trip); the entry reads the sink back.
    out = f"{root}_cdc_stream_{_uuid.uuid4().hex[:8]}"

    def apply(changes, _bid):
        changes.select(
            "o_orderkey",
            F.col("_change").alias("change"),
            F.col("_new.o_custkey").alias("new_custkey"),
            F.col("_new.o_orderstatus").alias("new_status"),
            F.col("_new.o_totalprice").alias("new_totalprice"),
        ).write.mode("append").parquet(out)

    stream_snapshot_changes(spark, root, ["o_orderkey"], apply, starting_version=1)
    return spark.read.parquet(out)
