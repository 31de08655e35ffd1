"""SCD-2 symbol master: normalizer dedup (W1), dense surrogate IDs (W2),
snapshot diff (J2), close-out semi-join (J1), history/latest views (W3),
partitioned rewrite (K4).

Reference pipeline (ingestion/pipeline/symbol_pipeline.py:176-235):
fetch → stage → normalize → diff vs master → SCD-2 apply → refresh views.
SQL semantics from ingestion/normalizer/symbol_normalizer.sql and
scd_writer.py.

Key reproduced invariants:
- natural_key = COALESCE(figi, ticker || '|' || exchange_mic)
  (symbol_normalizer.sql:29)
- dedup rank: ROW_NUMBER() PARTITION BY natural_key ORDER BY as_of DESC,
  provider ASC, keep 1 (symbol_normalizer.sql:25-43)
- dense IDs: ROW_NUMBER() OVER (ORDER BY natural_key) offset by current max
  (symbol_normalizer.sql:47-53, scd_writer.py:88-112), computed by
  :func:`dense_ids` — range-partition + per-partition rank + driver-summed
  offsets, so the exact global-rank semantics hold WITHOUT a
  single-partition window (scales to fact tables).
- close-out: current row (valid_to IS NULL) of an updated key gets
  valid_to = snapshot_date − 1 day (scd_writer.py:118,130-137)
- exactly one valid_to IS NULL row per id (create_symbol_views.sql:16-37)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: Attribute columns compared by the diff and carried into the master.
ATTR_COLS = [
    "symbol",
    "company_name",
    "exchange",
    "asset_type",
    "status",
    "market_cap",
    "sector",
    "industry",
    "country",
    "currency",
]


def normalize_stage(stage: DataFrame) -> DataFrame:
    """W1 — natural key + dedup rank over provider snapshots."""
    nk = F.coalesce(F.col("figi"), F.concat_ws("|", F.col("ticker"), F.col("exchange_mic")))
    w = W.partitionBy("natural_key").orderBy(F.desc("as_of"), F.asc("provider"))
    out = (
        stage.withColumn("natural_key", nk)
        .withColumn("symbol", F.upper(F.trim(F.col("ticker"))))
        .withColumn("exchange", F.col("exchange_mic"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cols = ["natural_key"] + [c for c in ATTR_COLS if c in out.columns] + ["as_of"]
    return out.select(*cols)


def diff_snapshot(snapshot: DataFrame, master_current: DataFrame) -> DataFrame:
    """J2 — classify each natural_key as insert / update / unchanged /
    (master-only keys are left open: the reference never deletes).

    Snapshot presence is tracked with an explicit marker column, NOT by
    testing payload columns for NULL — a genuine snapshot row can carry a
    NULL symbol (FIGI-keyed, no ticker) and NULL company_name (blank
    security_name, sources/symbols.py), and must still classify as
    update/unchanged rather than silently dropping as 'absent'. Attribute
    columns missing from either side (normalize_stage tolerates partial
    stages) are treated as NULL.
    """

    def attr(df: DataFrame, c: str, alias: str):
        return (F.col(c) if c in df.columns else F.lit(None)).alias(alias)

    s = snapshot.select(
        "natural_key",
        F.lit(1).alias("_s_present"),
        *[attr(snapshot, c, f"s_{c}") for c in ATTR_COLS],
        "as_of",
    )
    m = master_current.select(
        "natural_key", "id", *[attr(master_current, c, f"m_{c}") for c in ATTR_COLS]
    )
    joined = s.join(m, "natural_key", "full_outer")
    changed = None
    for c in ATTR_COLS:
        neq = ~(F.col(f"s_{c}").eqNullSafe(F.col(f"m_{c}")))
        changed = neq if changed is None else (changed | neq)
    return joined.withColumn(
        "change_type",
        F.when(F.col("id").isNull(), "insert")
        .when(F.col("_s_present").isNull(), "absent")
        .when(changed, "update")
        .otherwise("unchanged"),
    ).drop("_s_present")


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    start: int = 1,
    id_name: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense sequential ranks over a total order — exactly
    ``ROW_NUMBER() OVER (ORDER BY order_cols)`` + start − 1 — WITHOUT the
    single-partition global window (W2 at fact-table scale).

    Range-partition on the order keys (partition i's rows all sort before
    partition i+1's), rank within each partition in parallel, then add
    driver-computed cumulative offsets (n_partitions scalars — control
    plane). The input is pinned once (eager localCheckpoint) so the count
    pass and the rank pass see the SAME partitioning; materializing once is
    the standard cost of distributed identity assignment. ``order_cols``
    must be a total order for the result to be deterministic.
    """
    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r._pid: r.n
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return df.withColumn(id_name, F.lit(None).cast("long"))
    off_map = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = W.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn("_rk", F.row_number().over(w))
        .withColumn(id_name, (F.element_at(off_map, F.col("_pid")) + F.col("_rk") - 1).cast("long"))
        .drop("_pid", "_rk")
    )


def apply_scd2(
    master: DataFrame | None,
    snapshot: DataFrame,
    snapshot_date: dt.date,
    spark: SparkSession,
) -> DataFrame:
    """Produce the next full master state (the caller persists it with
    dynamic partition overwrite, K4).

    - inserts get new IDs offset by the current max (A13/W2)
    - updates close the current row (valid_to = snapshot_date − 1) and add a
      new current row with the same id
    - unchanged / absent rows pass through untouched
    """
    from ..schema import SYMBOLS_MASTER_SCHEMA

    snap = normalize_stage(snapshot) if "ticker" in snapshot.columns else snapshot
    if master is None:
        master = spark.createDataFrame([], SYMBOLS_MASTER_SCHEMA)

    current = master.filter(F.col("valid_to").isNull())
    history = master.filter(F.col("valid_to").isNotNull())
    d = diff_snapshot(snap, current)

    max_id = (master.agg(F.coalesce(F.max("id"), F.lit(0))).collect())[0][0]

    inserts = (
        dense_ids(d.filter(F.col("change_type") == "insert"), ["natural_key"], start=max_id + 1)
        .withColumn("id", F.col("id").cast("int"))
        .select(
            "id",
            "natural_key",
            *[F.col(f"s_{c}").alias(c) for c in ATTR_COLS],
            F.lit(snapshot_date).alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.current_timestamp().alias("created_at"),
            F.lit(snapshot_date).alias("as_of"),
        )
    )

    updated_keys = d.filter(F.col("change_type") == "update").select("natural_key", "id")
    # J1 — close out current rows of updated keys (semi-join + CASE WHEN)
    closed = (
        current.join(updated_keys.select("natural_key"), "natural_key", "left_semi")
        .withColumn("valid_to", F.lit(snapshot_date - dt.timedelta(days=1)))
    )
    untouched_current = current.join(
        updated_keys.select("natural_key"), "natural_key", "left_anti"
    )
    new_versions = (
        d.filter(F.col("change_type") == "update")
        .select(
            "id",
            "natural_key",
            *[F.col(f"s_{c}").alias(c) for c in ATTR_COLS],
            F.lit(snapshot_date).alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.current_timestamp().alias("created_at"),
            F.lit(snapshot_date).alias("as_of"),
        )
    )

    cols = [f.name for f in SYMBOLS_MASTER_SCHEMA.fields]

    def norm(df):
        out = df
        for f in SYMBOLS_MASTER_SCHEMA.fields:
            if f.name not in out.columns:
                out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
            else:
                out = out.withColumn(f.name, F.col(f.name).cast(f.dataType))
        return out.select(*cols)

    return (
        norm(history)
        .unionByName(norm(closed))
        .unionByName(norm(untouched_current))
        .unionByName(norm(new_versions))
        .unionByName(norm(inserts))
    )


def write_master(master: DataFrame, root: str) -> None:
    """K4 — partitioned rewrite by (year, month) of valid_from with dynamic
    partition overwrite (reference delete_matching, scd_writer.py:355-367)."""
    (
        master.withColumn("year", F.year("valid_from"))
        .withColumn("month", F.month("valid_from"))
        .repartition("year", "month")
        .write.mode("overwrite")
        .partitionBy("year", "month")
        .parquet(root)
    )


def latest_view(master: DataFrame) -> DataFrame:
    """W3 — v_symbol_latest: newest version per id AND currently valid
    (create_symbol_views.sql:16-37)."""
    w = W.partitionBy("id").orderBy(F.desc("valid_from"))
    return (
        master.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & F.col("valid_to").isNull())
        .drop("_rn")
    )


def history_view(master: DataFrame) -> DataFrame:
    """W3 — v_symbol_history: all versions ordered."""
    return master.orderBy("natural_key", "valid_from")


def null_ratios(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A9 — one-pass per-column null ratios (symbol_pipeline.py:140-170)."""
    cols = cols or df.columns
    return df.agg(
        *[F.avg(F.col(c).isNull().cast("double")).alias(f"null_ratio_{c}") for c in cols]
    )
