"""Bucketed tables — shuffle-free co-located joins for the lake's big×big
join pairs.

Broadcast handles small dims; when BOTH join sides are huge (lineitem ×
orders at 100 TB, bars × bars self-joins), the win is to pre-shuffle ONCE at
write time: bucket both tables by the join key into the same bucket count,
and every subsequent equi-join on that key runs with zero exchanges — each
task reads bucket i of both sides. The write pays one shuffle; every later
join is free. This is the 100 TB answer to "this join shuffles 100 TB every
night".

Spark specifics: bucketing requires the session catalog (``saveAsTable``);
``sortBy`` within buckets additionally removes the join's sort step
(sort-merge join reads pre-sorted buckets). Both sides must agree on bucket
count and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table keyed
    for future co-located joins on ``bucket_col``."""
    tune(df.sparkSession)
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the plan contains NO exchange on either side (verified in
    tests via the physical plan)."""
    tune(spark)
    return spark.table(left_table).join(spark.table(right_table), on)


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys — multi-dimensional data clustering.
#
# Bucketing co-locates ONE key; sorting files by a Z-order interleave of TWO
# keys keeps rows close in BOTH dimensions, so parquet min/max footer stats
# prune files for predicates on either column (the Delta/Iceberg OPTIMIZE
# ZORDER technique, reproduced here as a pure column expression). At 100 TB:
# `df.repartitionByRange(N, z).sortWithinPartitions(z)` then write — every
# file covers a small rectangle of (x, y) space instead of a full-width
# stripe, turning full scans into a handful of file reads for point/range
# predicates on either dimension.

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: Morton code
    z = y_b x_b ... y_1 x_1 y_0 x_0. Pure codegen'd bit math (no UDF, no
    shuffle); engine-portable — the same shift/mask formula runs in any
    SQL dialect with `&`, `|`, `<<`, `>>` (see queries_bars.zorder SQL)."""
    out = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = xb.bitwiseOR(yb)
        out = term if out is None else out.bitwiseOR(term)
    return out


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton interleave as portable SQL text (DuckDB/ANSI)."""
    terms = [
        f"((({x} >> {i}) & 1) << {2 * i}) | ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet laid out in Z-order over ``(x_col, y_col)``
    — the OPTIMIZE ZORDER step, done at write time: range-partition on the
    Morton key (``n_files`` contiguous z-ranges), sort within each file,
    drop the key. Every file/row-group then covers a small rectangle of
    (x, y) space, so parquet footer min/max stats prune reads for
    range/point predicates on EITHER column — not just the leading sort
    key. Measure the effect with :func:`row_group_skip_stats`.

    One range exchange + per-file sort at write time; reads are where the
    payoff lands (at 100 TB, a nightly layout job buys every downstream
    scan its pruning). Columns must be non-negative ints that fit
    ``bits`` bits (scale/offset floats and timestamps into bucket ids
    first, e.g. ``(ts_ns / 3.6e12)`` hour buckets).
    """
    tune(df.sparkSession)
    z = zorder_key(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def row_group_skip_stats(
    path: str,
    x_col: str,
    y_col: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
) -> dict:
    """How much a box predicate ``x BETWEEN .. AND y BETWEEN ..`` can skip
    under the current file layout: reads ONLY parquet footers (control
    plane — no data I/O) and counts row groups whose [min, max] envelope
    misses the box on either dimension. Returns totals + the skippable
    fraction in parts-per-million (integer, engine-exact).

    This is the measurement behind :func:`write_zordered`: a layout is
    only as good as the row groups it lets a reader skip.
    """
    import os

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    total = skippable = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(len(md.schema))}
        for rg in range(md.num_row_groups):
            total += 1
            keep = True
            for col, (lo, hi) in ((x_col, x_range), (y_col, y_range)):
                st = md.row_group(rg).column(names[col]).statistics
                if st is not None and (st.max < lo or st.min > hi):
                    keep = False
                    break
            if not keep:
                skippable += 1
    return {
        "n_files": len(files),
        "n_row_groups": total,
        "n_skippable": skippable,
        "skip_ppm": (skippable * 1_000_000) // max(total, 1),
    }


def zorder_key_n(cols: list[Column], bits: int = 16) -> Column:
    """N-column Morton interleave: bit ``i`` of column ``j`` lands at output
    position ``i*n + j`` (round-robin across columns — the 2-column case
    reduces exactly to :func:`zorder_key`). ``n * bits`` must fit 63 bits,
    so e.g. 4 columns × 15 bits. Pure codegen'd bit math; the same formula
    is expressible in any SQL dialect with shifts (cf. zorder_key_sql).

    Use with :func:`write_zordered_n` to cluster a lake table for
    predicates on ANY of 3-4 dimensions (symbol bucket, day, user bucket)
    — the N-dimensional generalization of the Delta/Iceberg OPTIMIZE
    ZORDER call.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key_n needs >= 2 columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits = {n * bits} > 63 output bits")
    out = None
    for i in range(bits):
        for j, c in enumerate(cols):
            b = F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            out = b if out is None else out.bitwiseOR(b)
    return out


def write_zordered_n(
    df: DataFrame,
    path: str,
    z_cols: list[str],
    bits: int = 15,
    n_files: int = 16,
) -> None:
    """:func:`write_zordered` over N columns (see :func:`zorder_key_n`)."""
    tune(df.sparkSession)
    z = zorder_key_n([F.col(c) for c in z_cols], bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
