"""Plan-hygiene sweep over the full registry.

Every driver-facing query's physical plan is checked for scale anti-
patterns: cartesian products and broadcast-nested-loop joins (both turn
into O(n^2) work at cluster scale), and row-at-a-time Python UDF
evaluation (BatchEvalPython — the non-Arrow slow path; Arrow-batched
mapInPandas/ArrowEvalPython are allowed on the beyond-reference vectorized
paths). Planning only — nothing executes, so the sweep stays cheap and
runs at the smallest scale factor.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from conftest import SF_SMOKE

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_no_scale_antipatterns_in_plan(spark, name):
    df = entry_mod.queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [b for b in BANNED if b in plan]
    assert not hits, f"{name}: banned physical operators {hits}"


def test_top_customers_broadcasts_dimension(spark):
    """The customer dim must come in as a broadcast join after the lineitem
    pre-aggregation (VERDICT r1 flagged watching this plan as SF grows —
    the pre-agg output is top-k-bounded, so broadcast must survive scale)."""
    df = entry_mod.queries()["top_customers"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dim_join_gate_both_ways(spark):
    """The size gate (VERDICT r3 item 1) must hold in BOTH directions.

    Below the gate the broadcast hint is pinned — proven by disabling the
    static broadcast threshold entirely: the join broadcasts anyway, so it
    was the hint, not Catalyst's own costing. Above the gate (simulated by
    forcing the gate to 0 bytes — what customer/part/supplier look like at
    the 100 TB design point) NO broadcast may survive: the plan must fall
    back to a shuffle join that AQE can re-plan from runtime sizes."""
    from marketpipe_spark.plans import registry

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = entry_mod.queries()["top_customers"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, "hint not applied below the gate"

        old = registry.DIM_BROADCAST_MAX_BYTES
        registry.DIM_BROADCAST_MAX_BYTES = 0
        try:
            df = entry_mod.queries()["top_customers"](spark, SF_SMOKE)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan, "broadcast pinned above the gate"
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        finally:
            registry.DIM_BROADCAST_MAX_BYTES = old
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_constant_dims_always_broadcast_above_gate(spark):
    """nation/region are constant-cardinality (25/5 rows by the data model):
    they keep the broadcast hint even when the gate is closed."""
    from marketpipe_spark.plans import registry

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    old = registry.DIM_BROADCAST_MAX_BYTES
    registry.DIM_BROADCAST_MAX_BYTES = 0
    try:
        df = entry_mod.queries()["regional_revenue"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # nation/region hints survive
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan  # customer does not
    finally:
        registry.DIM_BROADCAST_MAX_BYTES = old
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_contamination_check_never_broadcasts_train_side(spark):
    """The train-split fingerprint set is ~90% of the corpus (VERDICT r3
    item 2): no plan node may pin a broadcast of it. With the static
    threshold off, the whole query must plan broadcast-free (AQE may still
    convert at runtime when the corpus turns out small — that's the point)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = entry_mod.queries()["contamination_check"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastExchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_range_scan_pushes_ts_filter_to_parquet(spark):
    """The ts range must reach the scan as PushedFilters on the RAW column
    (row-group pruning at 100 TB). Filtering on the derived ts_ns arithmetic
    would leave PushedFilters empty — a silent full scan."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")  # plan print truncates at 100 otherwise
    df = entry_mod.queries()["range_scan"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    spark.conf.unset("spark.sql.maxMetadataStringLength")
    scan = next(line for line in plan.splitlines() if "PushedFilters" in line)
    pushed = scan.split("PushedFilters:", 1)[1]
    assert "GreaterThanOrEqual(ts" in pushed or "GreaterThan(ts" in pushed, pushed
    assert "LessThanOrEqual(ts" in pushed or "LessThan(ts" in pushed, pushed
    assert "EqualTo(event_type,purchase)" in pushed, pushed


def test_pricing_summary_partial_aggregation(spark):
    """Map-side combine must precede the exchange: a wide agg without
    partial_sum ships every row through the shuffle."""
    df = entry_mod.queries()["pricing_summary"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # partial below exchange in tree print


def test_no_driver_collect_in_registry_dataflow():
    """Registry entries must be single-job dataflows: no ``.collect()``
    round-trip anywhere in the plans package (scalar aggregates attach via
    ``registry.scalar_join`` instead — VERDICT r2 item 5)."""
    import pathlib

    import marketpipe_spark.plans as plans

    pkg = pathlib.Path(plans.__file__).parent
    offenders = [
        f"{p.name}:{i}"
        for p in sorted(pkg.glob("*.py"))
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if ".collect()" in line.split("#")[0]
    ]
    assert not offenders, f"driver-side collect in plans package: {offenders}"


def test_ngram_contamination_prefilters_train_side(spark):
    """The train gram stream must pass a broadcast LeftSemi bucket prefilter
    (the explicit bloom cut, VERDICT r3 item 4) BEFORE any exchange — train
    grams outside the test side's hash-bucket set never shuffle."""
    df = entry_mod.queries()["ngram_contamination"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    semi = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln and "LeftSemi" in ln]
    assert semi, "no broadcast semi-join prefilter on the train side"
    assert "pmod" in plan


def test_embedding_near_dup_plans_without_running_jobs(spark):
    """Building the embedding_near_dup DataFrame must launch ZERO Spark jobs
    (VERDICT r3 item 5: the old adaptive-blocking count() was a full extra
    pass over the table; the row count now comes from parquet footer
    metadata)."""
    from marketpipe_spark.operators.dedup import embedding_near_duplicates
    from marketpipe_spark.plans.registry import parquet_num_rows, t

    sc = spark.sparkContext
    # The bare parquet read costs one schema-inference job; isolate it.
    emb = t(spark, SF_SMOKE, "embeddings")
    sc.setJobGroup("emb_plan_only", "operator construction must not execute")
    try:
        df = embedding_near_duplicates(
            emb, threshold=0.4, n_rows=parquet_num_rows(f"{SF_SMOKE}/embeddings.parquet")
        )
        assert df.schema is not None  # forces analysis, still no job
        jobs = sc.statusTracker().getJobIdsForGroup("emb_plan_only")
        assert list(jobs) == [], f"operator construction ran Spark jobs: {jobs}"
    finally:
        sc.setJobGroup(None, None)


def test_approx_distinct_sketch_bounds(spark):
    """The 100 TB path for COUNT(DISTINCT) is the HLL++ sketch
    (approx_count_distinct): assert its error stays inside the configured
    rsd bound against the exact count on real data. (Registry entries keep
    exact counts — cross-engine sketches can't hash-match — so the sketch
    path is evidenced here.)"""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(3 * 0.02 * row.exact, 1.0)


def test_global_window_inventory_is_allowlisted():
    """An unpartitioned window (`W.orderBy(...)` with no partitionBy) is a
    single-task sort — fine on control-plane-sized frames, a straggler on
    data-sized ones. This gate pins the exact inventory of allowed sites;
    any NEW global window anywhere in the package fails here until it is
    reviewed and its input proven bounded. Current sites and their bounds:

    - plans/queries_ta.py (1): rank-sum cumulative histogram — input is
      groupBy(rm) DISTINCT quantized µ-return values, bounded by
      min(#(symbol,day) pairs, value range); documented trade: at extreme
      distinct-value growth this becomes a two-phase bucketed scan.
    - operators/sampling.py (1): ordered float normalizer over |groups|
      rows (one per stratum) — ordering is load-bearing for bit-stable
      float summation vs the oracle.
    - operators/sketches.py (2): KLL quantile walk — rows bounded by the
      sketch's compaction parameter k, independent of data volume.
    - operators/skew.py (1): rank over the already-limited top-N hot-key
      profile (≤ `top` rows by construction).
    """
    import pathlib
    import re

    allowed = {
        "marketpipe_spark/plans/queries_ta.py": 1,
        "marketpipe_spark/operators/sampling.py": 1,
        "marketpipe_spark/operators/sketches.py": 2,
        "marketpipe_spark/operators/skew.py": 1,
    }
    pat = re.compile(r"\bW(?:indow)?\.orderBy\(")
    pkg = pathlib.Path(__file__).resolve().parent.parent / "marketpipe_spark"
    found = {}
    for p in sorted(pkg.rglob("*.py")):
        n = len(pat.findall(p.read_text()))
        if n:
            found[str(p.relative_to(pkg.parent))] = n
    assert found == allowed, (
        f"global-window inventory drifted:\n  found   {found}\n  allowed {allowed}\n"
        "New unpartitioned windows must be reviewed for a cardinality bound "
        "and added here explicitly."
    )
