"""Count-min sketch invariants (operators/sketches.py), production xxhash64 family."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from marketpipe_spark.operators.sketches import cm_estimate, cm_sketch

DEPTH, WIDTH = 4, 256


def _tokens(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")


def test_cm_never_underestimates(spark):
    toks = _tokens(spark)
    sk = cm_sketch(toks, "tok", depth=DEPTH, width=WIDTH)
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cm_estimate(truth, "tok", sk, DEPTH, WIDTH)
    joined = truth.join(est, "tok")
    assert joined.filter(F.col("cm_est") < F.col("true_cnt")).count() == 0
    # And the grid is bounded regardless of key cardinality.
    assert sk.count() <= DEPTH * WIDTH


def test_cm_error_bound(spark):
    """Markov bound: E[overestimate] <= N/width per row; check the mean gap
    is well inside it (deterministic data + hashes -> stable assertion)."""
    toks = _tokens(spark)
    n_total = toks.count()
    sk = cm_sketch(toks, "tok", depth=DEPTH, width=WIDTH)
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cm_estimate(truth, "tok", sk, DEPTH, WIDTH)
    gap = (
        truth.join(est, "tok")
        .agg(F.avg(F.col("cm_est") - F.col("true_cnt")).alias("mean_gap"))
        .collect()[0]["mean_gap"]
    )
    assert gap <= 2.0 * n_total / WIDTH


def test_cm_mergeable_and_partition_invariant(spark):
    """Sketch(all) == cellwise sum of sketches over disjoint slices, and the
    cell grid is identical under any input partitioning (mergeability is
    what makes the build one cardinality-independent map-side combine)."""
    toks = _tokens(spark)
    whole = cm_sketch(toks, "tok", depth=DEPTH, width=WIDTH)
    a = cm_sketch(toks.filter(F.crc32(F.col("tok")) % 2 == 0), "tok", depth=DEPTH, width=WIDTH)
    b = cm_sketch(toks.filter(F.crc32(F.col("tok")) % 2 == 1), "tok", depth=DEPTH, width=WIDTH)
    merged = a.unionByName(b).groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0

    reparted = cm_sketch(toks.repartition(7), "tok", depth=DEPTH, width=WIDTH)
    assert whole.exceptAll(reparted).count() == 0


def test_cm_weighted(spark):
    """Weighted build: estimate of a key >= its true weight sum."""
    rows = [("a", 10), ("a", 5), ("b", 1), ("c", 7)]
    df = spark.createDataFrame(rows, "k string, w int")
    sk = cm_sketch(df, "k", depth=DEPTH, width=WIDTH, weight="w")
    est = cm_estimate(df.select("k").distinct(), "k", sk, DEPTH, WIDTH)
    got = {r["k"]: r["cm_est"] for r in est.collect()}
    assert got["a"] >= 15 and got["b"] >= 1 and got["c"] >= 7


# ---------------------------------------------------------------------------
# KLL quantile sketch


def test_kll_rank_error_bound(spark):
    """Estimated quantiles must land within 5% rank error of exact
    percentiles on the real event values (k=256, deterministic compaction)."""
    from marketpipe_spark.operators.sketches import kll_partial_sketch, kll_quantiles

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("value")
    n = ev.count()
    probs = [0.1, 0.25, 0.5, 0.75, 0.9]
    sk = kll_partial_sketch(ev, "value", k=256)
    est = {r["p"]: r["value"] for r in kll_quantiles(sk, probs).collect()}
    assert set(est) == set(probs)
    for p, v in est.items():
        rank = ev.filter(F.col("value") <= v).count() / n
        assert abs(rank - p) <= 0.05, f"p={p}: est={v} true rank={rank:.3f}"


def test_kll_deterministic_and_bounded(spark):
    """Same input -> identical sketch rows (even-index compaction has no
    randomness), and the sketch stays small regardless of input rows."""
    from marketpipe_spark.operators.sketches import kll_partial_sketch

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("value")
    a = sorted(map(tuple, kll_partial_sketch(ev, "value", k=64).collect()))
    b = sorted(map(tuple, kll_partial_sketch(ev, "value", k=64).collect()))
    assert a == b
    # Mass conservation: odd-length compactions park their leftover item
    # instead of inflating promoted weight, so total weight == row count.
    assert sum(w for _, w in a) == ev.count()
    # partitions * (2k + k*levels) ceiling, far below the input row count
    assert len(a) < ev.count()
    assert len(a) <= ev.rdd.getNumPartitions() * 64 * 12


def test_kll_mergeable_across_slices(spark):
    """Sketching two disjoint slices and unioning the partials estimates the
    whole dataset: quantiles from the union stay inside the error bound."""
    from marketpipe_spark.operators.sketches import kll_partial_sketch, kll_quantiles

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("value", "event_id")
    n = ev.count()
    a = kll_partial_sketch(ev.filter(F.col("event_id") % 2 == 0).select("value"), "value", k=256)
    b = kll_partial_sketch(ev.filter(F.col("event_id") % 2 == 1).select("value"), "value", k=256)
    merged = a.unionByName(b)
    est = {r["p"]: r["value"] for r in kll_quantiles(merged, [0.5]).collect()}
    rank = ev.filter(F.col("value") <= est[0.5]).count() / n
    assert abs(rank - 0.5) <= 0.05


def test_hll_estimate_error_bound_and_regimes(spark):
    from marketpipe_spark.operators.sketches import hll_distinct

    # spans the linear-counting regime (n << m) and approaches raw (n ~ 2.5m)
    rows = [(grp, f"u{grp}_{i}") for grp, n in (("tiny", 40), ("mid", 700), ("big", 3000)) for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    out = {r["grp"]: r for r in hll_distinct(df, ["grp"], "uid").collect()}
    for grp, n in (("tiny", 40), ("mid", 700), ("big", 3000)):
        est = out[grp]["hll_est_x1000"] / 1000.0
        assert abs(est - n) / n < 0.15, (grp, est, n)


def test_hll_registers_merge_and_partition_invariance(spark):
    from pyspark.sql import functions as F

    from marketpipe_spark.operators.sketches import (
        hll_estimate,
        hll_partial_registers,
    )

    rows = [("g", f"user{i % 500}") for i in range(5000)]
    df = spark.createDataFrame(rows, "grp string, uid string")
    direct = hll_estimate(hll_partial_registers(df, ["grp"], "uid"), ["grp"]).collect()
    # merge = union of two independently-sketched halves, per-bucket MAX
    h1 = hll_partial_registers(df.filter(F.xxhash64("uid") % 2 == 0), ["grp"], "uid")
    h2 = hll_partial_registers(df.filter(F.xxhash64("uid") % 2 != 0), ["grp"], "uid")
    merged_regs = (
        h1.unionByName(h2).groupBy("grp", "bucket").agg(F.max("reg").alias("reg"))
    )
    merged = hll_estimate(merged_regs, ["grp"]).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in merged]
    # repartitioning must not change the sketch
    repart = hll_estimate(
        hll_partial_registers(df.repartition(7, "uid"), ["grp"], "uid"), ["grp"]
    ).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in repart]


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters

def test_mg_guarantees_on_skewed_data(spark):
    from marketpipe_spark.operators.sketches import (
        mg_heavy_hitters_check,
        mg_partial_counters,
    )

    # 1000 "the", 500 "a", tail of 300 singletons: n=1800, k=8 ->
    # threshold n/9 = 200 -> exactly {the, a} guaranteed present
    rows = [("the",)] * 1000 + [("a",)] * 500 + [(f"w{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "item string").repartition(7)
    r = mg_heavy_hitters_check(df, "item", k=8).collect()[0]
    assert (r.k, r.n, r.n_true_heavy) == (8, 1800, 2)
    assert r.all_heavy_present and r.no_overcount and r.undercount_ok

    # and the merged summary itself contains the two heavy items with
    # near-true counts (undercount bounded by (n - mass)/(k+1))
    from pyspark.sql import functions as F

    est = {
        x["item"]: x["s"]
        for x in mg_partial_counters(df, "item", 8)
        .groupBy("item").agg(F.sum("cnt").alias("s")).collect()
    }
    assert est.get("the", 0) <= 1000 and est.get("a", 0) <= 500
    assert est.get("the", 0) > 0 and est.get("a", 0) > 0


def test_mg_partition_layout_does_not_break_guarantees(spark):
    import random

    from marketpipe_spark.operators.sketches import mg_heavy_hitters_check

    rng = random.Random(11)
    rows = [(rng.choice(["x"] * 6 + ["y"] * 3 + [f"t{rng.randrange(50)}"]),) for _ in range(2000)]
    for parts in (1, 5, 32):
        df = spark.createDataFrame(rows, "item string").repartition(parts)
        r = mg_heavy_hitters_check(df, "item", k=4).collect()[0]
        assert r.n == 2000
        assert r.all_heavy_present and r.no_overcount and r.undercount_ok


# ---------------------------------------------------------------------------
# Bloom filter


def test_bloom_no_false_negatives(spark):
    from marketpipe_spark.operators.sketches import bloom_bits, bloom_member

    members = spark.createDataFrame([(i,) for i in range(200)], "gram_h long")
    bits = bloom_bits(members, m_bits=12, k=3)
    probe = spark.createDataFrame(
        [(0, i) for i in range(200)] + [(1, i) for i in range(1000, 1400)],
        "doc_id long, gram_h long",
    )
    got = {(r["doc_id"], r["gram_h"]): r["bloom_hit"]
           for r in bloom_member(probe, bits, m_bits=12, k=3).collect()}
    # Every inserted key MUST hit — the structural guarantee.
    assert all(got[(0, i)] for i in range(200))
    # A 4096-bit filter holding 200*3 positions is ~14% full: the 400
    # non-members cannot ALL collide on every one of 3 positions.
    misses = sum(0 if got[(1, i)] else 1 for i in range(1000, 1400))
    assert misses > 300


def test_bloom_positions_bounded_and_partition_invariant(spark):
    from marketpipe_spark.operators.sketches import bloom_bits, bloom_member

    m_bits, m = 10, 1 << 10
    members = spark.createDataFrame([(i * 7,) for i in range(500)], "gram_h long")
    bits = bloom_bits(members, m_bits=m_bits, k=3)
    rows = bits.collect()
    assert all(0 <= r["pos"] < m for r in rows)
    assert len(rows) <= m  # bounded BY CONSTRUCTION

    probe = spark.createDataFrame([(i,) for i in range(300)], "gram_h long")
    a = sorted(map(tuple, bloom_member(probe.repartition(1), bits, m_bits=m_bits, k=3).collect()))
    b = sorted(map(tuple, bloom_member(probe.repartition(11), bits, m_bits=m_bits, k=3).collect()))
    assert a == b
