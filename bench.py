#!/usr/bin/env python3
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "parallelism": N, "master": ...}

Each query materializes fully through the noop sink (no driver collect —
measures the distributed plan, not result serialization).

Output contract (r11 measurement fix, declared in OPTIMIZATION_r11.md):
the stdout line must survive a bounded tail capture — the r10 driver
artifact shows exactly 2000 chars of tail while the r10 line was 2716
chars, so the line's FRONT (metric/value/headline queries) was cut and the
round-over-round comparison zeroed out (PERF_r10 ``prev_bench_ok: false``).
The line therefore now carries the headline per-query dict plus short
scalars only (~700 chars); the per-extra timings, cached_total detail and
warm-up policy move to a sidecar file ``BENCH_DETAIL_c{parallelism}.json``
written next to this script. Nothing about the TIMED methodology changed:
same queries, same order, same noop sink, same warm-up as r10. The line
also records the RESOLVED ``defaultParallelism``/``master`` so the
core-count contract ($SPARK_GRAFT_CPUS -> local[N]) is self-evidencing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "resample_5m",
    "resample_1d",
    "vwap",
    "daily_summary",
    "availability_summary",
    "top_customers",
    "regional_revenue",
    "snapshot_diff",
    "latest_event_per_user",
    "sma_20",
    "volatility_20",
    "gap_days",
    "exact_dedup",
    "quality_score",
    "lang_id_scores",
    "validation_report",
    "token_count",
    "fingerprint",
    "embedding_near_dup",
]

#: Round-2 additions, timed and reported separately so the headline total
#: stays comparable round-over-round (same 20-query basket as BENCH_r01).
EXTRA = [
    "asof_trade_quote",
    "user_sessions",
    "chunk_documents",
    "value_percentiles",
    "dataset_split",
    "vocab_top_tokens",
    "revenue_rollup",
    "orders_pivot",
    "exists_anti_customers",
    "text_cleaning",
    "repetition_signals",
    "ngram_contamination",
    "close_quartiles",
    "rolling_volume_1h",
    "curated_corpus",
    "session_activity",
    "close_histogram",
    "corr_close_volume",
    "orders_cube",
    "interarrival_gaps",
    "top_volume_days",
    "bollinger_20",
    "rsi_14",
    "max_drawdown",
    "ohlc_unpivot",
    "close_percent_rank",
    # round-3 additions
    "shipping_priority",
    "order_priority_count",
    "promo_revenue",
    "top_suppliers",
    "big_orders",
    "source_mixture_weights",
    "length_outliers",
    "returned_items",
    "nation_volume",
    "brand_revenue",
    "customer_distribution",
    "idle_rich_customers",
    # round-4 additions
    "gaps_by_symbol",
    "contamination_check",
    "min_cost_supplier",
    "product_profit",
    "important_parts",
    "late_priority_counts",
    "supplier_part_counts",
    "small_qty_revenue",
    "excess_suppliers",
    "waiting_suppliers",
    "market_share",
    "local_supplier_volume",
    "forecast_revenue",
    "tfidf_top_terms",
    "bm25_search",
    "duplicated_spans",
    "json_props_stats",
    "profile_documents",
    "atr_14",
    "stochastic_14",
    "obv",
    "candle_patterns",
    "macd_12_26",
    "rfm_segments",
    "winsorized_value_stats",
    "twap",
    "symbol_beta",
    "return_correlations",
    # round-5 additions
    "pii_scrub",
    "segment_dedup",
    "lm_perplexity",
    "quality_classifier",
    "embedding_near_dup_lsh",
    "semantic_dedup",
    "shuffle_shard",
    "boilerplate_strip",
    "token_budget_sample",
    "winnow_fingerprints",
    "nearest_centroid",
    "hot_key_profile",
    "salted_join_parity",
    "containment_dedup",
]

#: The heavier LLM-pipeline operators (LSH/minhash/multimodal) stay out of
#: the default headline — they're covered by the correctness gate and unit
#: tests; set SPARK_GRAFT_BENCH_FULL=1 to time them too.
FULL_EXTRA = [
    "ann_topk",
    "ann_topk_blocked",
    "minhash_lsh_near_dup",
    "simhash_near_dup",
    "ngram_jaccard",
    "multimodal_meta",
    "interval_join_sessions",
    "pack_documents",
    "lsh_topk",
    "ivf_topk",
    "pq_topk",
    "kll_value_quantiles",
    "bpe_trained_tokens",
    "dsir_weights",
    "stream_resample_5m",
    "stream_dedup_minute",
    "stream_sessions",
    "url_dedup",
    "ngram_novelty",
    "event_transitions",
    "hll_distinct_users",
    "setsim_join_exact",
    "token_drift_psi",
    "session_paths",
    "copurchase_pagerank",
    "copurchase_triangles",
    "copurchase_communities",
    "copurchase_kcore",
    "basket_rules",
    "ewma_close",
    "resample_5m_ffill",
    "stream_attribution_join",
    "copurchase_reach",
    "order_skyline",
    "nation_customer_skyline",
    "holt_trend",
    "part_name_match",
    "stream_top_users",
    "copurchase_cheap_paths",
    "cusum_drift",
    "bootstrap_return_ci",
    "ranksum_returns",
    "acf_returns",
    # round-7 additions
    "heavy_hitter_tokens",
    "copurchase_link_prediction",
    "copurchase_ppr",
    "copurchase_harmonic",
    "bloom_decontaminate",
    "theil_sen_trend",
    "mad_outliers",
    "ks_drift",
    "token_gini",
    "stream_sliding_volume",
    "copurchase_walks",
    "source_overlap",
    # round-7 batch 3
    "rolling_beta",
    "seasonal_volume_anomaly",
    "symbol_bt_strength",
    "frequent_brand_triples",
    "part_golden_records",
    "historical_var_es",
    "amihud_illiquidity",
    "lix_readability",
    "stream_anomaly_alerts",
    "fk_integrity_audit",
    "benford_order_totals",
    "attribution_credits",
    "holt_backtest_mae",
    "k_anonymity_audit",
    "copurchase_hits",
    "stream_outer_attribution",
    "copurchase_pagerank_weighted",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from marketpipe_spark.plans import registry
    from marketpipe_spark.session import get_spark

    spark = get_spark("marketpipe-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.spark_queries()
    # Warm-up (r10, measurement fix — see OPTIMIZATION_r10.md): the old
    # single pricing_summary warm-up warmed JVM codegen and the LINEITEM
    # filesource only, so the first timed query touching each OTHER base
    # table paid its one-time filesource/codegen setup (~1.5 s measured for
    # documents), and the first Python-node query paid the Python worker
    # pool fork + numpy import (~2.5 s measured) — process bring-up charged
    # to whichever query ran first, not query cost. Warm each base table's
    # scan path and the Arrow/Python worker pool once; every timed query
    # still computes from the parquet inputs (noop sink, plans rebuilt per
    # invocation — nothing here caches results or intermediates).
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for tbl in registry.TABLES:
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()

    def _warm_py(batches):
        import numpy  # noqa: F401  (pre-import in every reused worker)
        import pandas  # noqa: F401
        for b in batches:
            yield b

    (
        spark.range(spark.sparkContext.defaultParallelism * 2)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_warm_py, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    def run(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            if name not in qs:
                continue
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        return out

    timings = run(HEADLINE)
    extra = run(EXTRA + (FULL_EXTRA if os.environ.get("SPARK_GRAFT_BENCH_FULL") else []))
    names = list(timings) + list(extra)

    # Serving-mode wall: the same headline basket over PREBUILT plans
    # (plans.registry.prebuilt — built once, executed again). The delta vs
    # the cold total is pure driver-side plan construction, the cost a
    # serving deployment pays once at warm-up instead of per query.
    registry.warm_plans(spark, [n for n in HEADLINE if n in qs], sf_dir)
    t0 = time.time()
    for name in HEADLINE:
        if name in qs:
            registry.prebuilt(spark, name, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    cached_total = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    parallelism = spark.sparkContext.defaultParallelism
    out = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cached_total": cached_total,
        "extra_total": round(sum(extra.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Self-evidencing core-count contract: the RESOLVED parallelism and
        # master string, so "does the bench honor $SPARK_GRAFT_CPUS" is
        # answerable from the artifact itself (PERF_r10 flagged
        # suspect_cpus_ignored against a bench that does honor it).
        "parallelism": parallelism,
        "master": spark.sparkContext.master,
        "detail": f"BENCH_DETAIL_c{parallelism}.json",
    }
    # Full detail sidecar: per-extra timings (too long for the driver's
    # 2000-char stdout tail capture) + the warm-up policy stamp (ADVICE r10:
    # record the r10 warm-up methodology change alongside the artifacts so
    # old/new numbers aren't compared across the boundary).
    detail = dict(out)
    detail["extra_queries"] = extra
    detail["warmup"] = (
        "r10 policy: untimed noop scan of each base table + one trivial "
        "numpy-importing mapInPandas before timing (process bring-up is "
        "warmed; every timed query still computes from parquet). Numbers "
        "before BENCH_r10 charged first-touch costs to the first query."
    )

    # Opt-in comparator: time the SAME oracle SQL in DuckDB (threads=4, the
    # reference's pragma) on the same parquet. Off by default — the sandbox
    # CPU-throttles sustained load and the driver's recorded number should
    # stay lean; run with SPARK_GRAFT_BENCH_ORACLE=1 to refresh ORACLE_BENCH.
    if os.environ.get("SPARK_GRAFT_BENCH_ORACLE"):
        import duckdb

        con = duckdb.connect()
        con.execute("PRAGMA threads=4")
        for t in registry.TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        oracles = registry.oracle_sqls()
        otimes: dict[str, float] = {}
        for name in names:
            if name in oracles:
                t0 = time.time()
                con.execute(oracles[name]).fetchall()
                otimes[name] = round(time.time() - t0, 3)
        detail["oracle_queries"] = otimes
        out["oracle_total"] = detail["oracle_total"] = round(sum(otimes.values()), 3)

    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), out["detail"]
            ),
            "w",
        ) as f:
            json.dump(detail, f, indent=2)
    except OSError:
        pass  # read-only checkout: the stdout line still carries the contract

    # Compact separators: every byte of the line competes with the tail cap.
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
