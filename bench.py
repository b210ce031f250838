"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Output layout (r12): the FULL-detail line prints first (complete
per-query/cold/exec_trace dicts — unchanged from every prior round), then
a compact summary line LAST, sized to survive the driver's 2000-char
stdout tail.  Since r12 the compact line also carries per-query durations
("queries", slowest-first, as many as fit a 1950-byte budget, plus
"n_queries") because the driver's per-query comparators parse the LAST
line only — PERF_r11 came back with an empty per_query for exactly this
reason (VERDICT r11 item 1).  The full dict is additionally rotated into
a BENCH_LASTRUN_c<cpus>.json sidecar.  Timing methodology, query set, and
the first line's schema are untouched.

Each query executes to completion through the noop sink (no result pruning,
no driver collect overhead) — what a cluster job would do, minus the write.

Failure isolation: every query runs under try/except.  A failing query
records `null` for its timing and is listed in "errors"; the JSON line is
ALWAYS printed.  (Round 1 lost the whole bench to one AnalysisException —
never again.)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "catalog_stats",
    "region_rollup",
    "nation_rollup_sets",
    "histogram_mode",
    "top_orders_per_customer",
    "asof_click_before_purchase",
    "value_band_range_join",
    "customer_order_reconcile",
    "user_event_gaps",
    "cumulative_user_value",
    "sessionize",
    "unwrap_angle_series",
    "json_props_extract",
    "doc_text_stats",
    "doc_quality",
    "dedup_docs_exact",
    "ngram_jaccard_pairs",
    "embedding_topk",
    "rate_limited_angle",
    "listing_parse_stats",
    "content_hash_brands",
    "brand_argmax",
    "orders_by_month",
    "trajectory_angles",
    "extrinsic_export",
    "value_band_bucketed",
    "top_unshipped_orders",
    "supplier_volume",
    "catalog_upsert",
]

# Secondary suite: the TPC-H-shaped relational batch (queries_tpch.py).
# Reported as tpch_total_sec/tpch_queries so the headline metric stays
# comparable with the round-1 BASELINE measurement.
TPCH = [
    "discount_revenue",
    "promo_revenue_ratio",
    "nation_pair_volume",
    "part_profit_by_nation",
    "returned_top_customers",
    "part_value_share",
    "top_supplier_revenue",
    "below_avg_qty_revenue",
    "large_order_customers",
    "idle_high_balance_customers",
    "event_value_percentiles",
    "salted_event_value_sum",
    "hourly_event_windows",
    "nation_market_share",
    "order_count_distribution",
    "late_order_priority_counts",
    "local_supplier_volume",
    "late_shipment_priority_mix",
    "brand_band_revenue",
    "excess_stock_suppliers",
    "sole_late_suppliers",
]

# Third suite: LLM-training-data pipeline queries not already in HEADLINE.
# Reported as llm_total_sec/llm_queries — same best-of-2 warm protocol.
LLM = [
    "paragraph_dup_ratio",
    "dataset_split_stats",
    "train_test_decontamination",
    "stratified_sample_stats",
    "source_quota_sample",
    "pii_redaction",
    "doc_repetition_filter",
    "doc_tfidf_topterms",
    "doc_lang_detect",
    "doc_fingerprint_tokens",
    "embedding_cosine_dups",
    # simhash_near_dups moved to a tiny constructive corpus in round 5 (it
    # became hash-checked); benching it against the baseline's real-corpus
    # timing would fake an improvement.  simhash_exact_containment runs the
    # same real-corpus simhash path (a superset: + md5 posting pairs +
    # anti-join) and replaces it here, reported as a new query.
    "simhash_exact_containment",
    "minhash_verified_dups",
    "dedup_cluster_keep",
    "token_shard_packing",
    "length_band_filter",
    "segment_clip_after_truncate",
    "duplicate_span_stats",
    "chunk_dedup_rewrite",
    "bucketed_cosine_dedup",
    "bloom_decontamination",
    # round-4 additions (reported as new_queries vs the r4 baseline until
    # BENCH_BASELINE.json is refreshed)
    "gopher_quality_flags",
    "char_entropy_score",
    "embedding_quantize_audit",
    "int8_ann_recall",
    "bm25_topk_search",
    "weighted_sample_wor",
    "k_anonymity_audit",
    "scd2_status_history",
    "incremental_agg_maintenance",
    "cdc_snapshot_apply",
    "curation_pipeline_stats",
    "pit_customer_status",
    "last_touch_attribution",
    "unigram_lm_perplexity",
    "dsir_importance_weights",
    "theta_sketch_overlap",
    "bitmap_distinct_counts",
    "nation_vip_listagg",
    "hll_rollup_contract",
    "xml_roundtrip_stats",
    "pyds_listing_parse_stats",
    "param_sql_revenue_bands",
    "dq_constraint_report",
    # round-4 third-session additions (new_queries vs the committed baseline)
    "asof_tolerance_click",
    "interval_coverage",
    "pareto_parts",
    "event_transition_matrix",
    "equi_depth_bins",
    "countmin_contract",
    "filtered_vector_search",
    "stable_row_index",
    "linear_attribution",
    "cusum_drift_alarms",
    "recursive_amortization",
    "pipe_sql_priority_mix",
    "observed_metrics_audit",
    "streaming_static_enrichment",
    "ab_test_zscore",
    "session_path_counts",
    "mad_outlier_counts",
    "kcore_contract",
    "curriculum_order_stats",
    "rfm_segments",
    "weighted_median_value",
    # round-4 fourth-session additions (new_queries vs the committed baseline)
    "basket_brand_rules",
    "brand_affinity_topk",
    "dow_seasonality",
    "gini_purchase_concentration",
    "benford_price_audit",
    "daily_autocorrelation",
    "distinctive_terms",
    "pmi_term_pairs",
    "fuzzy_record_linkage",
    "kaplan_meier_churn",
    "event_trigram_patterns",
    "behavior_diversity_bands",
    "theil_sen_trend",
    "holt_trend_forecast",
    "discount_elasticity",
    "abc_xyz_classification",
    "seasonal_decompose",
    "sax_symbolic_words",
    "cuped_adjusted_ab",
    "trimmed_mean_values",
    "lead_lag_correlation",
    "audio_dominant_bins",
    "streaming_trending_topk",
    "image_ahash_dedup",
    "did_readout",
    "negative_sampling_pairs",
    "product_analytics_pipeline",
    "position_attribution",
    "readability_bands",
    "distribution_drift",
    "user_feature_vector",
    "session_conformance",
    "degree_assortativity",
    "kfold_assignment",
    "ips_policy_value",
    "attribution_window_sweep",
    "zipf_rank_audit",
    "short_text_editdups",
    # round-5 additions (new_queries vs the committed baseline)
    "hybrid_rank_fusion",
    "entity_resolution_clusters",
    "bpe_merge_pairs",
    "l_diversity_audit",
    "ohlc_daily_bars",
    "streaming_ohlc_parity",
    # round-6 additions
    "jpeg_roundtrip_contract",
    # round-7 additions
    "jpeg420_roundtrip_contract",
    "jpeg_restart_contract",
    "jpeg_progressive_contract",
    # round-8 additions
    "jpeg_lossless_contract",
    # round-9 additions
    "jpeg_hierarchical_contract",
    "png_palette_contract",
    "png_full_surface_contract",
    "wav_pcm_surface_contract",
    "bmp_surface_contract",
]


def _compact_summary_line(summary: dict, all_q: dict, budget: int = 1950) -> str:
    """Final-line serializer: fold as many per-query durations as fit
    `budget` bytes into summary["queries"], slowest first, and return the
    compact JSON string (guaranteed <= budget unless the fixed fields alone
    exceed it, in which case the per-query block is shed entirely).

    The driver parses the LAST stdout line out of a 2000-char tail; per-query
    durations must live there or round-over-round/c32-vs-c8 comparisons come
    back empty (VERDICT r11 item 1 / PERF_r11 per_query: {}).
    """
    by_cost = sorted(
        (q for q in all_q if all_q[q] is not None),
        key=lambda q: all_q[q],
        reverse=True,
    )
    summary["n_queries"] = len(all_q)
    summary["queries"] = {}
    for q in by_cost:
        summary["queries"][q] = all_q[q]
        if len(json.dumps(summary, separators=(",", ":"))) > budget:
            del summary["queries"][q]
            break
    out = json.dumps(summary, separators=(",", ":"))
    if len(out) > budget:  # pathological error/regression volume: shed the
        summary["queries"] = {}  # per-query block, keep the graded scalars
        out = json.dumps(summary, separators=(",", ":"))
    return out


def _run_one(queries, name, spark, sf_dir) -> float:
    t0 = time.monotonic()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def _bench_suite(
    queries, names, spark, sf_dir, errors,
    warm_pass=None, exec_trace=None, trace_t0=None,
):
    """Best-of-2 warm timings per query; None timing + errors entry on failure.

    Execution ORDER is shuffled fresh each run (SystemRandom — deliberately
    not reproducible) while the OUTPUT dict keeps the suite's declared order:
    a slow host window on this co-tenant box can then only flag queries
    whose sole commonality is execution adjacency, never a contiguous
    family block like r5's false-flag band (the first 21 llm queries —
    VERDICT r5 item 2).  `exec_trace` records each query's start offset so
    band-vs-regression adjudication is mechanical from the artifact: flagged
    queries clustered in wall-clock time = host window, scattered = real.
    """
    import random  # noqa: PLC0415

    order = list(names)
    random.SystemRandom().shuffle(order)
    # one RUN-GLOBAL reference time across all suites, so a host window
    # spanning a suite boundary still shows as one wall-clock cluster
    # (review catch r6)
    t0 = trace_t0 if trace_t0 is not None else time.monotonic()
    ran: dict[str, float | None] = {}
    for name in order:
        if exec_trace is not None:
            exec_trace[name] = round(time.monotonic() - t0, 3)
        try:
            if warm_pass is not None:
                warm_pass[name] = round(_run_one(queries, name, spark, sf_dir), 3)
            else:
                _run_one(queries, name, spark, sf_dir)  # warm-up, untimed
            best = min(_run_one(queries, name, spark, sf_dir) for _ in range(2))
            ran[name] = round(best, 3)
        except Exception:
            ran[name] = None
            errors[name] = traceback.format_exc(limit=3).splitlines()[-1][:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
    return {name: ran[name] for name in names}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from worlddatapipeline_spark import get_spark
    from worlddatapipeline_spark.queries import QUERIES

    # Run-global trace reference starts BEFORE session spin-up so the first
    # query executed still records a real nonzero offset — a literal 0.0 in
    # the exec trace read as "never ran" (VERDICT r9 What's-wrong #3).
    run_t0 = time.monotonic()
    spark = get_spark(app_name="wdp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    errors: dict[str, str] = {}
    # Headline warm-up pass is recorded (cold_total_sec) so steady-state vs
    # first-run JIT/footer-cache cost stays visible; the timed pass is
    # best-of-2 warm — the regime that matters at 100 TB, where per-query
    # compile cost is amortized over thousands of tasks.
    cold: dict[str, float] = {}
    exec_trace: dict[str, float] = {}
    timings = _bench_suite(
        QUERIES, HEADLINE, spark, sf_dir, errors,
        warm_pass=cold, exec_trace=exec_trace, trace_t0=run_t0,
    )
    tpch = _bench_suite(
        QUERIES, TPCH, spark, sf_dir, errors,
        exec_trace=exec_trace, trace_t0=run_t0,
    )
    llm = _bench_suite(
        QUERIES, LLM, spark, sf_dir, errors,
        exec_trace=exec_trace, trace_t0=run_t0,
    )

    def tot(d):
        return round(sum(v for v in d.values() if v is not None), 3)

    # Compare each group against the committed per-query baseline
    # (BENCH_BASELINE.json) over the SHARED query set, so noise vs
    # regression is mechanically distinguishable and newly-added queries
    # don't skew the ratio (VERDICT r3 #4).  Only meaningful at the
    # baseline's scale factor (sf0.1).
    vs_baseline: dict[str, float] = {}
    new_queries: list[str] = []
    regressions: list[dict] = []
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    if os.path.isfile(base_path) and abs(sf - 0.1) < 1e-9:
        with open(base_path, encoding="utf-8") as fh:
            base_groups = json.load(fh)["groups"]
        for gname, current in (
            ("headline", timings), ("tpch", tpch), ("llm", llm)
        ):
            base = base_groups.get(gname, {})
            shared = [q for q in current if q in base and current[q] is not None]
            new_queries += [q for q in current if q not in base]
            b = sum(base[q] for q in shared)
            if b > 0:
                vs_baseline[gname] = round(
                    sum(current[q] for q in shared) / b, 3
                )
            # Mechanical noise-vs-regression rule (this box is co-tenant and
            # never reliably idle, so raw ratios mix host noise with real
            # regressions): co-tenant slowdowns shift EVERY query by about
            # the same factor, so a query is flagged as a REGRESSION only if
            # it exceeds BOTH 2x its own baseline AND 2x this run's median
            # ratio over the shared set (sub-50 ms baselines are skipped as
            # scheduler jitter).  An empty `regressions` list plus a
            # within-2x group ratio = noise by this rule, not regression.
            ratios = sorted(
                current[q] / base[q] for q in shared if base[q] > 0.05
            )
            if ratios:
                # lower-middle on even counts: the conservative (smaller)
                # median makes the 2x-of-median threshold STRICTER, never
                # looser (review catch r5)
                med = ratios[(len(ratios) - 1) // 2]
                for q in shared:
                    if base[q] > 0.05 and current[q] / base[q] > max(
                        2.0, 2.0 * med
                    ):
                        regressions.append(
                            {
                                "group": gname,
                                "query": q,
                                "ratio": round(current[q] / base[q], 2),
                                "run_median": round(med, 2),
                            }
                        )

    # Full-detail line FIRST.  Large per-query fields (queries/exec_trace,
    # ~8 KB each at 264 registry entries) come before the graded summary
    # scalars, so even a reader who only keeps the END of this line sees
    # vs_baseline/regressions (VERDICT r6 item 1: the driver stores a
    # 2000-char stdout tail, and BENCH_r06 lost the graded ratios to an
    # exec_trace emitted mid-object).
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": tot(timings),
                "unit": "sec",
                "queries": timings,
                "cold_total_sec": tot(cold),
                "tpch_total_sec": tot(tpch),
                "tpch_queries": tpch,
                "llm_total_sec": tot(llm),
                "llm_queries": llm,
                # per-query start offset (sec) from ONE run-global
                # reference, in the SHUFFLED execution order of this run —
                # lets a reviewer check whether flagged queries cluster in
                # wall-clock time (host window) or scatter (real
                # regressions), including windows spanning suite boundaries
                "exec_trace": exec_trace,
                "new_queries": new_queries,
                "vs_baseline": vs_baseline,
                "regressions": regressions,
                "n_failed": len(errors),
                "errors": errors,
                "sf": sf,
            }
        )
    )
    # Full per-query detail additionally rotated into a sidecar artifact
    # next to this file (named per core count, so the driver's main and
    # low-core runs don't clobber each other).  The stdout contract is
    # unchanged; this is the lossless copy of the first line's data for
    # readers who only get the 2000-char stdout tail (VERDICT r11 item 1).
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "default")
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_LASTRUN_c{cpus}.json",
    )
    try:
        with open(sidecar, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "queries": timings,
                    "tpch_queries": tpch,
                    "llm_queries": llm,
                    "cold": cold,
                    "exec_trace": exec_trace,
                    "vs_baseline": vs_baseline,
                    "regressions": regressions,
                    "errors": errors,
                    "sf": sf,
                    "cpus": cpus,
                },
                fh,
            )
    except OSError:
        pass  # read-only checkout must never kill the bench line

    # Compact summary-only line LAST, size-bounded so the driver's
    # 2000-char stdout tail always contains it whole (and a last-line JSON
    # parse succeeds).  Regressions capped at 10 entries and error strings
    # at 60 chars; the uncapped detail is in the full line above.
    #
    # Per-query durations (VERDICT r11 item 1): the driver's round-over-
    # round and c32-vs-c8 comparators read per-query times from the parsed
    # LAST line, and PERF_r11 came back with an empty per_query because
    # durations only existed in the oversized first line.  All ~185 names
    # cannot fit in 2000 chars, so the last line carries as many per-query
    # durations as fit a fixed byte budget, slowest queries first (they
    # carry the total and are the ones whose regressions matter); the full
    # dict is in the first line and the sidecar.  Serialized compactly.
    summary = {
        "metric": "headline_total_sec",
        "value": tot(timings),
        "unit": "sec",
        "cold_total_sec": tot(cold),
        "tpch_total_sec": tot(tpch),
        "llm_total_sec": tot(llm),
        "vs_baseline": vs_baseline,
        "n_regressions": len(regressions),
        "regressions": regressions[:10],
        "n_new_queries": len(new_queries),
        "n_failed": len(errors),
        "errors": {k: v[:60] for k, v in list(errors.items())[:8]},
        "sf": sf,
    }
    print(_compact_summary_line(summary, {**timings, **tpch, **llm}))


if __name__ == "__main__":
    main()
