"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query executes to completion through the noop sink (no result pruning,
no driver collect overhead) — what a cluster job would do, minus the write.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

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
    "simhash_near_dups",
    "minhash_verified_dups",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from worlddatapipeline_spark import get_spark
    from worlddatapipeline_spark.queries import QUERIES

    spark = get_spark(app_name="wdp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up pass: run every headline query once untimed so the timed pass
    # measures steady-state execution (whole-stage codegen compiled, parquet
    # footers cached) — the regime that matters at 100 TB, where per-query
    # JIT cost is amortized over thousands of tasks.  Reported separately as
    # cold_total_sec for visibility.
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.monotonic() - t0, 3)

    # Timed pass: best of 2 runs per query.  The box is shared, and the
    # CPU-bound interpreted stages (shingle lambdas) are scheduler-noise
    # sensitive — min-of-2 reports the machine's capability, not the
    # co-tenant's load spike.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)

    tpch: dict[str, float] = {}
    for name in TPCH:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        tpch[name] = round(best, 3)

    llm: dict[str, float] = {}
    for name in LLM:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        llm[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total_sec": round(sum(cold.values()), 3),
                "tpch_total_sec": round(sum(tpch.values()), 3),
                "tpch_queries": tpch,
                "llm_total_sec": round(sum(llm.values()), 3),
                "llm_queries": llm,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
