"""Bloom build/probe operator (operators/bloom.py) and the analytics
queries that compose it (queries_analytics.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from worlddatapipeline_spark.operators import bloom as bloom_ops


def test_no_false_negatives(spark):
    """Every reference key must probe positive — the property the exact
    verify-join composition relies on."""
    ref = spark.range(0, 500).select(
        F.concat(F.lit("key_"), F.col("id").cast("string")).alias("k")
    )
    n_bits = bloom_ops.optimal_n_bits(500, 0.01)
    bits = bloom_ops.build_bloom(ref, F.col("k"), n_bits)
    probe = bloom_ops.might_contain_udf(bits)
    pos = bloom_ops.position_cols(F.col("k"), n_bits, 5)
    hits = ref.withColumn("hit", probe(*pos)).agg(
        F.sum(F.col("hit").cast("long")).alias("n")
    ).collect()[0]["n"]
    assert hits == 500


def test_fpp_roughly_bounded(spark):
    """Non-members pass at roughly the configured false-positive rate —
    not saturated (sizing works) and not zero (it is a real sketch)."""
    ref = spark.range(0, 1000).select(
        F.concat(F.lit("in_"), F.col("id").cast("string")).alias("k")
    )
    other = spark.range(0, 5000).select(
        F.concat(F.lit("out_"), F.col("id").cast("string")).alias("k")
    )
    n_bits = bloom_ops.optimal_n_bits(1000, 0.01)
    bits = bloom_ops.build_bloom(ref, F.col("k"), n_bits)
    probe = bloom_ops.might_contain_udf(bits)
    pos = bloom_ops.position_cols(F.col("k"), n_bits, 5)
    fp = other.withColumn("hit", probe(*pos)).agg(
        F.sum(F.col("hit").cast("long")).alias("n")
    ).collect()[0]["n"]
    assert fp < 5000 * 0.05  # 5x headroom over the 1% design point


def test_bloom_prune_superset_of_semi_join(spark):
    corpus = spark.range(0, 2000).select(
        (F.col("id") % 700).cast("string").alias("k"), F.col("id").alias("v")
    )
    ref = spark.range(0, 100).select(F.col("id").cast("string").alias("rk"))
    pruned = bloom_ops.bloom_prune(corpus, "k", ref, F.col("rk"))
    exact = corpus.join(ref, corpus.k == ref.rk, "left_semi")
    n_pruned = pruned.count()
    n_exact = exact.count()
    assert n_pruned >= n_exact
    # and exact-verify after the prune recovers exactly the semi-join
    verified = pruned.join(ref, pruned.k == ref.rk, "left_semi")
    assert verified.count() == n_exact


def test_oversize_raises(spark):
    ref = spark.range(0, 10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="MAX_BITS"):
        bloom_ops.build_bloom(ref, F.col("k"), bloom_ops.MAX_BITS * 2)


def test_build_bloom_sets_expected_bits(spark):
    """The packed array agrees with a NumPy recomputation of one key's
    positions (via the same Spark hash, so this checks the packing)."""
    ref = spark.createDataFrame([("solo",)], ["k"])
    n_bits = 1 << 12
    bits = bloom_ops.build_bloom(ref, F.col("k"), n_bits, k=3)
    pos = (
        ref.select(*bloom_ops.position_cols(F.col("k"), n_bits, 3))
        .collect()[0]
    )
    expected = np.zeros_like(bits)
    for p in pos:
        expected[p >> 3] |= np.uint8(1 << (p & 7))
    assert np.array_equal(bits, expected)


@pytest.mark.parametrize(
    "name",
    [
        "bloom_decontamination",
        "approx_quantile_contract",
        "event_rate_zscore",
        "funnel_conversion",
        "reservoir_sample_groups",
    ],
)
def test_analytics_queries_run(spark, name):
    from worlddatapipeline_spark.queries_analytics import ANALYTICS_QUERIES

    df = ANALYTICS_QUERIES[name](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) >= 1


def test_funnel_monotone(spark):
    from worlddatapipeline_spark.queries_analytics import q_funnel_conversion

    r = q_funnel_conversion(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_users"] >= r["n_view"] >= r["n_view_click"] >= r["n_full_funnel"]


def test_reservoir_sample_k_per_group(spark):
    from worlddatapipeline_spark.queries_analytics import (
        q_reservoir_sample_groups,
    )

    df = q_reservoir_sample_groups(spark, "/root/testdata/sf0.001")
    per = df.groupBy("event_type").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # deterministic across runs
    a = sorted(map(tuple, df.collect()))
    b = sorted(
        map(
            tuple,
            q_reservoir_sample_groups(spark, "/root/testdata/sf0.001").collect(),
        )
    )
    assert a == b


@pytest.mark.parametrize(
    "name",
    [
        "variant_props_extract",
        "recursive_discount_chain",
        "lateral_topk_suppliers",
        "pagerank_scores",
        "bfs_hops_from_hubs",
        "ewma_event_value",
        "partition_pruned_stats",
        "sql_udf_tokens",
        "event_value_rank_bands",
        "doc_chunk_windows",
        "incremental_dedup_audit",
        "csv_roundtrip_stats",
        "orc_roundtrip_stats",
        "jsonl_roundtrip_stats",
        "table_stats_contract",
        "value_histogram",
        "triangle_count",
        "session_funnel",
        "cohort_retention",
        "asof_next_click_after_view",
    ],
)
def test_engine_surface_queries_run(spark, name):
    from worlddatapipeline_spark.queries_analytics import ANALYTICS_QUERIES

    df = ANALYTICS_QUERIES[name](spark, "/root/testdata/sf0.001")
    assert len(df.collect()) >= 1


def test_recursive_chain_matches_window_product(spark):
    """The recursive compounding walk must equal the closed-form
    per-order product of (1-discount) computed with a plain aggregate."""
    from worlddatapipeline_spark.queries_analytics import (
        q_recursive_discount_chain,
    )
    from worlddatapipeline_spark.session import load_tables

    rec = {
        r["orderkey"]: (r["n_lines"], r["compounded_keep"])
        for r in q_recursive_discount_chain(spark, "/root/testdata/sf0.001").collect()
    }
    li = load_tables(spark, "/root/testdata/sf0.001", ["lineitem"])["lineitem"]
    agg = (
        li.filter(F.col("l_orderkey") % 11 == 0)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.exp(F.sum(F.log(F.lit(1.0) - F.col("l_discount")))), 4
            ).alias("prod"),
        )
        .collect()
    )
    assert len(agg) == len(rec)
    for r in agg:
        n_lines, comp = rec[r["l_orderkey"]]
        assert n_lines == r["n_lines"]
        assert abs(round(comp, 4) - r["prod"]) <= 1e-4


def test_lateral_topk_two_per_nation(spark):
    from worlddatapipeline_spark.queries_analytics import (
        q_lateral_topk_suppliers,
    )

    rows = q_lateral_topk_suppliers(spark, "/root/testdata/sf0.001").collect()
    from collections import Counter

    per = Counter(r["n_name"] for r in rows)
    assert all(c <= 2 for c in per.values())


def test_triangle_count_known_graph(spark):
    """Hand-checkable, against the SHIPPED kernel: suppliers
    {s1:(1,2,3), s2:(3,4)} → projection edges (1,2),(1,3),(2,3),(3,4)
    → exactly one triangle."""
    from worlddatapipeline_spark.queries_analytics import (
        count_triangles_in_projection,
    )

    ps = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (3, 20), (4, 20)], ["p", "s"]
    )
    assert (
        count_triangles_in_projection(ps).collect()[0]["n_triangles"] == 1
    )


def test_value_histogram_counts_sum_to_total(spark):
    from worlddatapipeline_spark.queries_analytics import q_value_histogram
    from worlddatapipeline_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    hist = q_value_histogram(spark, sf).collect()
    total = load_tables(spark, sf, ["events"])["events"].count()
    assert sum(r["n"] for r in hist) == total
    assert all(0 <= r["bin"] <= 19 for r in hist)
