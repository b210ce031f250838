"""Semantic unit tests for the TPC-H-shaped query batch (queries_tpch.py)."""

from pyspark.sql import functions as F

from worlddatapipeline_spark.operators.aggregates import salted_sum
from worlddatapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_salted_sum_matches_plain_groupby(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", 10.0), ("a", -1.0), ("c", 0.0)],
        "k string, v double",
    )
    got = {
        r["k"]: r["total"]
        for r in salted_sum(df, ["k"], "v", "total", n_salts=4).collect()
    }
    assert got == {"a": 3.0, "b": 10.0, "c": 0.0}


def test_event_percentiles_ordered(spark):
    rows = QUERIES["event_value_percentiles"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["p50"] <= r["p95"] <= r["p99"]
        assert r["n_events"] > 0


def test_top_supplier_revenue_is_max(spark):
    rows = QUERIES["top_supplier_revenue"](spark, SF).collect()
    assert len(rows) >= 1
    # every returned supplier carries the same (maximal) revenue
    assert len({r["total_revenue"] for r in rows}) == 1


def test_large_order_threshold_respected(spark):
    rows = QUERIES["large_order_customers"](spark, SF).collect()
    assert all(r["total_qty"] > 300 for r in rows)


def test_returned_top_customers_sorted_desc(spark):
    rows = QUERIES["returned_top_customers"](spark, SF).collect()
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert len(rows) <= 20


def test_idle_high_balance_customers_runs(spark):
    rows = QUERIES["idle_high_balance_customers"](spark, SF).collect()
    assert all(r["n_customers"] > 0 for r in rows)
