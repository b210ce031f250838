"""Aggregation operator tests on literal frames (reference-shaped)."""

import pytest
from pyspark.sql import functions as F

from worlddatapipeline_spark.operators import aggregates


def test_conditional_stats(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("b", 2, "x"), ("c", 3, "y")], ["name", "n", "flag"]
    )
    out = aggregates.conditional_stats(
        df,
        {
            "total": F.count(F.lit(1)),
            "flagged": aggregates.count_when(F.col("flag").isNotNull()),
            "sum_n": F.sum("n"),
        },
    ).collect()[0]
    assert (out["total"], out["flagged"], out["sum_n"]) == (3, 2, 6)


def test_aabb(spark):
    df = spark.createDataFrame(
        [
            ("m1", 0.0, 0.0, 0.0, 1.0, 2.0, 3.0),
            ("m1", 10.0, -5.0, 2.0, 1.0, 1.0, 1.0),
        ],
        ["map", "origin_x", "origin_y", "origin_z", "extent_x", "extent_y", "extent_z"],
    )
    out = aggregates.aabb(df, ["map"]).collect()[0]
    assert out["min_x"] == -1.0 and out["max_x"] == 11.0
    assert out["min_y"] == -6.0 and out["max_y"] == 2.0
    assert out["min_z"] == -3.0 and out["max_z"] == 3.0


def test_grid_mode(spark):
    rows = [("m", 10.0, 10.0)] * 5 + [("m", 110.0, 10.0)] * 3
    df = spark.createDataFrame(rows, ["map", "x", "y"])
    out = aggregates.grid_mode(df, ["map"], "x", "y", 50.0).collect()[0]
    assert out["center_x"] == pytest.approx(25.0)
    assert out["cell_count"] == 5


def test_histogram_mode(spark):
    rows = [("m", 0.1)] * 2 + [("m", 5.2)] * 4 + [("m", 5.4)] * 1
    df = spark.createDataFrame(rows, ["map", "z"])
    out = aggregates.histogram_mode(df, ["map"], "z", 0.5).collect()[0]
    # densest bucket floor(z/0.5)=10 holds 5.2 x4 and 5.4... floor(5.4/0.5)=10
    assert out["bucket"] == 10
    assert out["bucket_count"] == 5
    assert out["mode_mean"] == pytest.approx((5.2 * 4 + 5.4) / 5)


def test_ratio_classify(spark):
    rows = [("m1", 5.0)] * 7 + [("m1", -5.0)] * 3 + [("m2", -1.0)] * 10
    df = spark.createDataFrame(rows, ["map", "z"])
    out = aggregates.ratio_classify(
        df, ["map"], F.col("z") > 0, 0.5, "Plain", "Valley"
    ).collect()
    got = {r["map"]: (r["ratio"], r["label"]) for r in out}
    assert got["m1"][0] == pytest.approx(0.7) and got["m1"][1] == "Plain"
    assert got["m2"][1] == "Valley"


def test_argmax(spark):
    df = spark.createDataFrame(
        [("g", 1, "a"), ("g", 9, "b"), ("g", 4, "c")], ["grp", "score", "payload"]
    )
    out = aggregates.argmax(df, ["grp"], "score", ["payload"]).collect()[0]
    assert out["max_score"] == 9 and out["payload"] == "b"


def test_skyline_2d_dominance_and_ties(spark):
    """Dominated rows drop; exact-duplicate frontier points ALL survive
    (neither strictly beats its twin); equal-x smaller-y drops."""
    from worlddatapipeline_spark.operators.aggregates import skyline_2d

    df = spark.createDataFrame(
        [
            (1, 10.0, 5),   # frontier
            (2, 10.0, 5),   # exact duplicate of the frontier point
            (3, 10.0, 4),   # same price, smaller size -> dominated
            (4, 12.0, 5),   # pricier, same size -> dominated
            (5, 12.0, 9),   # frontier (bigger size costs more)
            (6, 8.0, 2),    # frontier (cheapest)
            (7, 9.0, 1),    # dominated by 6 (pricier AND smaller)
        ],
        "id int, price double, size int",
    )
    kept = sorted(
        r["id"]
        for r in skyline_2d(df, "price", "size").collect()
    )
    assert kept == [1, 2, 5, 6]


def test_skyline_2d_direction_flags(spark):
    """maximize_x/minimize_y quadrant: same kernel, negated axes."""
    from worlddatapipeline_spark.operators.aggregates import skyline_2d

    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 2.0), (3, 3.0, 3.0)],
        "id int, x double, y double",
    )
    # maximize x, minimize y: (1,1) and (3,3) are incomparable corners,
    # (2,2) is dominated by neither -> chain means all survive except none;
    # flip: dominance needs x' >= x AND y' <= y with one strict -> none
    # dominates anything on an increasing chain, so all 3 survive.
    kept = sorted(
        r["id"]
        for r in skyline_2d(df, "x", "y", minimize_x=False, maximize_y=False).collect()
    )
    assert kept == [1, 2, 3]
    # minimize x, minimize y on the same chain: (1,1) dominates the rest.
    kept = sorted(
        r["id"]
        for r in skyline_2d(df, "x", "y", minimize_x=True, maximize_y=False).collect()
    )
    assert kept == [1]


def test_skyline_2d_matches_bruteforce_random(spark):
    """Property check vs an O(n^2) reference on a seeded random cloud that
    spans many partitions (exercises the local-prune + merge path)."""
    import random

    from worlddatapipeline_spark.operators.aggregates import skyline_2d

    rng = random.Random(7)
    pts = [(i, rng.randint(0, 30) * 1.0, rng.randint(0, 30)) for i in range(400)]
    df = spark.createDataFrame(pts, "id int, x double, y int").repartition(16)
    kept = sorted(r["id"] for r in skyline_2d(df, "x", "y").collect())
    expected = sorted(
        i
        for (i, x, y) in pts
        if not any(
            qx <= x and qy >= y and (qx < x or qy > y) for (_, qx, qy) in pts
        )
    )
    assert kept == expected


def test_skyline_2d_null_and_nan_rows_excluded(spark):
    """NULL/NaN coordinates are incomparable: excluded from the frontier
    AND harmless to it (a NaN must not poison the local running max)."""
    from worlddatapipeline_spark.operators.aggregates import skyline_2d

    df = spark.createDataFrame(
        [
            (1, 1.0, None),          # NULL y -> excluded
            (2, 2.0, 5),             # true frontier point
            (3, None, 9),            # NULL x -> excluded
            (4, float("nan"), 7),    # NaN x -> excluded
            (5, 3.0, 1),             # dominated by 2
        ],
        "id int, x double, y int",
    )
    kept = sorted(r["id"] for r in skyline_2d(df, "x", "y").collect())
    assert kept == [2]
