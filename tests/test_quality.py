"""Data-quality constraint suite tests — a dirty frame exercising every
check kind with REAL violations (the registry query's corpus is clean)."""

from pyspark.sql import functions as F

from worlddatapipeline_spark.operators import quality as Q


def test_check_constraints_dirty_frame(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "A", 5.0),
            (1, 20, "B", -1.0),    # dup id; bad range
            (2, None, "Z", 3.0),   # null fk; bad domain
            (3, 99, "A", None),    # orphan fk; NULL range value (no violation)
        ],
        "id int, cust int, status string, price double",
    )
    ref = spark.createDataFrame([(10,), (20,)], "ck int")
    rep = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in Q.check_constraints(
            df,
            [
                Q.unique(["id"]),
                Q.not_null("cust"),
                Q.in_set("status", ["A", "B"]),
                Q.in_range("price", 0.0, 100.0),
                Q.satisfies("price_not_tiny", F.col("price") < 0.001),
                Q.foreign_key(["cust"], ref, ["ck"]),
            ],
        ).collect()
    }
    assert rep["unique(id)"] == (2, False)          # both dup rows count
    assert rep["not_null(cust)"] == (1, False)
    assert rep["in_set(status)"] == (1, False)
    assert rep["in_range(price)"] == (1, False)     # NULL price doesn't violate
    assert rep["price_not_tiny"] == (1, False)      # -1.0 < 0.001
    assert rep["foreign_key(cust)"] == (1, False)   # 99 orphan; NULL skipped


def test_check_constraints_clean_frame(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id int, s string")
    rep = Q.check_constraints(
        df, [Q.unique(["id"]), Q.not_null("s"), Q.in_set("s", ["A", "B"])]
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)
    assert len(rep) == 3


def test_check_constraints_empty_suite(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = Q.check_constraints(df, [])
    assert out.count() == 0
    assert out.columns == ["check_name", "n_violations", "passed"]
