"""Tests for physical table layout (catalog/layout.py): partition pruning,
shuffle-free bucketed joins, small-file compaction."""

import os

from pyspark.sql import functions as F

from worlddatapipeline_spark.catalog.layout import (
    compact,
    write_bucketed,
    write_partitioned,
)


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("scene"),
        (F.col("id") * 2.5).alias("v"),
    )
    path = str(tmp_path / "part")
    write_partitioned(df, path, ["scene"])
    # hive layout on disk
    assert sorted(d for d in os.listdir(path) if d.startswith("scene=")) == [
        "scene=0", "scene=1", "scene=2", "scene=3",
    ]
    # one file per partition directory (plus marker files)
    files = [
        f for f in os.listdir(os.path.join(path, "scene=2"))
        if f.endswith(".parquet")
    ]
    assert len(files) == 1
    back = spark.read.parquet(path).filter(F.col("scene") == "2")
    assert back.count() == 250
    # a partition filter prunes to one directory's files
    scan = _plan(back)
    assert "PartitionFilters" in scan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    for t in ("t_orders_b", "t_lines_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.range(500).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    lines = spark.range(2000).select(
        (F.col("id") % 500).alias("l_key"), (F.col("id") * 1.5).alias("l_val")
    )
    write_bucketed(orders, "t_orders_b", ["o_key"], 4, sort_cols=["o_key"])
    write_bucketed(lines, "t_lines_b", ["l_key"], 4, sort_cols=["l_key"])
    # force the shuffle-join path (tiny test tables would otherwise
    # broadcast, which bypasses bucketing entirely) — at fact-fact scale
    # this is the planner's own choice
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(
            spark.table("t_lines_b"),
            F.col("o_key") == F.col("l_key"),
        )
        plan = _plan(joined)
        # the whole point: co-bucketed equi-join shuffles NOTHING
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compact_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    spark.range(10000).repartition(16).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 16
    n = compact(spark, src, dst, target_file_mb=128)
    assert n == 1
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst == 1
    assert spark.read.parquet(dst).count() == 10000


def test_zorder_key_interleave(spark):
    """Hand-checked Morton codes + locality property."""
    from pyspark.sql import functions as F

    from worlddatapipeline_spark.catalog.layout import zorder_key, zorder_key_sql

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (15, 15)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y"), 4).alias("z")).collect()
    }
    # bit-interleave: z(x,y) = x bits at even positions, y bits at odd
    assert out[(0, 0)] == 0 and out[(1, 0)] == 1 and out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    assert out[(2, 3)] == 0b1110          # x=10 -> 1_0_, y=11 -> _1_1
    assert out[(15, 15)] == 255
    # SQL restatement produces identical keys
    df.createOrReplaceTempView("zt")
    sql = {
        (r["x"], r["y"]): r["z"]
        for r in spark.sql(
            f"SELECT x, y, {zorder_key_sql('x', 'y', 4)} AS z FROM zt"
        ).collect()
    }
    assert sql == out


def test_compact_zorder_writes_clustered_files(spark, tmp_path):
    """compact(zorder_cols=...) must produce files internally SORTED by the
    Morton key (row-group min/max pruning on both columns depends on it),
    and round-trip every row."""
    from pyspark.sql import functions as F

    from worlddatapipeline_spark.catalog import layout

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.range(50_000).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") / 64).cast("long") % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    # shuffle the write order so sortedness can't be accidental
    df.orderBy(F.xxhash64("payload")).write.parquet(src)
    n = layout.compact(
        spark, src, dst, target_file_mb=1, zorder_cols=("x", "y"), zorder_bits=6
    )
    assert n >= 1
    out = spark.read.parquet(dst)
    assert out.count() == 50_000
    key = layout.zorder_key(F.col("x"), F.col("y"), bits=6)
    keyed = out.select(
        F.input_file_name().alias("f"), key.alias("z")
    ).withColumn("rid", F.monotonically_increasing_id())
    # within every file, zkey must be non-decreasing in physical row order
    from pyspark.sql import Window

    w = Window.partitionBy("f").orderBy("rid")
    bad = (
        keyed.withColumn("prev", F.lag("z").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("z") < F.col("prev")))
        .count()
    )
    assert bad == 0
