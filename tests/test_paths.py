"""Path algebra function tests (reference §2.7 semantics)."""

import pytest
from pyspark.sql import functions as F

from worlddatapipeline_spark.functions import paths


def _one(spark, s, expr):
    return (
        spark.createDataFrame([(s,)], "p string")
        .select(expr(F.col("p")).alias("v"))
        .collect()[0]["v"]
    )


def test_ue_asset_path(spark):
    got = _one(
        spark, "F:/Proj/Content/SceneA/Maps/Demo.umap", paths.ue_asset_path
    )
    assert got == "/Game/SceneA/Maps/Demo"


def test_fs_relative_path(spark):
    assert _one(spark, "/Game/SceneA/Maps/Demo", paths.fs_relative_path) == "SceneA/Maps/Demo"


def test_package_and_asset(spark):
    got = _one(spark, "/Game/S/Seq/Demo001.Demo001", paths.package_and_asset)
    assert got["package"] == "/Game/S/Seq/Demo001" and got["asset"] == "Demo001"
    got2 = _one(spark, "/Game/S/Seq/Demo001", paths.package_and_asset)
    assert got2["asset"] == "Demo001"


def test_numeric_suffix(spark):
    assert _one(spark, "Demo_001", paths.strip_numeric_suffix) == "Demo"
    assert _one(spark, "Demo_001", paths.numeric_suffix) == 1
    assert _one(spark, "Demo", paths.numeric_suffix) is None


def test_scene_id_predicate(spark):
    assert _one(spark, "S1234", paths.is_scene_id) is True
    assert _one(spark, "S123", paths.is_scene_id) is False
    assert _one(spark, "X1234", paths.is_scene_id) is False


def test_date_suffix(spark):
    assert _one(spark, "/out/render/2024-01-05", paths.has_date_suffix) is True
    assert _one(spark, "/out/render", paths.has_date_suffix) is False
    got = _one(
        spark,
        "/out/render/",
        lambda c: paths.with_date_suffix(c, F.lit("2024-03-04").cast("date")),
    )
    assert got == "/out/render/2024-03-04"
    # already dated -> unchanged
    got2 = _one(
        spark,
        "/out/render/2024-01-05",
        lambda c: paths.with_date_suffix(c, F.lit("2024-03-04").cast("date")),
    )
    assert got2 == "/out/render/2024-01-05"


def test_stem_ext(spark):
    assert _one(spark, "/a/b/Demo.umap", paths.path_stem) == "Demo"
    assert _one(spark, "/a/b/Demo.UMAP", paths.path_ext) == "umap"
    assert _one(spark, "/a/b/Demo", paths.path_ext) == ""


def test_human_bytes(spark):
    assert _one(spark, None, lambda c: paths.human_bytes(F.lit(512))) == "512 B"
    assert _one(spark, None, lambda c: paths.human_bytes(F.lit(2048))) == "2.0 KB"
    assert (
        _one(spark, None, lambda c: paths.human_bytes(F.lit(3 * 1024**3)))
        == "3.0 GB"
    )


def test_glob_to_rlike(spark):
    rx = paths.glob_to_rlike("*.txt")
    df = spark.createDataFrame([("a.txt",), ("a.txts",), ("b.url",)], ["n"])
    got = [r["n"] for r in df.filter(F.col("n").rlike(rx)).collect()]
    assert got == ["a.txt"]


def test_excluded_by_patterns(spark):
    df = spark.createDataFrame(
        [("OverviewMap",), ("DemoLevel",), ("my_prop_shelf",)], ["n"]
    )
    out = df.filter(
        ~paths.excluded_by_patterns(F.col("n"), ["overview", "prop"])
    ).collect()
    assert [r["n"] for r in out] == ["DemoLevel"]


def test_excluded_system_dir(spark):
    df = spark.createDataFrame(
        [("__ExternalActors__",), ("_hidden",), ("SceneA",)], ["n"]
    )
    out = df.filter(~paths.excluded_system_dir(F.col("n"))).collect()
    assert [r["n"] for r in out] == ["SceneA"]
