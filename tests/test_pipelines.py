"""Manifest-driven job pipelines (plans/pipelines.py) — the app.py analog.

Each test feeds a tiny fixture through one job type and checks the shape +
the manifest-driven knobs (template merge, date suffix, exclusions)."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from worlddatapipeline_spark.plans import pipelines


def _files(spark):
    rows = [
        ("CityA", "Downtown", "/p/CityA/Content/Maps/Downtown.umap", 100),
        ("CityA", "Downtown_Overview", "/p/CityA/Content/Maps/Ov.umap", 10),
        ("CityA", "Harbor", "/p/CityA/Content/Maps/Harbor.umap", 200),
        ("__ExternalActors__", "X", "/p/sys/X.umap", 5),
        ("CityB", "Plains", "/p/CityB/Content/Maps/Plains.umap", 300),
    ]
    return spark.createDataFrame(
        rows, "scene_name string, map_name string, path string, size long"
    )


def test_scan_job_excludes_and_nests(spark):
    out = pipelines.run_scan_job(spark, _files(spark))
    scenes = {r["scene_name"]: r for r in out["scenes"].collect()}
    assert set(scenes) == {"CityA", "CityB"}  # system dir dropped
    assert scenes["CityA"]["file_count"] == 2  # Overview map excluded
    doc = {r["scene_name"]: r for r in out["document"].collect()}
    assert doc["CityA"]["map_count"] == 2
    assert [m["map_name"] for m in doc["CityA"]["maps"]] == ["Downtown", "Harbor"]
    stats = out["stats"].collect()[0]
    assert stats["total_scenes"] == 2 and stats["total_files"] == 3


def test_bake_plan_flags_and_bounds(spark):
    maps = spark.createDataFrame(
        [("Downtown",), ("Plains",)], "map_name string"
    )
    actor_rows = [
        ("Downtown", float(i % 10) * 100, float(i // 10) * 100, 50.0, 10.0, 10.0, 5.0)
        for i in range(60)
    ] + [("Plains", 0.0, 0.0, 0.0, 1.0, 1.0, 1.0)] * 3
    actors = spark.createDataFrame(
        actor_rows,
        "map_name string, origin_x double, origin_y double, origin_z double, "
        "extent_x double, extent_y double, extent_z double",
    )
    plan = {r["map_name"]: r for r in pipelines.run_bake_plan(
        spark, maps, actors, {"low_actor_threshold": 50}
    ).collect()}
    assert plan["Downtown"]["should_bake"] and plan["Plains"]["low_actor"]
    assert plan["Downtown"]["min_x"] == -10.0
    assert plan["Downtown"]["max_x"] == 910.0
    assert plan["Downtown"]["cell_count"] == 60  # one 5 km cell holds all
    assert plan["Plains"]["n_actors"] == 3


def test_sequence_job_deterministic_and_exports(spark, tmp_path):
    maps = spark.createDataFrame([("Demo",)], "map_name string")
    man = {"sequences_per_map": 2, "resample_points": 16, "n_segments": 3,
           "steps_per_segment": 10}
    a = pipelines.run_sequence_job(spark, maps, man).collect()
    b = pipelines.run_sequence_job(spark, maps, man).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))  # seeded determinism
    seqs = {r["sequence_id"] for r in a}
    assert seqs == {"Demo_000", "Demo_001"}
    per_seq = sum(1 for r in a if r["sequence_id"] == "Demo_000")
    assert per_seq == 16
    out_dir = str(tmp_path / "cams")
    pipelines.run_sequence_job(spark, maps, man, output_dir=out_dir)
    t = spark.read.csv(f"{out_dir}/transform", header=True)
    assert t.count() == 32


def test_render_plan_prefix_match_and_date_suffix(spark):
    sequences = spark.createDataFrame(
        [("Demo001",), ("Demo002",), ("Other9",)], "sequence_name string"
    )
    maps = spark.createDataFrame([("Demo",), ("Harbor",)], "map_name string")
    man = {"output_base_dir": "out/renders"}
    # pin today via merge_manifest's date handling: do the merge here
    plan = pipelines.run_render_plan(spark, sequences, maps, man)
    rows = plan.collect()
    assert {r["sequence_name"] for r in rows} == {"Demo001", "Demo002"}
    today = date.today().isoformat()
    assert all(r["output_path"].startswith(f"out/renders/{today}/Demo/") for r in rows)


def test_reconcile_job_statuses(spark):
    catalog = spark.createDataFrame(
        [("s1", True), ("s2", False), ("s3", True)],
        "scene_name string, exists_flag boolean",
    )
    listing = spark.createDataFrame([("s1",), ("s2",), ("s9",)], "scene_name string")
    out = pipelines.run_reconcile_job(spark, catalog, listing, ["scene_name"])
    st = {r["scene_name"]: r["sync_status"] for r in out["annotated"].collect()}
    assert st == {"s1": "verified", "s2": "recovered", "s3": "missing", "s9": "untracked"}
    stats = {r["sync_status"]: r["n"] for r in out["stats"].collect()}
    assert stats == {"verified": 1, "recovered": 1, "missing": 1, "untracked": 1}
