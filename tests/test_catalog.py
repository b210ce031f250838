"""Catalog registry query tests (reference get_statistics & friends)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from worlddatapipeline_spark.catalog import registry, schemas


def _scenes(spark):
    rows = [
        ("S_A", "bos://b/baked/S_A/", None, "h1", 10, 1000, True,
         None, datetime(2024, 1, 2), datetime(2024, 1, 2), ("ue", "1")),
        ("S_B", "bos://b/baked/S_B/", "/local/S_B", "h2", 20, 2000, True,
         None, None, datetime(2024, 1, 3), ("ue", "1")),
        ("S_C", "bos://b/baked/S_C/", None, None, 5, 500, False,
         None, None, datetime(2024, 1, 4), ("ue", "2")),
    ]
    return spark.createDataFrame(rows, schemas.SCENES)


def _maps(spark):
    rows = [
        (1, "S_A", "Demo", "/Game/S_A/Maps/Demo", True, "nh1", None, True, None, None),
        (2, "S_A", "Town", "/Game/S_A/Maps/Town", False, None, None, False, None, None),
        (3, "S_B", "Demo", "/Game/S_B/Demo", True, "nh2", None, True, None, None),
    ]
    return spark.createDataFrame(rows, schemas.MAPS)


def _sequences(spark):
    rows = [
        (1, "S_A", "Demo", "Demo_001", "/Game/S_A/Sequence/Demo_001", None,
         42, 120.0, datetime(2024, 1, 5), datetime(2024, 1, 6), None),
        (2, "S_A", "Demo", "Demo_003", "/Game/S_A/Sequence/Demo_003", None,
         43, 120.0, datetime(2024, 1, 6), None, None),
        (3, "S_B", "Demo", "Demo_001", "/Game/S_B/Sequence/Demo_001", None,
         44, 60.0, datetime(2024, 1, 7), datetime(2024, 1, 8), None),
    ]
    return spark.createDataFrame(rows, schemas.SEQUENCES)


def test_registry_statistics(spark):
    out = registry.registry_statistics(
        _scenes(spark), _maps(spark), _sequences(spark)
    ).collect()[0]
    assert out["total_scenes"] == 3
    assert out["downloaded_scenes"] == 1
    assert out["bos_verified_scenes"] == 2
    assert out["total_files"] == 35
    assert out["total_size_bytes"] == 3500
    assert out["total_maps"] == 3 and out["navmesh_baked_maps"] == 2
    assert out["total_sequences"] == 3 and out["uploaded_sequences"] == 2
    assert out["total_hours"] == pytest.approx(300.0 / 3600.0, abs=1e-4)


def test_list_scenes_filters(spark):
    s = _scenes(spark)
    assert registry.list_scenes(s).count() == 3
    assert registry.list_scenes(s, downloaded_only=True).count() == 1
    assert registry.list_scenes(s, bos_exists=False).count() == 1


def test_list_sequences(spark):
    q = _sequences(spark)
    out = registry.list_sequences(q, scene_name="S_A").collect()
    assert [r["sequence_name"] for r in out] == ["Demo_003", "Demo_001"]
    assert registry.list_sequences(q, uploaded_only=True).count() == 2


def test_scenes_document_export(spark):
    scan_rows = [
        ("S_A", "S_A", None, None, "/Game/S_A", None, False, True, None),
        ("S_NoMaps", "S_NoMaps", None, None, "/Game/S_NoMaps", None, False, False, None),
    ]
    scan = spark.createDataFrame(scan_rows, schemas.SCENES_SCAN)
    out = registry.scenes_document_export(scan, _maps(spark)).collect()
    got = {r["scene_name"]: r for r in out}
    assert got["S_A"]["map_count"] == 2
    assert [m["map_name"] for m in got["S_A"]["maps"]] == ["Demo", "Town"]
    assert got["S_NoMaps"]["map_count"] == 0 and got["S_NoMaps"]["maps"] == []


def test_document_export_roundtrip_json(spark, tmp_path):
    """Write the nested doc as JSON and read it back — the scenes.json
    dual-store mirror (`scene_scanner.py:530-587`) without the dual-write."""
    scan = spark.createDataFrame(
        [("S_A", "S_A", None, None, "/Game/S_A", None, False, True, None)],
        schemas.SCENES_SCAN,
    )
    doc = registry.scenes_document_export(scan, _maps(spark))
    p = str(tmp_path / "scenes_json")
    doc.select("scene_name", "maps", "map_count").write.mode("overwrite").json(p)
    back = spark.read.json(p).collect()[0]
    assert back["map_count"] == 2
    assert sorted(m["map_name"] for m in back["maps"]) == ["Demo", "Town"]


def test_next_sequence_index(spark):
    out = registry.next_sequence_index(_sequences(spark)).collect()
    got = {(r["scene_name"], r["map_name"]): r["next_index"] for r in out}
    assert got[("S_A", "Demo")] == 4  # max(Demo_001, Demo_003) + 1
    assert got[("S_B", "Demo")] == 2


def test_cascading_delete(spark):
    s, m, q = registry.cascading_delete(
        _scenes(spark), _maps(spark), _sequences(spark), ["S_A"]
    )
    assert s.count() == 2 and m.count() == 1 and q.count() == 1
    assert not any(r["scene_name"] == "S_A" for r in m.collect())
