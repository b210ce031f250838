"""Manifest deep-merge config model tests (job_utils semantics)."""

from datetime import date

import pytest

from worlddatapipeline_spark.plans import manifests


def test_deep_merge_nested():
    base = {"a": 1, "b": {"x": 1, "y": 2}, "c": [1, 2]}
    over = {"b": {"y": 9, "z": 3}, "c": [9]}
    out = manifests.deep_merge(base, over)
    assert out == {"a": 1, "b": {"x": 1, "y": 9, "z": 3}, "c": [9]}
    assert base["b"]["y"] == 2  # no mutation


def test_apply_date_suffix():
    m = {
        "output_base_dir": "/out/render",
        "nested": {"frame_output_dir": "/out/frames/"},
        "already": {"output_dir": "/out/x/2024-01-05"},
        "not_output": "/plain/path",
    }
    out = manifests.apply_date_suffix(m, today=date(2024, 3, 4))
    assert out["output_base_dir"] == "/out/render/2024-03-04"
    assert out["nested"]["frame_output_dir"] == "/out/frames/2024-03-04"
    assert out["already"]["output_dir"] == "/out/x/2024-01-05"
    assert out["not_output"] == "/plain/path"


def test_resolve_defaults():
    m = {"engine": {"path": "default"}, "fps": "default", "keep": "x"}
    d = {"engine": {"path": "/ue/editor"}, "fps": 30}
    out = manifests.resolve_defaults(m, d)
    assert out["engine"]["path"] == "/ue/editor"
    assert out["fps"] == 30 and out["keep"] == "x"


def test_merge_manifest_precedence():
    template = {"fps": 24, "res": {"w": 1280, "h": 720}, "output_dir": "/t/out"}
    defaults = {"fps": 30, "quality": "high"}
    manifest = {"res": {"w": 1920}, "output_dir": "/m/out"}
    out = manifests.merge_manifest(
        manifest, defaults=defaults, template=template, today=date(2024, 3, 4)
    )
    assert out["fps"] == 30            # defaults beat template
    assert out["res"] == {"w": 1920, "h": 720}  # manifest merges over template
    assert out["output_dir"] == "/m/out/2024-03-04"  # manifest wins + dated
    assert out["quality"] == "high"


def test_load_manifest(tmp_path):
    p = tmp_path / "job.json"
    p.write_text('{"type": "render", "output_base_dir": "/out/r"}')
    out = manifests.load_manifest(str(p), today=date(2024, 3, 4))
    assert out["output_base_dir"] == "/out/r/2024-03-04"


def test_manifest_rows_to_df(spark):
    df = manifests.manifest_rows_to_df(
        spark,
        [{"type": "render", "output_base_dir": "/o1"}, {"type": "bake"}],
    )
    rows = {r["job_type"]: r["output_base_dir"] for r in df.collect()}
    assert rows == {"render": "/o1", "bake": None}
