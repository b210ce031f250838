"""Object-upload and video-encode sinks (operators/sinks.py)."""

import os

import pytest

from worlddatapipeline_spark.operators import sinks


def test_upload_files_counters_and_skip(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for name in ("a.bin", "b.bin", "readme.txt", "manifest"):
        (src / name).write_text(name)
    files = spark.createDataFrame(
        [(str(src / n), n) for n in ("a.bin", "b.bin", "readme.txt", "manifest")],
        "path string, relpath string",
    )
    uploadable = sinks.filter_uploadable(files)
    names = {r["relpath"] for r in uploadable.collect()}
    assert names == {"a.bin", "b.bin"}  # skip patterns drop txt + manifest

    target = str(tmp_path / "bucket")
    stats = sinks.upload_files(uploadable, target)
    assert stats == {"uploaded": 2, "skipped": 0, "failed": 0}
    assert sorted(os.listdir(target)) == ["a.bin", "b.bin"]

    # idempotent re-run: skip-existing
    stats2 = sinks.upload_files(uploadable, target)
    assert stats2 == {"uploaded": 0, "skipped": 2, "failed": 0}

    # a missing source counts as failed, others still land
    bad = spark.createDataFrame(
        [(str(src / "nope.bin"), "nope.bin")], "path string, relpath string"
    )
    stats3 = sinks.upload_files(bad, target)
    assert stats3 == {"uploaded": 0, "skipped": 0, "failed": 1}


def test_video_encode_plan_and_gated_exec(spark, tmp_path):
    frames = spark.createDataFrame(
        [
            ("seq_a", f"/renders/seq_a/{i:06d}.png") for i in range(48)
        ] + [
            ("seq_b", f"/renders/seq_b/{i:06d}.png") for i in range(24)
        ],
        "sequence_id string, path string",
    )
    plan = sinks.video_encode_plan(frames, "/out", fps=30, crf=23)
    rows = {r["sequence_id"]: r for r in plan.collect()}
    assert rows["seq_a"]["n_frames"] == 48
    assert rows["seq_a"]["input_pattern"] == "/renders/seq_a/%06d.png"
    assert rows["seq_b"]["output_path"] == "/out/seq_b.mp4"
    cmd = list(rows["seq_a"]["command"])
    assert cmd[0] == "ffmpeg" and "libx264" in cmd and "yuv420p" in cmd
    assert cmd[cmd.index("-crf") + 1] == "23"

    stats = sinks.execute_video_plan(plan)
    # container has no ffmpeg: everything skipped, nothing crashed
    assert stats["encoded"] + stats["skipped"] == 2 and stats["failed"] == 0
