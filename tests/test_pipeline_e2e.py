"""Golden end-to-end pipeline test — SURVEY.md §5 test-plan item 3.

Chains the full sequence-generation dataflow the reference runs per sequence
(`worker_create.py:292-490` nine-step pipeline, §3 EP2), all engine-side:

  jobs → seeded simulation → fixed-speed truncation → arc-length resample
  → yaw/pitch from trajectory → unwrap + rate-limit sanitize → extrinsics
  → camera CSV export

Seeded, so the whole artifact is deterministic: the test asserts structural
invariants AND an exact end-to-end fingerprint of the exported rows across
two independent runs.
"""

import pytest
from pyspark.sql import functions as F

from worlddatapipeline_spark.operators import export as export_ops
from worlddatapipeline_spark.operators import simulate as sim_ops
from worlddatapipeline_spark.operators import stateful as stateful_ops
from worlddatapipeline_spark.operators import windows as win_ops


def _run_pipeline(spark):
    jobs = spark.createDataFrame(
        [("seq_a", 101), ("seq_b", 202)], "sequence_id string, seed long"
    )
    poses = sim_ops.simulate_jobs(jobs, n_segments=4, steps_per_segment=15)

    # fixed-speed fit: cut each trajectory at speed*duration arc length
    cut = win_ops.fixed_speed_truncate(
        poses.select("sequence_id", F.col("point_idx").alias("ord"), "x", "y", "z"),
        "sequence_id", "ord", speed=120.0, duration=8.0,
    )
    # resample to a uniform 24-point grid in arc length
    grid = win_ops.arc_length_resample(cut, "sequence_id", "ord", 24)
    # derive angles from the resampled trajectory
    ang = win_ops.yaw_from_trajectory(grid, "sequence_id", "k")
    ang = win_ops.pitch_from_slope(ang, "sequence_id", "k", min_pitch=-60.0, max_pitch=60.0)
    # sanitize: unwrap yaw, then rate-limit pitch into a clamp range
    ang = win_ops.unwrap_angle(ang, "sequence_id", "k", "yaw", "yaw_u")
    ang = stateful_ops.rate_limit(
        ang, "sequence_id", "k", "pitch", max_rate=20.0, dt=1.0,
        lo=-45.0, hi=45.0, out_col="pitch_l",
    )
    return ang.select(
        "sequence_id",
        F.col("k").alias("frame"),
        "x", "y", "z",
        F.col("yaw_u").alias("yaw"),
        F.col("pitch_l").alias("pitch"),
        F.lit(0.0).alias("roll"),
    )


def _fingerprint(df):
    return (
        df.select(
            F.md5(
                F.concat_ws(
                    "|",
                    "sequence_id",
                    F.col("frame").cast("string"),
                    *[F.format_number(c, 6) for c in ("x", "y", "z", "yaw", "pitch")],
                )
            ).alias("h")
        )
        .agg(F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("fp"))
        .collect()[0]["fp"]
    )


def test_pipeline_shape_and_invariants(spark):
    out = _run_pipeline(spark).cache()
    rows = out.collect()
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["sequence_id"], []).append(r)
    assert set(by_seq) == {"seq_a", "seq_b"}
    for seq, rs in by_seq.items():
        assert len(rs) == 24  # resample grid size
        rs = sorted(rs, key=lambda r: r["frame"])
        # pitch rate-limit + clamp invariants
        pitches = [r["pitch"] for r in rs]
        assert all(-45.0 - 1e-9 <= p <= 45.0 + 1e-9 for p in pitches)
        assert all(
            abs(b - a) <= 20.0 + 1e-9 for a, b in zip(pitches, pitches[1:])
        )
        # unwrapped yaw continuity: no step over 180
        yaws = [r["yaw"] for r in rs]
        assert all(abs(b - a) <= 180.0 + 1e-9 for a, b in zip(yaws, yaws[1:]))


def test_pipeline_deterministic_and_exports(spark, tmp_path):
    a = _run_pipeline(spark)
    b = _run_pipeline(spark)
    fp_a, fp_b = _fingerprint(a), _fingerprint(b)
    assert fp_a == fp_b

    export_ops.write_camera_csvs(a, str(tmp_path / "cams"))
    t = spark.read.csv(str(tmp_path / "cams" / "transform"), header=True)
    e = spark.read.csv(str(tmp_path / "cams" / "extrinsic"), header=True)
    assert t.count() == 48 and e.count() == 48
    assert set(t.columns) >= {"frame", "loc_x", "loc_y", "loc_z", "rot_x", "rot_y", "rot_z"}
    assert set(e.columns) >= {"frame", "m00", "m33"}
    # partitioned layout: one directory per sequence
    dirs = {p.name for p in (tmp_path / "cams" / "transform").iterdir() if p.is_dir()}
    assert dirs == {"sequence_id=seq_a", "sequence_id=seq_b"}
