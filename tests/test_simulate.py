"""Behavior simulation tests: determinism, failure cutoff, segment records."""

import numpy as np
import pytest

from worlddatapipeline_spark.operators import simulate


def test_determinism_same_seed():
    p1, s1, a1 = simulate.simulate_sequence(42)
    p2, s2, a2 = simulate.simulate_sequence(42)
    assert np.array_equal(p1, p2) and s1 == s2 and a1 == a2


def test_different_seeds_differ():
    p1, _, _ = simulate.simulate_sequence(1)
    p2, _, _ = simulate.simulate_sequence(2)
    assert p1.shape != p2.shape or not np.array_equal(p1, p2)


def test_bounds_respected():
    bounds = (-500.0, -500.0, 500.0, 500.0)
    pts, _, _ = simulate.simulate_sequence(7, bounds=bounds, speed=200.0)
    assert pts[:, 0].min() >= bounds[0] and pts[:, 0].max() <= bounds[2]
    assert pts[:, 1].min() >= bounds[1] and pts[:, 1].max() <= bounds[3]


def test_failure_cutoff_aborts():
    # box smaller than one step: every translate fails -> abort
    pts, segs, aborted = simulate.simulate_sequence(
        3, bounds=(-10.0, -10.0, 10.0, 10.0), speed=1000.0, n_segments=50
    )
    assert aborted
    assert len(segs) < 50


def test_segments_cover_points():
    pts, segs, _ = simulate.simulate_sequence(11)
    assert segs[0]["start_idx"] == 0
    for a, b in zip(segs, segs[1:]):
        assert b["start_idx"] == a["end_idx"]
    assert segs[-1]["end_idx"] == len(pts) - 1
    assert all(s["type"] in simulate.BEHAVIORS for s in segs)


def test_simulate_jobs_spark(spark):
    jobs = spark.createDataFrame(
        [("seq_a", 42), ("seq_b", 43)], ["sequence_id", "seed"]
    )
    out = simulate.simulate_jobs(jobs, n_segments=3, steps_per_segment=10)
    rows = out.collect()
    seqs = {r["sequence_id"] for r in rows}
    assert seqs == {"seq_a", "seq_b"}
    # per-sequence output matches the pure-python generator (determinism
    # across the Spark boundary)
    a_rows = sorted(
        (r for r in rows if r["sequence_id"] == "seq_a"), key=lambda r: r["point_idx"]
    )
    pts, _, _ = simulate.simulate_sequence(42, n_segments=3, steps_per_segment=10)
    assert len(a_rows) == len(pts)
    assert a_rows[5]["x"] == pytest.approx(pts[5][0])
    assert a_rows[5]["yaw"] == pytest.approx(pts[5][3])
