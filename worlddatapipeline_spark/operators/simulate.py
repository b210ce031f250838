"""Seeded behavior simulation (SURVEY.md §2.11.2, §3 EP2).

The reference's trajectory generator (`behavior_executor.py:638-857`, ~220
LoC) is a sequential seeded loop: pick a behavior by normalized weights
(`:574-635`), execute it step-by-step against a NavMesh oracle, record
points/yaws/pitches and segment records (`:804-810`), abort after 5
consecutive failures (`:731-733,829-834`).

Spark restatement: the loop is irreducibly sequential *within* one sequence,
so it runs as numpy inside ``applyInPandas``; parallelism is ACROSS
sequences — one task per (map, seed, sequence_id) job row, exactly the
reference's k8s-job fan-out but data-parallel.  The environment oracle
(NavMesh raycast) is replaced by a data-driven walkable-bounds check
(SURVEY §2.11.3) — pluggable, and what the correctness harness needs.

Determinism: RNG is an EXPLICIT 31-bit LCG seeded from the job row's seed
column — same row always yields the same trajectory, across retries and
cluster sizes (the reference records seeds per sequence for the same reason,
`scene_registry.py:391-404`).  An explicit generator rather than
``np.random.default_rng`` on purpose: PCG64 is not restatable in SQL, the
LCG is — so the whole sequential simulation replays as a recursive-CTE
oracle on an independent engine (same rationale as the
``weighted_behavior_choice`` draw).  Every float update below is written as
plain IEEE add/mul/compare (no float modulo, no library-specific wrapping)
so the replay is bit-identical.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# glibc-style 31-bit LCG — products stay < 2^62, so a signed-64 engine
# (DuckDB BIGINT) replays it without overflow.
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2_147_483_648

BEHAVIORS = [
    "random_roam",
    "translate_forward",
    "translate_backward",
    "translate_left",
    "translate_right",
    "idle",
    "rotate",
]  # behavior_executor.py:28-34

DEFAULT_WEIGHTS = {
    "random_roam": 0.3,
    "translate_forward": 0.2,
    "translate_backward": 0.05,
    "translate_left": 0.1,
    "translate_right": 0.1,
    "idle": 0.1,
    "rotate": 0.15,
}

MAX_CONSECUTIVE_FAILURES = 5  # behavior_executor.py:731-733


def cum_bounds(weights: dict[str, float]) -> tuple[list[str], list[float]]:
    """Normalized cumulative weight boundaries in dict order — sequential
    float summation so an oracle embedding ``repr()`` of these exact doubles
    reproduces the pick intervals bit-for-bit."""
    names = list(weights)
    total = 0.0
    for n in names:
        total += float(weights[n])
    cums, c = [], 0.0
    for n in names:
        c += float(weights[n]) / total
        cums.append(c)
    return names, cums


def _wrap180(v: float) -> float:
    """Wrap to [-180, 180) with a single conditional add/sub — inputs are
    bounded to (-540, 540) by construction.  No float modulo: ``%`` has
    engine-specific sign semantics; one IEEE add is portable."""
    if v >= 180.0:
        return v - 360.0
    if v < -180.0:
        return v + 360.0
    return v


def simulate_sequence(
    seed: int,
    n_segments: int = 8,
    steps_per_segment: int = 30,
    speed: float = 100.0,
    bounds: tuple[float, float, float, float] = (-5000.0, -5000.0, 5000.0, 5000.0),
    weights: dict[str, float] | None = None,
    start: tuple[float, float, float] | None = None,
):
    """One sequence's trajectory: returns (points ndarray (n,5: x,y,z,yaw,
    pitch), segments list of dicts, aborted flag).

    Walkability oracle: point stays inside ``bounds`` (xmin,ymin,xmax,ymax).
    A step that would leave bounds is a failure (reference: NavMesh projection
    failure); 5 consecutive failures abort (`behavior_executor.py:731-733`).
    """
    weights = weights or DEFAULT_WEIGHTS
    names, cums = cum_bounds(weights)
    state = int(seed) % LCG_M

    def draw() -> float:
        nonlocal state
        state = (state * LCG_A + LCG_C) % LCG_M
        return state / LCG_M

    xmin, ymin, xmax, ymax = bounds
    if start is None:
        x = (xmin + xmax) / 2.0
        y = (ymin + ymax) / 2.0
    else:
        x, y = start[0], start[1]
    z = start[2] if start else 100.0
    yaw = -180.0 + 360.0 * draw()
    pitch = 0.0
    rad = math.pi / 180.0

    pts = [(x, y, z, yaw, pitch)]
    segments = []
    failures = 0
    aborted = False

    for seg_idx in range(n_segments):
        u = draw()
        # first bucket with u < cum; default to the last (cums[-1] can sit
        # one ulp under 1.0) — the oracle's CASE ... ELSE mirrors this
        behavior = names[
            next((k for k, c in enumerate(cums) if u < c), len(names) - 1)
        ]
        seg_start = len(pts) - 1
        for _ in range(steps_per_segment):
            if behavior == "idle":
                pts.append((x, y, z, yaw, pitch))
                continue
            if behavior == "rotate":
                yaw = _wrap180(yaw + (-15.0 + 30.0 * draw()))
                pitch = max(-80.0, min(80.0, pitch + (-3.0 + 6.0 * draw())))
                pts.append((x, y, z, yaw, pitch))
                continue
            if behavior == "random_roam":
                heading = yaw + (-45.0 + 90.0 * draw())
            elif behavior == "translate_forward":
                heading = yaw
            elif behavior == "translate_backward":
                heading = yaw + 180.0
            elif behavior == "translate_left":
                heading = yaw - 90.0
            else:  # translate_right
                heading = yaw + 90.0
            h = heading * rad
            nx = x + speed * math.cos(h)
            ny = y + speed * math.sin(h)
            if xmin <= nx <= xmax and ymin <= ny <= ymax:
                x, y = nx, ny
                if behavior == "random_roam":
                    yaw = _wrap180(heading)
                failures = 0
                pts.append((x, y, z, yaw, pitch))
            else:
                failures += 1
                if failures >= MAX_CONSECUTIVE_FAILURES:
                    aborted = True
                    break
        segments.append(
            {
                "seg_idx": seg_idx,
                "type": behavior,
                "start_idx": seg_start,
                "end_idx": len(pts) - 1,
            }
        )
        if aborted:
            break
    return np.array(pts, dtype=float), segments, aborted


def simulate_jobs(
    jobs: DataFrame,
    n_segments: int = 8,
    steps_per_segment: int = 30,
    speed: float = 100.0,
    bounds: tuple[float, float, float, float] = (-5000.0, -5000.0, 5000.0, 5000.0),
) -> DataFrame:
    """Run the generator for every (sequence_id, seed) job row.

    Output: long-format pose frame (sequence_id, point_idx, x, y, z, yaw,
    pitch, seg_idx, behavior, aborted) — feeds directly into the §2.5
    time-series operators (fixed-speed fit → resample → unwrap/rate-limit →
    export).
    """
    schema = (
        "sequence_id string, point_idx long, x double, y double, z double, "
        "yaw double, pitch double, seg_idx long, behavior string, aborted boolean"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            pts, segs, aborted = simulate_sequence(
                int(row["seed"]),
                n_segments=n_segments,
                steps_per_segment=steps_per_segment,
                speed=speed,
                bounds=bounds,
            )
            seg_of = np.zeros(len(pts), dtype=int)
            beh_of = np.empty(len(pts), dtype=object)
            beh_of[:] = segs[0]["type"] if segs else ""
            for s in segs:
                seg_of[s["start_idx"] : s["end_idx"] + 1] = s["seg_idx"]
                beh_of[s["start_idx"] : s["end_idx"] + 1] = s["type"]
            for i, (x, y, z, yaw, pitch) in enumerate(pts):
                out.append(
                    (
                        row["sequence_id"],
                        i,
                        x,
                        y,
                        z,
                        yaw,
                        pitch,
                        int(seg_of[i]),
                        beh_of[i],
                        aborted,
                    )
                )
        return pd.DataFrame(
            out,
            columns=[
                "sequence_id",
                "point_idx",
                "x",
                "y",
                "z",
                "yaw",
                "pitch",
                "seg_idx",
                "behavior",
                "aborted",
            ],
        )

    return jobs.groupBy("sequence_id").applyInPandas(run, schema=schema)
