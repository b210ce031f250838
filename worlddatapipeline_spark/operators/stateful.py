"""Stateful sequential scans (SURVEY.md §2.5, §4.1).

These are the operators whose output at step *i* depends on the *output* at
step *i-1* — not expressible as fixed-frame window functions.  They run as
Arrow-batched ``applyInPandas`` per sequence key: parallelism is ACROSS
sequences (one pandas group per sequence), never within one.  At 100 TB this
is the right decomposition — a sequence is a few thousand frames (KBs), while
sequences number in the millions.

Covered:
- rate limiter (yaw): `transform_track.py:215-228`,
- rate limiter with range clamp (pitch): `transform_track.py:233-262`,
- rate-limited approach toward a target: `behavior_executor.py:122-195`,
- numpy-based angle unwrap (cross-check for the closed-form window version in
  windows.py): `transform_track.py:133-155`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _wrap(d: np.ndarray) -> np.ndarray:
    """Shortest angular delta in [-180, 180).

    Floor form (same as windows.wrap_delta), NOT np.round: half-to-even
    rounding makes the half case inconsistent (wrap(180)=180 but
    wrap(540)=-180) and disagrees with SQL engines' round-half-away — the
    floor form is deterministic and engine-identical."""
    return d - 360.0 * np.floor(d / 360.0 + 0.5)


def rate_limit_series(
    values: np.ndarray,
    max_step: float,
    lo: float | None = None,
    hi: float | None = None,
) -> np.ndarray:
    """Sequential clamp: each output moves from the PREVIOUS OUTPUT toward the
    input by at most ``max_step``, optionally range-clamped into [lo, hi].

    Reference analog: `transform_track.py:215-262`.  O(n) python loop per
    sequence — fine, sequences are short; the scan is irreducibly sequential.
    """
    out = np.empty_like(values, dtype=np.float64)
    if len(values) == 0:
        return out
    prev = float(values[0])
    if lo is not None:
        prev = max(lo, min(hi, prev))
    out[0] = prev
    for i in range(1, len(values)):
        target = float(values[i])
        delta = target - prev
        if delta > max_step:
            delta = max_step
        elif delta < -max_step:
            delta = -max_step
        cur = prev + delta
        if lo is not None:
            cur = max(lo, min(hi, cur))
        out[i] = cur
        prev = cur
    return out


def rate_limit(
    df: DataFrame,
    seq_col: str,
    order_col: str,
    value_col: str,
    max_rate: float,
    dt: float,
    lo: float | None = None,
    hi: float | None = None,
    out_col: str = "limited",
) -> DataFrame:
    """Per-sequence rate limiter as applyInPandas.

    ``max_step = max_rate * dt`` per frame, matching
    `transform_track.py:218-221` (yaw) and `:245-251` (pitch with clamp).
    """
    max_step = max_rate * dt
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        pdf[out_col] = rate_limit_series(
            pdf[value_col].to_numpy(dtype=np.float64), max_step, lo, hi
        )
        return pdf

    return df.groupBy(seq_col).applyInPandas(fn, schema=schema)


def unwrap_pandas(
    df: DataFrame,
    seq_col: str,
    order_col: str,
    angle_col: str,
    out_col: str = "unwrapped",
) -> DataFrame:
    """numpy unwrap per sequence (degrees) — reference
    `transform_track.py:133-155`.  Used as a differential cross-check against
    the closed-form window version (windows.unwrap_angle)."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        a = pdf[angle_col].to_numpy(dtype=np.float64)
        if len(a):
            pdf[out_col] = np.degrees(np.unwrap(np.radians(a)))
        else:
            pdf[out_col] = a
        return pdf

    return df.groupBy(seq_col).applyInPandas(fn, schema=schema)


def approach_target(
    df: DataFrame,
    seq_col: str,
    order_col: str,
    target_col: str,
    max_rate: float,
    fps: float,
    start_col: str | None = None,
    out_col: str = "yaw",
) -> DataFrame:
    """Per-frame move ≤ max_rate/fps toward a (possibly changing) target along
    the shortest arc — reference `behavior_executor.py:122-195`."""
    step = max_rate / fps
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        tgt = pdf[target_col].to_numpy(dtype=np.float64)
        out = np.empty_like(tgt)
        cur = float(pdf[start_col].iloc[0]) if start_col else float(tgt[0])
        for i in range(len(tgt)):
            d = _wrap(np.array([tgt[i] - cur]))[0]
            d = max(-step, min(step, d))
            cur = cur + d
            out[i] = cur
        pdf[out_col] = out
        return pdf

    return df.groupBy(seq_col).applyInPandas(fn, schema=schema)
