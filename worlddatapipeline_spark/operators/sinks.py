"""External-world sinks: object upload and video encode.

The reference ships two imperative sinks the data plane must orchestrate:

- object upload — per-file `put_object_from_file` / `bcecmd bos cp -r` with
  skip patterns and progress counters (`storage/bos_uploader.py:121-236`,
  `bos_manager.py:228-312`, `run_upload_scenes.py:158-225`)
- video encode — ffmpeg frames→H264 MP4 with `-framerate`, `-crf 23`,
  `-pix_fmt yuv420p`, then optional frame deletion
  (`ue_pipeline/convert_frames_to_video.py:57-156`)

Spark restatement: the FILE LIST is a DataFrame (so skip patterns, dedup,
and the skip-existing anti-diff are relational, not loops), the transfer
runs distributed via ``foreachPartition`` with a pluggable per-file callable
(SDK client, CLI, or a local-FS fake for tests), and the reference's
progress counters become Spark accumulators.  Video encoding is planned
relationally (one command row per sequence) and executed only where ffmpeg
exists — the container used for tests has none, so execution is gated, the
planning/plumbing is real and tested.
"""

from __future__ import annotations

import os
import shutil
import subprocess

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SKIP_PATTERNS = ["manifest", "*.url", "*.txt"]


def filter_uploadable(
    files: DataFrame,
    path_col: str = "relpath",
    skip_patterns: list[str] | None = None,
) -> DataFrame:
    """Apply the uploader's skip patterns (`run_upload_scenes.py:90-93`,
    `scene_copy.py:68-92`) relationally: fnmatch globs → rlike."""
    from ..functions.paths import glob_to_rlike

    pats = skip_patterns if skip_patterns is not None else DEFAULT_SKIP_PATTERNS
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    cond = F.lit(False)
    for p in pats:
        cond = cond | base.rlike(glob_to_rlike(p))
    return files.filter(~cond)


def upload_files(
    files: DataFrame,
    target_base: str,
    src_col: str = "path",
    rel_col: str = "relpath",
    uploader=None,
    skip_existing: bool = True,
) -> dict[str, int]:
    """Distributed upload with progress counters.

    ``uploader(src_path, target_key) -> None`` is the pluggable transfer
    (default: local-FS copy — the test/bench fake; swap in an object-store
    SDK call on a real cluster).  Each partition uploads its files
    independently — the reference's sequential per-file loop
    (`bos_uploader.py:121-236`) becomes one task per partition; its printed
    counters become accumulators returned as a dict.
    """
    sc = files.sparkSession.sparkContext
    acc_ok = sc.accumulator(0)
    acc_skip = sc.accumulator(0)
    acc_fail = sc.accumulator(0)

    def default_uploader(src: str, key: str) -> None:
        dest = os.path.join(target_base, key)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copyfile(src, dest)

    up = uploader or default_uploader

    def handle_partition(rows) -> None:
        for row in rows:
            src, key = row[src_col], row[rel_col]
            try:
                if skip_existing and os.path.exists(os.path.join(target_base, key)):
                    acc_skip.add(1)
                    continue
                up(src, key)
                acc_ok.add(1)
            except Exception:
                acc_fail.add(1)

    files.select(src_col, rel_col).foreachPartition(handle_partition)
    return {
        "uploaded": acc_ok.value,
        "skipped": acc_skip.value,
        "failed": acc_fail.value,
    }


def video_encode_plan(
    frames: DataFrame,
    out_base: str,
    seq_col: str = "sequence_id",
    path_col: str = "path",
    fps: int = 30,
    crf: int = 23,
) -> DataFrame:
    """One encode-command row per sequence (`convert_frames_to_video.py:
    85-97,170-184` settings: libx264, CRF, yuv420p).  Relational planning:
    frame counts and the input glob are aggregates over the frame listing;
    the returned plan is data, so it joins/reconciles like anything else."""
    pattern = F.concat(
        F.regexp_replace(F.max(path_col), r"/[^/]+$", ""), F.lit("/%06d.png")
    )
    return frames.groupBy(seq_col).agg(
        F.count(F.lit(1)).alias("n_frames"),
        pattern.alias("input_pattern"),
    ).select(
        seq_col,
        "n_frames",
        "input_pattern",
        F.concat(F.lit(out_base + "/"), F.col(seq_col), F.lit(".mp4")).alias(
            "output_path"
        ),
        F.array(
            F.lit("ffmpeg"), F.lit("-y"),
            F.lit("-framerate"), F.lit(str(fps)),
            F.lit("-i"), F.col("input_pattern"),
            F.lit("-c:v"), F.lit("libx264"),
            F.lit("-crf"), F.lit(str(crf)),
            F.lit("-pix_fmt"), F.lit("yuv420p"),
            F.concat(F.lit(out_base + "/"), F.col(seq_col), F.lit(".mp4")),
        ).alias("command"),
    )


def execute_video_plan(plan: DataFrame) -> dict[str, int]:
    """Run the encode plan — one ffmpeg subprocess per sequence, distributed
    one-per-partition-row via foreachPartition.  Gated: where ffmpeg is not
    installed (this test container) every row counts as skipped; the
    plumbing (partitioned dispatch + accumulators) is identical either way.
    """
    sc = plan.sparkSession.sparkContext
    acc_ok = sc.accumulator(0)
    acc_skip = sc.accumulator(0)
    acc_fail = sc.accumulator(0)

    def run_partition(rows) -> None:
        have_ffmpeg = shutil.which("ffmpeg") is not None
        for row in rows:
            if not have_ffmpeg:
                acc_skip.add(1)
                continue
            try:
                subprocess.run(list(row["command"]), check=True, capture_output=True)
                acc_ok.add(1)
            except Exception:
                acc_fail.add(1)

    plan.select("command").foreachPartition(run_partition)
    return {
        "encoded": acc_ok.value,
        "skipped": acc_skip.value,
        "failed": acc_fail.value,
    }
