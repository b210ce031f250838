"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

LLM-data-pipeline extension surface (repo charter): a 100 TB training-data
pipeline carries media as `binary` columns with a typed metadata struct, and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
Pandas operations over ``mapInPandas``.

The actual codec step is STUBBED — this container has no image/audio
libraries — behind ``_decode_bytes``: a clearly-marked deterministic fake
that derives a pixel/sample array from the payload bytes themselves.  A real
deployment swaps ONLY that function (e.g. for PIL / libav via pip on the
cluster image); every Spark-side concern here is real and tested:

- schema: ``MEDIA_SCHEMA`` (binary payload + struct metadata, nullable rules)
- partitioning: media ops are pure maps — no shuffle; batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of 100 MB
  blobs never materializes at once
- UDF signature: ``mapInPandas(fn, schema)`` with an iterator of
  pandas.DataFrame batches in and out (constant memory per batch)
- batch shape: one output row per input row (features), or fan-out rows
  (frame sampling) — both shapes exercised in tests/test_multimodal.py
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("modality", StringType(), False),   # image | audio | video
        StructField("format", StringType(), True),      # png / wav / mp4 ...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("data", BinaryType(), True),
        StructField("meta", MEDIA_META, False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_intensity", DoubleType(), True),
        StructField("std_intensity", DoubleType(), True),
        StructField("histogram_mode", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_data", BinaryType(), True),
    ]
)


def _decode_bytes(data: bytes) -> np.ndarray:
    """STUB DECODER — deterministic fake.

    A real engine calls the codec here (PIL.Image.open / soundfile / pyav).
    Those libraries are not in this container, so the "decoded" array is the
    payload bytes viewed as uint8 — deterministic, cheap, and exercises the
    identical numpy/Arrow data path the real decoder would feed.
    """
    if data is None or len(data) == 0:
        return np.zeros(0, dtype=np.uint8)
    return np.frombuffer(data, dtype=np.uint8)


def synthesize_media(
    df: DataFrame, id_col: str, text_col: str, modality: str = "image"
) -> DataFrame:
    """Manufacture a media table from a text table (test/fixture path):
    payload = utf-8 bytes of the text, metadata derived from its length.
    Deterministic, so every downstream op is reproducible."""
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("raw").alias("format"),
            F.greatest(F.floor(F.sqrt(n)).cast("int"), F.lit(1)).alias("width"),
            F.greatest(F.floor(F.sqrt(n)).cast("int"), F.lit(1)).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            (n % 32 + 1).cast("int").alias("n_frames"),
            ((n % 32 + 1) / F.lit(30.0)).alias("duration_s"),
        ).alias("meta"),
    )


EXT_MODALITY = {
    "jpg": "image", "jpeg": "image", "png": "image", "bmp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "avi": "video",
}


def read_binary_dir(
    spark: "SparkSession", path: str, glob: str | None = None
) -> DataFrame:
    """Ingest a directory of media files as the engine's media table via
    Spark's ``binaryFile`` source — (media_id, data, meta) with modality
    derived from the extension.

    This is the production path that `synthesize_media` stands in for in
    tests: the `binaryFile` reader distributes file reads across executors
    (one task per file split set), carries (path, modificationTime, length,
    content), and supports `pathGlobFilter` pushdown so a modality filter
    never opens non-matching files.  Decode stays downstream in
    `extract_features`/`resize_stub` (codec libs are deliberately stubbed;
    the Spark-side schema, partitioning, and batch shape are real).

    Reference analog: asset-store scans (`scene_scanner.py:163-201`,
    `render_engine.py:8-26`) — there a driver-side glob, here a distributed
    source with the same exclusion semantics.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    modality = F.coalesce(
        *[F.when(ext == e, F.lit(m)) for e, m in EXT_MODALITY.items()],
        F.lit("binary"),
    )
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content").alias("data"),
        F.struct(
            modality.alias("modality"),
            ext.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Per-media feature extraction via ``mapInPandas`` (Arrow batches).

    One output row per input row; constant memory — only one Arrow batch of
    payloads is resident per task at a time.  Pure map: no shuffle, scales
    linearly with executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                arr = _decode_bytes(data)
                if arr.size:
                    counts = np.bincount(arr, minlength=256)
                    out.append(
                        (
                            int(mid),
                            int(arr.size),
                            float(arr.mean()),
                            float(arr.std()),
                            int(counts.argmax()),
                        )
                    )
                else:
                    out.append((int(mid), 0, None, None, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_bytes",
                    "mean_intensity",
                    "std_intensity",
                    "histogram_mode",
                ],
            )

    return media.select("media_id", "data").mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing with the codec stubbed: output payload is the fake
    "resampled" byte array (truncate/tile to width*height), metadata struct
    rewritten to the new dimensions.  Signature, schema and batch flow are
    exactly what a real resize (PIL ``Image.resize`` per row inside the
    batch loop) uses."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                arr = _decode_bytes(data)
                if arr.size == 0:
                    resized = b""
                elif arr.size >= target:
                    resized = arr[:target].tobytes()
                else:
                    resized = np.tile(arr, target // arr.size + 1)[:target].tobytes()
                rows.append((int(mid), resized))
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("data", BinaryType(), True),
        ]
    )
    resized = media.select("media_id", "data").mapInPandas(run, out_schema)
    meta = media.select(
        "media_id",
        F.col("meta")
        .withField("width", F.lit(width))
        .withField("height", F.lit(height))
        .alias("meta"),
    )
    # 1:1 equi-join on media_id; Catalyst broadcasts or shuffles by size
    return resized.join(meta, "media_id")


def sample_frames(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame sampling fan-out: one output row per kept frame.

    Frame indices come from the metadata (``n_frames``) via sequence+explode
    — pure expression; the per-frame payload slice is the stubbed decode
    path inside ``mapInPandas``.  Output size = rows × n_frames/every_n —
    the fan-out shape a video pipeline feeds to a captioning model."""
    idx = media.select(
        "media_id",
        "data",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1),
                lambda i: i % every_n == 0,
            )
        ).alias("frame_idx"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, fi in zip(pdf["media_id"], pdf["data"], pdf["frame_idx"]):
                arr = _decode_bytes(data)
                if arr.size == 0:
                    frame = b""
                else:
                    # fake per-frame slice: rotate payload by frame index
                    frame = np.roll(arr, -int(fi))[: max(arr.size // 8, 1)].tobytes()
                rows.append((int(mid), int(fi), frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_data"])

    return idx.mapInPandas(run, FRAME_SCHEMA)
