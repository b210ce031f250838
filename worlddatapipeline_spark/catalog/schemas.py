"""Catalog table schemas (SURVEY.md §1.2), promoted to real Spark types.

The reference's SQLite DDL (`scene_registry.py:27-81`, scanner variant
`scene_scanner.py:460-487`) stores ISO timestamps as TEXT and nested data as
JSON-in-TEXT; here timestamps are TimestampType and the JSON blobs are
StructType columns (metadata, navmesh_bounds), eliminating the per-row
json.loads at `scene_registry.py:249-251,373-377`.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

METADATA = StructType(
    [
        StructField("source", StringType()),
        StructField("version", StringType()),
    ]
)

NAVMESH_BOUNDS = StructType(
    [
        StructField("min", ArrayType(DoubleType())),
        StructField("max", ArrayType(DoubleType())),
    ]
)

# registry variant — scene_registry.py:27-41
SCENES = StructType(
    [
        StructField("scene_name", StringType(), False),
        StructField("bos_baked_path", StringType(), False),
        StructField("local_path", StringType()),
        StructField("content_hash", StringType()),
        StructField("file_count", LongType()),
        StructField("total_size_bytes", LongType()),
        StructField("bos_exists", BooleanType()),
        StructField("bos_last_verified", TimestampType()),
        StructField("downloaded_at", TimestampType()),
        StructField("last_updated", TimestampType()),
        StructField("metadata", METADATA),
    ]
)

# scene_registry.py:43-58 — UNIQUE(scene_name, map_name)
MAPS = StructType(
    [
        StructField("id", LongType()),
        StructField("scene_name", StringType(), False),
        StructField("map_name", StringType(), False),
        StructField("map_path", StringType()),
        StructField("navmesh_baked", BooleanType()),
        StructField("navmesh_hash", StringType()),
        StructField("navmesh_baked_at", TimestampType()),
        StructField("navmesh_auto_scale", BooleanType()),
        StructField("navmesh_bounds", NAVMESH_BOUNDS),
        StructField("metadata", METADATA),
    ]
)

# scene_registry.py:60-76 — UNIQUE(scene_name, map_name, sequence_name)
SEQUENCES = StructType(
    [
        StructField("id", LongType()),
        StructField("scene_name", StringType(), False),
        StructField("map_name", StringType(), False),
        StructField("sequence_name", StringType(), False),
        StructField("sequence_path", StringType()),
        StructField("bos_path", StringType()),
        StructField("seed", LongType()),
        StructField("duration_seconds", DoubleType()),
        StructField("created_at", TimestampType()),
        StructField("uploaded_at", TimestampType()),
        StructField("metadata", METADATA),
    ]
)

# scanner variant — scene_scanner.py:460-472
SCENES_SCAN = StructType(
    [
        StructField("scene_name", StringType(), False),
        StructField("launch_directory", StringType()),
        StructField("content_path", StringType()),
        StructField("launch_directory_path", StringType()),
        StructField("base_game_path", StringType()),
        StructField("last_updated", TimestampType()),
        StructField("low_actor", BooleanType()),
        StructField("baked", BooleanType()),
        StructField("last_baked", TimestampType()),
    ]
)

# pose time-series, long format — worker_create.py:972-978 / SURVEY §1.1 #4
POSE_KEYS = StructType(
    [
        StructField("sequence_id", StringType(), False),
        StructField("frame", LongType(), False),
        StructField("time_seconds", DoubleType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("z", DoubleType()),
        StructField("pitch", DoubleType()),
        StructField("yaw", DoubleType()),
        StructField("roll", DoubleType()),
    ]
)

# behavior segments — behavior_executor.py:804-810
BEHAVIOR_SEGMENTS = StructType(
    [
        StructField("sequence_id", StringType(), False),
        StructField("seg_idx", LongType(), False),
        StructField("type", StringType()),
        StructField("start_idx", LongType()),
        StructField("end_idx", LongType()),
        StructField("start_frame", LongType()),
        StructField("end_frame", LongType()),
    ]
)

# task/status stream — structure.md:199-216, render_engine.py:536-547
TASKS = StructType(
    [
        StructField("task_id", StringType(), False),
        StructField("sequence_id", StringType()),
        StructField("worker_id", StringType()),
        StructField("status", StringType()),
        StructField("created_at", TimestampType()),
        StructField("started_at", TimestampType()),
        StructField("finished_at", TimestampType()),
        StructField("error_message", StringType()),
    ]
)

TASK_STATUS_EVENTS = StructType(
    [
        StructField("task_id", StringType(), False),
        StructField("event_time", TimestampType(), False),
        StructField("status", StringType()),
        StructField("frame_count", LongType()),
        StructField("output_directory", StringType()),
    ]
)

HEARTBEATS = StructType(
    [
        StructField("worker_id", StringType(), False),
        StructField("beat_time", TimestampType(), False),
    ]
)
