"""Scene-registry query surface (SURVEY.md §2.1/§2.4) on catalog DataFrames.

Re-expresses every query the reference runs against its SQLite catalog:
- ``get_statistics`` (`scene_registry.py:566-605`) — the canonical stats query
- filtered listings (`scene_registry.py:273-287,352-378,417-445`)
- nested scenes.json document export (`scene_scanner.py:530-587`)
- max-index scan (`worker_create.py:175-194`)
- cascading delete (`scene_registry.py:289-298`)
The storage layer is deliberately abstract: these operate on DataFrames and
compose with operators/reconcile.py merge primitives; binding to Delta/Iceberg
tables is a write-layer concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.paths import numeric_suffix
from ..operators.aggregates import count_when


def registry_statistics(
    scenes: DataFrame, maps: DataFrame, sequences: DataFrame
) -> DataFrame:
    """`get_statistics` (`scene_registry.py:566-605`): one row of catalog
    counters — conditional counts + sums + hours, in three small aggregates
    combined by crossJoin (each input aggregated map-side first)."""
    s = scenes.agg(
        F.count(F.lit(1)).alias("total_scenes"),
        count_when(F.col("downloaded_at").isNotNull()).alias("downloaded_scenes"),
        count_when(F.col("bos_exists")).alias("bos_verified_scenes"),
        F.coalesce(F.sum("file_count"), F.lit(0)).alias("total_files"),
        F.coalesce(F.sum("total_size_bytes"), F.lit(0)).alias("total_size_bytes"),
    )
    m = maps.agg(
        F.count(F.lit(1)).alias("total_maps"),
        count_when(F.col("navmesh_baked")).alias("navmesh_baked_maps"),
    )
    q = sequences.agg(
        F.count(F.lit(1)).alias("total_sequences"),
        count_when(F.col("uploaded_at").isNotNull()).alias("uploaded_sequences"),
        F.round(
            F.coalesce(F.sum("duration_seconds"), F.lit(0.0)) / 3600.0, 4
        ).alias("total_hours"),
    )
    return s.crossJoin(m).crossJoin(q)


def list_scenes(
    scenes: DataFrame,
    downloaded_only: bool = False,
    bos_exists: bool | None = None,
) -> DataFrame:
    """Filtered + ordered scene listing (`scene_registry.py:273-287`)."""
    out = scenes
    if downloaded_only:
        out = out.filter(F.col("downloaded_at").isNotNull())
    if bos_exists is not None:
        out = out.filter(F.col("bos_exists") == bos_exists)
    return out.orderBy("scene_name")


def list_sequences(
    sequences: DataFrame,
    scene_name: str | None = None,
    uploaded_only: bool = False,
) -> DataFrame:
    """`scene_registry.py:417-445` — newest first."""
    out = sequences
    if scene_name is not None:
        out = out.filter(F.col("scene_name") == scene_name)
    if uploaded_only:
        out = out.filter(F.col("uploaded_at").isNotNull())
    return out.orderBy(F.col("created_at").desc())


def scenes_document_export(scenes_scan: DataFrame, maps: DataFrame) -> DataFrame:
    """The nested scenes.json mirror (`scene_scanner.py:530-587`): one row
    per scene with a sorted array<struct(map_name,map_path)> — the join +
    collect_list(struct) that kills the reference's per-scene N+1 loop."""
    nested = (
        maps.groupBy("scene_name")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("map_name", "map_path"))
            ).alias("maps")
        )
    )
    return (
        scenes_scan.join(nested, "scene_name", "left")
        .withColumn(
            "maps",
            F.coalesce(
                F.col("maps"),
                F.array().cast("array<struct<map_name:string,map_path:string>>"),
            ),
        )
        .withColumn("map_count", F.size("maps"))
    )


def next_sequence_index(
    sequences: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Max numeric suffix of `{map}_NNN` names + 1 per map
    (`worker_create.py:175-194`)."""
    group_cols = group_cols or ["scene_name", "map_name"]
    return (
        sequences.groupBy(*group_cols)
        .agg(
            F.coalesce(
                F.max(numeric_suffix(F.col("sequence_name"))), F.lit(-1)
            ).alias("max_index")
        )
        .withColumn("next_index", F.col("max_index") + 1)
    )


def cascading_delete(
    scenes: DataFrame,
    maps: DataFrame,
    sequences: DataFrame,
    scene_names: list[str],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Delete a scene and its children (`scene_registry.py:289-298`) —
    expressed as anti-filters; the write layer overwrites the tables."""
    cond = F.col("scene_name").isin(scene_names)
    return (
        scenes.filter(~cond),
        maps.filter(~cond),
        sequences.filter(~cond),
    )
