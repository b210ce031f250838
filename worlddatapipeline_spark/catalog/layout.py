"""Physical table layout: partitioned writes, bucketing, compaction.

The reference approximates all of this by directory convention — per-scene
folders (`scene_scanner.py:616-663`), prefix-scoped object listings
(`scene_copy.py:101-113`), and batch chunking (`copy_scene_assets.py:320-399`).
At 100 TB layout is the difference between scanning everything and scanning
one partition:

- ``write_partitioned``: hive-style ``scene=/date=`` directories → partition
  pruning at the scan (a filter on the partition column never touches other
  partitions' files).
- ``write_bucketed``: pre-shuffle the table ONCE at write time; every later
  join/agg on the bucket key is shuffle-free (verified by plan test: two
  bucketed tables join with zero Exchange).  This is the standing answer to
  "orders ⋈ lineitem shuffles 100 TB every run".
- ``compact``: rewrite a directory of many small files into
  size-targeted files — the small-file problem is the #1 operational failure
  of hive-partitioned layouts (listing + task-per-file overhead).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet with a bounded file count per partition.

    The pre-write ``repartition(partition_cols)`` lines data up so each
    output partition directory is written by ``files_per_partition`` tasks —
    without it, every upstream task holding rows of a partition writes its
    own fragment (tasks × partitions small files).  ``files_per_partition >
    1`` adds a salt so one giant partition can still parallelize.
    """
    if files_per_partition <= 1:
        out = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        salt = (F.rand(seed=0) * files_per_partition).cast("int")
        out = df.withColumn("__salt", salt).repartition(
            *[F.col(c) for c in partition_cols], F.col("__salt")
        ).drop("__salt")
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles on the join/agg key at write time; subsequent
    equi-joins between tables bucketed the same way need no Exchange at all
    (and with ``sort_cols`` no Sort either — a zero-shuffle sort-merge join).
    Spark's bucketed format needs ``saveAsTable`` (metastore-tracked), not a
    plain path write.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
    mode: str = "overwrite",
    zorder_cols: tuple[str, str] | None = None,
    zorder_bits: int = 16,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the
    output file count.

    Local-filesystem size probe (os.walk); on an object store the same
    number comes from the listing inventory.  The repartition count is
    ceil(bytes/target) — AQE cannot do this for a plain write (no shuffle to
    coalesce), so the explicit repartition IS the compaction.

    ``zorder_cols=(x, y)`` additionally CLUSTERS the rewrite by the Morton
    interleave of the two (non-negative integer) columns — Delta's
    ``OPTIMIZE ... ZORDER BY`` restated on plain parquet: range-partition
    by the key, sort within files, so row-group min/max stats prune
    predicates on BOTH columns, not just a leading sort column.
    """
    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    if zorder_cols is not None:
        from pyspark.sql import functions as F

        zx, zy = zorder_cols
        key = zorder_key(F.col(zx), F.col(zy), bits=zorder_bits)
        df = (
            df.withColumn("__zkey", key)
            .repartitionByRange(n, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
        df = df.repartition(n)
    df.write.mode(mode).parquet(dst_path)
    return n


def zorder_key(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative bucket ids — the
    multi-column data-clustering key behind Delta OPTIMIZE ZORDER /
    Iceberg sort orders (public technique): rows sorted by this key keep
    records close in BOTH dimensions physically adjacent, so parquet
    row-group min/max stats prune 2-D predicates instead of only the
    leading sort column.

    Built as a fixed sum of literal-shift terms (``((x >> i) & 1) <<
    2i``), so the whole key is codegen'd JVM arithmetic — no UDF, no
    shuffle; usable directly in ``repartitionByRange``/``sortWithinPartitions``
    write paths (`compact` above) and restatable verbatim in SQL.
    Inputs must fit ``bits`` (caller buckets first); output fits a long
    for bits <= 31.
    """
    from pyspark.sql import functions as F

    xc = x.cast("long")
    yc = y.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(
            F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The exact SQL restatement of ``zorder_key`` (same literal shifts),
    for engine-independent oracles and for pasting into a SQL write job."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
