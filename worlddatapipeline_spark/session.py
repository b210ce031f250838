"""SparkSession factory tuned for the engine.

The reference (Aether-Verilys/WorldDataPipeline) has no execution engine of its
own — it is single-threaded Python orchestrating subprocesses
(`/root/reference/structure.md:15-26`).  Everything here replaces that with
Spark's distributed execution.  The knobs below are chosen for the dual target:

* local[32] correctness/bench runs on the driver box, and
* a 1000-executor cluster at ~100 TB, where AQE, skew-join handling and a
  sane shuffle-partition default matter far more.

Scale notes
-----------
- AQE is on: runtime coalescing of shuffle partitions + skew-join splitting
  means the same plans survive 100x data growth without retuning.
- ``spark.sql.shuffle.partitions`` defaults to a local-friendly number but is
  only the *initial* value — AQE coalesces/splits at runtime.
- Arrow is enabled for every pandas_udf / applyInPandas operator (the stateful
  scans and simulation operators are Arrow-batched, never row-at-a-time).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "worlddatapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Every config set here is a plain public Spark conf; on a real cluster the
    same builder is used with ``master`` unset (inherited from spark-submit).
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    if not SparkSession.getActiveSession():
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def materialize_and_release(result, *cached):
    """Materialize ``result`` with an eager ``localCheckpoint``, then
    unpersist the ``cached`` frames it derived from.

    Query functions that persist a multi-reader intermediate would otherwise
    leak it: the returned frame is lazy, so there is no point inside the
    function where the cache is both fully consumed and releasable — the
    cached RDD lingers until the ContextCleaner happens to GC it (ADVICE r3).
    Truncating the lineage makes the release safe immediately, and the one
    action it costs is the action the caller was about to run anyway.

    Stated tradeoff for the 100 TB deployment: a localCheckpoint lives on
    executors and is lost with them, so this is only for results that are
    small aggregates / candidate-pair sets (every call site here is).  A
    large result should be written to durable storage and read back instead.

    The returned checkpoint RDD itself stays pinned until the DataFrame is
    GC'd and the ContextCleaner runs — bounded by the (small) result size
    per call, but a driver LOOPING over such calls should `.unpersist()`
    each returned frame when done with it rather than relying on GC pace.
    """
    out = result.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    return out


def drain_memory_sink(spark: SparkSession, sink: str):
    """Materialize a finished memory-sink table and DROP its temp view.

    Streaming parity queries run availableNow into a uniquely-named memory
    sink; without the drop every invocation leaks a driver-memory table
    holding the full aggregate (bench loops re-run queries, so the leak
    compounds — ADVICE r4).  The eager localCheckpoint severs the returned
    frame from the sink so dropping the view is safe immediately.
    """
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out


def streaming_events(spark: SparkSession, sf_dir: str):
    """Normalized ``readStream`` over the driver's events.parquet — the ONE
    place the stream-side ts normalization lives (review catch r5: eleven
    streaming parity queries carried verbatim copies).  Mirrors
    ``load_tables``' batch normalization: the driver's ts encoding has
    flipped between TIMESTAMP(NANOS)-read-as-long and TIMESTAMP_NTZ across
    rounds, and every streaming query must normalize identically or
    silently diverge from its batch oracle.  Also pins nanosAsLong and the
    UTC session timezone (driver sessions don't carry get_spark's
    configs; withWatermark/window bucketing must agree with DuckDB's
    epoch_us)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf may be fixed on some builds
        pass
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.types import LongType, TimestampNTZType  # noqa: PLC0415

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(raw_schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif isinstance(raw_schema["ts"].dataType, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def parquet_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count of one input table from the parquet FOOTER — the
    same statistic Spark's own scan planning reads — without scheduling
    a job.  Used by size-routed plan choices (e.g. the
    ``fuzzy_record_linkage`` hybrid), where a full count action would
    cost more than the routing decision saves.  Handles both a single
    ``<name>.parquet`` file (the driver's testdata layout) and a
    Spark-written directory of part files."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register the driver's parquet tables as temp views and return them.

    Mirrors the reference's catalog-open step (`scene_registry.py:16-25` opens
    SQLite; here we attach parquet).  Column pruning + predicate pushdown then
    happen automatically at the parquet scan.
    """
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    # Timestamp normalization.  The driver's parquet has shipped `events.ts`
    # as TIMESTAMP(NANOS) (read as long nanos under nanosAsLong) in one round
    # and plain TIMESTAMP(MICROS, isAdjustedToUTC=false) in another — the
    # latter surfaces as TIMESTAMP_NTZ, which `unix_micros`/`withWatermark`
    # reject.  Normalize every variant to a session-tz TIMESTAMP here, once,
    # so no query has to care.  Session tz is pinned UTC (get_spark above), so
    # the NTZ→TIMESTAMP cast is wall-clock preserving and epoch semantics
    # match DuckDB's `epoch_us` exactly.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # The driver builds its OWN SparkSession (not get_spark), so the UTC
    # session tz from the builder is not guaranteed.  The NTZ->TIMESTAMP cast
    # below is wall-clock->instant and reads the session tz at runtime; pin
    # it here so epoch semantics always match DuckDB's epoch_us.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        for f in df.schema.fields:
            if isinstance(f.dataType, TimestampNTZType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
            elif n == "events" and f.name == "ts" and isinstance(f.dataType, LongType):
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
