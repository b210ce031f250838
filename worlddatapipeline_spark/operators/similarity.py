"""Similarity search over embedding columns (array<float>).

LLM-data-pipeline extension surface (BASELINE.json north_star): approximate
nearest neighbours over ``embeddings(vec_id, embedding, label)``.

Two tiers:
- ``cosine_topk``: brute-force exact cosine top-k for a bounded query set —
  the correctness baseline.  Query side is broadcast; the corpus is scanned
  once; per-corpus-partition partial top-k would be the next refinement but
  the ranking window after a broadcast join is already shuffle-light because
  only (query, corpus) scores move, not vectors.
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path.  Corpus
  vectors land in sign-pattern buckets; a query only scores its own bucket
  (and optional multi-probe neighbours).  Hyperplanes are deterministic from
  a seed so results are reproducible across retries (same requirement as the
  reference's seeded sequences, `behavior_executor.py:681-696`).

All vector math is expression-level (``F.zip_with`` + ``F.aggregate``), fully
codegen'd — no Python UDF in the scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with rounded
    cosine >= threshold.  Exact brute-force verify — the LLM-pipeline dedup
    complement to `cosine_topk` (search) and `dedup.py` (text dedup).

    Plan shape: norms precomputed per row BEFORE the pair join (one pass),
    then a theta self-join on id_a < id_b; the pair expression is a single
    dot product + divide.  Thresholding on the ROUNDED value keeps the
    boundary deterministic across engines.  At 100 TB scale the pair space is
    pruned first with `lsh_bucket` / `ivf_topk`-style inverted lists and this
    same exact expression verifies candidates only.
    """
    spark = corpus.sparkSession
    withn = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("n", l2_norm(F.col("v")))
    # spread the interpreted pair-gen stage across cores (AQE would coalesce)
    par = spark.sparkContext.defaultParallelism
    a = withn.repartition(par).select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = withn.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    j = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    cs = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), round_digits
    )
    return (
        j.select("id_a", "id_b", cs.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest corpus vectors.

    Plan shape: broadcast(queries) × corpus scan → score → ranking window on
    query_id.  Excludes self-matches when ids collide.
    Returns (query_id, vec_id, cosine_sim, rank).
    """
    # norms are per-row, not per-pair: compute them BEFORE the join so the
    # pair loop does exactly one dot product (the division below reproduces
    # dot/(||q||*||c||) in the same IEEE order as the naive form)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic random hyperplanes (public numpy RNG, fixed seed)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit b = sign(vec · plane_b)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket.

    At 100 TB the corpus is hash-partitioned by bucket; each query shuffles to
    one bucket's partition — candidate count drops by ~2^n_planes.  Recall is
    tunable via n_planes (fewer planes → bigger buckets → higher recall).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = c.alias("c").join(
        F.broadcast(q).alias("q"),
        (F.col("c.__bucket") == F.col("q.__bucket")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("q.__qv"), F.col("c.__cv")) / (F.col("q.__qn") * F.col("c.__cn")),
            6,
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantize the corpus into inverted
    lists, probe only the query's ``n_probe`` nearest lists.

    The coarse "centroids" are a deterministic corpus sample (every
    ``len/n_centroids``-th vector by id order) — no iterative k-means pass,
    which keeps the operator a fixed 3-stage DAG; swapping in trained
    centroids is a drop-in (they arrive as the same small DataFrame).

    Plan shape: centroids are collected once (n_centroids rows — driver-safe
    by construction) and broadcast inside expressions; corpus → (list_id,
    vec) via argmin over centroid dots; queries fan out to n_probe lists;
    candidates meet in a hash join on list_id.  At 100 TB the corpus can be
    written bucketed by list_id, making the probe join shuffle-free.
    Returns (query_id, vec_id, cosine_sim, rank).
    """
    # deterministic coarse centroids: every m-th corpus vector by id order.
    # Only the n_centroids sampled ROWS ever reach the driver — never the id
    # list (a 100 TB corpus has billions of ids; the count is one aggregate).
    total = corpus.count()
    step = max(total // n_centroids, 1)
    w_ids = Window.orderBy(id_col)
    cents = (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            F.row_number().over(w_ids).alias("__rn"),
        )
        .filter((F.col("__rn") - 1) % step == 0)
        .orderBy("__rn")
        .limit(n_centroids)
        .drop("__rn")
        .collect()
    )

    def nearest_lists(vec: Column, n: int) -> Column:
        """ids of the n centroids with highest cosine to vec (expression)."""
        scored = F.array(
            *[
                F.struct(
                    (
                        dot(vec, F.array(*[F.lit(float(x)) for x in row["cvec"]]))
                        / (
                            l2_norm(vec)
                            * F.lit(
                                float(
                                    sum(float(x) * float(x) for x in row["cvec"]) ** 0.5
                                )
                            )
                        )
                    ).alias("sim"),
                    F.lit(row["cid"]).alias("cid"),
                )
                for row in cents
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: s["cid"])

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        F.element_at(nearest_lists(F.col(vec_col), 1), 1).alias("list_id"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        F.explode(nearest_lists(F.col(vec_col), n_probe)).alias("list_id"),
    )
    scored = c.join(F.broadcast(q), ["list_id"]).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.dropDuplicates(["query_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
