"""Bloom-filter build/probe for map-side semi-join pruning.

100 TB motivation: decontamination and blocklist filtering join a huge
corpus against a SMALL reference set (benchmark shingles, banned hashes).
A plain semi-join shuffles the corpus's join keys; a broadcast Bloom
filter prunes corpus-side rows *at the scan* — only rows whose key
*might* be in the reference set survive to the (now tiny) exact join.
Bloom guarantees no false negatives, so composing ``bloom prefilter →
exact verify-join`` is EXACTLY the semi-join — the sketch changes the
physical plan, never the result.  (Spark's own runtime row-level filtering
does this for equi-joins under `spark.sql.optimizer.runtime.bloomFilter.*`;
this operator makes the same structure available when the probe key is a
derived/exploded column the optimizer can't see through, e.g. per-shingle
hashes inside an aggregation.)

Reference parity: the reference prunes its copy lists against a known-hash
manifest before diffing (`scene_copy.py:167-204` does a dict-lookup per
candidate); at Spark scale the manifest becomes this broadcast sketch.

Mechanics: k positions per key are derived JVM-side as
``pmod(xxhash64(key, lit(i)), n_bits)`` (codegen'd — the only Python
boundary is the vectorized bit-probe).  The build collects DISTINCT
positions — bounded by ``min(k·n, n_bits)`` ints, never the keys
themselves — packs them into a ``numpy`` bit array, and broadcasts it.
The probe is an Arrow-batched pandas UDF doing pure vectorized
``bits[pos >> 3] & (1 << (pos & 7))`` lookups over the k pre-computed
position columns; no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Hard cap on the broadcast bit-array: 2^27 bits = 16 MiB.  Beyond this the
# reference set is no longer "small" and a bucketed exact semi-join is the
# right plan — fail fast and say so rather than silently ship a saturated
# (all-bits-set, filter-nothing) sketch.
MAX_BITS = 1 << 27


def optimal_n_bits(n_items: int, fpp: float = 0.01) -> int:
    """Standard Bloom sizing m = -n·ln(p)/ln(2)^2, rounded up to a power of
    two so ``pmod`` stays a cheap mask-like operation and sizing is
    reproducible across runs."""
    if n_items <= 0:
        return 1 << 10
    m = -n_items * math.log(fpp) / (math.log(2) ** 2)
    return 1 << max(10, math.ceil(math.log2(m)))


def position_cols(key: Column, n_bits: int, k: int) -> list[Column]:
    """k codegen'd bit positions for ``key`` via seeded xxhash64."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)).alias(f"__bpos{i}")
        for i in range(k)
    ]


def build_bloom(
    ref: DataFrame, key: Column, n_bits: int, k: int = 5
) -> np.ndarray:
    """Build the packed bit array from the reference set's key column.

    Shuffles/collects only DISTINCT positions (``<= min(k*n, n_bits)``
    longs), never keys or payloads.  Raises if ``n_bits`` exceeds
    MAX_BITS — the signal that the reference side outgrew the
    broadcast-sketch plan."""
    if n_bits > MAX_BITS:
        raise ValueError(
            f"build_bloom: n_bits={n_bits} exceeds MAX_BITS={MAX_BITS} "
            "(16 MiB broadcast). The reference set is too large for a "
            "broadcast Bloom — use a bucketed exact semi-join instead."
        )
    pos = (
        ref.select(F.explode(F.array(*position_cols(key, n_bits, k))).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)
    idx = np.fromiter((r["p"] for r in pos), dtype=np.int64, count=len(pos))
    np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bits


def might_contain_udf(bits: np.ndarray):
    """Vectorized probe over the k position columns.  ``bits`` is captured
    in the UDF closure; Spark ships it once per executor via the task
    broadcast, not per row."""

    @pandas_udf("boolean")
    def probe(*pos_cols: pd.Series) -> pd.Series:
        out = np.ones(len(pos_cols[0]), dtype=bool)
        for s in pos_cols:
            p = s.to_numpy(dtype=np.int64)
            out &= (bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(out)

    return probe


def bloom_prune(
    corpus: DataFrame,
    key_col: str,
    ref: DataFrame,
    ref_key: Column,
    fpp: float = 0.01,
    k: int = 5,
    n_ref_hint: int | None = None,
) -> DataFrame:
    """Keep only corpus rows whose ``key_col`` MIGHT be in ``ref``'s key
    set (no false negatives; ~``fpp`` false positives, which a downstream
    exact join must remove).  Two actions on the small ``ref`` side only:
    a count (unless ``n_ref_hint`` is given) and the position collect."""
    n = n_ref_hint if n_ref_hint is not None else ref.select(ref_key).distinct().count()
    n_bits = optimal_n_bits(n, fpp)
    bits = build_bloom(ref, ref_key, n_bits, k)
    probe = might_contain_udf(bits)
    pos = position_cols(F.col(key_col), n_bits, k)
    return (
        corpus.withColumn("__might", probe(*pos))
        .filter(F.col("__might"))
        .drop("__might")
    )
