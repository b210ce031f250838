"""Registry self-consistency — guards against rot as queries accumulate
across modules: every oracle has a query, the driver window is exactly
the first 50 entries, and no module silently shadows another's name."""

from worlddatapipeline_spark.queries import (
    _ALL_QUERIES,
    _DRIVER_WINDOW,
    ORACLES,
    QUERIES,
)
from worlddatapipeline_spark.queries_analytics import (
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)
from worlddatapipeline_spark.queries_ext import EXT_ORACLES, EXT_QUERIES
from worlddatapipeline_spark.queries_tpch import TPCH_ORACLES, TPCH_QUERIES


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, missing


def test_driver_window_is_first_50():
    assert len(_DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == _DRIVER_WINDOW


def test_window_entries_resolve():
    missing = [n for n in _DRIVER_WINDOW if n not in _ALL_QUERIES]
    assert not missing, missing


def test_no_cross_module_name_collisions():
    """Includes the base queries.py names: _ALL_QUERIES is a dict merge,
    so a same-named query in a later module SILENTLY replaces an earlier
    one — the size identity catches that for every module at once."""
    base = len(_ALL_QUERIES) - len(
        set(EXT_QUERIES) | set(TPCH_QUERIES) | set(ANALYTICS_QUERIES)
    )
    mods = {
        "ext": set(EXT_QUERIES),
        "tpch": set(TPCH_QUERIES),
        "analytics": set(ANALYTICS_QUERIES),
    }
    names = list(mods.items())
    for i, (ma, sa) in enumerate(names):
        for mb, sb in names[i + 1 :]:
            overlap = sa & sb
            assert not overlap, f"{ma} vs {mb}: {overlap}"
    assert (
        len(_ALL_QUERIES)
        == base + len(EXT_QUERIES) + len(TPCH_QUERIES) + len(ANALYTICS_QUERIES)
    )
    assert base > 25  # the base module's own entries survived the merges


def test_module_oracles_reference_own_queries():
    for qs, os_, label in [
        (EXT_QUERIES, EXT_ORACLES, "ext"),
        (TPCH_QUERIES, TPCH_ORACLES, "tpch"),
        (ANALYTICS_QUERIES, ANALYTICS_ORACLES, "analytics"),
    ]:
        dangling = set(os_) - set(qs)
        assert not dangling, f"{label}: {dangling}"


def test_rows_only_tail_is_bounded():
    """Every rows-only query (no oracle) must stay a known, justified set —
    new operators need an oracle or a contract sibling."""
    # Pruned as entries gain oracles (r4: behavior_resample /
    # multimodal_features / simulate_trajectories; r5: minhash_candidates /
    # simhash_near_dups via the constructive-corpus pattern; r8:
    # embedding_lsh_topk / embedding_ivf_topk via planted-neighbor corpora,
    # embedding_kmeans AND semantic_dedup_keep via orthogonal xxhash-rank
    # clusters).  The rows-only tail is now EMPTY — every registry entry
    # has a full DuckDB value oracle; a new rows-only entry needs to be
    # added here with a written justification.
    allowed: set[str] = set()
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only <= allowed, rows_only - allowed
