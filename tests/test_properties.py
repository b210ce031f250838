"""Property tests (hypothesis) for the stateful numeric core — SURVEY.md §5
test-plan item 4.  These target the pure-numpy kernels that back the
applyInPandas operators, so hundreds of examples run without Spark overhead.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from worlddatapipeline_spark.operators.stateful import _wrap, rate_limit_series

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(st.lists(finite, min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_rate_limit_step_bound(values):
    """Every output step is bounded by max_step (the defining invariant of
    `transform_track.py:215-228`)."""
    out, _ = rate_limit_series(np.asarray(values, dtype=np.float64), max_step=7.5)
    steps = np.abs(np.diff(out))
    assert np.all(steps <= 7.5 + 1e-9)


@given(st.lists(finite, min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_rate_limit_range_clamp(values):
    """With lo/hi set, every output lies inside [lo, hi]
    (`transform_track.py:233-262` pitch clamp)."""
    out, _ = rate_limit_series(
        np.asarray(values, dtype=np.float64), max_step=30.0, lo=-45.0, hi=45.0
    )
    assert np.all(out >= -45.0 - 1e-9) and np.all(out <= 45.0 + 1e-9)


@given(st.lists(finite, min_size=2, max_size=200))
@settings(max_examples=200, deadline=None)
def test_rate_limit_converges_when_constant(values):
    """Feeding a constant target after the prefix converges to that target
    within |target - start| / max_step steps."""
    arr = np.asarray(values, dtype=np.float64)
    target = float(arr[-1])
    needed = int(abs(target - arr[0]) / 5.0) + 2
    arr = np.concatenate([arr[:1], np.full(needed, target)])
    out, _ = rate_limit_series(arr, max_step=5.0)
    assert abs(out[-1] - target) <= 1e-6


@given(st.lists(finite, min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_wrap_delta_range(values):
    """Wrapped deltas always land in [-180, 180]."""
    w = _wrap(np.asarray(values, dtype=np.float64))
    assert np.all(w >= -180.0 - 1e-9) and np.all(w <= 180.0 + 1e-9)


@given(st.lists(st.floats(min_value=-720, max_value=720, allow_nan=False), min_size=2, max_size=100))
@settings(max_examples=200, deadline=None)
def test_unwrap_continuity(angles):
    """Unwrapped series (prev + wrapped delta) never jumps more than 180° in
    one step and is congruent to the input mod 360
    (`transform_track.py:133-155`)."""
    a = np.asarray(angles, dtype=np.float64)
    deltas = _wrap(np.diff(a))
    unwrapped = np.concatenate([a[:1], a[0] + np.cumsum(deltas)])
    assert np.all(np.abs(np.diff(unwrapped)) <= 180.0 + 1e-9)
    # congruence mod 360
    diff = (unwrapped - a) / 360.0
    assert np.allclose(diff, np.round(diff), atol=1e-6)


@given(st.lists(finite, min_size=2, max_size=200), st.integers(min_value=1, max_value=199))
@settings(max_examples=200, deadline=None)
def test_rate_limit_state_carry_equals_single_pass(values, cut):
    """Splitting a series at any point and carrying the state must equal the
    single-pass scan — the invariant the mapInPandas batch-boundary carry
    relies on."""
    arr = np.asarray(values, dtype=np.float64)
    cut = min(cut, len(arr) - 1)
    whole, _ = rate_limit_series(arr, max_step=7.5, lo=-100.0, hi=100.0)
    first, state = rate_limit_series(arr[:cut], max_step=7.5, lo=-100.0, hi=100.0)
    second, _ = rate_limit_series(arr[cut:], max_step=7.5, lo=-100.0, hi=100.0, prev=state)
    assert np.allclose(np.concatenate([first, second]), whole)


@given(st.lists(finite, min_size=1, max_size=300), st.integers(1, 299))
@settings(max_examples=200, deadline=None)
def test_ewma_state_carry_equals_single_pass(values, cut):
    """Splitting a sequence at any point and carrying state must equal the
    single-pass result bit-for-bit — the invariant the streaming EWMA's
    micro-batch boundary relies on."""
    from worlddatapipeline_spark.operators.stateful import ewma_series

    x = np.asarray(values, dtype=np.float64)
    cut = min(cut, len(x))
    whole, _ = ewma_series(x, alpha=0.25)
    a, state = ewma_series(x[:cut], alpha=0.25)
    b, _ = ewma_series(x[cut:], alpha=0.25, prev=state)
    assert np.array_equal(np.concatenate([a, b]), whole)


@given(st.lists(finite, min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_ewma_bounded_by_input_range(values):
    """EWMA is a convex combination: outputs never leave [min(x), max(x)]."""
    from worlddatapipeline_spark.operators.stateful import ewma_series

    x = np.asarray(values, dtype=np.float64)
    out, _ = ewma_series(x, alpha=0.25)
    assert np.all(out >= x.min() - 1e-9) and np.all(out <= x.max() + 1e-9)


@given(st.integers(1, 4096), st.integers(1, 8))
@settings(max_examples=100, deadline=None)
def test_bloom_sizing_monotone(n, k):
    """optimal_n_bits grows with n, stays a power of two, and never
    exceeds MAX_BITS for any reference set the build guard accepts."""
    from worlddatapipeline_spark.operators.bloom import optimal_n_bits

    m = optimal_n_bits(n, 0.01)
    assert m & (m - 1) == 0
    assert m >= optimal_n_bits(max(1, n // 2), 0.01) // 2


def test_cusum_closed_form_equals_recursion():
    """The window-expressible closed form S_i = P_i - min(0, min_prefix(P))
    used by q_cusum_drift_alarms equals the textbook recursion
    S_i = max(0, S_{i-1} + d_i), both drift directions, on random series."""
    import numpy as np

    rng = np.random.default_rng(5)
    for _ in range(20):
        d = rng.integers(-1000, 1000, size=rng.integers(1, 200))
        p = np.cumsum(d)
        s_pos_closed = p - np.minimum(0, np.minimum.accumulate(p))
        s_neg_closed = np.maximum(0, np.maximum.accumulate(p)) - p
        s_pos, s_neg = np.zeros_like(p), np.zeros_like(p)
        sp = sn = 0
        for i, di in enumerate(d):
            sp = max(0, sp + di)
            sn = max(0, sn - di)
            s_pos[i], s_neg[i] = sp, sn
        assert (s_pos_closed == s_pos).all()
        assert (s_neg_closed == s_neg).all()
