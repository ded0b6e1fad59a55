"""Hypothesis property tests: sketch merge semantics under arbitrary inputs.

The per-partition partial-merge correctness rests on these algebraic
properties (SURVEY.md §5 "merge-associativity"); hypothesis hunts the edge
cases the fixed-seed unit tests miss (empty chunks, duplicates, extreme
magnitudes, pathological splits).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from serverless_covariate_drift_detection_ray.state.sketches import (
    CountMinSketch,
    HyperLogLog,
    TDigest,
)

finite = st.floats(min_value=-1e12, max_value=1e12,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=40, deadline=None)
@given(arrays(np.float64, st.integers(0, 300), elements=finite),
       st.integers(1, 5))
def test_tdigest_split_merge_total_weight_exact(x, k):
    """count(merge of any split) == count(whole); quantiles stay in range."""
    parts = np.array_split(x, k)
    tds = []
    for p in parts:
        t = TDigest()
        t.update(p)
        tds.append(t)
    merged = TDigest.merge_many(tds)
    assert merged.count == float(x.size)
    if x.size:
        q = merged.quantile([0.0, 0.5, 1.0])
        # tolerance is ULP-aware: centroid means are float weighted
        # averages, so at |x| ~ 1e12 a single rounding step (~1.2e-4) can
        # put a mean one ulp past the true extremum — a float-arithmetic
        # artifact of the sketch, not a range bug (hypothesis found the
        # all-identical-values case at 7.33e11)
        tol = 1e-9 + 4 * np.spacing(max(abs(x.min()), abs(x.max()), 1.0))
        assert (q >= x.min() - tol).all() and (q <= x.max() + tol).all()


@settings(max_examples=40, deadline=None)
@given(arrays(np.int64, st.integers(0, 500),
              elements=st.integers(-2**40, 2**40)), st.integers(1, 4))
def test_hll_merge_equals_single_update(vals, k):
    """Register-wise merge of split updates == one update of the whole."""
    whole = HyperLogLog()
    whole.update(vals)
    parts = np.array_split(vals, k)
    merged = HyperLogLog()
    for p in parts:
        h = HyperLogLog()
        h.update(p)
        merged.merge(h)
    assert np.array_equal(whole.registers, merged.registers)


@settings(max_examples=40, deadline=None)
@given(arrays(np.int64, st.integers(0, 400),
              elements=st.integers(0, 1000)), st.integers(1, 4))
def test_cms_merge_never_undercounts(vals, k):
    """CMS estimate after split+merge >= true count for every value (the
    one-sided error guarantee must survive merging)."""
    parts = np.array_split(vals, k)
    merged = CountMinSketch()
    for p in parts:
        c = CountMinSketch()
        c.update(p)
        merged.merge(c)
    uniq, counts = np.unique(vals, return_counts=True)
    if uniq.size:
        est = merged.query(uniq)
        assert (est >= counts).all()


@settings(max_examples=40, deadline=None)
@given(arrays(np.float64, st.tuples(st.integers(4, 120), st.integers(2, 8)),
              elements=st.floats(min_value=-1e6, max_value=1e6,
                                 allow_nan=False, allow_infinity=False)),
       st.integers(1, 6))
def test_pca_moment_partials_merge_equals_whole(x, k):
    """PCA moment partials summed over ANY split must equal the whole-input
    moments exactly up to float addition order (the merge is elementwise +),
    and the solved eigenvalues must match to the moment formula's inherent
    precision: the covariance G - n*mu*mu^T cancels catastrophically for
    large-magnitude near-constant inputs, so the tolerance scales with
    max|x|^2 * eps (hypothesis found a constant ~2.3e5 matrix where a fixed
    1e-6 atol is unachievable)."""
    from serverless_covariate_drift_detection_ray.functions.pca import (
        pca_partials,
        pca_solve,
    )

    n1, s1, g1 = pca_partials(x)
    acc_n, acc_s, acc_g = 0, np.zeros(x.shape[1]), np.zeros((x.shape[1],) * 2)
    for chunk in np.array_split(x, k):
        n, s, g = pca_partials(chunk)
        acc_n, acc_s, acc_g = acc_n + n, acc_s + s, acc_g + g
    assert acc_n == n1 == x.shape[0]
    scale = max(1.0, float(np.abs(x).max()))
    np.testing.assert_allclose(acc_s, s1, rtol=1e-9, atol=scale * 1e-9)
    np.testing.assert_allclose(acc_g, g1, rtol=1e-9, atol=scale * scale * 1e-9)
    kdim = min(3, x.shape[1])
    _, c1, v1 = pca_solve(n1, s1, g1, kdim)
    _, c2, v2 = pca_solve(acc_n, acc_s, acc_g, kdim)
    tol = scale * scale * x.shape[0] * np.finfo(np.float64).eps * 16
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=max(tol, 1e-9))
