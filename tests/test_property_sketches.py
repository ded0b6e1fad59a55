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
        assert (q >= x.min() - 1e-9).all() and (q <= x.max() + 1e-9).all()


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
