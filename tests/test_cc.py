"""Property tests for the shared connected-components kernel
(functions/graph.py, used by semantic dedup and the phash cluster passes):
labels must equal a ground-truth union-find over arbitrary edge lists."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_covariate_drift_detection_ray.functions.graph import cc_min_label as _cc_min_label


def _union_find(a, b):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(a, b):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=120))
def test_cc_matches_union_find(edges):
    a = np.array([u for u, _ in edges], dtype=np.int64)
    b = np.array([v for _, v in edges], dtype=np.int64)
    nodes, reps = _cc_min_label(a, b)
    truth = _union_find(a.tolist(), b.tolist())
    # every touched node appears exactly once with the component-min rep
    assert sorted(nodes.tolist()) == sorted(truth)
    got = dict(zip(nodes.tolist(), reps.tolist()))
    # rep of each truth-component must be its min member in both
    comp = {}
    for n, r in truth.items():
        comp.setdefault(r, []).append(n)
    for members in comp.values():
        m = min(members)
        for n in members:
            assert got[n] == m


def test_cc_self_loops_and_duplicates():
    a = np.array([5, 5, 7, 9, 9], dtype=np.int64)
    b = np.array([5, 6, 6, 9, 8], dtype=np.int64)
    nodes, reps = _cc_min_label(a, b)
    got = dict(zip(nodes.tolist(), reps.tolist()))
    assert got == {5: 5, 6: 5, 7: 5, 8: 8, 9: 8}


def test_distributed_cc_dedup_matches_driver_path(ray_session, monkeypatch):
    """Forcing the edge-list gate to 0 routes semantic dedup through the
    distributed Pregel-style CC; survivors and cluster sizes must match the
    driver-kernel path exactly."""
    import pandas as pd

    from serverless_covariate_drift_detection_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    a = ann.dedup_semantic_embeddings(sf).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    monkeypatch.setattr(ann, "EMB_CC_MAX_PAIRS", 0)
    b = ann.dedup_semantic_embeddings(sf).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=True)


def test_cc_min_label_distributed_full_int64_range(ray_session):
    """The arrow-exact distributed CC must match the driver kernel on ids
    spanning the FULL signed-int64 domain (|id| >= 2^53 would alias through
    a pandas float64 round-trip — the reason ann's CC refuses them), on a
    long chain (adversarial diameter for plain propagation), with duplicate
    and self edges."""
    import pyarrow as pa
    import ray.data

    from serverless_covariate_drift_detection_ray.functions.graph import (
        cc_min_label_distributed,
    )

    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(-2**63, 2**63 - 1, size=120, dtype=np.int64))
    chain = ids[:17]
    a = list(chain[:-1]) + [int(ids[0])]          # chain + a self edge
    b = list(chain[1:]) + [int(ids[0])]
    for _ in range(60):
        i, j = rng.integers(0, ids.size, 2)
        a.append(int(ids[i]))
        b.append(int(ids[j]))
    a += a[:10]                                    # duplicate edges
    b += b[:10]
    a = np.array(a, np.int64)
    b = np.array(b, np.int64)
    nodes_ref, rep_ref = _cc_min_label(a, b)
    pairs = ray.data.from_arrow(
        pa.table({"va": pa.array(a), "vb": pa.array(b)})).repartition(4)
    out = cc_min_label_distributed(pairs).to_pandas().sort_values(
        "node").reset_index(drop=True)
    assert np.array_equal(out["node"].to_numpy(), nodes_ref)
    assert np.array_equal(out["lab"].to_numpy(), rep_ref)
