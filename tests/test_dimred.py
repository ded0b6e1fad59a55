"""Distributed PCA (the reference's dim-reduction analogue) vs exact numpy.

Reference parity: the conv encoder in
/root/reference/dimensionality_reduction_api/app/dr.py:16-71 reduces inputs
before the MMD detector; the engine's linear analogue must be EXACT PCA —
these tests pin the moment-partial fit against in-memory numpy on the real
sf0.001 embeddings table, block-layout invariance, and the latent-space
drift verdicts.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from serverless_covariate_drift_detection_ray.pipelines import dimred

SF = "/root/testdata/sf0.001"


def _exact_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / (x.shape[0] - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals, kind="stable")[::-1][:k]
    comps = evecs[:, order].T.copy()
    flips = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    comps *= np.where(flips == 0, 1.0, flips)[:, None]
    return mean, comps, evals[order]


def _table_matrix() -> np.ndarray:
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    return np.stack(t["embedding"].to_pylist()).astype(np.float64)


def test_pca_fit_matches_exact_numpy(ray_session):
    x = _table_matrix()
    mean, comps, var = dimred.pca_fit(SF, k=8)
    e_mean, e_comps, e_var = _exact_pca(x, 8)
    np.testing.assert_allclose(mean, e_mean, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(var, e_var, rtol=1e-8, atol=1e-10)
    # sign convention makes components exactly comparable (not just |dot|=1)
    np.testing.assert_allclose(comps, e_comps, rtol=1e-7, atol=1e-9)


def test_pca_partials_merge_is_layout_invariant():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1000, 16))
    n1, s1, g1 = dimred.pca_partials(x)
    acc_n, acc_s, acc_g = 0, 0.0, 0.0
    for chunk in np.array_split(x, 7):
        n, s, g = dimred.pca_partials(chunk)
        acc_n, acc_s, acc_g = acc_n + n, acc_s + s, acc_g + g
    assert acc_n == n1
    np.testing.assert_allclose(acc_s, s1, rtol=1e-12)
    np.testing.assert_allclose(acc_g, g1, rtol=1e-12)
    m1, c1, v1 = dimred.pca_solve(n1, s1, g1, 4)
    m2, c2, v2 = dimred.pca_solve(acc_n, acc_s, acc_g, 4)
    np.testing.assert_allclose(c1, c2, rtol=1e-9, atol=1e-12)


def test_pca_projection_values_and_variance_order(ray_session):
    df = dimred.pca_project_embeddings(SF, k=4).to_pandas()
    x = _table_matrix()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])
    ids = t["vec_id"].to_numpy()
    mean, comps, var = _exact_pca(x, 4)
    z = (x - mean) @ comps.T
    got = df.sort_values("vec_id").reset_index(drop=True)
    order = np.argsort(ids, kind="stable")
    for j in range(4):
        np.testing.assert_allclose(got[f"z{j}"].to_numpy(),
                                   np.round(z[order, j], 6), atol=2e-6)
    # latent variance must decrease with component index
    sample_var = np.var(z, axis=0)
    assert np.all(np.diff(sample_var) <= 1e-9)
    assert np.all(np.diff(var) <= 1e-9)


def test_pca_mmd_drift_verdicts(ray_session):
    out = dimred.pca_mmd_drift(SF).to_pandas().set_index("case")
    assert not out.loc["null_current", "is_drift"]
    assert out.loc["shifted_current", "is_drift"]
    assert out.loc["shifted_current", "mmd2"] > out.loc["null_current", "mmd2"]


def test_pca_fit_deterministic_across_runs(ray_session):
    a = dimred.pca_fit(SF, k=3)
    b = dimred.pca_fit(SF, k=3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
