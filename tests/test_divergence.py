"""Histogram-divergence statistics (PSI / JS / Hellinger / Wasserstein-1) and
their Check-protocol plugins: golden values, invariants, bootstrap p-value
behavior, and the full fit→validate pipeline flagging drifted partitions."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from serverless_covariate_drift_detection_ray.functions import divergence as dv


IDENT = np.array([10, 20, 30, 40], dtype=np.int64)
SHIFT = np.array([40, 30, 20, 10], dtype=np.int64)


def test_zero_on_identical():
    for fn in (dv.psi, dv.js_divergence, dv.hellinger):
        assert fn(IDENT, IDENT) == pytest.approx(0.0, abs=1e-12)
    assert dv.wasserstein1_binned(IDENT, IDENT, 1.0) == pytest.approx(0.0)
    # scale-invariance on proportional counts (same distribution, 10x rows)
    assert dv.js_divergence(IDENT, IDENT * 10) < 1e-3


def test_symmetry_and_bounds():
    assert dv.js_divergence(IDENT, SHIFT) == pytest.approx(dv.js_divergence(SHIFT, IDENT))
    assert dv.hellinger(IDENT, SHIFT) == pytest.approx(dv.hellinger(SHIFT, IDENT))
    assert dv.wasserstein1_binned(IDENT, SHIFT, 2.0) == pytest.approx(
        dv.wasserstein1_binned(SHIFT, IDENT, 2.0))
    assert 0.0 < dv.js_divergence(IDENT, SHIFT) <= np.log(2.0)
    assert 0.0 < dv.hellinger(IDENT, SHIFT) <= 1.0
    assert dv.psi(IDENT, SHIFT) > 0.0


def test_wasserstein_golden_point_masses():
    # all mass in bin 0 vs all mass in bin 3, width w → W1 = 3w
    a = np.array([100, 0, 0, 0]); b = np.array([0, 0, 0, 100])
    assert dv.wasserstein1_binned(a, b, 0.5) == pytest.approx(1.5)


def test_psi_golden_two_bins():
    # p=(0.25,0.75) q=(0.75,0.25) smoothed with 0.5 on counts 25/75 of n=100
    p = (np.array([25, 75]) + 0.5) / 101.0
    q = (np.array([75, 25]) + 0.5) / 101.0
    expect = ((p - q) * np.log(p / q)).sum()
    assert dv.psi(np.array([25, 75]), np.array([75, 25])) == pytest.approx(expect)


def test_vectorized_matches_scalar():
    rng = np.random.Generator(np.random.PCG64(3))
    stack_r = rng.integers(0, 50, size=(8, 16))
    stack_t = rng.integers(0, 50, size=(8, 16))
    for fn in (dv.psi, dv.js_divergence, dv.hellinger,
               lambda r, t: dv.wasserstein1_binned(r, t, 2.0)):
        vec = fn(stack_r, stack_t)
        one = np.array([float(fn(stack_r[i], stack_t[i])) for i in range(8)])
        np.testing.assert_allclose(vec, one, rtol=1e-12)


def test_bootstrap_pvalue_null_vs_drifted():
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.multinomial(5000, np.full(16, 1 / 16))
    same = rng.multinomial(5000, np.full(16, 1 / 16))
    skew = rng.multinomial(5000, np.linspace(1, 8, 16) / np.linspace(1, 8, 16).sum())
    _, p_null = dv.multinomial_bootstrap_pvalue(base, same, dv.psi, n_boot=200, seed=5)
    _, p_drift = dv.multinomial_bootstrap_pvalue(base, skew, dv.psi, n_boot=200, seed=5)
    assert p_null > 0.05
    assert p_drift <= 1.0 / 201.0 + 1e-12
    # deterministic under the same seed
    assert dv.multinomial_bootstrap_pvalue(base, skew, dv.psi, 200, 5) == \
        dv.multinomial_bootstrap_pvalue(base, skew, dv.psi, 200, 5)


def test_divergence_checks_through_pipeline(ray_session, tmp_path):
    """All four bin-divergence checks run through fit→validate: clean
    partitions pass, the dims-drift partition is flagged on `w` by every
    distribution-sensitive check."""
    from serverless_covariate_drift_detection_ray.fixtures.gen import ensure_fixture
    from serverless_covariate_drift_detection_ray.pipelines.config import EngineConfig
    from serverless_covariate_drift_detection_ray.pipelines.fit import fit
    from serverless_covariate_drift_detection_ray.pipelines.validate import validate
    from serverless_covariate_drift_detection_ray.sources.fragmented import TableManifest

    fix = ensure_fixture("tiny")
    cfg = EngineConfig(freeze_time="01/01/2026 00:00:00.000000",
                       drift_checks=("psi", "js", "hellinger", "wasserstein"))
    ref_dir, out_dir = str(tmp_path / "ref"), str(tmp_path / "out")
    fit(fix, ref_dir, cfg)
    validate(fix, ref_dir, out_dir, cfg)
    verdicts = pd.concat([
        pq.read_table(f).to_pandas()
        for f in sorted(glob.glob(os.path.join(out_dir, "verdicts", "*", "*.parquet")))
    ])
    kinds = {pid: meta["kind"]
             for pid, meta in TableManifest.load(fix).partitions.items()}
    names = {"psi", "js", "hellinger", "wasserstein"}
    assert names <= set(verdicts.check.unique())
    for pid, kind in kinds.items():
        d = verdicts[(verdicts.partition_id == pid) & verdicts.check.isin(names)]
        if kind in ("reference", "clean"):
            assert d.passed.all(), (pid, kind)
        elif kind == "drift-dims":
            w = d[d.column == "w"]
            assert (~w.passed).all(), w


def test_cvm_binned_zero_iff_equal_and_monotone_in_shift():
    import numpy as np

    from serverless_covariate_drift_detection_ray.functions.divergence import cvm_binned

    rng = np.random.default_rng(3)
    base = rng.multinomial(20_000, np.ones(32) / 32).astype(float)
    assert cvm_binned(base, base) == 0.0
    prev = 0.0
    probs = np.ones(32) / 32
    for shift in (0.1, 0.3, 0.6):
        p = probs + shift * np.linspace(-1, 1, 32) / 32
        p = np.clip(p, 1e-6, None)
        shifted = rng.multinomial(20_000, p / p.sum()).astype(float)
        t = float(cvm_binned(base, shifted))
        assert t > prev
        prev = t


def test_cvm_check_registered_and_runs(ray_session, tmp_path):
    from serverless_covariate_drift_detection_ray.fixtures.gen import ensure_fixture
    from serverless_covariate_drift_detection_ray.pipelines.config import EngineConfig
    from serverless_covariate_drift_detection_ray.pipelines.fit import fit
    from serverless_covariate_drift_detection_ray.pipelines.validate import validate

    fix = ensure_fixture("tiny")
    cfg = EngineConfig(freeze_time="01/01/2026 00:00:00.000000",
                       drift_checks=("ks", "cvm"))
    ref = str(tmp_path / "ref")
    out = str(tmp_path / "out")
    fit(fix, ref, cfg)
    validate(fix, ref, out, cfg, resume=False)
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    vs = pd.concat([pq.read_table(f).to_pandas()
                    for f in glob.glob(f"{out}/verdicts/*/*.parquet")])
    assert (vs.check == "cvm").any()
    # structurally-drifted partitions flag, reference partition passes
    cvm = vs[vs.check == "cvm"]
    assert cvm[cvm.partition_id == 0].passed.all()
