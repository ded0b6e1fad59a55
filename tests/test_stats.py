import numpy as np
import pytest

from serverless_covariate_drift_detection_ray.functions.stats import (
    chi2_sf,
    chi2_test_counts,
    gammainc_upper,
    kolmogorov_sf,
    ks_2samp,
    median_heuristic_sigma,
    mmd2_biased,
    mmd_permutation_test,
)

RNG = np.random.Generator(np.random.PCG64(7))


class TestGamma:
    def test_known_chi2_criticals(self):
        # classic table values: P(X² > crit) = alpha
        assert chi2_sf(3.841, 1) == pytest.approx(0.05, abs=2e-4)
        assert chi2_sf(5.991, 2) == pytest.approx(0.05, abs=2e-4)
        assert chi2_sf(9.488, 4) == pytest.approx(0.05, abs=2e-4)
        assert chi2_sf(6.635, 1) == pytest.approx(0.01, abs=2e-4)
        assert chi2_sf(0.0, 3) == 1.0

    def test_gammainc_bounds(self):
        assert gammainc_upper(2.5, 0.0) == 1.0
        assert gammainc_upper(1.0, 50.0) < 1e-20
        # Q(1, x) = exp(-x)
        for x in [0.3, 1.7, 4.2]:
            assert gammainc_upper(1.0, x) == pytest.approx(np.exp(-x), rel=1e-10)


class TestKS:
    def test_identical_samples(self):
        x = RNG.normal(0, 1, 500)
        d, p = ks_2samp(x, x)
        assert d == 0.0 and p == 1.0

    def test_known_asymptotics(self):
        # Kolmogorov sf golden points: Q(0.828) ~ 0.5, Q(1.36) ~ 0.049
        assert kolmogorov_sf(1.36) == pytest.approx(0.0491, abs=3e-3)
        assert kolmogorov_sf(0.5) > 0.95

    def test_detects_shift(self):
        x = RNG.normal(0, 1, 2000)
        y = RNG.normal(0.5, 1, 2000)
        d, p = ks_2samp(x, y)
        assert d > 0.15 and p < 1e-6

    def test_null_uniform_p(self):
        x = RNG.normal(0, 1, 1000)
        y = RNG.normal(0, 1, 1000)
        d, p = ks_2samp(x, y)
        assert p > 0.01  # same distribution should not reject at alpha=0.01


class TestChi2:
    def test_homogeneous_counts(self):
        stat, dof, p = chi2_test_counts(np.array([100, 200, 300]), np.array([110, 190, 310]))
        assert dof == 2
        assert p > 0.1

    def test_shifted_counts(self):
        stat, dof, p = chi2_test_counts(np.array([400, 100, 100]), np.array([200, 200, 200]))
        assert p < 1e-10

    def test_degenerate(self):
        stat, dof, p = chi2_test_counts(np.array([5]), np.array([7]))
        assert p == 1.0


class TestMMD:
    def test_sigma_median_heuristic(self):
        x = RNG.normal(0, 1, size=(500, 4))
        s = median_heuristic_sigma(x)
        # E[dist] for 4-d std normals ~ sqrt(2*4)=2.83; median close
        assert 2.0 < s < 4.0

    def test_zero_for_identical(self):
        x = RNG.normal(0, 1, size=(100, 8))
        assert mmd2_biased(x, x, sigma=1.0) == pytest.approx(0.0, abs=1e-12)

    def test_detects_shift_and_null_passes(self):
        x = RNG.normal(0, 1, size=(300, 8))
        y = RNG.normal(1.2, 1, size=(300, 8))
        z = RNG.normal(0, 1, size=(300, 8))
        sigma = median_heuristic_sigma(x)
        d_shift, p_shift = mmd_permutation_test(x, y, sigma, num_permutations=100, seed=3)
        d_null, p_null = mmd_permutation_test(x, z, sigma, num_permutations=100, seed=3)
        assert p_shift < 0.02
        assert d_shift > d_null
        assert p_null > 0.05

    def test_permutation_determinism(self):
        x = RNG.normal(0, 1, size=(200, 4))
        y = RNG.normal(0.3, 1, size=(200, 4))
        r1 = mmd_permutation_test(x, y, 2.0, num_permutations=50, seed=11)
        r2 = mmd_permutation_test(x, y, 2.0, num_permutations=50, seed=11)
        assert r1 == r2

    def test_monotone_in_shift(self):
        x = RNG.normal(0, 1, size=(256, 8))
        sigma = median_heuristic_sigma(x)
        dists = []
        for shift in [0.0, 0.5, 1.0, 2.0]:
            y = RNG.normal(shift, 1, size=(256, 8))
            dists.append(mmd2_biased(x, y, sigma))
        assert all(b > a for a, b in zip(dists, dists[1:]))


def test_bh_qvalues_matches_definition():
    """BH q-values vs the direct step-up definition on random vectors
    (with ties) and a hand example."""
    import numpy as np

    from serverless_covariate_drift_detection_ray.functions.stats import bh_qvalues

    def slow_bh(p):
        p = np.asarray(p, float)
        m = p.size
        q = np.empty(m)
        for i in range(m):
            # q_i = min over all j with p_j >= p_i of p_j * m / rank_j
            cand = []
            order = np.argsort(p, kind="mergesort")
            for r, j in enumerate(order, start=1):
                if p[j] >= p[i]:
                    cand.append(p[j] * m / r)
            q[i] = min(1.0, min(cand))
        return q

    # hand example (classic): p = [.01, .04, .03, .005], m=4
    p = np.array([0.01, 0.04, 0.03, 0.005])
    got = bh_qvalues(p)
    # sorted: .005(r1)->.02, .01(r2)->.02, .03(r3)->.04, .04(r4)->.04
    assert np.allclose(got, [0.02, 0.04, 0.04, 0.02])
    rng = np.random.Generator(np.random.PCG64(17))
    for _ in range(5):
        p = np.round(rng.uniform(0, 1, 40), 2)  # ties likely
        assert np.allclose(bh_qvalues(p), slow_bh(p))
    # monotone in p after sorting; empty is fine
    assert bh_qvalues(np.array([])).size == 0
