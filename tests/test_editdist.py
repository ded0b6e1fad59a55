"""Unit tests for the vectorized Levenshtein kernel and the skyline mask."""

import numpy as np

from serverless_covariate_drift_detection_ray.functions.editdist import levenshtein_pairs
from serverless_covariate_drift_detection_ray.pipelines.queries import _skyline_mask


def _lev_ref(a: str, b: str) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        curr = [i] + [0] * n
        for j in range(1, n + 1):
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1,
                          prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = curr
    return prev[n]


def test_levenshtein_pairs_matches_scalar_reference():
    rng = np.random.default_rng(7)
    alphabet = list("abcde")
    lefts, rights = [], []
    for _ in range(300):
        la, lb = rng.integers(0, 12, 2)
        lefts.append("".join(rng.choice(alphabet, la)))
        rights.append("".join(rng.choice(alphabet, lb)))
    got = levenshtein_pairs(np.array(lefts, object), np.array(rights, object))
    want = np.array([_lev_ref(a, b) for a, b in zip(lefts, rights)])
    np.testing.assert_array_equal(got, want)


def test_levenshtein_known_values():
    got = levenshtein_pairs(
        np.array(["kitten", "", "abc", "same"], object),
        np.array(["sitting", "ab", "abc", "same"], object))
    np.testing.assert_array_equal(got, [3, 2, 0, 0])


def test_levenshtein_bounded_saturates_at_k_plus_one():
    """Banded kernel contract: exact for d <= k, exactly k+1 above (any k),
    including the |len diff| > k shortcut rows."""
    rng = np.random.default_rng(13)
    alphabet = list("abcd")
    lefts, rights = [], []
    for _ in range(400):
        la, lb = rng.integers(0, 14, 2)
        lefts.append("".join(rng.choice(alphabet, la)))
        rights.append("".join(rng.choice(alphabet, lb)))
    la = np.array(lefts, object)
    rb = np.array(rights, object)
    full = levenshtein_pairs(la, rb)
    for k in (0, 1, 2, 3):
        got = levenshtein_pairs(la, rb, max_dist=k)
        np.testing.assert_array_equal(got, np.minimum(full, k + 1),
                                      err_msg=f"k={k}")


def test_skyline_mask_matches_bruteforce():
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        # small value range forces plenty of exact ties in both dims
        p = rng.integers(0, 8, n).astype(np.float64)
        d = rng.integers(0, 8, n).astype(np.int64)
        got = _skyline_mask(p, d)
        want = np.array([
            not any((p[j] >= p[i] and d[j] <= d[i]) and
                    (p[j] > p[i] or d[j] < d[i]) for j in range(n))
            for i in range(n)])
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_skyline_local_then_final_is_exact():
    """Skyline(union) == Skyline(concat of per-block skylines) — the
    distributed two-pass decomposition used by skyline_orders."""
    rng = np.random.default_rng(3)
    p = rng.uniform(0, 1000, 500)
    d = rng.integers(0, 10**9, 500)
    whole = set(np.nonzero(_skyline_mask(p, d))[0])
    # split into 7 blocks, local pass, then final over survivors
    surv = []
    for blk in np.array_split(np.arange(500), 7):
        m = _skyline_mask(p[blk], d[blk])
        surv.extend(blk[m])
    surv = np.array(surv)
    fin = surv[_skyline_mask(p[surv], d[surv])]
    assert set(fin) == whole
