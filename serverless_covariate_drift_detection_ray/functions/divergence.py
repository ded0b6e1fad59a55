"""Histogram-divergence drift statistics + multinomial bootstrap p-values.

The reference's drift surface is MMD-with-permutation-test
(/root/reference/ml/training.py:14-16,521-537); production drift monitors
usually add bin-based divergences (PSI, Jensen-Shannon, Hellinger,
Wasserstein-1) because they are computable from MERGEABLE histogram sketches
alone — no raw samples cross the wire. These plug into the engine's ``Check``
protocol (stages/checks.py) over the same ``FixedHistogram`` marginal state the
KS check already reads.

All statistics operate on the LAST axis so a (B, bins) stack of bootstrap
replicates evaluates in one vectorized pass. p-values come from a parametric
multinomial bootstrap under H0 (both windows drawn from the pooled bin
distribution) — the histogram-sketch analogue of the reference's permutation
test, deterministic under a caller-supplied seed.
"""

from __future__ import annotations

import numpy as np

# Laplace smoothing pseudo-count per bin: keeps log-ratios finite on empty
# bins; identical constant is used by the SQL oracle (queries.PSI_SQL).
SMOOTH = 0.5


def _probs(counts: np.ndarray) -> np.ndarray:
    """Smoothed bin probabilities along the last axis."""
    c = np.asarray(counts, dtype=np.float64)
    c = c + SMOOTH
    return c / c.sum(axis=-1, keepdims=True)


def psi(ref_counts: np.ndarray, test_counts: np.ndarray) -> np.ndarray:
    """Population Stability Index: sum((p-q) * ln(p/q)). >=0, 0 iff p==q."""
    p, q = _probs(ref_counts), _probs(test_counts)
    return ((p - q) * np.log(p / q)).sum(axis=-1)


def js_divergence(ref_counts: np.ndarray, test_counts: np.ndarray) -> np.ndarray:
    """Jensen-Shannon divergence, natural log — bounded in [0, ln 2]."""
    p, q = _probs(ref_counts), _probs(test_counts)
    m = 0.5 * (p + q)
    return 0.5 * ((p * np.log(p / m)).sum(axis=-1) + (q * np.log(q / m)).sum(axis=-1))


def hellinger(ref_counts: np.ndarray, test_counts: np.ndarray) -> np.ndarray:
    """Hellinger distance in [0, 1]."""
    p, q = _probs(ref_counts), _probs(test_counts)
    return np.sqrt(np.maximum(0.5 * ((np.sqrt(p) - np.sqrt(q)) ** 2).sum(axis=-1), 0.0))


def wasserstein1_binned(ref_counts: np.ndarray, test_counts: np.ndarray,
                        bin_width: float) -> np.ndarray:
    """Earth-mover distance between histograms sharing uniform-width bins:
    bin_width * sum |CDF_p - CDF_q| (unsmoothed — W1 is finite on empty bins)."""
    p = np.asarray(ref_counts, dtype=np.float64)
    q = np.asarray(test_counts, dtype=np.float64)
    p = p / np.maximum(p.sum(axis=-1, keepdims=True), 1.0)
    q = q / np.maximum(q.sum(axis=-1, keepdims=True), 1.0)
    diff = np.cumsum(p, axis=-1) - np.cumsum(q, axis=-1)
    return float(bin_width) * np.abs(diff).sum(axis=-1)


def cvm_binned(ref_counts: np.ndarray, test_counts: np.ndarray) -> np.ndarray:
    """Two-sample Cramér-von Mises statistic from shared-bin histograms:
    T = (n*m/(n+m)) * sum_b w_b (F_ref(b) - F_test(b))^2 with pooled bin
    weights w_b — the binned analogue of summing over pooled sample points.
    Scale-free in bin width; 0 iff the binned distributions agree."""
    r = np.asarray(ref_counts, dtype=np.float64)
    t = np.asarray(test_counts, dtype=np.float64)
    n = np.maximum(r.sum(axis=-1, keepdims=True), 1.0)
    m = np.maximum(t.sum(axis=-1, keepdims=True), 1.0)
    f1 = np.cumsum(r, axis=-1) / n
    f2 = np.cumsum(t, axis=-1) / m
    w = (r + t) / (n + m)
    tstat = (n * m / (n + m)).squeeze(-1) * ((f1 - f2) ** 2 * w).sum(axis=-1)
    return tstat


def multinomial_bootstrap_pvalue(
    ref_counts: np.ndarray,
    test_counts: np.ndarray,
    stat_fn,
    n_boot: int = 200,
    seed: int = 0,
) -> tuple[float, float]:
    """(observed stat, bootstrap p-value) for any of the divergences above.

    H0: both windows are multinomial draws from the pooled bin distribution.
    B replicate pairs are drawn at the two observed sample sizes and the
    statistic's null distribution is evaluated in one vectorized call —
    p = (1 + #{null >= observed}) / (B + 1), the same "add-one" estimator the
    reference's permutation callback uses (frouros PermutationTestDistanceBased,
    /root/reference/ml/training.py:521-527).
    """
    r = np.asarray(ref_counts, dtype=np.int64)
    t = np.asarray(test_counts, dtype=np.int64)
    n_ref, n_test = int(r.sum()), int(t.sum())
    observed = float(stat_fn(r, t))
    if n_ref == 0 or n_test == 0 or n_boot <= 0:
        return observed, 1.0
    pooled = (r + t).astype(np.float64)
    pooled /= pooled.sum()
    rng = np.random.Generator(np.random.PCG64(seed))
    boot_ref = rng.multinomial(n_ref, pooled, size=n_boot)
    boot_test = rng.multinomial(n_test, pooled, size=n_boot)
    null = np.asarray(stat_fn(boot_ref, boot_test), dtype=np.float64)
    p = (1.0 + float((null >= observed).sum())) / (n_boot + 1.0)
    return observed, p
