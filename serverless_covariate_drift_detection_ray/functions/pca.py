"""Exact PCA from mergeable moment partials.

The engine's linear stand-in for the reference's conv encoder
(/root/reference/dimensionality_reduction_api/app/dr.py:16-71): a block
contributes ``(n, sum_x, X^T X)`` — d and d*d doubles regardless of block
height — partials merge by addition, and one d x d ``eigh`` on the driver
gives the components. Used by the embeddings-table pipelines
(pipelines/dimred.py) and by the ``pca_mmd`` drift check over
phash-derived image embeddings (stages/checks.py).
"""

from __future__ import annotations

import numpy as np


def pca_partials(x: np.ndarray) -> tuple[int, np.ndarray, np.ndarray]:
    """Per-block moment partials for PCA: ``(n, sum_x, X^T X)``.

    Exactly mergeable by elementwise addition — the merged moments give
    the exact covariance ``(G - n * mu mu^T) / (n - 1)`` regardless of
    how rows were split into blocks.
    """
    x = np.asarray(x, dtype=np.float64)
    return x.shape[0], x.sum(axis=0), x.T @ x


def pca_solve(
    n: int, s: np.ndarray, g: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Solve merged moments -> ``(mean, components (k, d), explained_var)``.

    Components are the top-k covariance eigenvectors, eigenvalue-descending,
    each sign-normalized so its largest-|entry| is positive (eigenvectors
    are otherwise only defined up to sign, and byte-stable artifacts need a
    unique representative).
    """
    mean = s / max(n, 1)
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals, kind="stable")[::-1][:k]
    comps = evecs[:, order].T.copy()  # (k, d)
    var = np.maximum(evals[order], 0.0)
    flips = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    comps *= np.where(flips == 0, 1.0, flips)[:, None]
    return mean, comps, var
