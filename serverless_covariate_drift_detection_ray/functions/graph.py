"""Connected components over edge lists — the shared clustering kernel.

One implementation of vectorized min-label propagation with pointer
jumping, used by every near-dup clustering path (phash band clusters in
stages/constraints.py, embedding-cosine semantic dedup in pipelines/ann.py).
Convergence is O(log n) rounds thanks to the pointer-jumping contraction;
``max_rounds=64`` is an ample safety cap (2^64 nodes), matching the
original inline kernels.
"""

from __future__ import annotations

import numpy as np


def cc_labels(n: int, ai: np.ndarray, bi: np.ndarray,
              max_rounds: int = 64) -> np.ndarray:
    """Component labels for ``n`` nodes (0..n-1) and index-space undirected
    edges ``(ai, bi)``. Returns per-node labels where each label is the
    minimum node index of its component (isolated nodes label themselves)."""
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        before = labels.copy()
        np.minimum.at(labels, ai, labels[bi])
        np.minimum.at(labels, bi, labels[ai])
        labels = labels[labels]  # pointer jumping halves tree depth per round
        if np.array_equal(labels, before):
            break
    return labels


def cc_min_label(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Node-id-space wrapper: edges given as arbitrary int64 node ids.

    Returns ``(nodes sorted ascending, component rep id per node)`` where the
    rep is the minimum node id in the component."""
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    lab = cc_labels(nodes.size, ai, bi)
    return nodes, nodes[lab]
