"""Vectorized Levenshtein distance over pair batches.

The kernel behind the blocked fuzzy join (``pipelines.queries
fuzzy_match_parts``): candidate pairs are grouped by the two strings'
(len_a, len_b) combo so every pair in one DP run shares exact dimensions
(no padding corruption), and the classic (m+1)x(n+1) DP is vectorized
across the pair axis — the only Python loops are the m*n cell loops
(~150 iterations for short names), each a full-width numpy op.

Reference parity note: the reference has no string ops; this is
engine-new capability per the build brief (fuzzy dedup for training-data
pipelines).
"""

from __future__ import annotations

import numpy as np


def _encode(strs: np.ndarray, width: int) -> np.ndarray:
    """(P,) array of str -> (P, width) int32 codepoint matrix (0-padded)."""
    if len(strs) == 0:
        return np.zeros((0, width), np.int32)
    buf = np.zeros((len(strs), max(width, 1)), np.int32)
    for i, s in enumerate(strs):  # encode once per string, not per DP cell
        if s:
            buf[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)[
                : width
            ].astype(np.int32)
    return buf


def _lev_block(a: np.ndarray, b: np.ndarray, m: int, n: int) -> np.ndarray:
    """Levenshtein for P pairs whose sides are exactly m and n chars.

    a: (P, >=m) int32, b: (P, >=n) int32. Returns (P,) int64 distances.
    """
    P = a.shape[0]
    prev = np.broadcast_to(np.arange(n + 1, dtype=np.int64), (P, n + 1)).copy()
    curr = np.empty_like(prev)
    for i in range(1, m + 1):
        curr[:, 0] = i
        cost = (a[:, i - 1 : i] != b[:, :n]).astype(np.int64)  # (P, n)
        for j in range(1, n + 1):
            curr[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, curr[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        prev, curr = curr, prev
    return prev[:, n].copy()


def _lev_block_bounded(a: np.ndarray, b: np.ndarray, m: int, n: int,
                       k: int) -> np.ndarray:
    """min(levenshtein, k+1) for P shared-shape pairs — Ukkonen band.

    Only the |i-j| <= k diagonal band is computed (2k+1 cells per row vs
    n), with every cell saturated at k+1: any path through an out-of-band
    cell costs > k, so the cap IS the out-of-band value and the DP stays
    exact for all distances <= k. For the fuzzy join's k=2 over ~20-char
    names this is ~5 numpy ops per row instead of ~20.
    """
    cap = np.int64(k + 1)
    P = a.shape[0]
    prev = np.minimum(np.arange(n + 1, dtype=np.int64), cap)
    prev = np.broadcast_to(prev, (P, n + 1)).copy()
    curr = np.empty_like(prev)
    for i in range(1, m + 1):
        curr[:] = cap
        if i <= k:
            curr[:, 0] = i
        jlo, jhi = max(1, i - k), min(n, i + k)
        for j in range(jlo, jhi + 1):
            cost = (a[:, i - 1] != b[:, j - 1]).astype(np.int64)
            v = np.minimum(
                np.minimum(prev[:, j] + 1, curr[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
            curr[:, j] = np.minimum(v, cap)
        prev, curr = curr, prev
    return prev[:, n].copy()


def levenshtein_pairs(left: np.ndarray, right: np.ndarray,
                      max_dist: int | None = None) -> np.ndarray:
    """Levenshtein distance per (left[i], right[i]) pair, vectorized.

    Pairs are bucketed by (len(left), len(right)); each bucket runs one
    shared-shape DP across all its pairs. With ``max_dist=k`` the banded
    kernel returns min(d, k+1) — exact for every d <= k, saturated above
    (the fuzzy-join contract: callers keep only d <= k).
    """
    left = np.asarray(left, dtype=object)
    right = np.asarray(right, dtype=object)
    la = np.fromiter((len(s) for s in left), np.int64, len(left))
    lb = np.fromiter((len(s) for s in right), np.int64, len(right))
    out = np.zeros(len(left), np.int64)
    # (len_a << 32) | len_b: alias-free for any string under 2^32 chars
    # (a plain la*K + lb combo would silently truncate strings >= K long)
    combo = (la << 32) | lb
    for c in np.unique(combo):
        sel = np.nonzero(combo == c)[0]
        m, n = int(c >> 32), int(c & 0xFFFFFFFF)
        if m == 0 or n == 0:
            d = max(m, n)
            out[sel] = d if max_dist is None else min(d, max_dist + 1)
            continue
        if max_dist is not None and abs(m - n) > max_dist:
            out[sel] = max_dist + 1  # length gap alone exceeds the bound
            continue
        a = _encode(left[sel], m)
        b = _encode(right[sel], n)
        if max_dist is None:
            out[sel] = _lev_block(a, b, m, n)
        else:
            out[sel] = _lev_block_bounded(a, b, m, n, max_dist)
    return out
