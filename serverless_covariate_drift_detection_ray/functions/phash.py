"""Perceptual hashing: 64-bit DCT average hash + phash→embedding featurizer.

The phash embedding replaces the reference's autoencoder latent vectors
(/root/reference/ml/utils/autoencoder.py:235-245) as the MMD drift feature
(BASELINE.json north_star: "MMD over phash-derived embeddings"). Unpacking
``phash:int64`` into a 64-dim ±1 float32 vector is pure bit-twiddling and
stateless, so it runs as a vectorized ``map_batches`` expression.
"""

from __future__ import annotations

import numpy as np

_DCT_N = 32


def _dct_matrix(n: int = _DCT_N) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


_BIN_CACHE: dict = {}


def _bin_starts(n_in: int, n_out: int, channels: int = 1):
    """Cached reduceat bin-start indices + per-bin widths + empty-bin mask.

    Starts are scaled by ``channels`` so one reduceat over the row-major
    flattened (col, channel) axis folds the channel sum into the column
    binning. Image dims repeat heavily across a corpus, so the cache stays
    tiny and hot (per-call np.arange setup dominated the old formulation)."""
    key = (n_in, n_out, channels)
    hit = _BIN_CACHE.get(key)
    if hit is None:
        edges = (np.arange(n_out + 1) * n_in // n_out).astype(np.int64)
        widths = edges[1:] - edges[:-1]
        empty = widths == 0
        hit = (edges[:-1] * channels, np.maximum(widths, 0),
               empty if empty.any() else None)
        _BIN_CACHE[key] = hit
    return hit


def _resize_sums(img2d: np.ndarray, out_h: int, out_w: int, channels: int = 1):
    """Bin sums + (hgt, wid) for an area resize of a 2-D view.

    Two ``np.add.reduceat`` passes, COLUMNS FIRST: the axis-1 pass walks the
    C-contiguous uint8 rows (cache-friendly, ~3x faster than axis-0 first)
    and shrinks the width to ``out_w`` before the row pass touches float64.
    uint8 accumulates straight into float64 (``dtype=``) — no full-image
    float copy — and bin sums of uint8 pixels are exact integers in float64
    in any summation order, so results are bit-identical to the cumsum-diff
    definition. Empty bins (out dim > in dim) get the reduceat
    repeated-index artifact zeroed explicitly (after both passes: the
    artifact only ever lives in a fully-zeroed row/column)."""
    ys, hgt, hempty = _bin_starts(img2d.shape[0], out_h)
    xs, wid, wempty = _bin_starts(img2d.shape[1] // channels, out_w, channels)
    cols = np.add.reduceat(img2d, xs, axis=1, dtype=np.float64)
    s = np.add.reduceat(cols, ys, axis=0)
    if hempty is not None:
        s[hempty, :] = 0.0
    if wempty is not None:
        s[:, wempty] = 0.0
    return s, hgt, wid


def _resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize via bin means (deterministic, no interpolation lib).
    Exact: integer bin sums in float64, one final division."""
    s, hgt, wid = _resize_sums(img, out_h, out_w)
    return s / np.maximum(hgt[:, None] * wid[None, :], 1)


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash of a uint8 image (grayscale or RGB).

    Deterministic in every step (channel+area sums are exact integers in
    float64 with ONE final division; median of 63 values == partition[31];
    MSB-first shift-accumulate == packbits) — required because stored phash
    columns are verified against recomputation at Hamming tolerance 0, so
    generator and verifier must share ONE formulation: this delegates to
    ``phash64_batch`` (the verifier's kernel), making the bit-identity hold
    by construction rather than empirically (the batched kernel groups the
    DCT product as D8 @ (S @ D8ᵀ), a different float summation grouping
    than the former (D @ S) @ Dᵀ here)."""
    return int(phash64_batch(phash_gray_small(img)[None, :, :])[0])


def phash_gray_small(img: np.ndarray) -> np.ndarray:
    """Per-image half of phash64: channel-mean + area resize to (32, 32).
    Split out so the fixed-size tail (DCT/median/packbits) can run batched.

    RGB folds the channel sum into the column reduceat (one pass over the
    row-major flattened (col, channel) axis instead of a strided axis-2
    reduce + resize); the division by bin_area*channels happens once at the
    end, so every intermediate is an exact integer in float64."""
    if img.ndim == 3:
        h, w, c = img.shape
        s, hgt, wid = _resize_sums(img.reshape(h, w * c), _DCT_N, _DCT_N, c)
        return s / np.maximum(hgt[:, None] * wid[None, :] * c, 1)
    return _resize_area(img, _DCT_N, _DCT_N)


_DCT8 = None  # first 8 DCT rows, contiguous — built lazily next to _DCT


def phash64_batch(smalls: np.ndarray) -> np.ndarray:
    """(n, 32, 32) stacked ``phash_gray_small`` outputs -> (n,) int64 hashes.

    Only the top-left 8x8 DCT block is ever consulted (flat = [:8,:8], the
    median set is rows 1..7 of that same block), so both multiplies use just
    the first 8 DCT rows: two LARGE dgemms over (n*32, 32) @ (32, 8) shapes
    instead of 2n stacked (32,32) dgemms — 8x fewer flops and ~4x less
    fresh-allocation traffic (first-touch page faults dominate this host,
    see _popcount64_inplace). NOTE the float grouping differs from a naive
    (D @ S) @ Dᵀ (the 1024-term bilinear form sums l-first here vs k-first
    there), so agreement with that formulation is empirical (exact on this
    BLAS over the 400k-image fixture + random images). The engine's
    Hamming-0 invariant does NOT depend on it: ``phash64`` (the generator's
    hash) delegates here, so generator and verifier share this exact
    kernel by construction."""
    global _DCT8
    n = smalls.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if _DCT8 is None:
        _DCT8 = np.ascontiguousarray(_DCT[:8])
    t = (smalls.reshape(n * 32, 32) @ _DCT8.T).reshape(n, 32, 8)  # S @ D8^T
    t2 = np.ascontiguousarray(t.transpose(0, 2, 1)).reshape(n * 8, 32)
    c8t = (t2 @ _DCT8.T).reshape(n, 8, 8)  # per slice: (D8 @ S @ D8^T)^T
    flat = np.ascontiguousarray(c8t.transpose(0, 2, 1)).reshape(n, 64)
    # median set = flat[1:8] ++ coeffs[1:8, :8].ravel() == flat[8:64]
    sel = np.concatenate([flat[:, 1:8], flat[:, 8:]], axis=1)
    med = np.partition(sel, 31, axis=1)[:, 31]
    packed = np.packbits(flat > med[:, None], axis=1)  # (n, 8) MSB-first
    return np.ascontiguousarray(packed).view(">u8").ravel().astype(np.uint64).view(np.int64)


def phash_to_embedding(phash: np.ndarray) -> np.ndarray:
    """(n,) int64 phash column → (n, 64) float32 ±1 matrix, L2-normalized.

    Vectorized: unpack bits via right-shifts against a broadcast bit index.
    """
    h = np.asarray(phash, dtype=np.int64).view(np.uint64)
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.float32)
    emb = bits * 2.0 - 1.0
    return emb / np.float32(8.0)  # ||±1 vector of dim 64|| = 8


_POP_CHUNK = 1 << 18


def _popcount64_inplace(x: np.ndarray) -> np.ndarray:
    """SWAR popcount written INTO ``x`` (uint64, owned by caller), chunked so
    the single scratch buffer stays page-warm. First-touch page faults on
    this host cost ~1 s per 35 MB — far more than the arithmetic — so every
    fresh allocation matters; the classic expression-form SWAR (7 temporaries)
    is ~5x slower than this."""
    flat = x.reshape(-1)
    t = np.empty(min(_POP_CHUNK, flat.size), np.uint64)
    m1, m2 = np.uint64(0x5555555555555555), np.uint64(0x3333333333333333)
    m4, mul = np.uint64(0x0F0F0F0F0F0F0F0F), np.uint64(0x0101010101010101)
    for i in range(0, flat.size, _POP_CHUNK):
        c = flat[i:i + _POP_CHUNK]
        tt = t[:c.size]
        np.right_shift(c, np.uint64(1), out=tt)
        tt &= m1
        c -= tt
        np.right_shift(c, np.uint64(2), out=tt)
        tt &= m2
        c &= m2
        c += tt
        np.right_shift(c, np.uint64(4), out=tt)
        c += tt
        c &= m4
        c *= mul
        c >>= np.uint64(56)
    return x.view(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    return _popcount64_inplace(np.array(x, dtype=np.uint64, copy=True))


def hamming_leq_pairs(vals: np.ndarray, a: np.ndarray, b: np.ndarray,
                      hmax: int) -> np.ndarray:
    """``popcount(vals[a] ^ vals[b]) <= hmax`` over index pairs, chunked with
    reused scratch buffers — one page-warm pass instead of five fresh 8-B/pair
    temporaries (gather x2, xor, SWAR, compare)."""
    v = np.asarray(vals, dtype=np.int64).view(np.uint64)
    out = np.empty(a.size, dtype=bool)
    ch = 1 << 19
    sa = np.empty(min(ch, a.size), np.uint64)
    sb = np.empty(min(ch, a.size), np.uint64)
    for i in range(0, a.size, ch):
        n = min(ch, a.size - i)
        np.take(v, a[i:i + n], out=sa[:n])
        np.take(v, b[i:i + n], out=sb[:n])
        sa[:n] ^= sb[:n]
        np.less_equal(_popcount64_inplace(sa[:n]).view(np.uint64),
                      np.uint64(hmax), out=out[i:i + n])
    return out


def phash_hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return popcount64(
        np.asarray(a, dtype=np.int64).view(np.uint64)
        ^ np.asarray(b, dtype=np.int64).view(np.uint64)
    )


BAND_WIDTHS = (21, 21, 22)  # 3 bands cover Hamming ≤ 2 by pigeonhole


def phash_bands(phash: np.ndarray, n_bands: int = 3) -> np.ndarray:
    """(n, n_bands) int64 band keys: 21/21/22-bit slices of the 64-bit phash.

    Near-dup banding: two hashes within Hamming distance d < n_bands share at
    least one band (pigeonhole) — the LSH grouping key for the near-duplicate
    constraint (SURVEY.md §2.7 item 4). Wide bands keep bucket occupancy
    sub-linear in table size (16-bit bands saturate by ~10^5 rows; 21-bit by
    ~10^6 — at 10^12 scale, widen to 32-bit bands (Hamming ≤ 1) plus a
    second-pass recursive split, same shape).
    """
    if n_bands != len(BAND_WIDTHS):
        raise ValueError("n_bands fixed by BAND_WIDTHS")
    h = np.asarray(phash, dtype=np.int64).view(np.uint64)
    cols = []
    shift = 0
    for b, width in enumerate(BAND_WIDTHS):
        mask = np.uint64((1 << width) - 1)
        cols.append(
            (((h >> np.uint64(shift)) & mask).astype(np.int64)
             | (np.int64(b) << np.int64(58)))
        )
        shift += width
    return np.stack(cols, axis=1)
