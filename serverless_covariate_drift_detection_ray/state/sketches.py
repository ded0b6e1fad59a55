"""Mergeable, serializable sketches for distributed column statistics.

Per-block partials are computed inside ``map_batches`` (stateless tasks), merged
per partition in a small groupby, then globally on the driver — the standard
partial-aggregation shape that avoids shuffling raw rows (SURVEY.md §2.7, item 5).

All sketches satisfy:
  - ``update(np.ndarray)``  — vectorized accumulation
  - ``merge(other)``        — commutative + associative (order-invariance is unit-tested)
  - ``to_bytes()`` / ``from_bytes()`` — compact serialization for Arrow ``binary`` columns

Sketch choices follow the quantile-sketch literature in PAPERS.md (merging
t-digest for quantiles, fixed-bin histograms for KS/drift marginals).
"""

from __future__ import annotations

import io
import struct

import numpy as np

from ..functions.hashing import hash64, hash_family


def _pack_arrays(tag: bytes, *arrays: np.ndarray) -> bytes:
    buf = io.BytesIO()
    buf.write(tag)
    buf.write(struct.pack("<I", len(arrays)))
    for a in arrays:
        a = np.ascontiguousarray(a)
        dt = a.dtype.str.encode()
        buf.write(struct.pack("<B", len(dt)))
        buf.write(dt)
        buf.write(struct.pack("<Q", a.nbytes))
        buf.write(a.tobytes())
    return buf.getvalue()


def _unpack_arrays(data: bytes, tag: bytes) -> list[np.ndarray]:
    buf = io.BytesIO(data)
    got = buf.read(len(tag))
    if got != tag:
        raise ValueError(f"bad sketch tag {got!r}, expected {tag!r}")
    (n,) = struct.unpack("<I", buf.read(4))
    out = []
    for _ in range(n):
        (dl,) = struct.unpack("<B", buf.read(1))
        dt = np.dtype(buf.read(dl).decode())
        (nb,) = struct.unpack("<Q", buf.read(8))
        out.append(np.frombuffer(buf.read(nb), dtype=dt))
    return out


class TDigest:
    """Merging t-digest (Dunning's MergingDigest, size bound 4·n·q(1-q)/δ).

    Approximate quantiles with relative accuracy concentrated at the tails;
    centroids stay sorted, compression is a single merge pass.
    """

    TAG = b"TD1"

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._buf.append(v)
        self._buf_n += v.size
        if self._buf_n > 8192:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        self._buf.append(other.means.copy())
        # weighted points: fold other's centroids in as weighted samples
        self._compress(extra_weights=other.weights.copy())
        return self

    @classmethod
    def merge_many(cls, digests: list["TDigest"]) -> "TDigest":
        """Merge N digests with ONE sort+compress pass instead of N pairwise
        compressions — the per-partition partial-merge hot path."""
        if not digests:
            return cls()
        out = cls(delta=digests[0].delta)
        means, weights = [], []
        for d in digests:
            d._compress()
            means.append(d.means)
            weights.append(d.weights)
        out.means = np.concatenate(means) if means else out.means
        out.weights = np.concatenate(weights) if weights else out.weights
        if out.means.size:
            order = np.argsort(out.means, kind="stable")
            out.means = out.means[order]
            out.weights = out.weights[order]
            out._buf.append(np.empty(0))
            out._compress(extra_weights=np.empty(0))
        return out

    def _compress(self, extra_weights: np.ndarray | None = None) -> None:
        if not self._buf and extra_weights is None:
            return
        means = [self.means]
        weights = [self.weights]
        if self._buf:
            tail = self._buf if extra_weights is None else self._buf[:-1]
            if tail:
                cat = np.concatenate(tail)
                means.append(cat)
                weights.append(np.ones(cat.size))
            if extra_weights is not None:
                means.append(self._buf[-1])
                weights.append(extra_weights)
        m = np.concatenate(means)
        w = np.concatenate(weights)
        self._buf, self._buf_n = [], 0
        if m.size == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # k1 scale-function clustering, fully vectorized: each sorted point
        # gets the cluster index floor(k(q_mid)) with k(q) = δ/(2π)·asin(2q−1),
        # and points sharing an index merge into one weighted centroid. The
        # asin scale packs clusters tightly at the tails (extreme points stay
        # singletons — the t-digest accuracy property) and bounds interior
        # cluster weight by the same O(total·q(1−q)/δ) envelope the greedy
        # loop enforced, at numpy speed instead of a per-centroid Python loop
        # (the loop dominated the per-partition merge stage driver-side).
        q = (np.cumsum(w) - w / 2.0) / total
        k = (self.delta / np.pi) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))
        idx = np.floor(k).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
        sums_w = np.add.reduceat(w, starts)
        self.means = np.add.reduceat(m * w, starts) / sums_w
        self.weights = sums_w

    @property
    def count(self) -> float:
        self._compress()
        return float(self.weights.sum())

    def quantile(self, q) -> np.ndarray:
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        cum /= self.weights.sum()
        return np.interp(qs, cum, self.means)

    def to_bytes(self) -> bytes:
        self._compress()
        return _pack_arrays(
            self.TAG, np.asarray([self.delta], dtype=np.int64), self.means, self.weights
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        delta, means, weights = _unpack_arrays(data, cls.TAG)
        td = cls(delta=int(delta[0]))
        td.means, td.weights = means.copy(), weights.copy()
        return td


class HyperLogLog:
    """Dense HLL, p=12 (4096 registers, ~1.6% standard error), uint8 registers."""

    TAG = b"HL1"

    def __init__(self, p: int = 12):
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        # rho = #leading zeros in the (64-p)-bit suffix + 1
        nbits = 64 - self.p
        wl = w.astype(np.float64)
        with np.errstate(divide="ignore"):
            msb = np.floor(np.log2(np.maximum(wl, 1.0))).astype(np.int64)
        rho = np.where(w == 0, nbits + 1, nbits - msb).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def update(self, values) -> None:
        self.update_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64)).sum()
        e = alpha * m * m / inv
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return _pack_arrays(self.TAG, np.asarray([self.p], dtype=np.int64), self.registers)

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        p, regs = _unpack_arrays(data, cls.TAG)
        h = cls(p=int(p[0]))
        h.registers = regs.astype(np.uint8).copy()
        return h


class CountMinSketch:
    """Count-Min sketch (depth × width uint64 counters) for heavy hitters."""

    TAG = b"CM1"

    def __init__(self, depth: int = 4, width: int = 1024, seed: int = 7):
        self.depth, self.width, self.seed = int(depth), int(width), int(seed)
        self.table = np.zeros((self.depth, self.width), dtype=np.uint64)
        self.total = 0

    def _cols(self, values) -> np.ndarray:
        base = hash64(values)
        fam = hash_family(base, self.depth, seed=self.seed)
        return (fam % np.uint64(self.width)).astype(np.int64)

    def update(self, values, counts: np.ndarray | None = None) -> None:
        values = np.asarray(values)
        if values.size == 0:
            return
        cols = self._cols(values)
        c = np.ones(values.size, dtype=np.uint64) if counts is None else counts.astype(np.uint64)
        for d in range(self.depth):
            np.add.at(self.table[d], cols[d], c)
        self.total += int(c.sum())

    def query(self, values) -> np.ndarray:
        values = np.asarray(values)
        cols = self._cols(values)
        est = self.table[0][cols[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][cols[d]])
        return est.astype(np.int64)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        self.total += other.total
        return self

    def to_bytes(self) -> bytes:
        return _pack_arrays(
            self.TAG,
            np.asarray([self.depth, self.width, self.seed, self.total], dtype=np.int64),
            self.table.ravel(),
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        meta, table = _unpack_arrays(data, cls.TAG)
        cms = cls(depth=int(meta[0]), width=int(meta[1]), seed=int(meta[2]))
        cms.total = int(meta[3])
        cms.table = table.reshape(cms.depth, cms.width).astype(np.uint64).copy()
        return cms


class FixedHistogram:
    """Fixed-bin histogram over [lo, hi] with underflow/overflow bins.

    The drift marginal state: reference ECDF for the KS test is derived from
    these counts (SURVEY.md §2.3 A7).
    """

    # FH2: v == hi counts in the LAST bin (closed [lo, hi] as documented);
    # FH1 blobs put it in overflow — the tag bump makes any state fit under
    # the old binning fail loudly at load instead of silently mixing CDFs
    TAG = b"FH2"

    def __init__(self, lo: float, hi: float, bins: int = 256):
        self.lo, self.hi, self.bins = float(lo), float(hi), int(bins)
        self.edges = np.linspace(self.lo, self.hi, self.bins + 1)
        self.counts = np.zeros(self.bins + 2, dtype=np.int64)  # [under, bins..., over]

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        idx = np.searchsorted(self.edges, v, side="right")  # 0 = under, bins+1 = over
        idx[v == self.hi] = self.bins  # hi inclusive: [lo, hi] is closed
        np.add.at(self.counts, idx, 1)

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        self.counts += other.counts
        return self

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def cdf(self) -> np.ndarray:
        """ECDF evaluated at the bin edges (len bins+1)."""
        n = max(self.total, 1)
        return np.cumsum(self.counts)[:-1] / n

    def to_bytes(self) -> bytes:
        return _pack_arrays(
            self.TAG, np.asarray([self.lo, self.hi], dtype=np.float64),
            np.asarray([self.bins], dtype=np.int64), self.counts,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "FixedHistogram":
        lohi, bins, counts = _unpack_arrays(data, cls.TAG)
        h = cls(lohi[0], lohi[1], bins=int(bins[0]))
        h.counts = counts.astype(np.int64).copy()
        return h


def ks_from_histograms(ref: FixedHistogram, test: FixedHistogram) -> float:
    """KS D statistic between two histograms sharing identical edges."""
    if ref.bins != test.bins or ref.lo != test.lo or ref.hi != test.hi:
        raise ValueError("histograms must share edges")
    fr = np.cumsum(ref.counts) / max(ref.total, 1)
    ft = np.cumsum(test.counts) / max(test.total, 1)
    return float(np.abs(fr - ft).max())
