"""Per-block partial aggregation state: the unit that flows instead of raw rows.

A ``PartialState`` holds everything one block contributes to its partition's
statistics: marginal histograms, numeric moments, sketches, fmt counts, and a
deterministic row-level embedding sample. Partials are commutative-mergeable,
so per-partition (and global) state is independent of task order and block
boundaries — the property the repartition-invariance test pins (SURVEY.md §5).

Serialization is a self-describing binary envelope (JSON header + named numpy
blobs) — no pickle, safe to persist in the checkpoint store (SURVEY.md §2.1 S5).
"""

from __future__ import annotations

import io
import json
import struct

import numpy as np

from .sketches import CountMinSketch, FixedHistogram, HyperLogLog, TDigest

_MAGIC = b"PSTATE1\x00"


class NumericStats:
    """Exact streaming count/null/min/max/sum/sumsq (mergeable)."""

    def __init__(self):
        self.count = 0
        self.nulls = 0
        self.minv = np.inf
        self.maxv = -np.inf
        self.sum = 0.0
        self.sumsq = 0.0

    def update(self, values: np.ndarray, n_null: int = 0) -> None:
        self.nulls += int(n_null)
        v = values[~np.isnan(values)] if values.dtype.kind == "f" else values
        if v.size == 0:
            return
        self.count += int(v.size)
        self.minv = min(self.minv, float(v.min()))
        self.maxv = max(self.maxv, float(v.max()))
        self.sum += float(v.sum())
        self.sumsq += float((v.astype(np.float64) ** 2).sum())

    def merge(self, other: "NumericStats") -> "NumericStats":
        self.count += other.count
        self.nulls += other.nulls
        self.minv = min(self.minv, other.minv)
        self.maxv = max(self.maxv, other.maxv)
        self.sum += other.sum
        self.sumsq += other.sumsq
        return self

    @property
    def mean(self) -> float:
        return self.sum / self.count if self.count else float("nan")

    @property
    def std(self) -> float:
        if self.count < 2:
            return float("nan")
        var = max(self.sumsq / self.count - self.mean**2, 0.0)
        return float(np.sqrt(var))

    def to_arrays(self) -> dict[str, np.ndarray]:
        return {
            "cn": np.array([self.count, self.nulls], dtype=np.int64),
            "mm": np.array([self.minv, self.maxv, self.sum, self.sumsq], dtype=np.float64),
        }

    @classmethod
    def from_arrays(cls, cn: np.ndarray, mm: np.ndarray) -> "NumericStats":
        s = cls()
        s.count, s.nulls = int(cn[0]), int(cn[1])
        s.minv, s.maxv, s.sum, s.sumsq = (float(x) for x in mm)
        return s


class PartialState:
    def __init__(self, marginals: dict[str, tuple[float, float, int]],
                 fmt_categories: tuple[str, ...]):
        self.marginal_spec = dict(marginals)
        self.fmt_categories = tuple(fmt_categories)
        self.n_rows = 0
        self.hists = {c: FixedHistogram(lo, hi, bins) for c, (lo, hi, bins) in marginals.items()}
        self.stats = {c: NumericStats() for c in marginals}
        self.digests = {c: TDigest() for c in marginals}
        self.fmt_counts = np.zeros(len(fmt_categories) + 1, dtype=np.int64)  # +1 = out-of-domain
        self.id_hll = HyperLogLog()
        self.phash_hll = HyperLogLog()
        self.caption_cms = CountMinSketch()
        # deterministic MMD sample: rows with the smallest hash64(image_id);
        # stored as raw phash int64 (8 B/row) — the 64-dim embedding is
        # re-derived where needed (phash_to_embedding), keeping partials small
        self.sample_keys = np.empty(0, dtype=np.uint64)
        self.sample_phash = np.empty(0, dtype=np.int64)

    def update_numeric(self, column: str, values: np.ndarray, n_null: int = 0) -> None:
        self.hists[column].update(values)
        self.stats[column].update(values, n_null)
        self.digests[column].update(values)

    def add_sample(self, keys: np.ndarray, phash: np.ndarray, cap: int) -> None:
        self.sample_keys = np.concatenate([self.sample_keys, keys.astype(np.uint64)])
        self.sample_phash = np.concatenate([self.sample_phash, phash.astype(np.int64)])
        self._trim_sample(cap)

    def _trim_sample(self, cap: int) -> None:
        # ALWAYS key-sorted, not just when trimming: the MMD permutation test
        # depends on pooled row order, so the sample must have one canonical
        # order regardless of block boundaries (repartition-invariance).
        order = np.argsort(self.sample_keys, kind="stable")[:cap]
        self.sample_keys = self.sample_keys[order]
        self.sample_phash = self.sample_phash[order]

    @classmethod
    def merge_many(cls, states: list["PartialState"], sample_cap: int) -> "PartialState":
        """Bulk merge: vectorized array sums + one t-digest compress per
        marginal instead of N pairwise merges (the groupby hot path)."""
        if not states:
            raise ValueError("nothing to merge")
        first = states[0]
        out = cls(first.marginal_spec, first.fmt_categories)
        out.n_rows = sum(s.n_rows for s in states)
        for c in out.hists:
            out.hists[c].counts = np.sum([s.hists[c].counts for s in states], axis=0)
            ns = NumericStats()
            for s in states:
                ns.merge(s.stats[c])
            out.stats[c] = ns
            out.digests[c] = TDigest.merge_many([s.digests[c] for s in states])
        out.fmt_counts = np.sum([s.fmt_counts for s in states], axis=0)
        out.id_hll.registers = np.maximum.reduce([s.id_hll.registers for s in states])
        out.phash_hll.registers = np.maximum.reduce([s.phash_hll.registers for s in states])
        out.caption_cms.table = np.sum([s.caption_cms.table for s in states], axis=0,
                                       dtype=np.uint64)
        out.caption_cms.total = sum(s.caption_cms.total for s in states)
        out.sample_keys = np.concatenate([s.sample_keys for s in states])
        out.sample_phash = np.concatenate([s.sample_phash for s in states])
        out._trim_sample(sample_cap)
        return out

    def merge(self, other: "PartialState", sample_cap: int) -> "PartialState":
        self.n_rows += other.n_rows
        for c in self.hists:
            self.hists[c].merge(other.hists[c])
            self.stats[c].merge(other.stats[c])
            self.digests[c].merge(other.digests[c])
        self.fmt_counts += other.fmt_counts
        self.id_hll.merge(other.id_hll)
        self.phash_hll.merge(other.phash_hll)
        self.caption_cms.merge(other.caption_cms)
        self.add_sample(other.sample_keys, other.sample_phash, sample_cap)
        return self

    # -- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        blobs: dict[str, bytes] = {}
        arrays: dict[str, np.ndarray] = {
            "fmt_counts": self.fmt_counts,
            "sample_keys": self.sample_keys,
            "sample_phash": self.sample_phash,
        }
        for c in self.hists:
            blobs[f"hist:{c}"] = self.hists[c].to_bytes()
            blobs[f"td:{c}"] = self.digests[c].to_bytes()
            for k, v in self.stats[c].to_arrays().items():
                arrays[f"ns:{c}:{k}"] = v
        blobs["id_hll"] = self.id_hll.to_bytes()
        blobs["phash_hll"] = self.phash_hll.to_bytes()
        blobs["caption_cms"] = self.caption_cms.to_bytes()

        header = {
            "n_rows": self.n_rows,
            "marginals": {c: list(v) for c, v in self.marginal_spec.items()},
            "fmt_categories": list(self.fmt_categories),
            "arrays": {k: [v.dtype.str, len(v.tobytes())] for k, v in arrays.items()},
            "blobs": {k: len(v) for k, v in blobs.items()},
        }
        hj = json.dumps(header).encode()
        out = io.BytesIO()
        out.write(_MAGIC)
        out.write(struct.pack("<I", len(hj)))
        out.write(hj)
        for k in header["arrays"]:
            out.write(arrays[k].tobytes())
        for k in header["blobs"]:
            out.write(blobs[k])
        return out.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "PartialState":
        buf = io.BytesIO(data)
        if buf.read(len(_MAGIC)) != _MAGIC:
            raise ValueError("bad partial state blob")
        (hl,) = struct.unpack("<I", buf.read(4))
        header = json.loads(buf.read(hl))
        marginals = {c: tuple(v) for c, v in header["marginals"].items()}
        ps = cls(marginals, tuple(header["fmt_categories"]))
        ps.n_rows = int(header["n_rows"])
        arrays = {}
        for k, (dt, nb) in header["arrays"].items():
            arrays[k] = np.frombuffer(buf.read(nb), dtype=np.dtype(dt))
        ps.fmt_counts = arrays["fmt_counts"].astype(np.int64).copy()
        ps.sample_keys = arrays["sample_keys"].astype(np.uint64).copy()
        ps.sample_phash = arrays["sample_phash"].astype(np.int64).copy()
        blobs = {k: buf.read(nb) for k, nb in header["blobs"].items()}
        for c in marginals:
            ps.hists[c] = FixedHistogram.from_bytes(blobs[f"hist:{c}"])
            ps.digests[c] = TDigest.from_bytes(blobs[f"td:{c}"])
            ps.stats[c] = NumericStats.from_arrays(arrays[f"ns:{c}:cn"], arrays[f"ns:{c}:mm"])
        ps.id_hll = HyperLogLog.from_bytes(blobs["id_hll"])
        ps.phash_hll = HyperLogLog.from_bytes(blobs["phash_hll"])
        ps.caption_cms = CountMinSketch.from_bytes(blobs["caption_cms"])
        return ps
