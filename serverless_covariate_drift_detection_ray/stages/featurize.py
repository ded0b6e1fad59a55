"""Single-pass featurize + schema-check + sketch-partial stage.

The one stage that touches the heavy ``bytes`` column. Per Arrow batch it
computes, vectorized:

  * schema/domain violations (non-null id/bytes, fmt domain, w/h > 0, caption
    non-null — the engine analogue of the reference's pydantic decode-validation
    at /root/reference/dimensionality_reduction_api/app/schemas/dr.py:15-30),
  * header-decoded dims vs the ``w``/``h`` columns (cheap header parse, no inflate),
  * sampled full decode → pixel-intensity marginal (catches brightness/contrast
    jitter drift, which phash is invariant to by design),
  * referential probe of ``image_id`` against a broadcast manifest (anti-join
    without a shuffle — SURVEY.md §2.5),
  * per-block ``PartialState`` sketch partials + a deterministic MMD embedding
    sample (smallest hash64(image_id) keys — invariant to block boundaries).

Output is a union-schema table of 'violation' and 'partial' rows — a few KB per
block — so the raw bytes never enter a shuffle (SURVEY.md §7 "wide binary rows").

Row-level sampling uses hash64(image_id, seed) thresholds, never block-local
randomness, so results are identical at any parallelism level and under resume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.codec import LOSSY_FMTS, decode_image, image_dims
from ..functions.hashing import hash64, probe_sorted
from ..functions.phash import phash64_batch, phash_gray_small, phash_hamming
from ..pipelines.config import EngineConfig
from ..state.partials import PartialState

_LEVELS = np.arange(256, dtype=np.float64)
_LEVELS_SQ = _LEVELS * _LEVELS

OUT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),          # 'violation' | 'partial'
        ("partition_id", pa.int32()),
        ("image_id", pa.string()),
        ("check", pa.string()),
        ("column", pa.string()),
        ("observed", pa.string()),
        ("expected", pa.string()),
        ("state", pa.binary()),
        ("n_rows", pa.int64()),
    ]
)


class FeaturizeAndSketch:
    """Callable-class stage: the broadcast manifest-id set is fetched once per
    worker (``ray.put`` → ``ray.get`` in ``__init__``), mirroring the
    reference's singleton-per-process model cache
    (/root/reference/detector_api/app/utils.py:4-14). Runs either as an actor
    pool (``cfg.featurize_concurrency`` set) or — the default — via the
    stateless ``featurize_task`` wrapper below, which keeps the same
    load-once-per-worker contract through a module cache."""

    def __init__(self, cfg: EngineConfig, manifest_broadcast: dict | None = None):
        self.cfg = cfg
        self.fmt_list = list(cfg.fmt_categories)
        self.fmt_index = {f: i for i, f in enumerate(cfg.fmt_categories)}
        self.dims_thresh = np.uint64(min(cfg.sample_threshold(cfg.dims_check_fraction), 2**64 - 1))
        self.decode_thresh = np.uint64(min(cfg.sample_threshold(cfg.decode_fraction), 2**64 - 1))
        self.manifest_hashes: np.ndarray | None = None
        if manifest_broadcast is not None:
            # The ObjectRef is wrapped in a dict so Ray does NOT resolve it at
            # actor creation (unwrapped ctor refs deadlock actor pools — ray
            # issue #53727); ray.get here runs once per actor = broadcast.
            import ray

            self.manifest_hashes = ray.get(manifest_broadcast["ref"])

    def _probe_manifest(self, id_hashes: np.ndarray) -> np.ndarray:
        """True where the id IS in the manifest. Sorted-array probe in-sandbox
        (probe_sorted handles the empty-universe case — every id is then an
        orphan); at 10^12-id scale swap in a Bloom filter (same broadcast
        shape)."""
        return probe_sorted(self.manifest_hashes, id_hashes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return OUT_SCHEMA.empty_table()

        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.float64)
        w_null = pc.is_null(batch["w"]).to_numpy(zero_copy_only=False)
        h_null = pc.is_null(batch["h"]).to_numpy(zero_copy_only=False)
        fmt = batch["fmt"].to_numpy(zero_copy_only=False)
        phash_null = pc.is_null(batch["phash"]).to_numpy(zero_copy_only=False)
        # fill_null BEFORE to_numpy: one null otherwise upcasts the whole
        # column to float64, which silently drops low bits of 64-bit hashes
        # (|phash| ≥ 2^53) — the filled zeros are mask-excluded everywhere
        phash = pc.fill_null(batch["phash"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        part_ids = batch["partition_id"].to_numpy(zero_copy_only=False)
        captions = batch["caption"].to_numpy(zero_copy_only=False)
        caption_null = pc.is_null(batch["caption"]).to_numpy(zero_copy_only=False)
        caption_len = np.where(
            caption_null, np.nan,
            pc.utf8_length(pc.fill_null(batch["caption"], "")).to_numpy(zero_copy_only=False),
        ).astype(np.float64)
        bytes_len = pc.binary_length(pc.fill_null(batch["bytes"], b"")).to_numpy(zero_copy_only=False)
        bytes_null = pc.is_null(batch["bytes"]).to_numpy(zero_copy_only=False)
        id_null = pc.is_null(batch["image_id"]).to_numpy(zero_copy_only=False)
        id_hash = hash64(np.where(id_null, "", ids).astype(object))

        v_id: list = []
        v_part: list = []
        v_check: list = []
        v_col: list = []
        v_obs: list = []
        v_exp: list = []

        def add_mask(mask: np.ndarray, check: str, column: str, observed, expected: str):
            for i in np.nonzero(mask)[0]:
                add_one(int(i), check, column,
                        observed(int(i)) if callable(observed) else observed, expected)

        def add_one(i: int, check: str, column: str, observed: str, expected: str):
            v_id.append(None if id_null[i] else str(ids[i]))
            v_part.append(int(part_ids[i]))
            v_check.append(check)
            v_col.append(column)
            v_obs.append(str(observed))
            v_exp.append(expected)

        # --- vectorized domain checks ---
        add_mask(id_null, "image_id_nonnull", "image_id", "null", "non-null")
        empty_bytes = bytes_null | (bytes_len == 0)
        add_mask(empty_bytes, "bytes_nonempty", "bytes", "empty", "len>0")
        fmt_known = np.isin(fmt, self.fmt_list)
        add_mask(~fmt_known, "fmt_in_domain", "fmt",
                 lambda i: str(fmt[i]), "|".join(cfg.fmt_categories))
        add_mask(w <= 0, "w_positive", "w", lambda i: str(int(w[i])), ">0")
        add_mask(h <= 0, "h_positive", "h", lambda i: str(int(h[i])), ">0")
        # null dims/phash get their own violations (a NaN passes `<= 0`
        # silently and int(NaN) crashes the dims comparison below)
        add_mask(w_null, "w_nonnull", "w", "null", "non-null")
        add_mask(h_null, "h_nonnull", "h", "null", "non-null")
        add_mask(phash_null, "phash_nonnull", "phash", "null", "non-null")
        add_mask(caption_null, "caption_nonnull", "caption", "null", "non-null")
        if self.manifest_hashes is not None:
            present = self._probe_manifest(id_hash)
            add_mask(~present & ~id_null, "referential_image_id", "image_id",
                     lambda i: str(ids[i]), "in manifest")

        # --- sampled per-image checks (codecs are inherently per-image) ---
        # ONE loop over the union of the dims- and decode-sampled rows so each
        # image's bytes materialize from Arrow exactly once (the two separate
        # loops paid two per-row binary copies when both fractions are 1.0)
        decodable = ~empty_bytes & fmt_known
        dims_mask = decodable & (id_hash < self.dims_thresh)
        decode_mask = decodable & (id_hash < self.decode_thresh)
        bytes_col = batch["bytes"]

        pm_part: list[int] = []
        pm_val: list[float] = []
        ps_val: list[float] = []
        ver_idx: list[int] = []
        ver_ph: list[int] = []
        for i in np.nonzero(dims_mask | decode_mask)[0]:
            i = int(i)
            f = str(fmt[i])
            data = bytes_col[i].as_py()
            if dims_mask[i]:
                try:
                    dw, dh, _ = image_dims(data, f)
                except Exception as exc:  # struct.error / zlib.error / ValueError
                    add_one(i, "decodable", "bytes", type(exc).__name__,
                            "decodable header")
                    continue
                # null w/h can't be compared (already flagged w/h_nonnull);
                # the header-decodability check above still ran for the row
                if not (w_null[i] or h_null[i]) and (
                        dw != int(w[i]) or dh != int(h[i])):
                    add_one(i, "dims_match_decoded", "w,h",
                            f"{dw}x{dh}", f"{int(w[i])}x{int(h[i])}")
            if not decode_mask[i]:
                continue
            try:
                img = decode_image(data, f)
            except Exception as exc:
                add_one(i, "decode_ok", "bytes", type(exc).__name__, "decodable")
                continue
            # intensity histogram instead of a float64 image copy: s1/s2 are
            # the same exact integers either way (hist @ levels sums integer
            # products < 2^53), so mean/std are bit-identical — without the
            # per-image ascontiguousarray(float64) allocation
            hist = np.bincount(img.reshape(-1), minlength=256).astype(np.float64)
            s1 = float(hist @ _LEVELS)
            s2 = float(hist @ _LEVELS_SQ)
            m = s1 / img.size
            pm_part.append(int(part_ids[i]))
            pm_val.append(m)
            ps_val.append(float(np.sqrt(max(s2 / img.size - m * m, 0.0))))
            if cfg.phash_verify and not phash_null[i]:
                ver_idx.append(i)
                ver_ph.append(phash_gray_small(img))
        if ver_idx:
            # per-row fidelity, batched: the phash column must match the
            # decoded pixels (BASELINE.json input_hint invariant); lossy
            # codecs get a small Hamming allowance for quantization. The
            # fixed-size DCT/median/packbits tail runs as ONE batched kernel
            # over the stacked (n, 32, 32) resize outputs.
            vi = np.asarray(ver_idx, dtype=np.int64)
            dist = phash_hamming(phash64_batch(np.stack(ver_ph)), phash[vi])
            tols = np.where(np.isin(fmt[vi], LOSSY_FMTS),
                            cfg.phash_tol_lossy, cfg.phash_tol_lossless)
            for k in np.nonzero(dist > tols)[0]:
                add_one(int(vi[k]), "phash_match_decoded", "phash",
                        f"hamming={int(dist[k])}", f"<={int(tols[k])}")
        pm_part_arr = np.asarray(pm_part, dtype=np.int64)
        pm_val_arr = np.asarray(pm_val, dtype=np.float64)
        ps_val_arr = np.asarray(ps_val, dtype=np.float64)

        # --- per-partition sketch partials ---
        partials: list[tuple[int, PartialState]] = []
        for pid in np.unique(part_ids):
            sel = part_ids == pid
            ps = PartialState(cfg.marginals, cfg.fmt_categories)
            ps.n_rows = int(sel.sum())
            ps.update_numeric("w", w[sel], n_null=int(w_null[sel].sum()))
            ps.update_numeric("h", h[sel], n_null=int(h_null[sel].sum()))
            ps.update_numeric("caption_len", caption_len[sel],
                              n_null=int(caption_null[sel].sum()))
            if pm_val_arr.size:
                in_pid = pm_part_arr == pid
                ps.update_numeric("pixel_mean", pm_val_arr[in_pid])
                ps.update_numeric("pixel_std", ps_val_arr[in_pid])
            else:
                ps.update_numeric("pixel_mean", np.empty(0))
                ps.update_numeric("pixel_std", np.empty(0))
            fidx = np.array(
                [self.fmt_index.get(f, len(cfg.fmt_categories)) for f in fmt[sel]],
                dtype=np.int64,
            )
            np.add.at(ps.fmt_counts, fidx, 1)
            ps.id_hll.update_hashes(id_hash[sel])
            selp = sel & ~phash_null  # null phash: no hash, no MMD sample
            ps.phash_hll.update(phash[selp])
            ps.caption_cms.update(np.where(caption_null[sel], "", captions[sel]).astype(object))
            keys = id_hash[selp]
            order = np.argsort(keys, kind="stable")[: cfg.mmd_sample_cap]
            ps.add_sample(keys[order], phash[selp][order], cfg.mmd_sample_cap)
            partials.append((int(pid), ps))

        # --- assemble union-schema output ---
        tables = []
        nv = len(v_id)
        if nv:
            tables.append(pa.table({
                "kind": pa.array(["violation"] * nv),
                "partition_id": pa.array(v_part, pa.int32()),
                "image_id": pa.array(v_id, pa.string()),
                "check": pa.array(v_check, pa.string()),
                "column": pa.array(v_col, pa.string()),
                "observed": pa.array(v_obs, pa.string()),
                "expected": pa.array(v_exp, pa.string()),
                "state": pa.array([None] * nv, pa.binary()),
                "n_rows": pa.array([0] * nv, pa.int64()),
            }, schema=OUT_SCHEMA))
        if partials:
            tables.append(pa.table({
                "kind": pa.array(["partial"] * len(partials)),
                "partition_id": pa.array([p for p, _ in partials], pa.int32()),
                "image_id": pa.array([None] * len(partials), pa.string()),
                "check": pa.array([None] * len(partials), pa.string()),
                "column": pa.array([None] * len(partials), pa.string()),
                "observed": pa.array([None] * len(partials), pa.string()),
                "expected": pa.array([None] * len(partials), pa.string()),
                "state": pa.array([ps.to_bytes() for _, ps in partials], pa.binary()),
                "n_rows": pa.array([ps.n_rows for _, ps in partials], pa.int64()),
            }, schema=OUT_SCHEMA))
        if not tables:
            return OUT_SCHEMA.empty_table()
        return pa.concat_tables(tables)


# ---------------------------------------------------------------------------
# Stateless-task wrapper (default execution mode; drift stage's warm-worker
# pattern). An actor pool must reserve a fixed CPU split against the read
# stage up front (and deadlocks if sized to every CPU); stateless tasks let
# Ray fuse the parquet read into the same task and share all CPUs between
# read and compute — measured on the 400k-row bench fixture at 32 CPUs:
# 7.1 s (24-actor pool, best split) vs 6.2 s (tasks). The broadcast id-set
# is still fetched once per WORKER process: warm workers are reused across
# tasks and the cache is keyed by (config fingerprint, broadcast ref id).
# ---------------------------------------------------------------------------

_WORKER_CACHE: dict = {}


def featurize_task(batch: pa.Table, cfg: EngineConfig,
                   manifest_broadcast: dict | None = None) -> pa.Table:
    from ..state.checkpoint import config_fingerprint

    key = (config_fingerprint(cfg),
           manifest_broadcast["ref"].hex() if manifest_broadcast else None)
    st = _WORKER_CACHE.get(key)
    if st is not None:
        # refresh recency so the 2-entry bound behaves as LRU: with 3+
        # interleaved pipelines sharing warm workers, insertion-order
        # eviction would let the two LIVE keys thrash each other
        _WORKER_CACHE.pop(key)
        _WORKER_CACHE[key] = st
    if st is None:
        st = FeaturizeAndSketch(cfg, manifest_broadcast)
        # bound the cache at TWO live broadcast copies per worker: every
        # validate() run ray.puts a fresh broadcast ref, so an unbounded
        # cache would leak one manifest-hash array per run — but a
        # single-entry bound (drift.py's) would make two INTERLEAVED
        # pipelines sharing warm workers evict each other every task
        # (load-once-per-worker degrading to load-once-per-batch). Two
        # entries covers the overlap case; oldest-insertion evicts beyond.
        while len(_WORKER_CACHE) >= 2:
            _WORKER_CACHE.pop(next(iter(_WORKER_CACHE)))
        _WORKER_CACHE[key] = st
    return st(batch)
