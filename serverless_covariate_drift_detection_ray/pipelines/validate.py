"""The main validation DAG (SURVEY.md §3.2):

    read(images) [fragment-partitioned, finished partitions filtered out]
      → map_batches(FeaturizeAndSketch)          [actor pool; bytes never shuffle]
      → split: violations | per-block partials
      → groupby(partition_id) merge partials     [shuffle #1 — tiny: sketch rows]
      → map_batches(DriftTestActor)              [actor pool holding ref state]
      ‖ pruned re-read → uniqueness groupby      [shuffle #2 — id/count rows]
      ‖ pruned re-read → phash band groupby      [shuffle #3 — band rows]
      → per-partition commit (verdicts + violations + column_stats + lineage)

Verdict/violation/stat volumes are orders of magnitude below the input, so the
final assembly collects them driver-side and writes resumable per-partition
parquet through ``CheckpointStore``; at 10^12-row scale the same tables stream
through ``write_parquet(partition_cols=...)`` instead — the layout is identical.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.fragmented import TableManifest, read_images
from ..stages.constraints import VIOLATION_SCHEMA, check_neardup, check_uniqueness
from ..stages.drift import (TS_FORMAT, VERDICT_SCHEMA, DriftTestActor,  # noqa: F401
                            drift_verdicts_batch)
from ..stages.featurize import FeaturizeAndSketch
from ..state.checkpoint import CheckpointStore, config_fingerprint
from ..state.partials import PartialState
from .config import EngineConfig
from .fit import merge_partials_table

CONSTRAINT_CHECKS = ("unique_image_id", "neardup_phash")


def _warm_fsspec_http() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem``
    deterministic before dataset executions run on two driver threads.

    In this sandbox aiohttp is absent, so the import fails — Ray's
    path-resolution catches only ModuleNotFoundError, and a second thread
    racing the failing import sees a half-initialized module and gets a plain
    ImportError instead (uncaught). Installing a complete stub module (the
    class is only ever used in isinstance checks against non-HTTP
    filesystems) removes the race."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # stub: aiohttp absent in-sandbox
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod

# partial-state rows above which the per-partition merge runs as a distributed
# groupby instead of on the driver (~100 KB per partial row)
DRIVER_MERGE_MAX_PARTIALS = 20_000


def _merged_state_row(pid: int, merged) -> "pa.Table":
    """THE (partition_id, state, n_rows) single-row schema the drift stage
    consumes — one definition shared by the driver-stripe, distributed-
    groupby, and streamed merge branches so the shape can't silently fork."""
    return pa.table({
        "partition_id": pa.array([int(pid)], pa.int32()),
        "state": pa.array([merged.to_bytes()], pa.binary()),
        "n_rows": pa.array([merged.n_rows], pa.int64()),
    })

# reduced-stream rows (partials + domain violations) the driver will collect;
# beyond this the split/merge runs distributed (a pathological partition where
# every row violates must not ride through the driver)
REDUCED_DRIVER_MAX = 500_000

# total violation rows assembled driver-side; beyond this, violations are
# sorted and written per partition by a distributed groupby writer
VIOLATIONS_DRIVER_MAX = 1_000_000


def _violations_driver_max() -> int:
    """Effective driver-fold gate, env-overridable PER CALL (same contract
    as config.scratch_root — honored without re-importing): bench forces
    the streamed writer with SCDD_VIOLATIONS_DRIVER_MAX=0 to measure its
    cost; tests monkeypatch the module constant, which stays the
    fallback."""
    v = os.environ.get("SCDD_VIOLATIONS_DRIVER_MAX")
    return int(v) if v is not None else VIOLATIONS_DRIVER_MAX

COLUMN_STATS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("column", pa.string()),
        ("count", pa.int64()),
        ("null_count", pa.int64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("mean", pa.float64()),
        ("std", pa.float64()),
        ("p50", pa.float64()),
        ("p95", pa.float64()),
        ("distinct_est", pa.float64()),
    ]
)


def _column_stats_rows(pid: int, ps: PartialState) -> list[dict]:
    rows = []
    for col, st in ps.stats.items():
        q = ps.digests[col].quantile([0.5, 0.95])
        rows.append({
            "partition_id": pid, "column": col, "count": st.count,
            "null_count": st.nulls,
            "min": st.minv if st.count else float("nan"),
            "max": st.maxv if st.count else float("nan"),
            "mean": st.mean, "std": st.std,
            "p50": float(q[0]), "p95": float(q[1]),
            "distinct_est": float("nan"),
        })
    rows.append({
        "partition_id": pid, "column": "image_id", "count": ps.n_rows, "null_count": 0,
        "min": float("nan"), "max": float("nan"), "mean": float("nan"),
        "std": float("nan"), "p50": float("nan"), "p95": float("nan"),
        "distinct_est": ps.id_hll.estimate(),
    })
    rows.append({
        "partition_id": pid, "column": "phash", "count": ps.n_rows, "null_count": 0,
        "min": float("nan"), "max": float("nan"), "mean": float("nan"),
        "std": float("nan"), "p50": float("nan"), "p95": float("nan"),
        "distinct_est": ps.phash_hll.estimate(),
    })
    return rows


def _swap_quarantine_partitions(qroot: str, qtmp: str, todo) -> None:
    """Per-partition atomic swap: a partial/resume run must replace ONLY the
    partitions it just validated, never clobber the rest; partitions in
    ``todo`` with no freshly-written dir have their stale dirs cleared."""
    import shutil

    os.makedirs(qroot, exist_ok=True)
    written = {d for d in os.listdir(qtmp) if d.startswith("partition_id=")}
    for pid in todo:
        name = f"partition_id={pid}"
        dst = os.path.join(qroot, name)
        stale = dst + ".old"
        shutil.rmtree(stale, ignore_errors=True)
        if os.path.exists(dst):
            os.rename(dst, stale)
        if name in written:
            os.rename(os.path.join(qtmp, name), dst)
        shutil.rmtree(stale, ignore_errors=True)
    shutil.rmtree(qtmp, ignore_errors=True)


def _quarantine_streamed(manifest: TableManifest, out_dir: str, todo) -> int:
    """Follow-up dead-letter job for the streamed-violations path: the
    violating ids were never assembled driver-side, so each partition's
    quarantine is built FROM ITS OWN written violations.parquet by a remote
    task — read the partition's violating ids, zone-map-prune its fragments,
    re-read only those that can match, filter, write. The one global piece
    of state is the DUPLICATED-KEY id set (check == unique_image_id): a
    duplicate violation is recorded once at its min-partition locus, so the
    other partitions' copies can only be found with a cross-partition id
    set. Those ids are collected by a first wave of tiny per-partition
    tasks (ids only, bounded by the quarantine row gate that admitted us
    here) and broadcast via ray.put; everything else stays per-partition.
    Same hive layout + per-partition atomic swap as the driver path, so a
    repair job can't tell which path ran."""
    import shutil

    import ray

    viol_root = os.path.join(out_dir, "violations")
    qroot = os.path.join(out_dir, "quarantine")
    qtmp = f"{qroot}.tmp.{os.getpid()}"
    shutil.rmtree(qtmp, ignore_errors=True)
    os.makedirs(qtmp, exist_ok=True)

    frags_of: dict[int, list[tuple[str, tuple | None]]] = {}
    for f in manifest.fragments:
        frags_of.setdefault(f.partition_id, []).append(
            (os.path.join(manifest.root, f.file), (f.stats or {}).get("image_id")))

    def _vfile(pid: int) -> str:
        return os.path.join(viol_root, f"partition_id={pid}",
                            "violations.parquet")

    @ray.remote
    def dup_ids_of(pid: int) -> np.ndarray:
        vfile = _vfile(pid)
        if not os.path.exists(vfile):
            return np.empty(0, dtype=object)
        t = pq.read_table(vfile, columns=["image_id", "check"])
        t = t.filter(pc.equal(t["check"], "unique_image_id"))
        return (t["image_id"].drop_null()
                .to_numpy(zero_copy_only=False).astype(object))

    dup_parts = ray.get([dup_ids_of.remote(pid) for pid in todo])
    dup_ids = np.unique(np.concatenate([p for p in dup_parts if p.size])
                        ) if any(p.size for p in dup_parts) else \
        np.empty(0, dtype=object)
    dup_ref = ray.put(dup_ids)

    @ray.remote
    def quarantine_partition(pid: int) -> int:
        vfile = _vfile(pid)
        own = np.empty(0, dtype=object)
        if os.path.exists(vfile):
            # null ids (image_id_nonnull violations) can't be re-identified
            # by key — drop before the object-dtype sort-based unique
            own = (pq.read_table(vfile, columns=["image_id"])["image_id"]
                   .drop_null().to_numpy(zero_copy_only=False).astype(object))
        bad = np.unique(np.concatenate([own, ray.get(dup_ref)]))
        if not bad.size:
            return 0
        sorted_bad = np.sort(bad)
        parts = []
        for path, st in frags_of.get(pid, []):
            if st is not None:  # zone-map prune
                lo_i = int(np.searchsorted(sorted_bad, st[0], side="left"))
                if not (lo_i < sorted_bad.size and sorted_bad[lo_i] <= st[1]):
                    continue
            elif not own.size:
                # stats-less legacy fragment with no local violations:
                # mirror the driver path's flagged-partition fallback scope
                continue
            t = pq.read_table(path)
            m = np.isin(t["image_id"].to_numpy(zero_copy_only=False), bad)
            if m.any():
                parts.append(t.filter(pa.array(m)))
        if not parts:
            return 0
        out = pa.concat_tables(parts)
        if "partition_id" in out.column_names:  # hive layout drops the key col
            out = out.drop_columns(["partition_id"])
        d = os.path.join(qtmp, f"partition_id={pid}")
        os.makedirs(d, exist_ok=True)
        from ..state.atomic import atomic_publish

        atomic_publish(os.path.join(d, "quarantine.parquet"),
                       lambda tmp: pq.write_table(out, tmp))
        return out.num_rows

    counts = ray.get([quarantine_partition.remote(pid) for pid in todo])
    _swap_quarantine_partitions(qroot, qtmp, todo)
    return int(sum(counts))


def validate(
    manifest_dir: str,
    ref_state_dir: str,
    out_dir: str,
    cfg: EngineConfig | None = None,
    resume: bool = True,
) -> dict:
    """Run the full validation pass; returns a summary dict."""
    import ray

    cfg = cfg or EngineConfig()
    t0 = time.time()
    manifest = TableManifest.load(manifest_dir)
    store = CheckpointStore(out_dir)
    cfg_hash = config_fingerprint(cfg)
    finished = store.finished_partitions(cfg_hash) if resume else set()
    todo = [p for p in manifest.partition_ids() if p not in finished]
    summary = {
        "partitions_total": len(manifest.partition_ids()),
        "partitions_skipped": len(finished),
        "partitions_processed": len(todo),
        "rows_processed": 0,
    }
    if not todo:
        if cfg.quarantine:
            # sink options are excluded from the resume fingerprint, so a
            # fully-resumed run produces NO dead-letter output — say so
            # instead of silently returning an empty/absent quarantine dir
            summary["quarantine_skipped"] = (
                "all partitions resumed; rerun with resume=False to "
                "produce quarantine output")
        summary["wall_s"] = time.time() - t0
        return summary
    rows_todo = sum(f.rows for f in manifest.fragments if f.partition_id not in finished)
    summary["rows_processed"] = rows_todo

    # broadcast the referential universe once (SURVEY.md §2.5)
    broadcast = None
    manifest_ids_path = os.path.join(manifest_dir, "truth", "manifest_ids.parquet")
    if os.path.exists(manifest_ids_path):
        from ..functions.hashing import hash64

        ids = pq.read_table(manifest_ids_path)["image_id"].to_numpy(zero_copy_only=False)
        # hash + sort once on the driver; ship the sorted uint64 probe array
        broadcast = {"ref": ray.put(np.sort(hash64(ids.astype(object))))}

    # ---- constraint pipelines kick off CONCURRENTLY with featurize ----
    # the pruned id/phash re-read + the driver-side near-dup candidate pass
    # are independent of the featurize output, so a helper thread builds and
    # (partially) executes them while the bytes-heavy pass owns the CPUs —
    # their fixed driver cost would otherwise serialize after featurize and
    # cap scaling efficiency at high parallelism
    from concurrent.futures import ThreadPoolExecutor

    _warm_fsspec_http()

    stage_t = {}
    constraint_t = {}

    def build_constraints():
        # bg_* times are thread-side wall — they OVERLAP the featurize stage
        # and are excluded from the main-thread residual accounting
        t = time.time()
        ids_ds = read_images(
            manifest, columns=["image_id", "phash", "partition_id"]
        ).materialize()
        constraint_t["bg_ids_read"] = time.time() - t
        # setup only: the screens' driver-side collects and numpy passes are
        # free to overlap featurize (they use no cluster CPU); the final
        # shuffle datasets execute later — overlapping them would just
        # time-slice a featurize stage that already saturates every core
        t = time.time()
        uniq = check_uniqueness(ids_ds)
        constraint_t["bg_uniq_setup"] = time.time() - t
        t = time.time()
        neardup = check_neardup(ids_ds, cfg)
        constraint_t["bg_neardup_setup"] = time.time() - t
        return uniq, neardup

    pool = ThreadPoolExecutor(max_workers=1)
    constraints_fut = pool.submit(build_constraints)

    # ---- pass 1: bytes-heavy featurize + sketch partials ----
    # Default: STATELESS tasks (featurize_task, warm-worker module cache).
    # Ray fuses the parquet read into the same task and shares every CPU
    # between read and compute; an actor pool must reserve a fixed CPU split
    # up front (and deadlocks the read stage if sized to every CPU) —
    # measured at 400k rows / 32 CPUs: 6.2 s tasks vs 7.1 s best-split
    # (24-actor) pool. cfg.featurize_concurrency forces the explicit actor
    # pool (load-once-per-actor escape hatch; same output, parity-tested).
    ds = read_images(manifest, skip_partitions=finished)
    t1 = time.time()
    if cfg.featurize_concurrency:
        reduced = ds.map_batches(
            FeaturizeAndSketch,
            fn_constructor_args=(cfg, broadcast),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
            concurrency=cfg.featurize_concurrency,
        ).materialize()  # tiny: per-block partial rows + violation rows only
    else:
        from functools import partial as _fpartial

        from ..stages.featurize import featurize_task

        reduced = ds.map_batches(
            _fpartial(featurize_task, cfg=cfg, manifest_broadcast=broadcast),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
        ).materialize()  # tiny: per-block partial rows + violation rows only
    stage_t["featurize"] = time.time() - t1

    # the reduced stream is a few KB per input block — collect it once on the
    # driver and split locally (violations | partials) while it provably fits
    # (REDUCED_DRIVER_MAX). Beyond that — e.g. a pathological partition where
    # every row violates — the split and the per-partition merge both run
    # distributed (same semantics: merge_many is commutative), keeping the
    # driver out of the data path.
    import ray.data

    t1 = time.time()

    def merge_group(batch: pa.Table) -> pa.Table:
        pid = int(batch["partition_id"][0].as_py())
        merged = merge_partials_table(batch, cfg)
        return _merged_state_row(pid, merged)

    VIOL_COLS = ["partition_id", "image_id", "check", "column", "observed", "expected"]
    n_reduced = reduced.count()
    partials_tbl = None
    if n_reduced <= REDUCED_DRIVER_MAX:
        reduced_tbl = pa.concat_tables(
            list(reduced.iter_batches(batch_size=1 << 16, batch_format="pyarrow"))
        )
        domain_viol_ds = ray.data.from_arrow(
            reduced_tbl.filter(pc.equal(reduced_tbl["kind"], "violation"))
            .select(VIOL_COLS).cast(VIOLATION_SCHEMA)
        )
        partials_tbl = reduced_tbl.filter(pc.equal(reduced_tbl["kind"], "partial")).select(
            ["partition_id", "state", "n_rows"]
        )
    else:
        def keep(kind: str, cols: list[str]):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.filter(pc.equal(batch["kind"], kind)).select(cols)
            return fn

        domain_viol_ds = reduced.map_batches(
            keep("violation", VIOL_COLS), batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(lambda t: t.cast(VIOLATION_SCHEMA), batch_format="pyarrow")
        partials_src = reduced.map_batches(
            keep("partial", ["partition_id", "state", "n_rows"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    stage_t["split"] = time.time() - t1

    # ---- join the concurrently-built constraint pipelines, and launch
    # their union/materialize IMMEDIATELY so the constraint shuffles run
    # while the driver merges sketch partials and the drift pool starts ----
    t1 = time.time()
    try:
        uniq_viol, neardup_viol = constraints_fut.result()
    except Exception:
        # thread-side failure (e.g. a racy lazy import): rebuild sequentially
        uniq_viol, neardup_viol = build_constraints()
    pool.shutdown(wait=False)
    stage_t["constraints_join"] = time.time() - t1  # ~0 when hidden by featurize

    def conform(t: pa.Table) -> pa.Table:
        return pa.table({f.name: t[f.name].cast(f.type) for f in VIOLATION_SCHEMA},
                        schema=VIOLATION_SCHEMA)

    def exec_constraints():
        v = domain_viol_ds.union(
            uniq_viol.map_batches(conform, batch_format="pyarrow"),
            neardup_viol.map_batches(conform, batch_format="pyarrow"),
        ).materialize()
        return v, v.count()

    cpool = ThreadPoolExecutor(max_workers=1)
    viol_fut = cpool.submit(exec_constraints)

    # ---- merge sketch partials per partition (driver when tiny, else a
    # distributed groupby — same commutative merge) ----
    t1 = time.time()
    fused_verdicts: "pa.Table | None" = None  # set by the fused stripe path
    if partials_tbl is not None:
        if partials_tbl.num_rows <= DRIVER_MERGE_MAX_PARTIALS:
            # the sketch merge is GIL-bound Python (driver threads measured
            # 1.5s serial vs 3.1s under an 8-thread pool), so parallelism
            # must be PROCESS-level: stripe the partitions over a handful of
            # remote tasks (inputs are KB-scale partial blobs, outputs one
            # row per partition). Stripes, not per-partition tasks — the
            # per-task submit/result overhead would eat the win at 1 task
            # per partition. The DRIFT pass is fused into each stripe: the
            # stripe's merged rows feed the same stateless
            # drift_verdicts_batch kernel (warm-worker module cache) the
            # dataset path uses, as soon as THIS stripe's merge finishes —
            # no all-stripe barrier before drift starts.
            import ray as _ray

            pids_present = np.unique(partials_tbl["partition_id"].to_numpy())
            n_stripes = max(1, min(8, pids_present.size))

            @_ray.remote
            def merge_stripe(tbl: pa.Table, pids: list, cfg_,
                             ref_dir_: str) -> tuple:
                # same single-row tables merge_group builds — one schema
                # definition (_merged_state_row) serves all three branches
                out = []
                for pid in pids:
                    sub = tbl.filter(pc.equal(tbl["partition_id"], int(pid)))
                    out.append(_merged_state_row(
                        int(pid), merge_partials_table(sub, cfg_)))
                vt = drift_verdicts_batch(
                    pa.concat_tables(out), cfg=cfg_, ref_state_dir=ref_dir_)
                return out, vt

            tbl_ref = _ray.put(partials_tbl)
            stripes = [pids_present[i::n_stripes].tolist()
                       for i in range(n_stripes)]
            chunks = _ray.get([merge_stripe.remote(tbl_ref, s, cfg,
                                                   ref_state_dir)
                               for s in stripes])
            tables = [t for chunk, _ in chunks for t in chunk]
            tables.sort(key=lambda t: int(t["partition_id"][0].as_py()))
            vts = [vt for _, vt in chunks if vt.num_rows]
            fused_verdicts = (pa.concat_tables(vts) if vts
                              else VERDICT_SCHEMA.empty_table())
            # one single-row block per partition for downstream consumers
            per_part = ray.data.from_arrow(tables)
        else:
            per_part = ray.data.from_arrow(partials_tbl).groupby("partition_id").map_groups(
                merge_group, batch_format="pyarrow"
            ).materialize()
    else:
        per_part = partials_src.groupby("partition_id").map_groups(
            merge_group, batch_format="pyarrow"
        ).materialize()
    stage_t["merge_partials"] = time.time() - t1

    # ---- drift verdicts vs frozen reference: stateless tasks over the
    # WARM featurize worker processes, with the reference window loaded
    # once per worker via the module cache in stages.drift (the reference's
    # SingletonMeta contract) — fresh actor spawns cost more than this whole
    # stage. Verdicts are tiny (per partition × check) and always collect
    # driver-side; the constraint union is already executing on the helper
    # thread, so drift and the constraint shuffles run CONCURRENTLY ----
    from functools import partial as _partial

    t1 = time.time()
    if fused_verdicts is not None:
        # driver-stripe path already computed drift inside the merge tasks
        # (per-stripe, pipelined); only schema conformance remains here
        verdicts = fused_verdicts.cast(VERDICT_SCHEMA)
    else:
        verdicts_ds = per_part.map_batches(
            _partial(drift_verdicts_batch, cfg=cfg, ref_state_dir=ref_state_dir),
            batch_format="pyarrow",
            batch_size=None,
        )
        verdicts = pa.Table.from_pylist(verdicts_ds.take_all(),
                                        schema=VERDICT_SCHEMA)
    stage_t["drift"] = time.time() - t1

    t1 = time.time()
    viol_ds, n_viol = viol_fut.result()
    cpool.shutdown(wait=False)
    stage_t["constraints"] = time.time() - t1  # residual beyond the drift overlap

    ts = cfg.freeze_time or time.strftime("%d/%m/%Y %H:%M:%S.000000", time.gmtime())
    assert TS_FORMAT  # format documented in stages.drift

    violations = None  # driver-side table when small, None when streamed
    if n_viol <= _violations_driver_max():
        violations = pa.concat_tables(
            list(viol_ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"))
        ) if n_viol else VIOLATION_SCHEMA.empty_table()
        # byte-stable ordering (SURVEY.md §7 "hard parts")
        violations = violations.sort_by(
            [("partition_id", "ascending"), ("check", "ascending"), ("image_id", "ascending")]
        )
        vp = violations["partition_id"].to_numpy(zero_copy_only=False)
        vc = violations["check"].to_numpy(zero_copy_only=False)
        viol_counts = {}
        for pid in todo:
            sel = vp == pid
            viol_counts[pid] = {
                "total": int(sel.sum()),
                **{c: int((sel & (vc == c)).sum()) for c in CONSTRAINT_CHECKS},
                "domain": int((sel & ~np.isin(vc, CONSTRAINT_CHECKS)).sum()),
            }
    else:
        # distributed per-partition writer: each group sorts its rows by
        # (check, image_id) and writes violations.parquet atomically into the
        # store layout BEFORE any lineage marker lands; returns counts only
        viol_root = os.path.join(out_dir, "violations")

        def write_group(batch: pa.Table) -> pa.Table:
            pid = int(batch["partition_id"][0].as_py())
            t = batch.sort_by([("check", "ascending"), ("image_id", "ascending")])
            d = os.path.join(viol_root, f"partition_id={pid}")
            os.makedirs(d, exist_ok=True)
            from ..state.atomic import atomic_publish

            atomic_publish(os.path.join(d, "violations.parquet"),
                           lambda tmp: pq.write_table(t, tmp,
                                                      compression="zstd"))
            checks = t["check"].to_numpy(zero_copy_only=False)
            names = list(CONSTRAINT_CHECKS)
            counts = [int((checks == c).sum()) for c in names]
            return pa.table({
                "partition_id": pa.array([pid] * (len(names) + 1), pa.int32()),
                "check": pa.array(names + ["__domain__"]),
                "n": pa.array(counts + [int(len(checks) - sum(counts))], pa.int64()),
            })

        cdf = viol_ds.groupby("partition_id").map_groups(
            write_group, batch_format="pyarrow").to_pandas()
        viol_counts = {pid: {"total": 0, "domain": 0,
                             **{c: 0 for c in CONSTRAINT_CHECKS}} for pid in todo}
        for _, r in cdf.iterrows():
            d = viol_counts.setdefault(int(r.partition_id), {
                "total": 0, "domain": 0, **{c: 0 for c in CONSTRAINT_CHECKS}})
            key = "domain" if r.check == "__domain__" else r.check
            d[key] += int(r.n)
            d["total"] += int(r.n)
        # partitions with ZERO violations this run never enter write_group,
        # so a violations.parquet left by a PRIOR run (different config, or
        # resume=False rerun) would otherwise be committed as this run's
        # output with violation_count=0 — remove it before commit_one's
        # exists() check so read_all/quarantine can't serve stale rows
        for pid in todo:
            if viol_counts.get(pid, {}).get("total", 0) == 0:
                stale = os.path.join(viol_root, f"partition_id={pid}",
                                     "violations.parquet")
                if os.path.exists(stale):
                    os.remove(stale)

    # constraint verdict rows (per partition × constraint check)
    c_rows = []
    for pid in todo:
        cnts = viol_counts.get(pid, {"total": 0, "domain": 0,
                                     **{c: 0 for c in CONSTRAINT_CHECKS}})
        for check in CONSTRAINT_CHECKS:
            n_bad = cnts[check]
            c_rows.append({
                "partition_id": pid, "check": check, "column": "image_id" if "unique" in check else "phash",
                "statistic": float(n_bad), "p_value": float("nan"), "alpha": cfg.alpha,
                "passed": n_bad == 0, "n_ref": 0, "n_test": 0, "datetime": ts,
            })
        c_rows.append({
            "partition_id": pid, "check": "schema_domain", "column": "*",
            "statistic": float(cnts["domain"]), "p_value": float("nan"), "alpha": cfg.alpha,
            "passed": cnts["domain"] == 0, "n_ref": 0, "n_test": 0, "datetime": ts,
        })
    verdicts = pa.concat_tables(
        [verdicts, pa.Table.from_pylist(c_rows, schema=VERDICT_SCHEMA)]
    ).sort_by([("partition_id", "ascending"), ("check", "ascending"), ("column", "ascending")])

    # ---- quarantine (dead-letter) sink: violating rows' FULL payloads ----
    # a pruned re-read of only the violating partitions' fragments, filtered
    # to the violating ids (broadcast once), written per-partition so a
    # repair job can re-ingest exactly what failed. Row payloads never ride
    # through the validation shuffles — this is the only stage that touches
    # them again, and it reads just the affected fragments.
    summary["quarantined"] = 0
    if cfg.quarantine and violations is not None:
        tq = time.time()
        # null ids (image_id_nonnull violations) can't be re-identified by
        # key — drop them before the (object-dtype, sort-based) unique
        bad_ids = np.unique(
            violations["image_id"].drop_null()
            .to_numpy(zero_copy_only=False).astype(object))
        bad_pids = {int(p) for p in
                    violations["partition_id"].to_numpy(zero_copy_only=False)}
        if bad_ids.size <= cfg.quarantine_max_rows:
            import shutil

            bad_ref = {"ref": ray.put(bad_ids)}

            def qfilter(batch: pa.Table) -> pa.Table:
                bad = ray.get(bad_ref["ref"])
                m = np.isin(
                    batch["image_id"].to_numpy(zero_copy_only=False), bad)
                return batch.filter(pa.array(m))

            # fragment pruning: a fragment is re-read only if its
            # image_id zone map can contain a violating id (sorted-probe
            # intersection). The probe runs over ALL partitions, not just
            # the flagged ones, so every copy of a cross-partition
            # duplicated key is quarantined — a unique_image_id violation
            # is recorded once at its min-partition locus, but the other
            # partitions' copies match here by id. Stats-less legacy
            # fragments (no zone map) fall back to the flagged-partition
            # scope.
            sorted_bad = np.sort(bad_ids)
            todo_set = set(todo)  # resumed partitions keep no dead letters

            def frag_may_match(f) -> bool:
                if f.partition_id not in todo_set:
                    return False
                st = (f.stats or {}).get("image_id")
                if st is None:
                    return f.partition_id in bad_pids
                lo_i = int(np.searchsorted(sorted_bad, st[0], side="left"))
                return lo_i < sorted_bad.size and sorted_bad[lo_i] <= st[1]

            frag_paths = [os.path.join(manifest.root, f.file)
                          for f in manifest.fragments if frag_may_match(f)]
            import ray.data as ray_data  # noqa: F401 (used below)

            qroot = os.path.join(out_dir, "quarantine")
            qtmp = f"{qroot}.tmp.{os.getpid()}"
            shutil.rmtree(qtmp, ignore_errors=True)
            nq = 0
            if frag_paths:
                ray_data.read_parquet(frag_paths).map_batches(
                    qfilter, batch_format="pyarrow").write_parquet(
                    qtmp, partition_cols=["partition_id"])
                for dirpath, _, files in os.walk(qtmp):
                    for f in files:
                        if f.endswith(".parquet"):
                            nq += pq.ParquetFile(
                                os.path.join(dirpath, f)).metadata.num_rows
            else:  # clean run: nothing to write, but stale dirs still clear
                os.makedirs(qtmp, exist_ok=True)
            _swap_quarantine_partitions(qroot, qtmp, todo)
            summary["quarantined"] = nq
        else:
            summary["quarantine_skipped"] = "violations exceed quarantine_max_rows"
            import shutil

            qroot = os.path.join(out_dir, "quarantine")
            for pid in todo:  # stale dead-letter rows would mislead repair
                shutil.rmtree(os.path.join(qroot, f"partition_id={pid}"),
                              ignore_errors=True)
        stage_t["quarantine"] = time.time() - tq
    elif cfg.quarantine and violations is None:
        # streamed-violations path: ids were never assembled driver-side —
        # build the dead-letter sink FROM the written per-partition violation
        # files (same zone-map-pruned re-read, one remote task per partition).
        # The gate is the total violation ROW count (known without a collect;
        # an upper bound on the driver path's unique-id count, so it can only
        # skip more conservatively).
        tq = time.time()
        if n_viol <= cfg.quarantine_max_rows:
            summary["quarantined"] = _quarantine_streamed(
                manifest, out_dir, todo)
        else:
            summary["quarantine_skipped"] = (
                "violations exceed quarantine_max_rows")
            import shutil

            qroot = os.path.join(out_dir, "quarantine")
            for pid in todo:  # stale dead-letter rows would mislead repair
                shutil.rmtree(os.path.join(qroot, f"partition_id={pid}"),
                              ignore_errors=True)
        stage_t["quarantine"] = time.time() - tq

    # ---- per-partition commit with lineage (I/O-bound → thread pool) ----
    from concurrent.futures import ThreadPoolExecutor

    states = {int(r["partition_id"]): r["state"] for r in per_part.take_all()}
    wall = time.time() - t0

    def commit_one(pid: int) -> None:
        ps = PartialState.from_bytes(states[pid]) if pid in states else None
        col_stats = pa.Table.from_pylist(
            _column_stats_rows(pid, ps) if ps else [], schema=COLUMN_STATS_SCHEMA
        )
        vmask = pc.equal(verdicts["partition_id"], pid)
        if violations is not None:
            violm = violations.filter(pc.equal(violations["partition_id"], pid))
            vcount = violm.num_rows
        else:
            # streamed path: the distributed writer already landed this
            # partition's file (if it had any violations); empty otherwise
            fpath = os.path.join(out_dir, "violations",
                                 f"partition_id={pid}", "violations.parquet")
            if os.path.exists(fpath):
                violm = None
                vcount = viol_counts.get(pid, {}).get("total", 0)
            else:
                violm = VIOLATION_SCHEMA.empty_table()
                vcount = 0
        store.commit_partition(
            partition_id=pid,
            fragment_ids=manifest.fragments_of(pid),
            verdicts=verdicts.filter(vmask),
            violations=violm,
            column_stats=col_stats,
            stats_blob=states.get(pid, b""),
            wall_s=wall / max(len(todo), 1),
            violation_count=vcount,
            config_hash=cfg_hash,
        )

    t1 = time.time()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(commit_one, todo))
    stage_t["commit_io"] = time.time() - t1

    stage_t["commit"] = time.time() - t0 - sum(stage_t.values())
    stage_t.update(constraint_t)  # overlapped thread-side walls, reported only
    summary["stages"] = {k: round(v, 2) for k, v in stage_t.items()}
    summary.update({
        "wall_s": wall,
        "rows_per_s": rows_todo / wall if wall > 0 else float("nan"),
        "verdicts": verdicts.num_rows,
        "violations": n_viol,
        "violations_streamed": violations is None,
        "drift_flagged": int(
            pc.sum(
                pc.and_(pc.invert(verdicts["passed"]),
                        pc.is_in(verdicts["check"], value_set=pa.array(["ks", "chi2", "mmd"])))
            ).as_py() or 0
        ),
    })
    return summary
