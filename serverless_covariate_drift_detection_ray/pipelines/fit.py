"""Fit job: freeze the reference window state (SURVEY.md §3.1 → engine mapping).

``read(reference partitions) → map_batches(FeaturizeAndSketch) →
groupby-merge partials → median-heuristic σ → save reference_state/``.

The reference analogue: encode the detector split and ``detector.fit(X_ref)``
(/root/reference/ml/training.py:423-460).
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.fragmented import TableManifest, read_images
from ..stages.featurize import FeaturizeAndSketch
from ..state.partials import PartialState
from ..state.reference import ReferenceState
from .config import EngineConfig


def merge_partials_table(batch: pa.Table, cfg: EngineConfig) -> PartialState:
    states = [PartialState.from_bytes(blob.as_py()) for blob in batch["state"]]
    if not states:
        return PartialState(cfg.marginals, cfg.fmt_categories)
    return PartialState.merge_many(states, cfg.ref_sample_cap)


def _merged_partition_state(manifest: TableManifest, pids: set[int],
                            cfg: EngineConfig) -> PartialState:
    """Featurize+sketch the given partitions and return ONE merged state.

    Tree reduction: pre-merge per partition in tasks so the driver only
    collects ONE state row per partition (bounded by partition count),
    never one row per block — at 100 TB the block-level partials would be
    GBs of sketch blobs."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    skip = set(manifest.partition_ids()) - pids
    ds = read_images(manifest, skip_partitions=skip)
    reduced = ds.map_batches(
        FeaturizeAndSketch,
        fn_constructor_args=(cfg, None),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
        concurrency=cfg.featurize_concurrency or max(2, ncpu - 2),
    )
    partials = reduced.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "partial")).select(
            ["partition_id", "state", "n_rows"]
        ),
        batch_format="pyarrow",
    )

    def merge_group(batch: pa.Table) -> pa.Table:
        ps = merge_partials_table(batch, cfg)
        return pa.table({
            "partition_id": batch["partition_id"].slice(0, 1),
            "state": pa.array([ps.to_bytes()], pa.binary()),
            "n_rows": pa.array([ps.n_rows], pa.int64()),
        })

    per_part = partials.groupby("partition_id").map_groups(
        merge_group, batch_format="pyarrow")
    return merge_partials_table(pa.Table.from_pylist(per_part.take_all()), cfg)


def fit(manifest_dir: str, out_state_dir: str, cfg: EngineConfig | None = None,
        reference_kinds: tuple[str, ...] = ("reference",)) -> ReferenceState:
    cfg = cfg or EngineConfig()
    manifest = TableManifest.load(manifest_dir)
    ref_pids = {
        pid for pid, meta in manifest.partitions.items() if meta.get("kind") in reference_kinds
    }
    if not ref_pids:
        raise ValueError(f"no partitions of kind {reference_kinds} in manifest")
    merged = _merged_partition_state(manifest, ref_pids, cfg)
    ref = ReferenceState.fit(
        merged,
        meta={"reference_partitions": sorted(ref_pids), "source": manifest_dir,
              "seed": cfg.seed},
    )
    ref.save(out_state_dir)
    return ref


def extend_reference(manifest_dir: str, state_dir: str,
                     partition_ids: list[int],
                     cfg: EngineConfig | None = None) -> ReferenceState:
    """Grow the frozen reference window in place: featurize ONLY the new
    partitions, merge their sketch state into the existing reference state
    (every accumulator is mergeable by construction), and re-derive the
    median-heuristic σ from the merged deterministic sample — the
    operational refit loop (the reference repo refits its detector on a new
    window; here the window EXTENDS without re-reading old partitions).
    Merge associativity: extend(fit(A), B) equals fit(A ∪ B) exactly for
    every count/histogram/HLL/CMS/sample accumulator and σ; t-digest
    centroids and running float sums are merge-tree-dependent at the
    epsilon/ulp level (pinned precisely in tests)."""
    cfg = cfg or EngineConfig()
    manifest = TableManifest.load(manifest_dir)
    existing = ReferenceState.load(state_dir)
    # sketch-shape guard: merging states fit under DIFFERENT marginal specs
    # or fmt domains would positionally add misaligned histogram bins with
    # no error anywhere downstream
    if existing.state.marginal_spec != {
            k: tuple(v) for k, v in cfg.marginals.items()}:
        raise ValueError(
            "config marginals do not match the fitted reference state "
            f"({existing.state.marginal_spec} vs {cfg.marginals})")
    if tuple(existing.state.fmt_categories) != tuple(cfg.fmt_categories):
        raise ValueError(
            "config fmt_categories do not match the fitted reference state")
    already = set(existing.meta.get("reference_partitions", []))
    new_pids = set(int(p) for p in partition_ids)
    overlap = new_pids & already
    if overlap:
        raise ValueError(f"partitions already in the reference window: "
                         f"{sorted(overlap)}")
    missing = new_pids - set(manifest.partition_ids())
    if missing:
        raise ValueError(f"unknown partitions: {sorted(missing)}")
    new_state = _merged_partition_state(manifest, new_pids, cfg)
    both = pa.table({
        "partition_id": pa.array([0, 1], pa.int32()),
        "state": pa.array([existing.state.to_bytes(), new_state.to_bytes()],
                          pa.binary()),
        "n_rows": pa.array([existing.state.n_rows, new_state.n_rows],
                           pa.int64()),
    })
    merged = merge_partials_table(both, cfg)
    ref = ReferenceState.fit(
        merged,
        meta={"reference_partitions": sorted(already | new_pids),
              "source": manifest_dir, "seed": cfg.seed},
    )
    ref.save(state_dir)
    return ref
