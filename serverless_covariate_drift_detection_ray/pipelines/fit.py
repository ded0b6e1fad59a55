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


def fit(manifest_dir: str, out_state_dir: str, cfg: EngineConfig | None = None,
        reference_kinds: tuple[str, ...] = ("reference",)) -> ReferenceState:
    cfg = cfg or EngineConfig()
    manifest = TableManifest.load(manifest_dir)
    ref_pids = {
        pid for pid, meta in manifest.partitions.items() if meta.get("kind") in reference_kinds
    }
    if not ref_pids:
        raise ValueError(f"no partitions of kind {reference_kinds} in manifest")
    skip = set(manifest.partition_ids()) - ref_pids
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
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
    # tree reduction: pre-merge per partition in tasks so the driver only
    # collects ONE state row per reference partition (bounded by partition
    # count), never one row per block — at 100 TB the block-level partials
    # would be GBs of sketch blobs
    def merge_group(batch: pa.Table) -> pa.Table:
        ps = merge_partials_table(batch, cfg)
        return pa.table({
            "partition_id": batch["partition_id"].slice(0, 1),
            "state": pa.array([ps.to_bytes()], pa.binary()),
            "n_rows": pa.array([ps.n_rows], pa.int64()),
        })

    per_part = partials.groupby("partition_id").map_groups(
        merge_group, batch_format="pyarrow")
    merged = merge_partials_table(pa.Table.from_pylist(per_part.take_all()), cfg)
    ref = ReferenceState.fit(
        merged,
        meta={"reference_partitions": sorted(ref_pids), "source": manifest_dir,
              "seed": cfg.seed},
    )
    ref.save(out_state_dir)
    return ref
