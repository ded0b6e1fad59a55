"""Per-partition drift testing: the stateful actor-pool stage.

``DriftTestActor`` is the engine's analogue of the reference's Drift Detection
Service: one frozen detector state per worker process, independent two-sample
tests per window (/root/reference/detector_api/app/detector.py:16-70). Each
input row is one partition's merged ``PartialState``; each output row is a
verdict matching the reference's verdict record shape
(alpha / distance / p_value / is_drift / datetime,
/root/reference/detector_api/app/detector.py:62-70).

Determinism: the permutation RNG is seeded by (run seed ^ partition_id) only —
never task order — so verdicts are identical under resume and at any
parallelism level (SURVEY.md §4).
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

from ..functions.phash import phash_to_embedding
from ..functions.stats import chi2_test_counts, ks_pvalue_from_d, mmd_permutation_test
from ..pipelines.config import EngineConfig
from ..state.partials import PartialState
from ..state.reference import ReferenceState
from ..state.sketches import ks_from_histograms

VERDICT_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("check", pa.string()),
        ("column", pa.string()),
        ("statistic", pa.float64()),
        ("p_value", pa.float64()),
        ("alpha", pa.float64()),
        ("passed", pa.bool_()),
        ("n_ref", pa.int64()),
        ("n_test", pa.int64()),
        ("datetime", pa.string()),
    ]
)

# reference timestamp format: /root/reference/detector_api/app/detector.py:64-66
TS_FORMAT = "%d/%m/%Y %H:%M:%S.%f"


class DriftTestActor:
    """Actor pool stage: ``__init__`` loads the frozen reference state once per
    worker (the load-once-per-process singleton pattern,
    /root/reference/detector_api/app/detector.py:38-42); ``__call__`` tests each
    partition-state row against it."""

    def __init__(self, cfg: EngineConfig, ref_state_dir: str):
        self.cfg = cfg
        self.ref = ReferenceState.load(ref_state_dir)

    def _now(self) -> str:
        if self.cfg.freeze_time:
            return self.cfg.freeze_time
        return datetime.now(timezone.utc).strftime(TS_FORMAT)

    def verdicts_for_partition(self, pid: int, ps: PartialState) -> list[dict]:
        cfg = self.cfg
        ref = self.ref.state
        out: list[dict] = []
        ts = self._now()

        def verdict(check: str, column: str, stat: float, p: float,
                    n_ref: int, n_test: int) -> None:
            out.append({
                "partition_id": pid, "check": check, "column": column,
                "statistic": float(stat), "p_value": float(p), "alpha": cfg.alpha,
                "passed": bool(p > cfg.alpha), "n_ref": int(n_ref),
                "n_test": int(n_test), "datetime": ts,
            })

        # KS on each numeric marginal (reference ECDF from checkpointed histogram)
        for col in cfg.marginals:
            rh, th = ref.hists[col], ps.hists[col]
            n_ref, n_test = rh.total, th.total
            if n_ref == 0 or n_test == 0:
                verdict("ks", col, 0.0, 1.0, n_ref, n_test)
                continue
            d = ks_from_histograms(rh, th)
            verdict("ks", col, d, ks_pvalue_from_d(d, n_ref, n_test), n_ref, n_test)

        # Chi² on the fmt categorical
        stat, dof, p = chi2_test_counts(ps.fmt_counts, ref.fmt_counts)
        verdict("chi2", "fmt", stat, p, int(ref.fmt_counts.sum()), int(ps.fmt_counts.sum()))

        # MMD + permutation test over phash-derived embeddings
        x = phash_to_embedding(ref.sample_phash[: cfg.ref_sample_cap])
        y = phash_to_embedding(ps.sample_phash[: cfg.mmd_sample_cap])
        if x.shape[0] and y.shape[0]:
            dist, p = mmd_permutation_test(
                x, y, self.ref.sigma,
                num_permutations=cfg.num_permutations,
                seed=cfg.seed ^ (pid + 1),
                chunk=cfg.kernel_chunk,
            )
        else:
            dist, p = 0.0, 1.0
        verdict("mmd", "phash_embedding", dist, p, x.shape[0], y.shape[0])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for i in range(batch.num_rows):
            pid = int(batch["partition_id"][i].as_py())
            ps = PartialState.from_bytes(batch["state"][i].as_py())
            rows.extend(self.verdicts_for_partition(pid, ps))
        if not rows:
            return VERDICT_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=VERDICT_SCHEMA)
