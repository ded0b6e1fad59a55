"""Run-report sink (SURVEY S7): validate output dir -> one metrics JSON.

The reference's plot sinks (loss curves, transform galleries,
/root/reference/ml/plot.py:52-115) exist to summarize a run for a human; the
engine's headless equivalent is a machine-readable report assembled from the
committed per-partition artifacts: drift verdict matrix, violation counts by
check, column-stat extremes, lineage/wall totals. Reads only the (tiny)
committed outputs — never the input table."""

from __future__ import annotations

import json
import os
from typing import Any

from ..state.checkpoint import CheckpointStore


def build_report(out_dir: str) -> dict[str, Any]:
    store = CheckpointStore(out_dir)
    verdicts = store.read_all("verdicts")
    violations = store.read_all("violations")
    stats = store.read_all("column_stats")

    report: dict[str, Any] = {"out_dir": out_dir}

    lineage = []
    ldir = os.path.join(out_dir, "lineage")
    if os.path.isdir(ldir):
        for name in sorted(os.listdir(ldir)):
            if name.endswith(".json"):
                with open(os.path.join(ldir, name)) as fh:
                    lineage.append(json.load(fh))
    report["partitions"] = len(lineage)
    report["wall_s_total"] = round(sum(r.get("wall_s", 0.0) for r in lineage), 3)
    report["engine_version"] = lineage[0]["engine_version"] if lineage else None

    if verdicts is not None and verdicts.num_rows:
        v = verdicts.to_pandas()
        drift = v[v.check.isin(["ks", "chi2", "mmd"])]
        report["verdicts"] = {
            "total": len(v),
            "failed": int((~v.passed).sum()),
            "drift_flagged_partitions": sorted(
                int(p) for p in drift[~drift.passed].partition_id.unique()),
            "by_check": {
                c: {"n": int(len(g)), "failed": int((~g.passed).sum())}
                for c, g in v.groupby("check")
            },
        }
    if violations is not None:
        vi = violations.to_pandas()
        report["violations"] = {
            "total": len(vi),
            "by_check": {c: int(n) for c, n in vi.check.value_counts().items()},
        }
    if stats is not None and stats.num_rows:
        st = stats.to_pandas()
        cols = {}
        for c, g in st.groupby("column"):
            cols[c] = {
                "rows": int(g["count"].sum()),
                "nulls": int(g["null_count"].sum()),
                "min": None if g["min"].isna().all() else float(g["min"].min()),
                "max": None if g["max"].isna().all() else float(g["max"].max()),
            }
        report["columns"] = cols
    return report


def explain_drift(out_dir: str, ref_state_dir: str,
                  top_k: int = 3) -> dict[str, Any]:
    """Bin-level drift attribution from committed sketch state — for every
    (partition, column) a KS/Chi² verdict flagged, the ``top_k`` histogram
    bins (or fmt categories) with the largest |test share − reference
    share|, with their value ranges. Pure post-processing: reads the run's
    per-partition ``stats_blobs`` and the frozen reference state, touches
    no input data. The operational "WHAT moved" answer the verdict's
    p-value doesn't give."""
    import numpy as np

    from ..state.partials import PartialState
    from ..state.reference import ReferenceState

    ref = ReferenceState.load(ref_state_dir).state
    store = CheckpointStore(out_dir)
    verdicts = store.read_all("verdicts")
    flagged: dict[int, list[tuple[str, str]]] = {}
    if verdicts is not None and verdicts.num_rows:
        v = verdicts.to_pandas()
        bad = v[(~v.passed) & v.check.isin(["ks", "chi2"])]
        for _, r in bad.iterrows():
            flagged.setdefault(int(r.partition_id), []).append(
                (r.check, r.column))

    blob_dir = os.path.join(out_dir, "stats_blobs")
    out: dict[str, Any] = {}
    for pid, cols in sorted(flagged.items()):
        blob_path = os.path.join(blob_dir, f"{pid}.bin")
        if not os.path.exists(blob_path):
            continue
        with open(blob_path, "rb") as fh:
            part = PartialState.from_bytes(fh.read())
        per_col: dict[str, Any] = {}
        for check, col in cols:
            if check == "chi2":
                rc = ref.fmt_counts.astype(np.float64)
                tc = part.fmt_counts.astype(np.float64)
                rs = rc / max(rc.sum(), 1.0)
                ts = tc / max(tc.sum(), 1.0)
                names = list(ref.fmt_categories) + ["<out-of-domain>"]
                order = np.argsort(-np.abs(ts - rs))[:top_k]
                per_col[col] = [
                    {"category": names[i], "ref_share": round(float(rs[i]), 6),
                     "test_share": round(float(ts[i]), 6),
                     "delta": round(float(ts[i] - rs[i]), 6)}
                    for i in order]
                continue
            if col not in part.hists:
                continue
            rh = ref.hists[col]
            th = part.hists[col]
            rs = rh.counts / max(rh.counts.sum(), 1.0)
            ts = th.counts / max(th.counts.sum(), 1.0)
            lo, hi = rh.lo, rh.hi
            w = (hi - lo) / rh.bins

            def edges(i: int) -> tuple[float, float]:
                # counts layout: [underflow, bins..., overflow]
                if i == 0:
                    return float("-inf"), lo
                if i == rh.bins + 1:
                    return hi, float("inf")
                return lo + (i - 1) * w, lo + i * w

            order = np.argsort(-np.abs(ts - rs))[:top_k]
            per_col[col] = [
                {"bin_lo": round(edges(int(i))[0], 4),
                 "bin_hi": round(edges(int(i))[1], 4),
                 "ref_share": round(float(rs[i]), 6),
                 "test_share": round(float(ts[i]), 6),
                 "delta": round(float(ts[i] - rs[i]), 6)}
                for i in order]
        if per_col:
            out[str(pid)] = per_col
    return out


def fdr_adjust(out_dir: str, q: float = 0.05) -> dict[str, Any]:
    """Benjamini-Hochberg FDR correction across the run's drift-test
    p-values. The reference applies its alpha per COMPARISON
    (detector_api/app/detector.py:47) — correct for one serving request,
    but a partitioned run issues |partitions| × |drift checks| tests at
    once, so the expected false-flag count grows linearly with the
    partition count at any fixed per-test alpha. This post-processes the
    committed verdict table (tiny) into q-values and the set of flags
    that survive FDR control at ``q`` — the operationally honest flag
    list for a many-partition run."""
    import numpy as np

    from ..functions.stats import bh_qvalues

    verdicts = CheckpointStore(out_dir).read_all("verdicts")
    out: dict[str, Any] = {"q": q, "m_tests": 0, "n_raw_flags": 0,
                           "n_fdr_flags": 0, "fdr_flagged": []}
    if verdicts is None or not verdicts.num_rows:
        return out
    v = verdicts.to_pandas()
    d = v[v.p_value.notna() & np.isfinite(v.p_value.to_numpy(np.float64))]
    if not len(d):
        return out
    qv = bh_qvalues(d.p_value.to_numpy(np.float64))
    rej = qv <= q
    out["m_tests"] = int(len(d))
    out["n_raw_flags"] = int((~d.passed).sum())
    out["n_fdr_flags"] = int(rej.sum())
    flagged = d.loc[rej, ["partition_id", "check", "column", "p_value"]].copy()
    flagged["q_value"] = qv[rej]
    flagged = flagged.sort_values(["q_value", "partition_id", "check"],
                                  kind="mergesort")
    out["fdr_flagged"] = [
        {"partition_id": int(r.partition_id), "check": str(r.check),
         "column": str(r.column), "p_value": round(float(r.p_value), 6),
         "q_value": round(float(r.q_value), 6)}
        for r in flagged.itertuples()]
    return out


def write_report(out_dir: str, path: str | None = None,
                 extra: dict[str, Any] | None = None) -> str:
    """Assemble and atomically write ``report.json`` into the run dir.

    ``extra`` sections (e.g. drift explanations) merge into the report
    before the write, so every on-disk report shares one byte-stable
    format (indent=1, sorted keys)."""
    path = path or os.path.join(out_dir, "report.json")
    report = build_report(out_dir)
    if extra:
        report.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path
