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


def write_report(out_dir: str, path: str | None = None) -> str:
    """Assemble and atomically write ``report.json`` into the run dir."""
    path = path or os.path.join(out_dir, "report.json")
    report = build_report(out_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path
