"""Regression tests for the round-4 advice fixes (ADVICE.md r3→r4).

Each test pins a specific hardening that landed this round:
  * ``_footer_minmax`` raises a clear ValueError (naming table + column)
    when a parquet row group lacks min/max statistics, instead of a
    confusing ``AttributeError`` deep inside the quantile engine.
  * ``write_plots`` refuses to sum histogram counts across partition
    stats blobs whose (lo, hi, bins) configs disagree — a stale or
    mixed-run blob directory must fail loudly, not render a wrong
    run-wide marginal.
  * ``orc_roundtrip_lineitem``'s staged cache cross-checks rows ON DISK
    (ORC stripe footers) against the source row count, so a lost or
    collided block file surfaces as a RuntimeError instead of silently
    diverging from the oracle.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_footer_minmax_missing_statistics_raises(tmp_path):
    from serverless_covariate_drift_detection_ray.pipelines.queries import _footer_minmax

    t = pa.table({"x": pa.array(np.arange(100, dtype=np.int64))})
    pq.write_table(t, str(tmp_path / "t.parquet"), write_statistics=False)
    with pytest.raises(ValueError, match=r"t\.parquet.*'x'.*statistics"):
        _footer_minmax(str(tmp_path), "t", "x")
    # sanity: the same file WITH statistics resolves the true range
    pq.write_table(t, str(tmp_path / "t.parquet"))
    assert _footer_minmax(str(tmp_path), "t", "x") == (0.0, 99.0)


def test_write_plots_rejects_mixed_histogram_configs(tmp_path):
    from serverless_covariate_drift_detection_ray.pipelines.plots import write_plots
    from serverless_covariate_drift_detection_ray.state.partials import PartialState

    out_dir = str(tmp_path / "out")
    blob_dir = os.path.join(out_dir, "stats_blobs")
    os.makedirs(blob_dir)
    a = PartialState({"w": (0.0, 100.0, 8)}, fmt_categories=("png",))
    a.update_numeric("w", np.array([1.0, 50.0]))
    b = PartialState({"w": (0.0, 200.0, 8)}, fmt_categories=("png",))  # other range
    b.update_numeric("w", np.array([150.0]))
    for name, st in (("p0.bin", a), ("p1.bin", b)):
        with open(os.path.join(blob_dir, name), "wb") as fh:
            fh.write(st.to_bytes())
    with pytest.raises(ValueError, match="incompatible histogram config"):
        write_plots(out_dir)
    # compatible blobs render fine (and produce the histogram SVG)
    with open(os.path.join(blob_dir, "p1.bin"), "wb") as fh:
        fh.write(a.to_bytes())
    written = write_plots(out_dir)
    assert any(p.endswith("hist_w.svg") for p in written)


def test_uniqueness_dup_fold_gate_parity(ray_session, monkeypatch):
    """The PK-uniqueness driver-fold branch (bounded dup set summed on the
    driver) must emit exactly what the salted-groupby branch emits: one row
    per duplicated KEY, observed = exact global count, partition_id = min
    locus. Forces the distributed branch via DUP_FOLD_DRIVER_MAX = -1."""
    import ray.data

    from serverless_covariate_drift_detection_ray.stages import constraints as C

    ids = (["dup-a"] * 3 + ["dup-b"] * 2 + [f"u{i}" for i in range(40)]
           + [None, None])
    parts = [3, 1, 2, 0, 2] + [i % 4 for i in range(40)] + [1, 2]
    t = pa.table({"image_id": pa.array(ids, pa.string()),
                  "partition_id": pa.array(parts, pa.int32())})
    ds = ray.data.from_arrow(t).repartition(5).materialize()

    def run():
        df = C.check_uniqueness(ds).to_pandas()
        return (df.sort_values("image_id").reset_index(drop=True)
                if len(df) else df)

    fold = run()
    monkeypatch.setattr(C, "DUP_FOLD_ROWS_MAX", -1)  # fan-out bound trips
    via_rows_gate = run()
    monkeypatch.setattr(C, "DUP_FOLD_DRIVER_MAX", -1)  # hash bound trips
    shuffled = run()
    assert list(fold.image_id) == ["dup-a", "dup-b"]
    assert list(fold.observed) == ["3", "2"]
    assert list(fold.partition_id) == [1, 0]  # min partition locus
    pd.testing.assert_frame_equal(fold, shuffled)
    pd.testing.assert_frame_equal(fold, via_rows_gate)


def test_featurize_task_vs_actor_pool_parity(ray_session, tmp_path_factory):
    """The default stateless-task featurize (warm-worker module cache) and
    the explicit actor pool (cfg.featurize_concurrency) must produce
    byte-identical verdicts and violations — the execution mode is a
    scheduling choice, never a semantic one."""
    import dataclasses
    import glob

    from serverless_covariate_drift_detection_ray.fixtures.gen import ensure_fixture
    from serverless_covariate_drift_detection_ray.pipelines.config import EngineConfig
    from serverless_covariate_drift_detection_ray.pipelines.fit import fit
    from serverless_covariate_drift_detection_ray.pipelines.validate import validate

    base = tmp_path_factory.mktemp("featmode")
    fix = ensure_fixture("tiny")
    cfg = EngineConfig(freeze_time="01/01/2026 00:00:00.000000")
    ref_dir = str(base / "ref")
    fit(fix, ref_dir, cfg)

    def load(out_dir, sub):
        files = sorted(glob.glob(os.path.join(out_dir, sub, "*", "*.parquet")))
        return pd.concat([pq.read_table(f).to_pandas() for f in files]
                         ).reset_index(drop=True)

    outs = {}
    for mode, c in (("tasks", cfg),
                    ("pool", dataclasses.replace(cfg, featurize_concurrency=3))):
        out = str(base / f"out-{mode}")
        validate(fix, ref_dir, out, c)
        outs[mode] = (load(out, "verdicts"), load(out, "violations"))
    pd.testing.assert_frame_equal(outs["tasks"][0], outs["pool"][0])
    pd.testing.assert_frame_equal(outs["tasks"][1], outs["pool"][1])


def test_orc_roundtrip_detects_rows_lost_on_disk(ray_session):
    from serverless_covariate_drift_detection_ray.pipelines.queries import (
        orc_roundtrip_lineitem,
    )

    st = os.stat(f"{SF_DIR}/lineitem.parquet")
    out_dir = (f"/tmp/scdd_orc/sf0.001/"
               f"lineitem_{st.st_size}_{st.st_mtime_ns}")
    try:
        orc_roundtrip_lineitem(SF_DIR)  # populates + passes the cross-check
        orc_files = sorted(f for f in os.listdir(out_dir) if f.endswith(".orc"))
        assert orc_files, "staged ORC dir should hold at least one block file"
        os.remove(os.path.join(out_dir, orc_files[0]))  # simulate a lost block
        with pytest.raises(RuntimeError, match="rows on disk"):
            orc_roundtrip_lineitem(SF_DIR)
    finally:
        # leave no poisoned cache behind: the next caller must rebuild
        shutil.rmtree(out_dir, ignore_errors=True)
