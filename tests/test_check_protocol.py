"""Check-protocol plugin surface (SURVEY.md §2.10).

A custom check — defined INSIDE the test function, not importable by Ray
workers — is injected through EngineConfig.drift_checks and must flow through
the full fit -> validate actor-pool pipeline (cloudpickle ships the instance
by value). Mirrors the reference's detector polymorphism: the service loads
any BaseDetector and calls only .compare()
(/root/reference/detector_api/app/detector.py:27-42)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from serverless_covariate_drift_detection_ray.fixtures.gen import ensure_fixture
from serverless_covariate_drift_detection_ray.pipelines.config import EngineConfig
from serverless_covariate_drift_detection_ray.pipelines.fit import fit
from serverless_covariate_drift_detection_ray.pipelines.validate import validate
from serverless_covariate_drift_detection_ray.stages.checks import (
    CHECK_REGISTRY,
    make_verdict,
    resolve_checks,
)


def test_builtins_registered():
    assert {"ks", "chi2", "mmd"} <= set(CHECK_REGISTRY)
    checks = resolve_checks(("ks", "chi2", "mmd"))
    assert [c.name for c in checks] == ["ks", "chi2", "mmd"]


def test_custom_check_instance_runs_through_pipeline(ray_session, tmp_path):
    class RowCountCheck:
        """Flags any partition with fewer rows than the reference window."""

        name = "row_count"

        def compare(self, pid, ref, ps, cfg, ts):
            n_ref = ref.state.n_rows
            n_test = ps.n_rows
            drifted = n_test < n_ref // 2
            return [make_verdict(pid, "row_count", "*", float(n_test),
                                 0.0 if drifted else 1.0, cfg, n_ref, n_test, ts)]

    fix = ensure_fixture("tiny")
    cfg = EngineConfig(freeze_time="01/01/2026 00:00:00.000000",
                       drift_checks=("ks", "chi2", "mmd", RowCountCheck()))
    ref_dir = str(tmp_path / "ref")
    out_dir = str(tmp_path / "out")
    fit(fix, ref_dir, cfg)
    validate(fix, ref_dir, out_dir, cfg)
    verdicts = pd.concat([
        pq.read_table(f).to_pandas()
        for f in sorted(glob.glob(os.path.join(out_dir, "verdicts", "*", "*.parquet")))
    ])
    rc = verdicts[verdicts.check == "row_count"]
    assert len(rc) == verdicts.partition_id.nunique()
    # tiny fixture partitions all have the reference's row count -> all pass
    assert rc.passed.all()


def test_caption_cms_check_flags_content_drift(ray_session, tmp_path):
    """The CMS-based caption-content check must flag the drift-caption
    partition and pass the reference partition."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from serverless_covariate_drift_detection_ray.fixtures.gen import ensure_fixture
    from serverless_covariate_drift_detection_ray.pipelines.config import EngineConfig
    from serverless_covariate_drift_detection_ray.pipelines.fit import fit
    from serverless_covariate_drift_detection_ray.pipelines.validate import validate
    from serverless_covariate_drift_detection_ray.sources.fragmented import TableManifest

    fix = ensure_fixture("tiny")
    manifest = TableManifest.load(fix)
    caption_pids = {pid for pid, meta in manifest.partitions.items()
                    if meta.get("kind") == "drift-caption"}
    assert caption_pids
    cfg = EngineConfig(freeze_time="01/01/2026 00:00:00.000000",
                       drift_checks=("caption_cms",))
    ref, out = str(tmp_path / "ref"), str(tmp_path / "out")
    fit(fix, ref, cfg)
    validate(fix, ref, out, cfg, resume=False)
    vs = pd.concat([pq.read_table(f).to_pandas()
                    for f in glob.glob(f"{out}/verdicts/*/*.parquet")])
    cc = vs[vs.check == "caption_cms"].set_index("partition_id")
    assert not cc.loc[sorted(caption_pids)].passed.any()
    assert cc.loc[0].passed  # reference partition clean
