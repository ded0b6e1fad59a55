"""CLI surface: the engine analogue of the reference's command-line pipelines
(ml/training.py / ml/testing.py CLIs). fit/validate internals are covered by
the e2e suite; here the argument surface and the session-free commands run
in-process, and fit/validate run against the shared Ray session via a
no-shutdown stub."""

import json

import serverless_covariate_drift_detection_ray.__main__ as cli


def test_gen_fixture_and_report_roundtrip(tmp_path, capsys, monkeypatch, ray_session):
    dest = str(tmp_path / "tbl")
    assert cli.main(["gen-fixture", "--scale", "tiny", "--dest", dest]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["partitions"] == 12 and out["rows"] == 3000

    class _NoShutdown:
        @staticmethod
        def shutdown():
            pass  # keep the session fixture alive

    monkeypatch.setattr(cli, "_ray_session", lambda n: _NoShutdown)
    state = str(tmp_path / "ref")
    run = str(tmp_path / "run")
    assert cli.main(["fit", "--manifest", dest, "--state", state]) == 0
    assert cli.main(["validate", "--manifest", dest, "--state", state,
                     "--out", run]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["partitions_processed"] == 12

    assert cli.main(["report", "--out", run]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["partitions"] == 12
    assert rep["verdicts"]["total"] > 0


def test_pipeline_command_end_to_end(tmp_path, capsys, monkeypatch, ray_session):
    """One submission: fit -> validate -> report (+ quarantine + explain)."""
    import os

    from serverless_covariate_drift_detection_ray.fixtures.gen import ensure_fixture

    fix = ensure_fixture("tiny")

    class _NoShutdown:
        @staticmethod
        def shutdown():
            pass

    monkeypatch.setattr(cli, "_ray_session", lambda n: _NoShutdown)
    wd = str(tmp_path / "wd")
    assert cli.main(["pipeline", "--manifest", fix, "--workdir", wd,
                     "--quarantine", "--explain", "--fdr", "0.05",
                     "--plots"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["summary"]["verdicts"] > 0
    assert out["summary"]["quarantined"] > 0
    rep = json.load(open(out["report"]))
    assert rep["drift_explanations"]
    assert rep["fdr"]["m_tests"] > 0
    assert any(p.endswith("drift_heatmap.svg") for p in rep["plots"])
    # second submission resumes: nothing reprocessed
    assert cli.main(["pipeline", "--manifest", fix, "--workdir", wd]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["summary"]["partitions_processed"] == 0
