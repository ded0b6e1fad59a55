"""Property tests for the session-3 drift/quality operators
(cusum_changepoint_events, gopher_repetition_documents,
vocab_drift_documents) on crafted inputs — the oracle tests pin SQL parity;
these pin the SEMANTICS (a shift alarms, repetition saturates, disjoint
vocabularies max out OOV/JS)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, hours, values, event_type="A"):
    """One event per hour with the given value sequence."""
    n = len(values)
    ts = (np.datetime64("2026-01-01T00:00:00", "us")
          + np.arange(n) * np.timedelta64(3600, "s"))
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array([event_type] * n),
        "value": pa.array(np.asarray(values, np.float64)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_documents(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["src0"] * len(texts)),
        "n_chars": pa.array(np.array([len(x) for x in texts], np.int64)),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_cusum_flags_mean_shift_not_stable_prefix(ray_session, tmp_path):
    from serverless_covariate_drift_detection_ray.pipelines.queries import (
        cusum_changepoint_events,
    )

    rng = np.random.Generator(np.random.PCG64(11))
    pre = rng.normal(10.0, 1.0, 60)
    post = rng.normal(16.0, 1.0, 60)  # +6 raw shift, persistent
    sf = _write_events(tmp_path, 120, np.concatenate([pre, post]))
    out = cusum_changepoint_events(sf).to_pandas().sort_values("hour")
    alarms = out.is_alarm.to_numpy()
    # the earliest hours predate any accumulation: never alarmed
    assert not alarms[:5].any()
    # the persistent shift must alarm somewhere in the post window
    assert alarms[60:].any()
    # CUSUM stats are never negative by construction
    assert (out.cusum_pos.to_numpy() >= 0).all()
    assert (out.cusum_neg.to_numpy() >= 0).all()


def test_cusum_constant_series_never_alarms(ray_session, tmp_path):
    from serverless_covariate_drift_detection_ray.pipelines.queries import (
        cusum_changepoint_events,
    )

    sf = _write_events(tmp_path, 80, np.full(80, 42.0))
    out = cusum_changepoint_events(sf).to_pandas()
    # sd == 0 -> z == 0 everywhere -> slack drains both sides to 0
    assert not out.is_alarm.to_numpy().any()
    assert np.allclose(out.cusum_pos.to_numpy(), 0.0)
    assert np.allclose(out.cusum_neg.to_numpy(), 0.0)


def test_ewma_flags_shift_and_respects_limits(ray_session, tmp_path):
    from serverless_covariate_drift_detection_ray.pipelines.queries import (
        ewma_control_events,
    )

    rng = np.random.Generator(np.random.PCG64(13))
    pre = rng.normal(10.0, 1.0, 60)
    post = rng.normal(16.0, 1.0, 60)
    sf = _write_events(tmp_path, 120, np.concatenate([pre, post]))
    out = ewma_control_events(sf).to_pandas().sort_values("hour")
    assert out.is_ooc.to_numpy()[60:].any()
    # limits grow monotonically toward the asymptote L*sd*sqrt(lam/(2-lam))
    lims = out["limit"].to_numpy()
    assert (np.diff(lims) >= -1e-9).all()
    # constant series: never out-of-control (sd == 0 guard)
    (tmp_path / "c2").mkdir(exist_ok=True)
    sf2 = _write_events(tmp_path / "c2", 40, np.full(40, 7.0))
    out2 = ewma_control_events(sf2).to_pandas()
    assert not out2.is_ooc.to_numpy().any()


def test_gopher_repetition_extremes(ray_session, tmp_path):
    from serverless_covariate_drift_detection_ray.pipelines.textops import (
        gopher_repetition_documents,
    )

    sf = _write_documents(tmp_path, [
        "x x x x x x x x",                      # pure repetition
        "a b c d e f g h",                      # all distinct
        "a b",                                  # < 4 tokens: excluded
    ])
    out = gopher_repetition_documents(sf).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 1]  # short doc excluded
    assert out.loc[0, "dup_word_frac"] == 1.0
    assert out.loc[0, "top_trigram_frac"] == 1.0
    assert out.loc[0, "top_quadgram_frac"] == 1.0
    assert out.loc[1, "dup_word_frac"] == 0.0
    # 6 trigram positions, all distinct -> top frac = 1/6; 5 quadgrams -> 1/5
    assert out.loc[1, "top_trigram_frac"] == pytest.approx(
        np.floor(1e6 / 6 + 0.5) / 1e6)
    assert out.loc[1, "top_quadgram_frac"] == 0.2


def test_vocab_drift_disjoint_vocab_maxes_oov_and_js(ray_session, tmp_path):
    from serverless_covariate_drift_detection_ray.pipelines.textops import (
        vocab_drift_documents,
    )

    # even doc_ids (reference) speak only {aa bb}; odd (current) only {cc}
    sf = _write_documents(tmp_path, [
        "aa bb aa bb", "cc cc cc cc", "bb aa bb aa", "cc cc cc cc",
    ])
    row = vocab_drift_documents(sf).to_pylist()[0]
    assert row["n_ref_tokens"] == 8 and row["n_cur_tokens"] == 8
    assert row["oov_rate"] == 1.0
    assert row["oov_types"] == 1
    # disjoint supports -> JS divergence hits its ln(2) maximum (nats)
    assert row["js_divergence"] == pytest.approx(
        np.floor(np.log(2) * 1e6 + 0.5) / 1e6)


def test_vocab_drift_identical_splits_zero(ray_session, tmp_path):
    from serverless_covariate_drift_detection_ray.pipelines.textops import (
        vocab_drift_documents,
    )

    sf = _write_documents(tmp_path, ["aa bb cc", "aa bb cc"] * 3)
    row = vocab_drift_documents(sf).to_pylist()[0]
    assert row["oov_rate"] == 0.0 and row["oov_types"] == 0
    assert row["js_divergence"] == 0.0


def test_cusum_closed_form_equals_recursion():
    """The closed form the engine and oracle share — cum_k - min(0,
    min_{j<=k} cum_j) — must equal the textbook recursion s_k =
    max(0, s_{k-1} + y_k) exactly (same float ops modulo association,
    so compare with tight tolerance) on arbitrary series."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(min_value=-50, max_value=50,
                              allow_nan=False, allow_infinity=False),
                    min_size=1, max_size=64))
    def check(ys):
        y = np.asarray(ys, dtype=np.float64)
        cum = np.cumsum(y)
        closed = cum - np.minimum(np.minimum.accumulate(cum), 0.0)
        s, direct = 0.0, []
        for v in y:
            s = max(0.0, s + v)
            direct.append(s)
        assert np.allclose(closed, np.asarray(direct), rtol=1e-9, atol=1e-9)

    check()
