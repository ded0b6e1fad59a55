import numpy as np
import pytest

from serverless_covariate_drift_detection_ray.state.sketches import (
    CountMinSketch,
    FixedHistogram,
    HyperLogLog,
    TDigest,
    ks_from_histograms,
)


RNG = np.random.Generator(np.random.PCG64(42))


class TestTDigest:
    def test_quantiles_close_to_exact(self):
        x = RNG.normal(10.0, 3.0, size=50_000)
        td = TDigest()
        for chunk in np.array_split(x, 13):
            td.update(chunk)
        for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
            exact = np.quantile(x, q)
            approx = td.quantile(q)[0]
            assert abs(approx - exact) < 0.05 * max(abs(exact), 1.0), q

    def test_merge_matches_single(self):
        x = RNG.exponential(2.0, size=20_000)
        parts = np.array_split(x, 7)
        tds = []
        for p in parts:
            t = TDigest()
            t.update(p)
            tds.append(t)
        merged = tds[0]
        for t in tds[1:]:
            merged.merge(t)
        whole = TDigest()
        whole.update(x)
        for q in [0.1, 0.5, 0.9]:
            assert abs(merged.quantile(q)[0] - whole.quantile(q)[0]) < 0.05 * abs(
                whole.quantile(q)[0]
            )
        assert merged.count == pytest.approx(x.size)

    def test_merge_order_invariance(self):
        xs = [RNG.normal(i, 1.0, size=2000) for i in range(4)]

        def build(order):
            tds = []
            for i in order:
                t = TDigest()
                t.update(xs[i])
                tds.append(t)
            acc = tds[0]
            for t in tds[1:]:
                acc.merge(t)
            return acc.quantile([0.25, 0.5, 0.75])

        a = build([0, 1, 2, 3])
        b = build([3, 1, 0, 2])
        assert np.allclose(a, b, rtol=0.03, atol=0.05)

    def test_roundtrip(self):
        td = TDigest()
        td.update(RNG.uniform(0, 1, 5000))
        td2 = TDigest.from_bytes(td.to_bytes())
        assert np.allclose(td.quantile([0.5]), td2.quantile([0.5]))

    def test_nan_ignored(self):
        td = TDigest()
        td.update(np.array([1.0, np.nan, 3.0]))
        assert td.count == 2


class TestHLL:
    def test_estimate_accuracy(self):
        for n in [100, 5_000, 200_000]:
            h = HyperLogLog()
            h.update(np.arange(n, dtype=np.int64))
            est = h.estimate()
            assert abs(est - n) / n < 0.05, (n, est)

    def test_merge_is_union(self):
        a, b = HyperLogLog(), HyperLogLog()
        a.update(np.arange(0, 10_000, dtype=np.int64))
        b.update(np.arange(5_000, 15_000, dtype=np.int64))
        a.merge(b)
        assert abs(a.estimate() - 15_000) / 15_000 < 0.05

    def test_strings_and_roundtrip(self):
        h = HyperLogLog()
        h.update(np.array([f"id-{i}" for i in range(3000)], dtype=object))
        h2 = HyperLogLog.from_bytes(h.to_bytes())
        assert h2.estimate() == h.estimate()
        assert abs(h.estimate() - 3000) / 3000 < 0.06

    def test_deterministic(self):
        a, b = HyperLogLog(), HyperLogLog()
        vals = np.array([f"k{i}" for i in range(1000)], dtype=object)
        a.update(vals)
        b.update(vals)
        assert np.array_equal(a.registers, b.registers)


class TestCMS:
    def test_heavy_hitter_counts(self):
        vals = np.concatenate(
            [np.repeat(np.array(["hot"], dtype=object), 5000),
             np.array([f"u{i}" for i in range(2000)], dtype=object)]
        )
        cms = CountMinSketch()
        cms.update(vals)
        est = cms.query(np.array(["hot"], dtype=object))[0]
        assert 5000 <= est <= 5000 + 50  # overestimate only, small width error

    def test_merge(self):
        a, b = CountMinSketch(), CountMinSketch()
        a.update(np.array(["x"] * 100, dtype=object))
        b.update(np.array(["x"] * 200, dtype=object))
        a.merge(b)
        assert a.query(np.array(["x"], dtype=object))[0] >= 300
        assert a.total == 300

    def test_roundtrip(self):
        cms = CountMinSketch()
        cms.update(np.arange(1000, dtype=np.int64))
        cms2 = CountMinSketch.from_bytes(cms.to_bytes())
        assert np.array_equal(cms.table, cms2.table)


class TestHistogram:
    def test_counts_and_cdf(self):
        h = FixedHistogram(0.0, 10.0, bins=10)
        h.update(np.array([0.5, 1.5, 1.6, 9.99, -1.0, 11.0]))
        assert h.total == 6
        assert h.counts[0] == 1  # underflow
        assert h.counts[-1] == 1  # overflow

    def test_ks_from_histograms(self):
        a = FixedHistogram(-5, 5, bins=256)
        b = FixedHistogram(-5, 5, bins=256)
        a.update(RNG.normal(0, 1, 20_000))
        b.update(RNG.normal(0.5, 1, 20_000))
        d = ks_from_histograms(a, b)
        # true KS distance between N(0,1) and N(.5,1) ≈ 0.197
        assert 0.15 < d < 0.25

    def test_merge_and_roundtrip(self):
        a = FixedHistogram(0, 1, bins=4)
        b = FixedHistogram(0, 1, bins=4)
        a.update(np.array([0.1, 0.2]))
        b.update(np.array([0.9]))
        a.merge(b)
        c = FixedHistogram.from_bytes(a.to_bytes())
        assert np.array_equal(a.counts, c.counts)
        assert c.total == 3
