"""Monotone drift-severity property (SURVEY.md §5 property 3).

The reference evaluates 15 corruptions at increasing severity and expects
stronger corruption => larger detector distance
(/root/reference/ml/utils/drift.py:37-198, ml/testing.py:120-126). Here the
same property is pinned for the engine's two structural corruption analogues
(Gaussian blur sigma sweep, elastic displacement sweep) on the MMD-over-
phash-embeddings statistic. Pure numpy — no Ray session needed. All values
are fully seeded, so the asserted orderings are exact, not statistical.
"""

import numpy as np
import pytest

from serverless_covariate_drift_detection_ray.fixtures.gen import generate_fragment
from serverless_covariate_drift_detection_ray.functions.phash import phash_to_embedding
from serverless_covariate_drift_detection_ray.functions.stats import (
    median_heuristic_sigma,
    mmd2_biased,
)

ROWS = 1200  # large enough that MMD sampling noise (~1/n) sits below the
             # weakest severity's signal

KINDS = [
    ("reference", 0), ("clean", 1),
    ("drift-blur-1.0", 5), ("drift-blur-2.0", 6), ("drift-blur-4.0", 7),
    ("drift-elastic-0.5", 8), ("drift-elastic-1.0", 9),
    ("drift-elastic-2.0", 10), ("drift-elastic-4.0", 11),
]


@pytest.fixture(scope="module")
def distances():
    def emb(kind, fid):
        table, _ = generate_fragment(fid, 0, kind, ROWS)
        return phash_to_embedding(table["phash"].to_numpy())

    ref = emb("reference", 0)
    sigma = median_heuristic_sigma(ref)
    return {kind: float(mmd2_biased(ref, emb(kind, fid), sigma))
            for kind, fid in KINDS if fid != 0}


def test_mmd_monotone_in_blur_sigma(distances):
    d = [distances[f"drift-blur-{s}"] for s in ("1.0", "2.0", "4.0")]
    assert all(b > a for a, b in zip(d, d[1:])), d


def test_mmd_monotone_in_elastic_alpha(distances):
    d = [distances[f"drift-elastic-{s}"] for s in ("0.5", "1.0", "2.0", "4.0")]
    assert all(b > a for a, b in zip(d, d[1:])), d


def test_clean_below_every_severity(distances):
    clean = distances["clean"]
    for kind, dist in distances.items():
        if kind.startswith("drift-"):
            assert clean < dist, (kind, clean, dist)


def test_ks_pixel_mean_monotone_in_jitter(ray_session=None):
    """ColorJitter analogue (reference ml/utils/drift.py ColorJitter tiers):
    phash is jitter-invariant by design, so the engine catches jitter on the
    decoded pixel-intensity marginal — KS distance on per-image pixel means
    must grow with the jitter tier."""
    from serverless_covariate_drift_detection_ray.functions.codec import decode_image
    from serverless_covariate_drift_detection_ray.functions.stats import ks_2samp

    rows = 400

    def pixel_means(kind, fid):
        table, _ = generate_fragment(fid, 0, kind, rows)
        fmts = table["fmt"].to_pylist()
        out = np.empty(table.num_rows)
        for i, (b, f) in enumerate(zip(table["bytes"].to_pylist(), fmts)):
            out[i] = float(np.mean(decode_image(b, f)))
        return out

    ref = pixel_means("reference", 0)
    ds = [ks_2samp(ref, pixel_means(f"drift-jitter-{t}", 20 + i))[0]
          for i, t in enumerate(("0.3", "0.6", "1.2"))]
    clean = ks_2samp(ref, pixel_means("clean", 30))[0]
    assert all(b > a for a, b in zip(ds, ds[1:])), ds
    assert clean < ds[0], (clean, ds)
