"""Ray-Data-native schema + constraint validation engine for image+caption tables.

A from-scratch re-expression of the data-processing capabilities of
IFCA-Advanced-Computing/serverless-covariate-drift-detection (see SURVEY.md):
per-column statistics and mergeable sketches, covariate-drift tests
(KS / Chi-squared / MMD+permutation, cf. reference detector_api/app/detector.py:44-70),
uniqueness / referential / near-duplicate constraints, per-partition verdicts and
violation rows, and per-partition lineage checkpoints — all built on
``ray.data.Dataset`` streaming execution over zero-copy Arrow batches.
"""

# 0.2.0: FixedHistogram hi-edge now in-range (FH2) — the version is part of
# every config fingerprint, so resume markers and fingerprint-keyed state
# caches fit under the old binning invalidate rather than mixing CDFs
__version__ = "0.2.0"
