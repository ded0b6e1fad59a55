"""Bloom filter (functions/bloom.py): no false negatives, FPR near target,
partial-build OR-merge equivalence (the distributed build contract)."""

import numpy as np

from serverless_covariate_drift_detection_ray.functions.bloom import BloomFilter


def test_no_false_negatives_and_fpr():
    rng = np.random.default_rng(7)
    keys = rng.choice(10**9, size=20_000, replace=False)
    members, outsiders = keys[:10_000], keys[10_000:]
    bf = BloomFilter.build(members, fpp=0.01)
    assert bf.contains(members).all()
    fpr = bf.contains(outsiders).mean()
    assert fpr < 0.03, fpr  # 3x slack over the 1% target


def test_merge_equals_bulk_build():
    keys = np.arange(5_000, dtype=np.int64) * 7919
    bulk = BloomFilter.build(keys, fpp=0.01)
    a = BloomFilter(bulk.m, bulk.k)
    b = BloomFilter(bulk.m, bulk.k)
    a.add(keys[:2_500])
    b.add(keys[2_500:])
    merged = a.merge(b)
    assert (merged.bits == bulk.bits).all()


def test_string_keys_and_empty():
    bf = BloomFilter.build(np.array(["a", "b", "c"], dtype=object))
    assert bf.contains(np.array(["a", "c"], dtype=object)).all()
    assert bf.contains(np.array([], dtype=object)).shape == (0,)
    bf.add(np.array([], dtype=object))  # no-op, no crash
