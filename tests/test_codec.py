import numpy as np
import pytest

from serverless_covariate_drift_detection_ray.functions.codec import (
    decode_image,
    encode_image,
    image_dims,
    psnr,
)
from serverless_covariate_drift_detection_ray.functions.phash import (
    phash64,
    phash_bands,
    phash_hamming,
    phash_to_embedding,
    popcount64,
)

RNG = np.random.Generator(np.random.PCG64(42))


@pytest.mark.parametrize("shape", [(28, 28), (40, 33), (28, 28, 3), (64, 31, 3)])
@pytest.mark.parametrize("fmt", ["png", "bmp"])
def test_lossless_roundtrip(shape, fmt):
    img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_image(img, fmt)
    w, h, c = image_dims(data, fmt)
    assert (w, h) == (shape[1], shape[0])
    assert c == (1 if len(shape) == 2 else 3)
    out = decode_image(data, fmt)
    assert np.array_equal(out, img)


@pytest.mark.parametrize("shape", [(28, 28), (32, 48, 3)])
def test_lossy8_psnr_above_40(shape):
    img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_image(img, "lossy8")
    out = decode_image(data, "lossy8")
    assert out.shape == img.shape
    p = psnr(img, out)
    assert p >= 40.0, p
    # and it IS lossy
    assert not np.array_equal(out, img)


def test_image_dims_no_full_decode():
    img = RNG.integers(0, 256, size=(50, 60), dtype=np.uint8)
    for fmt in ["png", "bmp", "lossy8"]:
        data = encode_image(img, fmt)
        assert image_dims(data, fmt)[:2] == (60, 50)


def test_phash_stability_and_sensitivity():
    img = RNG.integers(0, 256, size=(28, 28), dtype=np.uint8)
    h1 = phash64(img)
    h2 = phash64(img.copy())
    assert h1 == h2
    # small noise -> small hamming distance
    noisy = np.clip(img.astype(np.int16) + RNG.integers(-4, 5, img.shape), 0, 255).astype(np.uint8)
    d_small = phash_hamming(np.array([h1]), np.array([phash64(noisy)]))[0]
    other = RNG.integers(0, 256, size=(28, 28), dtype=np.uint8)
    d_big = phash_hamming(np.array([h1]), np.array([phash64(other)]))[0]
    assert d_small < d_big


def test_popcount():
    assert popcount64(np.array([0], dtype=np.uint64))[0] == 0
    assert popcount64(np.array([0xFFFFFFFFFFFFFFFF], dtype=np.uint64))[0] == 64
    assert popcount64(np.array([0b1011], dtype=np.uint64))[0] == 3


def test_phash_embedding_shape_and_norm():
    h = np.array([0, -1, 123456789], dtype=np.int64)
    emb = phash_to_embedding(h)
    assert emb.shape == (3, 64)
    assert emb.dtype == np.float32
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_phash_bands_collision_for_near_dups():
    h = np.int64(0x0123456789ABCDEF)
    for bit in [0, 20, 40, 63]:
        h_flip = h ^ (np.int64(1) << np.int64(bit))
        bands_a = phash_bands(np.array([h]))
        bands_b = phash_bands(np.array([h_flip]))
        # pigeonhole: 1-bit difference must leave >= 2 of 3 bands equal
        assert (bands_a == bands_b).sum() >= 2, bit
    # 2-bit difference still shares >= 1 band
    h2 = h ^ (np.int64(1) << np.int64(5)) ^ (np.int64(1) << np.int64(30))
    assert (phash_bands(np.array([h])) == phash_bands(np.array([h2]))).sum() >= 1
