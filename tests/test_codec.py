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


def test_png_filter2_segment_decode():
    """Foreign PNGs with Up-filtered scanlines hit the segmented-cumsum fast
    path; mixed 0/2 and filter-2-first-row must reconstruct exactly."""
    import struct
    import zlib

    import numpy as np

    from serverless_covariate_drift_detection_ray.functions import codec

    rng = np.random.Generator(np.random.PCG64(3))

    def encode_up(img, first_filter):
        h, w = img.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        rows = []
        prev = np.zeros(w, np.int64)
        for y in range(h):
            if y == 0 and first_filter == 2:
                rows.append(bytes([2]) + img[0].tobytes())
            elif y % 3 == 0:
                rows.append(bytes([0]) + img[y].tobytes())
            else:
                diff = (img[y].astype(np.int64) - prev) & 0xFF
                rows.append(bytes([2]) + diff.astype(np.uint8).tobytes())
            prev = img[y].astype(np.int64)
        idat = zlib.compress(b"".join(rows))
        return (codec.PNG_SIG + codec._chunk(b"IHDR", ihdr)
                + codec._chunk(b"IDAT", idat) + codec._chunk(b"IEND", b""))

    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    assert np.array_equal(codec.decode_png(encode_up(img, 0)), img)
    assert np.array_equal(codec.decode_png(encode_up(img, 2)), img)


def test_resize_area_matches_cumsum_reference():
    """The reduceat resize must be bit-identical to the exact cumsum-diff
    definition, including out-dim > in-dim (empty bins)."""
    import numpy as np

    from serverless_covariate_drift_detection_ray.functions.phash import _resize_area

    def resize_ref(img, out_h, out_w):
        h, w = img.shape[:2]
        ys = (np.arange(out_h + 1) * h // out_h).astype(np.int64)
        xs = (np.arange(out_w + 1) * w // out_w).astype(np.int64)
        csum = np.zeros((h + 1, w + 1), dtype=np.float64)
        csum[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
        area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
        s = (csum[np.ix_(ys[1:], xs[1:])] - csum[np.ix_(ys[:-1], xs[1:])]
             - csum[np.ix_(ys[1:], xs[:-1])] + csum[np.ix_(ys[:-1], xs[:-1])])
        return s / np.maximum(area, 1)

    rng = np.random.Generator(np.random.PCG64(4))
    for shape in [(28, 28), (16, 16), (128, 128), (160, 96), (31, 47), (7, 200)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(_resize_area(img, 32, 32), resize_ref(img, 32, 32)), shape


def test_phash64_batch_matches_naive_full_dct():
    """The 8-row-DCT batched kernel vs an independent naive full-DCT
    reimplementation. The engine's hard invariant (generator == verifier)
    holds BY CONSTRUCTION — phash64 delegates to phash64_batch — so this
    pins the kernel against an independent formulation instead (exact
    agreement measured on random + 32k real fixture images; a failure here
    would flag ULP sensitivity near the median, not an engine bug)."""
    import numpy as np

    from serverless_covariate_drift_detection_ray.functions.phash import (
        _DCT,
        phash64_batch,
        phash_gray_small,
    )

    def naive(small):
        coeffs = (_DCT @ small) @ _DCT.T
        flat = coeffs[:8, :8].ravel()
        sel = np.concatenate([flat[1:8], coeffs[1:8, :8].ravel()])
        med = np.partition(sel, 31)[31]
        out = int.from_bytes(np.packbits(flat > med).tobytes(), "big")
        return out - (1 << 64) if out >= (1 << 63) else out

    rng = np.random.Generator(np.random.PCG64(123))
    imgs = [rng.uniform(0, 255, size=(h, w)).astype(np.float64)
            for h, w in [(32, 32), (64, 48), (96, 128), (40, 40)] * 8]
    smalls = np.stack([phash_gray_small(im) for im in imgs])
    batch = phash64_batch(smalls)
    ref = np.array([naive(s) for s in smalls], dtype=np.int64)
    # the two formulations group the bilinear form differently, so allow a
    # couple of ULP-near-median bit flips on exotic BLAS backends; on this
    # host agreement is exact (also checked over 32k real fixture images)
    from serverless_covariate_drift_detection_ray.functions.phash import (
        phash_hamming,
    )

    assert int(phash_hamming(batch, ref).max()) <= 2


def _smooth_image(h, w, color, noise=0.0, seed=11):
    """Natural-ish synthetic image: gradients + a blob (JPEG's happy case);
    optional per-pixel noise for the stress variant."""
    rng = np.random.Generator(np.random.PCG64(seed))
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 23.0)
    blob = 80 * np.exp(-(((xx - w / 2) ** 2 + (yy - h / 2) ** 2)
                         / (0.1 * w * h)))
    g = np.clip(base + blob + rng.normal(0, noise, (h, w)), 0, 255)
    if not color:
        return g.astype(np.uint8)
    return np.clip(np.stack([g, np.roll(g, 5, 1) * 0.9, 255 - g], -1),
                   0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape,color", [((64, 64), False), ((61, 53), True),
                                         ((40, 72), True)])
def test_jpeg_roundtrip_psnr_above_40(shape, color):
    """The verdict's bar for the baseline-JPEG fixture: encode→decode PSNR
    ≥ 40 dB at high quality (measured ~50 dB on smooth images at q95,
    ~43 dB with per-pixel noise at q98)."""
    img = _smooth_image(*shape, color=color)
    out = decode_image(encode_image(img, "jpeg"), "jpeg")  # default q90 path
    assert out.shape == img.shape
    from serverless_covariate_drift_detection_ray.functions.jpeg import (
        encode_jpeg,
    )

    hi = decode_image(encode_jpeg(img, quality=95), "jpeg")
    assert psnr(img, hi) >= 40.0, psnr(img, hi)
    noisy = _smooth_image(*shape, color=color, noise=4.0)
    hi2 = decode_image(encode_jpeg(noisy, quality=98), "jpeg")
    assert psnr(noisy, hi2) >= 40.0, psnr(noisy, hi2)


def test_jpeg_header_dims_no_full_decode():
    img = _smooth_image(37, 51, color=True)
    data = encode_image(img, "jpeg")
    assert image_dims(data, "jpeg") == (51, 37, 3)
    g = encode_image(_smooth_image(20, 30, color=False), "jpeg")
    assert image_dims(g, "jpeg") == (30, 20, 1)


def test_jpeg_420_subsampled_decode_path():
    """The decoder's general MCU loop (sampling factors 2x2/1x1 + box
    upsample) — exercised via the encoder's 4:2:0 mode. Chroma is the
    lossy axis; luma fidelity must stay high."""
    from serverless_covariate_drift_detection_ray.functions.jpeg import (
        _rgb_to_ycbcr,
        encode_jpeg,
    )

    img = _smooth_image(61, 53, color=True)
    out = decode_image(encode_jpeg(img, quality=95, subsample=True), "jpeg")
    assert out.shape == img.shape
    y_in, _, _ = _rgb_to_ycbcr(img)
    y_out, _, _ = _rgb_to_ycbcr(out)
    assert psnr(y_in, y_out) >= 38.0
    assert psnr(img, out) >= 30.0


def test_jpeg_deterministic_and_loud_on_garbage():
    img = _smooth_image(32, 32, color=True)
    assert encode_image(img, "jpeg") == encode_image(img, "jpeg")
    a = decode_image(encode_image(img, "jpeg"), "jpeg")
    b = decode_image(encode_image(img, "jpeg"), "jpeg")
    assert (a == b).all()
    with pytest.raises(Exception):
        decode_image(b"\xff\xd8\xff\xee garbage", "jpeg")
    with pytest.raises(Exception):
        decode_image(encode_image(img, "jpeg")[:40], "jpeg")


def test_jpeg_fill_bytes_and_lengthless_markers():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker, and TEM (0x01)
    / RSTn carry no length field — real encoders emit both, and the marker
    walk previously read the next byte pair as a bogus segment length."""
    from serverless_covariate_drift_detection_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_header,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (24, 17, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality=90)
    ref = decode_jpeg(data)
    # splice fill bytes + a TEM marker right after SOI
    spliced = data[:2] + b"\xff\xff\xff\x01" + data[2:]
    assert jpeg_header(spliced) == jpeg_header(data)
    np.testing.assert_array_equal(decode_jpeg(spliced), ref)


def test_bmp_top_down_negative_height():
    """A top-down BMP (negative biHeight) stores rows first-to-last; the
    decoder previously flipped unconditionally, mirroring the image and
    tripping phash_match_decoded on externally-ingested files."""
    from serverless_covariate_drift_detection_ray.functions.codec import (
        bmp_header,
        decode_bmp,
        encode_bmp,
    )
    import struct

    rng = np.random.default_rng(10)
    img = rng.integers(0, 255, (9, 7, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    (offset,) = struct.unpack("<I", bytes(data[10:14]))
    w, h = img.shape[1], img.shape[0]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    # flip the payload to top-down order and negate biHeight
    payload = np.frombuffer(bytes(data[offset:offset + stride * h]),
                            dtype=np.uint8).reshape(h, stride)
    data[offset:offset + stride * h] = payload[::-1].tobytes()
    data[22:26] = struct.pack("<i", -h)
    td = bytes(data)
    assert bmp_header(td) == (w, h, 3)  # dims still positive
    np.testing.assert_array_equal(decode_bmp(td), img)
