"""Multimodal decode plumbing: opaque binary columns + actor-pool decode stage.

The decode of external formats (jpeg/webp) is STUBBED (no image libs in this
container — codec.decode_external raises NotImplementedError), but the Ray
plumbing — binary column schema, actor pool signature, per-batch output
layout, error routing — is real and exercised here with the in-repo codecs
standing in for the external ones.

The actor class lives in the PACKAGE (stages/multimodal.py), not this module:
Ray workers can't import test modules, so a module-level class here hangs the
actor pool forever (round-1 red item).
"""

import numpy as np
import pytest

from serverless_covariate_drift_detection_ray.functions.codec import decode_external, encode_image
from serverless_covariate_drift_detection_ray.stages.multimodal import DecodeFeatures, read_image_dir


def test_external_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_external(b"\xff\xd8\xff", "jpeg")
    with pytest.raises(ValueError):
        decode_external(b"", "gif")


def _image_rows(n=64, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        rows.append({"image_id": f"m-{i}", "bytes": encode_image(img, "png"),
                     "fmt": "png"})
    return rows


def test_decode_actor_pool_plumbing(ray_session):
    import ray.data

    rows = _image_rows()
    rows.append({"image_id": "bad", "bytes": b"corrupt", "fmt": "png"})
    ds = ray.data.from_items(rows)
    out = ds.map_batches(DecodeFeatures, batch_format="pyarrow", batch_size=16,
                         concurrency=2).to_pandas()
    assert len(out) == 65
    assert out[out.image_id == "bad"].decode_ok.iloc[0] == False  # noqa: E712
    assert out[out.image_id != "bad"].decode_ok.all()
    assert out[out.image_id != "bad"].pixel_mean.between(0, 255).all()
    assert out[out.image_id != "bad"].pixel_std.ge(0).all()


def test_read_image_dir_loose_files(ray_session, tmp_path):
    rng = np.random.Generator(np.random.PCG64(9))
    for i in range(8):
        img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        (tmp_path / f"img-{i}.png").write_bytes(encode_image(img, "png"))
    ds = read_image_dir(str(tmp_path))
    out = ds.map_batches(DecodeFeatures, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert len(out) == 8
    assert out.decode_ok.all()
    assert set(out.image_id) == {f"img-{i}" for i in range(8)}


def test_dump_images_sink(ray_session, tmp_path):
    import glob

    import ray.data

    from serverless_covariate_drift_detection_ray.functions.codec import decode_image
    from serverless_covariate_drift_detection_ray.stages.multimodal import dump_images

    rows = _image_rows(n=32, seed=11)
    for i, r in enumerate(rows):
        r["partition_id"] = i % 2
    out = str(tmp_path / "dump")
    n = dump_images(ray.data.from_items(rows), out, limit_per_partition=4)
    files = sorted(glob.glob(f"{out}/partition_id=*/*.png"))
    assert n == len(files) and 0 < n <= 8 * 4  # bounded by limit x tasks
    img = decode_image(open(files[0], "rb").read(), "png")
    assert img.shape == (16, 16)
