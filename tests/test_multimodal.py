"""Multimodal decode plumbing: opaque binary columns + actor-pool decode stage.

The decode of external formats (jpeg/webp) is STUBBED (no image libs in this
container — codec.decode_external raises NotImplementedError), but the Ray
plumbing — binary column schema, actor pool signature, per-batch output
layout, error routing — is real and exercised here with the in-repo codecs
standing in for the external ones.
"""

import numpy as np
import pyarrow as pa
import pytest

from serverless_covariate_drift_detection_ray.functions.codec import (
    decode_external,
    decode_image,
    encode_image,
)


def test_external_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_external(b"\xff\xd8\xff", "jpeg")
    with pytest.raises(ValueError):
        decode_external(b"", "gif")


class DecodeFeatures:
    """The multimodal actor-pool stage shape: decode opaque bytes → features."""

    def __init__(self):
        self.decode = decode_image  # swap for decode_external on real clusters

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, oks = [], []
        for i in range(batch.num_rows):
            try:
                img = self.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
                means.append(float(np.asarray(img, dtype=np.float64).mean()))
                oks.append(True)
            except Exception:
                means.append(float("nan"))
                oks.append(False)
        return pa.table({
            "image_id": batch["image_id"],
            "pixel_mean": pa.array(means, pa.float64()),
            "decode_ok": pa.array(oks),
        })


def test_decode_actor_pool_plumbing(ray_session):
    import ray.data

    rng = np.random.Generator(np.random.PCG64(5))
    rows = []
    for i in range(64):
        img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        rows.append({"image_id": f"m-{i}", "bytes": encode_image(img, "png"),
                     "fmt": "png"})
    rows.append({"image_id": "bad", "bytes": b"corrupt", "fmt": "png"})
    ds = ray.data.from_items(rows)
    out = ds.map_batches(DecodeFeatures, batch_format="pyarrow", batch_size=16,
                         concurrency=2).to_pandas()
    assert len(out) == 65
    assert out[out.image_id == "bad"].decode_ok.iloc[0] == False  # noqa: E712
    assert out[out.image_id != "bad"].decode_ok.all()
    assert out[out.image_id != "bad"].pixel_mean.between(0, 255).all()
