"""Multimodal decode plumbing: opaque binary columns + actor-pool decode stage.

External-format decode: ``jpeg`` now has a real in-sandbox baseline
(functions/jpeg.py, pure numpy); ``webp`` stays stubbed (no libwebp —
codec.decode_external raises NotImplementedError). The Ray plumbing — binary
column schema, actor pool signature, per-batch output layout, error routing —
is real and exercised here with the in-repo codecs
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
        decode_external(b"RIFF....WEBP", "webp")
    with pytest.raises(ValueError):
        decode_external(b"", "gif")
    with pytest.raises(Exception):  # truncated jpeg fails loudly, not wrong
        decode_external(b"\xff\xd8\xff", "jpeg")


def test_external_jpeg_decodes_via_baseline():
    """decode_external('jpeg') routes to the pure-numpy baseline decoder."""
    from serverless_covariate_drift_detection_ray.functions.jpeg import encode_jpeg

    rng = np.random.Generator(np.random.PCG64(3))
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    out = decode_external(encode_jpeg(img, quality=90), "jpeg")
    assert out.shape == img.shape and out.dtype == np.uint8


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


def test_video_audio_external_stubs_raise():
    from serverless_covariate_drift_detection_ray.stages.multimodal import (
        decode_audio_external, decode_video_external)

    with pytest.raises(NotImplementedError):
        decode_video_external(b"\x00", "mp4")
    with pytest.raises(ValueError):
        decode_video_external(b"\x00", "txt")
    with pytest.raises(NotImplementedError):
        decode_audio_external(b"\x00", "wav")
    with pytest.raises(ValueError):
        decode_audio_external(b"\x00", "exe")


def test_frame_sample_actor_pool(ray_session):
    import ray.data

    from serverless_covariate_drift_detection_ray.stages.multimodal import FrameSample

    rows = [{"video_id": f"v-{i}", "bytes": bytes([i]) * 64, "fmt": "mp4",
             "n_frames": nf} for i, nf in enumerate([0, 1, 5, 100, 1000])]
    ds = ray.data.from_items(rows)
    out = ds.map_batches(FrameSample, fn_constructor_kwargs={"max_frames": 8},
                         batch_format="pyarrow", batch_size=2,
                         concurrency=2).to_pandas()
    # n_frames=0 emits nothing; others emit min(max_frames, n_frames) rows
    counts = out.groupby("video_id").size().to_dict()
    assert "v-0" not in counts
    assert counts == {"v-1": 1, "v-2": 5, "v-3": 8, "v-4": 8}
    assert out.decode_ok.all()
    assert out.frame_mean.between(0, 255).all()
    # frame indices are a uniform stride over [0, n_frames)
    v4 = out[out.video_id == "v-4"].frame_index.tolist()
    assert v4 == sorted(v4) and v4[0] == 0 and v4[-1] == 999
    # deterministic across runs
    out2 = ds.map_batches(FrameSample, fn_constructor_kwargs={"max_frames": 8},
                          batch_format="pyarrow", batch_size=2,
                          concurrency=2).to_pandas()
    a = out.sort_values(["video_id", "frame_index"]).reset_index(drop=True)
    b = out2.sort_values(["video_id", "frame_index"]).reset_index(drop=True)
    assert a.equals(b)


def test_audio_windows_actor_pool(ray_session):
    import ray.data

    from serverless_covariate_drift_detection_ray.stages.multimodal import AudioWindows

    rows = [{"audio_id": f"a-{i}", "bytes": bytes([i]) * 32, "fmt": "wav",
             "sample_rate": 8000, "n_samples": ns}
            for i, ns in enumerate([0, 8000, 40000])]
    ds = ray.data.from_items(rows)
    out = ds.map_batches(AudioWindows,
                         fn_constructor_kwargs={"window_s": 1.0, "max_windows": 4},
                         batch_format="pyarrow", concurrency=2).to_pandas()
    counts = out.groupby("audio_id").size().to_dict()
    assert "a-0" not in counts
    assert counts == {"a-1": 1, "a-2": 4}  # capped at max_windows
    assert out.decode_ok.all()
    assert (out.rms > 0).all() and (out.zero_crossings >= 0).all()


def test_frame_sample_external_stub_routes_errors(ray_session):
    """With use_external=True the (stubbed) real decoder raises per row; the
    stage must route that into decode_ok=False rows, not fail the batch."""
    import ray.data

    from serverless_covariate_drift_detection_ray.stages.multimodal import FrameSample

    rows = [{"video_id": f"v-{i}", "bytes": b"\x00" * 16, "fmt": "mp4",
             "n_frames": 10} for i in range(4)]
    out = ray.data.from_items(rows).map_batches(
        FrameSample, fn_constructor_kwargs={"use_external": True},
        batch_format="pyarrow", concurrency=2).to_pandas()
    assert len(out) == 4
    assert (~out.decode_ok).all()
    assert (out.frame_index == -1).all()


def test_preprocess_images_stage(ray_session):
    """The M1 preprocess analogue: decode -> grayscale -> 28x28 area resize
    -> float32 [0,1] tensors, with decode failures routed not raised."""
    import ray.data

    from serverless_covariate_drift_detection_ray.stages.multimodal import (
        IMAGE_SIZE, PreprocessImages)

    rows = _image_rows(n=24, seed=13)
    rows.append({"image_id": "bad", "bytes": b"junk", "fmt": "png"})
    out = ray.data.from_items(rows).map_batches(
        PreprocessImages, batch_format="pyarrow", batch_size=8,
        concurrency=2).to_pandas()
    assert len(out) == 25
    ok = out[out.image_id != "bad"]
    assert ok.decode_ok.all()
    import numpy as np

    mats = np.stack(ok.tensor.to_numpy())
    assert mats.shape == (24, IMAGE_SIZE[0] * IMAGE_SIZE[1])
    assert mats.dtype == np.float32
    assert (mats >= 0).all() and (mats <= 1).all()
    assert mats.std() > 0  # real content, not zeros
    bad = out[out.image_id == "bad"]
    assert not bad.decode_ok.iloc[0]
    assert np.allclose(np.stack(bad.tensor.to_numpy()), 0.0)


def test_gallery_over_dump(ray_session, tmp_path):
    """write_gallery composes a dump_images dir into one self-contained
    HTML page: every dumped image embeds as a data URI under its
    partition heading."""
    import ray.data

    from serverless_covariate_drift_detection_ray.functions.codec import encode_image
    from serverless_covariate_drift_detection_ray.pipelines.plots import write_gallery
    from serverless_covariate_drift_detection_ray.stages.multimodal import dump_images

    rng = np.random.Generator(np.random.PCG64(9))
    rows = [{"image_id": f"im{i}", "partition_id": i % 2, "fmt": "png",
             "bytes": encode_image(
                 rng.integers(0, 255, (8, 8, 3), dtype=np.uint8), "png")}
            for i in range(6)]
    out = str(tmp_path / "dump")
    n = dump_images(ray.data.from_items(rows), out, limit_per_partition=4)
    path = write_gallery(out)
    html = open(path).read()
    assert html.count("data:image/png;base64,") == n
    assert "partition_id=0" in html and "partition_id=1" in html
    assert "im0" in html
