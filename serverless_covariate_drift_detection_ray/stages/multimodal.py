"""Multimodal column stages: opaque binary payloads -> decoded features.

Images/audio/video ride the table as opaque ``binary`` columns with typed
metadata (``fmt``), mirroring the reference's decode-on-ingress boundary
(/root/reference/dimensionality_reduction_api/app/schemas/dr.py:15-30 decodes
multipart bytes to a PIL image before any work). Here the decode happens
inside an actor-pool ``map_batches`` stage: codec dispatch is resolved once in
``__init__`` (the load-once-per-worker pattern of
/root/reference/detector_api/app/utils.py:4-14), each ``__call__`` processes
one Arrow batch and routes per-row decode failures into a ``decode_ok`` flag
instead of failing the batch.

External formats (jpeg/webp) are stubbed behind
``functions.codec.decode_external`` (no image libs in-sandbox); the plumbing —
schema, actor signature, batch sizing, error routing — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import EXTERNAL_FMTS, decode_external, decode_image


class DecodeFeatures:
    """Actor-pool stage: decode opaque ``bytes`` per ``fmt`` -> scalar features.

    Use with ``ds.map_batches(DecodeFeatures, batch_format="pyarrow",
    batch_size=B, concurrency=N)``. Large binary payloads want a small
    ``batch_size`` so batch x concurrency fits in worker heap.
    """

    def __init__(self, use_external: bool = False):
        # Resolved once per actor; swap for the real jpeg/webp decoders on a
        # cluster with the image libs baked in.
        self._decode = decode_external if use_external else decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        means = np.full(n, np.nan, dtype=np.float64)
        stds = np.full(n, np.nan, dtype=np.float64)
        oks = np.zeros(n, dtype=bool)
        data = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for i in range(n):
            try:
                img = np.asarray(self._decode(data[i], fmts[i]), dtype=np.float64)
                means[i] = img.mean()
                stds[i] = img.std()
                oks[i] = True
            except Exception:
                pass  # decode failure routed to decode_ok=False
        return pa.table({
            "image_id": batch.column("image_id"),
            "pixel_mean": pa.array(means, pa.float64()),
            "pixel_std": pa.array(stds, pa.float64()),
            "decode_ok": pa.array(oks),
        })


def read_image_dir(path: str, fmt_from_ext: bool = True):
    """Loose-file binary ingest (SURVEY S2): directory of image files ->
    Dataset with (image_id, bytes, fmt) columns via ``read_binary_files``.

    Mirrors the reference's multipart-upload source
    (/root/reference/model_inference_api/app/schemas/model.py:10-30) without
    the HTTP hop: each file is one row, decode stays lazy (done by a
    downstream DecodeFeatures stage). Fragment-parallel at scale: Ray Data
    splits the file list across read tasks.
    """
    import ray.data

    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_schema(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        ids, fmts = [], []
        for p in paths:
            name = p.rsplit("/", 1)[-1]
            stem, _, ext = name.rpartition(".")
            ids.append(stem or name)
            ext = ext.lower()
            fmts.append({"jpg": "jpeg"}.get(ext, ext) if fmt_from_ext else "unknown")
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": batch.column("bytes"),
            "fmt": pa.array(fmts, pa.string()),
        })

    return ds.map_batches(to_schema, batch_format="pyarrow")


def dump_images(ds, out_dir: str, fmt: str = "png", limit_per_partition: int = 16):
    """Debug image dump sink — the reference's transformed-image writer
    (/root/reference/ml/utils/drift.py:21-34 writes tensor->uint8 PNGs per
    class) as a distributed stage: each task decodes its batch rows and
    writes loose image files under ``out_dir/partition_id=N/``, capped at
    ``limit_per_partition`` per (task, partition) by a deterministic
    smallest-hash sample — total output is bounded by limit x n_tasks, so a
    debug dump of a 10^12-row table stays debug-sized. Returns the number of
    files written."""
    import os

    import ray.data  # noqa: F401

    from ..functions.codec import encode_image
    from ..functions.hashing import hash64

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        parts = (batch.column("partition_id").to_numpy()
                 if "partition_id" in batch.column_names
                 else np.zeros(len(ids), dtype=np.int64))
        data = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        keys = hash64(ids.astype(object))
        written = []
        for pid in np.unique(parts):
            sel = np.flatnonzero(parts == pid)
            take = sel[np.argsort(keys[sel], kind="stable")[:limit_per_partition]]
            d = os.path.join(out_dir, f"partition_id={int(pid)}")
            os.makedirs(d, exist_ok=True)
            for i in take:
                try:
                    img = decode_image(data[i], fmts[i])
                except Exception:
                    continue  # undecodable rows are the violation path's job
                path = os.path.join(d, f"{ids[i]}.{fmt}")
                with open(path + ".tmp", "wb") as fh:
                    fh.write(encode_image(np.asarray(img, dtype=np.uint8), fmt))
                os.replace(path + ".tmp", path)
                written.append(path)
        return pa.table({"path": pa.array(written, pa.string())})

    out = ds.map_batches(write_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.count()


VIDEO_FMTS = frozenset({"mp4", "webm", "mkv"})
AUDIO_FMTS = frozenset({"wav", "flac", "ogg", "mp3"})


def decode_video_external(data: bytes, fmt: str):
    """STUB: real video decode needs ffmpeg/pyav (not in this container).

    Raises ``NotImplementedError`` for known video containers so callers fail
    loudly instead of silently producing fakes; on a cluster with the codec
    libs baked in, swap this for the real frame decoder (same signature:
    bytes -> (n_frames, h, w[, c]) uint8 array)."""
    if fmt not in VIDEO_FMTS:
        raise ValueError(f"not a known video format: {fmt!r}")
    raise NotImplementedError(
        f"video decode for {fmt!r} requires an external codec library")


def decode_audio_external(data: bytes, fmt: str):
    """STUB: real audio decode needs libsndfile/ffmpeg (not in this container).

    Same contract as :func:`decode_video_external`; the real decoder returns
    (n_samples,) float32 PCM."""
    if fmt not in AUDIO_FMTS:
        raise ValueError(f"not a known audio format: {fmt!r}")
    raise NotImplementedError(
        f"audio decode for {fmt!r} requires an external codec library")


def _fake_frame(payload_hash: int, index: int, shape=(16, 16)) -> np.ndarray:
    """Deterministic fake frame/window content derived from (payload, index) —
    keeps the Ray-side plumbing (row expansion, schema, batching) real and
    byte-reproducible without external codecs."""
    seed = (payload_hash ^ (index * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


class FrameSample:
    """Actor-pool stage: video ``bytes`` -> uniformly sampled frame rows.

    Input rows carry (video_id, bytes, fmt, n_frames) — ``n_frames`` is typed
    metadata, the at-scale contract for opaque media columns (decode never
    runs just to count frames). Emits up to ``max_frames`` rows per video
    (one per sampled frame) with per-frame features — a flat_map expressed as
    ``map_batches`` so the expansion stays vectorized per batch and the
    decoder loads once per actor.

    ``use_external=True`` routes through :func:`decode_video_external` (real
    decode, stubbed in-sandbox); the default uses the deterministic fake so
    schema/batching/output layout are testable. Large payloads want small
    ``batch_size`` (bytes x batch x concurrency bounds worker heap).
    """

    def __init__(self, max_frames: int = 8, use_external: bool = False):
        from ..functions.hashing import hash64  # once per actor

        self.max_frames = max_frames
        self.use_external = use_external
        self._hash64 = hash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, mean_out, std_out, ok_out = [], [], [], [], []
        vids = batch.column("video_id").to_pylist()
        data = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n_frames = batch.column("n_frames").to_pylist()
        for vid, payload, fmt, nf in zip(vids, data, fmts, n_frames):
            nf = int(nf or 0)
            if nf <= 0:
                continue
            k = min(self.max_frames, nf)
            sample = np.unique(np.linspace(0, nf - 1, k).astype(np.int64))
            if self.use_external:
                try:
                    frames = decode_video_external(payload, fmt)[sample]
                except Exception:
                    ids_out.append(vid)
                    idx_out.append(-1)
                    mean_out.append(np.nan)
                    std_out.append(np.nan)
                    ok_out.append(False)
                    continue
            else:
                h = int(self._hash64(np.array([payload or b""], object))[0])
                frames = np.stack([_fake_frame(h, int(i)) for i in sample])
            flat = frames.reshape(len(sample), -1).astype(np.float64)
            ids_out.extend([vid] * len(sample))
            idx_out.extend(int(i) for i in sample)
            mean_out.extend(flat.mean(axis=1))
            std_out.extend(flat.std(axis=1))
            ok_out.extend([True] * len(sample))
        return pa.table({
            "video_id": pa.array(ids_out, pa.string()),
            "frame_index": pa.array(idx_out, pa.int64()),
            "frame_mean": pa.array(mean_out, pa.float64()),
            "frame_std": pa.array(std_out, pa.float64()),
            "decode_ok": pa.array(ok_out),
        })


class AudioWindows:
    """Actor-pool stage: audio ``bytes`` -> fixed-length window feature rows.

    Input rows carry (audio_id, bytes, fmt, sample_rate, n_samples) typed
    metadata; output is one row per ``window_s``-second window with RMS and
    zero-crossing features. Same stub contract as :class:`FrameSample`:
    ``use_external=True`` calls the (in-sandbox stubbed) real decoder, the
    default synthesizes a deterministic fake waveform per row.
    """

    def __init__(self, window_s: float = 1.0, max_windows: int = 16,
                 use_external: bool = False):
        from ..functions.hashing import hash64

        self.window_s = window_s
        self.max_windows = max_windows
        self.use_external = use_external
        self._hash64 = hash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, rms_out, zc_out, ok_out = [], [], [], [], []
        aids = batch.column("audio_id").to_pylist()
        data = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        rates = batch.column("sample_rate").to_pylist()
        counts = batch.column("n_samples").to_pylist()
        for aid, payload, fmt, rate, n in zip(aids, data, fmts, rates, counts):
            n = int(n or 0)
            rate = int(rate or 0)
            if n <= 0 or rate <= 0:
                continue
            if self.use_external:
                try:
                    pcm = np.asarray(decode_audio_external(payload, fmt),
                                     dtype=np.float64)
                except Exception:
                    ids_out.append(aid)
                    idx_out.append(-1)
                    rms_out.append(np.nan)
                    zc_out.append(-1)
                    ok_out.append(False)
                    continue
            else:
                h = int(self._hash64(np.array([payload or b""], object))[0])
                rng = np.random.Generator(np.random.PCG64(h & 0xFFFFFFFFFFFFFFFF))
                pcm = rng.standard_normal(min(n, rate * self.max_windows))
            win = max(1, int(rate * self.window_s))
            n_win = min(self.max_windows, max(1, len(pcm) // win))
            for wdx in range(n_win):
                seg = pcm[wdx * win:(wdx + 1) * win]
                if seg.size == 0:
                    break
                ids_out.append(aid)
                idx_out.append(wdx)
                rms_out.append(float(np.sqrt(np.mean(seg * seg))))
                zc_out.append(int(np.count_nonzero(np.signbit(seg[1:])
                                                   != np.signbit(seg[:-1]))))
                ok_out.append(True)
        return pa.table({
            "audio_id": pa.array(ids_out, pa.string()),
            "window_index": pa.array(idx_out, pa.int64()),
            "rms": pa.array(rms_out, pa.float64()),
            "zero_crossings": pa.array(zc_out, pa.int64()),
            "decode_ok": pa.array(ok_out),
        })


__all__ = ["DecodeFeatures", "FrameSample", "AudioWindows", "PreprocessImages",
           "read_image_dir", "dump_images", "decode_video_external",
           "decode_audio_external", "EXTERNAL_FMTS", "VIDEO_FMTS", "AUDIO_FMTS",
           "IMAGE_SIZE"]


IMAGE_SIZE = (28, 28)  # the reference's canonical input size
#                        (/root/reference/ml/utils/constants.py:28)


class PreprocessImages:
    """Actor-pool stage: the reference's preprocess transform, literally —
    ``[Grayscale] -> Resize((28, 28)) -> ToTensor`` (built at
    /root/reference/ml/training.py:210-221, applied per record at
    model_inference_api/app/model.py:147-156) as a vectorized batch op:
    decode ``bytes`` per ``fmt``, channel-mean to grayscale, exact area
    resize to 28x28, scale to float32 [0, 1]. Output rows carry the tensor
    as a fixed_size_list<float>[784] column ready for any downstream scorer.
    Decode failures route to ``decode_ok=False`` with a zero tensor."""

    def __init__(self, size: tuple[int, int] = IMAGE_SIZE,
                 use_external: bool = False):
        from ..functions.phash import _resize_sums  # once per actor

        self.size = size
        self._decode = decode_external if use_external else decode_image
        self._resize_sums = _resize_sums

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, w = self.size
        n = batch.num_rows
        out = np.zeros((n, h * w), dtype=np.float32)
        oks = np.zeros(n, dtype=bool)
        data = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for i in range(n):
            try:
                img = self._decode(data[i], fmts[i])
            except Exception:
                continue
            if img.ndim == 3:
                ih, iw, c = img.shape
                s, hgt, wid = self._resize_sums(img.reshape(ih, iw * c), h, w, c)
                small = s / np.maximum(hgt[:, None] * wid[None, :] * c, 1)
            else:
                s, hgt, wid = self._resize_sums(img, h, w)
                small = s / np.maximum(hgt[:, None] * wid[None, :], 1)
            out[i] = (small / 255.0).astype(np.float32).ravel()
            oks[i] = True
        return pa.table({
            "image_id": batch.column("image_id"),
            "tensor": pa.FixedSizeListArray.from_arrays(
                pa.array(out.ravel(), pa.float32()), h * w),
            "decode_ok": pa.array(oks),
        })
