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


__all__ = ["DecodeFeatures", "read_image_dir", "dump_images", "EXTERNAL_FMTS"]
