"""Atomic file publication — the one place the write-tmp-then-replace
pattern lives.

Every durable artifact in the engine (lineage markers, verdict/violation
parquet, reference state, table manifests, snapshots) publishes via
``atomic_publish``: the payload lands in ``<path>.tmp``, is fsync'd, and
``os.replace`` makes it visible in one step, so readers only ever see a
complete file. The fsync matters for the resumability contract: without it
the rename can survive a power loss while the data blocks don't, leaving a
complete-looking but corrupt artifact that a resumed run would trust
(process crashes alone never need it — the replace is already atomic).
``fsync=False`` exists for pure caches where corruption is only a rebuild.
"""

from __future__ import annotations

import json
import os


def atomic_publish(path: str, write_fn, fsync: bool = True) -> None:
    """Run ``write_fn(tmp_path)`` then atomically publish to ``path``."""
    tmp = path + ".tmp"
    write_fn(tmp)
    if fsync:
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    os.replace(tmp, path)
    if fsync:
        # the rename itself must be durable, or a crash can forget the
        # publication while a later lineage marker (written after) survives
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)


def atomic_write_bytes(path: str, data: bytes, fsync: bool = True) -> None:
    def w(tmp: str) -> None:
        with open(tmp, "wb") as fh:
            fh.write(data)

    atomic_publish(path, w, fsync=fsync)


def atomic_write_json(path: str, obj, indent: int | None = None,
                      fsync: bool = True) -> None:
    atomic_write_bytes(path, json.dumps(obj, indent=indent).encode(),
                       fsync=fsync)
