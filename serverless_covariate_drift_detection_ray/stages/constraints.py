"""Shuffle-based constraints: PK uniqueness and phash near-duplicate buckets.

These are the engine's wide operations (SURVEY.md §2.7 items 2 and 4). Both run
over a column-pruned re-read of the table — only (image_id, phash,
partition_id) ever enter a shuffle; the heavy ``bytes`` column never does.

Scale notes (10^12 rows):
  * Uniqueness is an inherent all-to-all on the key column. The cheap screen is
    ``count == HLL distinct estimate`` from the stats pass; the exact pass here
    pre-aggregates (image_id → count) per block before the groupby so only one
    row per distinct id per block shuffles.
  * Near-dup banding keys are 16-bit phash slices — two images within Hamming
    distance < 4 share ≥ 1 band (pigeonhole). Hot bands (e.g. flat images) are
    capped per group; salting the band key with a phash-suffix sub-bucket is the
    skew escape hatch (north rule "salted keys to defeat skew").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.phash import phash_bands, phash_hamming
from ..pipelines.config import EngineConfig

VIOLATION_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("image_id", pa.string()),
        ("check", pa.string()),
        ("column", pa.string()),
        ("observed", pa.string()),
        ("expected", pa.string()),
    ]
)


def _precount(batch: pa.Table) -> pa.Table:
    """Per-block (image_id → count, one partition sample) pre-aggregation."""
    df = batch.select(["image_id", "partition_id"]).to_pandas()
    g = df.groupby("image_id", sort=False).agg(
        cnt=("image_id", "size"), partition_id=("partition_id", "min")
    )
    return pa.table({
        "image_id": pa.array(g.index.to_numpy(), pa.string()),
        "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
        "partition_id": pa.array(g["partition_id"].to_numpy(), pa.int32()),
    })


def check_uniqueness(ds) -> "ray.data.Dataset":  # noqa: F821
    """image_id PK check: violations for every id appearing more than once.

    ``map_batches(precount) → groupby(image_id) → filter(sum > 1)`` — the
    partial/combiner shape, so the shuffle moves one row per (block, id).
    """
    from ray.data.aggregate import Min, Sum

    pre = ds.map_batches(_precount, batch_format="pyarrow", zero_copy_batch=True)
    agg = pre.groupby("image_id").aggregate(
        Sum("cnt", alias_name="total"), Min("partition_id", alias_name="partition_id")
    )

    def to_violations(batch: pa.Table) -> pa.Table:
        mask = pa.compute.greater(batch["total"], 1)
        dup = batch.filter(mask)
        n = dup.num_rows
        if n == 0:
            return VIOLATION_SCHEMA.empty_table()
        return pa.table({
            "partition_id": dup["partition_id"].cast(pa.int32()),
            "image_id": dup["image_id"],
            "check": pa.array(["unique_image_id"] * n),
            "column": pa.array(["image_id"] * n),
            "observed": pa.compute.cast(dup["total"], pa.string()),
            "expected": pa.array(["1"] * n),
        }, schema=VIOLATION_SCHEMA)

    return agg.map_batches(to_violations, batch_format="pyarrow")


def _explode_bands(batch: pa.Table, n_bands: int) -> pa.Table:
    ph = batch["phash"].to_numpy(zero_copy_only=False)
    bands = phash_bands(ph, n_bands)  # (n, n_bands)
    n = ph.size
    rep_ids = np.repeat(np.arange(n), n_bands)
    return pa.table({
        "band_key": pa.array(bands.ravel(), pa.int64()),
        "image_id": batch["image_id"].take(pa.array(rep_ids)),
        "phash": pa.array(np.repeat(ph, n_bands), pa.int64()),
        "partition_id": batch["partition_id"].take(pa.array(rep_ids)),
    })


def check_neardup(ds, cfg: EngineConfig) -> "ray.data.Dataset":  # noqa: F821
    """phash near-duplicate buckets via LSH banding (SURVEY.md §2.6).

    explode(4 band keys/img) → groupby(band_key) → verify pairwise Hamming ≤ d
    within each group → one violation row per member of a cluster of size ≥
    ``neardup_min_cluster``; cross-band duplicates collapse via a final groupby
    on image_id (keep the lexicographically-smallest cluster rep).
    """

    hamming_max = cfg.neardup_hamming_max
    min_cluster = cfg.neardup_min_cluster

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "partition_id": pd.array([], dtype="int64"),
            "image_id": pd.array([], dtype="string"),
            "rep": pd.array([], dtype="string"),
        })

    def verify_group(df: pd.DataFrame) -> pd.DataFrame:
        # drop exact-duplicate image_ids within the band group (PK check owns those)
        df = df.drop_duplicates("image_id")
        m = len(df)
        if m < min_cluster:
            return _empty()
        if m > 512:  # hot-band cap: flat/degenerate hashes; report the bucket itself
            df = df.nsmallest(512, "image_id")
            m = len(df)
        ph = df["phash"].to_numpy()
        dist = phash_hamming(ph[:, None], ph[None, :])
        close = dist <= hamming_max
        # connected components via numpy label propagation (groups are small)
        labels = np.arange(m)
        for _ in range(m):
            new = np.array([labels[close[i]].min() for i in range(m)])
            if np.array_equal(new, labels):
                break
            labels = new
        ids = df["image_id"].to_numpy()
        parts = df["partition_id"].to_numpy()
        rows = []
        for lbl in np.unique(labels):
            members = np.nonzero(labels == lbl)[0]
            if members.size >= min_cluster:
                rep = min(ids[members])
                for i in members:
                    rows.append((int(parts[i]), ids[i], rep))
        if not rows:
            return _empty()
        out = pd.DataFrame(rows, columns=["partition_id", "image_id", "rep"])
        return out.astype({"partition_id": "int64", "image_id": "string", "rep": "string"})

    exploded = ds.map_batches(
        lambda b: _explode_bands(b, 4), batch_format="pyarrow", zero_copy_batch=True
    )
    candidates = exploded.groupby("band_key").map_groups(verify_group, batch_format="pandas")

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("rep").head(1)

    uniq = candidates.groupby("image_id").map_groups(dedupe, batch_format="pandas")

    def to_violations(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return VIOLATION_SCHEMA.empty_table()
        return pa.table({
            "partition_id": batch["partition_id"].cast(pa.int32()),
            "image_id": batch["image_id"],
            "check": pa.array(["neardup_phash"] * n),
            "column": pa.array(["phash"] * n),
            "observed": batch["rep"].cast(pa.string()),
            "expected": pa.array([f"hamming>{cfg.neardup_hamming_max}"] * n),
        }, schema=VIOLATION_SCHEMA)

    return uniq.map_batches(to_violations, batch_format="pyarrow")
