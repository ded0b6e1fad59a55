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
import pyarrow.compute as pc

from ..functions.graph import cc_labels
from ..functions.hashing import hash64
from ..functions.phash import hamming_leq_pairs, phash_bands, phash_hamming
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
    """Per-block (image_id → count, one partition sample) pre-aggregation.

    Null ids are excluded (SQL PK semantics: null never equals null) — they
    are flagged by featurize's image_id_nonnull check instead; without the
    filter every pair of null ids would be reported as a PK duplicate."""
    batch = batch.filter(pc.is_valid(batch["image_id"]))
    df = batch.select(["image_id", "partition_id"]).to_pandas()
    g = df.groupby("image_id", sort=False).agg(
        cnt=("image_id", "size"), partition_id=("partition_id", "min")
    )
    return pa.table({
        "image_id": pa.array(g.index.to_numpy(), pa.string()),
        "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
        "partition_id": pa.array(g["partition_id"].to_numpy(), pa.int32()),
    })


SCREEN_MAX_ROWS = 50_000_000  # above this the dup screen would strain the driver


def check_uniqueness(ds) -> "ray.data.Dataset":  # noqa: F821
    """image_id PK check: violations for every id appearing more than once.

    Two-phase: (1) a cheap *screen* — per-block id-hash partials stream to the
    driver (8 B/id) and a numpy unique finds duplicated hashes; when none
    exist (the common case) no shuffle happens at all. (2) only rows whose
    hash is in the (tiny) dup set are pulled and grouped exactly.

    Above ``SCREEN_MAX_ROWS`` the screen is skipped for the all-to-all
    ``map_batches(precount) → groupby(image_id)`` partial/combiner shape —
    the inherent exact-uniqueness shuffle at cluster scale.
    """
    from ..functions.hashing import hash64

    import ray.data

    try:
        total_rows = ds.count()
    except Exception:
        total_rows = SCREEN_MAX_ROWS + 1

    if total_rows <= SCREEN_MAX_ROWS:
        def id_hashes(batch: pa.Table) -> pa.Table:
            # nulls excluded: PK uniqueness is over non-null keys only (two
            # nulls hash identically and would screen as a duplicate)
            ids = batch["image_id"].drop_null().to_numpy(zero_copy_only=False)
            h = hash64(ids)
            return pa.table({"h": pa.array(h.astype(np.int64))})

        # one bulk to_pandas transfer — iter_batches pays ~10x per-batch
        # driver overhead at this row count (verify-skill note)
        allh = ds.map_batches(id_hashes, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()["h"].to_numpy()
        uniq, counts = np.unique(allh, return_counts=True)
        dup_hashes = np.sort(uniq[counts > 1])
        dup_counts = dict(zip(uniq[counts > 1].tolist(), counts[counts > 1].tolist()))
        if dup_hashes.size == 0:
            return ray.data.from_arrow(VIOLATION_SCHEMA.empty_table())

        def collect_dups(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch["image_id"]))
            h = hash64(batch["image_id"].to_numpy(zero_copy_only=False)).astype(np.int64)
            pos = np.minimum(np.searchsorted(dup_hashes, h), dup_hashes.size - 1)
            mask = dup_hashes[pos] == h
            dup = batch.filter(pa.array(mask))
            n = dup.num_rows
            if n == 0:
                return VIOLATION_SCHEMA.empty_table()
            hd = h[mask]
            return pa.table({
                "partition_id": dup["partition_id"].cast(pa.int32()),
                "image_id": dup["image_id"],
                "check": pa.array(["unique_image_id"] * n),
                "column": pa.array(["image_id"] * n),
                "observed": pa.array([str(dup_counts[int(x)]) for x in hd]),
                "expected": pa.array(["1"] * n),
            }, schema=VIOLATION_SCHEMA)

        dup_rows = ds.map_batches(collect_dups, batch_format="pyarrow",
                                  zero_copy_batch=True)

        # one violation row per duplicated KEY (min partition as the locus);
        # salt-bucketed so the shuffle has a fixed group count (Ray charges
        # ~2 ms per map_groups group) with a vectorized within-bucket head-1
        def add_bucket(batch: pa.Table) -> pa.Table:
            b = (hash64(batch["image_id"].to_numpy(zero_copy_only=False))
                 % np.uint64(64)).astype(np.int64)
            return batch.append_column("dbkt", pa.array(b))

        def dedupe_bucket(df: pd.DataFrame) -> pd.DataFrame:
            # numpy first-per-key mask — .ne(.shift()) silently drops every
            # first row under pandas nullable string dtype (<NA> filter)
            d = df.sort_values(["image_id", "partition_id"], kind="mergesort")
            ids = d.image_id.to_numpy()
            first = np.r_[True, ids[1:] != ids[:-1]] if len(ids) else np.empty(0, bool)
            return d[first].drop(columns=["dbkt"])

        return dup_rows.map_batches(add_bucket, batch_format="pyarrow"
                                    ).groupby("dbkt").map_groups(
            dedupe_bucket, batch_format="pandas")

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
    # null-id rows are excluded: their violation row would carry no usable
    # key (image_id_nonnull already flags them) and a None id crashes the
    # object-dtype sorts in the downstream per-bucket dedupe
    batch = batch.filter(pc.is_valid(batch["image_id"]))
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


NEARDUP_DRIVER_MAX = 50_000_000  # distinct phash values the driver will hold (8 B each)


def check_neardup(ds, cfg: EngineConfig) -> "ray.data.Dataset":  # noqa: F821
    """phash near-duplicate buckets (SURVEY.md §2.7 item 4), driver-coordinated.

    The phash column is 8 B/row, so up to ~50M *distinct* values the whole
    candidate search runs as vectorized numpy on the driver: band the distinct
    values (21/21/22-bit slices), batch same-sized band groups into one
    matrix, popcount ALL candidate pairs in one shot, then connected
    components by scatter-min label propagation. Only the final violation-row
    emit is distributed (broadcast flagged values → filter per batch).
    Beyond the driver bound, ``check_neardup_distributed`` runs the same
    algorithm as explode → hot-band prefilter → groupby(band_key) shuffles.
    """
    import ray
    import ray.data

    hmax, min_cluster = cfg.neardup_hamming_max, cfg.neardup_min_cluster

    # choose the path BEFORE collecting anything: row count bounds the
    # distinct-phash count, so the driver path is only entered when the
    # collect is provably bounded (round-1 red item: the old code
    # concatenated the full column first and guarded after)
    try:
        total_rows = ds.count()
    except Exception:
        total_rows = None
    if total_rows is None or total_rows > NEARDUP_DRIVER_MAX:
        return check_neardup_distributed(ds, cfg)

    # per-block unique partials (dups collapse before leaving the workers)
    def block_uniques(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch["phash"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"v": pa.array(v, pa.int64()),
                         "c": pa.array(c.astype(np.int64))})

    # to_pandas (one bulk transfer) — iter_batches has ~10x per-batch driver
    # overhead at this row count (measured round 2)
    part = ds.select_columns(["phash"]).map_batches(
        block_uniques, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if len(part):
        vals, inv = np.unique(part.v.to_numpy(), return_inverse=True)
        mult = np.zeros(vals.size, dtype=np.int64)
        np.add.at(mult, inv, part.c.to_numpy())
    else:
        vals, mult = np.empty(0, np.int64), np.empty(0, np.int64)

    bands = phash_bands(vals, 3)
    pair_a, pair_b = [], []
    for bcol in range(bands.shape[1]):
        keys = bands[:, bcol]
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        sizes = np.diff(np.r_[starts, sk.size])
        for m in np.unique(sizes):
            if m < 2:
                continue
            gsel = np.flatnonzero(sizes == m)
            mm = int(m)
            if mm > 1024:
                import logging

                logging.getLogger(__name__).warning(
                    "neardup: %d band groups capped %d → 1024", gsel.size, mm)
                mm = 1024
            mat = order[starts[gsel][:, None] + np.arange(mm)[None, :]]
            iu, ju = np.triu_indices(mm, 1)
            pair_a.append(mat[:, iu].ravel())
            pair_b.append(mat[:, ju].ravel())
    if pair_a:
        a = np.concatenate(pair_a)
        b = np.concatenate(pair_b)
        close = hamming_leq_pairs(vals, a, b, hmax)
        a, b = a[close], b[close]
    else:
        a = b = np.empty(0, np.int64)

    # connected components: shared scatter-min + pointer-jumping kernel
    labels = cc_labels(vals.size, a, b)
    csize = np.bincount(labels, weights=mult.astype(np.float64))
    flagged = csize[labels] >= min_cluster
    flag_vals = vals[flagged]
    flag_labels = labels[flagged]
    if flag_vals.size == 0:
        return ray.data.from_arrow(VIOLATION_SCHEMA.empty_table())
    # cluster rep = smallest phash value in the cluster (vals ascending ⇒
    # first occurrence per label); byte-stable across runs and parallelism
    rep_of: dict[int, int] = {}
    for v, l in zip(flag_vals.tolist(), flag_labels.tolist()):
        rep_of.setdefault(l, v)
    rep_str = np.array(
        ["cluster-%016x" % (v & 0xFFFFFFFFFFFFFFFF) for v in
         (rep_of[l] for l in flag_labels.tolist())], dtype=object)
    order2 = np.argsort(flag_vals, kind="stable")
    fv, fr = flag_vals[order2], rep_str[order2]
    wrapped = {"ref": ray.put((fv, fr))}

    def emit_violations(batch: pa.Table) -> pa.Table:
        # stateless task: the broadcast probe is a shared-memory zero-copy
        # ray.get per call (no actor spawn, scales with free CPUs and reuses
        # warm workers — a 2-actor pool ceiling cost ~2s of the commit tail)
        fv, fr = ray.get(wrapped["ref"])
        ph = batch["phash"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(fv, ph), fv.size - 1)
        mask = fv[pos] == ph
        hit = batch.filter(pa.array(mask))
        n = hit.num_rows
        if n == 0:
            return VIOLATION_SCHEMA.empty_table()
        reps = fr[pos[mask]]
        return pa.table({
            "partition_id": hit["partition_id"].cast(pa.int32()),
            "image_id": hit["image_id"],
            "check": pa.array(["neardup_phash"] * n),
            "column": pa.array(["phash"] * n),
            "observed": pa.array(reps.astype(str)),
            "expected": pa.array([f"hamming>{hmax}"] * n),
        }, schema=VIOLATION_SCHEMA)

    return ds.map_batches(emit_violations, batch_format="pyarrow",
                          zero_copy_batch=True)


def check_neardup_distributed(ds, cfg: EngineConfig) -> "ray.data.Dataset":  # noqa: F821
    """At-scale near-dup path: explode band keys → hot-band prefilter →
    groupby(band_key) verify — all-to-all only over candidate-bucket members.
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
        if m > 512:  # hot-band cap: flat/degenerate hashes; deterministic subset
            df = df.sort_values("image_id").head(512)
            m = len(df)
        ph = df["phash"].to_numpy()
        dist = phash_hamming(ph[:, None], ph[None, :])
        close = dist <= hamming_max
        # connected components over the close-pair edges (shared kernel)
        ii, jj = np.nonzero(np.triu(close, 1))
        labels = cc_labels(m, ii, jj)
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

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one salt bucket holds every row of its band keys — verify each band
        # segment in turn (bounded segment count per bucket; Ray charges
        # ~2 ms per map_groups GROUP, so the shuffle key is the fixed salt,
        # never the band key itself)
        outs = [
            verify_group(seg)
            for _, seg in df.groupby("band_key", sort=False)
        ]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else _empty()

    # Hot-band prefilter: almost every band bucket holds < min_cluster images,
    # so counting first and shuffling ONLY members of candidate buckets turns
    # the groupby from per-image-size to per-candidate-size. Counts stream to
    # the driver as (band_key, n) partials (≈ one row per distinct band per
    # block); at multi-node scale the same partials tree-reduce in tasks.
    # materialized: consumed twice (count pass + hot-filter pass); band rows
    # are ~40 B/image — tiny next to the bytes column that never enters here
    exploded = ds.map_batches(
        lambda b: _explode_bands(b, 3), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def band_counts(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch["band_key"].to_numpy(), return_counts=True)
        return pa.table({"band_key": pa.array(v), "n": pa.array(c.astype(np.int64))})

    # one bulk to_pandas transfer — iter_batches pays ~10x per-batch driver
    # overhead at this partial count (verify-skill note, measured round 2)
    part = exploded.map_batches(
        band_counts, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if not len(part):
        return ds.map_batches(lambda t: VIOLATION_SCHEMA.empty_table(),
                              batch_format="pyarrow")
    all_keys = part["band_key"].to_numpy()
    all_counts = part["n"].to_numpy()
    uniq_keys, inv = np.unique(all_keys, return_inverse=True)
    totals = np.zeros(uniq_keys.size, dtype=np.int64)
    np.add.at(totals, inv, all_counts)
    hot = np.sort(uniq_keys[totals >= min_cluster])

    import ray

    hot_wrapped = {"ref": ray.put(hot)}
    n_salt = 256

    def hot_filter(batch: pa.Table) -> pa.Table:
        # stateless task: shared-memory zero-copy ray.get of the hot-key
        # probe per call — no actor spawn, scales with free CPUs. Surviving
        # rows get a salt bucket of their band key so the verify shuffle has
        # a fixed group count.
        hotk = ray.get(hot_wrapped["ref"])
        k = batch["band_key"].to_numpy()
        pos = np.minimum(np.searchsorted(hotk, k), max(hotk.size - 1, 0))
        mask = hotk[pos] == k if hotk.size else np.zeros(k.size, bool)
        kept = batch.filter(pa.array(mask))
        salt = (hash64(kept["band_key"].to_numpy()) % n_salt).astype(np.int64)
        return kept.append_column("vbkt", pa.array(salt))

    hot_rows = exploded.map_batches(hot_filter, batch_format="pyarrow",
                                    zero_copy_batch=True)
    candidates = hot_rows.groupby("vbkt").map_groups(verify_bucket,
                                                     batch_format="pandas")

    def dedupe_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized first-per-image within the salt bucket (an image can be
        # flagged via several bands; keep the smallest cluster rep). numpy
        # mask, NOT .ne(.shift()): with pandas nullable string dtype the
        # first row's comparison is <NA>, which the boolean filter DROPS —
        # silently emptying the output
        d = df.sort_values(["image_id", "rep"], kind="mergesort")
        ids = d.image_id.to_numpy()
        first = np.r_[True, ids[1:] != ids[:-1]] if len(ids) else np.empty(0, bool)
        return d[first].drop(columns=["ibkt"])

    def add_id_bucket(batch: pa.Table) -> pa.Table:
        b = (hash64(batch["image_id"].to_numpy(zero_copy_only=False))
             % np.uint64(n_salt)).astype(np.int64)
        return batch.append_column("ibkt", pa.array(b))

    uniq = candidates.map_batches(add_id_bucket, batch_format="pyarrow"
                                  ).groupby("ibkt").map_groups(
        dedupe_bucket, batch_format="pandas")

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
