"""Similarity search over the ``embeddings`` table (``list<float>`` column).

Brute-force cosine top-k is the baseline: the query matrix is broadcast once
(``ray.put``) and every batch does one numpy matmul against it — the canonical
small-side-broadcast ANN shape. The LSH-bucketed variant is the scale path: a
random-hyperplane signature assigns each vector to a bucket so candidate sets
shrink from N to N/2^b per query (documented trade-off; exact top-k remains
the oracle-checked baseline).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64, probe_sorted
from ..functions.stats import median_heuristic_sigma, mmd_permutation_test
from .config import scratch_root
from .queries import _pa_from_pandas, _read, _read_blocked, _round

TOP_K = 10
N_QUERIES = 10


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def _query_matrix(sf_dir: str, with_label: bool = False):
    """(q_ids, L2-normalized query matrix[, labels]) for vec_id < N_QUERIES —
    the shared query-side load of every brute-force scan variant. The
    predicate pushes into the parquet read (row-group pruning), so the
    driver never materializes the corpus to pick out N_QUERIES rows."""
    import pyarrow.parquet as pq

    cols = ["vec_id", "embedding"] + (["label"] if with_label else [])
    qsel = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=cols,
                         filters=[("vec_id", "<", N_QUERIES)])
    if with_label:
        # SQL `n.label = q.label` is never true for a NULL query label, so
        # a null-label query contributes zero rows — drop it here instead
        # of casting NULL→garbage int
        qsel = qsel.filter(pa.compute.is_valid(qsel["label"]))
    q_ids = qsel["vec_id"].to_numpy().astype(np.int64)
    q = _normalize_rows(_to_matrix(qsel["embedding"]))
    if with_label:
        return q_ids, q, qsel["label"].to_numpy().astype(np.int64)
    return q_ids, q


def _merge_round_topk(partials, k: int = TOP_K):
    """Per-query exact merge of block partials under the strict
    (cos DESC, neighbor_id ASC) order, then the 1e-6 score rounding the
    oracles use — shared by every exact-scan variant."""
    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cos", "neighbor_id"],
                              ascending=[False, True]).head(k)

    out = partials.groupby("query_id").map_groups(merge_topk,
                                                  batch_format="pandas")

    def final_round(batch: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": batch["query_id"],
            "neighbor_id": batch["neighbor_id"],
            "cos": pa.array(_round(batch["cos"].to_numpy(), 6)),
        })

    return out.map_batches(final_round, batch_format="pyarrow")


def _topk_score(batch: pa.Table, wrapped, k: int,
                round6: bool = False) -> pa.Table:
    """Broadcast-task stage: the query matrix reads zero-copy from the
    object store per call; per batch one matmul + per-query partial top-k
    with the tie-exact (cos DESC, id ASC) block cut — a bare argpartition
    could drop the lower-id member of a cos tie at the boundary, which the
    downstream merge can never recover. ``round6`` ranks on the
    1e-6-rounded cosine instead (consumers whose DOWNSTREAM output depends
    on rank order — MMR, RRF — need rank stability across matmul shapes;
    the plain top-k ops keep raw scores, matching their oracles' raw-rank
    SQL). (Stateless tasks instead of a capped actor pool — the scan
    scales with free CPUs and reuses warm workers.)"""
    import ray

    q_ids, q = ray.get(wrapped["ref"])  # (m,), (m, d) L2-normalized
    ids = batch["vec_id"].to_numpy().astype(np.int64)
    x = _normalize_rows(_to_matrix(batch["embedding"]))
    cos = q @ x.T  # (m, n)
    if round6:
        cos = np.floor(cos * 1e6 + 0.5) / 1e6
    k = min(k, cos.shape[1])
    out_q, out_n, out_c = [], [], []
    for qi in range(cos.shape[0]):
        top = _topk_tiebreak_cut(cos[qi], ids, k)
        out_q.append(np.full(k, q_ids[qi], dtype=np.int64))
        out_n.append(ids[top])
        out_c.append(cos[qi][top])
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q)),
        "neighbor_id": pa.array(np.concatenate(out_n)),
        "cos": pa.array(np.concatenate(out_c), pa.float64()),
    })


def ann_topk_cosine(sf_dir: str):
    """Exact brute-force cosine top-k: per-batch partial top-k in broadcast
    tasks, then a per-query merge of the partials (k × n_blocks rows — tiny)."""
    import ray

    q_ids, q = _query_matrix(sf_dir)
    wrapped = {"ref": ray.put((q_ids, q))}

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])

    def corpus_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.greater_equal(batch["vec_id"], N_QUERIES))

    from functools import partial as _partial

    partials = ds.map_batches(corpus_only, batch_format="pyarrow", zero_copy_batch=True
                              ).map_batches(
        _partial(_topk_score, wrapped=wrapped, k=TOP_K), batch_format="pyarrow",
    )
    return _merge_round_topk(partials)


ANN_TOPK_SQL = f"""
SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
  FLOOR(list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[])*1000000+0.5)/1000000 AS cos
FROM embeddings q, embeddings n
WHERE q.vec_id < {N_QUERIES} AND n.vec_id >= {N_QUERIES}
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY q.vec_id
  ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) DESC,
           n.vec_id) <= {TOP_K}
"""


def ann_topk_filtered(sf_dir: str):
    """Predicate-constrained exact top-k (filtered vector search): each query
    retrieves its TOP_K nearest corpus neighbors AMONG rows satisfying the
    predicate — here "same label as the query", the metadata-filter shape
    every production vector store exposes. The filter applies DURING the
    scan (pre-filtering): post-filtering a plain top-k would return < k
    rows whenever the predicate is selective, the classic filtered-ANN bug.
    Same broadcast-scan / per-batch-partial-top-k shape as
    ``ann_topk_cosine`` with the per-query label mask folded into the score
    pass; at IVF scale the same mask drops into the probed-cell scorer."""
    import ray

    q_ids, q, q_labels = _query_matrix(sf_dir, with_label=True)
    wrapped = {"ref": ray.put((q_ids, q, q_labels))}

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def score_filtered(batch: pa.Table) -> pa.Table:
        qi_ids, qm, ql = ray.get(wrapped["ref"])
        # NULL corpus labels can never satisfy `n.label = q.label` —
        # exclude them with the same is_valid mask the SQL implies rather
        # than letting the int64 cast raise (or worse, fabricate a value)
        batch = batch.filter(pa.compute.and_(
            pa.compute.greater_equal(batch["vec_id"], N_QUERIES),
            pa.compute.is_valid(batch["label"])))
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        labels = batch["label"].to_numpy().astype(np.int64)
        x = _normalize_rows(_to_matrix(batch["embedding"]))
        cos = qm @ x.T  # (m, n)
        out_q, out_n, out_c = [], [], []
        for qi in range(cos.shape[0]):
            valid = np.flatnonzero(labels == ql[qi])
            if valid.size == 0:
                continue
            kk = min(TOP_K, valid.size)
            top = valid[_topk_tiebreak_cut(cos[qi, valid], ids[valid], kk)]
            out_q.append(np.full(kk, qi_ids[qi], dtype=np.int64))
            out_n.append(ids[top])
            out_c.append(cos[qi][top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "cos": pa.array(np.concatenate(out_c), pa.float64()),
        })

    partials = ds.map_batches(score_filtered, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _merge_round_topk(partials)


ANN_TOPK_FILTERED_SQL = f"""
SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
  FLOOR(list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[])*1000000+0.5)/1000000 AS cos
FROM embeddings q, embeddings n
WHERE q.vec_id < {N_QUERIES} AND n.vec_id >= {N_QUERIES} AND n.label = q.label
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY q.vec_id
  ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) DESC,
           n.vec_id) <= {TOP_K}
"""


LSH_TABLES = 3  # independent hash tables (banding): recall 1-(1-p^planes)^tables
LSH_PLANES = 4  # 16 buckets per table; ~3/16 of the corpus scanned per query
LSH_BUCKET_CAP = 4096  # max corpus rows scored per bucket (deterministic subset)
LSH_PROBES = 2  # multi-probe: per table, queries also probe the buckets with
#                 the 2 weakest-margin plane bits flipped (query-side only —
#                 corpus storage stays one row per table)


def _embedding_dim(sf_dir: str) -> int:
    """Vector width from the first row of the first row group — no full read."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = pf.read_row_group(0, columns=["embedding"])
    return len(first["embedding"][0])


def ann_lsh_bucketed(sf_dir: str, n_tables: int = LSH_TABLES,
                     n_planes: int = LSH_PLANES):
    """Scale-path ANN: multi-table random-hyperplane LSH.

    Each vector lands in one bucket per hash table (``n_tables`` rows through
    the shuffle); exact scoring happens only within (table, bucket) groups,
    capped at LSH_BUCKET_CAP corpus rows per bucket (deterministic
    smallest-hash subset, logged when it trips) so no group ever holds more
    than a bounded pandas frame. Per-query results merge across tables with
    neighbor dedup. Recall vs the exact baseline is measured in tests."""
    import ray

    from ..functions.hashing import splitmix64

    rng = np.random.Generator(np.random.PCG64(7))
    dim = _embedding_dim(sf_dir)
    planes = rng.normal(size=(n_tables, n_planes, dim))
    wrapped = {"ref": ray.put(planes)}

    def bucketize(batch: pa.Table) -> pa.Table:
        # stateless task: the plane tensor reads zero-copy from the object
        # store per call (no actor spawn, scales with free CPUs)
        planes = ray.get(wrapped["ref"])  # (t, p, d)
        x = _to_matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy()
        qmask = ids < N_QUERIES
        outs = []
        for t in range(n_tables):
            marg = x @ planes[t].T  # (n, p) signed margins
            bucket = ((marg > 0) @ (1 << np.arange(n_planes))).astype(np.int64)
            tshift = np.int64(t) << np.int64(n_planes)
            outs.append(pa.table({
                "vec_id": batch["vec_id"],
                "tbucket": pa.array(tshift | bucket),
                "embedding": batch["embedding"],
            }))
            # multi-probe, query side only: also emit the query into the
            # buckets reached by flipping its weakest-|margin| planes —
            # the true neighbor most often sits just across the closest
            # hyperplane. Corpus rows stay single-bucket per table, so
            # storage/shuffle volume is unchanged at corpus scale.
            if qmask.any() and LSH_PROBES:
                qb = bucket[qmask]
                order = np.argsort(np.abs(marg[qmask]), axis=1)[:, :LSH_PROBES]
                qtab = batch.filter(pa.array(qmask))
                for j in range(min(LSH_PROBES, n_planes)):
                    flipped = qb ^ (np.int64(1) << order[:, j].astype(np.int64))
                    outs.append(pa.table({
                        "vec_id": qtab["vec_id"],
                        "tbucket": pa.array(tshift | flipped),
                        "embedding": qtab["embedding"],
                    }))
        return pa.concat_tables(outs)

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])
    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def within_bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                              "neighbor_id": pd.array([], dtype="int64"),
                              "cos": pd.array([], dtype="float64")})
        ids = df.vec_id.to_numpy()
        qsel = ids < N_QUERIES
        if not qsel.any() or qsel.all():
            return empty
        corpus = np.flatnonzero(~qsel)
        if corpus.size > LSH_BUCKET_CAP:
            import logging

            logging.getLogger(__name__).warning(
                "hot LSH bucket (%d rows): scoring deterministic %d-subset",
                corpus.size, LSH_BUCKET_CAP)
            h = splitmix64(ids[corpus].astype(np.uint64))
            corpus = corpus[np.argsort(h, kind="stable")[:LSH_BUCKET_CAP]]
        x = np.stack(df.embedding.to_numpy())
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cos = x[qsel] @ x[corpus].T  # (nq, nc)
        k = min(TOP_K, corpus.size)
        cids = ids[corpus]
        qids = ids[qsel]
        out_q, out_n, out_c = [], [], []
        for qi in range(qids.size):
            top = np.argpartition(-cos[qi], k - 1)[:k]
            out_q.append(np.full(k, qids[qi], dtype=np.int64))
            out_n.append(cids[top].astype(np.int64))
            out_c.append(cos[qi][top])
        return pd.DataFrame({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "cos": np.concatenate(out_c),
        })

    partials = bucketed.groupby("tbucket").map_groups(
        within_bucket_topk, batch_format="pandas")

    def merge_tables(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("neighbor_id")
        df = df.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(TOP_K)
        return pd.DataFrame({
            "query_id": df.query_id.to_numpy(),
            "neighbor_id": df.neighbor_id.to_numpy(),
            "cos": _round(df.cos.to_numpy(), 6),
        })

    return partials.groupby("query_id").map_groups(merge_tables, batch_format="pandas")


MMD_SAMPLE_CAP = 2048  # per-side deterministic sample bound for the MMD test


def mmd_embeddings_drift(sf_dir: str):
    """MMD+permutation two-sample tests on the embeddings table:
    (a) null — even vs odd vec_id; (b) drift — second half affinely shifted.

    Each side is bounded by a deterministic smallest-hash sample
    (splitmix64(vec_id), cap MMD_SAMPLE_CAP): per-block partial samples stream
    to the driver, which keeps the global smallest — never the full column
    (the image path's sampling scheme, stages/featurize.py). Stable under any
    block layout / parallelism."""
    from ..functions.hashing import splitmix64

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])
    cap = MMD_SAMPLE_CAP

    def partial_sample(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        keys = splitmix64(ids.astype(np.uint64))
        even = ids % 2 == 0
        parts = []
        for grp, sel in (("even", even), ("odd", ~even)):
            idx = np.flatnonzero(sel)
            if not idx.size:
                continue
            order = np.argsort(keys[idx], kind="stable")[:cap]
            take = idx[order]
            sub = batch.take(pa.array(take))
            parts.append(pa.table({
                "grp": pa.array([grp] * take.size),
                "key": pa.array(keys[take].astype(np.int64)),
                "embedding": sub["embedding"],
            }))
        if not parts:
            return pa.table({"grp": pa.array([], pa.string()),
                             "key": pa.array([], pa.int64()),
                             "embedding": batch["embedding"].slice(0, 0)})
        return pa.concat_tables(parts)

    sampled = ds.map_batches(partial_sample, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()

    def side(grp: str) -> np.ndarray:
        sub = sampled[sampled.grp == grp]
        # uint64 keys compare identically as int64 views here only within a
        # block; re-sort on the unsigned view for the global smallest-cap
        order = np.argsort(sub.key.to_numpy().astype(np.uint64), kind="stable")[:cap]
        return np.stack(sub.embedding.to_numpy()[order]).astype(np.float64)

    even, odd = side("even"), side("odd")
    sigma = median_heuristic_sigma(even)
    d_null, p_null = mmd_permutation_test(even, odd, sigma, 100, seed=31)
    shifted = odd * 1.3 + 0.5
    d_shift, p_shift = mmd_permutation_test(even, shifted, sigma, 100, seed=31)
    return pa.Table.from_pylist([
        {"case": "null_even_vs_odd", "mmd2": float(_round(d_null, 8)),
         "p_value": float(_round(p_null, 6)), "is_drift": bool(p_null <= 0.01)},
        {"case": "shifted_odd", "mmd2": float(_round(d_shift, 8)),
         "p_value": float(_round(p_shift, 6)), "is_drift": bool(p_shift <= 0.01)},
    ])


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs — the vector-space sibling of the
# text MinHash near-dup (task list: "embedding-cosine near-dup")
# ---------------------------------------------------------------------------

NEARDUP_COS_TAU = 0.4  # synthetic embeddings are near-orthogonal; max pair cos ~0.51
NEARDUP_BROADCAST_MAX_DOCS = 200_000  # corpus matrix broadcast gate (~50 MB @64d)
NEARDUP_LSH_TABLES = 12   # recall dial: 1-(1-p^planes)^tables; at cos=0.4
#                           (p≈0.63/plane) 4 planes x 12 tables ≈ 0.87 recall
NEARDUP_BUCKET_CAP = 8192  # max rows scored per (table, bucket) group
_NEARDUP_CHUNK = 1024      # within-bucket matmul row-chunk (64 MB peak @cap)


def _neardup_pairs_lsh(sf_dir: str, tau: float,
                       n_tables: int = NEARDUP_LSH_TABLES,
                       n_planes: int | None = None):
    """Above-gate scale path for embedding near-dup pairs: multi-table
    random-hyperplane LSH candidate generation with an exact within-bucket
    verify — APPROXIMATE (recall 1-(1-p^planes)^tables per pair; precision
    1.0 because every emitted pair carries its exact cosine).

    Partitioning: each vector lands in ONE bucket per table, so the shuffle
    ships n_tables copies of the corpus (the standard LSH space/recall
    trade: scoring inside the bucket needs the vectors there; shipping
    id-only candidates would force a second embedding-attach join). The
    plane count is a bucket-size dial that grows with the corpus
    (~2k expected rows/bucket) so the within-bucket all-pairs stays a
    bounded matmul at any scale; hot buckets beyond NEARDUP_BUCKET_CAP are
    scored on a deterministic smallest-hash subset with a logged warning.
    Duplicate candidates across tables are dropped by a salted pair-hash
    groupby (rounded-cos max — deterministic) BEFORE any driver contact;
    nothing ever collects driver-side."""
    import pyarrow.parquet as pq
    import ray

    from ..functions.hashing import splitmix64
    from .queries import _salt_buckets

    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if n_planes is None:
        # ~2k expected rows per (table, bucket): within-bucket all-pairs is
        # then ~4M dot products regardless of corpus size
        n_planes = max(4, int(np.ceil(np.log2(max(n_rows, 1) / 2048 + 2))))
    dim = _embedding_dim(sf_dir)
    rng = np.random.Generator(np.random.PCG64(23))
    planes = rng.normal(size=(n_tables, n_planes, dim))
    wrapped = {"ref": ray.put(planes)}

    def bucketize(batch: pa.Table) -> pa.Table:
        # stateless task: plane tensor reads zero-copy per call
        pl = ray.get(wrapped["ref"])  # (t, p, d)
        x = _to_matrix(batch["embedding"])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        shifts = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        outs = []
        for t in range(n_tables):
            bucket = ((x @ pl[t].T) > 0) @ shifts
            outs.append(pa.table({
                "vec_id": batch["vec_id"],
                "tbucket": pa.array((np.int64(t) << np.int64(n_planes))
                                    | bucket.astype(np.int64)),
                "embedding": batch["embedding"],
            }))
        return pa.concat_tables(outs)

    _EMPTY = pd.DataFrame({"vec_a": pd.array([], dtype="int64"),
                           "vec_b": pd.array([], dtype="int64"),
                           "cos": pd.array([], dtype="float64")})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df.vec_id.to_numpy().astype(np.int64)
        if ids.size < 2:
            return _EMPTY
        if ids.size > NEARDUP_BUCKET_CAP:
            import logging

            logging.getLogger(__name__).warning(
                "hot near-dup LSH bucket (%d rows): scoring deterministic "
                "%d-subset", ids.size, NEARDUP_BUCKET_CAP)
            h = splitmix64(ids.astype(np.uint64))
            keep = np.argsort(h, kind="stable")[:NEARDUP_BUCKET_CAP]
            df = df.iloc[np.sort(keep)]
            ids = df.vec_id.to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        x = np.stack(df.embedding.to_numpy()[order])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        out_a, out_b, out_c = [], [], []
        # row-chunked upper-triangle scan: peak memory chunk x n, never n^2
        for lo in range(0, ids.size - 1, _NEARDUP_CHUNK):
            hi = min(lo + _NEARDUP_CHUNK, ids.size)
            cos = x[lo:hi] @ x[lo + 1:].T  # cols are global lo+1..n
            rr, cc = np.nonzero(cos >= tau)
            gi, gj = rr + lo, cc + lo + 1
            keep = gj > gi  # strict upper triangle (ids sorted => id_i < id_j)
            if keep.any():
                out_a.append(ids[gi[keep]])
                out_b.append(ids[gj[keep]])
                out_c.append(_round(cos[rr[keep], cc[keep]], 6))
        if not out_a:
            return _EMPTY
        return pd.DataFrame({"vec_a": np.concatenate(out_a),
                             "vec_b": np.concatenate(out_b),
                             "cos": np.concatenate(out_c)})

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])
    cands = (ds.map_batches(bucketize, batch_format="pyarrow")
             .groupby("tbucket").map_groups(bucket_pairs, batch_format="pandas"))

    # distinct across tables: salted pair-hash buckets, rounded-cos max per
    # pair (cross-bucket matmuls may differ in the last ulp pre-rounding)
    nb = _salt_buckets(sf_dir, "embeddings")

    def tag_pair(batch: pa.Table) -> pa.Table:
        a = batch["vec_a"].to_numpy().astype(np.uint64)
        b = batch["vec_b"].to_numpy().astype(np.uint64)
        h = splitmix64(splitmix64(a) * np.uint64(31) + splitmix64(b))
        return batch.append_column(
            "pbkt", pa.array((h % np.uint64(nb)).astype(np.int64)))

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["vec_a", "vec_b"], sort=False)["cos"].max().reset_index()
        return pd.DataFrame({"vec_a": g.vec_a.to_numpy().astype(np.int64),
                             "vec_b": g.vec_b.to_numpy().astype(np.int64),
                             "cos": g.cos.to_numpy().astype(np.float64)})

    return (cands.map_batches(tag_pair, batch_format="pyarrow")
            .groupby("pbkt").map_groups(dedup_pairs, batch_format="pandas"))


def embedding_neardup_pairs(sf_dir: str, tau: float = NEARDUP_COS_TAU,
                            max_broadcast_docs: int | None = None):
    """All pairs (i < j) with cosine similarity >= tau.

    Exact path: the L2-normalized corpus matrix is broadcast once (ray.put)
    when the table is provably small (parquet metadata count); each batch
    does one matmul against it and emits its rows' qualifying pairs — a
    block-nested-loop join that streams the left side. Beyond the gate the
    call routes to the LSH-bucketed candidate generator with a within-bucket
    exact verify (_neardup_pairs_lsh) — documented-approximate (recall dial
    in its docstring; precision stays 1.0), so the exact variant below the
    gate stays the oracle anchor (EMB_NEARDUP_SQL)."""
    import pyarrow.parquet as pq
    import ray

    if max_broadcast_docs is None:  # read at call time so tests can regate
        max_broadcast_docs = NEARDUP_BROADCAST_MAX_DOCS
    n_docs = _read(sf_dir, "embeddings", ["vec_id"]).count()  # metadata-only
    if n_docs > max_broadcast_docs:
        return _neardup_pairs_lsh(sf_dir, tau)

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    corpus_ids = qt["vec_id"].to_numpy().astype(np.int64)
    corpus = _to_matrix(qt["embedding"])
    corpus = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
    wrapped = {"ref": ray.put((corpus_ids, corpus))}

    def pair_emit(batch: pa.Table) -> pa.Table:
        # broadcast task: corpus matrix reads zero-copy per call
        cids, m = ray.get(wrapped["ref"])
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        x = _to_matrix(batch["embedding"])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cos = x @ m.T  # (b, N)
        hit = cos >= tau
        # keep i < j only: each unordered pair emitted exactly once
        hit &= ids[:, None] < cids[None, :]
        bi, cj = np.nonzero(hit)
        return pa.table({
            "vec_a": pa.array(ids[bi]),
            "vec_b": pa.array(cids[cj]),
            "cos": pa.array(_round(cos[bi, cj], 6)),
        })

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ds.map_batches(pair_emit, batch_format="pyarrow")


EMB_NEARDUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  FLOOR(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        * 1000000 + 0.5) / 1000000 AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= {NEARDUP_COS_TAU}
"""


# ---------------------------------------------------------------------------
# Semantic (embedding-cosine) dedup — connected components over the near-dup
# pair graph, keep the min vec_id per component (task list: "embedding-cosine
# near-dup" as a *dedup* method, completing exact/MinHash/SimHash/n-gram)
# ---------------------------------------------------------------------------

EMB_CC_MAX_PAIRS = 20_000_000  # driver CC gate (~320 MB of edge arrays)
def _cc_bkt(x: np.ndarray, n_buckets: int) -> np.ndarray:
    from ..functions.hashing import splitmix64

    return (splitmix64(x.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)


def cc_labels_distributed(pairs_ds, max_rounds: int = 64):
    """Distributed connected components over a pair Dataset (vec_a, vec_b):
    thin column-rename delegate to the shared arrow-exact kernel
    (functions/graph.cc_min_label_distributed — Pregel-style min-label
    propagation + pointer jumping, O(log n) rounds, pyarrow bucket merges
    with numpy searchsorted joins so full-range int64 node ids never
    round-trip through pandas float64; this path previously carried its own
    pandas kernel with a hard 2^53 id limit).

    Returns a (node, lab) Dataset covering every node that appears in an
    edge; isolated nodes are absent (callers treat them as singletons)."""
    from ..functions.graph import cc_min_label_distributed

    renamed = pairs_ds.map_batches(
        lambda b: pa.table({"va": b["vec_a"].cast(pa.int64()),
                            "vb": b["vec_b"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return cc_min_label_distributed(renamed, max_rounds=max_rounds)


def dedup_semantic_embeddings(sf_dir: str, tau: float = NEARDUP_COS_TAU):
    """Embedding-cosine near-dup dedup: one surviving row per connected
    component of the cosine>=tau pair graph (survivor = min vec_id), with the
    component size attached (singletons survive with cluster_size=1).

    Scale shape: the pair graph is the *duplicate* mass, orders of magnitude
    smaller than the corpus at a real tau — pairs stream from the distributed
    emitter and only the edge list (2 int64/pair, gated at EMB_CC_MAX_PAIRS)
    lands on the driver for the CC solve; survivors are then emitted by a
    distributed filter against the broadcast dropped-id set. Above the pair
    gate the CC itself runs distributed (cc_labels_distributed). Above the
    CORPUS gate (NEARDUP_BROADCAST_MAX_DOCS) the pair emitter routes to the
    LSH-bucketed candidate generator + within-bucket exact verify
    (_neardup_pairs_lsh) — documented-approximate edges; the plumbing
    downstream of the pair Dataset is generator-agnostic."""
    import ray

    from ..functions.graph import cc_min_label

    pairs = embedding_neardup_pairs(sf_dir, tau).select_columns(["vec_a", "vec_b"])
    # gate BEFORE the driver collect: the edge list stays distributed in the
    # object store (materialize), the count is metadata, and only a
    # passing-size edge list is ever pulled down; larger graphs solve CC
    # distributedly instead
    pairs = pairs.materialize()
    if pairs.count() > EMB_CC_MAX_PAIRS:
        return _dedup_semantic_distributed(sf_dir, pairs)
    edges = pairs.to_pandas()
    if len(edges):
        nodes, reps = cc_min_label(edges["vec_a"].to_numpy(np.int64),
                                   edges["vec_b"].to_numpy(np.int64))
        dropped = np.sort(nodes[reps != nodes])
        rep_ids, sizes = np.unique(reps, return_counts=True)
    else:
        dropped = np.empty(0, dtype=np.int64)
        rep_ids, sizes = dropped, np.empty(0, dtype=np.int64)
    wrapped = {"ref": ray.put((dropped, rep_ids, sizes.astype(np.int64)))}

    def survivors(batch: pa.Table) -> pa.Table:
        drop, rids, rsz = ray.get(wrapped["ref"])
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        keep = ~np.isin(ids, drop, assume_unique=False)
        kept = ids[keep]
        size = np.ones(kept.size, dtype=np.int64)
        if rids.size:
            pos = np.searchsorted(rids, kept)
            inb = pos < rids.size
            hit = inb.copy()
            hit[inb] = rids[pos[inb]] == kept[inb]
            size[hit] = rsz[pos[hit]]
        return pa.table({"vec_id": pa.array(kept), "cluster_size": pa.array(size)})

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id"])
    return ds.map_batches(survivors, batch_format="pyarrow")


# transitive closure via min-label reachability: walk(node, rep) holds every
# (node, rep-candidate) pair along undirected edges; MIN(rep) per node is the
# component representative, survivors are their own rep
def _dedup_semantic_distributed(sf_dir: str, pairs_ds):
    """At-scale semantic dedup: connected components solved distributedly
    (cc_labels_distributed), survivors + cluster sizes assembled with two
    more salted-bucket passes — no driver collect anywhere.

    1. bucket the (node, lab) labels by hash(lab): every member of a
       component lands in one bucket, so the bucket emits (rep=lab,
       cluster_size=count) directly;
    2. singletons (vec_ids in no edge) come from a bucketed anti-join of
       the embeddings id column against the labeled nodes."""
    from .queries import _salt_buckets

    nb = _salt_buckets(sf_dir, "embeddings")
    labels = cc_labels_distributed(pairs_ds)

    def tag_by_lab(batch: pa.Table) -> pa.Table:
        lab = batch["lab"].to_numpy().astype(np.int64)
        return pa.table({"lab": pa.array(lab), "lbkt": pa.array(_cc_bkt(lab, nb))})

    def per_lab(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lab", sort=False).size()
        return pd.DataFrame({"vec_id": g.index.to_numpy().astype(np.int64),
                             "cluster_size": g.to_numpy().astype(np.int64)})

    graph_survivors = (labels.map_batches(tag_by_lab, batch_format="pyarrow")
                       .groupby("lbkt").map_groups(per_lab, batch_format="pandas"))

    def tag_ids(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        return pa.table({"vec_id": pa.array(ids),
                         "is_node": pa.array(np.zeros(ids.size, np.int64)),
                         "abkt": pa.array(_cc_bkt(ids, nb))})

    def tag_nodes(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy().astype(np.int64)
        return pa.table({"vec_id": pa.array(n),
                         "is_node": pa.array(np.ones(n.size, np.int64)),
                         "abkt": pa.array(_cc_bkt(n, nb))})

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df.loc[df.is_node == 1, "vec_id"].to_numpy()
        ids = df.loc[df.is_node == 0, "vec_id"].to_numpy()
        single = ids[~np.isin(ids, nodes)]
        return pd.DataFrame({"vec_id": single.astype(np.int64),
                             "cluster_size": np.ones(single.size, np.int64)})

    ids_ds = _read_blocked(sf_dir, "embeddings", ["vec_id"]).map_batches(
        tag_ids, batch_format="pyarrow", zero_copy_batch=True)
    nodes_ds = labels.map_batches(tag_nodes, batch_format="pyarrow")
    singles = (ids_ds.union(nodes_ds).groupby("abkt")
               .map_groups(anti, batch_format="pandas"))
    return graph_survivors.union(singles)


DEDUP_SEMANTIC_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= {NEARDUP_COS_TAU}
), edges AS (
  SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs
), walk(node, rep) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.v AS node, w.rep FROM walk w JOIN edges e ON e.u = w.node
), label AS (
  SELECT node, MIN(rep) AS rep FROM walk GROUP BY node
), sizes AS (
  SELECT rep, COUNT(*)::BIGINT AS cluster_size FROM label GROUP BY rep
)
SELECT l.node AS vec_id, s.cluster_size
FROM label l JOIN sizes s ON s.rep = l.rep
WHERE l.rep = l.node
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-partitioned scale path: train k-means
# cells on a bounded deterministic sample, assign each corpus vector to ONE
# cell (single shuffle key), probe only nprobe cells per query.
# ---------------------------------------------------------------------------

IVF_N_CELLS = 32
IVF_NPROBE = 8  # 25% of cells scanned; measured recall 0.61 at sf0.01
#                 (0.52 at 6, 0.70 at 10 — the knob is the recall/cost dial)
IVF_TRAIN_CAP = 4096     # k-means training sample bound (smallest-hash keys)
IVF_KMEANS_ITERS = 10


def _spherical_kmeans(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded spherical k-means on L2-normalized rows; returns (k, d)
    normalized centroids. Deterministic: init = k distinct rows by index."""
    rng = np.random.Generator(np.random.PCG64(seed))
    init = rng.choice(x.shape[0], size=min(k, x.shape[0]), replace=False)
    c = x[np.sort(init)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(c.shape[0]):
            members = x[assign == j]
            if members.shape[0]:
                m = members.sum(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


_TRAINED_CACHE: dict = {}  # (kind, sf fingerprint, params) → artifact


def _trained_artifact(kind: str, sf_dir: str, params: tuple, build):
    """In-process memo for deterministically-trained ANN artifacts
    (IVF centroids, PQ codebooks) keyed by source content fingerprint —
    the _BPE_MERGE_CACHE pattern: one 161-query sweep calls the PQ trainer
    from four ops and would otherwise pay three redundant corpus sample
    scans + k-means fits for bit-identical results (deterministic seed +
    deterministic smallest-hash sample)."""
    st = os.stat(f"{sf_dir}/embeddings.parquet")
    src = (sf_dir, st.st_size, st.st_mtime_ns)
    key = (kind, src, params)
    art = _TRAINED_CACHE.get(key)
    if art is None:
        art = build()
        # one live CORPUS at a time (no leak across regenerated fixtures),
        # but keep sibling kinds for the same corpus — a sweep alternates
        # ivf and pq artifacts and cross-kind eviction would thrash them
        for k in [k for k in _TRAINED_CACHE if k[1] != src]:
            del _TRAINED_CACHE[k]
        _TRAINED_CACHE[key] = art
    return art


def _bounded_sample_matrix(sf_dir: str, cap: int) -> np.ndarray:
    """Bounded deterministic training sample, shared by the IVF and PQ
    trainers (ONE implementation, so 'same sample' stays structural):
    per-block smallest-splitmix64(vec_id) partials → driver re-cap →
    L2-normalized (cap, d) float64 matrix. Order-free and resume-stable."""
    from ..functions.hashing import splitmix64

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])

    def train_sample(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        keys = splitmix64(ids.astype(np.uint64))
        order = np.argsort(keys, kind="stable")[:cap]
        sub = batch.take(pa.array(order))
        return pa.table({"key": pa.array(keys[order].astype(np.int64)),
                         "embedding": sub["embedding"]})

    sampled = ds.map_batches(train_sample, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    order = np.argsort(sampled.key.to_numpy().astype(np.uint64),
                       kind="stable")[:cap]
    train = np.stack(sampled.embedding.to_numpy()[order]).astype(np.float64)
    return _normalize_rows(train)


def _ivf_train_centroids(sf_dir: str, n_cells: int) -> np.ndarray:
    """Shared IVF training pass: bounded deterministic sample → seeded
    spherical k-means. Single source of truth for the in-flight
    (ann_ivf_cosine), persistent (build_ivf_index) and IVF×PQ paths so
    their centroids stay identical; memoized per source fingerprint."""
    return _trained_artifact(
        "ivf", sf_dir, (n_cells, IVF_KMEANS_ITERS),
        lambda: _spherical_kmeans(_bounded_sample_matrix(sf_dir, IVF_TRAIN_CAP),
                                  n_cells, IVF_KMEANS_ITERS, seed=11))


def _merge_cell_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Per-query merge of within-cell top-k partials (dedup, re-rank,
    head-k). Shared by the in-flight and persistent IVF paths."""
    df = df.drop_duplicates("neighbor_id")
    df = df.sort_values(["cos", "neighbor_id"],
                        ascending=[False, True]).head(TOP_K)
    return pd.DataFrame({"query_id": df.query_id.to_numpy(),
                         "neighbor_id": df.neighbor_id.to_numpy(),
                         "cos": _round(df.cos.to_numpy(), 6)})


def ann_ivf_cosine(sf_dir: str, n_cells: int = IVF_N_CELLS,
                   nprobe: int = IVF_NPROBE):
    """IVF ANN over the embeddings table.

    Train: per-block deterministic smallest-hash sample partials -> driver
    k-means over <= IVF_TRAIN_CAP rows (bounded regardless of table size).
    Index: broadcast centroids; one actor-pool pass assigns each corpus row to
    its nearest cell (1 row through the shuffle) and each query to its nprobe
    nearest cells (nprobe rows). Search: exact cosine only within (cell)
    groups, then the per-query dedup merge. Recall vs the exact baseline is
    pinned in tests; exact top-k stays the oracle anchor."""
    import ray

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids = _ivf_train_centroids(sf_dir, n_cells)
    wrapped = {"ref": ray.put(centroids)}

    def assign_cells(batch: pa.Table) -> pa.Table:
        # broadcast task: centroid matrix reads zero-copy per call
        c = ray.get(wrapped["ref"])  # (k, d) normalized
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        x = _to_matrix(batch["embedding"])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sim = x @ c.T  # (n, k)
        is_q = ids < N_QUERIES
        outs = []
        if (~is_q).any():
            sub = pa.array(np.flatnonzero(~is_q))
            outs.append(pa.table({
                "cell": pa.array(np.argmax(sim[~is_q], axis=1).astype(np.int64)),
                "vec_id": batch["vec_id"].take(sub),
                "embedding": batch["embedding"].take(sub),
            }))
        if is_q.any():
            qrows = np.flatnonzero(is_q)
            p = min(nprobe, sim.shape[1])
            probes = np.argpartition(-sim[is_q], p - 1, axis=1)[:, :p]  # (nq, p)
            rep = np.repeat(qrows, p)
            outs.append(pa.table({
                "cell": pa.array(probes.ravel().astype(np.int64)),
                "vec_id": batch["vec_id"].take(pa.array(rep)),
                "embedding": batch["embedding"].take(pa.array(rep)),
            }))
        if not outs:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "vec_id": batch["vec_id"].slice(0, 0),
                             "embedding": batch["embedding"].slice(0, 0)})
        return pa.concat_tables(outs)

    assigned = ds.map_batches(assign_cells, batch_format="pyarrow")

    def within_cell_topk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                              "neighbor_id": pd.array([], dtype="int64"),
                              "cos": pd.array([], dtype="float64")})
        ids = df.vec_id.to_numpy()
        qsel = ids < N_QUERIES
        if not qsel.any() or qsel.all():
            return empty
        x = np.stack(df.embedding.to_numpy())
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        corpus = np.flatnonzero(~qsel)
        cos = x[qsel] @ x[corpus].T
        k = min(TOP_K, corpus.size)
        cids, qids = ids[corpus], ids[qsel]
        out_q, out_n, out_c = [], [], []
        for qi in range(qids.size):
            top = np.argpartition(-cos[qi], k - 1)[:k]
            out_q.append(np.full(k, qids[qi], dtype=np.int64))
            out_n.append(cids[top].astype(np.int64))
            out_c.append(cos[qi][top])
        return pd.DataFrame({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "cos": np.concatenate(out_c),
        })

    partials = assigned.groupby("cell").map_groups(
        within_cell_topk, batch_format="pandas")

    return partials.groupby("query_id").map_groups(
        _merge_cell_partials, batch_format="pandas")


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means — the canonical iterative broadcast + partial
# aggregate (the IVF trainer above is driver-side over a bounded sample; this
# one never collects the points).
# ---------------------------------------------------------------------------


def _kmeans_rounds(sf_dir: str, k: int, iters: int):
    """Run distributed Lloyd's k-means; returns (per-round inertia list,
    final per-cluster DataFrame).

    Per round the centroid matrix is broadcast (``ray.put``) and every batch
    emits k partial rows (count, sum-vector, within-cluster SS) — the only
    data moving per round is k x n_blocks tiny rows; points never shuffle.
    Init is deterministic: the k corpus rows with the smallest
    splitmix64(vec_id) keys (order-free, resume-stable). The projected
    (vec_id, embedding) dataset is materialized once so ``iters`` passes
    don't re-read parquet; the object store spills it when it outgrows
    memory (at extreme scale swap for per-round re-reads)."""
    import ray

    from ..functions.hashing import splitmix64

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    def seed_sample(batch: pa.Table) -> pa.Table:
        keys = splitmix64(batch["vec_id"].to_numpy().astype(np.uint64))
        order = np.argsort(keys, kind="stable")[:k]
        sub = batch.take(pa.array(order))
        return pa.table({"key": pa.array(keys[order].astype(np.int64)),
                         "embedding": sub["embedding"]})

    seeds = ds.map_batches(seed_sample, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    order = np.argsort(seeds.key.to_numpy().astype(np.uint64), kind="stable")[:k]
    centroids = np.stack(seeds.embedding.to_numpy()[order]).astype(np.float64)
    k = len(centroids)  # corpora smaller than k yield k' = n clusters

    history = []
    final = None
    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)  # (k, d), zero-copy from the object store
            x = _to_matrix(batch["embedding"])
            d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
                  + (c * c).sum(1)[None, :])
            a = d2.argmin(1)
            best = d2[np.arange(len(x)), a]
            counts = np.bincount(a, minlength=k).astype(np.int64)
            wss = np.bincount(a, weights=best, minlength=k)
            sums = np.zeros_like(c)
            for j in range(k):  # k is small; the inner work is vectorized
                sums[j] = x[a == j].sum(axis=0)
            return pa.table({"cluster_id": pa.array(np.arange(k, dtype=np.int64)),
                             "n_points": pa.array(counts),
                             "wss": pa.array(wss, pa.float64()),
                             "vsum": pa.array(list(sums))})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        g = parts.groupby("cluster_id", sort=True)
        counts = g.n_points.sum().to_numpy()
        wss = g.wss.sum().to_numpy()
        vsums = np.stack(g.vsum.apply(lambda vs: np.sum(np.stack(vs), axis=0)))
        nonempty = counts > 0
        centroids = np.where(nonempty[:, None],
                             vsums / np.maximum(counts, 1)[:, None], centroids)
        history.append(float(wss.sum()))
        final = pd.DataFrame({"cluster_id": np.arange(k, dtype=np.int64),
                              "n_points": counts.astype(np.int64),
                              "wss": _round(wss, 4)})
    return history, final


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5):
    """Distributed k-means cluster summary (rows-only: iterative, no SQL
    equivalent). Determinism, monotone inertia, and parity with a pure-numpy
    Lloyd run are pinned in tests."""
    _, final = _kmeans_rounds(sf_dir, k, iters)
    return _pa_from_pandas(final, preserve_index=False)


# ---------------------------------------------------------------------------
# Persistent IVF index — the build-once / query-many scale path. The build
# writes centroids + a cell-partitioned hive layout; queries read ONLY the
# probed cells' files (storage-level pruning, the disk analogue of the
# in-flight cell groupby above). At 10^12 rows the index build is the one
# full-table pass; every subsequent query touches nprobe/n_cells of the
# bytes.
# ---------------------------------------------------------------------------


def build_ivf_index(sf_dir: str, index_dir: str,
                    n_cells: int = IVF_N_CELLS,
                    centroids: np.ndarray | None = None) -> dict:
    """Build (or reuse) the on-disk IVF index for the embeddings table.

    Layout: ``index_dir/meta.json`` (centroids + source fingerprint + the
    MANIFEST of cell files — queries read only manifest-listed files, so
    half-appended orphans are invisible), ``index_dir/cells/cell=NN/
    *.parquet`` (corpus rows hive-partitioned by nearest-centroid cell).
    Crash-safe: cells land under a tmp dir first and the meta.json write
    publishes the index last; a stale/partial build (fingerprint mismatch
    or missing meta) is rebuilt. ``centroids`` skips training (the append
    path and parity tests hand frozen centroids in)."""
    import json

    import ray

    import pyarrow.parquet as pq_

    # content fingerprint: rows + file size + mtime of the source parquet.
    # Row count alone is NOT enough — a regenerated fixture with the same
    # scale factor keeps num_rows but changes content, and serving the old
    # cells would silently return wrong neighbors.
    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    n_rows = pq_.ParquetFile(src).metadata.num_rows
    fingerprint = f"{n_rows}:{st.st_size}:{st.st_mtime_ns}"
    if centroids is not None:
        # explicit centroids are part of the index identity: without this a
        # later call handing in DIFFERENT frozen centroids would hit the
        # source-only fingerprint and silently get cells assigned under the
        # cached build's centroids — wrong nearest-cell routing, no error
        import hashlib

        carr = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
        fingerprint += ":c" + hashlib.sha256(carr.tobytes()).hexdigest()[:16]
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if (meta.get("fingerprint") == fingerprint
                and meta.get("sf_dir") == sf_dir
                and "files" in meta):  # pre-manifest layouts rebuild
            return meta

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])
    if centroids is None:
        centroids = _ivf_train_centroids(sf_dir, n_cells)

    cells_tmp = os.path.join(index_dir, "cells.tmp")
    cells_dir = os.path.join(index_dir, "cells")
    import shutil

    shutil.rmtree(cells_tmp, ignore_errors=True)
    shutil.rmtree(cells_dir, ignore_errors=True)
    os.makedirs(cells_tmp, exist_ok=True)
    ds.map_batches(_cell_assigner(centroids), batch_format="pyarrow",
                   zero_copy_batch=True).repartition(n_cells).write_parquet(
        cells_tmp, partition_cols=["cell"])
    os.replace(cells_tmp, cells_dir)
    meta = {"sf_dir": sf_dir, "source_rows": n_rows,
            "fingerprint": fingerprint, "n_cells": n_cells,
            "centroids": centroids.tolist(),
            "files": _list_cell_files(cells_dir),
            "appended": []}
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    return meta


def _cell_assigner(centroids: np.ndarray):
    """Shared build/append stage: corpus rows (queries never enter the
    index) -> (cell, vec_id, embedding) by nearest centroid. The centroid
    matrix is broadcast once and read zero-copy per task."""
    import ray

    wrapped = {"ref": ray.put(np.asarray(centroids, dtype=np.float64))}

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(wrapped["ref"])
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        corpus = ids >= N_QUERIES
        sub = batch.filter(pa.array(corpus))
        if sub.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "vec_id": sub["vec_id"],
                             "embedding": sub["embedding"]})
        x = _to_matrix(sub["embedding"])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pa.table({"cell": pa.array(np.argmax(x @ c.T, axis=1
                                                    ).astype(np.int64)),
                         "vec_id": sub["vec_id"],
                         "embedding": sub["embedding"]})

    return assign


def _list_cell_files(root: str) -> dict[str, list[str]]:
    files: dict[str, list[str]] = {}
    if not os.path.isdir(root):
        return files
    for d in sorted(os.listdir(root)):
        if d.startswith("cell="):
            cell = d.split("=", 1)[1]
            files[cell] = sorted(f for f in os.listdir(os.path.join(root, d))
                                 if f.endswith(".parquet"))
    return files


def append_ivf_index(index_dir: str, new_parquet: str) -> dict:
    """Extend a built IVF index with a new source fragment WITHOUT
    retraining centroids — the index twin of ``extend_reference``
    (state/reference.py): the frozen model (centroids) stays fixed, new
    rows are assigned and appended, and the paired fingerprint/manifest
    update publishes LAST, atomically. Crash mid-append leaves orphan
    files that no query ever reads (queries open only manifest-listed
    files); re-running the same append is a no-op (source fingerprint
    recorded in meta['appended'])."""
    import json
    import shutil

    import ray.data

    import pyarrow.parquet as pq_

    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    if "files" not in meta or "appended" not in meta:
        # pre-manifest layout: build_ivf_index's rebuild gate protects the
        # query path, but append has no cells manifest to extend — fail
        # loudly instead of a raw KeyError deep in the append bookkeeping
        raise ValueError(
            f"IVF index at {index_dir} uses a pre-manifest layout (no "
            "files/appended in meta.json) and cannot be appended to; "
            "rebuild it with build_ivf_index first")
    st = os.stat(new_parquet)
    frag_rows = pq_.ParquetFile(new_parquet).metadata.num_rows
    frag_fp = f"{frag_rows}:{st.st_size}:{st.st_mtime_ns}"
    if any(a["fingerprint"] == frag_fp for a in meta["appended"]):
        return meta  # idempotent re-append
    centroids = np.asarray(meta["centroids"], dtype=np.float64)

    k = len(meta["appended"])
    app_tmp = os.path.join(index_dir, f"append.tmp.{k}")
    shutil.rmtree(app_tmp, ignore_errors=True)
    os.makedirs(app_tmp, exist_ok=True)
    ds = ray.data.read_parquet(new_parquet, columns=["vec_id", "embedding"])
    ds.map_batches(_cell_assigner(centroids), batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        app_tmp, partition_cols=["cell"])

    # move fragment files into the live cell dirs under unique names; they
    # stay invisible until the manifest (meta.json) publishes them
    cells_dir = os.path.join(index_dir, "cells")
    new_files: dict[str, list[str]] = {}
    for d in sorted(os.listdir(app_tmp)):
        if not d.startswith("cell="):
            continue
        cell = d.split("=", 1)[1]
        dst_dir = os.path.join(cells_dir, d)
        os.makedirs(dst_dir, exist_ok=True)
        for i, f in enumerate(sorted(os.listdir(os.path.join(app_tmp, d)))):
            if not f.endswith(".parquet"):
                continue
            name = f"a{k}-{i}-{f}"
            os.replace(os.path.join(app_tmp, d, f),
                       os.path.join(dst_dir, name))
            new_files.setdefault(cell, []).append(name)
    shutil.rmtree(app_tmp, ignore_errors=True)

    for cell, names in new_files.items():
        meta["files"].setdefault(cell, []).extend(names)
    meta["appended"].append({"source": new_parquet, "rows": frag_rows,
                             "fingerprint": frag_fp})
    meta["source_rows"] = meta["source_rows"] + frag_rows
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    return meta


def ann_ivf_persistent(sf_dir: str, nprobe: int = IVF_NPROBE):
    """Top-k cosine via the persistent IVF index: build once per
    (source, row-count) into /tmp, then answer queries by reading ONLY the
    probed ``cell=NN`` directories — nprobe/n_cells of the index bytes —
    plus the tiny query rows. Same exact within-cell math and per-query
    merge as ann_ivf_cosine, so results match it wherever probes agree."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    index_dir = f"{scratch_root()}/scdd_ivf/{tag}"
    os.makedirs(index_dir, exist_ok=True)
    build_ivf_index(sf_dir, index_dir)
    return _ivf_query(index_dir, sf_dir, nprobe)


def _ivf_query(index_dir: str, sf_dir: str, nprobe: int = IVF_NPROBE):
    """Probed-cell query pass against an already-built index: opens only
    the manifest-listed files of the nprobe nearest cells per query (a
    half-appended index is invisible until its meta publishes)."""
    import json

    import ray
    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)

    # queries: a bounded id-pruned read (N_QUERIES rows). The predicate is
    # a pyarrow dataset expression pushed into the parquet scan — row groups
    # whose vec_id stats exclude the range never leave storage (no per-row
    # Python filter over the corpus).
    import pyarrow.dataset as pads

    qt = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=(pads.field("vec_id") < N_QUERIES)).to_pandas()
    q = np.stack(qt.embedding.to_numpy()).astype(np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qids = qt.vec_id.to_numpy().astype(np.int64)
    sim = q @ centroids.T
    p = min(nprobe, sim.shape[1])
    probes = np.argpartition(-sim, p - 1, axis=1)[:, :p]  # (nq, p)

    # prune at the read: only the probed cells' MANIFEST-LISTED files open
    needed = sorted({int(c) for c in probes.ravel()})
    paths = []
    for c in needed:
        d = os.path.join(index_dir, "cells", f"cell={c}")
        paths.extend(os.path.join(d, f)
                     for f in meta.get("files", {}).get(str(c), []))
    cell_of_query: dict[int, list[int]] = {}
    for qi, row in zip(qids, probes):
        for c in row:
            cell_of_query.setdefault(int(c), []).append(int(qi))
    shared = ray.put((q, qids, cell_of_query))

    def cell_topk(batch: pa.Table) -> pa.Table:
        import ray as _ray

        q_, qids_, cq = _ray.get(shared)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        out_q, out_n, out_c = [], [], []
        # a read task may coalesce several cell files into one block —
        # process per cell so each query scans only its probed cells
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        for cell in np.unique(cells):
            want = cq.get(int(cell), [])
            if not want:
                continue
            sub = batch.filter(pa.array(cells == cell))
            x = _to_matrix(sub["embedding"])
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            nids = sub["vec_id"].to_numpy().astype(np.int64)
            qsel = np.isin(qids_, want)
            cos = q_[qsel] @ x.T
            k = min(TOP_K, nids.size)
            for row, qid in zip(cos, qids_[qsel]):
                top = np.argpartition(-row, k - 1)[:k]
                out_q.append(np.full(k, qid, np.int64))
                out_n.append(nids[top])
                out_c.append(row[top])
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "cos": pa.array(np.concatenate(out_c))})

    partials = ray.data.read_parquet(paths).map_batches(
        cell_topk, batch_format="pyarrow", batch_size=None)

    return partials.groupby("query_id").map_groups(
        _merge_cell_partials, batch_format="pandas")


def _int8_scales(sf_dir: str) -> np.ndarray:
    """Pass 1 of the int8 quantizer: per-dim |max| partials (one D-vector
    per block) -> driver max. The ONE scale authority every quantized
    entry shares (audit, top-k, recall)."""
    from .queries import _read_blocked

    ds = _read_blocked(sf_dir, "embeddings", ["embedding"])

    def max_abs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # an empty split must not kill the pass
            return pa.table({"m": pa.array([], pa.list_(pa.float64()))})
        x = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)
                     ).astype(np.float64)
        return pa.table({"m": pa.array([np.abs(x).max(axis=0)],
                                       pa.list_(pa.float64()))})

    parts = ds.map_batches(max_abs, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    return np.max(np.stack(parts.m.to_numpy()), axis=0)


def _quantize_int8(x: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """FLOOR(v*127/scale + 0.5) per dim — THE quantizer expression, spelled
    once here and once in _Q8_CTE_SQL (the SQL twin every quantized oracle
    composes from); zero-scale dims quantize to 0."""
    safe = np.where(scales == 0.0, 1.0, scales)
    q = np.floor(x.astype(np.float64) * 127.0 / safe + 0.5).astype(np.int64)
    q[:, scales == 0.0] = 0
    return q


def quantize_embeddings_int8(sf_dir: str):
    """Int8 scalar quantization of the embedding column — the compression
    step an at-scale ANN index applies before distance compute (4x smaller
    vectors, integer dot products). Two bounded passes: (1) the shared
    _int8_scales pass -> broadcast scales via ``ray.put``; (2) per-block
    INTEGER partials (sum_q, sum_q2, n per dim) -> driver sum. Every
    reported aggregate is an integer (summation-order independent — no
    float-sum drift) and the scale is an exact data element, so the DuckDB
    oracle matches hash-exactly; the quantizer expression is the shared
    _quantize_int8 / _Q8_CTE_SQL pair. Engine-new: the reference ships
    float vectors between its services
    (dimensionality_reduction_api/app/schemas/dr.py)."""
    import ray

    from .queries import _read_blocked, _round

    scales = _int8_scales(sf_dir)
    scales_ref = ray.put(scales)
    ds = _read_blocked(sf_dir, "embeddings", ["embedding"])

    def int_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"sum_q": pa.array([], pa.list_(pa.int64())),
                             "sum_q2": pa.array([], pa.list_(pa.int64())),
                             "n": pa.array([], pa.int64())})
        s = ray.get(scales_ref)
        x = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        q = _quantize_int8(x, s)
        return pa.table({
            "sum_q": pa.array([q.sum(axis=0)], pa.list_(pa.int64())),
            "sum_q2": pa.array([(q * q).sum(axis=0)], pa.list_(pa.int64())),
            "n": pa.array([np.int64(len(x))]),
        })

    agg = ds.map_batches(int_partials, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    sum_q = np.sum(np.stack(agg.sum_q.to_numpy()), axis=0).astype(np.int64)
    sum_q2 = np.sum(np.stack(agg.sum_q2.to_numpy()), axis=0).astype(np.int64)
    n = int(agg.n.sum())
    D = scales.size
    return pa.table({
        "dim": pa.array(np.arange(1, D + 1, dtype=np.int64)),  # 1-based:
        # matches DuckDB generate_subscripts
        "scale": pa.array(_round(scales, 6)),
        "sum_q": pa.array(sum_q),
        "sum_q2": pa.array(sum_q2),
        "n": pa.array(np.full(D, n, dtype=np.int64)),
    })


# Shared SQL fragment: unnest -> per-dim scale -> int8 quantize. EVERY
# quantized oracle composes from this one string, so the quantizer can
# never silently diverge between the audit, the top-k, and the recall.
_Q8_CTE_SQL = """
u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
s AS (SELECT dim, MAX(ABS(v)) AS scale FROM u GROUP BY dim),
q8 AS (SELECT u.vec_id, u.dim,
              CASE WHEN s.scale = 0 THEN 0
                   ELSE CAST(FLOOR(u.v * 127 / s.scale + 0.5) AS BIGINT)
              END AS qv
       FROM u JOIN s USING (dim))"""

QUANTIZE_INT8_SQL = f"""
WITH {_Q8_CTE_SQL}
SELECT q8.dim, FLOOR(ANY_VALUE(s.scale)*1000000+0.5)/1000000 AS scale,
       SUM(q8.qv)::BIGINT AS sum_q, SUM(q8.qv*q8.qv)::BIGINT AS sum_q2,
       COUNT(*)::BIGINT AS n
FROM q8 JOIN s ON s.dim = q8.dim
GROUP BY q8.dim
"""

# quantized dot-product top-k CTEs on top of the shared quantizer
_Q8_TOPK_CTE_SQL = f"""{_Q8_CTE_SQL},
d AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             SUM(a.qv * b.qv)::BIGINT AS dot
      FROM q8 a JOIN q8 b USING (dim)
      WHERE a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
      GROUP BY a.vec_id, b.vec_id),
qt AS (SELECT query_id, neighbor_id, dot FROM d
       QUALIFY ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY dot DESC, neighbor_id) <= {TOP_K})"""



def _topk_tiebreak_cut(row: np.ndarray, nids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the exact top-k by (row DESC, nids ASC) — O(B) candidate
    cut, then only the k-boundary candidates pay the deterministic
    tie-break sort. Integer scores tie often, so a 4k candidate margin is
    taken; provably exact while rows tied with the kth value number <= 3k
    (rows >= the kth value then number <= 4k-1, so every one of them beats
    the partition boundary), with a full-lexsort fallback for pathological
    plateaus. Pinned against the exhaustive sort in tests."""
    if row.size > 4 * k:
        cand = np.argpartition(-row, 4 * k - 1)[:4 * k]
        kth = np.partition(-row, k - 1)[k - 1]
        if (-row == kth).sum() <= 3 * k:
            return cand[np.lexsort((nids[cand], -row[cand]))[:k]]
    return np.lexsort((nids, -row))[:k]


def ann_topk_quantized(sf_dir: str):
    """Top-k by INT8-quantized dot product — the compressed-vector scoring
    path an at-scale ANN runs (4x less memory bandwidth, integer SIMD
    kernels on a real cluster). Shape mirrors the exact baseline: the
    quantized QUERY matrix broadcasts once (query rows come from a
    row-group-PRUNED pushdown read, never a full-table driver load), each
    corpus block quantizes with the same broadcast per-dim scales and
    emits its partial top-k via argpartition + a k-sized tie-break sort,
    and a per-query merge keeps the global k. Scores are integer dot
    products — summation-order independent — so the DuckDB oracle (the
    shared _Q8_CTE_SQL quantizer + SUM of products) matches hash-exactly."""
    import pyarrow.dataset as pads
    import ray
    import ray.data

    from .queries import _read_blocked

    scales = _int8_scales(sf_dir)
    qt = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=(pads.field("vec_id") < N_QUERIES)).to_pandas()
    q8 = _quantize_int8(np.stack(qt.embedding.to_numpy()), scales)
    q_ids = qt.vec_id.to_numpy().astype(np.int64)
    wrapped = {"ref": ray.put((q_ids, q8, scales))}

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])

    def score_block(batch: pa.Table) -> pa.Table:
        keep = pa.compute.greater_equal(batch["vec_id"], N_QUERIES)
        t = batch.filter(keep)
        if t.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "dot": pa.array([], pa.int64())})
        qids_, q8_, scales_ = ray.get(wrapped["ref"])
        c8 = _quantize_int8(_to_matrix(t["embedding"]), scales_)
        nids = t["vec_id"].to_numpy().astype(np.int64)
        dots = q8_ @ c8.T  # (Q, B) int64
        k = min(TOP_K, nids.size)
        out_q, out_n, out_d = [], [], []
        for row, qid in zip(dots, qids_):
            sel = _topk_tiebreak_cut(row, nids, k)
            out_q.append(np.full(k, qid, np.int64))
            out_n.append(nids[sel])
            out_d.append(row[sel])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "dot": pa.array(np.concatenate(out_d))})

    partials = ds.map_batches(score_block, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["dot", "neighbor_id"],
                              ascending=[False, True]).head(TOP_K)

    return partials.groupby("query_id").map_groups(merge_topk,
                                                   batch_format="pandas")


ANN_TOPK_QUANTIZED_SQL = f"""
WITH {_Q8_TOPK_CTE_SQL}
SELECT query_id, neighbor_id, dot FROM qt
"""


def ann_quantized_recall(sf_dir: str):
    """Recall@k of the int8-quantized top-k against the exact cosine
    top-k — the quality audit that justifies shipping compressed vectors
    at scale. Both sides are the distributed queries above; their results
    are Q x k rows, so the overlap join runs on the driver. Outputs are
    integers per query (overlap count, k) — hash-exact vs the oracle,
    which composes the SAME shared quantized-top-k CTEs as
    ann_topk_quantized. Note the measured gap mixes two effects:
    quantization error AND the norm mismatch (the quantized path ranks by
    raw dot product; the baseline by cosine) — deliberately unnormalized,
    because row-normalizing before the FLOOR quantizer would make the
    quantized values depend on a float sum-of-squares whose summation
    order differs cross-engine (a ULP at a FLOOR boundary breaks hash
    equality); the audit still bounds the end-to-end ranking drift a
    deployment would see."""
    ex = ann_topk_cosine(sf_dir).to_pandas()
    qz = ann_topk_quantized(sf_dir).to_pandas()
    qz = qz[["query_id", "neighbor_id"]].assign(hit=np.int64(1))
    m = ex[["query_id", "neighbor_id"]].merge(
        qz, on=["query_id", "neighbor_id"], how="left")
    g = m.groupby("query_id", as_index=False).agg(
        n_overlap=("hit", "count"), k=("neighbor_id", "size"))
    return pa.table({
        "query_id": pa.array(g.query_id.to_numpy(np.int64)),
        "n_overlap": pa.array(g.n_overlap.to_numpy(np.int64)),
        "k": pa.array(g.k.to_numpy(np.int64)),
    })


ANN_QUANTIZED_RECALL_SQL = f"""
WITH {_Q8_TOPK_CTE_SQL},
et AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id
       FROM embeddings q, embeddings n
       WHERE q.vec_id < {N_QUERIES} AND n.vec_id >= {N_QUERIES}
       QUALIFY ROW_NUMBER() OVER (
         PARTITION BY q.vec_id
         ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                         n.embedding::DOUBLE[]) DESC,
                  n.vec_id) <= {TOP_K})
SELECT et.query_id, COUNT(qt.neighbor_id)::BIGINT AS n_overlap,
       COUNT(*)::BIGINT AS k
FROM et LEFT JOIN qt USING (query_id, neighbor_id)
GROUP BY et.query_id
"""


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance scan — the standard
# 100×-scale ANN compression path alongside int8 scalar quantization and
# IVF: the corpus shrinks to M uint8 codes per vector (64 float32 dims →
# 8 bytes here, 32×), and queries score against a per-query (M × K) lookup
# table instead of the raw vectors.
# ---------------------------------------------------------------------------

PQ_M = 8        # subspaces (dim 64 → 8 dims each)
PQ_K = 256      # codewords per subspace (one uint8 code each)
PQ_KMEANS_ITERS = 10


def _pq_train_codebooks(sf_dir: str):
    """Train the M per-subspace codebooks on the SAME bounded deterministic
    sample the IVF trainer uses (shared `_bounded_sample_matrix`, so the
    'same sample' claim is structural, not copy-paste), with seeded plain
    Lloyd's per subspace — the whole artifact is (M, K, d/M) floats, a
    broadcast-sized object at any corpus scale. Memoized per source
    fingerprint (a sweep calls this from four ops)."""
    def build():
        train = _bounded_sample_matrix(sf_dir, IVF_TRAIN_CAP)
        d = train.shape[1]
        assert d % PQ_M == 0, f"dim {d} not divisible by PQ_M={PQ_M}"
        w = d // PQ_M
        books = []
        for m in range(PQ_M):
            sub = np.ascontiguousarray(train[:, m * w:(m + 1) * w])
            books.append(_lloyd_l2(sub, min(PQ_K, sub.shape[0]),
                                   PQ_KMEANS_ITERS, seed=17 + m))
        return books  # list of (k_m, w) float64

    return _trained_artifact("pq", sf_dir, (PQ_M, PQ_K, PQ_KMEANS_ITERS),
                             build)


def _lloyd_l2(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded plain-L2 Lloyd's on the driver sample (deterministic init =
    k distinct rows; empty clusters keep their previous centroid)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    init = rng.choice(x.shape[0], size=k, replace=False)
    c = x[np.sort(init)].copy()
    for _ in range(iters):
        d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
              + (c * c).sum(1)[None, :])
        a = d2.argmin(1)
        for j in range(k):
            members = x[a == j]
            if members.shape[0]:
                c[j] = members.mean(axis=0)
    return c


def _pq_encode(x: np.ndarray, books: list) -> np.ndarray:
    """(n, M) uint8 codes: per subspace, nearest codeword by L2 (ties →
    lowest index via argmin)."""
    n, d = x.shape
    w = d // len(books)
    codes = np.empty((n, len(books)), dtype=np.uint8)
    for m, c in enumerate(books):
        sub = x[:, m * w:(m + 1) * w]
        d2 = ((sub * sub).sum(1)[:, None] - 2.0 * (sub @ c.T)
              + (c * c).sum(1)[None, :])
        codes[:, m] = d2.argmin(1).astype(np.uint8)
    return codes


def _adc_scores(luts: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """ONE copy of the ADC scoring kernel (three ops rank on it, so the
    rounding/tie-break contract lives in one place): (n_q, n) matrix of
    Σ_m luts[:, m, codes[:, m]], rounded at 1e-6 so ranks are stable
    across matmul/batch shapes."""
    scores = np.zeros((luts.shape[0], codes.shape[0]))
    for m in range(codes.shape[1]):
        scores += luts[:, m, codes[:, m]]
    return np.floor(scores * 1e6 + 0.5) / 1e6


def ann_pq_topk(sf_dir: str):
    """Top-k cosine via product quantization with an asymmetric-distance
    (ADC) scan: corpus vectors are ENCODED to M uint8 codes against the
    broadcast codebooks, queries stay full-precision, and each batch scores
    rows as Σ_m LUT_m[code] where LUT = q_sub · codebook_mᵀ — one (M × K)
    table per query, no corpus float math. Rows-only (k-means-trained
    codebooks have no SQL equivalent); recall vs the exact oracled baseline
    and determinism are pinned in tests, mirroring the LSH/IVF pattern.
    At 10^12-row scale the encode pass is the one full-precision read;
    scans then touch 8 bytes/vector (here fused into one pass because the
    sandbox corpus is re-read per query set anyway — the persistent-IVF op
    shows the build-once layout)."""
    import ray

    q_ids, qm = _query_matrix(sf_dir)
    books = _pq_train_codebooks(sf_dir)
    w = qm.shape[1] // PQ_M
    # per-query LUTs: (n_q, M, K) — queries × 8 × 256 floats, broadcast-sized
    luts = np.stack([qm[:, m * w:(m + 1) * w] @ books[m].T
                     for m in range(PQ_M)], axis=1)
    wrapped = {"ref": ray.put((q_ids, luts, books))}

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])

    def score_adc(batch: pa.Table) -> pa.Table:
        qi, lt, bks = ray.get(wrapped["ref"])
        batch = batch.filter(
            pa.compute.greater_equal(batch["vec_id"], N_QUERIES))
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        x = _normalize_rows(_to_matrix(batch["embedding"]))
        codes = _pq_encode(x, bks)                     # (n, M) uint8
        scores = _adc_scores(lt, codes)
        k = min(TOP_K, codes.shape[0])
        out_q, out_n, out_s = [], [], []
        for q in range(scores.shape[0]):
            top = _topk_tiebreak_cut(scores[q], ids, k)
            out_q.append(np.full(k, qi[q], dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(scores[q][top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    partials = ds.map_batches(score_adc, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["score", "neighbor_id"],
                              ascending=[False, True]).head(TOP_K)

    return partials.groupby("query_id").map_groups(merge_topk,
                                                   batch_format="pandas")


PQ_RERANK_C = 50  # candidate depth; measured recall@10 = 1.0 at sf0.01


def ann_pq_rerank_topk(sf_dir: str, c: int = PQ_RERANK_C):
    """Two-stage retrieval — the standard production ANN deployment shape:
    a cheap PQ/ADC scan nominates top-``c`` candidates per query, then ONE
    bounded gather of just those candidates' full vectors feeds an exact
    cosine rerank of ≤ N_QUERIES × c rows on the driver. The corpus pays
    8-byte-code arithmetic; full-precision math touches only candidates
    (nq × c rows — broadcast-bounded at any corpus scale, fetched by a
    sorted-array membership probe inside one filtered scan). Rows-only;
    the evidence test pins recall ≥ 0.9 vs the exact oracled baseline
    (measured 1.0 at sf0.001/0.01 with c=50) and that every reranked
    score is the exact cosine (full-vector math, 1e-6-rounded like the
    exact op)."""
    import ray

    q_ids, qm = _query_matrix(sf_dir)
    books = _pq_train_codebooks(sf_dir)
    w = qm.shape[1] // PQ_M
    luts = np.stack([qm[:, m * w:(m + 1) * w] @ books[m].T
                     for m in range(PQ_M)], axis=1)
    wrapped = {"ref": ray.put((q_ids, luts, books))}

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])

    def adc_partial(batch: pa.Table) -> pa.Table:
        qi, lt, bks = ray.get(wrapped["ref"])
        batch = batch.filter(
            pa.compute.greater_equal(batch["vec_id"], N_QUERIES))
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        codes = _pq_encode(_normalize_rows(_to_matrix(batch["embedding"])),
                           bks)
        scores = _adc_scores(lt, codes)
        out_q, out_n, out_s = [], [], []
        for q in range(len(qi)):
            s = scores[q]
            k = min(c, s.size)
            cut = _topk_tiebreak_cut(s, ids, k)
            out_q.append(np.full(k, qi[q], dtype=np.int64))
            out_n.append(ids[cut])
            out_s.append(s[cut])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    def head_c(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["score", "neighbor_id"],
                              ascending=[False, True]).head(c)

    cand = (ds.map_batches(adc_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("query_id").map_groups(head_c, batch_format="pandas")
            .to_pandas())  # ≤ N_QUERIES × c rows by construction
    cand_ids = np.sort(np.unique(cand.neighbor_id.to_numpy(np.int64)))
    wrapped2 = {"ref": ray.put(cand_ids.astype(np.uint64))}

    def gather(batch: pa.Table) -> pa.Table:
        cs = ray.get(wrapped2["ref"])
        keep = probe_sorted(cs, batch["vec_id"].to_numpy().astype(np.uint64))
        return batch.filter(pa.array(keep))

    got = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"]
                        ).map_batches(gather, batch_format="pyarrow",
                                      zero_copy_batch=True).to_pandas()
    vid = got.vec_id.to_numpy(np.int64)
    vmat = _normalize_rows(np.stack(got.embedding.to_numpy()).astype(
        np.float64))
    row_of = {int(v): i for i, v in enumerate(vid)}
    out_q, out_n, out_c = [], [], []
    for qi_pos, qid in enumerate(q_ids):
        nb = cand[cand.query_id == qid].neighbor_id.to_numpy(np.int64)
        rows = np.array([row_of[int(n)] for n in nb], dtype=np.int64)
        cos = np.floor((vmat[rows] @ qm[qi_pos]) * 1e6 + 0.5) / 1e6
        k = min(TOP_K, rows.size)
        order = np.lexsort((nb, -cos))[:k]
        out_q.append(np.full(k, qid, dtype=np.int64))
        out_n.append(nb[order])
        out_c.append(cos[order])
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q)),
        "neighbor_id": pa.array(np.concatenate(out_n)),
        "cos": pa.array(np.concatenate(out_c), pa.float64()),
    })


def ann_ivfpq_topk(sf_dir: str, nprobe: int = IVF_NPROBE):
    """IVF × PQ — the canonical billion-scale ANN composition (FAISS
    IVFPQ's shape): corpus rows route to their nearest IVF cell, queries
    probe their ``nprobe`` nearest cells, and rows inside probed cells are
    scored by the PQ/ADC lookup — so a query touches ~nprobe/n_cells of
    the corpus AND pays 8-byte-code arithmetic on what it touches. Both
    trained artifacts reuse the shared bounded-sample trainers
    (``_ivf_train_centroids``, ``_pq_train_codebooks``), so cell routing
    matches ``ann_ivf_cosine`` and codes match ``ann_pq_topk`` exactly.
    Scan-based (no shuffle): cell assignment is one (n × n_cells) matmul
    per batch and unprobed rows drop before any code gather. Rows-only;
    recall vs the exact oracled baseline is pinned in tests (bounded below
    by the IVF probe recall ∧ PQ rank fidelity)."""
    import ray

    q_ids, qm = _query_matrix(sf_dir)
    cents = _ivf_train_centroids(sf_dir, IVF_N_CELLS)
    books = _pq_train_codebooks(sf_dir)
    p = min(nprobe, cents.shape[0])
    qsim = qm @ cents.T
    probes = np.argpartition(-qsim, p - 1, axis=1)[:, :p]  # (n_q, p)
    w = qm.shape[1] // PQ_M
    luts = np.stack([qm[:, m * w:(m + 1) * w] @ books[m].T
                     for m in range(PQ_M)], axis=1)
    wrapped = {"ref": ray.put((q_ids, probes, luts, books, cents))}

    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])

    def score_probed(batch: pa.Table) -> pa.Table:
        qi, prb, lt, bks, c = ray.get(wrapped["ref"])
        batch = batch.filter(
            pa.compute.greater_equal(batch["vec_id"], N_QUERIES))
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        x = _normalize_rows(_to_matrix(batch["embedding"]))
        cell = np.argmax(x @ c.T, axis=1)                  # (n,)
        # encode ONLY rows some query probes — the rest drop after the
        # cheap routing matmul, before any per-subspace code distance
        probed = np.flatnonzero(np.isin(cell, np.unique(prb)))
        if probed.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ids, cell = ids[probed], cell[probed]
        codes = _pq_encode(x[probed], bks)                 # (n', M) uint8
        scores = _adc_scores(lt, codes)
        out_q, out_n, out_s = [], [], []
        for q in range(len(qi)):
            sel = np.flatnonzero(np.isin(cell, prb[q]))
            if sel.size == 0:
                continue
            s = scores[q, sel]
            k = min(TOP_K, sel.size)
            cut = _topk_tiebreak_cut(s, ids[sel], k)
            out_q.append(np.full(k, qi[q], dtype=np.int64))
            out_n.append(ids[sel[cut]])
            out_s.append(s[cut])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    partials = ds.map_batches(score_probed, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["score", "neighbor_id"],
                              ascending=[False, True]).head(TOP_K)

    return partials.groupby("query_id").map_groups(merge_topk,
                                                   batch_format="pandas")


def ann_pq_recall(sf_dir: str):
    """Recall@k of the PQ/ADC ranking vs the exact cosine baseline — the
    audit number a deployment watches when swapping full-precision scans
    for 8-byte codes. Rows-only (the PQ side is k-means-trained); the
    recall floor itself is asserted in tests."""
    ex = ann_topk_cosine(sf_dir).to_pandas()
    qz = ann_pq_topk(sf_dir).to_pandas()
    qz = qz[["query_id", "neighbor_id"]].assign(hit=np.int64(1))
    m = ex[["query_id", "neighbor_id"]].merge(
        qz, on=["query_id", "neighbor_id"], how="left")
    g = m.groupby("query_id", as_index=False).agg(
        n_overlap=("hit", "count"), k=("neighbor_id", "size"))
    return pa.table({
        "query_id": pa.array(g.query_id.to_numpy(np.int64)),
        "n_overlap": pa.array(g.n_overlap.to_numpy(np.int64)),
        "k": pa.array(g.k.to_numpy(np.int64)),
    })


# ---------------------------------------------------------------------------
# Hybrid retrieval: keyword + vector with reciprocal-rank fusion — the
# standard production search shape (sparse lexical recall fused with dense
# semantic recall). Each side retrieves a bounded per-query candidate list
# (top-C by a STRICT total order: score desc, doc_id asc — float ties can't
# reorder across engines), then RRF folds the two rank lists:
# rrf(d) = Σ_side 1/(K + rank_side(d)), absent side contributes 0.
# Candidate lists are N_QUERIES × HYBRID_C rows by construction, so the
# fusion join runs on the driver; both retrieval scans stay distributed
# (per-block partial top-C → one bounded per-query merge).
# ---------------------------------------------------------------------------

HYBRID_C = 50   # per-side candidate depth
HYBRID_K = 60   # classic RRF constant


_RANK_COMBINE_BLOCKS = 32  # pre-combine width: bounds the per-query group


def _ranked_candidates(partials, c: int) -> pd.DataFrame:
    """Per-query global top-c of (score desc, doc_id asc) + 1-based rank.
    Exact given per-block partials kept under the same strict order. A
    repartition + per-block combine runs first so the final per-query group
    holds ≤ _RANK_COMBINE_BLOCKS × c rows regardless of input block count
    (without it a 10^6-block corpus would feed 10^6 × c rows into one
    group); the combine is order-preserving, so the merge stays exact."""
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["score", "doc_id"], ascending=[False, True])
                .groupby("query_id", sort=False).head(c))

    def head_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(c).copy()
        df["r"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    out = (partials.repartition(_RANK_COMBINE_BLOCKS)
           .map_batches(combine, batch_format="pandas")
           .groupby("query_id")
           .map_groups(head_rank, batch_format="pandas").to_pandas())
    if not len(out.columns):
        # an ALL-empty side (e.g. no doc shares a token with any query)
        # loses its columns through map_groups().to_pandas(); the fusion
        # contract is "absent side contributes 0", not a KeyError
        out = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                            "doc_id": pd.Series([], dtype=np.int64),
                            "score": pd.Series([], dtype=np.float64),
                            "r": pd.Series([], dtype=np.int64)})
    return out


def hybrid_search_rrf(sf_dir: str, lexical_path: str = "postings"):
    """Hybrid search over the documents/embeddings pair (doc_id == vec_id):
    keyword side scores distinct-token Jaccard against the query text (only
    docs sharing ≥1 token are lexical candidates), vector side scores
    cosine; reciprocal-rank fusion returns the top-TOP_K per query. Every
    rank order carries a doc_id tie-break, and every score feeding a rank
    is either an exact small-integer ratio (Jaccard) or the 1e-6-rounded
    cosine the oracle SQL ranks with the identical expression, so the
    fused output hash-matches the oracle (a residual flip would need a
    true cosine within float-rounding distance of a 1e-6 bucket edge).

    Lexical candidate generation is INDEX-PROBED, not scan-per-query
    (``lexical_path="postings"``, the default): the driver builds an
    inverted index over the bounded QUERY vocabulary (token → int64 query
    postings — the small-side dual of ``textops.inverted_index_documents``'s
    corpus postings), broadcasts it once, and each corpus batch probes its
    tokens against the index (vectorized hash64 membership against the
    sorted query-vocab hashes, string-confirmed on the tiny hit subset) to
    scatter-add |q∩d| intersection counts. Per-batch cost is
    O(tokens-shared-with-query-vocab) — the candidate volume itself —
    instead of the scan path's O(N_QUERIES × docs) Python set algebra, so
    at 100-TB corpus scale the probe cost no longer multiplies by query
    count. Jaccard = inter/(|q|+|d|-inter) uses the same integers as the
    set expression, so both paths are bit-identical (pinned by the
    forced-path parity test). ``lexical_path="scan"`` keeps the direct
    per-query set scan for that parity check. The probe assumes a BOUNDED
    query side (here the N_QUERIES constant) so the query-vocab index
    broadcasts; a query batch too large for that would instead use the
    corpus-side postings build (``textops.inverted_index_documents``) +
    bucket join — same candidate set, one extra shuffle — which this op
    does not implement (no such query scale exists in the surface)."""
    import pyarrow.parquet as pq
    import ray

    # ---- queries (bounded: N_QUERIES rows of each table) ----
    # predicate pushed into the parquet read (row-group pruning) — the
    # driver picks out N_QUERIES rows without materializing the corpus,
    # same shape as _query_matrix on the embeddings side
    qd = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"],
                       filters=[("doc_id", "<", N_QUERIES)])
    q_ids_t = qd["doc_id"].to_numpy().astype(np.int64)
    q_tokens = [frozenset(t for t in s.lower().split(" ") if t)
                for s in qd["text"].to_pylist()]
    # query-vocab inverted index: token → sorted int64 array of query
    # POSITIONS (not ids — positions index q_sizes/q_ids_t directly)
    tok2q: dict = {}
    for k, s in enumerate(q_tokens):
        for t in s:
            tok2q.setdefault(t, []).append(k)
    tok2q = {t: np.asarray(v, dtype=np.int64) for t, v in tok2q.items()}
    qv_hashes = np.sort(hash64(np.array(sorted(tok2q), dtype=object))) \
        if tok2q else np.array([], dtype=np.uint64)
    q_sizes = np.fromiter((len(s) for s in q_tokens), dtype=np.int64,
                          count=len(q_tokens))
    q_ids_v, qm = _query_matrix(sf_dir)
    wrapped = {"ref": ray.put((q_ids_t, q_tokens, tok2q, qv_hashes,
                               q_sizes, q_ids_v, qm))}

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})

    def _topc_jaccard(qi, ids, jac_rows) -> pa.Table:
        """Per-query top-C cut under the strict (jac desc, doc_id asc)
        order — shared tail of both lexical paths."""
        out_q, out_d, out_s = [], [], []
        for k, jac in enumerate(jac_rows):
            keep = np.flatnonzero(jac > 0)
            if keep.size == 0:
                continue
            order = keep[np.lexsort((ids[keep], -jac[keep]))][:HYBRID_C]
            out_q.append(np.full(order.size, qi[k], dtype=np.int64))
            out_d.append(ids[order])
            out_s.append(jac[order])
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d)),
                         "score": pa.array(np.concatenate(out_s),
                                           pa.float64())})

    def text_partial_scan(batch: pa.Table) -> pa.Table:
        """Direct per-query set scan — O(N_QUERIES × docs) per batch; kept
        as the parity reference for the postings probe below."""
        qi, qtok, _, _, _, _, _ = ray.get(wrapped["ref"])
        batch = batch.filter(
            pa.compute.greater_equal(batch["doc_id"], N_QUERIES))
        if batch.num_rows == 0:
            return empty
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        toks = [frozenset(t for t in s.lower().split(" ") if t)
                for s in batch["text"].to_pylist()]
        jac_rows = [
            np.array([len(qs & d) / len(qs | d) if (qs or d) else 0.0
                      for d in toks])
            for qs in qtok]
        return _topc_jaccard(qi, ids, jac_rows)

    def text_partial_probe(batch: pa.Table) -> pa.Table:
        """Posting-probe candidate generation: batch tokens are tested
        against the broadcast query-vocab index (vectorized hash64
        membership, string-confirmed), and only the hits scatter-add into
        the |q∩d| intersection matrix — no per-query corpus pass, and a
        doc sharing no query token costs one hash probe per token."""
        qi, _, t2q, qvh, qsz, _, _ = ray.get(wrapped["ref"])
        batch = batch.filter(
            pa.compute.greater_equal(batch["doc_id"], N_QUERIES))
        n = batch.num_rows
        if n == 0 or not t2q:
            return empty
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        # set order within a doc is irrelevant: the scatter-add commutes,
        # so |q∩d| is order-free — skip the per-doc sort
        token_lists = [list({t for t in s.lower().split(" ") if t})
                       for s in batch["text"].to_pylist()]
        d_sizes = np.fromiter((len(l) for l in token_lists),
                              dtype=np.int64, count=n)
        if d_sizes.sum() == 0:
            return empty
        flat = np.array([t for l in token_lists for t in l], dtype=object)
        doc_pos = np.repeat(np.arange(n), d_sizes)
        maybe = np.flatnonzero(probe_sorted(qvh, hash64(flat)))
        # string-confirm the hash hits (collision guard) and expand each
        # hit token's query postings → (query, doc) intersection pairs
        hit_pos = [p for p in maybe if flat[p] in t2q]
        hit_qs = [t2q[flat[p]] for p in hit_pos]
        hit_docs = doc_pos[hit_pos] if hit_pos else np.array([],
                                                            dtype=np.int64)
        inter = np.zeros((len(qi), n), dtype=np.int64)
        if hit_qs:
            qs_arr = np.concatenate(hit_qs)
            ds_arr = np.repeat(hit_docs,
                               np.fromiter((len(x) for x in hit_qs),
                                           dtype=np.int64, count=len(hit_qs)))
            np.add.at(inter, (qs_arr, ds_arr), 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            union = qsz[:, None] + d_sizes[None, :] - inter
            jac = np.where(inter > 0, inter / np.maximum(union, 1), 0.0)
        return _topc_jaccard(qi, ids, list(jac))

    text_partial = (text_partial_probe if lexical_path == "postings"
                    else text_partial_scan)

    def vec_partial(batch: pa.Table) -> pa.Table:
        _, _, _, _, _, qi, q = ray.get(wrapped["ref"])
        batch = batch.filter(
            pa.compute.greater_equal(batch["vec_id"], N_QUERIES))
        if batch.num_rows == 0:
            return empty
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        x = _normalize_rows(_to_matrix(batch["embedding"]))
        # rank on the 1e-6-ROUNDED cosine (the oracle ranks the identically
        # rounded SQL expression): raw float ranks would let a ~1e-15
        # cross-engine rounding gap between near-equal cosines flip a rank
        # pair, and a rank flip shifts the fused rrf by ~1/(K+r)²
        cos = np.floor((q @ x.T) * 1e6 + 0.5) / 1e6
        out_q, out_d, out_s = [], [], []
        for k in range(cos.shape[0]):
            order = np.lexsort((ids, -cos[k]))[:HYBRID_C]
            out_q.append(np.full(order.size, qi[k], dtype=np.int64))
            out_d.append(ids[order])
            out_s.append(cos[k][order])
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d)),
                         "score": pa.array(np.concatenate(out_s),
                                           pa.float64())})

    docs = _read_blocked(sf_dir, "documents", ["doc_id", "text"])
    vecs = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])
    t_rank = _ranked_candidates(
        docs.map_batches(text_partial, batch_format="pyarrow",
                         zero_copy_batch=True), HYBRID_C)
    v_rank = _ranked_candidates(
        vecs.map_batches(vec_partial, batch_format="pyarrow",
                         zero_copy_batch=True), HYBRID_C)

    # ---- driver fusion over ≤ 2 × N_QUERIES × HYBRID_C candidate rows ----
    fused = t_rank[["query_id", "doc_id", "r"]].merge(
        v_rank[["query_id", "doc_id", "r"]],
        on=["query_id", "doc_id"], how="outer", suffixes=("_t", "_v"))
    rt = fused["r_t"].to_numpy(dtype=np.float64, na_value=np.nan)
    rv = fused["r_v"].to_numpy(dtype=np.float64, na_value=np.nan)
    rrf = (np.where(np.isnan(rt), 0.0, 1.0 / (HYBRID_K + rt))
           + np.where(np.isnan(rv), 0.0, 1.0 / (HYBRID_K + rv)))
    fused = pd.DataFrame({"query_id": fused.query_id.to_numpy(np.int64),
                          "doc_id": fused.doc_id.to_numpy(np.int64),
                          "rrf": rrf})
    fused = fused.sort_values(["query_id", "rrf", "doc_id"],
                              ascending=[True, False, True])
    fused = fused.groupby("query_id", sort=False).head(TOP_K)
    return pa.table({
        "query_id": pa.array(fused.query_id.to_numpy(), pa.int64()),
        "doc_id": pa.array(fused.doc_id.to_numpy(), pa.int64()),
        "rrf": pa.array(_round(fused.rrf.to_numpy(), 9), pa.float64()),
    })


HYBRID_SEARCH_SQL = f"""
WITH qdoc AS (
  SELECT doc_id, list_distinct(list_filter(string_split(lower(text), ' '),
                                           x -> x <> '')) AS toks
  FROM documents WHERE doc_id < {N_QUERIES}),
cdoc AS (
  SELECT doc_id, list_distinct(list_filter(string_split(lower(text), ' '),
                                           x -> x <> '')) AS toks
  FROM documents WHERE doc_id >= {N_QUERIES}),
trank AS (
  SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.doc_id
           ORDER BY len(list_intersect(q.toks, c.toks))::DOUBLE
                    / len(list_distinct(list_concat(q.toks, c.toks))) DESC,
                    c.doc_id) AS r
  FROM qdoc q, cdoc c
  WHERE len(list_intersect(q.toks, c.toks)) > 0
  QUALIFY r <= {HYBRID_C}),
vrank AS (
  SELECT q.vec_id AS query_id, n.vec_id AS doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY FLOOR(list_cosine_similarity(q.embedding::DOUBLE[],
                                                 n.embedding::DOUBLE[])
                          * 1000000 + 0.5) / 1000000 DESC,
                    n.vec_id) AS r
  FROM embeddings q, embeddings n
  WHERE q.vec_id < {N_QUERIES} AND n.vec_id >= {N_QUERIES}
  QUALIFY r <= {HYBRID_C}),
fused AS (
  SELECT COALESCE(t.query_id, v.query_id) AS query_id,
         COALESCE(t.doc_id, v.doc_id) AS doc_id,
         COALESCE(1.0 / ({HYBRID_K} + t.r), 0)
         + COALESCE(1.0 / ({HYBRID_K} + v.r), 0) AS rrf_raw
  FROM trank t FULL OUTER JOIN vrank v
    ON t.query_id = v.query_id AND t.doc_id = v.doc_id)
SELECT query_id, doc_id,
       FLOOR(rrf_raw * 1000000000 + 0.5) / 1000000000 AS rrf
FROM fused
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY query_id ORDER BY rrf_raw DESC, doc_id) <= {TOP_K}
"""


MMR_LAMBDA = 0.7  # relevance/diversity trade-off (classic Carbonell-Goldstein)


def mmr_rerank_embeddings(sf_dir: str):
    """Diversified re-rank via maximal marginal relevance: retrieve each
    query's top-HYBRID_C cosine candidates with the exact distributed scan
    (per-block tie-exact partial top-C, bounded merge), then greedily pick
    TOP_K of them maximizing ``λ·sim(q,d) − (1−λ)·max_{s∈picked} sim(d,s)``
    — relevance first, then novelty against what's already picked. The
    greedy loop runs on the driver over ≤ N_QUERIES × HYBRID_C candidates
    by construction (the candidate×candidate sims come from one pruned
    candidate-id read), so only the retrieval scan touches the corpus.
    Rows-only: the iterative argmax isn't SQL-expressible; pinned against
    an independent reimplementation + invariants in tests. All ties break
    on the smaller doc_id, so output is deterministic at any parallelism."""
    import pyarrow.parquet as pq
    import ray

    q_ids, q = _query_matrix(sf_dir)
    wrapped = {"ref": ray.put((q_ids, q))}
    ds = _read_blocked(sf_dir, "embeddings", ["vec_id", "embedding"])

    def corpus_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.greater_equal(batch["vec_id"],
                                                     N_QUERIES))

    from functools import partial as _partial

    # candidate retrieval ranks the 1e-6-ROUNDED cosine (round6): the MMR
    # output depends on candidate ORDER, and raw float ranks differ at the
    # last ulp across matmul shapes/parallelism; the bounded pre-combine
    # (_ranked_candidates) keeps the per-query merge group fixed-size at
    # any corpus block count
    partials = ds.map_batches(corpus_only, batch_format="pyarrow",
                              zero_copy_batch=True).map_batches(
        _partial(_topk_score, wrapped=wrapped, k=HYBRID_C, round6=True),
        batch_format="pyarrow").map_batches(
        lambda t: t.rename_columns(["query_id", "doc_id", "score"]),
        batch_format="pyarrow")

    cand = _ranked_candidates(partials, HYBRID_C).rename(
        columns={"doc_id": "neighbor_id", "score": "cos"})

    # one pruned read of the ≤ N_QUERIES × HYBRID_C candidate vectors
    cand_ids = np.unique(cand.neighbor_id.to_numpy())
    ct = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "in",
                                 sorted(int(i) for i in cand_ids))])
    cid = ct["vec_id"].to_numpy().astype(np.int64)
    cvec = _normalize_rows(_to_matrix(ct["embedding"]))
    pos = {int(v): i for i, v in enumerate(cid)}

    out_q, out_d, out_r, out_s = [], [], [], []
    for k_q, grp in cand.groupby("query_id", sort=True):
        g = grp.sort_values(["cos", "neighbor_id"],
                            ascending=[False, True])
        ids = g.neighbor_id.to_numpy().astype(np.int64)
        rel = g.cos.to_numpy()
        vecs = cvec[[pos[int(i)] for i in ids]]
        sims = vecs @ vecs.T  # candidate × candidate
        picked: list[int] = []
        max_sim = np.full(ids.size, -np.inf)
        remaining = np.ones(ids.size, dtype=bool)
        for rank in range(min(TOP_K, ids.size)):
            if picked:
                score = MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * max_sim
            else:
                score = rel.copy()
            score[~remaining] = -np.inf
            # argmax with smaller-doc_id tie-break (masked rows sort last)
            best = int(np.lexsort((ids, -score))[0])
            picked.append(best)
            remaining[best] = False
            max_sim = np.maximum(max_sim, sims[best])
            out_q.append(int(k_q))
            out_d.append(int(ids[best]))
            out_r.append(rank + 1)
            out_s.append(float(rel[best]))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "doc_id": pa.array(out_d, pa.int64()),
        "mmr_rank": pa.array(out_r, pa.int64()),
        "relevance": pa.array(_round(np.array(out_s, dtype=np.float64), 6),
                              pa.float64()),
    })
