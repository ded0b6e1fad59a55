"""Similarity search over the ``embeddings`` table (``list<float>`` column).

Brute-force cosine top-k is the baseline: the query matrix is broadcast once
(``ray.put``) and every batch does one numpy matmul against it — the canonical
small-side-broadcast ANN shape. The LSH-bucketed variant is the scale path: a
random-hyperplane signature assigns each vector to a bucket so candidate sets
shrink from N to N/2^b per query (documented trade-off; exact top-k remains
the oracle-checked baseline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.stats import median_heuristic_sigma, mmd_permutation_test
from .queries import _read, _round

TOP_K = 10
N_QUERIES = 10


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


class _TopKScorer:
    """Actor-pool stage: query matrix fetched once per actor; per batch one
    matmul + per-query partial top-k."""

    def __init__(self, wrapped, k: int):
        import ray

        self.q_ids, self.q = ray.get(wrapped["ref"])  # (m,), (m, d) L2-normalized
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        x = _to_matrix(batch["embedding"])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cos = self.q @ x.T  # (m, n)
        k = min(self.k, cos.shape[1])
        out_q, out_n, out_c = [], [], []
        for qi in range(cos.shape[0]):
            top = np.argpartition(-cos[qi], k - 1)[:k]
            out_q.append(np.full(k, self.q_ids[qi], dtype=np.int64))
            out_n.append(ids[top].astype(np.int64))
            out_c.append(cos[qi][top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "cos": pa.array(np.concatenate(out_c), pa.float64()),
        })


def ann_topk_cosine(sf_dir: str):
    """Exact brute-force cosine top-k: per-batch partial top-k in an actor
    pool, then a per-query merge of the partials (k × n_blocks rows — tiny)."""
    import pyarrow.parquet as pq
    import ray

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qmask = np.asarray(qt["vec_id"].to_numpy() < N_QUERIES)
    q = _to_matrix(qt.filter(pa.array(qmask))["embedding"])
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    q_ids = qt.filter(pa.array(qmask))["vec_id"].to_numpy().astype(np.int64)
    wrapped = {"ref": ray.put((q_ids, q))}

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def corpus_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.greater_equal(batch["vec_id"], N_QUERIES))

    partials = ds.map_batches(corpus_only, batch_format="pyarrow", zero_copy_batch=True
                              ).map_batches(
        _TopKScorer, fn_constructor_args=(wrapped, TOP_K), batch_format="pyarrow",
        concurrency=2,
    )

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(TOP_K)
        return df

    out = partials.groupby("query_id").map_groups(merge_topk, batch_format="pandas")

    def final_round(batch: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": batch["query_id"],
            "neighbor_id": batch["neighbor_id"],
            "cos": pa.array(_round(batch["cos"].to_numpy(), 6)),
        })

    return out.map_batches(final_round, batch_format="pyarrow")


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


def ann_lsh_bucketed(sf_dir: str, n_planes: int = 4):
    """Scale-path ANN: random-hyperplane LSH bucket per vector, then exact
    search only inside the query's bucket. Returns (bucket, n_vectors) stats +
    per-query top-k within-bucket; recall vs exact is measured in tests."""
    import pyarrow.parquet as pq
    import ray

    rng = np.random.Generator(np.random.PCG64(7))
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    dim = len(qt["embedding"][0])
    planes = rng.normal(size=(n_planes, dim))
    wrapped = {"ref": ray.put(planes)}

    class Bucketize:
        def __init__(self):
            self.planes = ray.get(wrapped["ref"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _to_matrix(batch["embedding"])
            bits = (x @ self.planes.T) > 0  # (n, p)
            bucket = bits @ (1 << np.arange(n_planes))
            return pa.table({
                "vec_id": batch["vec_id"],
                "bucket": pa.array(bucket.astype(np.int64)),
                "embedding": batch["embedding"],
            })

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    bucketed = ds.map_batches(Bucketize, batch_format="pyarrow", concurrency=2)

    def within_bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df.vec_id.to_numpy()
        x = np.stack(df.embedding.to_numpy())
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        qsel = ids < N_QUERIES
        if not qsel.any():
            return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                                 "neighbor_id": pd.array([], dtype="int64"),
                                 "cos": pd.array([], dtype="float64")})
        cos = x[qsel] @ x[~qsel].T if (~qsel).any() else np.zeros((qsel.sum(), 0))
        rows = []
        cids = ids[~qsel]
        for qi, qid in enumerate(ids[qsel]):
            order = np.argsort(-cos[qi])[:TOP_K]
            for j in order:
                rows.append((int(qid), int(cids[j]), float(_round(cos[qi][j], 6))))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    return bucketed.groupby("bucket").map_groups(within_bucket_topk, batch_format="pandas")


def mmd_embeddings_drift(sf_dir: str):
    """MMD+permutation two-sample tests on the embeddings table:
    (a) null — even vs odd vec_id; (b) drift — second half affinely shifted.
    The engine drift operator applied to generic ``list<float>`` vectors."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")]
    )
    ids = t["vec_id"].to_numpy()
    x = _to_matrix(t["embedding"])
    even, odd = x[ids % 2 == 0], x[ids % 2 == 1]
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
