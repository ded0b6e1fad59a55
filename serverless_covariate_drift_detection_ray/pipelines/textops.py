"""Text-analysis + deduplication operators over the ``documents`` table.

The large-scale training-data ops the engine ships beyond the reference's own
operators: exact dedup, n-gram/word-set Jaccard near-dup, MinHash-LSH,
SimHash, token counting, quality scoring, language-ID. All deterministic
(hashing via functions.hashing), all expressed as Ray Data stages:
vectorized ``map_batches`` + groupby shuffles; small-side state broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64, hash_family, splitmix64
from .queries import _pa_from_pandas, _read, _read_blocked, _round

STOPWORDS = ("the", "a", "of", "and", "to")

# marker word lists for the n-gram/stopword language-ID heuristic; ties break
# by this order (en first) — mirrored exactly in the oracle SQL
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "es": ("el", "la", "los"),
    "fr": ("le", "les", "des"),
    "zh": ("de5", "shi4", "le5"),
}


def _read_docs(sf_dir: str, columns=None):
    """Documents-table read via the shared CPU-floored blocked read: the
    per-batch tokenization kernels are compute-bound per doc (the
    fuzzy-join rule — parallelism must track CPUs), while the data-scaled
    term takes over at corpus scale."""
    from .queries import _read_cpu_blocked

    return _read_cpu_blocked(sf_dir, "documents", columns)

def _tokens(text_series: pd.Series) -> pd.Series:
    """Whitespace tokens, empties dropped — semantics mirrored in oracle SQL
    (``list_filter(string_split(text,' '), x -> x <> '')``)."""
    return text_series.fillna("").str.split(" ").map(lambda ws: [w for w in ws if w])


# ---------------------------------------------------------------------------
# Exact dedup — content-hash groupby, keep min key (guide "Exact dedup")
# ---------------------------------------------------------------------------


def dedup_exact_documents(sf_dir: str):
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64(batch["text"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": batch["doc_id"],
                         "text_hash": pa.array(h.astype(np.int64))})

    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    keep = hashed.groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    return keep.select_columns(["doc_id"])


DEDUP_EXACT_SQL = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"


def dedup_keep_best_documents(sf_dir: str):
    """Exact dedup that keeps the BEST copy per duplicate group (highest
    distinct-token count, then smallest doc_id) — the keep-policy variant
    real training-data dedup uses instead of keep-first.

    Fully mergeable partials: each block pre-reduces to one
    (hash, best_doc, best_nd, count) row per local text group, so the
    salted shuffle moves at most one row per (block, group) and the merge
    is an associative (max-by, sum) fold."""
    from ..functions.hashing import splitmix64

    n_buckets = 64
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = hash64(df.text.to_numpy()).astype(np.int64)
        nd = _tokens(df.text).map(lambda ws: len(set(ws))).to_numpy(np.int64)
        t = pd.DataFrame({"h": h, "doc_id": df.doc_id.to_numpy(),
                          "nd": nd, "c": 1})
        # local best per group: sort so the first row per h wins
        t = t.sort_values(["h", "nd", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = t.groupby("h", sort=False)
        out = g.first().reset_index()
        out["c"] = g["c"].sum().to_numpy()
        out["b"] = (splitmix64(out.h.to_numpy().astype(np.uint64))
                    % np.uint64(n_buckets)).astype(np.int64)
        return _pa_from_pandas(out, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "nd", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        g = df.groupby("h", sort=False)
        out = g.first().reset_index()
        out["c"] = g["c"].sum().to_numpy()
        return pd.DataFrame({"doc_id": out.doc_id.to_numpy(),
                             "n_copies": out.c.to_numpy().astype(np.int64),
                             "n_distinct": out.nd.to_numpy().astype(np.int64)})

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True
                          ).groupby("b").map_groups(merge, batch_format="pandas")


DEDUP_KEEP_BEST_SQL = """
WITH t AS (
  SELECT doc_id, text,
    len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS nd
  FROM documents),
r AS (
  SELECT doc_id, nd,
    COUNT(*) OVER (PARTITION BY text) AS n_copies,
    ROW_NUMBER() OVER (PARTITION BY text ORDER BY nd DESC, doc_id) AS rn
  FROM t)
SELECT doc_id, CAST(n_copies AS BIGINT) AS n_copies, nd AS n_distinct
FROM r WHERE rn = 1
"""


def dedup_report_documents(sf_dir: str):
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        h = hash64(batch["text"].to_numpy(zero_copy_only=False))
        v, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(v.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True
                         ).groupby("h").aggregate(Sum("c", alias_name="n"))

    def summarize(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy()
        return pa.table({
            "docs": pa.array([int(n.sum())], pa.int64()),
            "uniq": pa.array([int(n.size)], pa.int64()),
            "dups": pa.array([int((n - 1).sum())], pa.int64()),
        })

    t = agg.map_batches(summarize, batch_format="pyarrow").to_pandas().sum()
    return pa.Table.from_pylist([{
        "n_docs": int(t["docs"]), "n_unique_texts": int(t["uniq"]),
        "n_dup_docs": int(t["dups"]),
    }])


DEDUP_REPORT_SQL = """
SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique_texts,
  COUNT(*) - COUNT(DISTINCT text) AS n_dup_docs
FROM documents
"""


# ---------------------------------------------------------------------------
# Word-set Jaccard near-dup within (lang, source) buckets — oracle-checkable
# ---------------------------------------------------------------------------


def jaccard_neardup_pairs(sf_dir: str, threshold: float = 0.8):
    """All-pairs word-set Jaccard inside groupby buckets. The bucket keys bound
    the pair count; at scale the MinHash-LSH variant below replaces the
    all-pairs step with band buckets."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang", "source"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        sets = _tokens(df.text).map(set).to_list()
        ids = df.doc_id.to_numpy()
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), float(_round(jac, 4))))
        if not rows:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "jaccard": pd.array([], dtype="float64")})
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    return ds.groupby(["lang", "source"]).map_groups(pairs, batch_format="pandas")


JACCARD_SQL = """
WITH d AS (
  SELECT doc_id, lang, source,
    list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS words
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  FLOOR(len(list_intersect(a.words,b.words))::DOUBLE
        / len(list_distinct(list_concat(a.words,b.words)))*10000+0.5)/10000 AS jaccard
FROM d a JOIN d b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.words,b.words))::DOUBLE
      / len(list_distinct(list_concat(a.words,b.words))) >= 0.8
"""


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup (the at-scale candidate generator; rows-only check)
# ---------------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 16  # 16 bands × 4 rows: P(collision) ≈ 1-(1-j^4)^16 → ~1 at j=0.8


def minhash_signatures(batch: pa.Table) -> pa.Table:
    """Vectorized MinHash over word sets: one hash64 per word, a seeded hash
    family per permutation, segment-min per document."""
    texts = batch["text"].to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy()
    words, bounds = [], [0]
    for t in texts:
        ws = sorted({w for w in (t or "").split(" ") if w})
        words.extend(ws)
        bounds.append(len(words))
    if not words:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int64()),
                         "band_hash": pa.array([], pa.int64())})
    base = hash64(np.asarray(words, dtype=object))
    fam = hash_family(base, N_HASHES)  # (N_HASHES, n_words)
    starts = np.asarray(bounds[:-1])
    sig = np.stack([
        np.minimum.reduceat(fam[k], starts) for k in range(N_HASHES)
    ])  # (N_HASHES, n_docs); empty docs handled below
    lens = np.diff(bounds)
    sig[:, lens == 0] = np.uint64(0)
    rows_per_band = N_HASHES // N_BANDS
    out_doc, out_band, out_hash = [], [], []
    for b in range(N_BANDS):
        seg = sig[b * rows_per_band : (b + 1) * rows_per_band]  # (r, n_docs)
        bh = seg[0]
        for r in range(1, rows_per_band):
            bh = splitmix64(bh ^ seg[r])
        out_doc.append(doc_ids)
        out_band.append(np.full(doc_ids.size, b, dtype=np.int64))
        out_hash.append(bh.astype(np.int64))
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_doc)),
        "band": pa.array(np.concatenate(out_band)),
        "band_hash": pa.array(np.concatenate(out_hash)),
    })


HOT_BAND_CAP = 512  # all-pairs bound per band bucket; beyond it, star-link
N_DEDUP_BUCKETS = 256  # salt buckets for the distributed pair-distinct


def _word_hash_table(batch: pa.Table) -> pa.Table:
    """(doc_id, words) where words = sorted distinct 64-bit word hashes.

    The compact per-doc token representation shipped through the verify
    joins — word hashes instead of raw text keep join payloads small;
    Jaccard over 64-bit hashes equals word-set Jaccard up to negligible
    collision probability."""
    texts = batch["text"].to_numpy(zero_copy_only=False)
    words = []
    for t in texts:
        ws = sorted({w for w in (t or "").split(" ") if w})
        h = hash64(np.asarray(ws, dtype=object)) if ws else np.empty(0, np.uint64)
        # binary blob (sorted int64 array bytes): Arrow hash joins reject
        # list-typed payload columns, binary passes through fine
        words.append(np.unique(h).astype(np.int64).tobytes())
    return pa.table({
        "doc_id": batch["doc_id"],
        "words": pa.array(words, pa.binary()),
    })


def _attach_words(pairs_ds, sf_dir: str, key: str, out_col: str, n_buckets: int = 64):
    """Bucketed distributed join: attach per-doc token-hash blobs to pair rows.

    Pair rows and doc rows are unioned into one schema-aligned dataset,
    salted into ``n_buckets`` groups by hash(key), and merged vectorized
    (pandas) within each group — a hash join expressed as one single-key
    groupby shuffle with bounded group count (Ray 2.49's per-group overhead
    makes one-group-per-key infeasible, and its join operator has ~10 s+
    fixed aggregator cost per side at this scale). Only the candidate docs'
    token blobs survive the inner merge, so nothing corpus-sized is broadcast
    or collected. Doc-id columns stay < 2^32, so the float64 round-trip that
    nullable-int union columns take in pandas is exact."""
    other = "doc_b" if key == "doc_a" else "doc_a"
    schema_cols = ["doc_a", "doc_b", "words_a", "words_b", "jbkt"]

    def widen(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in schema_cols:
            if c in batch.column_names:
                cols[c] = batch[c]
            elif c.startswith("words"):
                cols[c] = pa.nulls(batch.num_rows, pa.binary())
            else:
                cols[c] = pa.nulls(batch.num_rows, pa.int64())
        return pa.table(cols)

    def tag_pairs(batch: pa.Table) -> pa.Table:
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        k = batch[key].to_numpy()
        bkt = (splitmix64(k.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return widen(batch.append_column("jbkt", pa.array(bkt)))

    def tag_docs(batch: pa.Table) -> pa.Table:
        t = _word_hash_table(batch)
        k = t["doc_id"].to_numpy()
        bkt = (splitmix64(k.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return widen(pa.table({key: t["doc_id"], out_col: t["words"],
                               "jbkt": pa.array(bkt)}))

    docs = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True)
    tagged = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # doc rows have no partner id; pair rows always carry both doc ids
        is_doc = df[other].isna()
        d = df.loc[is_doc, [key, out_col]]
        p = df.loc[~is_doc].drop(columns=[out_col, "jbkt"])
        return p.merge(d, on=key, how="inner")

    return tagged.union(docs).groupby("jbkt").map_groups(merge, batch_format="pandas")


# verify-path gate: doc token blobs are broadcast only when the corpus is
# provably small (parquet metadata count — no scan); otherwise the bucketed
# map_groups join runs. 200k docs × ~25 tokens × 8 B ≈ 40 MB broadcast.
VERIFY_BROADCAST_MAX_DOCS = 200_000


def _jaccard_blobs(wa, wb) -> np.ndarray:
    """Exact Jaccard over pairs of sorted-int64-array blobs."""
    jac = np.zeros(len(wa), dtype=np.float64)
    for i in range(len(wa)):
        a = np.frombuffer(wa[i], dtype=np.int64)
        b = np.frombuffer(wb[i], dtype=np.int64)
        inter = np.intersect1d(a, b, assume_unique=True).size
        union = a.size + b.size - inter
        jac[i] = inter / union if union else 0.0
    return jac


def minhash_neardup_documents(sf_dir: str, threshold: float = 0.8):
    """shingle→minhash→band→bucket groupby→candidate pairs→exact-Jaccard verify.

    No whole-corpus broadcast, no unbounded driver collect:

    1. band buckets emit candidate pairs; a bucket hotter than HOT_BAND_CAP
       does all-pairs over its first CAP ids and star-links the rest to the
       bucket minimum (O(M) instead of O(M²), cluster connectivity preserved
       for dedup; logged, never silent).
    2. verify: when the corpus is provably small (parquet metadata row count
       ≤ VERIFY_BROADCAST_MAX_DOCS), the doc token-hash matrix broadcasts
       (``ray.put`` once, zero-copy read per group) and exact Jaccard runs
       AFTER the pair-distinct — one verification per unique pair (the same
       pair surfaces from ~2 bands, so dedup-first halves the dominant
       kernel; the raw-pair exchange is 16 B/candidate); otherwise the
       verify is two bucketed map_groups joins (_attach_words) that never
       hold more than a salt bucket in memory.
    3. pair-distinct via a salted single-key groupby (N_DEDUP_BUCKETS groups,
       vectorized ``np.unique`` per group) — bounded group count instead of
       one group per pair.
    """
    import ray

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(minhash_signatures, batch_format="pyarrow", zero_copy_batch=True)

    def add_bucket_key(batch: pa.Table) -> pa.Table:
        # composite single int64 key; a coarse salt bucket (gbkt) is the
        # actual shuffle key — Ray 2.49 charges ~2 ms per group, so grouping
        # by the ~thousands of distinct band hashes directly dominates the
        # query. All rows of one bkey land in one gbkt, so pair emission
        # inside the coarse group is still exact per band bucket.
        bh = batch["band_hash"].to_numpy().astype(np.uint64)
        b = batch["band"].to_numpy().astype(np.uint64)
        key = splitmix64(bh ^ (b << np.uint64(56))).astype(np.int64)
        gbkt = (splitmix64(key.astype(np.uint64)) % np.uint64(N_DEDUP_BUCKETS)
                ).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"], "bkey": pa.array(key),
                         "gbkt": pa.array(gbkt)})

    keyed = sigs.map_batches(add_bucket_key, batch_format="pyarrow", zero_copy_batch=True)

    def _emit_pairs(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All-pairs (capped + star-linked) over one band bucket's doc ids."""
        if ids.size > HOT_BAND_CAP:
            import logging

            logging.getLogger(__name__).warning(
                "hot minhash band bucket (%d docs): star-linking beyond %d",
                ids.size, HOT_BAND_CAP)
            head = ids[:HOT_BAND_CAP]
            ai, bi = np.triu_indices(head.size, k=1)
            return (np.concatenate([head[ai], np.full(ids.size - HOT_BAND_CAP, ids[0])]),
                    np.concatenate([head[bi], ids[HOT_BAND_CAP:]]))
        ai, bi = np.triu_indices(ids.size, k=1)
        return ids[ai], ids[bi]

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()  # metadata-only
    broadcast = n_docs <= VERIFY_BROADCAST_MAX_DOCS
    state_ref = None
    if broadcast:
        blobs = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            _word_hash_table, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        # padded token matrix: each row is the doc's sorted distinct word
        # hashes padded with GLOBALLY-distinct negatives, so the per-pair
        # intersection is |dups| in sort(concat(rowA, rowB)) — a fully
        # vectorized (n, 2W) sort + adjacent-equal count, O(W log W) per pair
        # vs the O(W^2) broadcast-compare it replaces
        order = np.argsort(blobs.doc_id.to_numpy(), kind="mergesort")
        ids_sorted = blobs.doc_id.to_numpy()[order].astype(np.int64)
        arrs = [np.frombuffer(blobs.words.iloc[i], dtype=np.int64) for i in order]
        width = max((a.size for a in arrs), default=1) or 1
        mat = np.empty((len(arrs), width), dtype=np.int64)
        lens = np.empty(len(arrs), dtype=np.int64)
        for i, a in enumerate(arrs):
            mat[i, :a.size] = a
            mat[i, a.size:] = -(np.arange(a.size, width, dtype=np.int64)
                                + i * width + 1)
            lens[i] = a.size
        state_ref = ray.put((mat, lens, ids_sorted))

    def _verify_pairs(a: np.ndarray, b: np.ndarray,
                      state: tuple) -> np.ndarray:
        """Exact Jaccard for pair arrays against the broadcast token matrix
        (sorted-row concat + adjacent-equal count; pads globally distinct)."""
        smat, slens, sids = state
        ia = np.searchsorted(sids, a)
        ib = np.searchsorted(sids, b)
        w = smat.shape[1]
        c = np.empty((len(a), 2 * w), np.int64)
        np.take(smat, ia, axis=0, out=c[:, :w])
        np.take(smat, ib, axis=0, out=c[:, w:])
        c.sort(axis=1, kind="stable")
        inter = (c[:, 1:] == c[:, :-1]).sum(axis=1)
        union = slens[ia] + slens[ib] - inter
        return np.where(union > 0, inter / np.maximum(union, 1), 0.0)

    _PAIR_EMPTY = {"pair": pd.array([], dtype="int64"),
                   "bkt": pd.array([], dtype="int64")}

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs as one composite int64 key (a<<32|b), emitted
        segment-wise per bkey inside the coarse salt group. Pairs shuffle
        UNVERIFIED to the distinct stage: the same pair surfaces from ~2
        bands on the bench corpus (measured multiplicity 2.08x), so
        verifying after the distinct halves the exact-Jaccard work — the
        dominant stage — while the raw-pair exchange is only 16 B/candidate
        (~85 MB at 5.3M candidates, negligible next to the kernel)."""
        d = df.drop_duplicates(["bkey", "doc_id"]).sort_values(["bkey", "doc_id"])
        bk = d.bkey.to_numpy()
        ids = d.doc_id.to_numpy()
        # segment boundaries per bkey; skip singleton segments outright
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], bk.size]
        outs_a, outs_b = [], []
        for s, e in zip(starts, ends):
            if e - s >= 2:
                a, b = _emit_pairs(ids[s:e])
                outs_a.append(a)
                outs_b.append(b)
        if not outs_a:
            return pd.DataFrame(dict(_PAIR_EMPTY))
        a = np.concatenate(outs_a).astype(np.int64)
        b = np.concatenate(outs_b).astype(np.int64)
        if b.size and int(max(a.max(), b.max())) >= (1 << 31):
            # the composite pair key packs two ids into one SIGNED int64:
            # a << 32 overflows (and the arithmetic-shift decode breaks) at
            # a >= 2^31, not 2^32 — a corpus with larger doc ids needs a
            # (a, b) two-column dedupe instead; fail loudly rather than
            # silently alias pairs
            raise ValueError("doc_id >= 2^31: composite pair key would alias")
        pair = (a << 32) | b
        bkt = (splitmix64(pair.astype(np.uint64)) % np.uint64(N_DEDUP_BUCKETS)).astype(np.int64)
        return pd.DataFrame({"pair": pair, "bkt": bkt})

    candidates = keyed.groupby("gbkt").map_groups(bucket_pairs, batch_format="pandas")

    if broadcast:
        def dedup_then_verify(df: pd.DataFrame) -> pd.DataFrame:
            """Distinct pairs of this salt bucket, then ONE exact-Jaccard
            verification per unique pair against the broadcast token matrix
            (zero-copy ray.get per group)."""
            pair = np.unique(df.pair.to_numpy())
            a = (pair >> 32).astype(np.int64)
            b = (pair & 0xFFFFFFFF).astype(np.int64)
            jac = _round(_verify_pairs(a, b, ray.get(state_ref)), 4)
            keep = jac >= threshold
            return pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep],
                                 "jaccard": jac[keep]})

        return candidates.groupby("bkt").map_groups(dedup_then_verify,
                                                    batch_format="pandas")

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        pair = np.unique(df.pair.to_numpy())
        return pd.DataFrame({
            "doc_a": (pair >> 32).astype(np.int64),
            "doc_b": (pair & 0xFFFFFFFF).astype(np.int64),
        })

    uniq = candidates.groupby("bkt").map_groups(dedup_bucket, batch_format="pandas")

    # at-scale fallback: bucketed semi-join re-read, no driver state
    j = _attach_words(uniq, sf_dir, "doc_a", "words_a")
    j = _attach_words(j, sf_dir, "doc_b", "words_b")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            # union null-columns come back float64; doc ids < 2^32 are exact
            "doc_a": df.doc_a.to_numpy().astype(np.int64),
            "doc_b": df.doc_b.to_numpy().astype(np.int64),
            "jaccard": _round(_jaccard_blobs(df.words_a.to_numpy(),
                                             df.words_b.to_numpy()), 4),
        })
        return out[out.jaccard >= threshold]

    return j.map_batches(verify, batch_format="pandas")


def simhash_documents(sf_dir: str):
    """64-bit SimHash per document (token-hash bit-vote), deterministic."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def sim(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            ws = [w for w in (t or "").split(" ") if w]
            if not ws:
                continue
            h = hash64(np.asarray(ws, dtype=object))
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (bits * 2 - 1).sum(axis=0)
            sh = np.uint64(0)
            for k in range(64):
                if votes[k] > 0:
                    sh |= np.uint64(1) << np.uint64(k)
            out[i] = np.int64(sh.astype(np.int64))
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out)})

    return ds.map_batches(sim, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Token counting / quality scoring / language-ID — oracle-checkable
# ---------------------------------------------------------------------------


def token_stats_by_lang(sf_dir: str):
    ds = _read_docs(sf_dir, ["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = _tokens(df.text)
        df["n_tokens"] = toks.map(len)
        df["n_chars"] = df.text.fillna("").str.len()
        g = df.groupby("lang", sort=False).agg(
            n_docs=("lang", "size"), tok=("n_tokens", "sum"), chars=("n_chars", "sum")
        ).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "lang"
    ).aggregate(Sum("n_docs", alias_name="n_docs"), Sum("tok", alias_name="tok"),
                Sum("chars", alias_name="chars"))
    df = out.to_pandas()
    df["avg_tokens"] = _round(df.tok / df.n_docs, 4)
    df["avg_chars"] = _round(df.chars / df.n_docs, 4)
    return _pa_from_pandas(df.drop(columns=["tok", "chars"]), preserve_index=False)


TOKEN_STATS_SQL = """
WITH t AS (
  SELECT lang, len(list_filter(string_split(text,' '), x -> x <> '')) AS n_tokens,
         length(text) AS n_chars
  FROM documents)
SELECT lang, COUNT(*) AS n_docs,
  FLOOR(SUM(n_tokens)::DOUBLE/COUNT(*)*10000+0.5)/10000 AS avg_tokens,
  FLOOR(SUM(n_chars)::DOUBLE/COUNT(*)*10000+0.5)/10000 AS avg_chars
FROM t GROUP BY lang
"""


def quality_scores(sf_dir: str):
    """Per-document quality features: token count, distinct ratio, stopword
    ratio — the length/stopword heuristics of training-data quality filters."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = _tokens(df.text)
        n = toks.map(len).to_numpy()
        n_distinct = toks.map(lambda ws: len(set(ws))).to_numpy()
        n_stop = toks.map(lambda ws: sum(w in STOPWORDS for w in ws)).to_numpy()
        safe_n = np.maximum(n, 1)
        return pa.table({
            "doc_id": pa.array(df.doc_id.to_numpy()),
            "n_tokens": pa.array(n.astype(np.int64)),
            "n_distinct": pa.array(n_distinct.astype(np.int64)),
            "uniq_ratio": pa.array(_round(n_distinct / safe_n, 4)),
            "stop_ratio": pa.array(_round(n_stop / safe_n, 4)),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id,
  len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_distinct,
  FLOOR(len(list_distinct(toks))::DOUBLE / GREATEST(len(toks),1)*10000+0.5)/10000 AS uniq_ratio,
  FLOOR(len(list_filter(toks, x -> x IN ('the','a','of','and','to')))::DOUBLE
        / GREATEST(len(toks),1)*10000+0.5)/10000 AS stop_ratio
FROM t
"""


def vocab_drift_documents(sf_dir: str):
    """Vocabulary drift between the even-doc_id reference split and the
    odd-doc_id current split: out-of-vocabulary mass/type counts plus the
    Jensen-Shannon divergence (nats) between the two token unigram
    distributions — the vocabulary-shift companion to the numeric KS /
    categorical Chi² drift checks (a new domain's tokens move OOV mass and
    JS long before length marginals react).

    Shape: per-block (token-hash, side) partial counts materialized once
    and consumed twice — side totals via two tiny sums, then a salted
    token-hash bucket shuffle where each bucket folds its tokens' exact
    (ref, cur) counts into three partial reductions (JS terms, OOV mass,
    OOV types) against the closure-captured scalar totals. The driver sums
    ~n_buckets rows; token strings never shuffle (64-bit hashes stand in,
    the DUP_NGRAM collision contract)."""
    from .queries import _salt_buckets

    nb = _salt_buckets(sf_dir, "documents", rows_per_bucket=250_000, floor=32)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = _tokens(df.text)
        reps = toks.map(len).to_numpy()
        if not reps.sum():
            return pa.table({"h": pa.array([], pa.int64()),
                             "cr": pa.array([], pa.int64()),
                             "cc": pa.array([], pa.int64()),
                             "bkt": pa.array([], pa.int64())})
        allw = np.concatenate([np.asarray(ws, dtype=object) for ws in toks])
        h = hash64(allw).astype(np.int64)
        side = np.repeat(df.doc_id.to_numpy() % 2, reps)
        g = pd.DataFrame({"h": h, "r": (side == 0).astype(np.int64),
                          "c": (side == 1).astype(np.int64)}).groupby(
            "h", sort=False).agg(cr=("r", "sum"), cc=("c", "sum")).reset_index()
        g["bkt"] = (g.h.to_numpy().astype(np.uint64) % np.uint64(nb)
                    ).astype(np.int64)
        return _pa_from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    nr = float(parts.sum("cr") or 0)
    nc = float(parts.sum("cc") or 0)
    if nr == 0 or nc == 0:
        # a token-less split leaves OOV/JS undefined (the oracle's divisions
        # go NULL the same way) — report the counts and zeros, don't divide
        return pa.Table.from_pylist([{
            "n_ref_tokens": int(nr), "n_cur_tokens": int(nc),
            "oov_types": 0, "oov_rate": 0.0, "js_divergence": 0.0,
        }])

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=False).agg(cr=("cr", "sum"),
                                            cc=("cc", "sum"))
        p = g.cr.to_numpy(np.float64) / nr
        q = g.cc.to_numpy(np.float64) / nc
        m = (p + q) / 2
        with np.errstate(divide="ignore", invalid="ignore"):
            js = (0.5 * np.where(p > 0, p * np.log(np.where(p > 0, p, 1) / m), 0.0).sum()
                  + 0.5 * np.where(q > 0, q * np.log(np.where(q > 0, q, 1) / m), 0.0).sum())
        oov = g.cr.to_numpy() == 0
        return pd.DataFrame({
            "js_part": [float(js)],
            "oov_mass": [int(g.cc.to_numpy()[oov].sum())],
            "oov_types": [int((oov & (g.cc.to_numpy() > 0)).sum())],
        })

    folded = parts.groupby("bkt").map_groups(
        bucket_fold, batch_format="pandas").to_pandas()
    js = float(folded.js_part.sum())
    oov_mass = int(folded.oov_mass.sum())
    oov_types = int(folded.oov_types.sum())
    return pa.Table.from_pylist([{
        "n_ref_tokens": int(nr), "n_cur_tokens": int(nc),
        "oov_types": oov_types,
        "oov_rate": np.floor(float(oov_mass) * 1e6 / nc + 0.5) / 1e6,
        "js_divergence": np.floor(js * 1e6 + 0.5) / 1e6,
    }])


VOCAB_DRIFT_SQL = """
WITH tok AS (
  SELECT doc_id % 2 AS side,
         UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents),
c AS (SELECT w,
        SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END)::DOUBLE AS cr,
        SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END)::DOUBLE AS cc
      FROM tok GROUP BY w),
t AS (SELECT SUM(cr) AS nr, SUM(cc) AS nc FROM c),
j AS (SELECT
        SUM(CASE WHEN c.cr > 0 THEN
          0.5 * (c.cr / t.nr) * LN((c.cr / t.nr) / ((c.cr / t.nr + c.cc / t.nc) / 2))
          ELSE 0 END)
      + SUM(CASE WHEN c.cc > 0 THEN
          0.5 * (c.cc / t.nc) * LN((c.cc / t.nc) / ((c.cr / t.nr + c.cc / t.nc) / 2))
          ELSE 0 END) AS js,
        SUM(CASE WHEN c.cr = 0 THEN c.cc ELSE 0 END) AS oov_mass,
        SUM(CASE WHEN c.cr = 0 AND c.cc > 0 THEN 1 ELSE 0 END) AS oov_types
      FROM c, t GROUP BY ALL)
SELECT CAST(t.nr AS BIGINT) AS n_ref_tokens, CAST(t.nc AS BIGINT) AS n_cur_tokens,
       CAST(j.oov_types AS BIGINT) AS oov_types,
       FLOOR(j.oov_mass * 1e6 / t.nc + 0.5) / 1e6 AS oov_rate,
       FLOOR(j.js * 1e6 + 0.5) / 1e6 AS js_divergence
FROM j, t
"""


def langid_confusion(sf_dir: str):
    """Marker-word language-ID heuristic vs the labeled ``lang`` column;
    returns the confusion counts. Ties break by LANG_MARKERS order."""
    ds = _read_docs(sf_dir, ["text", "lang"])
    langs = list(LANG_MARKERS)

    def predict(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = _tokens(df.text)
        scores = np.zeros((len(df), len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            markers = set(LANG_MARKERS[lang])
            scores[:, li] = toks.map(lambda ws: sum(w in markers for w in ws)).to_numpy()
        pred = np.asarray(langs, dtype=object)[scores.argmax(axis=1)]
        g = pd.DataFrame({"lang": df.lang.to_numpy(), "pred_lang": pred}).groupby(
            ["lang", "pred_lang"], sort=False
        ).size().reset_index(name="n")
        return _pa_from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return ds.map_batches(predict, batch_format="pyarrow", zero_copy_batch=True).groupby(
        ["lang", "pred_lang"]
    ).aggregate(Sum("n", alias_name="n"))


LANGID_SQL = """
WITH t AS (
  SELECT lang, list_filter(string_split(text,' '), x -> x <> '') AS toks
  FROM documents),
s AS (
  SELECT lang,
    len(list_filter(toks, x -> x IN ('the','a','of'))) AS s_en,
    len(list_filter(toks, x -> x IN ('der','die','das'))) AS s_de,
    len(list_filter(toks, x -> x IN ('el','la','los'))) AS s_es,
    len(list_filter(toks, x -> x IN ('le','les','des'))) AS s_fr,
    len(list_filter(toks, x -> x IN ('de5','shi4','le5'))) AS s_zh
  FROM t)
SELECT lang,
  CASE GREATEST(s_en, s_de, s_es, s_fr, s_zh)
    WHEN s_en THEN 'en' WHEN s_de THEN 'de' WHEN s_es THEN 'es'
    WHEN s_fr THEN 'fr' ELSE 'zh' END AS pred_lang,
  COUNT(*) AS n
FROM s GROUP BY 1, 2
"""


def fingerprint_documents(sf_dir: str):
    """Rolling-hash document fingerprint (first 8 bytes of a polynomial hash
    over the token-hash sequence) — order-sensitive, unlike the set hashes."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        p = np.uint64(1099511628211)
        for i, t in enumerate(texts):
            ws = [w for w in (t or "").split(" ") if w]
            if not ws:
                continue
            h = hash64(np.asarray(ws, dtype=object))
            acc = np.uint64(14695981039346656037)
            for x in h:
                acc = (acc ^ x) * p
            out[i] = acc
        return pa.table({"doc_id": batch["doc_id"],
                         "fingerprint": pa.array(out.astype(np.int64))})

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Regex (BPE-ish) token counting — task list: "token counting (whitespace +
# a BPE-ish regex)". The whitespace variant is token_stats_by_lang above.
# ---------------------------------------------------------------------------

# letter runs | digit runs | single non-space symbol — a simplified GPT-2-style
# pre-tokenizer whose semantics RE2 (DuckDB) and Python `re` agree on
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


class _RegexTokenCounter:
    """Actor-pool stage: the pattern compiles once per actor (load-once state,
    reference singleton pattern), each batch is one vectorized pass."""

    def __init__(self, pattern: str):
        import re

        self.rx = re.compile(pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_numpy(zero_copy_only=False)
        n = np.fromiter(
            (len(self.rx.findall(t or "")) for t in texts), np.int64, len(texts))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_bpe_tokens": pa.array(n)})


def token_count_regex(sf_dir: str):
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(_RegexTokenCounter, fn_constructor_args=(BPE_TOKEN_PATTERN,),
                          batch_format="pyarrow", zero_copy_batch=True, concurrency=2)


TOKEN_REGEX_SQL = """
SELECT doc_id,
  len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT
    AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# Character n-gram Jaccard near-dup — the shingle-level dedup variant
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.8):
    """All-pairs character n-gram (shingle) Jaccard inside (lang, source)
    buckets — the n-gram-level sibling of word-set ``jaccard_neardup_pairs``
    (at scale the MinHash banding replaces the all-pairs step; this is the
    oracle-exact variant). Gram sets are hashed to int64 so the per-pair
    intersect is a sorted-array op, not Python string sets."""
    from ..functions.hashing import hash64

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang", "source"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        ids = df.doc_id.to_numpy()
        grams = []
        for t in df.text.to_numpy():
            t = t or ""
            gs = {t[i:i + n] for i in range(len(t) - n + 1)}
            grams.append(np.unique(hash64(np.asarray(sorted(gs), dtype=object)))
                         if gs else np.empty(0, np.uint64))
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(grams[i], grams[j], assume_unique=True).size
                union = grams[i].size + grams[j].size - inter
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), float(_round(jac, 4))))
        if not rows:
            return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                                 "doc_b": pd.array([], dtype="int64"),
                                 "jaccard": pd.array([], dtype="float64")})
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    return ds.groupby(["lang", "source"]).map_groups(pairs, batch_format="pandas")


NGRAM_JACCARD_SQL = """
WITH d AS (
  SELECT doc_id, lang, source,
    list_distinct(list_transform(range(1, length(text)-1),
                                 i -> substr(text, i::INT, 3))) AS grams
  FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  FLOOR(len(list_intersect(a.grams,b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams,b.grams)))*10000+0.5)/10000 AS jaccard
FROM d a JOIN d b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams,b.grams))::DOUBLE
      / len(list_distinct(list_concat(a.grams,b.grams))) >= 0.8
"""


# ---------------------------------------------------------------------------
# Inverted index + TF-IDF — the posting-list builds behind corpus search and
# term-weighting in training-data pipelines
# ---------------------------------------------------------------------------

VOCAB_BROADCAST_MAX = 2_000_000  # df-map broadcast gate (~100 MB of tokens)


def _explode_tokens(batch: pa.Table, distinct: bool) -> pd.DataFrame:
    """(doc_id, token) rows for a batch — one row per (doc, distinct token)
    or per token occurrence; tokenizer parity with the oracle SQL
    (whitespace split, empties dropped)."""
    df = batch.to_pandas()
    toks = _tokens(df.text)
    if distinct:
        toks = toks.map(lambda ws: sorted(set(ws)))
    ex = (df[["doc_id"]].assign(token=toks).explode("token")
          .dropna(subset=["token"]))
    return ex


def inverted_index_documents(sf_dir: str):
    """Distributed inverted-index build: token → document frequency + the
    doc_id-sorted posting list (csv string — scalar and hash-stable; a real
    sink would write a parquet ``list<int64>`` column partitioned by bucket).

    Shape: per-batch explode of distinct (doc, token) pairs → ONE shuffle
    salted by hash(token) into a row-count-scaled bucket count (all rows of
    a token land in the same bucket, so df/postings are exact) → per-bucket
    vectorized pandas groupby builds every posting list in that bucket. No
    driver collect; the shuffle carries one int64+token row per
    (doc, distinct token)."""
    from .queries import _salt_buckets

    n_buckets = _salt_buckets(sf_dir, "documents", rows_per_bucket=250_000)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, distinct=True)
        tok = ex["token"].to_numpy(dtype=object)
        bkt = (hash64(tok) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "token": pa.array(tok, type=pa.string()),
            "doc_id": pa.array(ex["doc_id"].to_numpy().astype(np.int64)),
            "bkt": pa.array(bkt),
        })

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        out = g.groupby("token", sort=False)["doc_id"].agg(
            df="size", postings=lambda s: ",".join(map(str, s.to_numpy())))
        out = out.reset_index()
        out["df"] = out["df"].astype(np.int64)
        return out[["token", "df", "postings"]]

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return exploded.groupby("bkt").map_groups(build, batch_format="pandas")


INVERTED_INDEX_SQL = """
WITH tok AS (
  SELECT doc_id,
    unnest(list_distinct(list_filter(string_split(text,' '), x -> x <> '')))
      AS token
  FROM documents)
SELECT token, COUNT(*)::BIGINT AS df,
       STRING_AGG(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM tok GROUP BY token
"""


PARTIALS_COLLECT_MAX = 8_000_000  # blocks x vocab rows the driver will merge


def _tfidf_two_shuffle(sf_dir: str, n_docs: int):
    """Open-vocabulary TF-IDF path — no driver collect at all: shuffle the
    per-doc tf rows by hash(token) (every row of a token lands in one
    bucket, so df is a vectorized within-bucket ``transform("size")``), then
    re-shuffle the scored rows by hash(doc_id) and take each doc's top term
    with one sort + drop_duplicates per bucket."""
    from .queries import _salt_buckets

    n_buckets = _salt_buckets(sf_dir, "documents", rows_per_bucket=250_000)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tf_explode(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, distinct=False)
        g = (ex.groupby(["doc_id", "token"], sort=False).size()
             .reset_index(name="tf"))
        tok = g["token"].to_numpy(dtype=object)
        bkt = (hash64(tok) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy().astype(np.int64)),
            "token": pa.array(tok, type=pa.string()),
            "tf": pa.array(g["tf"].to_numpy().astype(np.int64)),
            "bkt": pa.array(bkt),
        })

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dfreq = g.groupby("token", sort=False)["doc_id"].transform("size")
        score = _round(g["tf"].to_numpy()
                       * np.log(float(n_docs) / dfreq.to_numpy()), 6)
        out = g[["doc_id", "token"]].copy()
        out["score"] = score
        out["dbkt"] = (splitmix64(out["doc_id"].to_numpy().astype(np.uint64))
                       % np.uint64(n_buckets)).astype(np.int64)
        return out

    def top_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.drop_duplicates("doc_id")
        return pd.DataFrame({"doc_id": top["doc_id"].to_numpy(),
                             "top_term": top["token"].to_numpy(),
                             "score": top["score"].to_numpy()})

    scored = (ds.map_batches(tf_explode, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("bkt").map_groups(score_bucket, batch_format="pandas"))
    return scored.groupby("dbkt").map_groups(top_per_doc, batch_format="pandas")


def tfidf_top_terms(sf_dir: str):
    """Top TF-IDF term per document: score = tf · ln(n_docs / df), ranked on
    the 1e-6-quantized score (quantization computed identically in the oracle
    so the argmax is cross-engine stable), ties broken by token ascending.

    Fast path (bounded vocabulary — zero shuffles): the document-frequency
    map is a bounded-cardinality aggregate — per-block (token, partial_df)
    partials pre-aggregate inside ``map_batches``, merge on the driver, and
    broadcast via ``ray.put``; the scoring pass picks each doc's top term
    inside its own batch (a doc never spans batches, so the per-doc argmax
    is batch-local). Open-vocabulary corpora route to the two-shuffle
    salted-bucket path instead — both gates (partial-row collect, merged
    broadcast size) are checked BEFORE anything large reaches the driver."""
    import ray

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()  # metadata-only

    def df_partial(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, distinct=True)
        g = ex.groupby("token", sort=False).size().reset_index(name="n")
        return pa.table({"token": pa.array(g["token"].to_numpy(dtype=object),
                                           type=pa.string()),
                         "n": pa.array(g["n"].to_numpy().astype(np.int64))})

    parts_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        df_partial, batch_format="pyarrow", zero_copy_batch=True).materialize()
    if parts_ds.count() > PARTIALS_COLLECT_MAX:
        return _tfidf_two_shuffle(sf_dir, n_docs)
    partials = parts_ds.to_pandas()
    dfreq = partials.groupby("token", sort=True)["n"].sum()
    # gate on the MERGED vocabulary (what actually broadcasts), not the
    # blocks x vocab partial rows which scale with parallelism
    if len(dfreq) > VOCAB_BROADCAST_MAX:
        return _tfidf_two_shuffle(sf_dir, n_docs)
    vocab = dfreq.index.to_numpy(dtype=object)  # sorted ⇒ searchsorted below
    idf = np.log(float(n_docs) / dfreq.to_numpy().astype(np.float64))
    wrapped = {"ref": ray.put((vocab, idf))}

    def score_batch(batch: pa.Table) -> pa.Table:
        voc, idf_arr = ray.get(wrapped["ref"])
        ex = _explode_tokens(batch, distinct=False)
        g = (ex.groupby(["doc_id", "token"], sort=False).size()
             .reset_index(name="tf"))
        tok = g["token"].to_numpy(dtype=object)
        pos = np.searchsorted(voc, tok)  # every token is in the fitted vocab
        g["score"] = _round(g["tf"].to_numpy() * idf_arr[pos], 6)
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.drop_duplicates("doc_id")
        return pa.table({
            "doc_id": pa.array(top["doc_id"].to_numpy().astype(np.int64)),
            "top_term": pa.array(top["token"].to_numpy(dtype=object),
                                 type=pa.string()),
            "score": pa.array(top["score"].to_numpy()),
        })

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(score_batch, batch_format="pyarrow", zero_copy_batch=True)


TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id,
    unnest(list_filter(string_split(text,' '), x -> x <> '')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, COUNT(*)::BIGINT AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (
  SELECT token, COUNT(*)::BIGINT AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token,
    FLOOR(tf.tf * ln((SELECT COUNT(*) FROM documents)::DOUBLE / dfreq.df)
          * 1000000 + 0.5) / 1000000 AS score
  FROM tf JOIN dfreq USING (token))
SELECT doc_id, token AS top_term, score
FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) = 1
"""


# ---------------------------------------------------------------------------
# Text normalization — the §2.2 parser/cleaner stage of ingest pipelines
# ---------------------------------------------------------------------------


def normalize_arrow(x):
    """Canonical text cleanup kernel: lowercase → strip non-[a-z0-9 ] →
    collapse space runs → trim. The ONE implementation behind
    ``normalize_text_documents`` and the corpus funnel's dedup key, so the
    NORMALIZE_SQL regex parity holds everywhere it's used."""
    import pyarrow.compute as pc

    x = pc.utf8_lower(x)
    x = pc.replace_substring_regex(x, "[^a-z0-9 ]", "")
    x = pc.replace_substring_regex(x, " +", " ")
    return pc.utf8_trim_whitespace(x)


def shingle_hits(evs: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Membership of shingle hashes ``h`` in the sorted eval set ``evs``
    (empty-set safe). Shared by ``decontaminate_documents`` and the corpus
    funnel so the probe semantics can't drift."""
    if evs.size == 0:
        return np.zeros(h.shape, bool)
    pos = np.searchsorted(evs, h)
    return (pos < evs.size) & (evs[np.minimum(pos, evs.size - 1)] == h)


def normalize_text_documents(sf_dir: str):
    """Canonical text cleanup via ``normalize_arrow``: pure zero-copy
    ``pyarrow.compute`` kernels (both engines run RE2, so regex semantics
    match the oracle byte-for-byte) — the shape of every
    normalization/parsing pass in a training-data ingest pipeline:
    stateless, vectorized, no shuffle."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "norm_text": normalize_arrow(batch["text"])})

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


NORMALIZE_SQL = """
SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                      ' +', ' ', 'g')) AS norm_text
FROM documents
"""


# ---------------------------------------------------------------------------
# LLM training-data shaping: overlapping token-window chunking (flat-map
# expansion) and GPT-style sequence packing (distributed ordered prefix-sum).
# ---------------------------------------------------------------------------


def chunk_counts(n: np.ndarray, window: int, stride: int) -> np.ndarray:
    """Chunks per document: 1 when n <= window, else
    ceil((n - window) / stride) + 1 — the ONE implementation behind
    chunk_documents and its property tests."""
    return np.where(np.asarray(n) <= window, 1,
                    ((np.asarray(n) - window + stride - 1) // stride + 1)
                    ).astype(np.int64)


def chunk_documents(sf_dir: str, window: int = 32, stride: int = 24):
    """Overlapping token-window chunking — the flat-map every LLM training
    pipeline runs before tokenization: each document expands to
    ``ceil((n-window)/stride)+1`` chunks of ``window`` whitespace tokens
    advancing by ``stride`` (docs at or under one window yield one chunk).

    Per batch the chunk count/offset math is fully vectorized (np.repeat +
    exclusive-cumsum index arithmetic over one flattened token array); the
    final chunk-string assembly is O(output bytes) — inherent to emitting
    strings — never a per-token Python loop. Row expansion happens inside
    map_batches, so downstream backpressure sees the expanded size."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def expand(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = _tokens(df.text)
        n = toks.str.len().to_numpy(dtype=np.int64)
        flat = np.concatenate([np.array(t, dtype=object) for t in toks]
                              ) if n.sum() else np.array([], dtype=object)
        doc_start = np.concatenate(([0], np.cumsum(n)[:-1]))
        n_chunks = chunk_counts(n, window, stride)
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(len(df)), n_chunks)
        first = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_idx = np.arange(total) - np.repeat(first, n_chunks)
        start = chunk_idx * stride
        end = np.minimum(start + window, n[doc_idx])
        a = doc_start[doc_idx] + start
        b = doc_start[doc_idx] + end
        chunks = [" ".join(flat[lo:hi]) for lo, hi in zip(a, b)]
        return pa.table({
            "doc_id": pa.array(df.doc_id.to_numpy()[doc_idx], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(end - start, pa.int64()),
            "chunk": pa.array(chunks, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


CHUNK_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents),
n AS (SELECT doc_id, w, len(w) AS n FROM t),
c AS (SELECT doc_id, w, n,
        UNNEST(generate_series(0,
          CASE WHEN n <= 32 THEN 0
               ELSE CAST(CEIL((n - 32) / 24.0) AS BIGINT) END)) AS chunk_idx
      FROM n)
SELECT doc_id, chunk_idx,
  LEAST(chunk_idx * 24 + 32, n) - chunk_idx * 24 AS n_tokens,
  array_to_string(w[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ') AS chunk
FROM c
"""


def pack_sequences_documents(sf_dir: str, budget: int = 512):
    """GPT-style sequence packing: documents are concatenated in doc_id
    order and cut into fixed ``budget``-token packs; each doc gets
    ``pack_id = tokens_before // budget`` and its offset within the pack.

    The global ordered prefix-sum is distributed as a two-level scan: docs
    are range-bucketed by doc_id (order-preserving, unlike a hash), each
    bucket's token SUM (one small row per bucket) is exclusive-prefix-summed
    on the driver, and the per-bucket offsets go back into a per-bucket
    vectorized cumsum. No stage holds more than one bucket; the driver holds
    one row per bucket. The (doc_id, n_tokens, bkt) projection is
    materialized once so the sum pass and the scan pass don't recount
    tokens."""
    import ray

    from .queries import _salt_buckets

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    # max over the id-only projection: never decode the text column for it
    max_id = _read_docs(sf_dir, ["doc_id"]).max("doc_id")
    # bucket count scales with rows so one bucket never outgrows a worker;
    # floor 16 (not 64): the repartition + two groupbys all charge per
    # bucket, and 16 already saturates the scan stage at this fan-in
    n_buckets = _salt_buckets(sf_dir, "documents", rows_per_bucket=2_000_000,
                              floor=16)
    rng = max(1, (int(max_id) + n_buckets) // n_buckets)

    def count(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = _tokens(df.text).str.len().to_numpy(dtype=np.int64)
        ids = df.doc_id.to_numpy()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n, pa.int64()),
                         "bkt": pa.array(ids // rng, pa.int64())})

    # cap the int-projection's block count before materializing: both
    # consumers (bucket sums + the scan) pay per-block fixed costs
    tagged = ds.map_batches(count, batch_format="pyarrow",
                            zero_copy_batch=True).repartition(
        n_buckets).materialize()
    sums = tagged.groupby("bkt").sum("n_tokens").to_pandas().sort_values("bkt")
    offs = dict(zip(sums.bkt.to_numpy(),
                    np.concatenate(([0], np.cumsum(sums["sum(n_tokens)"]
                                                   .to_numpy())[:-1]))))
    offs_ref = ray.put(offs)  # small: one int per bucket

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(offs_ref)[int(df.bkt.iloc[0])]
        df = df.sort_values("doc_id")
        n = df.n_tokens.to_numpy()
        before = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pd.DataFrame({"doc_id": df.doc_id.to_numpy(),
                             "n_tokens": n,
                             "pack_id": before // budget,
                             "offset_in_pack": before % budget})

    return tagged.groupby("bkt").map_groups(scan, batch_format="pandas")


PACK_SQL = """
WITH t AS (
  SELECT doc_id,
    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS before
  FROM t)
SELECT doc_id, n_tokens, before // 512 AS pack_id,
       before % 512 AS offset_in_pack
FROM s
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination + source mixing (LLM corpus hygiene ops).
# ---------------------------------------------------------------------------

_SHINGLE_SEEDS = splitmix64(np.arange(1, 65, dtype=np.uint64) ^ np.uint64(0xDECAF))


def _shingle_hashes(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All n-token shingle hashes of each text: (uint64 hashes, doc index).

    Token hashes are combined per window with position-seeded splitmix64
    (vectorized over a (n_shingles, n) fancy-indexed matrix — no per-doc
    loop). Injective w.r.t. the space-joined shingle string (tokens contain
    no spaces), so hash equality == string equality up to negligible 64-bit
    collisions; the oracle compares the strings directly."""
    toks = _tokens(texts)
    counts = toks.str.len().to_numpy(np.int64)
    if counts.sum() == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    th = hash64(flat)
    doc_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
    n_sh = np.maximum(counts - (n - 1), 0)
    total = int(n_sh.sum())
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    doc_idx = np.repeat(np.arange(len(counts)), n_sh)
    first = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
    local = np.arange(total) - np.repeat(first, n_sh)
    start = doc_start[doc_idx] + local
    win = th[start[:, None] + np.arange(n)[None, :]]
    h = np.zeros(total, np.uint64)
    for j in range(n):
        h ^= splitmix64(win[:, j] ^ _SHINGLE_SEEDS[j])
    return splitmix64(h), doc_idx


def decontaminate_documents(sf_dir: str, n: int = 8, eval_mod: int = 29):
    """Benchmark decontamination: flag every training document that shares
    any ``n``-token shingle with the eval set (docs with
    ``doc_id % eval_mod == 0`` stand in for the benchmark corpus).

    Scale shape: eval shingle hashes are built distributed (per-batch
    filter + unique), collected once — bounded because eval sets are small
    by construction (~1/eval_mod of the corpus here; real benchmarks are
    KBs) — broadcast with ray.put, and probed per training batch with one
    sorted-searchsorted membership test + bincount per-doc OR. The training
    corpus itself never leaves its batches."""
    import ray

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def eval_shingles(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.doc_id % eval_mod == 0]
        h, _ = _shingle_hashes(df.text, n)
        return pa.table({"h": pa.array(np.unique(h))})

    ev = np.unique(
        ds.map_batches(eval_shingles, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas().h.to_numpy()
    ).astype(np.uint64)
    ev_ref = ray.put(ev)  # sorted; small by construction

    def probe(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.doc_id % eval_mod != 0]
        h, doc_idx = _shingle_hashes(df.text, n)
        hit = shingle_hits(ray.get(ev_ref), h)
        cont = np.bincount(doc_idx[hit], minlength=len(df)) > 0
        return pa.table({"doc_id": pa.array(df.doc_id.to_numpy(), pa.int64()),
                         "contaminated": pa.array(cont)})

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


DECONTAMINATE_SQL = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents),
ev AS (
  SELECT DISTINCT array_to_string(w[s : s + 7], ' ') AS sh
  FROM tok, LATERAL UNNEST(generate_series(1, GREATEST(len(w) - 7, 0))) AS g(s)
  WHERE doc_id % 29 = 0),
tr AS (SELECT doc_id, w FROM tok WHERE doc_id % 29 <> 0),
sh AS (
  SELECT doc_id, array_to_string(w[s : s + 7], ' ') AS sh
  FROM tr, LATERAL UNNEST(generate_series(1, GREATEST(len(w) - 7, 0))) AS g(s)),
bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev e ON s.sh = e.sh)
SELECT t.doc_id, (t.doc_id IN (SELECT doc_id FROM bad)) AS contaminated
FROM tr t
"""


def mix_sources_documents(sf_dir: str):
    """Deterministic source mixing (corpus reweighting): even-numbered
    sources keep every doc, odd-numbered keep 25%, decided per row by the
    same order-free Knuth-hash bucket the split/sample ops use — a pure
    per-batch filter + per-source partial count, no payload shuffle, stable
    under any task order / resume."""
    ds = _read_docs(sf_dir, ["doc_id", "source"])

    from .queries import _knuth_bucket

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        srcnum = df.source.str[3:].astype(np.int64)
        pct = np.where(srcnum % 2 == 0, 100, 25)  # keep-rate in bucket points
        bkt = _knuth_bucket(df.doc_id.to_numpy())
        g = (pd.DataFrame({"source": df.source,
                           "keep": (bkt < pct).astype(np.int64)})
             .groupby("source").agg(n_in=("keep", "size"),
                                    n_sampled=("keep", "sum")).reset_index())
        return _pa_from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True
                         ).groupby("source").aggregate(
        Sum("n_in", alias_name="n_in"),
        Sum("n_sampled", alias_name="n_sampled"),
    ).to_pandas()
    out["n_in"] = out.n_in.astype(np.int64)
    out["n_sampled"] = out.n_sampled.astype(np.int64)
    return _pa_from_pandas(out, preserve_index=False)


MIX_SOURCES_SQL = """
SELECT source, COUNT(*) AS n_in,
  COUNT(*) FILTER (((doc_id % 4096) * 2654435761) % 4294967296 <
    CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 0
         THEN 4294967296 ELSE 1073741824 END) AS n_sampled
FROM documents GROUP BY source
"""


def bpe_pair_counts(sf_dir: str, k: int = 20):
    """Vocabulary induction's inner loop (byte-level BPE, GPT-2 style): the
    top-k most frequent ADJACENT byte pairs within words across the corpus.

    Per batch the whole text slice is joined with a space separator and
    encoded once; pair codes are one vectorized ``b[:-1]*256 + b[1:]`` over
    the byte buffer with separator-adjacent pairs masked out, counted with
    one bincount(2^16). Each block emits only its nonzero (pair, n) rows —
    a <= 65k-row partial regardless of block size — and the global merge is
    a pair-cardinality groupby + driver top-k. Byte pairs == char pairs on
    this ASCII corpus, which is what the character-based oracle compares."""
    ds = _read_docs(sf_dir, ["text"])
    sep = ord(" ")

    def partial(batch: pa.Table) -> pa.Table:
        txt = " ".join(batch["text"].to_pylist())
        b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
        if b.size < 2:
            return pa.table({"pair_code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        lo, hi = b[:-1], b[1:]
        mask = (lo != sep) & (hi != sep)
        codes = lo[mask].astype(np.int64) * 256 + hi[mask]
        counts = np.bincount(codes, minlength=65536)
        nz = np.flatnonzero(counts)
        return pa.table({"pair_code": pa.array(nz.astype(np.int64)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True
                         ).groupby("pair_code").aggregate(
        Sum("n", alias_name="n")).to_pandas()
    agg["pair"] = [chr(c // 256) + chr(c % 256) for c in agg.pair_code]
    agg = agg.sort_values(["n", "pair"], ascending=[False, True]).head(k)
    return pa.table({"pair": pa.array(agg.pair.to_numpy(), pa.string()),
                     "n": pa.array(agg.n.to_numpy(), pa.int64())})


BPE_PAIRS_SQL = """
WITH w AS (
  SELECT UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents),
p AS (
  SELECT substr(word, s, 2) AS pair
  FROM w, LATERAL UNNEST(generate_series(1, len(word) - 1)) AS g(s))
SELECT pair, COUNT(*) AS n FROM p
GROUP BY pair ORDER BY n DESC, pair LIMIT 20
"""


# ---------------------------------------------------------------------------
# Full BPE trainer — the iterative merge-until-vocab-K driver on top of the
# bpe_pair_counts inner loop (kmeans_embeddings shape: bounded rounds,
# broadcast merge table, per-block partials)
# ---------------------------------------------------------------------------

BPE_MERGES = 30               # default merge budget (vocab = 256 base + K)
BPE_DRIVER_MAX_TYPES = 2_000_000  # word-TYPE gate for the driver merge loop


def _bpe_apply_merges(word: str, merges: list) -> list:
    """Apply the learned merge table to one word, greedily left-to-right in
    merge-rank order — the canonical BPE segmentation. O(len × n_merges);
    both training paths share it so they cannot diverge."""
    seq = list(word)
    for left, right in merges:
        i, out = 0, []
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def _bpe_pair_counts_of(seqs, counts) -> dict:
    """Weighted adjacent-pair counts over symbol sequences — the exact
    inner statistic both paths argmax over."""
    pc: dict = {}
    for seq, c in zip(seqs, counts):
        for a, b in zip(seq, seq[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + int(c)
    return pc


def _bpe_best(pc: dict):
    """Deterministic merge choice: max count, then lexicographically
    smallest (left, right) — integer counts, so the argmax is identical at
    any parallelism level."""
    (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    return left, right, n


def bpe_train_documents(sf_dir: str, n_merges: int = BPE_MERGES):
    """Full BPE vocabulary trainer: distributed word-TYPE counting, then
    ``n_merges`` rounds of (pair-count → argmax → merge) over the type
    table. Returns the merge table — (merge_rank, left, right, merged, n)
    — the artifact a tokenizer loads.

    Scale shape (the uniqueness-screen idiom): training runs on word TYPES
    weighted by frequency, never on the corpus — the distributed count
    collapses 100 TB of text to a type table bounded by vocabulary size.
    Under ``BPE_DRIVER_MAX_TYPES`` (gate decided by a Dataset count(), no
    collect) the merge loop folds on the driver; above it, each round is a
    per-block pair-count partial over the materialized type table with the
    merge table broadcast per round and only bounded (left, right, n)
    partials leaving the blocks — kmeans_embeddings' bounded-round shape.
    Counts are exact integer sums and ties break lexicographically, so the
    merge table is bit-identical across parallelism levels AND between the
    two paths (forced-path parity + independent-reference tests pin both).
    Stops early when no pair repeats (best n < 2)."""
    from .queries import _salt_buckets

    nb = _salt_buckets(sf_dir, "documents", rows_per_bucket=1_000_000,
                       floor=16)
    ds = _read_docs(sf_dir, ["text"])

    def word_partial(batch: pa.Table) -> pa.Table:
        toks = _tokens(batch.to_pandas().text)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        if flat.size == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bkt": pa.array([], pa.int64())})
        words, counts = np.unique(flat, return_counts=True)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "n": pa.array(counts.astype(np.int64)),
            "bkt": pa.array((hash64(words) % np.uint64(nb)).astype(np.int64)),
        })

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", sort=False).n.sum().reset_index()
        g["n"] = g.n.astype(np.int64)
        return g[["word", "n"]]

    types = (ds.map_batches(word_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("bkt").map_groups(bucket_sum, batch_format="pandas")
             .materialize())

    merges: list = []          # [(left, right)] in rank order
    rows: list = []            # output rows incl. counts
    if types.count() <= BPE_DRIVER_MAX_TYPES:
        tdf = types.to_pandas()
        seqs = [list(w) for w in tdf.word.to_numpy()]
        counts = tdf.n.to_numpy()
        for r in range(n_merges):
            pc = _bpe_pair_counts_of(seqs, counts)
            if not pc:
                break
            left, right, n = _bpe_best(pc)
            if n < 2:
                break
            merges.append((left, right))
            rows.append((r, left, right, left + right, n))
            merged = left + right
            for si, seq in enumerate(seqs):
                if left in seq and right in seq:
                    seqs[si] = _bpe_merge_one(seq, left, right, merged)
    else:
        import ray

        for r in range(n_merges):
            mref = {"ref": ray.put(list(merges))}

            def pair_partial(batch: pa.Table, _m=mref) -> pa.Table:
                import ray as _ray

                ms = _ray.get(_m["ref"])
                seqs = [_bpe_apply_merges(w, ms)
                        for w in batch["word"].to_pylist()]
                pc = _bpe_pair_counts_of(seqs, batch["n"].to_numpy())
                if not pc:
                    return pa.table({"left": pa.array([], pa.string()),
                                     "right": pa.array([], pa.string()),
                                     "n": pa.array([], pa.int64()),
                                     "bkt": pa.array([], pa.int64())})
                ls, rs = zip(*pc.keys())
                key = np.array([a + "\x00" + b for a, b in pc.keys()],
                               dtype=object)
                return pa.table({"left": pa.array(ls, pa.string()),
                                 "right": pa.array(rs, pa.string()),
                                 "n": pa.array(list(pc.values()), pa.int64()),
                                 "bkt": pa.array((hash64(key) % np.uint64(nb)
                                                  ).astype(np.int64))})

            def pair_sum(df: pd.DataFrame) -> pd.DataFrame:
                g = df.groupby(["left", "right"], sort=False).n.sum()
                return g.reset_index()[["left", "right", "n"]]

            # bucket-aggregate BEFORE collecting: the driver sees at most
            # one row per distinct pair (≤ ~(256+K)² symbols), never the
            # blocks × pairs partial fan-out — at 10^5-block corpus scale
            # the raw partials would be a driver collapse
            parts = (types.map_batches(pair_partial, batch_format="pyarrow",
                                       zero_copy_batch=True)
                     .groupby("bkt").map_groups(pair_sum,
                                                batch_format="pandas")
                     .to_pandas())
            if not len(parts):
                break
            pc = {(l, r): int(v) for l, r, v in
                  zip(parts.left, parts.right, parts.n)}
            left, right, n = _bpe_best(pc)
            if n < 2:
                break
            merges.append((left, right))
            rows.append((r, left, right, left + right, n))

    if not rows:
        return pa.table({"merge_rank": pa.array([], pa.int64()),
                         "left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "merged": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    rk, ls, rs, mg, ns = zip(*rows)
    return pa.table({"merge_rank": pa.array(rk, pa.int64()),
                     "left": pa.array(ls, pa.string()),
                     "right": pa.array(rs, pa.string()),
                     "merged": pa.array(mg, pa.string()),
                     "n": pa.array(ns, pa.int64())})


_BPE_MERGE_CACHE: dict = {}


def bpe_tokenize_documents(sf_dir: str, n_merges: int = BPE_MERGES):
    """Tokenize the corpus WITH the trained BPE vocabulary — the consumer
    half of ``bpe_train_documents``: train (or reuse) the merge table, then
    one stateless distributed pass applies it per document and emits
    (doc_id, n_bpe_tokens, n_chars_tokenized) — the pre-training length
    accounting a data pipeline feeds into packing/budgeting.

    Scale shape: the merge table is a ≤ n_merges-row broadcast (``ray.put``
    once, read per worker); segmentation memoizes per distinct WORD within
    each batch (Zipf means a block re-sees its head words constantly), so
    per-batch cost tracks distinct words, not tokens. No shuffle at all —
    the corpus pass is embarrassingly parallel. The trainer run is
    memoized per (source content fingerprint, n_merges) in-process, so a
    sweep that runs train + tokenize pays the trainer once; a deployment
    would persist the merge table as an artifact (state/reference.py
    shape). Rows-only (BPE application is not SQL-expressible); pinned by
    a per-doc pure-python reference parity test."""
    import os

    import ray

    st = os.stat(f"{sf_dir}/documents.parquet")
    key = (sf_dir, st.st_size, st.st_mtime_ns, n_merges)
    merges = _BPE_MERGE_CACHE.get(key)
    if merges is None:
        merges_tbl = bpe_train_documents(sf_dir, n_merges).to_pandas()
        merges = list(zip(merges_tbl.left, merges_tbl.right))
        _BPE_MERGE_CACHE.clear()  # one live corpus at a time — no leak
        _BPE_MERGE_CACHE[key] = merges
    wrapped = {"ref": ray.put(merges)}
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tokenize(batch: pa.Table) -> pa.Table:
        ms = ray.get(wrapped["ref"])
        memo: dict = {}

        def n_tok(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = memo[w] = len(_bpe_apply_merges(w, ms))
            return n

        ids = batch["doc_id"].to_numpy()
        counts, chars = [], []
        for s in batch["text"].to_pylist():
            # NULL text tokenizes to zero words — same fillna("") semantics
            # as the trainer's _tokens() path
            ws = [w for w in (s or "").split(" ") if w]
            counts.append(sum(n_tok(w) for w in ws))
            chars.append(sum(len(w) for w in ws))
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "n_bpe_tokens": pa.array(counts, pa.int64()),
                         "n_chars_tokenized": pa.array(chars, pa.int64())})

    return ds.map_batches(tokenize, batch_format="pyarrow",
                          zero_copy_batch=True)


def _bpe_merge_one(seq: list, left: str, right: str, merged: str) -> list:
    """One-pair greedy left-to-right merge over a symbol sequence."""
    i, out = 0, []
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


# ---------------------------------------------------------------------------
# Per-source cap (domain-cap sampling): keep at most N docs per source
# ---------------------------------------------------------------------------


def cap_per_source_documents(sf_dir: str, n: int = 10):
    """Deterministic per-source cap — the "at most N pages per domain"
    corpus-balancing op: keep the n smallest doc_ids of every source.

    Ray shape: per-block partial cap first (each block can contribute at
    most n rows per source it touches), then a salted-bucket groupby on
    hash(source) — never one Ray group per source, so 10^7 web domains cost
    a fixed bucket count — with one vectorized sort + groupby-head per
    bucket. Shuffle volume is ≤ n × sources × blocks rows, independent of
    corpus size."""
    from .queries import _salt_buckets

    nb = _salt_buckets(sf_dir, "documents", rows_per_bucket=1_000_000,
                       floor=16)
    ds = _read_docs(sf_dir, ["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values("doc_id", kind="mergesort")
        df = df.groupby("source", sort=False).head(n)
        df["bkt"] = (hash64(df.source.to_numpy()) % nb).astype(np.int64)
        return _pa_from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("doc_id", kind="mergesort")
        return d.groupby("source", sort=False).head(n)[["doc_id", "source"]]

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).groupby("bkt").map_groups(
        final, batch_format="pandas")


CAP_PER_SOURCE_SQL = """
SELECT doc_id, source FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) <= 10
"""


# ---------------------------------------------------------------------------
# Repetition signal: top-bigram fraction per document (quality filtering)
# ---------------------------------------------------------------------------


def bigram_repetition_documents(sf_dir: str):
    """Fraction of a doc's word-bigrams taken by its most frequent bigram —
    the repetition quality signal (boilerplate/spam detector) from published
    corpus-filtering recipes. Stateless map_batches; per doc the bigram
    counting is one np.unique over the hashed token pairs. Docs with < 2
    tokens have no bigrams and are excluded (both engines)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        toks = _tokens(batch["text"].to_pandas())
        out_id, out_frac = [], []
        for i, ws in zip(ids, toks):
            if len(ws) < 2:
                continue
            h = hash64(np.asarray(ws, dtype=object))
            # collision-safe within a doc: pair-code over the doc's own
            # token vocabulary, not the raw 64-bit hashes
            _, codes = np.unique(h, return_inverse=True)
            pair = codes[:-1].astype(np.int64) * (codes.max() + 1) + codes[1:]
            # np.unique counts are O(P log P) in the number of bigrams;
            # bincount here would allocate O(vocab^2) and OOM on long docs
            top = int(np.unique(pair, return_counts=True)[1].max())
            tot = len(ws) - 1
            out_id.append(i)
            # same op order as the oracle's FLOOR(MAX(c)*1e6/SUM(c)+0.5)/1e6
            out_frac.append(
                np.floor(float(top) * 1e6 / float(tot) + 0.5) / 1e6)
        return pa.table({"doc_id": pa.array(np.asarray(out_id, np.int64)),
                         "top_bigram_frac": pa.array(
                             np.asarray(out_frac, np.float64))})

    return ds.map_batches(rep, batch_format="pyarrow", zero_copy_batch=True)


BIGRAM_REP_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
b AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM t WHERE len(toks) >= 2),
c AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY doc_id, bg)
SELECT doc_id, FLOOR(MAX(c) * 1e6 / SUM(c) + 0.5) / 1e6 AS top_bigram_frac
FROM c GROUP BY doc_id
"""


def gopher_repetition_documents(sf_dir: str):
    """The rest of the published repetition-filter bundle (Gopher rules;
    bigram_repetition_documents covers n=2): per doc the duplicate-word
    fraction (fraction of tokens whose word occurs ≥2 times in the doc)
    and the top-3-gram / top-4-gram fractions (count of the most frequent
    n-gram over the doc's n-gram positions). Stateless map_batches — per
    doc one np.unique over hashed tokens plus two rolling pair-code
    uniques; docs with < 4 tokens have no 4-grams and are excluded (both
    engines). Collision-safe within a doc: n-grams are coded over the
    doc's own token vocabulary, never raw 64-bit hashes."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        toks = _tokens(batch["text"].to_pandas())
        out = {"doc_id": [], "dup_word_frac": [], "top_trigram_frac": [],
               "top_quadgram_frac": []}

        def top_frac(codes: np.ndarray, v: int, n: int) -> float:
            # positional n-gram code over the doc vocab; v^n bounded by the
            # per-doc token count so the int64 product can't overflow here
            code = codes[: codes.size - n + 1].astype(np.int64)
            for j in range(1, n):
                code = code * v + codes[j: codes.size - n + 1 + j]
            top = int(np.unique(code, return_counts=True)[1].max())
            tot = codes.size - n + 1
            return np.floor(float(top) * 1e6 / float(tot) + 0.5) / 1e6

        for i, ws in zip(ids, toks):
            if len(ws) < 4:
                continue
            h = hash64(np.asarray(ws, dtype=object))
            vocab, codes = np.unique(h, return_inverse=True)
            counts = np.bincount(codes)
            dup = int(counts[counts >= 2].sum())
            v = int(vocab.size)
            if v ** 4 >= 2 ** 62:  # ~1.5M distinct tokens in ONE doc
                raise ValueError("gopher_repetition: doc vocabulary too "
                                 "large for the positional n-gram code")
            out["doc_id"].append(i)
            out["dup_word_frac"].append(
                np.floor(float(dup) * 1e6 / float(len(ws)) + 0.5) / 1e6)
            out["top_trigram_frac"].append(top_frac(codes, v, 3))
            out["top_quadgram_frac"].append(top_frac(codes, v, 4))
        return pa.table({
            "doc_id": pa.array(np.asarray(out["doc_id"], np.int64)),
            "dup_word_frac": pa.array(
                np.asarray(out["dup_word_frac"], np.float64)),
            "top_trigram_frac": pa.array(
                np.asarray(out["top_trigram_frac"], np.float64)),
            "top_quadgram_frac": pa.array(
                np.asarray(out["top_quadgram_frac"], np.float64)),
        })

    return ds.map_batches(rep, batch_format="pyarrow", zero_copy_batch=True)


GOPHER_REP_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
e AS (SELECT doc_id, len(toks) AS nt FROM t WHERE len(toks) >= 4),
w AS (
  SELECT doc_id, UNNEST(toks) AS tok FROM t WHERE len(toks) >= 4),
wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
dup AS (
  SELECT doc_id, SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS d, SUM(c) AS n
  FROM wc GROUP BY 1),
g3 AS (
  SELECT doc_id, UNNEST(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ng
  FROM t WHERE len(toks) >= 4),
c3 AS (SELECT doc_id, ng, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
t3 AS (SELECT doc_id, MAX(c) AS top, SUM(c) AS tot FROM c3 GROUP BY 1),
g4 AS (
  SELECT doc_id, UNNEST(list_transform(range(1, len(toks) - 2),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
      AS ng
  FROM t WHERE len(toks) >= 4),
c4 AS (SELECT doc_id, ng, COUNT(*) AS c FROM g4 GROUP BY 1, 2),
t4 AS (SELECT doc_id, MAX(c) AS top, SUM(c) AS tot FROM c4 GROUP BY 1)
SELECT e.doc_id,
  FLOOR(dup.d * 1e6 / dup.n + 0.5) / 1e6 AS dup_word_frac,
  FLOOR(t3.top * 1e6 / t3.tot + 0.5) / 1e6 AS top_trigram_frac,
  FLOOR(t4.top * 1e6 / t4.tot + 0.5) / 1e6 AS top_quadgram_frac
FROM e JOIN dup USING (doc_id) JOIN t3 USING (doc_id) JOIN t4 USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Duplicate n-gram spans (exact passage-level dedup signal)
# ---------------------------------------------------------------------------


def duplicate_ngram_spans(sf_dir: str, n: int = 8):
    """Per-doc count of n-token shingle positions whose shingle occurs ≥2
    times corpus-wide — the exact duplicated-passage signal of
    substring-level training-data dedup (Lee et al. 2022's "train on unique
    substrings" preprocessing, reduced to span counting).

    Ray shape: (1) per-block `_shingle_hashes` + per-(shingle, doc) partial
    counts, salted on hash(shingle) so every occurrence of one shingle
    lands in one bucket; (2) per-bucket vectorized total-count filter
    (total ≥ 2) emits (doc_id, span-count) partials; (3) a second salted
    bucket pass sums per doc. Shuffle volume is unique-(shingle, doc) pairs
    — text itself never shuffles; 64-bit shingle hashing stands in for the
    strings (collision odds ~n²/2^64, the same contract MinHash/
    decontaminate use)."""
    from .queries import _salt_buckets

    nb = _salt_buckets(sf_dir, "documents", rows_per_bucket=250_000, floor=32)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h, doc_idx = _shingle_hashes(df.text, n)
        docs = df.doc_id.to_numpy()[doc_idx]
        g = pd.DataFrame({"h": h.astype(np.int64), "doc_id": docs}).groupby(
            ["h", "doc_id"], sort=False).size().rename("c").reset_index()
        g["bkt"] = (g.h.to_numpy().astype(np.uint64) % nb).astype(np.int64)
        return _pa_from_pandas(g, preserve_index=False)

    def bucket_dups(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("h", sort=False).c.transform("sum")
        d = df[tot >= 2]
        out = d.groupby("doc_id", sort=False).c.sum().rename(
            "n_dup_spans").reset_index()
        out["dbkt"] = (out.doc_id.to_numpy().astype(np.uint64) % nb
                       ).astype(np.int64)
        return out

    def doc_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).n_dup_spans.sum().reset_index()
        g["n_dup_spans"] = g.n_dup_spans.astype(np.int64)
        return g

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bkt").map_groups(bucket_dups, batch_format="pandas")
            .groupby("dbkt").map_groups(doc_sum, batch_format="pandas")
            .select_columns(["doc_id", "n_dup_spans"]))


DUP_NGRAM_SQL = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents),
sh AS (
  SELECT doc_id, array_to_string(w[s : s + 7], ' ') AS sh
  FROM tok, LATERAL UNNEST(generate_series(1, GREATEST(len(w) - 7, 0))) AS g(s)),
tot AS (SELECT sh, COUNT(*) AS c FROM sh GROUP BY sh)
SELECT s.doc_id, COUNT(*)::BIGINT AS n_dup_spans
FROM sh s JOIN tot t ON s.sh = t.sh
WHERE t.c >= 2
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# Unigram-LM log-probability scoring — the perplexity-proxy quality filter
# (corpus-filtering recipes score documents with a cheap LM; the unigram
# variant is exactly computable and SQL-oracleable). Same dual-path gates as
# TF-IDF: bounded vocabularies broadcast the fitted LM; open vocabularies
# route to a two-shuffle bucketed join.
# ---------------------------------------------------------------------------


def unigram_logprob_documents(sf_dir: str):
    """Mean unigram log-probability per document: fit p(w) = count(w) / T on
    the corpus itself, score each doc as AVG(ln p(w)) over its tokens.

    Fast path (bounded vocab): per-block (token, count) partials merge on the
    driver and the (vocab, ln p) arrays broadcast once via ``ray.put``; the
    scoring pass is one searchsorted + segment mean per batch. Gates checked
    BEFORE anything large is collected (the TF-IDF convention); failing
    either routes to ``_unigram_two_shuffle``."""
    import ray

    def cnt_partial(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, distinct=False)
        g = ex.groupby("token", sort=False).size().reset_index(name="n")
        return pa.table({"token": pa.array(g["token"].to_numpy(dtype=object),
                                           type=pa.string()),
                         "n": pa.array(g["n"].to_numpy().astype(np.int64))})

    parts_ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        cnt_partial, batch_format="pyarrow", zero_copy_batch=True).materialize()
    if parts_ds.count() > PARTIALS_COLLECT_MAX:
        return _unigram_two_shuffle(sf_dir)
    partials = parts_ds.to_pandas()
    cnt = partials.groupby("token", sort=True)["n"].sum()
    if len(cnt) > VOCAB_BROADCAST_MAX:
        return _unigram_two_shuffle(sf_dir)
    total = float(cnt.sum())
    vocab = cnt.index.to_numpy(dtype=object)  # sorted => searchsorted below
    lp = np.log(cnt.to_numpy().astype(np.float64) / total)
    wrapped = {"ref": ray.put((vocab, lp))}

    def score_batch(batch: pa.Table) -> pa.Table:
        voc, lp_arr = ray.get(wrapped["ref"])
        ex = _explode_tokens(batch, distinct=False)
        pos = np.searchsorted(voc, ex["token"].to_numpy(dtype=object))
        ex = ex.assign(lp=lp_arr[pos])
        g = ex.groupby("doc_id", sort=False).lp.mean()
        return pa.table({
            "doc_id": pa.array(g.index.to_numpy().astype(np.int64)),
            "mean_logprob": pa.array(_round(g.to_numpy(), 6))})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True)


def _unigram_two_shuffle(sf_dir: str, n_buckets: int = 64):
    """Open-vocabulary path: (1) token counts via one salted-bucket groupby
    on hash(token); (2) exploded (doc, token) rows co-locate with their
    token's ln p via the union + bucket merge, pre-summing per (doc) inside
    the bucket; (3) per-doc mean via a second bucket groupby on hash(doc).
    Nothing vocabulary- or corpus-sized is broadcast or collected."""
    from ..functions.hashing import hash64

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tag_exploded(batch: pa.Table) -> pa.Table:
        ex = _explode_tokens(batch, distinct=False)
        g = (ex.groupby(["doc_id", "token"], sort=False).size()
             .reset_index(name="n"))  # per-block combiner
        tok = g["token"].to_numpy(dtype=object)
        return pa.table({
            "token": pa.array(tok, type=pa.string()),
            "doc_id": pa.array(g["doc_id"].to_numpy().astype(np.int64)),
            "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            "bkt": pa.array(hash64(tok) % n_buckets)})

    exploded = ds.map_batches(tag_exploded, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    # corpus token total from the already-materialized partials — no extra
    # tokenization pass over the text
    total = float(exploded.sum("n"))

    def merge_lp(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby("token", sort=False).n.sum()
        lp = np.log(cnt.to_numpy().astype(np.float64) / total)
        lp_map = pd.Series(lp, index=cnt.index)
        s = df.assign(lp=df.token.map(lp_map) * df.n)
        g = s.groupby("doc_id", sort=False).agg(s=("lp", "sum"),
                                                n=("n", "sum"))
        return pd.DataFrame({"doc_id": g.index.to_numpy().astype(np.int64),
                             "s": g.s.to_numpy(), "n": g.n.to_numpy()})

    # token counts are computable inside each token-bucket (a token never
    # spans buckets), so count + attach collapse into ONE bucket pass
    partials = exploded.groupby("bkt").map_groups(merge_lp,
                                                  batch_format="pandas")

    def tag_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return batch.append_column("dbkt", pa.array(hash64(ids) % n_buckets))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).agg(s=("s", "sum"),
                                                 n=("n", "sum"))
        return pd.DataFrame({
            "doc_id": g.index.to_numpy().astype(np.int64),
            "mean_logprob": _round(g.s.to_numpy() / g.n.to_numpy(), 6)})

    return partials.map_batches(tag_doc, batch_format="pyarrow").groupby(
        "dbkt").map_groups(final, batch_format="pandas")


UNIGRAM_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id,
    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents),
c AS (SELECT token, COUNT(*)::DOUBLE AS c FROM tok GROUP BY token),
t AS (SELECT SUM(c) AS t FROM c)
SELECT doc_id,
       FLOOR(AVG(ln(c.c / t.t)) * 1e6 + 0.5) / 1e6 AS mean_logprob
FROM tok JOIN c USING (token), t
GROUP BY doc_id
"""
