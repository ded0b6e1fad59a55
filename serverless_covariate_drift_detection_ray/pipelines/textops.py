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
from .queries import _read, _round

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


def _tokens(text_series: pd.Series) -> pd.Series:
    """Whitespace tokens, empties dropped — semantics mirrored in oracle SQL
    (``list_filter(string_split(text,' '), x -> x <> '')``)."""
    return text_series.fillna("").str.split(" ").map(lambda ws: [w for w in ws if w])


# ---------------------------------------------------------------------------
# Exact dedup — content-hash groupby, keep min key (guide "Exact dedup")
# ---------------------------------------------------------------------------


def dedup_exact_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64(batch["text"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": batch["doc_id"],
                         "text_hash": pa.array(h.astype(np.int64))})

    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    keep = hashed.groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    return keep.select_columns(["doc_id"])


DEDUP_EXACT_SQL = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"


def dedup_report_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

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
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

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


def minhash_neardup_documents(sf_dir: str, threshold: float = 0.8):
    """shingle→minhash→band→bucket groupby→candidate pairs→exact-Jaccard verify.

    Verification broadcasts the doc_id→word-set map (documents are the small
    side here; at scale the verify stage re-reads just the candidate doc texts
    via a semi-join instead)."""
    import pyarrow.parquet as pq
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(minhash_signatures, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs as one composite int64 key (a<<32|b): multi-column
        groupbys are ~100× slower than single-key unique() in Ray 2.49."""
        ids = np.sort(df.doc_id.unique())
        if ids.size > 256:
            # hot-band cap (deterministic: smallest ids); at scale, salt the
            # band key instead of dropping — logged so the cap is never silent
            import logging

            logging.getLogger(__name__).warning(
                "minhash band bucket capped: %d → 256 docs", ids.size)
            ids = ids[:256]
        if ids.size < 2:
            return pd.DataFrame({"pair": pd.array([], dtype="int64")})
        a, b = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({
            "pair": (ids[a].astype(np.int64) << 32) | ids[b].astype(np.int64)
        })

    candidates = sigs.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    word_sets = dict(zip(docs.doc_id, _tokens(docs.text).map(set)))
    wrapped = {"ref": ray.put(word_sets)}

    class Verify:
        def __init__(self):
            self.sets = ray.get(wrapped["ref"])

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            pair = df.pair.to_numpy()
            doc_a = (pair >> 32).astype(np.int64)
            doc_b = (pair & 0xFFFFFFFF).astype(np.int64)
            jac = []
            for a, b in zip(doc_a, doc_b):
                sa, sb = self.sets[a], self.sets[b]
                u = len(sa | sb)
                jac.append(len(sa & sb) / u if u else 0.0)
            out = pd.DataFrame({"doc_a": doc_a, "doc_b": doc_b,
                                "jaccard": _round(np.asarray(jac), 4)})
            return out[out.jaccard >= threshold]

    # global distinct on the composite key, then verify exact Jaccard
    import ray.data

    pairs = np.sort(np.asarray(list(candidates.unique("pair")), dtype=np.int64))
    uniq = ray.data.from_arrow(pa.table({"pair": pa.array(pairs)}))
    return uniq.map_batches(Verify, batch_format="pandas", concurrency=2)


def simhash_documents(sf_dir: str):
    """64-bit SimHash per document (token-hash bit-vote), deterministic."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

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
    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = _tokens(df.text)
        df["n_tokens"] = toks.map(len)
        df["n_chars"] = df.text.fillna("").str.len()
        g = df.groupby("lang", sort=False).agg(
            n_docs=("lang", "size"), tok=("n_tokens", "sum"), chars=("n_chars", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "lang"
    ).aggregate(Sum("n_docs", alias_name="n_docs"), Sum("tok", alias_name="tok"),
                Sum("chars", alias_name="chars"))
    df = out.to_pandas()
    df["avg_tokens"] = _round(df.tok / df.n_docs, 4)
    df["avg_chars"] = _round(df.chars / df.n_docs, 4)
    return pa.Table.from_pandas(df.drop(columns=["tok", "chars"]), preserve_index=False)


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
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

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


def langid_confusion(sf_dir: str):
    """Marker-word language-ID heuristic vs the labeled ``lang`` column;
    returns the confusion counts. Ties break by LANG_MARKERS order."""
    ds = _read(sf_dir, "documents", ["text", "lang"])
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
        return pa.Table.from_pandas(g, preserve_index=False)

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
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

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
