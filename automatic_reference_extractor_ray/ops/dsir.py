"""DSIR-style data selection via importance resampling.

Public method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): featurize every document as hashed
n-gram counts, fit two bag-of-hashed-grams distributions — the TARGET
domain p and the RAW corpus q — and weight each raw document by its
log importance ratio sum(log p[h] - log q[h]) over its gram stream;
selection keeps the highest-weight documents.

Reference parity note: the reference has no selection surface; this is
part of the beyond-the-reference curation family (SURVEY.md §2 "LLM
training-data ops").

Scale shape (the tfidf/decontaminate playbook):
- featurization is vectorized per batch: one flat token array per
  batch, bigrams formed by shifted concat, pandas' C siphash → bucket
  ids, ``np.bincount`` partials;
- BOTH distributions fold to fixed ``n_buckets``-sized vectors on the
  driver (per-batch partials sum exactly; 2^13 int64 counts is KBs at
  any corpus size);
- scoring broadcasts the ``n_buckets`` log-ratio vector once via
  ``ray.put`` and segment-sums per doc with ``np.bincount`` — no
  Python-per-gram, no exchange at all;
- selection reuses the per-batch top-k candidate cut (scores are
  final once the ratio vector is fixed), ≤ batches×k rows to the
  driver.

Weights quantize to int64 micro-units so selection is deterministic
and order-independent; approximate-by-design (hashed features) → no
SQL oracle, pinned by tests against an independent pure-Python
reference implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analytics import TOKEN_RE


def _gram_buckets(texts, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashed uni+bigram bucket ids for a batch of texts.

    Returns (buckets, doc_idx): one row per gram OCCURRENCE, where
    ``doc_idx`` maps each gram back to its position in ``texts``.
    Vectorized: one object-array hash call per batch, bigrams via
    shifted concat masked at document boundaries.
    """
    toks: list[str] = []
    doc_of: list[int] = []
    for i, t in enumerate(texts):
        tt = TOKEN_RE.findall((t or "").lower())
        toks.extend(tt)
        doc_of.extend([i] * len(tt))
    if not toks:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    tok_arr = np.asarray(toks, dtype=object)
    doc_arr = np.asarray(doc_of, dtype=np.int64)
    uni = pd.util.hash_array(tok_arr)
    same_doc = doc_arr[1:] == doc_arr[:-1]
    if same_doc.any():
        big_str = np.char.add(np.char.add(
            tok_arr[:-1][same_doc].astype(str), "\x1e"),
            tok_arr[1:][same_doc].astype(str))
        big = pd.util.hash_array(big_str.astype(object))
        # explicit uint64 modulus: a bare python-int rhs can coerce
        # uint64 % int to float64 on older numpy, silently corrupting
        # bucket ids above 2^52
        buckets = np.concatenate([uni, big]) % np.uint64(n_buckets)
        doc_idx = np.concatenate([doc_arr, doc_arr[:-1][same_doc]])
    else:
        buckets = uni % np.uint64(n_buckets)
        doc_idx = doc_arr
    return buckets.astype(np.int64), doc_idx


def _fit_distribution(docs, n_buckets: int, text_col: str) -> np.ndarray:
    """Fold the corpus' hashed-gram counts to one bounded vector."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        buckets, _ = _gram_buckets(b[text_col].tolist(), n_buckets)
        counts = np.bincount(buckets, minlength=n_buckets).astype(np.int64)
        return pd.DataFrame({"h": np.arange(n_buckets, dtype=np.int64),
                             "n": counts})

    part = docs.map_batches(partial, batch_format="pandas").to_pandas()
    counts = np.zeros(n_buckets, dtype=np.int64)
    np.add.at(counts, part["h"].to_numpy(), part["n"].to_numpy())
    return counts


def dsir_log_ratio(raw, target, n_buckets: int = 8192,
                   text_col: str = "text") -> np.ndarray:
    """log((p_target + Laplace) / (p_raw + Laplace)) per hash bucket —
    the fixed-size model scoring broadcasts."""
    tc = _fit_distribution(target, n_buckets, text_col)
    rc = _fit_distribution(raw, n_buckets, text_col)
    logp = np.log(tc + 1.0) - np.log(tc.sum() + n_buckets)
    logq = np.log(rc + 1.0) - np.log(rc.sum() + n_buckets)
    return logp - logq


def dsir_weights(raw, log_ratio: np.ndarray,
                 text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset (doc_id, logw_micro): per-doc importance weight
    sum(log_ratio[h]) over the doc's gram stream, int64 micro-units.
    The ratio vector rides ray.put once; scoring is bincount-vectorized
    per batch with no exchange."""
    import ray

    n_buckets = len(log_ratio)
    ref = ray.put(log_ratio)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lr = ray.get(ref)
        buckets, doc_idx = _gram_buckets(b[text_col].tolist(), n_buckets)
        w = np.zeros(len(b), dtype=np.float64)
        ng = np.zeros(len(b), dtype=np.int64)
        if len(buckets):
            np.add.at(w, doc_idx, lr[buckets])
            np.add.at(ng, doc_idx, 1)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "logw_micro": np.floor(w * 1_000_000.0 + 0.5).astype(np.int64),
            "n_grams": ng})

    return raw.map_batches(score, batch_format="pandas")


def dsir_select(raw, target, k: int = 100, n_buckets: int = 8192,
                text_col: str = "text", id_col: str = "doc_id"):
    """Select the ``k`` raw documents most target-like by importance
    weight (deterministic rank-based variant of DSIR's Gumbel
    resampling: same weights, top-k instead of sampling).

    → pandas (rank, doc_id, logw_micro), weight desc, doc_id asc ties.
    Driver traffic: 2×n_buckets count partials + batches×k candidates.
    """
    lr = dsir_log_ratio(raw, target, n_buckets, text_col)
    scored = dsir_weights(raw, lr, text_col, id_col)

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        # gram-less docs carry no evidence either way — a selection
        # must not rank their 0 above real (often negative) weights
        b = b[b["n_grams"] > 0]
        return (b.sort_values(["logw_micro", id_col],
                              ascending=[False, True], kind="mergesort")
                .head(k)[[id_col, "logw_micro"]])

    cand = scored.map_batches(cut, batch_format="pandas").to_pandas()
    if cand.empty:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype=object),
                             "logw_micro": pd.Series([], dtype="int64")})
    top = (cand.sort_values(["logw_micro", id_col],
                            ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype="int64"))
    return top[["rank", id_col, "logw_micro"]]
