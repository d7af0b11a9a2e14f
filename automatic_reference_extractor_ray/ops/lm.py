"""Corpus-trained bigram language-model quality scoring.

The CCNet/Gopher-style curation step this family was missing: train a
small n-gram LM on (a hash-sample of) the corpus, broadcast the model
once, and score every document's per-token log-probability — low
scores flag gibberish / boilerplate / non-linguistic text that the
rule-based ``textstats.quality_metrics`` heuristics cannot see.

Shape (the stateful-broadcast pattern, like ``analytics.kmeans``):
- **fit** is two bounded passes.  Pass 1 streams unigram count
  partials (plus a per-batch total-token sentinel row) through one
  bucketed exchange and cuts the vocabulary to the top ``vocab_size``
  tokens with the same per-bucket k-candidate combiner as
  ``topk_tokens`` — nothing vocabulary-unbounded reaches the driver.
  Pass 2 broadcasts the vocab (``ray.put``, read per task), counts
  vocab-restricted bigrams as packed int64 keys (``i1 * V + i2``),
  and cuts to the top ``max_bigrams`` the same way.  The model is a
  fixed-size numpy bundle regardless of corpus size.
- **score** is a pure streaming map: the model ships by ObjectRef
  (plasma-local, zero-copy numpy), token ids resolve through the
  vocab, bigram counts resolve through one vectorized
  ``np.searchsorted`` over the sorted key array, and per-document
  sums come off a cumulative sum — no Python loop over tokens.

Probability model (stupid backoff, Brants et al. 2007):
  p(w2 | w1) = c(w1,w2) / c(w1)                  if the bigram is in
                                                  the model
             = alpha * p1(w2)                     otherwise
  p1(w)      = (c(w) + 1) / (total + V + 1)       add-one smoothed,
                                                  OOV -> c = 0
A document's score is the mean log10 p over its adjacent-pair stream
(0.0 for documents with < 2 tokens).  Scores are comparable within a
fit, which is what a percentile-based quality cut consumes
(``analytics.quantile_clip`` composes downstream).

No SQL oracle: the two-level fit + float scoring is not reasonably
expressible in DuckDB; the pytest suite instead pins ``lm_score``
against an independent pure-Python reference implementation and
property-tests fluent-vs-gibberish ordering and bucket-count
invariance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analytics import TOKEN_RE
from .shuffle import bucketed_groupby

ALPHA = 0.4                    # stupid-backoff discount
_TOTAL_SENTINEL = ""           # TOKEN_RE never emits an empty token


def _hash_keep(ids, frac: float, salt: str) -> np.ndarray:
    """Deterministic per-id sample mask (same family as
    ``analytics.hash_split``: stable across runs and bucket counts)."""
    if frac >= 1.0:
        return np.ones(len(ids), dtype=bool)
    h = pd.util.hash_pandas_object(
        pd.Series([f"{salt}:{i}" for i in ids]), index=False).to_numpy()
    return (h % np.uint64(1 << 20)) < np.uint64(int(frac * (1 << 20)))


def fit_bigram_lm(docs, vocab_size: int = 4096, max_bigrams: int = 65536,
                  sample_frac: float = 1.0, min_count: int = 2,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_buckets: int | None = None,
                  alpha: float = ALPHA) -> dict:
    """Train the model -> a small dict of numpy arrays:
    ``vocab`` (tokens, count-desc order), ``uni`` (their counts),
    ``total`` (ALL token occurrences, in- and out-of-vocab),
    ``bi_keys``/``bi_counts`` (sorted packed int64 bigram keys),
    ``alpha``.  Deterministic: ties cut by (count DESC, token ASC) /
    (count DESC, key ASC).

    ``min_count`` floors the vocabulary (default 2): without it a
    hapax-heavy document scores PERFECTLY under self-fit stupid
    backoff — its singleton bigrams hit c(w1,w2)/c(w1) = 1/1 — which
    inverts the gibberish-detection purpose of the score."""
    import ray

    def uni_partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        total = 0
        keep = _hash_keep(b[id_col].to_numpy(), sample_frac, "lmfit")
        for t in b[text_col].to_numpy()[keep]:
            toks = TOKEN_RE.findall((t or "").lower())
            total += len(toks)
            c.update(toks)
        toks = list(c.keys()) + [_TOTAL_SENTINEL]
        ns = np.concatenate([np.fromiter(c.values(), np.int64, len(c)),
                             np.array([total], dtype=np.int64)])
        return pd.DataFrame({"token": toks, "n": ns})

    def bucket_cut(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("token", sort=False)["n"].sum().reset_index()
        sent = g[g["token"] == _TOTAL_SENTINEL]
        g = g[(g["token"] != _TOTAL_SENTINEL) & (g["n"] >= min_count)]
        g = g.sort_values(["n", "token"],
                          ascending=[False, True]).head(vocab_size)
        return pd.concat([g, sent], ignore_index=True)

    cand = bucketed_groupby(
        docs.map_batches(uni_partial, batch_format="pandas"),
        "token", bucket_cut, num_buckets).to_pandas()
    if cand.empty:                    # empty input -> column-less frame
        cand = pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    total = int(cand.loc[cand["token"] == _TOTAL_SENTINEL, "n"].sum())
    cand = cand[(cand["token"] != _TOTAL_SENTINEL)
                & (cand["n"] >= min_count)]
    cand = cand.sort_values(["n", "token"],
                            ascending=[False, True]).head(vocab_size)
    vocab = cand["token"].to_numpy(dtype=object)
    uni = cand["n"].to_numpy(dtype=np.int64)
    V = len(vocab)
    vocab_ref = ray.put({t: i for i, t in enumerate(vocab)})

    def bi_partial(b: pd.DataFrame) -> pd.DataFrame:
        vmap = ray.get(vocab_ref)
        keep = _hash_keep(b[id_col].to_numpy(), sample_frac, "lmfit")
        keys_all = []
        for t in b[text_col].to_numpy()[keep]:
            toks = TOKEN_RE.findall((t or "").lower())
            if len(toks) < 2:
                continue
            ids = np.fromiter((vmap.get(x, -1) for x in toks),
                              np.int64, len(toks))
            i1, i2 = ids[:-1], ids[1:]
            m = (i1 >= 0) & (i2 >= 0)
            if m.any():
                keys_all.append(i1[m] * V + i2[m])
        if not keys_all:
            return pd.DataFrame({"key": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        u, cnt = np.unique(np.concatenate(keys_all), return_counts=True)
        return pd.DataFrame({"key": u, "n": cnt.astype(np.int64)})

    def bi_cut(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("key", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "key"],
                          ascending=[False, True]).head(max_bigrams)
        return g

    bi = bucketed_groupby(
        docs.map_batches(bi_partial, batch_format="pandas"),
        "key", bi_cut, num_buckets).to_pandas()
    if bi.empty:   # an all-hapax / all-short-doc fit has NO bigrams
        bi = pd.DataFrame({"key": pd.Series([], dtype="int64"),
                           "n": pd.Series([], dtype="int64")})
    bi = bi.sort_values(["n", "key"],
                        ascending=[False, True]).head(max_bigrams)
    order = np.argsort(bi["key"].to_numpy(), kind="stable")
    return {"vocab": vocab, "uni": uni, "total": total,
            "bi_keys": bi["key"].to_numpy()[order],
            "bi_counts": bi["n"].to_numpy()[order].astype(np.float64),
            "alpha": float(alpha)}


def _score_arrays(ids_flat: np.ndarray, lens: np.ndarray,
                  model: dict) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-doc (n_bigrams, mean log10 p) from the flattened
    token-id stream (``-1`` = OOV) and per-doc lengths."""
    V = len(model["vocab"])
    uni = model["uni"].astype(np.float64)
    total = float(model["total"])
    # add-one unigram: OOV (-1) indexes a virtual zero-count slot
    p1 = np.concatenate([(uni + 1.0), [1.0]]) / (total + V + 1.0)
    n = len(ids_flat)
    nb = len(model["bi_keys"])
    if n >= 2:
        i1, i2 = ids_flat[:-1], ids_flat[1:]
        logp = np.log10(model["alpha"]) + np.log10(p1[i2])   # backoff
        if nb:       # an all-hapax / all-short-doc fit has NO bigrams
            key = i1 * V + i2
            pos = np.searchsorted(model["bi_keys"], key)
            pos_c = np.minimum(pos, nb - 1)
            hit = ((i1 >= 0) & (i2 >= 0)
                   & (model["bi_keys"][pos_c] == key))
            if hit.any():
                logp[hit] = np.log10(model["bi_counts"][pos_c[hit]]
                                     / uni[i1[hit]])
    else:
        logp = np.zeros(0, dtype=np.float64)
    # per-doc range sums off a cumsum; cross-document pair indices
    # (off[d] - 1) fall strictly between doc d-1's range end and doc
    # d's range start, so they are never included in any summed range
    off = np.concatenate([[0], np.cumsum(lens)])
    cs = np.concatenate([[0.0], np.cumsum(logp)])
    # doc d's pairs occupy [off[d], off[d] + lens[d] - 1) in pair space
    P = max(n - 1, 0)
    npairs = np.maximum(lens - 1, 0).astype(np.int64)
    starts = np.minimum(off[:-1], P)
    sums = cs[np.minimum(starts + npairs, P)] - cs[starts]
    with np.errstate(invalid="ignore"):
        means = np.where(npairs > 0, sums / np.maximum(npairs, 1), 0.0)
    return npairs, means


def lm_score(docs, model: dict | None = None, text_col: str = "text",
             id_col: str = "doc_id", **fit_kwargs):
    """Score every document -> Dataset (doc_id, n_bigrams, logprob).
    ``model=None`` fits on ``docs`` first (self-perplexity — the
    within-corpus outlier cut); pass a model fit elsewhere for the
    CCNet-style clean-reference scoring."""
    import ray

    if model is None:
        model = fit_bigram_lm(docs, text_col=text_col, id_col=id_col,
                              **fit_kwargs)
    ref = ray.put(model)

    def score_batch(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        vmap = {t: i for i, t in enumerate(m["vocab"])}
        ids_parts, lens = [], np.empty(len(b), dtype=np.int64)
        for j, t in enumerate(b[text_col].to_numpy()):
            toks = TOKEN_RE.findall((t or "").lower())
            lens[j] = len(toks)
            if toks:
                ids_parts.append(np.fromiter(
                    (vmap.get(x, -1) for x in toks), np.int64, len(toks)))
        flat = (np.concatenate(ids_parts) if ids_parts
                else np.zeros(0, dtype=np.int64))
        npairs, means = _score_arrays(flat, lens, m)
        return pd.DataFrame({"doc_id": b[id_col].to_numpy(),
                             "n_bigrams": npairs,
                             "logprob": means})

    return docs.map_batches(score_batch, batch_format="pandas")


def lm_score_reference(texts: list[str], ids: list,
                       model: dict) -> pd.DataFrame:
    """Independent pure-Python scorer (per-token dict lookups, python
    floats) used by the tests to pin the vectorized path."""
    import math
    V = len(model["vocab"])
    vmap = {t: i for i, t in enumerate(model["vocab"])}
    bi = {int(k): float(c) for k, c in
          zip(model["bi_keys"], model["bi_counts"])}
    total = float(model["total"])
    rows = []
    for did, t in zip(ids, texts):
        toks = TOKEN_RE.findall((t or "").lower())
        s, np_ = 0.0, 0
        for a, b in zip(toks, toks[1:]):
            i1, i2 = vmap.get(a, -1), vmap.get(b, -1)
            c = bi.get(i1 * V + i2) if (i1 >= 0 and i2 >= 0) else None
            if c is not None:
                p = c / float(model["uni"][i1])
            else:
                c2 = float(model["uni"][i2]) if i2 >= 0 else 0.0
                p = model["alpha"] * (c2 + 1.0) / (total + V + 1.0)
            s += math.log10(p)
            np_ += 1
        rows.append((did, np_, s / np_ if np_ else 0.0))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "logprob"])
