"""Linear quality classifier: bounded-sample logistic-regression fit +
corpus-scale distributed scoring.

Public method (the fastText-style quality-classifier recipe used by
GPT-3 app. A, CCNet, and DCLM: train a small linear model on a bounded
labeled sample, then apply it to the full corpus): documents featurize
as hashed uni+bigram counts (the DSIR featurizer), the model fits by
deterministic full-batch gradient descent on a DRIVER-LOCAL sample,
and scoring broadcasts the weight vector once and runs as a pure
streaming map.

Reference parity note: the reference has no model-fit surface; this is
part of the beyond-the-reference curation family (SURVEY.md §2 "LLM
training-data ops").

Scale shape:
- the FIT never sees the corpus: a deterministic md5-smallest sample
  (``analytics.exact_sample``'s digest rule) of ``fit_sample`` rows is
  pulled to the driver — fit cost is independent of corpus size, the
  same bounded-fit contract as ``kmeans`` / IVF centroid fits;
- SCORING is the corpus-scale op: the (n_buckets+1)-float weight
  vector broadcasts once via ``ray.put`` and every batch scores with
  one scatter-add + one matvec — no Python-per-token, no exchange;
- scores quantize to int64 micro-units so downstream cuts are
  deterministic and order-independent.

Approximate-by-design (hashed features, iterative fit) → no SQL
oracle; pinned by tests against an independent pure-Python
featurizer+GD reference and a separability floor on the synthetic
corpus.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .dsir import _gram_buckets


@dataclass
class LogRegModel:
    """Fitted weights: w[:-1] over hash buckets, w[-1] the bias."""
    w: np.ndarray          # float64, shape (n_buckets + 1,)
    n_buckets: int


def _features(texts, n_buckets: int) -> np.ndarray:
    """Dense (len(texts), n_buckets+1) float64 feature matrix:
    log1p'd hashed-gram counts, L2-normalized per row, bias column of
    ones last.  Dense is deliberate — n_buckets is a model knob
    (KBs), not a vocabulary."""
    X = np.zeros((len(texts), n_buckets + 1), dtype=np.float64)
    buckets, doc_idx = _gram_buckets(list(texts), n_buckets)
    if len(buckets):
        np.add.at(X, (doc_idx, buckets), 1.0)
    np.log1p(X[:, :n_buckets], out=X[:, :n_buckets])
    norms = np.sqrt(np.einsum("ij,ij->i", X, X))
    norms[norms == 0.0] = 1.0
    X[:, :n_buckets] /= norms[:, None]
    X[:, n_buckets] = 1.0
    return X


def _gd_fit(X: np.ndarray, y: np.ndarray, n_iter: int, lr: float,
            l2: float) -> np.ndarray:
    """Deterministic full-batch Adagrad (no RNG, fixed iteration
    count, per-coordinate step scaling — plain GD needs thousands of
    iterations on L2-normalized hashed-count rows, Adagrad converges
    in a few hundred); bias column excluded from the L2 penalty."""
    n, d = X.shape
    w = np.zeros(d, dtype=np.float64)
    gsq = np.zeros(d, dtype=np.float64)
    reg = np.full(d, l2, dtype=np.float64)
    reg[d - 1] = 0.0
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        grad = X.T @ (p - y) / n + reg * w
        gsq += grad * grad
        w -= lr * grad / (np.sqrt(gsq) + 1e-8)
    return w


def _digest(salt: str, v) -> str:
    return hashlib.md5(f"{salt}|{v}".encode("utf-8")).hexdigest()


def digest_sample(ds, fit_sample: int, salt: str, key_of, cols,
                  key_cols=None):
    """Bounded deterministic sample shared by every model fit: the
    ``fit_sample`` rows with the smallest ``md5("{salt}|{key}")``
    digests, pulled to the driver (the ``exact_sample`` rule —
    uniform, order-independent, corpus-size-independent).

    Two-pass: pass 1 maps over ``key_cols`` (or all of ``cols``) and
    ships ONLY digests (the exact_sample candidate-prune lesson);
    pass 2 filters the ≤ fit_sample winners and pulls just those.
    ``key_of(batch) -> sequence`` yields one digest key per row."""

    def cand(b: pd.DataFrame):
        hs = sorted(_digest(salt, k) for k in key_of(b))[:fit_sample]
        if not hs:       # typed empty: 0-row object column trips the
            import pyarrow as pa      # pandas size estimator
            return pa.table({"__h": pa.array([], pa.string())})
        return pd.DataFrame({"__h": pd.Series(hs, dtype="object")})

    acc: list[str] = []
    for part in (ds.select_columns(list(key_cols or cols))
                 .map_batches(cand, batch_format="pandas")
                 .iter_batches(batch_format="pandas",
                               batch_size=4096)):
        acc.extend(part["__h"].tolist())
        if len(acc) > 4 * fit_sample:
            acc = sorted(acc)[:fit_sample]
    if not acc:
        raise ValueError("digest_sample: empty input dataset")
    thr = sorted(acc)[:fit_sample][-1]

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[cols].copy()
        b["__h"] = [_digest(salt, k) for k in key_of(b)]
        return b[b["__h"] <= thr]

    return (ds.map_batches(keep, batch_format="pandas").to_pandas()
            .sort_values("__h", kind="mergesort").head(fit_sample))


def fit_logreg(ds, label_col: str, text_col: str = "text",
               id_col: str = "doc_id", n_buckets: int = 4096,
               fit_sample: int = 8192, n_iter: int = 500,
               lr: float = 0.3, l2: float = 1e-6,
               salt: str = "logreg") -> LogRegModel:
    """Fit on the ``fit_sample`` rows with the smallest
    ``md5("{salt}|{id}")`` digests (the ``exact_sample`` rule —
    deterministic, uniform, order-independent), pulled to the driver.

    ``label_col`` must be 0/1 int.  Driver memory: fit_sample texts +
    one dense (fit_sample, n_buckets+1) matrix — bounded at any corpus
    size."""
    sample = digest_sample(
        ds, fit_sample, salt,
        key_of=lambda b: b[id_col].tolist(),
        cols=[id_col, text_col, label_col], key_cols=[id_col])
    X = _features(sample[text_col].tolist(), n_buckets)
    y = sample[label_col].to_numpy(dtype=np.float64)
    return LogRegModel(w=_gd_fit(X, y, n_iter, lr, l2),
                       n_buckets=n_buckets)


def logreg_score(ds, model: LogRegModel, text_col: str = "text",
                 id_col: str = "doc_id"):
    """→ Dataset (id, score_micro:int64, pred:int64) — P(label=1)
    quantized to micro-units, pred = score >= 0.5.  The weight vector
    rides ``ray.put`` once; each batch is one scatter-add + matvec."""
    import ray

    ref = ray.put(model.w)
    n_buckets = model.n_buckets

    def score(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(ref)
        X = _features(b[text_col].tolist(), n_buckets)
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        micro = np.floor(p * 1_000_000.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "score_micro": micro,
            "pred": (micro >= 500_000).astype(np.int64)})

    return ds.map_batches(score, batch_format="pandas")


def quality_classifier(docs, label_col: str, text_col: str = "text",
                       id_col: str = "doc_id", **fit_kw):
    """One-shot convenience: fit on the bounded sample, score the
    whole corpus.  → Dataset (id, score_micro, pred)."""
    model = fit_logreg(docs, label_col, text_col=text_col,
                       id_col=id_col, **fit_kw)
    return logreg_score(docs, model, text_col=text_col, id_col=id_col)
