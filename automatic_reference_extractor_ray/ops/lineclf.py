"""Trained reference-line classifier — the north-star's "trained
reference-line classifiers hosted in actor pools with warm model
caches" stage, as a text-feature model.

The reference localizes reference regions with a pixel-level
Mask-R-CNN detector (LOCDB-V3/tools/infer_simple-custom.py); the
rebuild's default analogue is the heading/marker heuristic
(``functions/segment.py``).  This module adds the TRAINED sibling: a
logistic model over per-line CONTENT features (markers, years, page
ranges, author initials, punctuation shape — deliberately NO
position or heading signal), so it can flag reference lines in
documents whose section heading is missing or OCR-mangled, where the
heuristic's heading contract fails.

Labels for fit/eval derive from the generator-truth heading rule
(``segment.find_heading_line``: lines strictly after the LAST
REFERENCES-like heading) over text-class documents — construction
truth, not pipeline output.  The model itself never sees the heading
or the line's position.

Scale shape (the ``ops/classifier.py`` contract):
- line explode + labeling is a pure streaming map (pandas C split /
  explode / cumcount — no Python-per-line);
- the FIT pulls only a bounded deterministic digest sample to the
  driver (two-pass: digests first, then just the winning rows) —
  fit cost is independent of corpus size;
- SCORING is an ACTOR-POOL stage: each actor fetches the weight
  vector from the object store ONCE in ``__init__`` (the warm model
  cache) and every batch is one feature build + matvec.

Approximate by design (trained model) → rows-only oracle; pinned by
determinism + accuracy-floor + heuristic-agreement tests.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..functions.segment import HEADING_RE, MARKER_LINE_RE
from .classifier import _gd_fit

N_LINE_FEATURES = 15

_PUNCT = r"[.,;:()\[\]]"
_YEAR = r"\((?:19|20)\d{2}\)|\b(?:19|20)\d{2}\b"
_PAGES = r"\d+\s*[-–]\s*\d+"
_INITIAL = r"\b[A-Z]\."
_KEYWORD = (r"(?i)\b(?:pp?\.|vols?\.?|no\.|in:|doi|journal|"
            r"proceedings|press|eds?\.)")
_CAP_TOKEN = r"\b[A-Z][a-z]"


def line_features(texts: pd.Series | list[str]) -> np.ndarray:
    """(n, N_LINE_FEATURES + 1) float64 feature matrix, bias column
    last.  All pandas C string kernels — no Python loop over lines."""
    s = pd.Series(list(texts), dtype=object).fillna("")
    n = len(s)
    X = np.zeros((n, N_LINE_FEATURES + 1), dtype=np.float64)
    if n == 0:
        return X
    ln = s.str.len().to_numpy(np.float64)
    safe = np.maximum(ln, 1.0)
    toks = s.str.count(r"\S+").to_numpy(np.float64)
    X[:, 0] = np.log1p(ln)
    X[:, 1] = np.log1p(toks)
    X[:, 2] = s.str.count(r"\d").to_numpy(np.float64) / safe
    X[:, 3] = s.str.count(_PUNCT).to_numpy(np.float64) / safe
    X[:, 4] = np.log1p(s.str.count(",").to_numpy(np.float64))
    X[:, 5] = s.str.match(MARKER_LINE_RE).to_numpy(np.float64)
    X[:, 6] = s.str.contains(_YEAR, regex=True).to_numpy(np.float64)
    X[:, 7] = s.str.contains(_PAGES, regex=True).to_numpy(np.float64)
    X[:, 8] = np.log1p(s.str.count(_INITIAL).to_numpy(np.float64))
    X[:, 9] = s.str.contains(_KEYWORD, regex=True).to_numpy(np.float64)
    X[:, 10] = s.str.contains(r"[\"“’']").to_numpy(np.float64)
    X[:, 11] = s.str.match(r".*\.\s*$").to_numpy(np.float64)
    X[:, 12] = s.str.count(_CAP_TOKEN).to_numpy(np.float64) / \
        np.maximum(toks, 1.0)
    X[:, 13] = s.str.match(r"\s").to_numpy(np.float64)
    X[:, 14] = np.log1p(s.str.count(r"\b(?:and|&|und)\b")
                        .to_numpy(np.float64))
    X[:, N_LINE_FEATURES] = 1.0
    return X


@dataclass
class RefLineModel:
    """Fitted weights, shape (N_LINE_FEATURES + 1,), bias last."""
    w: np.ndarray


def text_doc_lines(units, drop_empty: bool = True):
    """Text-class units → Dataset (doc_id, line_no, text, label):
    one row per (non-empty) line of every text document that HAS a
    REFERENCES-like heading, label = 1 for lines strictly after the
    last heading (the generator-truth contract of
    ``segment.reference_region_lines``).  Headingless docs are
    skipped — their truth is undefined.  Pure streaming map."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["kind"] == "text"]
        out_schema = {"doc_id": pd.Series([], dtype=object),
                      "line_no": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype=object),
                      "label": pd.Series([], dtype="int64")}
        if not len(b):
            return pd.DataFrame(out_schema)
        df = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "text": b["text"].str.split("\n")}).explode(
            "text", ignore_index=True)
        df["line_no"] = df.groupby("doc_id", sort=False).cumcount()
        is_head = df["text"].str.match(HEADING_RE)
        last_h = (df["line_no"].where(is_head)
                  .groupby(df["doc_id"], sort=False).transform("max"))
        df = df[last_h.notna()]
        if not len(df):
            return pd.DataFrame(out_schema)
        df["label"] = (df["line_no"] >
                       last_h[df.index]).astype("int64")
        if drop_empty:
            df = df[df["text"].str.strip().str.len() > 0]
        df["line_no"] = df["line_no"].astype("int64")
        return df[["doc_id", "line_no", "text", "label"]] \
            .reset_index(drop=True)

    return units.map_batches(fn, batch_format="pandas")


def fit_ref_line_model(lines, fit_sample: int = 8192,
                       n_iter: int = 400, lr: float = 0.5,
                       l2: float = 1e-6,
                       salt: str = "lineclf") -> RefLineModel:
    """Fit on the ``fit_sample`` lines with the smallest
    ``md5("{salt}|{doc_id}:{line_no}")`` digests — the shared
    ``classifier.digest_sample`` bounded two-pass, keyed per LINE.
    Driver memory is ``fit_sample`` rows at any corpus size."""
    from .classifier import digest_sample

    sample = digest_sample(
        lines, fit_sample, salt,
        key_of=lambda b: [f"{d}:{n}" for d, n in
                          zip(b["doc_id"], b["line_no"])],
        cols=["doc_id", "line_no", "text", "label"],
        key_cols=["doc_id", "line_no"])
    X = line_features(sample["text"])
    y = sample["label"].to_numpy(dtype=np.float64)
    return RefLineModel(w=_gd_fit(X, y, n_iter, lr, l2))


class RefLineScorer:
    """Warm-model actor: the weight vector is fetched from the object
    store ONCE per actor here in ``__init__`` (the north-star's warm
    model cache), then every ``__call__`` batch is one C feature
    build + matvec."""

    def __init__(self, wref):
        import ray
        self.w = ray.get(wref)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        X = line_features(b["text"])
        p = 1.0 / (1.0 + np.exp(-(X @ self.w)))
        micro = np.floor(p * 1_000_000.0 + 0.5).astype(np.int64)
        out = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "line_no": b["line_no"].to_numpy(),
            "score_micro": micro,
            "pred": (micro >= 500_000).astype(np.int64)})
        if "label" in b.columns:
            out["label"] = b["label"].to_numpy()
        return out


def score_ref_lines(lines, model: RefLineModel,
                    concurrency=(2, 8), batch_size: int = 4096):
    """→ Dataset (doc_id, line_no, score_micro, pred[, label]) via
    the actor pool."""
    import ray

    return lines.map_batches(
        RefLineScorer, fn_constructor_args=(ray.put(model.w),),
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pandas")


def ref_line_classifier(units, train_frac_hex: str = "8",
                        **fit_kw):
    """One-shot: explode + label text-doc lines, fit on the docs
    whose ``md5(doc_id)`` starts below ``train_frac_hex`` (~half),
    score the HELD-OUT docs' lines with the actor pool → Dataset
    (doc_id, line_no, score_micro, pred, label).  The model never
    sees an eval doc or any position/heading signal."""

    def side(b: pd.DataFrame, want_fit: bool) -> pd.DataFrame:
        # hash each DISTINCT doc once, then broadcast the flag to its
        # lines (per-line md5 was pure waste — review finding)
        uniq = pd.unique(b["doc_id"])
        flag = {d: hashlib.md5(str(d).encode()).hexdigest()[0]
                < train_frac_hex for d in uniq}
        h = b["doc_id"].map(flag).to_numpy(dtype=bool)
        return b[h if want_fit else ~h]

    lines = text_doc_lines(units).materialize()
    fit_side = lines.map_batches(lambda b: side(b, True),
                                 batch_format="pandas")
    eval_side = lines.map_batches(lambda b: side(b, False),
                                  batch_format="pandas")
    model = fit_ref_line_model(fit_side, **fit_kw)
    return score_ref_lines(eval_side, model)
