"""Text analysis over a ``documents(doc_id, text, ...)`` table:
token counting, quality metrics, language-ID heuristic, fingerprinting.

Every output column is an integer or string computed by a rule the
oracle SQL mirrors verbatim (see __ray_entry__.oracle_sql) — no float
boundaries in the correctness contract.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"[a-z0-9]+")
PUNCT_RE = re.compile(r"[.,;:!?]")
WS_RE = re.compile(r"\s+")

EN_STOP = ["the", "and", "of", "to", "a", "in", "is", "for", "with", "on"]
DE_STOP = ["der", "die", "das", "und", "ist", "mit", "für", "von", "ein", "nicht"]


def _tokens(s: str) -> list[str]:
    return TOKEN_RE.findall(s.lower())


def token_counts(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": batch["text"].map(lambda s: len(_tokens(s))).astype("int64"),
    })


def quality_metrics(batch: pd.DataFrame) -> pd.DataFrame:
    toks = batch["text"].map(_tokens)
    en = frozenset(EN_STOP)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_chars2": batch["text"].str.len().astype("int64"),
        "n_tokens": toks.map(len).astype("int64"),
        "n_punct": batch["text"].map(lambda s: len(PUNCT_RE.findall(s))).astype("int64"),
        "n_stopwords": toks.map(lambda ts: sum(t in en for t in ts)).astype("int64"),
    })


def lang_guess(batch: pd.DataFrame) -> pd.DataFrame:
    toks = batch["text"].map(_tokens)
    en, de = frozenset(EN_STOP), frozenset(DE_STOP)
    en_hits = toks.map(lambda ts: sum(t in en for t in ts))
    de_hits = toks.map(lambda ts: sum(t in de for t in ts))
    guess = np.where(en_hits > de_hits, "en",
                     np.where(de_hits > en_hits, "de", "unknown"))
    return pd.DataFrame({"doc_id": batch["doc_id"], "lang_guess": guess})


def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized lowercase
    text (the rolling-hash analogue with an oracle-computable hash)."""
    norm = batch["text"].map(lambda s: WS_RE.sub(" ", s.lower()).strip())
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "fp": norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()),
    })
