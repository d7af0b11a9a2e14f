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


def duplicated_passages(docs, n: int = 8):
    """Exact duplicated-passage detection (the training-data dedup of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2021, at token-n-gram granularity): every ordered ``n``-token
    passage that occurs more than once in the corpus, with its
    occurrence and document counts.

    → (gram, n_occurrences, n_docs) for passages with n_occurrences>1.

    Scale shape: (gram, doc_id) rows through the bounded-bucket shuffle
    (gram cardinality ≈ total token positions — exactly what
    ``bucketed_agg`` exists for); the >1 filter runs inside the bucket
    so singleton grams never leave it.  At 100 TB, hash the gram to a
    16-byte digest before the shuffle and join digests back to one
    exemplar string per digest if the text is needed.
    """
    from .shuffle import bucketed_groupby

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        gs, ds = [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            toks = _tokens(t)
            for i in range(len(toks) - n + 1):
                gs.append(" ".join(toks[i:i + n]))
                ds.append(d)
        return pd.DataFrame({"gram": gs, "doc_id": ds})

    def dup_only(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("gram")["doc_id"].agg(["size", "nunique"])
        g = g[g["size"] > 1]
        return pd.DataFrame({"gram": g.index,
                             "n_occurrences": g["size"].astype("int64"),
                             "n_docs": g["nunique"].astype("int64")})

    return bucketed_groupby(docs.map_batches(grams, batch_format="pandas"),
                            "gram", dup_only)


def quality_filter(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style rule filter (Rae et al. 2021 §A1.1, integerized so
    the SQL oracle mirrors it exactly): per-doc flags plus the final
    ``keep`` verdict a cleaning pipeline acts on.

      too_short        n_tokens < 40
      bad_word_len     mean token length x100 outside [300, 1000]
      low_stopwords    stopword fraction x1000 < 10 (≈ Gopher's
                       "must contain stop words" proxy)

    All arithmetic is integer (floor division), no float boundaries.
    """
    toks = batch["text"].map(_tokens)
    n = toks.map(len).astype("int64")
    sum_len = toks.map(lambda ts: sum(len(t) for t in ts)).astype("int64")
    en = frozenset(EN_STOP)
    n_stop = toks.map(lambda ts: sum(t in en for t in ts)).astype("int64")
    safe_n = n.where(n > 0, 1)
    mean_wlen = (100 * sum_len) // safe_n
    stop_rate = (1000 * n_stop) // safe_n
    too_short = n < 40
    bad_word_len = (mean_wlen < 300) | (mean_wlen > 1000)
    low_stop = stop_rate < 10
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": n,
        "mean_wlen_x100": mean_wlen.astype("int64"),
        "stop_rate_x1000": stop_rate.astype("int64"),
        "flag_too_short": too_short,
        "flag_bad_word_len": bad_word_len,
        "flag_low_stopwords": low_stop,
        "keep": ~(too_short | bad_word_len | low_stop),
    })
