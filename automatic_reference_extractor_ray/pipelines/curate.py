"""End-to-end corpus curation: the composed training-data pipeline a
user runs before pre-training — quality rules → benchmark
decontamination → exact dedup → deterministic split → mixture
sampling — expressed as ONE streaming Ray Data job whose stages are
the individually-oracled ops in ``ops/``.

``curate_corpus`` emits one verdict row per TRAIN-split document:

    (doc_id, n_shared, keep_quality, keep_decontam, keep_dedup,
     keep_mix, keep)

- the split is ``ops.analytics.hash_split``'s md5 convention; the
  held-out val+test range doubles as the decontamination eval side
  (``decontaminate(holdout="high")``), so "train never saw an eval
  n-gram" is true by construction;
- ``keep_dedup`` marks the minimum doc_id among ALL documents (any
  split) sharing a normalized-content hash — a train duplicate of a
  held-out document is dropped, not kept;
- ``keep_mix`` is the salted-md5 mixture decision
  (``ops.analytics.mixture_sample``);
- ``keep`` is the conjunction — the rows a training run would read.

Scale shape: TWO verdict streams (the gram-postings shuffle inside
``decontaminate``, and a content-hash-bucketed survivor pass whose
pre-exchange map also computes the per-row quality + mixture
verdicts — fused so the corpus is read once fewer and the final fold
moves a third fewer rows) union into one doc_id-bucketed fold.
Every exchange rides the bounded-bucket shuffle; no verdict map,
gram set, or id list ever materializes on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..ops.analytics import _hex_threshold
from ..ops.dedup import _doc_key_dtype, add_content_hash
from ..ops.shuffle import bucketed_groupby, pad_frame
from ..ops.textstats import decontaminate, quality_filter

DEFAULT_MIX_RATES = {"en": 0.5, "de": 0.25, "fr": 0.75}

VERDICT_COLS = ["n_shared", "keep_quality", "keep_decontam",
                "keep_dedup", "keep_mix"]


def _h8(doc_id) -> str:
    return hashlib.md5(str(doc_id).encode("utf-8")).hexdigest()[:8]


def _mix_h8(doc_id, salt: str) -> str:
    return hashlib.md5(f"{salt}:{doc_id}".encode("utf-8")).hexdigest()[:8]


def curate_corpus(docs, *, decontam_n: int = 4, train_frac: float = 0.8,
                  mix_rates: dict[str, float] | None = None,
                  default_rate: float = 1.0, mix_salt: str = "mix",
                  num_buckets: int | None = None):
    """``docs`` needs (doc_id, text, lang).  Returns the verdict table
    described in the module docstring, one row per train-split doc."""
    rates = DEFAULT_MIX_RATES if mix_rates is None else mix_rates
    thr_train = _hex_threshold(train_frac)
    kd = _doc_key_dtype(docs)
    schema = {"doc_id": kd, **dict.fromkeys(VERDICT_COLS, "int64")}
    mix_thr = {k: _hex_threshold(v) for k, v in rates.items()}
    mix_dflt = _hex_threshold(default_rate)

    # stream B: decontamination verdicts (train vs held-out val+test)
    def tag_decontam(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_shared": batch["n_shared"].to_numpy(),
            "keep_decontam": batch["keep"].to_numpy(),
        })
        return pad_frame(out, schema)

    stream_b = decontaminate(
        docs, n=decontam_n, eval_frac=1.0 - train_frac,
        num_buckets=num_buckets, holdout="high",
    ).map_batches(tag_decontam, batch_format="pandas")

    # stream C: exact-dedup survivor verdicts — content hash over ALL
    # docs (a train dupe of a held-out doc must lose), verdict rows
    # emitted for train docs only.  The former stream A (per-row
    # quality + mixture verdicts, a pure map) is FUSED into this
    # stream's pre-exchange map: the same pass computes them, they
    # ride the content-hash exchange as two int columns, and the fold
    # sees one fewer full read pass and a third fewer rows
    def hash_and_row_verdicts(batch: pd.DataFrame) -> pd.DataFrame:
        hashed = add_content_hash(batch)
        qf = quality_filter(batch)
        mix = np.array([
            _mix_h8(d, mix_salt) < mix_thr.get(g, mix_dflt)
            for d, g in zip(batch["doc_id"], batch["lang"])])
        hashed["keep_quality"] = qf["keep"].to_numpy().astype(np.int64)
        hashed["keep_mix"] = mix.astype(np.int64)
        return hashed

    def survivors(pdf: pd.DataFrame) -> pd.DataFrame:
        keeper = pdf.groupby("content_hash")["doc_id"].transform("min")
        out = pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(),
            "keep_dedup": (pdf["doc_id"] == keeper)
            .to_numpy().astype(np.int64),
            "keep_quality": pdf["keep_quality"].to_numpy(),
            "keep_mix": pdf["keep_mix"].to_numpy(),
        })
        train = np.array([_h8(d) < thr_train for d in out["doc_id"]])
        return pad_frame(out[train].reset_index(drop=True), schema)

    stream_c = bucketed_groupby(
        docs.map_batches(hash_and_row_verdicts, batch_format="pandas"),
        "content_hash", survivors, num_buckets)

    # fold: every train doc has exactly one B row (decontam) and one
    # C row (quality+mix+dedup); padded
    # zeros make a plain sum reconstruct each column
    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("doc_id", sort=False)[VERDICT_COLS].sum()
        out = g.reset_index()
        for c in VERDICT_COLS:
            out[c] = out[c].astype(np.int64)
        out["keep"] = ((out["keep_quality"] > 0) & (out["keep_decontam"] > 0)
                       & (out["keep_dedup"] > 0) & (out["keep_mix"] > 0)
                       ).astype(np.int64)
        return out

    return bucketed_groupby(stream_b.union(stream_c),
                            "doc_id", fold, num_buckets)


def curate_sql(decontam_n: int = 4, train_frac: float = 0.8,
               mix_rates: dict[str, float] | None = None,
               default_rate: float = 1.0, mix_salt: str = "mix") -> str:
    """DuckDB oracle composing the stage oracles bit-for-bit."""
    rates = DEFAULT_MIX_RATES if mix_rates is None else mix_rates
    thr = _hex_threshold(train_frac)
    n = decontam_n
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    stop = "('the','and','of','to','a','in','is','for','with','on')"
    mix_cases = " ".join(
        f"WHEN lang = '{k}' THEN mh8 < '{_hex_threshold(v)}'"
        for k, v in rates.items())
    return f"""
        WITH h AS (
          SELECT doc_id, lang, {tok} AS t,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8,
                 substr(md5('{mix_salt}:' || CAST(doc_id AS VARCHAR)),
                        1, 8) AS mh8,
                 md5({norm}) AS chash
          FROM documents),
        q AS (
          SELECT doc_id,
                 CASE WHEN NOT (
                   len(t) < 40
                   OR (100 * COALESCE(list_sum(list_transform(t,
                        x -> length(x))), 0)) // GREATEST(len(t), 1) < 300
                   OR (100 * COALESCE(list_sum(list_transform(t,
                        x -> length(x))), 0)) // GREATEST(len(t), 1) > 1000
                   OR (1000 * len(list_filter(t, x -> x IN {stop})))
                      // GREATEST(len(t), 1) < 10)
                 THEN 1 ELSE 0 END AS keep_quality
          FROM h),
        grams AS (
          SELECT doc_id, h8, array_to_string(t[i : i + {n - 1}], ' ') AS gram
          FROM (SELECT doc_id, h8, t,
                       unnest(range(1, len(t) - {n} + 2)) AS i
                FROM h WHERE len(t) >= {n})),
        eval_g AS (SELECT DISTINCT gram FROM grams WHERE h8 >= '{thr}'),
        hits AS (
          SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
          FROM grams g JOIN eval_g e USING (gram)
          WHERE g.h8 < '{thr}'
          GROUP BY g.doc_id),
        dd AS (
          SELECT doc_id,
                 CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY chash)
                      THEN 1 ELSE 0 END AS keep_dedup
          FROM h),
        mx AS (
          SELECT doc_id,
                 CASE WHEN (CASE {mix_cases}
                            ELSE mh8 < '{_hex_threshold(default_rate)}' END)
                 THEN 1 ELSE 0 END AS keep_mix
          FROM h)
        SELECT h.doc_id,
               CAST(COALESCE(hits.n_shared, 0) AS BIGINT) AS n_shared,
               CAST(q.keep_quality AS BIGINT) AS keep_quality,
               CAST(CASE WHEN COALESCE(hits.n_shared, 0) = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS keep_decontam,
               CAST(dd.keep_dedup AS BIGINT) AS keep_dedup,
               CAST(mx.keep_mix AS BIGINT) AS keep_mix,
               CAST(CASE WHEN q.keep_quality = 1
                          AND COALESCE(hits.n_shared, 0) = 0
                          AND dd.keep_dedup = 1
                          AND mx.keep_mix = 1
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM h
        JOIN q USING (doc_id)
        JOIN dd USING (doc_id)
        JOIN mx USING (doc_id)
        LEFT JOIN hits USING (doc_id)
        WHERE h.h8 < '{thr}'"""
