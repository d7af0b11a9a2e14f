"""Corpus diff: compare two versions of a document table.

The data-versioning primitive behind incremental landing
(``state/hash_index.py`` answers "is this content new?"; this op
answers "what changed between snapshot A and snapshot B?"): every
``doc_id`` classifies as ``added`` (new only), ``removed`` (old only),
``changed`` (both, content differs), or ``same``.

Scale shape: each side collapses to (doc_id, side, content-hash) rows
inside ``map_batches`` — text never enters the exchange — and ONE
doc_id-bucketed groupby folds the ≤ 2 rows per id into a status.  The
content hash is md5 of the text (the engine-wide digest convention),
so the DuckDB oracle is a FULL OUTER JOIN over the same md5, bit-exact.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from .shuffle import bucketed_groupby


def _hashed(side: str, id_col: str, text_col: str):
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "__side": side,
            "__h": [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                    for t in b[text_col]]})
    return fn


def corpus_diff(old, new, id_col: str = "doc_id",
                text_col: str = "text",
                num_buckets: int | None = None):
    """→ Dataset (id, status) with status ∈ {added, removed, changed,
    same}.  ``doc_id`` must be unique within each side (snapshot
    semantics; duplicate ids raise inside the fold rather than
    guessing)."""
    o = old.map_batches(_hashed("o", id_col, text_col),
                        batch_format="pandas")
    n = new.map_batches(_hashed("n", id_col, text_col),
                        batch_format="pandas")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        dup = pdf.duplicated(subset=[id_col, "__side"])
        if dup.any():
            bad = pdf.loc[dup, id_col].iloc[0]
            raise ValueError(
                f"corpus_diff: duplicate {id_col}={bad!r} within one "
                "snapshot")
        p = pdf.pivot(index=id_col, columns="__side", values="__h")
        oh = p["o"] if "o" in p.columns else pd.Series(
            pd.NA, index=p.index, dtype="object")
        nh = p["n"] if "n" in p.columns else pd.Series(
            pd.NA, index=p.index, dtype="object")
        # distinct NA fillers: the equality branch is only selected
        # when both sides exist, but np.where evaluates eagerly and
        # pd.NA == str would poison the boolean mask
        eq = (oh.fillna("\x00o").to_numpy()
              == nh.fillna("\x00n").to_numpy())
        status = np.where(
            oh.isna(), "added",
            np.where(nh.isna(), "removed",
                     np.where(eq, "same", "changed")))
        return pd.DataFrame({id_col: p.index.to_numpy(),
                             "status": pd.Series(status,
                                                 dtype="object")})

    return bucketed_groupby(o.union(n), id_col, fold, num_buckets)


def corpus_diff_sql(old_sql: str, new_sql: str,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB oracle: FULL OUTER JOIN over the same md5 digests."""
    return f"""
        WITH o AS (SELECT {id_col}, md5({text_col}) AS h
                   FROM ({old_sql})),
             n AS (SELECT {id_col}, md5({text_col}) AS h
                   FROM ({new_sql}))
        SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col},
               CASE WHEN o.h IS NULL THEN 'added'
                    WHEN n.h IS NULL THEN 'removed'
                    WHEN o.h = n.h THEN 'same'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}"""
