"""Inverted-index construction with bounded posting lists.

A training-data pipeline wants a token -> documents index for corpus
QA (which documents carry this boilerplate marker? where does this
contaminated eval phrase live?) without paying for unbounded posting
lists — a stopword's full postings at web scale is the corpus itself.
``build_postings`` therefore materializes, per token, the exact
document frequency plus the ``k`` SMALLEST doc ids (a deterministic,
associatively-mergeable cap: min-k is a valid combiner, so hot tokens
never ship more than ``batches x k`` ids through the exchange).

Reference parity note: the reference has no index builder — its lookup
surface is the per-request result files (`LOCDB-V3/app.py` fileview) —
so this operator is part of the beyond-the-reference curation family,
in the same mold as ``analytics.topk_tokens`` (per-batch partials, one
bounded-bucket exchange, no driver-side materialization of anything
vocabulary-sized beyond the returned index itself).

Scale shape:
- per-batch: one pass over the batch's docs builds token -> (df
  partial, min-k ids) — each doc lives in exactly ONE batch, so
  per-batch distinct-doc counts SUM exactly across batches (the
  ``duplicated_passages`` argument).
- exchange: one ``bucketed_groupby`` on the token; each token's
  partials land whole in one bucket.  Row volume is (distinct tokens
  per batch), id volume capped at k per token per batch.
- per-bucket: sum the df partials, merge + cut the id lists to k.
  Output is the index itself (vocabulary-sized, the caller's ask).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analytics import TOKEN_RE
from .shuffle import bucketed_groupby


def build_postings(docs, k: int = 16, min_df: int = 1,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_buckets: int | None = None):
    """-> Dataset (token, df, postings) where ``df`` is the exact
    distinct-document frequency and ``postings`` is the ``k`` smallest
    doc ids, ascending, comma-joined.  ``min_df`` prunes the long tail
    of hapax tokens at the bucket (before anything returns).
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # the id ORDER must agree between this cut and the bucket
        # merge (a min-k combiner is only associative under one fixed
        # order): integer columns sort numerically, everything else
        # lexically on the string form — carried to the merge as a
        # constant flag so digit-STRING ids stay lexical end-to-end
        numeric = pd.api.types.is_integer_dtype(b[id_col])
        tok2ids: dict[str, list] = {}
        for did, t in zip(b[id_col], b[text_col]):
            for tok in set(TOKEN_RE.findall((t or "").lower())):
                tok2ids.setdefault(tok, []).append(did)
        if not tok2ids:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype="int64"),
                                 "postings": pd.Series([], dtype=object),
                                 "numeric": pd.Series([], dtype=bool)})
        toks = list(tok2ids.keys())
        dfs = np.fromiter((len(v) for v in tok2ids.values()),
                          np.int64, len(tok2ids))
        posts = [",".join(str(x) for x in sorted(v)[:k])
                 if numeric else
                 ",".join(sorted(str(x) for x in v)[:k])
                 for v in tok2ids.values()]
        return pd.DataFrame({"token": toks, "df": dfs, "postings": posts,
                             "numeric": numeric})

    partials = docs.map_batches(partial, batch_format="pandas")

    def bucket_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        numeric = bool(pdf["numeric"].iloc[0]) if len(pdf) else False
        g = (pdf.groupby("token", sort=False)
             .agg(df=("df", "sum"), postings=("postings", ",".join))
             .reset_index())
        if min_df > 1:
            g = g[g["df"] >= min_df]
        # merge-and-cut: ids are disjoint across partials (one batch
        # per doc), so a plain sort of the concatenation is the merge
        # — under the SAME order the partial cut used (the `numeric`
        # flag): int ids numerically (int64 ORDER BY), string ids
        # lexically (varchar ORDER BY), digit strings included
        def _cut(s: str) -> str:
            ids = s.split(",")
            ids = sorted(ids, key=int) if numeric else sorted(ids)
            return ",".join(ids[:k])

        g["postings"] = [_cut(s) for s in g["postings"]]
        return g[["token", "df", "postings"]]

    return bucketed_groupby(partials, "token", bucket_merge, num_buckets)


def build_postings_sql(k: int = 16, min_df: int = 1) -> str:
    """DuckDB oracle for ``build_postings`` over the ``documents``
    view (same tokenizer, same min-k cap, same comma join)."""
    return f"""
        WITH raw AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
          FROM documents
        ),
        tok AS (SELECT DISTINCT doc_id, token FROM raw),
        agg AS (
          SELECT token, COUNT(*) AS df,
                 LIST(doc_id ORDER BY doc_id) AS ids
          FROM tok GROUP BY token
        )
        SELECT token, df,
               array_to_string(list_transform(ids[1:{k}],
                                              x -> CAST(x AS VARCHAR)),
                               ',') AS postings
        FROM agg WHERE df >= {min_df}
    """
