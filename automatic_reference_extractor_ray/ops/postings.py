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


def bm25_topk(docs, terms, k: int = 10, k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"):
    """BM25 retrieval over the corpus for a fixed term set — the query
    consumer the inverted index (``build_postings``) exists to serve:
    "which documents carry this contaminated eval phrase / boilerplate
    marker most heavily?" is a ranked-retrieval question, not a plain
    membership one.

    Reference parity note: the reference has no retrieval surface (its
    lookup is per-request result files); this is part of the
    beyond-the-reference curation family.

    Scale shape — NO shuffle at all, two streaming passes:

    1. stats pass: each batch emits ONE row of partials (n_docs,
       sum_dl, df per query term — the term set is a constant-size
       query, never data-sized), folded on the driver to the global
       (N, avgdl, df_t) BM25 statistics.
    2. score pass: with the folded stats closed over (constant-size,
       shipped in the task closure), each batch scores its own docs
       and emits only its top-``k`` candidates — ≤ nb×k rows reach
       the driver for the final cut.  A doc's score needs nothing
       from any other doc once the stats are global, so no exchange.

    Scoring is oracle-exact: each per-term contribution
    ``idf_t * tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))`` is quantized to
    int64 micro-units (half-up) BEFORE summation, so the doc score is
    an order-independent integer sum the DuckDB oracle reproduces
    bit-exactly (float SUM order never enters the comparison).
    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (the Robertson-Sparck
    Jones form used by Lucene, never negative).

    → pandas (rank, doc_id, score_micro), score desc, doc_id asc ties.
    """
    import math

    terms = sorted({t.lower() for t in terms})
    q = len(terms)
    term_ix = {t: i for i, t in enumerate(terms)}

    def stats_partial(bdf: pd.DataFrame) -> pd.DataFrame:
        dfs = np.zeros(q, dtype=np.int64)
        sum_dl = 0
        for txt in bdf[text_col]:
            toks = TOKEN_RE.findall((txt or "").lower())
            sum_dl += len(toks)
            for t in set(toks):
                i = term_ix.get(t)
                if i is not None:
                    dfs[i] += 1
        row = {"n_docs": np.int64(len(bdf)), "sum_dl": np.int64(sum_dl)}
        for i in range(q):
            row[f"df_{i}"] = dfs[i]
        return pd.DataFrame([row])

    st = docs.map_batches(stats_partial, batch_format="pandas").to_pandas()
    n_docs = int(st["n_docs"].sum())
    sum_dl = int(st["sum_dl"].sum())
    if n_docs == 0 or sum_dl == 0:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype=object),
                             "score_micro": pd.Series([], dtype="int64")})
    dfs = [int(st[f"df_{i}"].sum()) for i in range(q)]
    avgdl = sum_dl / n_docs
    # scalar libm log, matching DuckDB's ln() on the same machine —
    # every other op in the contribution is an IEEE-exact mul/div/add
    # with an identical expression tree on the SQL side
    idf = [math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for d in dfs]

    def score_partial(bdf: pd.DataFrame) -> pd.DataFrame:
        out_id, out_s = [], []
        for did, txt in zip(bdf[id_col], bdf[text_col]):
            toks = TOKEN_RE.findall((txt or "").lower())
            dl = len(toks)
            if not dl:
                continue
            score = 0
            for i, t in enumerate(terms):
                tf = toks.count(t)
                if tf:
                    core = (tf * (k1 + 1.0)) / (
                        tf + k1 * (1.0 - b + b * (dl / avgdl)))
                    score += int(math.floor(idf[i] * core * 1000000.0 + 0.5))
            if score > 0:
                out_id.append(did)
                out_s.append(score)
        cand = pd.DataFrame({id_col: pd.Series(out_id, dtype=bdf[id_col].dtype),
                             "score_micro": pd.Series(out_s, dtype="int64")})
        # per-batch candidate cut — scores are already final (stats are
        # global), so batch top-k is a correct candidate filter
        return (cand.sort_values(["score_micro", id_col],
                                 ascending=[False, True], kind="mergesort")
                .head(k))

    cand = docs.map_batches(score_partial,
                            batch_format="pandas").to_pandas()  # ≤ nb×k
    if cand.empty:        # all-empty blocks lose their pandas schema
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype=object),
                             "score_micro": pd.Series([], dtype="int64")})
    top = (cand.sort_values(["score_micro", id_col],
                            ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype="int64"))
    return top[["rank", id_col, "score_micro"]]


def bm25_topk_sql(terms, k: int = 10, k1: float = 1.2,
                  b: float = 0.75) -> str:
    """DuckDB oracle for ``bm25_topk`` over the ``documents`` view —
    same tokenizer, same per-term int64 micro-unit quantization before
    the sum, IDENTICAL float expression tree (ln / mul / div
    parenthesization mirrors the Python, so the doubles match bit for
    bit and the half-up FLOOR(x+0.5) lands identically)."""
    terms = sorted({t.lower() for t in terms})
    tlist = ", ".join(f"'{t}'" for t in terms)
    k1r, br = repr(float(k1)), repr(float(b))
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
          FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (
          SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) AS sum_dl
        ),
        tf AS (
          SELECT doc_id, token, COUNT(*) AS tf FROM toks
          WHERE token IN ({tlist}) GROUP BY doc_id, token
        ),
        tdf AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        contrib AS (
          SELECT tf.doc_id,
                 CAST(FLOOR(
                   ln(1.0 + (stats.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
                   * ((tf.tf * ({k1r} + 1.0))
                      / (tf.tf + {k1r} * (1.0 - {br}
                         + {br} * (dl.dl / (CAST(stats.sum_dl AS DOUBLE)
                                            / stats.n_docs)))))
                   * 1000000.0 + 0.5) AS BIGINT) AS c
          FROM tf
          CROSS JOIN stats
          JOIN tdf USING (token)
          JOIN dl ON dl.doc_id = tf.doc_id
        ),
        scored AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_micro
          FROM contrib GROUP BY doc_id HAVING SUM(c) > 0
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id)
                    AS BIGINT) AS rank,
               doc_id, score_micro
        FROM scored
        ORDER BY score_micro DESC, doc_id
        LIMIT {k}
    """


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
