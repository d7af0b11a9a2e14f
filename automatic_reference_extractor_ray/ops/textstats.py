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
    # null-safe: a flat documents table reaches these ops without the
    # ingest validator, and a None text must read as empty, not crash
    return TOKEN_RE.findall((s or "").lower())


# ---- Arrow-kernel streaming maps (token_counts, quality_metrics,
# lang_guess, fingerprint, quality_filter) ----------------------------
#
# These are pure per-row maps, so they follow ``scrub_text``'s pattern:
# every count is an RE2 kernel call on the Arrow string column — no
# Python row loop.  They accept EITHER a pyarrow Table (the zero-copy
# ``batch_format="pyarrow"`` pipeline path) or a pandas DataFrame
# (tests / composed pandas stages) and return the same type.
#
# Exact stopword-token counting without lookarounds (RE2 has none):
# lowercase, then replace every separator run ``[^a-z0-9]+`` with TWO
# spaces and pad both ends — every token is now flanked by spaces it
# does not share with its neighbor, so non-overlapping matches of
# ``" word "`` count exactly the tokens equal to ``word``.

def _pa():
    import pyarrow as pa
    import pyarrow.compute as pc
    return pa, pc


def _is_table(batch) -> bool:
    import pyarrow as pa
    return isinstance(batch, pa.Table)


def _text_cols(batch):
    """→ (pa.Array doc_id, pa.Array text, was_table)."""
    pa, _ = _pa()
    if _is_table(batch):
        return batch["doc_id"], batch["text"], True
    return (pa.array(batch["doc_id"]),
            pa.array(batch["text"], type=pa.string()), False)


def _emit(cols: dict, was_table: bool):
    pa, _ = _pa()
    t = pa.table(cols)
    return t if was_table else t.to_pandas()


def _padded_tokens(pc, text):
    """'  tok1  tok2  ' spread form of the lowercased text."""
    low = pc.utf8_lower(pc.fill_null(text, ""))
    spread = pc.replace_substring_regex(low, "[^a-z0-9]+", "  ")
    return low, pc.binary_join_element_wise("", spread, "", "  ")


def _word_alt(words: list[str]) -> str:
    return " (?:" + "|".join(words) + ") "


def token_counts(batch):
    pa, pc = _pa()
    doc_id, text, was_table = _text_cols(batch)
    low = pc.utf8_lower(pc.fill_null(text, ""))
    n = pc.cast(pc.count_substring_regex(low, "[a-z0-9]+"), pa.int64())
    return _emit({"doc_id": doc_id, "n_tokens": n}, was_table)


def quality_metrics(batch):
    pa, pc = _pa()
    doc_id, text, was_table = _text_cols(batch)
    filled = pc.fill_null(text, "")
    low, padded = _padded_tokens(pc, text)
    i64 = lambda a: pc.cast(a, pa.int64())        # noqa: E731
    return _emit({
        "doc_id": doc_id,
        "n_chars2": i64(pc.utf8_length(filled)),
        "n_tokens": i64(pc.count_substring_regex(low, "[a-z0-9]+")),
        "n_punct": i64(pc.count_substring_regex(filled, "[.,;:!?]")),
        "n_stopwords": i64(pc.count_substring_regex(
            padded, _word_alt(EN_STOP))),
    }, was_table)


def lang_guess(batch):
    pa, pc = _pa()
    doc_id, text, was_table = _text_cols(batch)
    _, padded = _padded_tokens(pc, text)
    en = pc.count_substring_regex(padded, _word_alt(EN_STOP))
    de = pc.count_substring_regex(padded, _word_alt(DE_STOP))
    guess = pc.if_else(
        pc.greater(en, de), pa.scalar("en"),
        pc.if_else(pc.greater(de, en), pa.scalar("de"),
                   pa.scalar("unknown")))
    return _emit({"doc_id": doc_id, "lang_guess": guess}, was_table)


def fingerprint(batch):
    """Content fingerprint: md5 of the whitespace-normalized lowercase
    text (the rolling-hash analogue with an oracle-computable hash).
    Normalization is Arrow kernels; only the md5 itself is per-row
    (hashlib has no vectorized form)."""
    pa, pc = _pa()
    doc_id, text, was_table = _text_cols(batch)
    norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
        pc.utf8_lower(pc.fill_null(text, "")), r"\s+", " "))
    fp = pa.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest()
         for s in norm.to_pylist()], type=pa.string())
    return _emit({"doc_id": doc_id, "fp": fp}, was_table)


def duplicated_passages(docs, n: int = 8):
    """Exact duplicated-passage detection (the training-data dedup of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2021, at token-n-gram granularity): every ordered ``n``-token
    passage that occurs more than once in the corpus, with its
    occurrence and document counts.

    → (gram, n_occurrences, n_docs) for passages with n_occurrences>1.

    Scale shape: each batch pre-combines its grams to ONE
    (gram, occ, n_docs) partial row — a document's grams never straddle
    batches, so local ``nunique`` partials sum exactly — and the
    bounded-bucket shuffle then moves at most one row per gram per
    block: a boilerplate gram occurring in half the corpus lands as
    ~nblocks partial rows in its bucket, never as its raw occurrence
    list.  The >1 filter runs inside the bucket so singleton grams
    never leave it.  At 100 TB, hash the gram to a 16-byte digest
    before the shuffle and join digests back to one exemplar string
    per digest if the text is needed.
    """
    from .shuffle import bucketed_groupby

    def gram_partials(batch: pd.DataFrame) -> pd.DataFrame:
        gs, ds = [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            toks = _tokens(t)
            for i in range(len(toks) - n + 1):
                gs.append(" ".join(toks[i:i + n]))
                ds.append(d)
        df = pd.DataFrame({"gram": gs, "doc_id": ds})
        g = df.groupby("gram", sort=False)["doc_id"].agg(
            occ="size", nd="nunique").reset_index()
        return g

    def dup_only(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("gram")[["occ", "nd"]].sum()
        g = g[g["occ"] > 1]
        return pd.DataFrame({"gram": g.index,
                             "n_occurrences": g["occ"].astype("int64"),
                             "n_docs": g["nd"].astype("int64")})

    return bucketed_groupby(
        docs.map_batches(gram_partials, batch_format="pandas"),
        "gram", dup_only)


def quality_filter(batch):
    """Gopher-style rule filter (Rae et al. 2021 §A1.1, integerized so
    the SQL oracle mirrors it exactly): per-doc flags plus the final
    ``keep`` verdict a cleaning pipeline acts on.

      too_short        n_tokens < 40
      bad_word_len     mean token length x100 outside [300, 1000]
      low_stopwords    stopword fraction x1000 < 10 (≈ Gopher's
                       "must contain stop words" proxy)

    All arithmetic is integer (floor division), no float boundaries.
    Counts are RE2 kernels on the Arrow column (token-total length is
    the length of the text with every separator stripped); the integer
    math runs in numpy on the zero-copy int views.
    """
    pa, pc = _pa()
    doc_id, text, was_table = _text_cols(batch)
    low, padded = _padded_tokens(pc, text)
    n = pc.cast(pc.count_substring_regex(low, "[a-z0-9]+"),
                pa.int64()).to_numpy(zero_copy_only=False)
    sum_len = pc.cast(pc.utf8_length(pc.replace_substring_regex(
        low, "[^a-z0-9]+", "")), pa.int64()).to_numpy(zero_copy_only=False)
    n_stop = pc.cast(pc.count_substring_regex(padded, _word_alt(EN_STOP)),
                     pa.int64()).to_numpy(zero_copy_only=False)
    safe_n = np.where(n > 0, n, 1)
    mean_wlen = (100 * sum_len) // safe_n
    stop_rate = (1000 * n_stop) // safe_n
    too_short = n < 40
    bad_word_len = (mean_wlen < 300) | (mean_wlen > 1000)
    low_stop = stop_rate < 10
    return _emit({
        "doc_id": doc_id,
        "n_tokens": pa.array(n, pa.int64()),
        "mean_wlen_x100": pa.array(mean_wlen, pa.int64()),
        "stop_rate_x1000": pa.array(stop_rate, pa.int64()),
        "flag_too_short": pa.array(too_short),
        "flag_bad_word_len": pa.array(bad_word_len),
        "flag_low_stopwords": pa.array(low_stop),
        "keep": pa.array(~(too_short | bad_word_len | low_stop)),
    }, was_table)

# ------------------------------------------- benchmark decontamination

def _h8(doc_id) -> str:
    return hashlib.md5(str(doc_id).encode("utf-8")).hexdigest()[:8]


def _side_fn(eval_frac: float, holdout: str):
    """doc_id → side (0 = eval/held-out, 1 = train), the md5-threshold
    split shared by the exact and Bloom decontamination paths."""
    from .analytics import _hex_threshold

    if holdout not in ("low", "high"):
        raise ValueError(f"holdout must be 'low' or 'high', got {holdout!r}")
    thr = (_hex_threshold(1.0 - eval_frac) if holdout == "high"
           else _hex_threshold(eval_frac))
    eval_is_low = holdout == "low"

    def _side(doc_id) -> int:
        h8 = _h8(doc_id)
        return (0 if h8 < thr else 1) if eval_is_low else \
               (1 if h8 < thr else 0)
    return _side


def decontaminate(docs, n: int = 4, eval_frac: float = 0.1,
                  num_buckets: int | None = None, holdout: str = "low"):
    """Benchmark decontamination (the word-n-gram overlap filter of
    Brown et al. 2020 appendix C, as run by training pipelines before
    every release): the corpus splits deterministically into a held-out
    eval side (md5-threshold, the ``hash_split`` convention) and a
    train side; a train document is contaminated iff it shares at least
    one word ``n``-gram with ANY eval document.

    → (doc_id, n_shared, keep) for every TRAIN document, where
    ``n_shared`` counts the doc's DISTINCT contaminated n-grams and
    ``keep`` (int 0/1) is the filter verdict.

    Scale shape, skew-proof on boilerplate grams: train-side
    (gram, doc_id) rows are per-doc DISTINCT at the source (a doc's
    grams never straddle batches); the contamination test is a SALTED
    semi join — train rows shard by doc-salt, the per-BATCH-distinct
    eval gram stream replicates per shard (semi-join membership is
    duplicate-insensitive, so no global eval DISTINCT exchange is
    needed), and a gram occurring in half the train corpus splits
    across tasks instead of concentrating its posting list in one.
    Per-doc hit counts union with a zero row per train doc and fold
    through a bucketed aggregate on doc_id.  Nothing
    data-proportional — no eval-gram set, no contaminated-id list —
    ever reaches the driver, unlike the broadcast design most
    pipelines start with.

    ``holdout="low"`` (default) holds out the BOTTOM ``eval_frac`` of
    the md5 range; ``holdout="high"`` holds out the TOP ``eval_frac``,
    which makes the train side exactly ``hash_split``'s 'train' split
    when ``eval_frac`` = 1 - train ratio (the curation-pipeline
    orientation: decontaminate train against val+test).
    """
    from .dedup import _doc_key_dtype
    from .shuffle import bucketed_groupby, salted_lookup_join

    _side = _side_fn(eval_frac, holdout)
    dt = _doc_key_dtype(docs)

    # grams cross every exchange as 128-bit hashes (two int64 columns,
    # _doc_gram_hashes128) — 16 fixed bytes per gram instead of a
    # variable-length string column, md5-class collision odds, and the
    # per-doc gram-set Python loops become one vectorized pass
    def train_rows(batch: pd.DataFrame) -> pd.DataFrame:
        side = np.fromiter((_side(d) for d in batch["doc_id"]),
                           np.int64, len(batch))
        tb = batch[side == 1]
        dv, g1, g2 = _doc_gram_hashes128(tb["text"].tolist(), n)
        return pd.DataFrame({
            "g1": g1, "g2": g2,
            "doc_id": pd.Series(tb["doc_id"].to_numpy()[dv], dtype=dt)})

    def eval_grams(batch: pd.DataFrame) -> pd.DataFrame:
        side = np.fromiter((_side(d) for d in batch["doc_id"]),
                           np.int64, len(batch))
        eb = batch[side == 0]
        _, g1, g2 = _doc_gram_hashes128(eb["text"].tolist(), n)
        return pd.DataFrame({"g1": g1, "g2": g2}).drop_duplicates()

    # per-batch-distinct only: semi-join membership tolerates duplicate
    # right rows, so the global DISTINCT exchange would be pure cost
    eval_set = docs.map_batches(eval_grams, batch_format="pandas")

    hits = salted_lookup_join(
        docs.map_batches(train_rows, batch_format="pandas"), eval_set,
        on=["g1", "g2"], salt_col="doc_id",
        left_schema={"g1": "int64", "g2": "int64", "doc_id": dt},
        right_schema={"g1": "int64", "g2": "int64"},
        num_buckets=num_buckets, how="semi")

    # (gram, doc) rows are globally distinct (per-doc sets, one batch
    # per doc), so per-block sizes sum to the distinct-gram hit count
    partials = hits.map_batches(
        lambda b: b.groupby("doc_id", sort=False).size()
                   .rename("n_shared").reset_index(),
        batch_format="pandas")

    # zero row per train doc (docs shorter than n grams included) so
    # clean docs appear in the verdict table without a sentinel gram
    # hot-spotting one bucket
    def zero_rows(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [d for d in batch["doc_id"] if _side(d) == 1]
        return pd.DataFrame({
            "doc_id": pd.Series(keep, dtype=batch["doc_id"].dtype),
            "n_shared": np.zeros(len(keep), dtype=np.int64)})

    merged = partials.union(
        docs.map_batches(zero_rows, batch_format="pandas"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("doc_id")["n_shared"].sum()
        ns = g.to_numpy(np.int64)
        return pd.DataFrame({"doc_id": g.index, "n_shared": ns,
                             "keep": (ns == 0).astype(np.int64)})

    return bucketed_groupby(merged, "doc_id", fold, num_buckets)


def decontaminate_sql(n: int = 4, eval_frac: float = 0.1,
                      holdout: str = "low") -> str:
    """DuckDB oracle mirroring ``decontaminate`` bit-for-bit."""
    from .analytics import _hex_threshold
    if holdout == "high":
        thr = _hex_threshold(1.0 - eval_frac)
        eval_cond, train_cond = f"h8 >= '{thr}'", f"h8 < '{thr}'"
    else:
        thr = _hex_threshold(eval_frac)
        eval_cond, train_cond = f"h8 < '{thr}'", f"h8 >= '{thr}'"
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return f"""
        WITH toks AS (
          SELECT doc_id, {tok} AS t,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
          FROM documents),
        grams AS (
          SELECT doc_id, h8, array_to_string(t[i : i + {n - 1}], ' ') AS gram
          FROM (SELECT doc_id, h8, t,
                       unnest(range(1, len(t) - {n} + 2)) AS i
                FROM toks WHERE len(t) >= {n})),
        eval_g AS (SELECT DISTINCT gram FROM grams WHERE {eval_cond}),
        hits AS (
          SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
          FROM grams g JOIN eval_g e USING (gram)
          WHERE g.{train_cond}
          GROUP BY g.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
               CAST(CASE WHEN COALESCE(h.n_shared, 0) = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM toks d LEFT JOIN hits h USING (doc_id)
        WHERE d.{train_cond}"""


def contamination_report(docs, n: int = 4, eval_frac: float = 0.1,
                         num_buckets: int | None = None,
                         holdout: str = "low"):
    """Per-EVAL-document leakage audit — the reporting complement of
    ``decontaminate``: for every held-out eval document, count the
    DISTINCT train documents that share at least one word ``n``-gram
    with it.  A release gate reads this table to decide whether an
    eval set is still trustworthy (an eval doc with hundreds of train
    near-copies measures memorization, not generalization) — the
    Brown et al. 2020 appendix-C overlap statistic, aggregated on the
    eval side instead of filtering the train side.

    → (doc_id, n_train_docs) for every EVAL document (0 for clean
    docs, including docs shorter than ``n`` tokens).

    Scale shape: grams cross every exchange as 128-bit hashes; the
    (train-gram, train-doc) stream — per-doc distinct at the source —
    meets the per-doc-distinct eval gram rows in a SALTED inner join
    (train rows shard by doc-salt, the eval side replicates per
    shard: the EVAL side is the small one by definition, so
    replication is bounded by the benchmark suite's size, and a
    boilerplate gram's train postings split across shards instead of
    concentrating).  The (train_doc, eval_doc) hit pairs pre-dedupe
    per batch and fold through ONE eval-doc-bucketed exchange where
    an exact ``nunique`` runs per eval id (every row of an eval id
    lands whole in its bucket).  Nothing data-proportional reaches
    the driver."""
    from .dedup import _doc_key_dtype
    from .shuffle import bucketed_groupby, salted_lookup_join

    _side = _side_fn(eval_frac, holdout)
    dt = _doc_key_dtype(docs)

    def train_rows(batch: pd.DataFrame) -> pd.DataFrame:
        side = np.fromiter((_side(d) for d in batch["doc_id"]),
                           np.int64, len(batch))
        tb = batch[side == 1]
        dv, g1, g2 = _doc_gram_hashes128(tb["text"].tolist(), n)
        return pd.DataFrame({
            "g1": g1, "g2": g2,
            "doc_id": pd.Series(tb["doc_id"].to_numpy()[dv], dtype=dt)})

    def eval_rows(batch: pd.DataFrame) -> pd.DataFrame:
        side = np.fromiter((_side(d) for d in batch["doc_id"]),
                           np.int64, len(batch))
        eb = batch[side == 0]
        dv, g1, g2 = _doc_gram_hashes128(eb["text"].tolist(), n)
        return pd.DataFrame({
            "g1": g1, "g2": g2,
            "eval_id": pd.Series(eb["doc_id"].to_numpy()[dv], dtype=dt)})

    pairs = salted_lookup_join(
        docs.map_batches(train_rows, batch_format="pandas"),
        docs.map_batches(eval_rows, batch_format="pandas"),
        on=["g1", "g2"], salt_col="doc_id",
        left_schema={"g1": "int64", "g2": "int64", "doc_id": dt},
        right_schema={"g1": "int64", "g2": "int64", "eval_id": dt},
        num_buckets=num_buckets, how="inner",
        post=lambda d: d[["doc_id", "eval_id"]].drop_duplicates())

    def hit_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["hit"] = np.ones(len(b), dtype=np.int64)
        return out

    # zero row per eval doc (hit=0, self-filler keeps the dtype) so
    # clean eval docs appear in the report
    def zero_rows(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [d for d in batch["doc_id"] if _side(d) == 0]
        s = pd.Series(keep, dtype=batch["doc_id"].dtype)
        return pd.DataFrame({"doc_id": s, "eval_id": s,
                             "hit": np.zeros(len(keep), dtype=np.int64)})

    merged = pairs.map_batches(hit_rows, batch_format="pandas").union(
        docs.map_batches(zero_rows, batch_format="pandas"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        hits = pdf[pdf["hit"] == 1]
        g = hits.groupby("eval_id")["doc_id"].nunique()
        ids = pd.unique(pdf["eval_id"])
        nn = g.reindex(ids, fill_value=0).to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype=pdf["eval_id"].dtype),
            "n_train_docs": nn})

    return bucketed_groupby(merged, "eval_id", fold, num_buckets)


def contamination_report_sql(n: int = 4, eval_frac: float = 0.1,
                             holdout: str = "low") -> str:
    """DuckDB oracle mirroring ``contamination_report`` bit-for-bit."""
    from .analytics import _hex_threshold
    if holdout == "high":
        thr = _hex_threshold(1.0 - eval_frac)
        eval_cond, train_cond = f"h8 >= '{thr}'", f"h8 < '{thr}'"
    else:
        thr = _hex_threshold(eval_frac)
        eval_cond, train_cond = f"h8 < '{thr}'", f"h8 >= '{thr}'"
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return f"""
        WITH toks AS (
          SELECT doc_id, {tok} AS t,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
          FROM documents),
        grams AS (
          SELECT doc_id, h8, array_to_string(t[i : i + {n - 1}], ' ') AS gram
          FROM (SELECT doc_id, h8, t,
                       unnest(range(1, len(t) - {n} + 2)) AS i
                FROM toks WHERE len(t) >= {n})),
        hits AS (
          SELECT e.doc_id, COUNT(DISTINCT t.doc_id) AS n_train_docs
          FROM (SELECT DISTINCT doc_id, gram FROM grams WHERE {eval_cond}) e
          JOIN (SELECT DISTINCT doc_id, gram FROM grams WHERE {train_cond}) t
            USING (gram)
          GROUP BY e.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(h.n_train_docs, 0) AS BIGINT) AS n_train_docs
        FROM toks d LEFT JOIN hits h USING (doc_id)
        WHERE d.{eval_cond}"""


# --------------------------------------------- text normalization

ASCII_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def normalize_text(batch: pd.DataFrame) -> pd.DataFrame:
    """Canonical text normalization (the pre-dedup / pre-tokenize
    cleanup pass): lowercase → accent strip (NFD, drop combining
    marks) → collapse ASCII whitespace runs → trim.

    → (doc_id, text_norm).  The whitespace class is EXPLICIT ASCII
    because RE2's ``\\s`` is ASCII-only while Python's is Unicode —
    the one dialect gap that would silently break the byte-exact
    oracle (DuckDB ``strip_accents`` == Python NFD-strip, verified in
    tests on accented fixtures).  Pure per-row map, streams anywhere.
    """
    import unicodedata

    def norm(s: str) -> str:
        s = (s or "").lower()
        s = "".join(c for c in unicodedata.normalize("NFD", s)
                    if not unicodedata.combining(c))
        return ASCII_WS_RE.sub(" ", s).strip()

    return pd.DataFrame({"doc_id": batch["doc_id"],
                         "text_norm": batch["text"].map(norm)})


NORMALIZE_SQL = r"""
    SELECT doc_id,
           trim(regexp_replace(strip_accents(lower(COALESCE(text, ''))),
                               '[ \t\r\n\f\v]+', ' ', 'g')) AS text_norm
    FROM documents"""


# ------------------------------------- Bloom-filter decontamination

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — full-avalanche uint64 mix,
    deterministic across processes (no PYTHONHASHSEED dependence)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_GRAM_P = np.uint64(0x100000001B3)            # FNV-64 prime
_H2_XOR = np.uint64(0xA5A5A5A5A5A5A5A5)

_EMPTY_I64 = np.array([], dtype=np.int64)
_EMPTY_U64 = np.array([], dtype=np.uint64)


def _batch_gram_hashes(texts, n: int):
    """Every rolling word-n-gram of every text, as 64-bit hashes —
    vectorized: per-token siphash via pandas' C ``hash_array``, then a
    positional polynomial combine of n consecutive token hashes (a loop
    over n ≈ 4 positions, never over grams), splitmix-finalized.

    → (doc_idx int64, gram_hash uint64) aligned arrays; grams spanning
    a document boundary are masked out.
    """
    toks = [_tokens(t) for t in texts]
    lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
    flat = [w for ts in toks for w in ts]
    total = int(lens.sum())
    if total < n:
        return _EMPTY_I64, _EMPTY_U64
    th = pd.util.hash_array(np.asarray(flat, dtype=object))
    di = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    m = total - n + 1
    gh = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        gh = gh * _GRAM_P + th[j:j + m]
    gh = _splitmix64(gh)
    valid = di[:m] == di[n - 1:]          # gram lies inside one doc
    return di[:m][valid], gh[valid]


_GRAM_KEY2 = "arx.gram.lane-2!"          # 16 chars, pandas hash_array key
_GRAM_Q = np.uint64(0x9E3779B97F4A7C15)  # lane-2 combine multiplier


def _doc_gram_hashes128(texts, n: int):
    """Per text: its DISTINCT word-``n``-gram identities as 128-bit
    hashes, fully vectorized — the exchange-key form of
    ``_batch_gram_hashes``.

    Two independent 64-bit lanes (pandas' C siphash under two fixed
    keys, positional-polynomial combine with a distinct odd multiplier
    per lane, splitmix-finalized) identify a gram to ~2^-128 collision
    odds — the same exactness class as the md5 ``content_hash``
    convention, so ops that exchange (g1, g2) int64 pairs instead of
    gram STRINGS stay oracle-exact while moving 16 fixed bytes per
    gram through the shuffle instead of a variable-length object
    column.

    → (doc_idx int64, g1 int64, g2 int64), one row per distinct gram
    per doc (per-doc dedup via one lexsort); grams spanning a document
    boundary are masked out, docs shorter than ``n`` tokens contribute
    nothing.
    """
    toks = [_tokens(t) for t in texts]
    lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
    flat = [w for ts in toks for w in ts]
    total = int(lens.sum())
    if total < n:
        return _EMPTY_I64, _EMPTY_I64, _EMPTY_I64
    arr = np.asarray(flat, dtype=object)
    h1 = pd.util.hash_array(arr)
    h2 = pd.util.hash_array(arr, hash_key=_GRAM_KEY2)
    di = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    m = total - n + 1
    g1 = np.zeros(m, dtype=np.uint64)
    g2 = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        g1 = g1 * _GRAM_P + h1[j:j + m]
        g2 = g2 * _GRAM_Q + h2[j:j + m]
    g1, g2 = _splitmix64(g1), _splitmix64(g2)
    valid = di[:m] == di[n - 1:]          # gram lies inside one doc
    dv, g1, g2 = di[:m][valid], g1[valid], g2[valid]
    if not len(dv):
        return _EMPTY_I64, _EMPTY_I64, _EMPTY_I64
    order = np.lexsort((g2, g1, dv))
    dv, g1, g2 = dv[order], g1[order], g2[order]
    keep = np.ones(len(dv), dtype=bool)
    keep[1:] = ((dv[1:] != dv[:-1]) | (g1[1:] != g1[:-1])
                | (g2[1:] != g2[:-1]))
    return (dv[keep], g1[keep].view(np.int64).copy(),
            g2[keep].view(np.int64).copy())


def _bloom_positions(gh: np.ndarray, m_bits: int, k: int):
    """k bit positions per gram via double hashing (h1 + i*h2, Kirsch
    & Mitzenmacher 2006) — yields k int64 index arrays, one per probe,
    so callers gather/scatter a whole batch of grams per probe."""
    h1 = gh
    h2 = _splitmix64(gh ^ _H2_XOR) | np.uint64(1)
    mb = np.uint64(m_bits)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % mb).astype(np.int64)


def decontaminate_bloom(docs, n: int = 4, eval_frac: float = 0.1,
                        holdout: str = "low", m_bits: int = 1 << 22,
                        k: int = 4):
    """Approximate decontamination — the broadcast-sketch scale path
    next to the exact posting-list ``decontaminate`` (same pairing as
    exact/approx quantiles): eval-side n-grams populate a Bloom filter,
    train docs are flagged by membership test.  One-sided error: every
    truly contaminated doc is flagged (no false negatives); a clean doc
    is mis-flagged with probability ~(1-e^{-kn/m})^k per gram.

    → (doc_id, n_flagged, keep) for every TRAIN document.

    Scale shape: the build is a distributed OR-reduce — each input
    block emits one packed ``m_bits/8``-byte partial bitmap (512 KiB at
    the default), the driver ORs those small partials, and the filter
    pass reads the finished sketch via one ``ray.put`` handle inside
    ``map_batches`` — the canonical broadcast-small-side pattern.  The
    eval gram SET never materializes anywhere, unlike the exact path's
    per-bucket posting lists; at 100 TB the sketch stays 512 KiB while
    the exact path shuffles every gram occurrence.

    Kernels are fully vectorized: token hashes via pandas' C siphash,
    rolling gram hashes via a positional polynomial combine (loop over
    n positions, never over grams), membership as k vectorized bit
    gathers.  Grams are identified by their 64-bit hash (insert, probe
    AND the per-doc distinct count) — a 64-bit collision can merge two
    grams, which preserves the one-sided no-false-negative guarantee
    (a colliding gram can only ADD a flag, never clear one).
    """
    import ray

    _side = _side_fn(eval_frac, holdout)
    n_bytes = m_bits // 8

    def partial_bitmap(batch: pd.DataFrame) -> pd.DataFrame:
        is_eval = np.fromiter((_side(d) == 0 for d in batch["doc_id"]),
                              bool, len(batch))
        _, gh = _batch_gram_hashes(
            list(batch.loc[is_eval, "text"]), n)
        if gh.size == 0:
            return pd.DataFrame({"bitmap": pd.Series([], dtype=object)})
        bits = np.zeros(m_bits, dtype=bool)
        for idx in _bloom_positions(gh, m_bits, k):
            bits[idx] = True
        return pd.DataFrame({"bitmap": [np.packbits(bits).tobytes()]})

    # streaming OR-reduce: fold each block's 512 KiB partial as it
    # arrives (iter_batches) instead of take_all() — driver memory is
    # ONE partial + the accumulator, not num_blocks x m_bits/8, which
    # at 100 TB block counts would be gigabytes held at once
    merged = np.zeros(n_bytes, dtype=np.uint8)
    partials = docs.map_batches(partial_bitmap, batch_format="pandas")
    for pdf in partials.iter_batches(batch_size=None,
                                     batch_format="pandas"):
        for buf in pdf["bitmap"]:            # one small row per block
            merged |= np.frombuffer(buf, dtype=np.uint8)
    sketch_ref = ray.put(merged.tobytes())

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.unpackbits(
            np.frombuffer(ray.get(sketch_ref), dtype=np.uint8)
        ).view(bool)
        is_train = np.fromiter((_side(d) == 1 for d in batch["doc_id"]),
                               bool, len(batch))
        dids = batch.loc[is_train, "doc_id"].reset_index(drop=True)
        di, gh = _batch_gram_hashes(list(batch.loc[is_train, "text"]), n)
        hits = np.zeros(len(dids), dtype=np.int64)
        if gh.size:
            ok = np.ones(gh.size, dtype=bool)
            for idx in _bloom_positions(gh, m_bits, k):
                ok &= bits[idx]
            # distinct grams per doc (by 64-bit gram hash): sort by
            # (doc, hash), count only each gram's first occurrence
            order = np.lexsort((gh, di))
            ds_, gs_ = di[order], gh[order]
            first = np.ones(ds_.size, dtype=bool)
            first[1:] = (ds_[1:] != ds_[:-1]) | (gs_[1:] != gs_[:-1])
            hits = np.bincount(ds_[first & ok[order]],
                               minlength=len(dids)).astype(np.int64)
        return pd.DataFrame({
            "doc_id": dids,
            "n_flagged": hits,
            "keep": (hits == 0).astype(np.int64),
        })

    return docs.map_batches(flag, batch_format="pandas")


# --------------------------------------------- pattern scrubbing

# (name, RE2 pattern, replacement) applied IN ORDER — later patterns see
# earlier replacements, exactly like a production PII-scrub chain.  The
# email pattern is the real-world shape; the entity pattern is the one
# that actually fires on the synthetic corpus so the oracle check is
# non-degenerate.  Both pyarrow.compute and DuckDB run RE2, so the Ray
# path and the SQL oracle agree byte-for-byte.
DEFAULT_SCRUB = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "[EMAIL]"),
    ("entity", r"\b(customer|supplier)\b", "[ENTITY]"),
]


def scrub_text(batch, patterns=None):
    """PII-style pattern scrubbing (the redaction pass every training
    corpus runs before release): sequentially replace each pattern and
    count its hits.  → (doc_id, text_scrubbed, n_<name>..., n_redactions).

    Fully vectorized — two RE2 kernel calls per pattern on the Arrow
    string column, no Python per-row loop — and a pure per-row map, so
    it streams at any scale with zero shuffle.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    pats = DEFAULT_SCRUB if patterns is None else patterns
    cur = pc.fill_null(batch["text"], "")
    cols: dict[str, object] = {"doc_id": batch["doc_id"]}
    total = None
    for name, pat, repl in pats:
        n = pc.cast(pc.count_substring_regex(cur, pat), pa.int64())
        cur = pc.replace_substring_regex(cur, pat, repl)
        cols[f"n_{name}"] = n
        total = n if total is None else pc.add(total, n)
    cols["text_scrubbed"] = cur
    cols["n_redactions"] = total
    return pa.table(cols)


def scrub_sql(patterns=None) -> str:
    """DuckDB oracle mirroring ``scrub_text`` (nested regexp_replace =
    the same sequential application)."""
    pats = DEFAULT_SCRUB if patterns is None else patterns
    cur = "COALESCE(text, '')"
    counts = []
    for name, pat, repl in pats:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{p}')) AS BIGINT)"
            f" AS n_{name}")
        cur = f"regexp_replace({cur}, '{p}', '{r}', 'g')"
    total = " + ".join(f"n_{name}" for name, _, _ in pats)
    return f"""
        SELECT doc_id, {', '.join(f'n_{n}' for n, _, _ in pats)},
               text_scrubbed, CAST({total} AS BIGINT) AS n_redactions
        FROM (SELECT doc_id, {', '.join(counts)},
                     {cur} AS text_scrubbed
              FROM documents)"""


# --------------------------------------------- context-window chunking

def chunk_documents(batch: pd.DataFrame, chunk: int = 64,
                    overlap: int = 8) -> pd.DataFrame:
    """Fixed-size token-window chunking with overlap (the
    context-window prep step of every LM training pipeline): each doc's
    token stream splits into windows of ``chunk`` tokens starting every
    ``chunk - overlap`` tokens.

    → (doc_id, chunk_idx, n_tokens, text_chunk).  A start is emitted
    while ``start < max(n - overlap, 1)`` so the tail window always
    carries at least one new token (no window fully contained in its
    predecessor); empty docs emit no rows.

    A pure flat map — each input row expands independently, so it
    streams at any scale with zero shuffle; row fan-out is ~n/stride
    per doc, which is why the chunker belongs INSIDE map_batches and
    not in a driver loop.
    """
    if overlap >= chunk:
        raise ValueError(f"overlap ({overlap}) must be < chunk ({chunk})")
    stride = chunk - overlap
    dids, idxs, ns, texts = [], [], [], []
    for d, t in zip(batch["doc_id"], batch["text"]):
        toks = _tokens(t)
        n = len(toks)
        for start in range(0, max(n - overlap, 1) if n else 0, stride):
            w = toks[start:start + chunk]
            dids.append(d)
            idxs.append(start // stride)
            ns.append(len(w))
            texts.append(" ".join(w))
    return pd.DataFrame({
        "doc_id": pd.Series(dids, dtype=batch["doc_id"].dtype),
        "chunk_idx": np.array(idxs, dtype=np.int64),
        "n_tokens": np.array(ns, dtype=np.int64),
        "text_chunk": texts,
    })


def chunk_sql(chunk: int = 64, overlap: int = 8) -> str:
    """DuckDB oracle mirroring ``chunk_documents`` (1-based inclusive
    list slice = the python window)."""
    stride = chunk - overlap
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        s AS (
          SELECT doc_id, t, len(t) AS n,
                 unnest(range(0, greatest(len(t) - {overlap}, 1),
                              {stride})) AS start
          FROM toks WHERE len(t) > 0)
        SELECT doc_id,
               CAST(start // {stride} AS BIGINT) AS chunk_idx,
               CAST(least(n, start + {chunk}) - start AS BIGINT) AS n_tokens,
               array_to_string(t[start + 1 : start + {chunk}], ' ')
                 AS text_chunk
        FROM s"""


# --------------------------------------------- sequence packing

def pack_sequences(docs, budget: int = 256, chunk: int = 64,
                   overlap: int = 8, num_shards: int = 32,
                   num_buckets: int | None = None):
    """Pack chunked documents into fixed-token-budget training
    sequences (the step after ``chunk_documents`` in an LM data
    pipeline): within each shard, chunks ordered by (doc_id, chunk_idx)
    fill sequences greedily — a chunk whose start offset falls in bin
    ``k*budget..(k+1)*budget`` joins sequence ``k``, so a sequence can
    overflow by at most chunk-1 tokens (the standard pack-then-truncate
    semantics).

    → (doc_id, chunk_idx, n_tokens, text_chunk, shard, seq_in_shard).

    Scale shape: sequences NEVER cross shards (``doc_id % num_shards``),
    the standard distributed-packing trade-off — which makes the prefix
    sum shard-local: chunks ride one bounded-bucket shuffle on the
    shard key and each shard's cumsum+bin runs complete inside its
    bucket.  No global sort, no driver-side cumsum; ``num_shards`` is
    the per-task memory dial (shard ≈ data/num_shards) and must grow
    with the input.  Integer doc ids only — the modulo shard rule is
    what the SQL oracle mirrors bit-for-bit.
    """
    from .shuffle import bucketed_groupby

    def to_chunks(batch: pd.DataFrame) -> pd.DataFrame:
        out = chunk_documents(batch, chunk=chunk, overlap=overlap)
        out["shard"] = (out["doc_id"].to_numpy() % num_shards).astype("int64")
        return out

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, g in pdf.groupby("shard", sort=False):
            g = g.sort_values(["doc_id", "chunk_idx"])
            n = g["n_tokens"].to_numpy(np.int64)
            start = np.cumsum(n) - n
            parts.append(g.assign(seq_in_shard=start // budget))
        if not parts:
            return pdf.assign(seq_in_shard=np.array([], dtype=np.int64))
        return pd.concat(parts, ignore_index=True)

    return bucketed_groupby(
        docs.map_batches(to_chunks, batch_format="pandas"),
        "shard", pack, num_buckets)


def pack_sql(budget: int = 256, chunk: int = 64, overlap: int = 8,
             num_shards: int = 32) -> str:
    """DuckDB oracle mirroring ``pack_sequences`` (window cumsum per
    shard = the in-bucket prefix sum)."""
    return f"""
        WITH chunks AS ({chunk_sql(chunk=chunk, overlap=overlap)}),
        sh AS (SELECT *, doc_id % {num_shards} AS shard FROM chunks),
        c AS (SELECT *,
                SUM(n_tokens) OVER (
                  PARTITION BY shard ORDER BY doc_id, chunk_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM sh)
        SELECT doc_id, chunk_idx, n_tokens, text_chunk,
               CAST(shard AS BIGINT) AS shard,
               CAST((cum - n_tokens) // {budget} AS BIGINT) AS seq_in_shard
        FROM c"""


# --------------------------------------- compression-ratio signal

def compression_metrics(batch: pd.DataFrame,
                        level: int = 6) -> pd.DataFrame:
    """Per-doc zlib compressibility — the low-entropy spam signal
    (boilerplate, keyword stuffing, repeated blocks compress far
    below prose; prose sits around ratio 2.5-4×): → (doc_id, n_bytes,
    z_bytes, ratio_micro) with ratio = n_bytes / z_bytes in int64
    micro-units (0 for empty text).  Pure streaming ``map_batches``
    stage; compression is per-row by nature but zlib's C loop
    dominates, not the Python iteration.  SQL has no zlib →
    rows-only oracle, pinned against direct zlib in tests.
    """
    import zlib

    n_bytes, z_bytes = [], []
    for t in batch["text"]:
        raw = (t or "").encode("utf-8")
        n_bytes.append(len(raw))
        z_bytes.append(len(zlib.compress(raw, level)) if raw else 0)
    nb = np.asarray(n_bytes, dtype=np.int64)
    zb = np.asarray(z_bytes, dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(zb > 0, nb / np.maximum(zb, 1), 0.0)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(),
        "n_bytes": nb,
        "z_bytes": zb,
        "ratio_micro": np.floor(ratio * 1_000_000.0 + 0.5)
        .astype(np.int64)})


# --------------------------------------------- repetition metrics

def repetition_metrics(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition rules (Rae et al. 2021 §A1.1,
    integerized): in-document repetition is the other half of quality
    filtering next to ``quality_filter``'s length/stopword rules.

      n_lines                  text.split("\\n") count (empties kept)
      dup_line_frac_x1000      1000*(n_lines - distinct) // n_lines
      top_2gram_frac_x1000     1000*max 2-gram count // n_2grams
      keep                     NOT (dup_line_frac > 300
                                    OR (n_2grams >= 20
                                        AND top_2gram_frac > 200))

    The 2-gram rule only fires with >= 20 bigrams — on shorter texts
    the fraction is quantized too coarsely to mean repetition (three
    distinct bigrams already read 333).  All-integer arithmetic,
    mirrored verbatim by the SQL oracle.  A pure per-row map —
    trivially streaming at any scale.
    """
    from collections import Counter
    n_lines, dupf, topf, n2s = [], [], [], []
    for t in batch["text"]:
        lines = (t or "").split("\n")
        nl = len(lines)
        n_lines.append(nl)
        dupf.append(1000 * (nl - len(set(lines))) // nl)
        toks = _tokens(t)
        n2 = len(toks) - 1
        n2s.append(n2)
        if n2 <= 0:
            topf.append(0)
        else:
            c = Counter(zip(toks, toks[1:]))
            topf.append(1000 * max(c.values()) // n2)
    dupf = np.array(dupf, dtype=np.int64)
    topf = np.array(topf, dtype=np.int64)
    n2s = np.array(n2s, dtype=np.int64)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_lines": np.array(n_lines, dtype=np.int64),
        "dup_line_frac_x1000": dupf,
        "top_2gram_frac_x1000": topf,
        "keep": ~((dupf > 300) | ((n2s >= 20) & (topf > 200))),
    })


REPETITION_SQL = r"""
    WITH base AS (
      SELECT doc_id, string_split(text, chr(10)) AS lines,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents),
    l AS (
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             (1000 * (len(lines) - len(list_distinct(lines))))
               // len(lines) AS dup_line_frac_x1000,
             len(t) - 1 AS n2
      FROM base),
    grams AS (
      SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
      FROM (SELECT doc_id, t, unnest(range(1, len(t)))::INT AS i
            FROM base WHERE len(t) >= 2)),
    mx AS (
      SELECT doc_id, MAX(c) AS mc
      FROM (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2)
      GROUP BY doc_id)
    SELECT l.doc_id, l.n_lines,
           CAST(l.dup_line_frac_x1000 AS BIGINT) AS dup_line_frac_x1000,
           CAST(CASE WHEN l.n2 <= 0 THEN 0
                     ELSE (1000 * COALESCE(mx.mc, 0)) // l.n2
                END AS BIGINT) AS top_2gram_frac_x1000,
           NOT (l.dup_line_frac_x1000 > 300
                OR (l.n2 >= 20
                    AND (CASE WHEN l.n2 <= 0 THEN 0
                              ELSE (1000 * COALESCE(mx.mc, 0)) // l.n2
                         END) > 200))
             AS keep
    FROM l LEFT JOIN mx USING (doc_id)"""


# ------------------------------------- corpus-wide line dedup

_SCRUB_SALTS = 4


def scrub_dup_lines(docs, min_docs: int = 2, min_chars: int = 1,
                    num_buckets: int | None = None,
                    delimiter: str = "\n"):
    """Corpus-wide duplicate-LINE removal (the CCNet / RefinedWeb
    boilerplate scrub): any exact line that appears in >= ``min_docs``
    DISTINCT documents is deleted from every document; lines shorter
    than ``min_chars`` raw characters are never counted (and so never
    removed).  → (doc_id, text) with surviving lines re-joined by
    ``delimiter``, one row per input document (a document whose every
    line was boilerplate comes back as ``""``).  ``delimiter="\\n\\n"``
    gives PARAGRAPH-granularity dedup (the RefinedWeb variant).

    Scale shape: bounded shuffles, nothing driver-side, and SKEW-PROOF
    on the hot keys this op exists for (a boilerplate line appears in
    a data-scaling fraction of documents) — (1) per-line distinct-doc
    counts via the two-level ``grouped_distinct_count`` (pairs bucket
    on (line, doc) so a hot line spreads over every bucket; the final
    count folds per-block partials), (2) a SALTED anti join deletes
    flagged lines from the exploded stream: doc-line rows bucket on
    (line-hash, doc-salt) and each removal row replicates to all
    ``_SCRUB_SALTS`` shards (the skew dial — see salted_lookup_join),
    so a line present in half the corpus splits across salts instead
    of landing in one task (the removal
    set stays a Dataset, never a broadcast), and (3) a doc-bucketed
    re-stitch joins survivors in line order, with a zero-row stub
    unioned per document so fully-scrubbed docs survive as empty rows
    (the ``decontaminate`` zero-row-union pattern).
    """
    from .analytics import grouped_distinct_count
    from .dedup import _doc_key_dtype
    from .shuffle import bucketed_groupby, salted_lookup_join

    dt = _doc_key_dtype(docs)

    # a line's identity in the count/removal exchanges is its 128-bit
    # hash (two int64 columns, the _doc_gram_hashes128 convention) —
    # the distinct-count and anti-join keys stay fixed-width numeric;
    # the line TEXT itself only travels where the re-stitch needs it
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["doc_id"]].copy()
        out["line"] = b["text"].fillna("").str.split(delimiter, regex=False)
        out = out.explode("line", ignore_index=True)
        out["line"] = out["line"].astype(object)
        out["i"] = (out.groupby("doc_id", sort=False).cumcount() + 1
                    ).astype("int64")
        arr = out["line"].to_numpy()
        out["g1"] = _splitmix64(pd.util.hash_array(arr)).view(np.int64)
        out["g2"] = _splitmix64(
            pd.util.hash_array(arr, hash_key=_GRAM_KEY2)).view(np.int64)
        return out[["doc_id", "i", "line", "g1", "g2"]]

    lines = docs.map_batches(explode, batch_format="pandas")

    def countable(b: pd.DataFrame) -> pd.DataFrame:
        m = b["line"].str.len() >= min_chars
        return b.loc[m, ["g1", "g2", "doc_id"]]

    counts = grouped_distinct_count(
        lines.map_batches(countable, batch_format="pandas"),
        ["g1", "g2"], "doc_id", out_col="nd", num_buckets=num_buckets)
    removal = counts.map_batches(
        lambda d: d.loc[d["nd"] >= min_docs, ["g1", "g2"]],
        batch_format="pandas")

    kept = salted_lookup_join(
        lines, removal, on=["g1", "g2"], salt_col="doc_id",
        left_schema={"doc_id": dt, "i": "int64", "line": "object",
                     "g1": "int64", "g2": "int64"},
        right_schema={"g1": "int64", "g2": "int64"},
        num_buckets=num_buckets, salts=_SCRUB_SALTS, how="anti",
        post=lambda d: d[["doc_id", "i", "line"]])

    def stub(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "i": np.zeros(len(b), dtype="int64"),
            "line": [""] * len(b)})

    allrows = kept.union(docs.map_batches(stub, batch_format="pandas"))

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, texts = [], []
        for d, g in pdf.groupby("doc_id", sort=False):
            g = g[g["i"] > 0].sort_values("i")
            ids.append(d)
            texts.append(delimiter.join(g["line"]))
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype=pdf["doc_id"].dtype),
                             "text": pd.Series(texts, dtype=object)})

    return bucketed_groupby(allrows, "doc_id", stitch, num_buckets)


def scrub_dup_lines_sql(min_docs: int = 2, min_chars: int = 1,
                        delimiter: str = "\n") -> str:
    """DuckDB oracle mirroring ``scrub_dup_lines`` byte-for-byte."""
    delim_sql = " || ".join(f"chr({ord(c)})" for c in delimiter)
    return f"""
    WITH l AS (
      SELECT doc_id, string_split(COALESCE(text, ''), {delim_sql}) AS ls
      FROM documents),
    lines AS (
      SELECT doc_id, unnest(ls) AS line,
             unnest(range(1, len(ls) + 1)) AS i
      FROM l),
    counts AS (
      SELECT line, COUNT(DISTINCT doc_id) AS nd
      FROM lines WHERE len(line) >= {min_chars}
      GROUP BY line),
    kept AS (
      SELECT doc_id, i, line FROM lines
      WHERE line NOT IN (SELECT line FROM counts WHERE nd >= {min_docs})),
    agg AS (
      SELECT doc_id, string_agg(line, {delim_sql} ORDER BY i) AS text
      FROM kept GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(a.text, '') AS text
    FROM documents d LEFT JOIN agg a USING (doc_id)"""


def collapse_repeated_lines(docs, delimiter: str = "\n"):
    """Collapse RUNS of consecutive identical lines within each
    document to one occurrence (nav menus / pagination footers a bad
    extractor pasted back-to-back — the IN-document complement of the
    cross-corpus ``scrub_dup_lines``; RefinedWeb applies exactly this
    before its repetition filters).

    → (doc_id, text, n_dropped), one row per input document, lines
    re-joined by ``delimiter``.  Pure per-row streaming map — no
    shuffle: each batch flattens its line lists once, the keep mask is
    ONE vectorized adjacent-inequality pass over the flat array (doc
    starts forced kept), and per-doc slices re-join.
    """

    def collapse(batch: pd.DataFrame) -> pd.DataFrame:
        split = [(t or "").split(delimiter) for t in batch["text"]]
        lens = np.fromiter((len(s) for s in split), np.int64, len(split))
        total = int(lens.sum())
        flat = np.array([ln for ls in split for ln in ls], dtype=object)
        starts = np.zeros(len(split) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        keep = np.ones(total, dtype=bool)
        if total > 1:
            keep[1:] = flat[1:] != flat[:-1]
            keep[starts[:-1]] = True      # first line of each doc
        out_t = []
        dropped = np.zeros(len(split), np.int64)
        for i, (s, e) in enumerate(zip(starts[:-1], starts[1:])):
            km = keep[s:e]
            out_t.append(delimiter.join(flat[s:e][km]))
            dropped[i] = int(e - s) - int(km.sum())
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "text": pd.Series(out_t, dtype=object),
                             "n_dropped": dropped})

    return docs.map_batches(collapse, batch_format="pandas")


def collapse_repeated_lines_sql(delimiter: str = "\n") -> str:
    """DuckDB oracle mirroring ``collapse_repeated_lines``
    byte-for-byte (lag-window adjacent-inequality)."""
    delim_sql = " || ".join(f"chr({ord(c)})" for c in delimiter)
    return f"""
    WITH l AS (
      SELECT doc_id, string_split(COALESCE(text, ''), {delim_sql}) AS ls
      FROM documents),
    lines AS (
      SELECT doc_id, unnest(ls) AS line,
             unnest(range(1, len(ls) + 1)) AS i, len(ls) AS n_lines
      FROM l),
    flagged AS (
      SELECT doc_id, i, line, n_lines,
             lag(line) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM lines),
    kept AS (
      SELECT doc_id, i, line, n_lines FROM flagged
      WHERE prev IS NULL OR line <> prev)
    SELECT doc_id, string_agg(line, {delim_sql} ORDER BY i) AS text,
           CAST(ANY_VALUE(n_lines) - COUNT(*) AS BIGINT) AS n_dropped
    FROM kept GROUP BY doc_id"""


# ------------------------------------- corpus-wide window scrub

def _window_hash_rows(texts, k: int):
    """Every k-token rolling window of every text with its START
    position, as 128-bit hashes — the positional sibling of
    ``_doc_gram_hashes128`` (same two-lane siphash + positional
    polynomial + splitmix scheme, NO per-doc dedup: the scrubber needs
    every occurrence with its offset).

    → (doc_idx int64, ws int64, g1 int64, g2 int64); windows spanning
    a document boundary are masked out, docs shorter than ``k`` tokens
    contribute nothing."""
    toks = [_tokens(t) for t in texts]
    lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
    flat = [w for ts in toks for w in ts]
    total = int(lens.sum())
    if total < k:
        return (_EMPTY_I64, _EMPTY_I64, _EMPTY_I64, _EMPTY_I64)
    arr = np.asarray(flat, dtype=object)
    h1 = pd.util.hash_array(arr)
    h2 = pd.util.hash_array(arr, hash_key=_GRAM_KEY2)
    di = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    m = total - k + 1
    g1 = np.zeros(m, dtype=np.uint64)
    g2 = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        g1 = g1 * _GRAM_P + h1[j:j + m]
        g2 = g2 * _GRAM_Q + h2[j:j + m]
    g1, g2 = _splitmix64(g1), _splitmix64(g2)
    valid = di[:m] == di[k - 1:]          # window lies inside one doc
    starts = np.zeros(len(toks) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    ws = np.arange(m, dtype=np.int64) - starts[di[:m]]
    return (di[:m][valid], ws[valid],
            g1[valid].view(np.int64).copy(),
            g2[valid].view(np.int64).copy())


def scrub_dup_windows(docs, k: int = 8, min_docs: int = 2,
                      num_buckets: int | None = None):
    """Corpus-wide duplicated-WINDOW scrub — the token-level ExactSubstr
    dedup of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better"): every token covered by ANY k-token
    window whose exact token sequence occurs in >= ``min_docs``
    DISTINCT documents is deleted from every document, wherever in the
    document it sits (line/paragraph alignment not required — the gap
    ``scrub_dup_lines`` cannot close).  Unlike the suffix-array
    original, duplication is detected at fixed window size k: any
    shared substring of >= k tokens is the union of its k-windows, so
    coverage of shared spans >= k tokens is identical; shorter shared
    runs are deliberately kept.

    → (doc_id, text, n_tokens, n_removed), one row per input document.
    The output text is TOKEN-CANONICAL (lowercased ``[a-z0-9]+``
    tokens re-joined by single spaces — the ``_tokens`` convention),
    for every document, scrubbed or not.

    Scale shape (the ``scrub_dup_lines`` skeleton at window
    granularity): (1) window occurrences leave each batch as fixed-
    width (doc_id, ws, g1, g2) rows — the 128-bit hash identifies the
    window to ~2^-128, the oracle-exactness class; (2) per-window
    distinct-doc counts via the two-level ``grouped_distinct_count``
    (hot boilerplate windows spread over every bucket); (3) a SALTED
    semi join flags occurrences of corpus-duplicated windows (the
    removal set stays a Dataset, never a broadcast; hot windows split
    across ``_SCRUB_SALTS`` doc-salt shards); (4) one doc-bucketed
    re-stitch unions the flagged offsets with the doc text and rebuilds
    survivors under a vectorized difference-array coverage mask.
    """
    from .analytics import grouped_distinct_count
    from .dedup import _doc_key_dtype
    from .shuffle import bucketed_groupby, salted_lookup_join

    dt = _doc_key_dtype(docs)

    def window_rows(b: pd.DataFrame) -> pd.DataFrame:
        dv, ws, g1, g2 = _window_hash_rows(b["text"].tolist(), k)
        return pd.DataFrame({
            "doc_id": pd.Series(b["doc_id"].to_numpy()[dv], dtype=dt),
            "ws": ws, "g1": g1, "g2": g2})

    windows = docs.map_batches(window_rows, batch_format="pandas")

    counts = grouped_distinct_count(
        windows.map_batches(lambda b: b[["g1", "g2", "doc_id"]],
                            batch_format="pandas"),
        ["g1", "g2"], "doc_id", out_col="nd", num_buckets=num_buckets)
    removal = counts.map_batches(
        lambda d: d.loc[d["nd"] >= min_docs, ["g1", "g2"]],
        batch_format="pandas")

    flagged = salted_lookup_join(
        windows, removal, on=["g1", "g2"], salt_col="doc_id",
        left_schema={"doc_id": dt, "ws": "int64", "g1": "int64",
                     "g2": "int64"},
        right_schema={"g1": "int64", "g2": "int64"},
        num_buckets=num_buckets, salts=_SCRUB_SALTS, how="semi",
        post=lambda d: d[["doc_id", "ws"]])

    # one union carries both streams into the doc-bucketed stitch:
    # flagged offsets as ws >= 0, the doc text payload as a ws = -1 row
    # (every document gets exactly one, so unscrubbed docs still emit)
    def doc_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "ws": np.full(len(b), -1, dtype=np.int64),
            "text": b["text"].fillna("").astype(object)})

    def flag_rows(d: pd.DataFrame) -> pd.DataFrame:
        out = d[["doc_id", "ws"]].copy()
        out["text"] = pd.Series([""] * len(d), dtype=object)
        return out

    allrows = (flagged.map_batches(flag_rows, batch_format="pandas")
               .union(docs.map_batches(doc_rows, batch_format="pandas")))

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, texts, n_tok, n_rm = [], [], [], []
        for d, g in pdf.groupby("doc_id", sort=False):
            payload = g.loc[g["ws"] < 0, "text"]
            toks = np.asarray(
                _tokens(payload.iloc[0] if len(payload) else ""),
                dtype=object)
            n = len(toks)
            ws = g.loc[g["ws"] >= 0, "ws"].to_numpy(np.int64)
            if n and len(ws):
                cov = np.zeros(n + 1, dtype=np.int64)
                np.add.at(cov, ws, 1)
                np.add.at(cov, np.minimum(ws + k, n), -1)
                mask = np.cumsum(cov[:n]) > 0
            else:
                mask = np.zeros(n, dtype=bool)
            ids.append(d)
            texts.append(" ".join(toks[~mask]))
            n_tok.append(n)
            n_rm.append(int(mask.sum()))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype=pdf["doc_id"].dtype),
            "text": pd.Series(texts, dtype=object),
            "n_tokens": np.asarray(n_tok, dtype=np.int64),
            "n_removed": np.asarray(n_rm, dtype=np.int64)})

    return bucketed_groupby(allrows, "doc_id", stitch, num_buckets)


def scrub_dup_windows_sql(k: int = 8, min_docs: int = 2) -> str:
    """DuckDB oracle mirroring ``scrub_dup_windows`` byte-for-byte
    (windows as literal space-joined token strings where the pipeline
    exchanges 128-bit hashes)."""
    tok = "regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+')"
    return f"""
    WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
    w AS (
      SELECT doc_id,
             unnest(range(0, greatest(len(toks) - {k} + 1, 0))) AS ws,
             toks
      FROM t),
    wg AS (
      SELECT doc_id, ws,
             array_to_string(toks[ws + 1 : ws + {k}], ' ') AS gram
      FROM w),
    dup AS (
      SELECT gram FROM wg GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) >= {min_docs}),
    cov AS (
      SELECT DISTINCT f.doc_id, f.ws + u.ti AS i
      FROM (SELECT doc_id, ws FROM wg
            WHERE gram IN (SELECT gram FROM dup)) f
      CROSS JOIN (SELECT unnest(range(0, {k})) AS ti) u),
    tokpos AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(0, len(toks))) AS i
      FROM t),
    kept AS (
      SELECT tp.doc_id, tp.tok, tp.i
      FROM tokpos tp LEFT JOIN cov c
        ON tp.doc_id = c.doc_id AND tp.i = c.i
      WHERE c.doc_id IS NULL),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, len(toks) AS n_tokens FROM t)
    SELECT d.doc_id, COALESCE(a.text, '') AS text,
           CAST(tot.n_tokens AS BIGINT) AS n_tokens,
           CAST(tot.n_tokens - COALESCE(a.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM documents d
    JOIN tot USING (doc_id)
    LEFT JOIN agg a USING (doc_id)"""


# ------------------------------------- per-doc duplication fraction

def dup_gram_fraction(docs, n: int = 8, num_buckets: int | None = None):
    """Per-document duplication fraction (the RefinedWeb/Gopher-class
    novelty signal a curation pipeline thresholds on): the share of a
    document's DISTINCT word n-grams that also appear in at least one
    OTHER document.

    → (doc_id, n_grams, n_dup_grams, dup_frac_x1000) — one row per
    input document (gramless docs report zeros); frac integerized by
    floor division so the SQL oracle matches bit-for-bit.

    Scale shape (all hot-gram-safe, reusing the decontaminate
    machinery): per-batch (gram → distinct-doc-count) partials sum
    exactly because a document's grams never straddle batches; grams
    with a corpus count >= 2 form the shared set (one row per distinct
    gram); membership is the SALTED semi join (doc-gram rows shard by
    doc-salt, shared grams replicate per shard); per-doc hit counts
    and the per-doc gram totals fold through one doc_id-bucketed
    aggregate with a zero stub per document.
    """
    from .dedup import _doc_key_dtype
    from .shuffle import bucketed_agg, bucketed_groupby, salted_lookup_join

    dt = _doc_key_dtype(docs)

    # grams cross every exchange as 128-bit hashes (two int64 columns,
    # _doc_gram_hashes128); a doc's per-doc gram total falls out of the
    # same vectorized pass as its gram rows
    def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        dv, g1, g2 = _doc_gram_hashes128(batch["text"].tolist(), n)
        return pd.DataFrame({
            "g1": g1, "g2": g2,
            "doc_id": pd.Series(batch["doc_id"].to_numpy()[dv], dtype=dt)})

    grams = docs.map_batches(gram_rows, batch_format="pandas")

    nd_partial = grams.map_batches(
        lambda b: b.groupby(["g1", "g2"], sort=False).size()
                   .rename("nd").reset_index(),
        batch_format="pandas")
    nd = bucketed_agg(nd_partial, ["g1", "g2"], {"nd": ("nd", "sum")},
                      num_buckets)
    shared = nd.map_batches(lambda d: d.loc[d["nd"] >= 2, ["g1", "g2"]],
                            batch_format="pandas")

    hits = salted_lookup_join(
        grams, shared, on=["g1", "g2"], salt_col="doc_id",
        left_schema={"g1": "int64", "g2": "int64", "doc_id": dt},
        right_schema={"g1": "int64", "g2": "int64"},
        num_buckets=num_buckets, how="semi")

    def hit_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("doc_id", sort=False).size().rename("n_dup_grams")
        out = g.reset_index()
        out["n_grams"] = np.zeros(len(out), dtype=np.int64)
        return out[["doc_id", "n_grams", "n_dup_grams"]]

    def totals(batch: pd.DataFrame) -> pd.DataFrame:
        dv, _, _ = _doc_gram_hashes128(batch["text"].tolist(), n)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_grams": np.bincount(dv, minlength=len(batch)
                                   ).astype(np.int64),
            "n_dup_grams": np.zeros(len(batch), dtype=np.int64)})

    merged = (hits.map_batches(hit_partial, batch_format="pandas")
              .union(docs.map_batches(totals, batch_format="pandas")))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("doc_id")[["n_grams", "n_dup_grams"]].sum()
        ng = g["n_grams"].to_numpy(np.int64)
        nh = g["n_dup_grams"].to_numpy(np.int64)
        frac = np.where(ng > 0, (1000 * nh) // np.maximum(ng, 1), 0)
        return pd.DataFrame({"doc_id": g.index, "n_grams": ng,
                             "n_dup_grams": nh,
                             "dup_frac_x1000": frac.astype(np.int64)})

    return bucketed_groupby(merged, "doc_id", fold, num_buckets)
