"""Distributed analytics primitives a training-data pipeline leans on
beyond plain grouped aggregates: exact distinct counting, exact
discrete quantiles, deterministic corpus splitting, exact heavy
hitters, sketch-based approximate distinct, k-means clustering, and
an interval (range) join.

Scale design mirrors ops/relational.py and ops/shuffle.py:

- every many-key exchange rides the bounded-bucket shuffle
  (``ops.shuffle``), never Ray's per-group aggregate;
- per-batch combiners shrink rows BEFORE any shuffle (local distinct,
  local counts, local top-k candidates);
- only fixed-size state (k centroids, 4096 HLL registers, nb*k top-k
  candidates) ever reaches the driver — never data-proportional rows.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd

from .shuffle import bucketed_agg, bucketed_distinct, bucketed_groupby, bucketed_join

TOKEN_RE = re.compile(r"[a-z0-9]+")


# ----------------------------------------------------- distinct count

def grouped_distinct_count(ds, key: str | list[str], val: str,
                           out_col: str = "n_distinct",
                           num_buckets: int | None = None):
    """Exact COUNT(DISTINCT val) GROUP BY key → (key..., out_col).
    ``key`` may be a list (composite keys, e.g. a 128-bit hash split
    over two int64 columns).

    Skew-safe end to end: per-batch local distinct shrinks the stream,
    the global DISTINCT buckets on (key, val) — a hot key's values
    spread over every bucket instead of landing in one task — and the
    final count folds per-BLOCK partial counts (each distinct-output
    block contributes at most one row per key), so even a key with
    millions of distinct values never re-concentrates its pair rows
    into one task.
    """
    keys = [key] if isinstance(key, str) else list(key)
    pairs = ds.map_batches(
        lambda b: b[keys + [val]].drop_duplicates(), batch_format="pandas")
    distinct = bucketed_distinct(pairs, keys + [val], num_buckets)
    partial = distinct.map_batches(
        lambda b: b.groupby(keys, sort=False).size()
                   .rename("__n").reset_index(),
        batch_format="pandas")
    return bucketed_agg(partial, keys, {out_col: ("__n", "sum")},
                        num_buckets)


# ----------------------------------------------------- exact histogram

def value_histogram(ds, col: str, lo: float, hi: float, n_bins: int = 20):
    """Exact fixed-bin histogram of ``col`` over [lo, hi) → pandas
    (bin, lo_edge, hi_edge, n), exactly ``n_bins`` rows (empty bins
    included), out-of-range values clamped into the edge bins — the
    LEAST/GREATEST semantics of the SQL oracle, bit-exact because both
    sides run the same IEEE double ops (w = (hi-lo)/n_bins, then
    floor((v-lo)/w)).

    The canonical map-side-combine aggregate: every block collapses to
    at most ``n_bins`` (bin, n) partial rows inside ``map_batches``
    (one C ``np.bincount`` per batch), and the driver folds the
    ≤ #blocks × n_bins bounded partial stream — no shuffle at any
    corpus size, and the only driver-side state is one int64[n_bins]
    array.  ``col`` must be non-null (the synthetic tables are; a NULL
    would raise rather than silently land in a bin).
    """
    lo = float(lo)
    hi = float(hi)
    w = (hi - lo) / n_bins

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[col].to_numpy(dtype=np.float64)
        b = np.clip(np.floor((v - lo) / w), 0, n_bins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"bin": nz.astype("int64"),
                             "n": counts[nz].astype("int64")})

    total = np.zeros(n_bins, dtype=np.int64)
    for part_df in (ds.map_batches(part, batch_format="pandas")
                    .iter_batches(batch_format="pandas")):
        np.add.at(total, part_df["bin"].to_numpy(), part_df["n"].to_numpy())
    bins = np.arange(n_bins, dtype=np.int64)
    return pd.DataFrame({"bin": bins,
                         "lo_edge": lo + bins * w,
                         "hi_edge": lo + (bins + 1) * w,
                         "n": total})


def value_histogram_sql(table: str, col: str, lo: float, hi: float,
                        n_bins: int = 20) -> str:
    """DuckDB oracle for ``value_histogram`` — same double constants
    (repr-embedded, shortest-roundtrip), same floor/clamp, empty bins
    materialized via generate_series."""
    lo_r, w_r = repr(float(lo)), repr((float(hi) - float(lo)) / n_bins)
    return f"""
        WITH h AS (
          SELECT LEAST(GREATEST(CAST(FLOOR(({col} - {lo_r}) / {w_r})
                                     AS BIGINT), 0), {n_bins - 1}) AS bin,
                 COUNT(*) AS n
          FROM {table} GROUP BY 1)
        SELECT b.bin,
               {lo_r} + CAST(b.bin AS DOUBLE) * {w_r} AS lo_edge,
               {lo_r} + CAST(b.bin + 1 AS DOUBLE) * {w_r} AS hi_edge,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n
        FROM (SELECT CAST(x AS BIGINT) AS bin
              FROM generate_series(0, {n_bins - 1}) t(x)) b
        LEFT JOIN h USING (bin)
        ORDER BY b.bin"""


# -------------------------------------------------- discrete quantiles

def grouped_quantiles(ds, key: str, col: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                      num_buckets: int | None = None):
    """Exact discrete quantiles per group → (key, q, q_value).

    ``q_value`` is the element at 1-indexed rank ``ceil(q * n)`` of the
    group's sorted values — an EXISTING value, bit-identical to the SQL
    window-function oracle (no interpolation, no float synthesis).

    Distributed shape: raw rows collapse to (key, value, count)
    histograms through one bucketed aggregate keyed on BOTH columns
    (skew-safe), then one bucketed group-by on the key folds each
    group's histogram — per-task memory is distinct-values-per-key,
    not rows-per-key.
    """
    hist = bucketed_agg(
        ds.map_batches(lambda b: b[[key, col]], batch_format="pandas"),
        [key, col], {"n": (col, "size")}, num_buckets)

    qarr = np.asarray(qs, dtype=np.float64)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        keys_out, q_out, v_out = [], [], []
        for kv, g in pdf.groupby(key, sort=False):
            g = g.sort_values(col)
            counts = g["n"].to_numpy()
            values = g[col].to_numpy()
            cum = np.cumsum(counts)
            n = cum[-1]
            # same double math as the SQL oracle's CEIL(q * n)
            ranks = np.array([math.ceil(q * n) for q in qarr], dtype=np.int64)
            idx = np.searchsorted(cum, ranks, side="left")
            keys_out.extend([kv] * len(qarr))
            q_out.extend(qarr)
            v_out.extend(values[idx])
        return pd.DataFrame({key: keys_out,
                             "q": np.array(q_out, dtype=np.float64),
                             "q_value": np.array(v_out)})

    return bucketed_groupby(hist, key, fold, num_buckets)


# -------------------------------------------- quantile-range filter

def quantile_clip(ds, key: str, col: str, lo: float = 0.05,
                  hi: float = 0.95, num_buckets: int | None = None):
    """Per-group quantile-range filter (the outlier-trim every curation
    pipeline runs on doc lengths): rows keep=1 iff ``col`` lies within
    the group's exact [lo, hi] discrete quantiles.

    → input columns + ``keep`` (int 0/1), one row per input row.

    The aggregate → broadcast → filter shape: thresholds come from
    ``grouped_quantiles`` (exact, distributed), the resulting
    (key, lo_v, hi_v) table is tiny — rows = #groups, the caller's
    contract for a grouped filter — so collecting and shipping it in
    the filter closure is the broadcast-small-side pattern, not a
    driver materialization of data; the filter pass itself streams.
    """
    th = grouped_quantiles(ds, key, col, qs=(lo, hi),
                           num_buckets=num_buckets).take_all()
    lo_map = {r[key]: r["q_value"] for r in th if r["q"] == lo}
    hi_map = {r[key]: r["q_value"] for r in th if r["q"] == hi}

    def flag(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[col].to_numpy()
        lo_v = pdf[key].map(lo_map).to_numpy()
        hi_v = pdf[key].map(hi_map).to_numpy()
        return pdf.assign(keep=((v >= lo_v) & (v <= hi_v)).astype("int64"))

    return ds.map_batches(flag, batch_format="pandas")


# ------------------------------------------------ deterministic split

def _hex_threshold(frac: float) -> str:
    return format(min(int(frac * (1 << 32)), (1 << 32) - 1), "08x")


def hash_split(ds, id_col: str, ratios: tuple[float, ...] = (0.8, 0.1, 0.1),
               names: tuple[str, ...] = ("train", "val", "test")):
    """Deterministic train/val/test assignment → (id_col, split).

    The split key is the first 8 hex chars of ``md5(str(id))`` compared
    against cumulative-ratio thresholds — a pure per-row map (no
    shuffle, no RNG state), reproducible across runs, languages and
    cluster sizes, and expressible verbatim in SQL (lowercase-hex
    string order == numeric order).
    """
    if len(ratios) != len(names):
        raise ValueError("ratios and names must align")
    cum, acc = [], 0.0
    for r in ratios[:-1]:
        acc += r
        cum.append(_hex_threshold(acc))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].tolist()
        splits = []
        for v in ids:
            h8 = hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8]
            s = names[-1]
            for t, nm in zip(cum, names):
                if h8 < t:
                    s = nm
                    break
            splits.append(s)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "split": splits})

    return ds.map_batches(assign, batch_format="pandas")


def hash_split_sql(table: str, id_col: str,
                   ratios: tuple[float, ...] = (0.8, 0.1, 0.1),
                   names: tuple[str, ...] = ("train", "val", "test")) -> str:
    """The DuckDB oracle matching ``hash_split`` bit-for-bit."""
    cum, acc = [], 0.0
    for r in ratios[:-1]:
        acc += r
        cum.append(_hex_threshold(acc))
    case = "CASE"
    for t, nm in zip(cum, names):
        case += f" WHEN h8 < '{t}' THEN '{nm}'"
    case += f" ELSE '{names[-1]}' END"
    return f"""
        SELECT {id_col}, {case} AS split
        FROM (SELECT {id_col},
                     substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) AS h8
              FROM {table})"""


# ------------------------------------------- exact-n uniform sample

def exact_sample(ds, id_col: str, n: int, salt: str = "exact"):
    """EXACTLY-n deterministic uniform sample — the "give me n random
    documents, reproducibly" curation primitive that rate-based
    sampling (``mixture_sample`` etc.) can't provide: the n rows with
    the smallest ``md5("{salt}|{id}")`` digests win.  → the input
    rows, filtered.  Requires unique ids (digest ties are then
    impossible short of md5 collisions).

    Scale shape: a per-block combiner keeps each block's n smallest
    digests; the driver stream-folds those candidates under a 4n cap
    (``iter_batches``, re-sorting when it overflows — O(n) driver
    memory at any block count) down to the global n-th digest; the
    keep test is then a stateless per-row filter against that one
    32-char threshold.  Digest string order is md5-numeric order
    (lowercase hex), so the DuckDB oracle is
    ``ORDER BY md5('{salt}|' || CAST(id AS VARCHAR)) LIMIT n``.
    """

    if n <= 0:
        return ds.map_batches(lambda b: b.iloc[:0], batch_format="pandas")

    def _digest(v) -> str:
        return hashlib.md5(f"{salt}|{v}".encode("utf-8")).hexdigest()

    def cand(b: pd.DataFrame):
        hs = sorted(_digest(v) for v in b[id_col].tolist())[:n]
        if not hs:       # typed empty: 0-row object column trips the
            import pyarrow as pa      # pandas size estimator
            return pa.table({"__h": pa.array([], pa.string())})
        return pd.DataFrame({"__h": pd.Series(hs, dtype="object")})

    # candidate pass sees ONLY the id column — the digest fold would
    # otherwise re-execute the full upstream with every column in flight
    acc: list[str] = []
    for part in (ds.select_columns([id_col])
                 .map_batches(cand, batch_format="pandas")
                 .iter_batches(batch_format="pandas", batch_size=4096)):
        acc.extend(part["__h"].tolist())
        if len(acc) > 4 * n:
            acc = sorted(acc)[:n]
    acc = sorted(acc)[:n]
    thr = acc[-1] if len(acc) == n else None   # None: corpus smaller than n

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        if thr is None:
            return b
        m = np.fromiter((_digest(v) <= thr for v in b[id_col].tolist()),
                        dtype=bool, count=len(b))
        return b[m]

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample_exact(ds, id_col: str, weight_col: str, k: int,
                          salt: str = "wse"):
    """EXACTLY-k weighted sample without replacement — sequential
    Poisson / priority sampling (Ohlsson 1998, the πps method): row i
    gets priority ``u_i / w_i`` where ``u_i`` is a deterministic
    md5-derived uniform in (0,1]; the k SMALLEST priorities win, so
    heavier rows win proportionally more often, reproducibly, with no
    RNG state.  Complements rate-based ``weighted_sample`` (expected
    size) with an exact-size guarantee.  Rows with weight <= 0 never
    qualify.  → the input rows, filtered.

    Determinism contract: u = (60-bit md5 prefix + 1) / 2^60 and the
    priority division are single IEEE-double ops, so the DuckDB oracle
    computes bit-identical keys; ties (impossible short of md5
    collisions) break by id.

    Scale shape: ``exact_sample``'s two-pass plan — a per-block
    k-candidate combiner over ONLY (id, weight), a capped driver
    stream-fold to the global k-th priority, then a stateless keep
    filter.
    """
    if k <= 0:
        return ds.map_batches(lambda b: b.iloc[:0],
                              batch_format="pandas")

    def _prio(b: pd.DataFrame) -> np.ndarray:
        h = np.fromiter(
            (int(hashlib.md5(f"{salt}|{v}".encode()).hexdigest()[:15],
                 16) + 1 for v in b[id_col].tolist()),
            dtype=np.float64, count=len(b))
        u = h / float(1 << 60)
        w = b[weight_col].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = u / w
        p[~(w > 0.0)] = np.inf      # non-positive weight never wins
        return p

    def cand(b: pd.DataFrame) -> pd.DataFrame:
        p = _prio(b)
        order = np.argsort(p, kind="stable")[:k]
        return pd.DataFrame({"__p": p[order]})

    acc: list[float] = []
    for part in (ds.select_columns([id_col, weight_col])
                 .map_batches(cand, batch_format="pandas")
                 .iter_batches(batch_format="pandas",
                               batch_size=4096)):
        acc.extend(part["__p"].tolist())
        if len(acc) > 4 * k:
            acc = sorted(acc)[:k]
    acc = sorted(acc)[:k]
    thr = acc[-1] if len(acc) == k else np.inf
    if not np.isfinite(thr):
        thr = None                   # fewer than k eligible rows

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        p = _prio(b)
        if thr is None:
            return b[np.isfinite(p)]
        return b[p <= thr]

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample_exact_sql(table: str, id_col: str,
                              weight_col: str, k: int,
                              salt: str = "wse") -> str:
    """DuckDB oracle: identical priority doubles, ORDER BY + LIMIT."""
    h = (f"CAST(CAST('0x' || substr(md5('{salt}|' || "
         f"CAST({id_col} AS VARCHAR)), 1, 15) AS BIGINT) + 1 "
         f"AS DOUBLE)")
    return f"""
        SELECT * EXCLUDE (__p) FROM (
          SELECT *, ({h} / 1152921504606846976.0) / {weight_col} AS __p
          FROM {table} WHERE {weight_col} > 0
          ORDER BY __p, {id_col} LIMIT {k})"""


def confusion_matrix(ds, truth_col: str, pred_col: str) -> pd.DataFrame:
    """Classifier evaluation aggregate: → pandas (truth, pred, n),
    one row per observed label pair (the long-format confusion
    matrix feeding accuracy / per-class recall).

    Scale shape: the value_histogram pattern — each batch collapses
    to ≤ |truth classes| × |pred classes| count partials and the
    driver folds that bounded stream; no shuffle at any row count
    (label vocabularies are small by definition — this is an
    EVALUATION aggregate, not a join)."""

    def part(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby([truth_col, pred_col]).size()
             .reset_index(name="n"))
        return g

    acc: dict[tuple, int] = {}
    for p in (ds.map_batches(part, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        for t, pr, n in zip(p[truth_col], p[pred_col], p["n"]):
            acc[(t, pr)] = acc.get((t, pr), 0) + int(n)
    out = pd.DataFrame(
        [(t, pr, n) for (t, pr), n in sorted(acc.items())],
        columns=["truth", "pred", "n"])
    out["n"] = out["n"].astype("int64")
    return out


def stratified_split(ds, strata_col: str, id_col: str,
                     n_val: int, n_test: int, salt: str = "strat",
                     num_buckets: int | None = None):
    """Exact-size stratified train/val/test split: within every
    stratum the ``n_val`` smallest ``md5("{salt}|{id}")`` digests go
    to val, the next ``n_test`` to test, everything else to train —
    the eval-carve-out shape where rate-based ``hash_split`` can't
    guarantee per-stratum eval sizes (a rare language must still get
    its full eval slice).  → input columns + ``split`` ∈
    {train, val, test}; strata smaller than the quotas fill val first.

    Scale shape: a per-batch (n_val+n_test)-candidate cut per stratum
    feeds one bounded-bucket per-stratum rank (≤ strata × quota ×
    blocks candidate rows); the chosen (id → split) assignments —
    ≤ strata × quota rows total, eval slices are small by design —
    broadcast via ``ray.put`` into a stateless verdict map, so the
    full corpus streams through exactly once.
    """
    import ray

    from .shuffle import bucketed_groupby

    quota = n_val + n_test

    def hashed(b: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(f"{salt}|{v}".encode("utf-8")).hexdigest()
             for v in b[id_col]]
        out = pd.DataFrame({strata_col: b[strata_col].to_numpy(),
                            id_col: b[id_col].to_numpy(), "__h": h})
        out = out.sort_values(["__h", id_col], kind="mergesort")
        return out.groupby(strata_col, sort=False).head(quota)

    def cut(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(["__h", id_col], kind="mergesort")
        g = g.groupby(strata_col, sort=False).head(quota)
        rank = g.groupby(strata_col, sort=False).cumcount()
        g = g.assign(split=np.where(rank < n_val, "val", "test"))
        return g[[id_col, "split"]]

    chosen = bucketed_groupby(
        ds.map_batches(hashed, batch_format="pandas"),
        strata_col, cut, num_buckets).to_pandas()
    ref = ray.put(dict(zip(chosen[id_col], chosen["split"])))

    def verdict(b: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        return b.assign(split=pd.Series(
            [lookup.get(v, "train") for v in b[id_col]],
            index=b.index, dtype="object"))

    return ds.map_batches(verdict, batch_format="pandas")


def stratified_split_sql(table: str, strata_col: str, id_col: str,
                         n_val: int, n_test: int,
                         salt: str = "strat") -> str:
    """DuckDB oracle matching ``stratified_split`` bit-for-bit."""
    return f"""
        SELECT * EXCLUDE (rn),
               CASE WHEN rn <= {n_val} THEN 'val'
                    WHEN rn <= {n_val + n_test} THEN 'test'
                    ELSE 'train' END AS split
        FROM (SELECT *, ROW_NUMBER() OVER (
                PARTITION BY {strata_col}
                ORDER BY md5('{salt}|' || CAST({id_col} AS VARCHAR)),
                         {id_col}) AS rn
              FROM {table})"""


# ------------------------------------------------- exact heavy hitters

def topk_tokens(docs, k: int = 50, text_col: str = "text",
                num_buckets: int | None = None) -> pd.DataFrame:
    """Exact global top-k tokens by occurrence → (token, n), ordered by
    (n DESC, token ASC) with a deterministic cut at k.

    Per-batch Counters emit (token, partial-n) rows; each token's total
    lands whole in one hash bucket, so a per-bucket top-k is a correct
    candidate filter; the nb*k survivors (fixed-size, not
    data-proportional) merge on the driver.
    """

    def count_batch(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in b[text_col]:
            c.update(TOKEN_RE.findall((t or "").lower()))
        return pd.DataFrame({"token": list(c.keys()),
                             "n": np.fromiter(c.values(), np.int64, len(c))})

    partials = docs.map_batches(count_batch, batch_format="pandas")

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("token", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "token"], ascending=[False, True])
        return g.head(k)

    cand = bucketed_groupby(partials, "token", bucket_topk,
                            num_buckets).to_pandas()
    cand = cand.sort_values(["n", "token"], ascending=[False, True])
    return cand.head(k).reset_index(drop=True)


def topk_tokens_per_group(docs, group_col: str, k: int = 10,
                          text_col: str = "text",
                          num_buckets: int | None = None):
    """Exact per-group top-k tokens (the per-language vocabulary head a
    curation report needs) → (group, token, n), deterministic
    (n DESC, token ASC) cut at k per group.

    Per-batch (group, token) Counters emit partial rows; totals land
    whole in one hash bucket of the (group, token) shuffle, so the
    per-bucket per-group top-k is a correct candidate filter; the
    second tiny shuffle on the group folds ≤ nb*k candidate rows per
    group to the final cut.  Nothing driver-side, unlike the global
    ``topk_tokens``'s (intentionally small) nb*k driver merge.
    """
    def count_batch(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for g, t in zip(b[group_col], b[text_col]):
            for tok in TOKEN_RE.findall((t or "").lower()):
                c[(g, tok)] += 1
        ks = list(c.keys())
        return pd.DataFrame({
            group_col: pd.Series([x[0] for x in ks],
                                 dtype=b[group_col].dtype),
            "token": [x[1] for x in ks],
            "n": np.fromiter(c.values(), np.int64, len(c))})

    partials = docs.map_batches(count_batch, batch_format="pandas")

    def bucket_cut(pdf: pd.DataFrame) -> pd.DataFrame:
        g = (pdf.groupby([group_col, "token"], sort=False)["n"]
             .sum().reset_index())
        g = g.sort_values(["n", "token"], ascending=[False, True])
        return g.groupby(group_col, sort=False).head(k)

    cand = bucketed_groupby(partials, [group_col, "token"], bucket_cut,
                            num_buckets)
    return bucketed_groupby(cand, group_col, bucket_cut, num_buckets)


def approx_topk_tokens(docs, k: int = 50, capacity: int = 512,
                       text_col: str = "text",
                       num_buckets: int | None = None) -> pd.DataFrame:
    """Misra–Gries approximate top-k tokens — the mergeable-summary
    scale path next to exact ``topk_tokens`` (completing the
    exact/approx pairing: quantiles, distinct counts, decontamination,
    heavy hitters).

    Each batch's exact counts are MG-reduced (subtract the
    (capacity+1)-th largest count, keep positives — the valid summary
    merge of Agarwal et al., "Mergeable Summaries"), so at most
    ``capacity`` rows leave ANY batch regardless of vocabulary size;
    partial summaries then fold through one bounded-bucket sum.

    → (token, n_lb, rank): ``n_lb`` is a LOWER bound with global error
    ≤ total_tokens/(capacity+1) — every token whose true count exceeds
    that bound is guaranteed present (recall-tested against the exact
    path).  Returned as a pandas frame of ≤ k rows.
    """

    def mg_batch(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in b[text_col]:
            c.update(TOKEN_RE.findall((t or "").lower()))
        if not c:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        toks = np.array(list(c.keys()), dtype=object)
        ns = np.fromiter(c.values(), np.int64, len(c))
        if len(ns) > capacity:
            cut = np.partition(ns, len(ns) - capacity - 1)[
                len(ns) - capacity - 1]
            ns = ns - cut
            keep = ns > 0
            toks, ns = toks[keep], ns[keep]
        return pd.DataFrame({"token": toks, "n": ns})

    partials = docs.map_batches(mg_batch, batch_format="pandas")

    def bucket_sum(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("token", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "token"], ascending=[False, True])
        return g.head(k)

    cand = bucketed_groupby(partials, "token", bucket_sum,
                            num_buckets).to_pandas()
    cand = cand.sort_values(["n", "token"],
                            ascending=[False, True]).head(k)
    cand = cand.rename(columns={"n": "n_lb"}).reset_index(drop=True)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand[["rank", "token", "n_lb"]]


# --------------------------------------------- HyperLogLog distinct

HLL_P = 12                               # 4096 registers, ~1.6% rel. error
_HLL_M = 1 << HLL_P


def _hll_register_rows(values) -> pd.DataFrame:
    """(register, rho) rows for a batch of values — local max per
    register so at most 4096 rows leave any batch."""
    regs = np.zeros(_HLL_M, dtype=np.int64)
    for v in values:
        h = int.from_bytes(
            hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(),
            "little")
        idx = h & (_HLL_M - 1)
        rest = h >> HLL_P
        rho = (64 - HLL_P) - rest.bit_length() + 1
        if rho > regs[idx]:
            regs[idx] = rho
    nz = np.flatnonzero(regs)
    return pd.DataFrame({"register": nz.astype(np.int64), "rho": regs[nz]})


def hll_estimate_from_registers(regs: np.ndarray) -> float:
    m = float(_HLL_M)
    est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(2.0 ** -regs)
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)          # linear counting regime
    return est


def approx_distinct(ds, col: str, num_buckets: int | None = None) -> int:
    """HyperLogLog (p=12) approximate COUNT(DISTINCT col).

    Per-batch register maxima → one bucketed max-merge over ≤ 4096
    register keys → ≤ 4096 rows to the driver for the harmonic-mean
    fold.  ~1.6% typical relative error (asserted in tests against the
    exact count); the driver never sees data-proportional state.
    """
    rows = ds.map_batches(lambda b: _hll_register_rows(b[col].tolist()),
                          batch_format="pandas")
    merged = bucketed_agg(rows, "register", {"rho": ("rho", "max")},
                          num_buckets).to_pandas()
    regs = np.zeros(_HLL_M, dtype=np.int64)
    regs[merged["register"].to_numpy()] = merged["rho"].to_numpy()
    return int(round(hll_estimate_from_registers(regs)))


def grouped_approx_distinct(ds, key: str, col: str,
                            num_buckets: int | None = None):
    """Per-group HyperLogLog — the sketch path next to exact
    ``grouped_distinct_count`` (the same exact/approx pairing as
    ``grouped_quantiles``/``approx_quantiles``).

    → (key, n_distinct_approx), ~1.6% typical relative error (p=12).

    Scale shape: per-batch per-key register maxima (≤ 4096 rows per key
    per batch) → one bounded-bucket max-merge on (key, register) → a
    per-key harmonic fold that sees ≤ 4096 rows per key, bucket-local.
    Per-group state is FIXED-size, so a group with 10^9 distinct values
    costs the same as one with 10 — the whole point versus the exact
    path's (key, value) distinct rows.
    """

    def rows(b: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for kv, g in b.groupby(key, sort=False):
            r = _hll_register_rows(g[col].tolist())
            r[key] = kv
            parts.append(r)
        if not parts:
            return pd.DataFrame({
                "register": pd.Series([], dtype="int64"),
                "rho": pd.Series([], dtype="int64"),
                key: pd.Series([], dtype=b[key].dtype)})
        return pd.concat(parts, ignore_index=True)

    merged = bucketed_agg(
        ds.map_batches(rows, batch_format="pandas"),
        [key, "register"], {"rho": ("rho", "max")}, num_buckets)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        ks, ns = [], []
        for kv, g in pdf.groupby(key, sort=False):
            regs = np.zeros(_HLL_M, dtype=np.int64)
            regs[g["register"].to_numpy()] = g["rho"].to_numpy()
            ks.append(kv)
            ns.append(int(round(hll_estimate_from_registers(regs))))
        return pd.DataFrame({key: ks,
                             "n_distinct_approx": np.array(ns, np.int64)})

    return bucketed_groupby(merged, key, fold, num_buckets)


# ------------------------------------------------------------ k-means

def _kmeans_init(embeddings, k: int) -> np.ndarray:
    """Deterministic seeds: the vectors of the k smallest vec_ids.
    Per-batch local min-k candidates → nblocks*k rows to the driver —
    never a full sort, never the full column."""

    def local_k(b: pd.DataFrame) -> pd.DataFrame:
        return b.nsmallest(k, "vec_id")[["vec_id", "embedding"]]

    cand = embeddings.map_batches(local_k, batch_format="pandas").to_pandas()
    cand = cand.nsmallest(k, "vec_id")
    return np.stack(cand["embedding"].to_numpy()).astype(np.float64)


def kmeans_fit(embeddings, k: int = 8, n_iter: int = 10) -> np.ndarray:
    """The Lloyd iteration of :func:`kmeans`, returning the fitted
    (k x d) centroid matrix — shared by the assignment map and by
    consumers that need centroids without assignments (semantic
    dedup's cluster stage)."""
    import ray

    cents = _kmeans_init(embeddings, k)

    for _ in range(n_iter):
        ref = ray.put(cents)

        def partial(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            c = ray.get(_ref)
            m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            rows = []
            for ci in range(len(c)):
                mask = a == ci
                if mask.any():
                    rows.append((ci, int(mask.sum()), m[mask].sum(axis=0)))
            return pd.DataFrame({
                "cluster": [r[0] for r in rows],
                "n": np.array([r[1] for r in rows], dtype=np.int64),
                "vec_sum": [r[2] for r in rows]})

        parts = embeddings.map_batches(partial,
                                       batch_format="pandas").to_pandas()
        new = cents.copy()
        for ci, g in parts.groupby("cluster"):
            total = np.sum(np.stack(g["vec_sum"].to_numpy()), axis=0)
            new[ci] = total / g["n"].sum()
        cents = new

    return cents


def kmeans(embeddings, k: int = 8, n_iter: int = 10):
    """Lloyd's k-means over the embedding column → (vec_id, cluster).

    Each iteration: centroids (k x d, tiny) broadcast via ``ray.put``;
    every batch computes assignments vectorized and emits k partial
    (cluster, count, sum) rows; the driver folds nblocks*k partials —
    fixed-size state, the classic scalable shape.  Distance ties take
    the lowest cluster index (np.argmin), empty clusters keep their
    previous centroid, so the result is deterministic for a given
    input set (assignment is order-free; centroid sums fold in block
    order, the one float-order caveat — documented, not observable on
    separated clusters)."""
    import ray

    cents = kmeans_fit(embeddings, k, n_iter)
    ref = ray.put(cents)

    def assign(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        c = ray.get(_ref)
        m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.DataFrame({"vec_id": b["vec_id"].astype("int64").to_numpy(),
                             "cluster": d2.argmin(axis=1).astype(np.int64)})

    return embeddings.map_batches(assign, batch_format="pandas")


# ------------------------------------------------------- range join

def events_range_join_counts(events, minutes: int = 10,
                             num_buckets: int | None = None):
    """Temporal range (interval) self-join: for every event, the count
    of the SAME user's events in the half-open window
    ``[ts - minutes, ts)`` → (event_id, n_prior).

    The non-equi predicate never materializes a cross product: rows
    hash-bucket on the user key through one bounded shuffle, and each
    bucket sorts its users' events by ts once and answers every window
    with two ``np.searchsorted`` probes — O(n log n) per bucket, the
    standard interval-join kernel.  A hot user costs sort time, not
    pair-count time.
    """
    win = np.timedelta64(minutes, "m")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        out_id, out_n = [], []
        for _, g in pdf.groupby("user_id", sort=False):
            g = g.sort_values("ts", kind="mergesort")
            ts = g["ts"].to_numpy()
            lo = np.searchsorted(ts, ts - win, side="left")
            hi = np.searchsorted(ts, ts, side="left")
            out_id.append(g["event_id"].to_numpy())
            out_n.append(hi - lo)
        if not out_id:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_prior": pd.Series([], dtype="int64")})
        return pd.DataFrame({"event_id": np.concatenate(out_id),
                             "n_prior": np.concatenate(out_n).astype(np.int64)})

    ev = events.map_batches(
        lambda b: b[["event_id", "user_id", "ts"]], batch_format="pandas")
    return bucketed_groupby(ev, "user_id", fold, num_buckets)

# --------------------------------------------------- global ranking

def global_rank(ds, value_col: str, id_col: str, descending: bool = False,
                out_col: str = "rank", sample_size: int = 4096,
                num_buckets: int | None = None):
    """Dense global rank 1..N by (value_col, id_col) — the distributed
    total-order primitive (leaderboards, percentile cutoffs, stable
    output numbering) without ``ds.sort`` + a driver loop.

    → input columns + ``out_col``; rank is unique and deterministic
    (``id_col`` breaks value ties ascending).

    Scale shape: the classic range-partitioned sort-rank —
    (1) a bounded sample picks value boundaries (driver-side, fixed
    size, affects only load balance, never the result), (2) rows map to
    value ranges, (3) per-range counts (≤ sample_size integers) fold to
    prefix offsets broadcast in the closure, (4) each range lexsorts
    locally inside one bucket and adds its offset.  Equal values always
    land in one range, so the in-range (value, id) lexsort is the only
    tie-break that ever runs.

    The boundary sample reads 33 per-block quantiles from EVERY block
    and stream-folds them on the driver under a fixed cap (re-quantile
    whenever the accumulator exceeds 4·sample_size) — sorted or skewed
    input still yields balanced ranges, and driver memory stays
    O(sample_size) at any block count.
    """

    def keyed(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy()
        if len(v) and not np.issubdtype(v.dtype, np.number):
            raise ValueError(
                f"global_rank needs a numeric value_col, got {v.dtype} "
                f"for {value_col!r}")
        return pdf.assign(__k=(-v if descending else v))

    qs = np.linspace(0.0, 1.0, 33)

    def block_quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
        k = keyed(pdf)["__k"].to_numpy()
        if not len(k):
            return pd.DataFrame({"__k": pd.Series([], dtype="float64")})
        return pd.DataFrame(
            {"__k": np.quantile(k, qs, method="nearest").astype("float64")})

    acc = np.array([], dtype="float64")
    for part in ds.map_batches(
            block_quantiles, batch_format="pandas").iter_batches(
            batch_format="pandas", batch_size=4096):
        acc = np.concatenate([acc, part["__k"].to_numpy()])
        if len(acc) > 4 * sample_size:                 # bounded driver fold
            acc = np.quantile(acc, np.linspace(0.0, 1.0, sample_size),
                              method="nearest")
    bounds = np.unique(acc)[1:-1]  # interior cuts

    def add_range(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = keyed(pdf)
        k = pdf["__k"].to_numpy()
        r = (np.searchsorted(bounds, k, side="left") if len(bounds)
             else np.zeros(len(pdf), dtype=np.int64))
        return pdf.assign(__r=r.astype(np.int64))

    ranged = ds.map_batches(add_range, batch_format="pandas")

    counts = bucketed_agg(
        ranged.map_batches(lambda d: d[["__r", "__k"]], batch_format="pandas"),
        "__r", {"n": ("__k", "size")}, num_buckets).to_pandas()
    counts = counts.sort_values("__r")
    offsets = dict(zip(counts["__r"].to_numpy(),
                       np.concatenate([[0], np.cumsum(
                           counts["n"].to_numpy())[:-1]])))

    def rank_range(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for r, g in pdf.groupby("__r", sort=False):
            order = np.lexsort((g[id_col].to_numpy(), g["__k"].to_numpy()))
            g = g.iloc[order]
            parts.append(g.assign(**{out_col: offsets[r] + 1 + np.arange(
                len(g), dtype=np.int64)}))
        out = (pd.concat(parts, ignore_index=True) if parts
               else pdf.assign(**{out_col: np.array([], dtype=np.int64)}))
        return out.drop(columns=["__k", "__r"])

    return bucketed_groupby(ranged, "__r", rank_range, num_buckets)


def percent_rank(ds, value_col: str, id_col: str,
                 descending: bool = False, out_col: str = "pct_micro",
                 num_buckets: int | None = None):
    """Rank-based score normalization (quantile/percentile transform —
    the calibration step before thresholding a heterogeneous quality
    score): input columns + ``rank`` + ``out_col`` where
    ``pct = (rank-1) * 1e6 // (n-1)`` int64 micro-units, 0 for n=1.

    ROW_NUMBER semantics (unique rank, ``id_col`` breaks value ties) —
    NOT SQL PERCENT_RANK's tie-sharing RANK; the oracle mirrors the
    ROW_NUMBER form.  All-integer math after the rank, so bit-exact.

    Scale shape: ``global_rank``'s range-partitioned sort-rank plus a
    stateless map; the row count comes from one ``ds.count()`` on the
    un-ranked input (metadata-only for parquet reads).
    """
    n = ds.count()
    ranked = global_rank(ds, value_col, id_col, descending=descending,
                         out_col="rank", num_buckets=num_buckets)
    denom = max(n - 1, 1)

    def pct(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf["rank"].to_numpy(dtype=np.int64)
        return pdf.assign(
            **{out_col: (r - 1) * 1_000_000 // denom})

    return ranked.map_batches(pct, batch_format="pandas")


# ----------------------------------------- deterministic corpus shuffle

def shuffle_rank(ds, id_col: str, salt: str = "shuf", out_col: str = "pos",
                 num_buckets: int | None = None):
    """Deterministic global shuffle position — the reproducible
    permutation a training pipeline applies before sequence packing
    (``random_shuffle`` without RNG state: same corpus + salt → same
    order on any cluster size).  Rows rank 1..N by
    (md5("{salt}|{id}") 60-bit prefix, id) through the range-partitioned
    ``global_rank``; ties are impossible short of md5 collisions and
    break by id anyway.  → input columns minus the internal sort key,
    plus ``out_col``.

    SQL mirror: ``ROW_NUMBER() OVER (ORDER BY substr(md5(...), 1, 15),
    id)`` — lowercase fixed-width hex string order equals the integer
    order of the same prefix, so the oracle needs no hex-to-int cast.
    """

    def key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__sh"] = np.fromiter(
            (int(hashlib.md5(f"{salt}|{v}".encode("utf-8"))
                 .hexdigest()[:15], 16) for v in b[id_col].tolist()),
            np.int64, len(b))
        return b

    ranked = global_rank(ds.map_batches(key, batch_format="pandas"),
                         "__sh", id_col, out_col=out_col,
                         num_buckets=num_buckets)
    return ranked.map_batches(lambda b: b.drop(columns="__sh"),
                              batch_format="pandas")


# ----------------------------------------------- per-group top-k rows

def top_per_group(ds, key: str, metric: str, id_col: str, k: int = 3,
                  num_buckets: int | None = None):
    """Per-group top-k row selection (the "keep the best k documents
    per language" curation step): rows ranked (metric DESC, id ASC)
    within each key value → (key, rank, id_col, metric).

    Per-batch combiner keeps ≤k candidate rows per key per batch, so
    the shuffle moves at most k·keys·blocks small rows; the global cut
    and rank assignment run per key inside one hash bucket (a key's
    candidates land whole in one bucket).  Output is bounded by
    k × |keys| — never data-proportional.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b[[key, metric, id_col]].sort_values(
            [metric, id_col], ascending=[False, True], kind="mergesort")
        return g.groupby(key, sort=False).head(k)

    cands = ds.map_batches(partial, batch_format="pandas")

    def cut(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values([metric, id_col], ascending=[False, True],
                            kind="mergesort")
        g = g.groupby(key, sort=False).head(k).copy()
        g["rank"] = (g.groupby(key, sort=False).cumcount() + 1).astype("int64")
        return g[[key, "rank", id_col, metric]]

    return bucketed_groupby(cands, key, cut, num_buckets)


# ----------------------------------------------- mixture sampling

def mixture_sample(ds, key_col: str, rates: dict[str, float], id_col: str,
                   default_rate: float = 1.0, salt: str = "mix"):
    """Deterministic mixture sampling (data mixing: per-subset
    up/down-weighting, e.g. per-language sampling rates when
    assembling a training mix): keep a row iff
    ``md5(salt + ":" + str(id))[:8] < threshold(rates[key])``.

    → the kept (id_col, key_col) rows.  A pure per-row map — no
    shuffle, no RNG state — reproducible across runs and cluster
    sizes, and expressible verbatim in SQL.  ``salt`` decorrelates the
    decision from ``hash_split``'s md5 of the bare id, so sampling
    does not bias the train/val/test assignment.
    """
    # rate >= 1.0 keeps unconditionally: the strict h8 < threshold test
    # caps at 0xffffffff and would drop ids whose md5 prefix is exactly
    # 'ffffffff' (~1 per 4.3B ids); None marks the keep-all short-circuit
    thr = {k: (None if v >= 1.0 else _hex_threshold(v))
           for k, v in rates.items()}
    dflt = None if default_rate >= 1.0 else _hex_threshold(default_rate)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        mask = []
        for v, g in zip(batch[id_col], batch[key_col]):
            t = thr.get(g, dflt)
            if t is None:
                mask.append(True)
                continue
            h8 = hashlib.md5(f"{salt}:{v}".encode("utf-8")).hexdigest()[:8]
            mask.append(h8 < t)
        return batch.loc[mask, [id_col, key_col]]

    return ds.map_batches(keep, batch_format="pandas")


def mixture_sample_sql(table: str, key_col: str, rates: dict[str, float],
                       id_col: str, default_rate: float = 1.0,
                       salt: str = "mix") -> str:
    """DuckDB oracle matching ``mixture_sample`` bit-for-bit."""
    def _test(v: float) -> str:
        # rate >= 1.0 keeps unconditionally, mirroring the Python side
        return "TRUE" if v >= 1.0 else f"h8 < '{_hex_threshold(v)}'"

    cases = " ".join(
        f"WHEN {key_col} = '{k}' THEN {_test(v)}"
        for k, v in rates.items())
    return f"""
        SELECT {id_col}, {key_col}
        FROM (SELECT {id_col}, {key_col},
                     substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)),
                            1, 8) AS h8
              FROM {table})
        WHERE CASE {cases} ELSE {_test(default_rate)} END"""


def temperature_sample(ds, key_col: str, id_col: str, alpha: float = 0.7,
                       salt: str = "temp"):
    """Temperature-scaled mixture sampling (the multilingual
    rebalancing rule of XLM-R / mT5: target share of group g ∝
    p_g^alpha, realized by pure DOWN-sampling so the smallest group
    keeps everything): a row of group g keeps with rate
    ``(n_g / n_min) ** (alpha - 1)`` — exactly the q_g/p_g ratio
    normalized by its maximum — decided by the deterministic
    ``md5(salt:id)`` threshold convention of ``mixture_sample``.

    → the kept (id_col, key_col) rows.  Group counts fold from
    per-batch partials (bounded by #groups x #blocks — the
    ``value_histogram`` driver-fold contract); the keep pass is a
    stateless per-row map, so the corpus streams once and nothing
    data-proportional reaches the driver.  Rates are IEEE doubles
    mirrored operation-for-operation in the SQL oracle
    (divide → pow → truncating 2^32 threshold), the
    ``weighted_sample_exact`` convention — bit-exact, not approximate.
    ``alpha=1`` keeps everything; alpha→0 flattens groups toward the
    smallest.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    parts = ds.map_batches(
        lambda b: b.groupby(key_col, sort=False).size()
                   .rename("cnt").reset_index(),
        batch_format="pandas").to_pandas()
    if parts.empty:
        return ds.map_batches(lambda b: b[[id_col, key_col]].iloc[:0],
                              batch_format="pandas")
    counts = parts.groupby(key_col)["cnt"].sum()
    n_min = int(counts.min())
    # rate < 1 strictly except for argmin groups (kept unconditionally
    # via the None short-circuit — the mixture_sample 'ffffffff' rule)
    thr = {}
    for g, c in counts.items():
        rate = (int(c) / n_min) ** (alpha - 1.0)
        thr[g] = None if rate >= 1.0 else format(int(rate * 4294967296),
                                                 "08x")

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        mask = []
        for v, g in zip(batch[id_col], batch[key_col]):
            t = thr.get(g)
            if t is None:
                mask.append(True)
                continue
            h8 = hashlib.md5(f"{salt}:{v}".encode("utf-8")).hexdigest()[:8]
            mask.append(h8 < t)
        return batch.loc[mask, [id_col, key_col]]

    return ds.map_batches(keep, batch_format="pandas")


def temperature_sample_sql(table: str, key_col: str, id_col: str,
                           alpha: float = 0.7,
                           salt: str = "temp") -> str:
    """DuckDB oracle matching ``temperature_sample`` bit-for-bit —
    including the rate DERIVATION (counts → divide → pow), not just
    the threshold test."""
    return f"""
        WITH counts AS (
          SELECT {key_col} AS k, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM {table} GROUP BY 1),
        rates AS (
          SELECT k, POW(CAST(cnt AS DOUBLE)
                        / CAST((SELECT MIN(cnt) FROM counts) AS DOUBLE),
                        {alpha - 1.0!r}) AS rate
          FROM counts)
        SELECT t.{id_col}, t.{key_col}
        FROM {table} t JOIN rates r ON t.{key_col} = r.k
        WHERE r.rate >= 1.0
           OR substr(md5('{salt}:' || CAST(t.{id_col} AS VARCHAR)), 1, 8)
              < lower(lpad(to_hex(CAST(trunc(r.rate * 4294967296)
                                       AS BIGINT)), 8, '0'))"""


def distribution_match(ds, val_col: str, id_col: str, lo: float,
                       hi: float, n_bins: int = 16,
                       target: list[float] | None = None,
                       salt: str = "dmatch"):
    """Rejection-sample the corpus so a VALUE column's histogram
    matches a target shape (the distribution-matching step of a
    data-mixing recipe: make web-scrape doc lengths look like a
    reference corpus before training) — pure down-sampling, the bin
    closest to its target share keeps everything.

    Bin b (``value_histogram``'s floor/clamp rule over [lo, hi)) keeps
    rows at rate ``(t_b / p_b) / max_c(t_c / p_c)`` where ``t`` is the
    target share and ``p`` the observed share, decided by the
    deterministic ``md5(salt:id)`` threshold convention.  ``target``
    is ``n_bins`` weights (default uniform).

    → the kept (id_col, bin) rows.  Bin counts fold from bounded
    per-batch ``np.bincount`` partials (the ``value_histogram``
    contract); the keep pass is a stateless map — the corpus streams
    once, nothing data-proportional reaches the driver.  All rate math
    is IEEE doubles mirrored operation-for-operation in the SQL oracle
    (share-divide → ratio-divide → truncating 2^32 threshold) —
    bit-exact, not approximate.
    """
    lo = float(lo)
    hi = float(hi)
    w = (hi - lo) / n_bins
    if target is None:
        target = [1.0 / n_bins] * n_bins
    if len(target) != n_bins:
        raise ValueError(f"target needs {n_bins} weights, got {len(target)}")

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[val_col].to_numpy(dtype=np.float64)
        b = np.clip(np.floor((v - lo) / w), 0, n_bins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"bin": nz.astype("int64"),
                             "n": counts[nz].astype("int64")})

    total = np.zeros(n_bins, dtype=np.int64)
    for pdf in (ds.map_batches(part, batch_format="pandas")
                .iter_batches(batch_format="pandas")):
        np.add.at(total, pdf["bin"].to_numpy(), pdf["n"].to_numpy())
    n_total = int(total.sum())
    if n_total == 0:
        return ds.map_batches(
            lambda b: pd.DataFrame({id_col: b[id_col].iloc[:0],
                                    "bin": pd.Series([], dtype="int64")}),
            batch_format="pandas")
    ratios = [float(t) / (int(c) / n_total) if c > 0 else 0.0
              for t, c in zip(target, total)]
    mx = max(ratios)
    thr = []
    for r in ratios:
        rate = r / mx
        thr.append(None if rate >= 1.0
                   else format(int(rate * 4294967296), "08x"))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        v = b[val_col].to_numpy(dtype=np.float64)
        bins = np.clip(np.floor((v - lo) / w), 0, n_bins - 1).astype(np.int64)
        mask = np.zeros(len(b), dtype=bool)
        for i, (d, bb) in enumerate(zip(b[id_col], bins)):
            t = thr[bb]
            mask[i] = (True if t is None else
                       hashlib.md5(f"{salt}:{d}".encode("utf-8"))
                       .hexdigest()[:8] < t)
        out = b.loc[mask, [id_col]].copy()
        out["bin"] = bins[mask]
        return out

    return ds.map_batches(keep, batch_format="pandas")


def distribution_match_sql(table: str, val_col: str, id_col: str,
                           lo: float, hi: float, n_bins: int = 16,
                           target: list[float] | None = None,
                           salt: str = "dmatch") -> str:
    """DuckDB oracle matching ``distribution_match`` bit-for-bit —
    including the bin counts and rate derivation, not just the
    threshold test."""
    lo_r = repr(float(lo))
    w_r = repr((float(hi) - float(lo)) / n_bins)
    if target is None:
        target = [1.0 / n_bins] * n_bins
    whens = " ".join(f"WHEN {b} THEN {repr(float(t))}"
                     for b, t in enumerate(target))
    return f"""
        WITH binned AS (
          SELECT {id_col},
                 LEAST(GREATEST(CAST(FLOOR(({val_col} - {lo_r}) / {w_r})
                                     AS BIGINT), 0), {n_bins - 1}) AS bin
          FROM {table}),
        counts AS (
          SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM binned GROUP BY 1),
        ratios AS (
          SELECT bin,
                 (CASE bin {whens} END)
                   / (CAST(c AS DOUBLE)
                      / CAST((SELECT SUM(c) FROM counts) AS DOUBLE)) AS ratio
          FROM counts),
        rates AS (
          SELECT bin, ratio / (SELECT MAX(ratio) FROM ratios) AS rate
          FROM ratios)
        SELECT b.{id_col}, b.bin
        FROM binned b JOIN rates r USING (bin)
        WHERE r.rate >= 1.0
           OR substr(md5('{salt}:' || CAST(b.{id_col} AS VARCHAR)), 1, 8)
              < lower(lpad(to_hex(CAST(trunc(r.rate * 4294967296)
                                       AS BIGINT)), 8, '0'))"""


def grouped_outliers(ds, key_col: str, val_col: str, id_col: str,
                     k_sigma: int = 3):
    """Per-group z-score outlier flags over an INTEGER value column
    (doc-length anomaly detection per language/source — the "trim the
    tails before training" signal next to ``quantile_clip``'s
    rank-based cut): a row is an outlier iff |x − μ_g| > k·σ_g
    (population σ), evaluated in EXACT integer arithmetic —
    ``(n·x − S)² > k²·(n·SS − S²)`` — so there is no float boundary
    and the SQL oracle matches bit-for-bit.

    → (id_col, key_col, val_col, is_outlier 0/1) for every row.
    Group stats fold from per-batch (n, Σx, Σx²) partials (bounded by
    #groups × #blocks, the ``value_histogram`` driver-fold contract);
    the flag pass is a stateless map, so the corpus streams once.
    Int64 range: safe while n_g · max(x)² < 2^63 (≈ 10^9 rows of
    10^4-char docs per group); past that, promote to the int128 path
    the oracle's HUGEINT would take.
    """
    k2 = int(k_sigma) * int(k_sigma)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[val_col].to_numpy(np.int64)
        return (pd.DataFrame({key_col: b[key_col], "n": 1, "s": v,
                              "ss": v * v})
                .groupby(key_col, sort=False).sum().reset_index())

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    stats = (parts.groupby(key_col)[["n", "s", "ss"]].sum()
             if len(parts) else pd.DataFrame(columns=["n", "s", "ss"]))
    st = {g: (int(r["n"]), int(r["s"]), int(r["ss"]))
          for g, r in stats.iterrows()}

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        x = b[val_col].to_numpy(np.int64)
        out = np.zeros(len(b), dtype=np.int64)
        for g, idx in b.groupby(key_col, sort=False).indices.items():
            n, s, ss = st[g]
            d = n * x[idx] - s
            out[idx] = (d * d > k2 * (n * ss - s * s)).astype(np.int64)
        return pd.DataFrame({id_col: b[id_col], key_col: b[key_col],
                             val_col: x, "is_outlier": out})

    return ds.map_batches(flag, batch_format="pandas")


def grouped_outliers_sql(table: str, key_col: str, val_col: str,
                         id_col: str, k_sigma: int = 3) -> str:
    """DuckDB oracle matching ``grouped_outliers`` bit-for-bit (same
    integer inequality, no float σ)."""
    k2 = int(k_sigma) * int(k_sigma)
    return f"""
        WITH s AS (
          SELECT {key_col} AS kk, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST({val_col} AS BIGINT)) AS BIGINT) AS sm,
                 CAST(SUM(CAST({val_col} AS BIGINT)
                          * CAST({val_col} AS BIGINT)) AS BIGINT) AS ss
          FROM {table} GROUP BY 1)
        SELECT t.{id_col}, t.{key_col},
               CAST(t.{val_col} AS BIGINT) AS {val_col},
               CAST(CASE WHEN (s.n * CAST(t.{val_col} AS BIGINT) - s.sm)
                              * (s.n * CAST(t.{val_col} AS BIGINT) - s.sm)
                              > {k2} * (s.n * s.ss - s.sm * s.sm)
                         THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        FROM {table} t JOIN s ON t.{key_col} = s.kk"""


def weighted_sample(ds, id_col: str, weight_col: str, scale: int,
                    min_x1000: int = 100, salt: str = "wgt"):
    """Deterministic value-weighted downsampling (keep long/high-quality
    docs with higher probability — the importance-sampling step of a
    data-mixing recipe, without RNG state): a row's keep rate is
    ``clip(1000*weight // scale, min_x1000, 1000)`` per-mille, and it
    keeps iff ``md5(salt:id)[:8] < hex(rate * 2^32 / 1000)``.

    → the kept (id_col, weight_col, rate_x1000) rows.  Pure per-row
    map — no shuffle, reproducible across runs and cluster sizes, and
    expressible verbatim in SQL (integer threshold math both sides).
    """

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[weight_col].to_numpy(np.int64)
        rates = np.clip((1000 * w) // scale, min_x1000, 1000)
        mask = []
        for v, r in zip(batch[id_col], rates):
            if r >= 1000:
                # keep unconditionally — the strict < test would drop
                # ids whose md5 prefix is exactly 'ffffffff'
                mask.append(True)
                continue
            h8 = hashlib.md5(f"{salt}:{v}".encode("utf-8")).hexdigest()[:8]
            thr = format(int(r) * (1 << 32) // 1000, "08x")
            mask.append(h8 < thr)
        out = batch.loc[mask, [id_col, weight_col]].copy()
        out["rate_x1000"] = rates[mask]
        return out

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample_sql(table: str, id_col: str, weight_col: str,
                        scale: int, min_x1000: int = 100,
                        salt: str = "wgt") -> str:
    """DuckDB oracle matching ``weighted_sample`` bit-for-bit."""
    rate = (f"LEAST(GREATEST((1000 * {weight_col}) // {scale}, "
            f"{min_x1000}), 1000)")
    thr = f"lower(lpad(to_hex(({rate} * 4294967296) // 1000), 8, '0'))"
    return f"""
        SELECT {id_col}, {weight_col},
               CAST({rate} AS BIGINT) AS rate_x1000
        FROM {table}
        WHERE {rate} >= 1000
           OR substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 8)
              < {thr}"""


# ----------------------------------------------- tf-idf term salience

def tfidf_top_terms(docs, k: int = 5, text_col: str = "text",
                    num_buckets: int | None = None):
    """Per-document top-k salient terms by integerized tf-idf →
    (doc_id, rank, token, score), rank by (score DESC, token ASC).

    ``score = tf * ((1000 * n_docs) // df)`` — all-integer arithmetic
    (floor division) so the SQL oracle matches bit-for-bit; the 1000
    scale keeps idf resolution without floats.

    Scale shape, skew-proof on stopword-class tokens: (doc, token, tf)
    rows → per-token document frequency via a per-batch count combiner
    (≤1 partial row per token per block — a token in every document
    folds nblocks partials, never n_docs rows) → tf ⋈ df on token via
    the SALTED lookup join (tf rows shard by doc-salt, df rows
    replicate per shard, so a hot token's tf rows split across salts;
    payload = one int per token, never a broadcast vocabulary map) →
    per-doc top-k cut in a doc_id bucket.  Only the corpus row count
    (one scalar) touches the driver.
    """
    from .dedup import _doc_key_dtype
    from .shuffle import salted_lookup_join

    kd = _doc_key_dtype(docs)
    n_docs = docs.count()

    def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        ids, toks, tfs = [], [], []
        for d, t in zip(b["doc_id"], b[text_col]):
            c = Counter(TOKEN_RE.findall((t or "").lower()))
            ids.extend([d] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype=b["doc_id"].dtype),
                             "token": toks,
                             "tf": np.array(tfs, dtype=np.int64)})

    # tf feeds TWO consumers (the df partials and the salted join);
    # pin it once so the tokenize pass doesn't re-execute per consumer
    # (the decontaminate_fuzzy re-execution class; compact int/token
    # rows, spillable at scale)
    tf = docs.map_batches(tf_rows, batch_format="pandas").materialize()
    # per-batch df partials: a doc's tf rows never straddle batches, so
    # local per-token row counts sum to the exact document frequency
    df_partial = tf.map_batches(
        lambda b: b.groupby("token", sort=False).size()
                   .rename("df").reset_index(),
        batch_format="pandas")
    df = bucketed_agg(df_partial, "token", {"df": ("df", "sum")},
                      num_buckets)

    def score(m: pd.DataFrame) -> pd.DataFrame:
        out = m[["doc_id", "token"]].copy()
        out["score"] = (m["tf"].to_numpy(np.int64)
                        * ((1000 * n_docs) // m["df"].to_numpy(np.int64)))
        return out

    scored = salted_lookup_join(
        tf, df, on="token", salt_col="doc_id",
        left_schema={"token": "object", "doc_id": kd, "tf": "int64"},
        right_schema={"token": "object", "df": "int64"},
        num_buckets=num_buckets, post=score)

    def cut(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(["score", "token"], ascending=[False, True],
                            kind="mergesort")
        g = g.groupby("doc_id", sort=False).head(k).copy()
        g["rank"] = (g.groupby("doc_id", sort=False).cumcount() + 1
                     ).astype("int64")
        return g[["doc_id", "rank", "token", "score"]]

    return bucketed_groupby(scored, "doc_id", cut, num_buckets)


def tfidf_sql(k: int = 5) -> str:
    """DuckDB oracle matching ``tfidf_top_terms`` bit-for-bit."""
    # COALESCE mirrors the Python side's (t or "") null-text guard
    tok = "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')"
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest({tok}) AS token FROM documents),
        tf AS (
          SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT COUNT(*) AS n FROM documents),
        sc AS (
          SELECT doc_id, token, tf * ((1000 * n) // df) AS score
          FROM tf JOIN df USING (token) CROSS JOIN nd),
        r AS (
          SELECT doc_id, token, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, token ASC) AS rn
          FROM sc)
        SELECT doc_id, rn AS rank, token, CAST(score AS BIGINT) AS score
        FROM r WHERE rn <= {k}"""


# ------------------------------------- approximate quantiles (sketch)

def approx_quantiles(ds, key: str, col: str,
                     qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                     n_bins: int = 4096, num_buckets: int | None = None):
    """Approximate per-group quantiles for CONTINUOUS values via a
    fixed-size mergeable histogram sketch → (key, q, q_value).

    ``grouped_quantiles`` is exact but its state is
    distinct-values-per-key — for continuous doubles that is
    rows-per-key, which does not scale.  This is the sketch path (the
    HLL analogue for quantiles): two streaming passes, state bounded
    by ``keys x n_bins`` int64 registers regardless of row count.

      pass 1: per-batch (key, min, max) partials → per-key range;
      pass 2: per-batch fixed-bin counts → per-(key, bin) sums;
      answer: the right edge of the bin containing rank ceil(q*n) —
      error ≤ (max-min)/n_bins in value terms (rank-exact bin).

    Deterministic (no sampling); only keys x n_bins rows ever reach
    the driver.
    """
    qarr = np.asarray(qs, dtype=np.float64)

    def minmax(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, sort=False)[col].agg(["min", "max"])
        return g.reset_index().rename(columns={"min": "lo", "max": "hi"})

    ranges = bucketed_agg(
        ds.map_batches(minmax, batch_format="pandas"), key,
        {"lo": ("lo", "min"), "hi": ("hi", "max")}, num_buckets).to_pandas()
    lo = dict(zip(ranges[key], ranges["lo"]))
    hi = dict(zip(ranges[key], ranges["hi"]))

    def bins(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for kv, g in b.groupby(key, sort=False):
            l, h = lo[kv], hi[kv]
            width = (h - l) or 1.0
            idx = np.minimum(
                ((g[col].to_numpy(np.float64) - l) / width * n_bins)
                .astype(np.int64), n_bins - 1)
            bc = np.bincount(idx, minlength=n_bins)
            nz = np.nonzero(bc)[0]
            outs.append(pd.DataFrame({key: [kv] * len(nz), "bin": nz,
                                      "n": bc[nz].astype(np.int64)}))
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({key: pd.Series([], dtype=b[key].dtype),
                                   "bin": pd.Series([], dtype="int64"),
                                   "n": pd.Series([], dtype="int64")}))

    hist = bucketed_agg(ds.map_batches(bins, batch_format="pandas"),
                        [key, "bin"], {"n": ("n", "sum")},
                        num_buckets).to_pandas()

    rows = []
    for kv, g in hist.groupby(key, sort=False):
        g = g.sort_values("bin")
        cum = g["n"].cumsum().to_numpy()
        n = cum[-1]
        l, h = lo[kv], hi[kv]
        width = (h - l) or 1.0
        for q in qarr:
            rank = math.ceil(q * n)
            b_idx = int(g["bin"].to_numpy()[np.searchsorted(
                cum, rank, side="left")])
            rows.append((kv, q, l + (b_idx + 1) * width / n_bins))
    out = pd.DataFrame(rows, columns=[key, "q", "q_value"])
    out["q"] = out["q"].astype(np.float64)
    out["q_value"] = out["q_value"].astype(np.float64)
    return out.sort_values([key, "q"]).reset_index(drop=True)


# ----------------------------------------- per-group uniform sampling

def sample_per_group(ds, key: str, id_col: str, k: int = 10,
                     salt: str = "smp", num_buckets: int | None = None):
    """Deterministic uniform sample of exactly ``k`` rows per group →
    (key, id_col): the k smallest ``md5(salt + ":" + str(id))`` values
    within each key (hash-rank sampling — uniform because the hash is
    uniform, reproducible because there is no RNG state, and exact-k
    unlike rate-based ``mixture_sample``).

    Same scale shape as ``top_per_group``: a per-batch k-candidate
    combiner bounds the shuffle at k·keys·blocks rows; the global cut
    runs per key inside one hash bucket.
    """

    def hashed(b: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(f"{salt}:{v}".encode("utf-8")).hexdigest()[:16]
             for v in b[id_col]]
        out = pd.DataFrame({key: b[key].to_numpy(),
                            id_col: b[id_col].to_numpy(), "__h": h})
        out = out.sort_values(["__h", id_col], kind="mergesort")
        return out.groupby(key, sort=False).head(k)

    cands = ds.map_batches(hashed, batch_format="pandas")

    def cut(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(["__h", id_col], kind="mergesort")
        g = g.groupby(key, sort=False).head(k)
        return g[[key, id_col]]

    return bucketed_groupby(cands, key, cut, num_buckets)


def sample_per_group_sql(table: str, key: str, id_col: str, k: int = 10,
                         salt: str = "smp") -> str:
    """DuckDB oracle matching ``sample_per_group`` bit-for-bit."""
    return f"""
        SELECT {key}, {id_col}
        FROM (SELECT {key}, {id_col},
                     ROW_NUMBER() OVER (
                       PARTITION BY {key}
                       ORDER BY substr(md5('{salt}:' ||
                                CAST({id_col} AS VARCHAR)), 1, 16),
                                {id_col}) AS rn
              FROM {table})
        WHERE rn <= {k}"""


def token_spectrum(docs, text_col: str = "text",
                   num_buckets: int | None = None) -> pd.DataFrame:
    """Token frequency-of-frequencies spectrum → (freq, n_tokens):
    how many distinct tokens occur exactly ``freq`` times corpus-wide.
    The Zipf diagnostic a corpus health report leads with (a bulging
    low-freq tail = OCR noise / boilerplate churn; a depleted hapax
    count = aggressive dedup or template text).

    Per-batch token-count partials ride the same token-bucketed
    exchange as ``topk_tokens``; each bucket folds its exact per-token
    totals into a (freq, n_tokens) histogram, so the driver merges
    only per-bucket spectrum rows — bounded by the number of DISTINCT
    frequency values (Zipf: O(sqrt(total tokens)) in practice), never
    by vocabulary size.  Ordered by freq ASC.
    """

    def count_batch(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in b[text_col]:
            c.update(TOKEN_RE.findall((t or "").lower()))
        return pd.DataFrame({"token": list(c.keys()),
                             "n": np.fromiter(c.values(), np.int64, len(c))})

    partials = docs.map_batches(count_batch, batch_format="pandas")

    def bucket_spectrum(pdf: pd.DataFrame) -> pd.DataFrame:
        totals = pdf.groupby("token", sort=False)["n"].sum()
        spec = totals.value_counts().sort_index()
        return pd.DataFrame({"freq": spec.index.to_numpy(np.int64),
                             "n_tokens": spec.to_numpy(np.int64)})

    spec = bucketed_groupby(partials, "token", bucket_spectrum,
                            num_buckets).to_pandas()
    if spec.empty:
        return pd.DataFrame({"freq": pd.Series([], dtype="int64"),
                             "n_tokens": pd.Series([], dtype="int64")})
    out = spec.groupby("freq", sort=True)["n_tokens"].sum().reset_index()
    return out


def token_spectrum_sql(table: str = "documents") -> str:
    """DuckDB oracle matching ``token_spectrum`` bit-for-bit."""
    return f"""
        SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
              FROM (SELECT unnest(regexp_extract_all(lower(text),
                                  '[a-z0-9]+')) AS token FROM {table})
              GROUP BY token)
        GROUP BY freq ORDER BY freq"""


def collocations(docs, k: int = 50, min_count: int = 5,
                 text_col: str = "text",
                 num_buckets: int | None = None) -> pd.DataFrame:
    """Top-``k`` collocations: adjacent token bigrams ranked by PMI
    (the classic corpus-analysis signal for multi-word expressions —
    "new york" scores high because its joint count dwarfs what its
    parts' frequencies predict).  → pandas (a, b, c_ab, score_e4),
    ordered (score_e4 DESC, a, b) with a deterministic cut at k.

    Exactness: ranking by PMI = log(c_ab·N / (c_a·c_b)) equals
    ranking by the RATIO (log is monotone), so the score is the exact
    integer ``c_ab·N·10⁴ // (c_a·c_b)`` — no float log on either
    side, bit-identical to the SQL oracle.  int64 range bound:
    c_ab·N·10⁴ < 2⁶³ holds through ~10⁹-token corpora; past that,
    switch the score to HUGEINT/object (documented tradeoff).

    Scale shape: per-batch unigram + bigram Counter partials (a doc's
    adjacency never crosses batches, so partials sum exactly), then
    exactly TWO bounded-bucket exchanges — the aggregates and the
    count-attach joins are FUSED: exchange A is keyed by the FIRST
    token, so each bucket finalizes its unigram counts AND its bigram
    counts (cut at ``min_count``) and attaches ``c_a`` in place;
    exchange B re-keys the surviving bigrams by the SECOND token
    alongside the unigram count rows, attaching ``c_b`` and cutting
    per-bucket top-k candidates.  Unigram counts are corpus-
    vocabulary-sized and never broadcast; N folds from per-batch
    scalars on the driver (one row per block)."""
    from .shuffle import bucketed_groupby, pad_frame, typed_empty_if_blank

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized: one C findall per doc, then factorize + bincount
        # for unigrams and a packed (code_a << 32 | code_b) bincount
        # for bigrams — no Python loop over tokens
        tok_lists = [TOKEN_RE.findall((t or "").lower())
                     for t in b[text_col]]
        lens = np.fromiter((len(t) for t in tok_lists), np.int64,
                           len(tok_lists))
        total = int(lens.sum())
        flat = np.asarray([t for tl in tok_lists for t in tl],
                          dtype=object)
        if not total:
            return pd.DataFrame({
                "a": pd.Series([""], dtype=object),
                "b": pd.Series([""], dtype=object),
                "n": pd.Series([0], dtype="int64"),
                "kind": pd.Series([2], dtype="int64")})
        codes, uniq = pd.factorize(flat, sort=False)
        uni_n = np.bincount(codes, minlength=len(uniq))
        # adjacent pairs, masked at document boundaries (empty docs
        # make boundary indices degenerate — clamp to the pair range)
        ends = np.cumsum(lens)
        if total > 1:
            valid = np.ones(total - 1, dtype=bool)
            bidx = ends[:-1] - 1
            bidx = bidx[(bidx >= 0) & (bidx < total - 1)]
            valid[bidx] = False
        else:
            valid = np.zeros(0, dtype=bool)
        left = codes[:-1][valid]
        right = codes[1:][valid]
        packed = (left.astype(np.int64) << 32) | right.astype(np.int64)
        pu, pc_ = np.unique(packed, return_counts=True)
        ua = uniq[(pu >> 32).astype(np.int64)]
        ub = uniq[(pu & 0xFFFFFFFF).astype(np.int64)]
        n_u, n_b = len(uniq), len(pu)
        return pd.DataFrame({
            "a": pd.Series(np.concatenate([uniq, ua, [""]]),
                           dtype=object),
            "b": pd.Series(
                np.concatenate([np.full(n_u, "", dtype=object), ub,
                                [""]]), dtype=object),
            "n": pd.Series(np.concatenate(
                [uni_n, pc_, [total]]).astype("int64"), dtype="int64"),
            "kind": pd.Series(np.concatenate(
                [np.zeros(n_u), np.ones(n_b), [2]]).astype("int64"),
                dtype="int64")})

    parts = docs.map_batches(partials, batch_format="pandas") \
        .materialize()          # feeds three consumers (N, uni, bi)

    n_total = 0
    for p in parts.map_batches(
            lambda d: d.loc[d["kind"] == 2, ["n"]],
            batch_format="pandas").iter_batches(batch_format="pandas"):
        n_total += int(p["n"].sum())
    if n_total == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "c_ab": pd.Series([], dtype="int64"),
                             "score_e4": pd.Series([], dtype="int64")})

    # exchange A: key = FIRST token.  Unigram partials key on their
    # token, bigram partials on `a` — one bucket therefore holds the
    # complete counts for every token it owns AND every bigram
    # starting with one of them, so the c_a attach is a bucket-local
    # merge, not a third exchange.
    A_SCHEMA = {"key": "object", "kind": "int64", "a": "object",
                "b": "object", "n": "int64"}

    def keyed_partials(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d["kind"] != 2]
        g = (d.groupby(["kind", "a", "b"], sort=False)["n"].sum()
             .reset_index())
        g["key"] = g["a"]
        return pad_frame(g[["key", "kind", "a", "b", "n"]], A_SCHEMA)

    B_SCHEMA = {"key": "object", "kind": "int64", "a": "object",
                "b": "object", "c_ab": "int64", "c_a": "int64",
                "c": "int64"}

    def fold_a(p: pd.DataFrame) -> pd.DataFrame:
        uni = (p[p["kind"] == 0].groupby("a", sort=False)["n"].sum()
               .reset_index().rename(columns={"a": "tok", "n": "c"}))
        bi = (p[p["kind"] == 1].groupby(["a", "b"], sort=False)["n"]
              .sum().reset_index().rename(columns={"n": "c_ab"}))
        bi = bi[bi["c_ab"] >= min_count]
        bi = bi.merge(uni.rename(columns={"tok": "a", "c": "c_a"}),
                      on="a", how="inner")
        # re-key bigrams by SECOND token for the c_b attach; forward
        # the bucket's finalized unigram rows keyed by their token
        out = pd.concat([
            pad_frame(bi.assign(key=bi["b"],
                                kind=np.int64(1)), B_SCHEMA),
            pad_frame(uni.assign(key=uni["tok"],
                                 kind=np.int64(0)), B_SCHEMA)],
            ignore_index=True)
        return typed_empty_if_blank(out)

    stage_a = bucketed_groupby(
        parts.map_batches(keyed_partials, batch_format="pandas"),
        "key", fold_a, num_buckets)

    # exchange B: key = SECOND token (unigram rows: their token).
    # Attach c_b and cut per-bucket top-k candidates.
    CAND = {"a": object, "b": object, "c_ab": "int64",
            "score_e4": "int64"}

    def fold_b(p: pd.DataFrame) -> pd.DataFrame:
        bi = p[p["kind"] == 1]
        if bi.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in CAND.items()})
        uni = (p.loc[p["kind"] == 0, ["key", "c"]]
               .rename(columns={"c": "c_b"}))
        d = bi.merge(uni, on="key", how="inner")
        score = (d["c_ab"].to_numpy(np.int64) * np.int64(n_total)
                 * np.int64(10_000)
                 // (d["c_a"].to_numpy(np.int64)
                     * d["c_b"].to_numpy(np.int64)))
        out = pd.DataFrame({"a": d["a"].to_numpy(),
                            "b": d["b"].to_numpy(),
                            "c_ab": d["c_ab"].to_numpy(np.int64),
                            "score_e4": score})
        return (out.sort_values(["score_e4", "a", "b"],
                                ascending=[False, True, True],
                                kind="mergesort").head(k))

    cand = bucketed_groupby(stage_a, "key", fold_b,
                            num_buckets).to_pandas()
    return (cand.sort_values(["score_e4", "a", "b"],
                             ascending=[False, True, True],
                             kind="mergesort")
            .head(k).reset_index(drop=True))


def collocations_sql(table: str = "documents", k: int = 50,
                     min_count: int = 5) -> str:
    """DuckDB oracle matching ``collocations`` bit-for-bit (same
    integer ratio score, same deterministic tie order)."""
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return f"""
        WITH d AS (SELECT {tok} AS toks FROM {table}),
        tot AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n FROM d),
        uni AS (SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS c
                FROM d, LATERAL unnest(toks) AS u(t) GROUP BY t),
        bi AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
               FROM (SELECT unnest(toks[:len(toks) - 1]) AS a,
                            unnest(toks[2:]) AS b
                     FROM d WHERE len(toks) > 1)
               GROUP BY 1, 2 HAVING COUNT(*) >= {min_count})
        SELECT bi.a, bi.b, bi.c_ab,
               CAST(bi.c_ab * tot.n * 10000
                    // (ua.c * ub.c) AS BIGINT) AS score_e4
        FROM bi, tot
        JOIN uni ua ON ua.tok = bi.a
        JOIN uni ub ON ub.tok = bi.b
        ORDER BY score_e4 DESC, bi.a, bi.b LIMIT {k}"""
