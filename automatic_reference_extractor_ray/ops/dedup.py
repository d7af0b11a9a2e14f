"""Deduplication family over ``documents(doc_id, text)``:

  exact          normalized-text hash → hash-partitioned keep-min
  n-gram Jaccard exact token-set Jaccard via prefix-filtered inverted
                 index + exact verification (SQL-checkable)
  MinHash+LSH    shingle → minhash → band buckets → candidates → verify
  SimHash        64-bit fingerprint → 16-bit band buckets → Hamming verify
  embedding      cosine >= tau pairs via broadcast matrix

Scale design: every many-key aggregate (pair dedup/counting, token
document frequencies) goes through ``ops.shuffle.bucketed_*`` — a
bounded-cardinality hash shuffle — never Ray's per-group aggregate.
Shuffled rows are (token, id) / (band, id) / (a, b) pairs, never full
texts.  Candidate verification is the distributed GROUPED pair join
(``grouped_pair_join``): pairs shuffle once by ``bucket(b)``, and each
doc's payload (token set / id / embedding) travels once per
REFERENCING BUCKET — never once per pair, never to the driver.
The only remaining broadcast is ``jaccard_pairs``'s Misra–Gries
heavy-token sketch — capacity-bounded (``df_capacity`` rows), never
vocabulary-sized, and only a candidate-pruning hint (output exactness
never depends on it).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from .shuffle import (bucketed_agg, bucketed_distinct, bucketed_groupby,
                      bucketed_join)

TOKEN_RE = re.compile(r"[a-z0-9]+")
WS_RE = re.compile(r"\s+")

EMPTY_PAIRS = pd.DataFrame({"a": pd.Series([], dtype=object),
                            "b": pd.Series([], dtype=object)})


def _norm(s: str) -> str:
    # null-safe (see textstats._tokens): None text == empty text
    return WS_RE.sub(" ", (s or "").lower()).strip()


def _token_set(s: str) -> list[str]:
    return sorted(set(TOKEN_RE.findall((s or "").lower())))


def _shingle_set(s: str, k: int = 5) -> list[str]:
    """Character k-shingles of the whitespace-normalized lowercase
    text — the literature-standard MinHash unit (Broder 1997) that
    catches char-level edits word tokens miss.  Internal spaces
    become "_" so shingles stay whitespace-free and ride the same
    space-joined verify payload as word tokens."""
    t = " ".join((s or "").lower().split())
    if len(t) < k:
        return [t.replace(" ", "_")] if t else []
    return sorted({t[i:i + k].replace(" ", "_")
                   for i in range(len(t) - k + 1)})


# ----------------------------------------------------------- exact dedup

def add_content_hash(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch[["doc_id", "text"]].copy()
    batch["content_hash"] = batch["text"].map(
        lambda s: hashlib.md5(_norm(s).encode("utf-8")).hexdigest())
    return batch[["doc_id", "content_hash"]]


def exact_dedup(docs):
    """→ (content_hash, keeper_doc_id, n_dups): hash-partition the
    normalized-content hash, keep the minimum doc_id per group (the
    deterministic survivor).  A per-batch (min, count) combiner runs
    BEFORE the bounded-bucket shuffle, so a pathologically duplicated
    document (e.g. millions of empty/identical pages sharing one hash)
    ships at most one partial row per block instead of concentrating
    every (hash, id) pair in a single bucket task."""
    hashed = docs.map_batches(add_content_hash, batch_format="pandas")
    partial = hashed.map_batches(
        lambda b: b.groupby("content_hash", sort=False)["doc_id"]
                   .agg(keeper_doc_id="min", n_dups="size").reset_index(),
        batch_format="pandas")
    return bucketed_agg(partial, "content_hash",
                        {"keeper_doc_id": ("keeper_doc_id", "min"),
                         "n_dups": ("n_dups", "sum")})


def decontaminate_fuzzy(train, eval_docs, tau: float = 0.8,
                        num_buckets: int | None = None,
                        tokenizer: str = "words", shingle_k: int = 5):
    """Fuzzy benchmark decontamination: drop TRAIN documents that are
    NEAR-duplicates of any eval document (``ops/textstats.
    decontaminate`` catches verbatim n-gram overlap; paraphrased or
    lightly-edited benchmark leakage needs the near-dup test —
    Brown et al. 2020 app. C's motivation at the whole-document
    level).  → (doc_id, keep) per TRAIN doc.

    Contract: train and eval ids must be DISJOINT (the natural state
    for a corpus vs a benchmark suite).

    Scale shape: one ``minhash_lsh_pairs`` run over the union (band
    exchange + exact-Jaccard verify, all existing machinery), with the
    benchmark-sized eval CODE set broadcast into the candidate stage
    as a cross-pair prefilter — train–train candidates (the vast
    majority in a self-similar corpus) never reach the verify
    exchange, so verify cost is bounded by actual eval adjacency, not
    corpus self-similarity.  The final train-id classification runs in
    workers against the broadcast eval id set; only the contaminated
    ids (bounded by actual leakage) stream to the driver (if half the
    corpus is contaminated, the broadcast is the least of the
    problems; a salted anti join is the drop-in escape hatch).
    """
    import ray

    # eval_docs is consumed three times below (id collect, band-hash
    # collect, and inside train.union(eval_docs)); pin the (benchmark-
    # sized) pipeline once so an expensive upstream isn't re-executed
    # per consumer.
    eval_docs = eval_docs.materialize()

    eval_ids = set()
    for row in eval_docs.map_batches(
            lambda b: b[["doc_id"]], batch_format="pandas").take_all():
        eval_ids.add(row["doc_id"])

    # candidate-stage prune: codes are raw ids for int corpora, else
    # _doc_code hashes.  Keep any pair with AT LEAST one eval-code
    # member (not exactly-one: a train doc whose code collides with an
    # eval code would make a true cross pair read eval-eval and be
    # dropped — with "either side" a collision can only ADD a
    # candidate, and the id-level classification below discards the
    # extras).  Known recall bound, inherited from the band star cap
    # and documented on minhash_lsh_pairs: inside a >_STAR_CAP clone
    # cluster only hub edges exist, so a train clone whose hub is
    # another TRAIN doc is not flagged unless some band pairs it with
    # an eval doc directly.
    if _doc_key_dtype(train) == "int64":
        ecodes = np.fromiter(eval_ids, np.int64, len(eval_ids))
    else:
        ecodes = np.fromiter((_doc_code(d) for d in eval_ids),
                             np.int64, len(eval_ids))
    ecodes.sort()
    ecref = ray.put(ecodes)

    def cross_only(p: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(ecref)
        a_in = np.isin(p["a"].to_numpy(), ev)
        b_in = np.isin(p["b"].to_numpy(), ev)
        return p[a_in | b_in]

    # band-exchange prune: a (band, hash) group without an eval
    # member can only yield train–train pairs, which cross_only drops
    # anyway — so train signature rows outside the EVAL band-hash set
    # (benchmark-sized: n_eval × 12 int64s, broadcast like the id
    # set) never leave their block.  At corpus scale this shrinks the
    # band all-to-all from O(corpus × bands) to the colliding sliver.
    # the band-hash pass MUST tokenize exactly like minhash_lsh_pairs
    # below, or the prune silently drops every cross pair — derive
    # tok_fn from the same (tokenizer, shingle_k) args we forward.
    tok_fn = (_token_set if tokenizer == "words"
              else (lambda t: _shingle_set(t, shingle_k)))

    def eval_bhs(b: pd.DataFrame) -> pd.DataFrame:
        sigs = batch_minhash_signatures(
            [tok_fn(t) for t in b["text"]])
        return pd.DataFrame({"bh": batch_band_hashes(sigs).reshape(-1)})

    ebh: set = set()
    for part in eval_docs.map_batches(
            eval_bhs, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        ebh.update(part["bh"].tolist())
    ebh_arr = np.fromiter(ebh, np.int64, len(ebh))
    ebh_arr.sort()
    bref = ray.put(ebh_arr)

    def band_keep(df: pd.DataFrame):
        out = df[np.isin(df["band_hash"].to_numpy(), ray.get(bref))]
        if len(out):
            return out
        # typed empty: a 0-row pandas block with the bytes `bhs`
        # object column trips Ray's size estimator (the
        # typed_empty_if_blank rule, but with binary not string)
        import pyarrow as pa
        return pa.table({"band": pa.array([], pa.int64()),
                         "band_hash": pa.array([], pa.int64()),
                         "h": pa.array([], pa.int64()),
                         "bhs": pa.array([], pa.binary())})

    pairs = minhash_lsh_pairs(train.union(eval_docs), tau=tau,
                              tokenizer=tokenizer, shingle_k=shingle_k,
                              cand_filter=cross_only,
                              band_filter=band_keep)

    # classify in workers: ship only contaminated train ids driver-ward
    eref = ray.put(eval_ids)
    dt = _doc_key_dtype(train)

    def cross_train_ids(p: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(eref)
        a_in = p["a"].isin(ev)
        b_in = p["b"].isin(ev)
        bad = pd.concat([p.loc[~a_in & b_in, "a"],
                         p.loc[a_in & ~b_in, "b"]]).drop_duplicates()
        return pd.DataFrame({"doc_id": pd.Series(
            bad.to_numpy(), dtype=object if dt == "object" else dt)})

    contaminated: set = set()
    for b in pairs.map_batches(
            cross_train_ids, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        contaminated.update(b["doc_id"].tolist())
    cref = ray.put(contaminated)

    def verdict(b: pd.DataFrame) -> pd.DataFrame:
        bad = ray.get(cref)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "keep": (~b["doc_id"].isin(bad)).astype("int64")})

    return train.map_batches(verdict, batch_format="pandas")


def merge_corpora(corpora, num_buckets: int | None = None):
    """Priority-ordered corpus union with content dedup — the
    dataset-mixing primitive ("take Wikipedia over CommonCrawl when
    the text is the same"): ``corpora`` is a list of document Datasets
    in DESCENDING priority; for each normalized-content hash the
    surviving row comes from the highest-priority corpus containing
    it (ties within one corpus break by min doc_id).

    → (content_hash, src, keeper_doc_id): one row per distinct
    content, ``src`` = index of the winning corpus.

    Scale shape: exactly ``exact_dedup``'s — each side's batches
    collapse to per-hash (min priority, min id at that priority)
    partials before ONE bounded-bucket aggregate; a hash duplicated
    across every corpus still ships ≤ one partial row per block.
    """
    if not corpora:
        raise ValueError("merge_corpora: need at least one corpus")

    def tag(i):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            h = add_content_hash(b)
            # pack (priority, id) into one sortable pair via a
            # two-level groupby min: first min id within (hash, src),
            # then the bucketed min on the packed key
            g = (h.groupby("content_hash", sort=False)["doc_id"]
                 .min().reset_index())
            g["src"] = np.int64(i)
            return g[["content_hash", "src", "doc_id"]]
        return fn

    tagged = None
    for i, c in enumerate(corpora):
        t = c.map_batches(tag(i), batch_format="pandas")
        tagged = t if tagged is None else tagged.union(t)

    def part(b: pd.DataFrame) -> pd.DataFrame:
        # lexicographic (src, doc_id) min per hash, vectorized: sort
        # then first
        b = b.sort_values(["content_hash", "src", "doc_id"],
                          kind="mergesort")
        return (b.groupby("content_hash", sort=False).first()
                .reset_index())

    pre = tagged.map_batches(part, batch_format="pandas")

    from .shuffle import bucketed_groupby
    out = bucketed_groupby(pre, "content_hash", part, num_buckets)
    return out.map_batches(
        lambda b: b.rename(columns={"doc_id": "keeper_doc_id"}),
        batch_format="pandas")


def incremental_dedup(base, new, num_buckets: int | None = None,
                      base_prehashed: bool = False):
    """Incremental exact dedup — the production shape at 100 TB is not
    re-deduping the whole corpus but landing a NEW increment against an
    existing base: a new doc survives iff its normalized-content hash
    appears in neither the base corpus nor an earlier (min doc_id) doc
    of the same increment.

    → one verdict row per NEW doc: (doc_id, content_hash, keep).

    Scale shape: only (id, hash) pairs move — the base side shrinks to
    DISTINCT hashes through one bounded-bucket shuffle, then one
    hash-bucketed left join co-locates each hash's base flag with all
    its new-increment rows, so the within-increment min and the
    base-membership test both run bucket-locally.  Nothing is
    broadcast; the base corpus is never re-read beyond its hash column.

    ``base_prehashed=True`` takes ``base`` as an existing hash table
    (a ``content_hash`` column, e.g. ``state/hash_index``'s pruned
    read) instead of raw documents.
    """
    from .shuffle import bucketed_distinct, bucketed_join

    key_dtype = _doc_key_dtype(new)
    new_h = new.map_batches(add_content_hash, batch_format="pandas")

    def tag_base(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[["content_hash"]].copy()
        pdf["in_base"] = np.ones(len(pdf), dtype=np.int64)
        return pdf

    base_hashed = base if base_prehashed else base.map_batches(
        add_content_hash, batch_format="pandas")
    base_h = bucketed_distinct(
        base_hashed, "content_hash", num_buckets,
    ).map_batches(tag_base, batch_format="pandas")

    def verdict(m: pd.DataFrame) -> pd.DataFrame:
        if not len(m):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=key_dtype),
                "content_hash": pd.Series([], dtype=object),
                "keep": pd.Series([], dtype="int64")})
        first = m.groupby("content_hash")["doc_id"].transform("min")
        keep = ((m["in_base"] == 0)
                & (m["doc_id"] == first)).astype("int64")
        return m.assign(keep=keep)[["doc_id", "content_hash", "keep"]]

    return bucketed_join(
        new_h, base_h, on="content_hash",
        left_schema={"doc_id": key_dtype, "content_hash": "object"},
        right_schema={"content_hash": "object", "in_base": "int64"},
        num_buckets=num_buckets, post=verdict, how="left")


# -------------------------------------------------- token-set utilities

def _tokenize_ds(docs):
    def tokenize(batch: pd.DataFrame) -> pd.DataFrame:
        toks, ids = [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            ts = _token_set(t)
            toks.extend(ts)
            ids.extend([d] * len(ts))
        return pd.DataFrame({"token": toks, "doc_id": ids})
    return docs.map_batches(tokenize, batch_format="pandas")


def _doc_key_dtype(docs) -> str:
    """Declared join dtype of the doc_id column ("int64" for integer id
    corpora like the sf testdata, else "object") — keys must keep their
    native dtype through the join or padding upcasts them to object and
    downstream sorts/compares diverge."""
    import pyarrow as pa
    sch = docs.schema()                      # ray.data.Schema wrapper
    t = dict(zip(sch.names, sch.types))["doc_id"]
    if isinstance(t, pa.DataType):
        return "int64" if pa.types.is_integer(t) else "object"
    return "int64" if np.issubdtype(np.dtype(t), np.integer) else "object"


KIND_COL = "__kind"
PK_COL = "__pk"       # packed int64 pair arrays (see grouped_pair_join)


def _pairs_frame(lo, hi, dt: str) -> pd.DataFrame:
    d = object if dt == "object" else dt
    return pd.DataFrame({"a": pd.Series(lo, dtype=d),
                         "b": pd.Series(hi, dtype=d)})


def grouped_pair_join(cands, side, key_dtype: str, payload_cols: list[str],
                      verify, num_buckets: int | None = None,
                      dedupe_pairs: bool = False):
    """Join candidate (a, b) pairs against a per-key payload table and
    verify them in-bucket — WITHOUT duplicating payloads per pair.

    ``dedupe_pairs=True`` makes each bucket drop duplicate (a, b) rows
    before verifying.  Every copy of a pair shares its ``b`` and so its
    bucket, so this equals a global pair DISTINCT — callers whose
    candidate generators emit band/table duplicates can skip a whole
    standalone distinct shuffle and ship the (16-byte) duplicates
    straight here instead.

    A naive pairs⋈payload equi-join materializes one payload copy per
    PAIR row (measured: 7.4M minhash candidates x ~200B token strings =
    1.5GB through two sorts).  Instead, three tagged streams meet in ONE
    bucketed shuffle keyed by ``bucket(b)``:

      kind 0  the pairs themselves (key columns only);
      kind 1  for every DISTINCT (a, bucket(b)) combination, one copy of
              a's payload — a key's payload travels at most
              ``num_buckets`` times, never once per pair;
      kind 2  every key's payload at its own bucket (serves the b side).

    ``verify(pairs_pdf, amap, bmap) -> pdf`` then runs per bucket with
    complete payload maps {key: (payload, ...)}.  ``side`` must have
    columns ``["key", *payload_cols]``, one row per key.

    Int-keyed pairs (the scale path — doc codes and int corpora) ship
    PACKED: each candidate block groups its pairs by target bucket and
    emits ONE row per bucket whose ``__pk`` column carries the int64
    (a..., b...) arrays as bytes.  The all-to-all then moves thousands
    of blob rows instead of tens of millions of 1-pair rows — measured
    2x on the minhash verify, whose in-bucket compute is milliseconds
    while Ray's sort paid per-row costs on 28.9M rows.  String-keyed
    pairs keep the row form.
    """
    from .shuffle import (BUCKET_COL, auto_num_buckets, buckets_for_values,
                          canon_series, pad_frame)
    nb = num_buckets or auto_num_buckets()
    kd = key_dtype
    packed = kd == "int64"
    # cands feeds TWO branches (the pair stream and the distinct
    # (a, bucket) routing stream) and side feeds two as well (the
    # a-routing join and the b-side stream); Ray re-executes lazy
    # upstreams per consumer, so pin both once — cands are key-only
    # rows (16B each), side is one payload row per key; both spill
    # cleanly at any scale, and without this the corpus would be read
    # and tokenized/embedded twice
    cands = cands.materialize()
    side = side.materialize()
    schema = {"a": kd, "b": kd, **dict.fromkeys(payload_cols, "object")}

    def canon(s: pd.Series) -> pd.Series:
        return canon_series(s, kd)

    def buckets_of(s: pd.Series) -> np.ndarray:
        return buckets_for_values(s, kd, nb)

    def mk(df: pd.DataFrame, kind: int, bucket: np.ndarray,
           pk: list | None = None) -> pd.DataFrame:
        out = pad_frame(df, schema)
        out[KIND_COL] = np.full(len(df), kind, dtype=np.int8)
        out[BUCKET_COL] = bucket
        # bytes everywhere (b"" default) so the column's object type
        # stays uniform across blocks (see pad_frame's dtype rule)
        out[PK_COL] = pk if pk is not None else [b""] * len(df)
        return out

    def pack_pairs(df: pd.DataFrame) -> pd.DataFrame:
        bk = buckets_of(df["b"])
        if not len(df):
            return mk(df.iloc[:0], 0, bk)
        av = df["a"].to_numpy(np.int64)
        bv = df["b"].to_numpy(np.int64)
        order = np.argsort(bk, kind="stable")
        bks, avs, bvs = bk[order], av[order], bv[order]
        bounds = np.flatnonzero(np.diff(bks)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(bks)]))
        blobs = [avs[s:e].tobytes() + bvs[s:e].tobytes()
                 for s, e in zip(starts, ends)]
        base = pd.DataFrame(index=pd.RangeIndex(len(blobs)))
        return mk(base, 0, bks[starts].astype(np.int64), pk=blobs)

    pairs_t = cands.map_batches(
        pack_pairs if packed else
        (lambda df: mk(df, 0, buckets_of(df["b"]))),
        batch_format="pandas")

    # (a, target-bucket) routing requests: per-batch dedupe shrinks the
    # stream, and the GLOBAL dedupe runs inside the join bucket (post=)
    # instead of a standalone bucketed_distinct — one fewer all-to-all
    # at identical shuffle bytes (the former distinct's input exchange
    # moved exactly these per-batch-distinct rows anyway)
    ab = cands.map_batches(
        lambda df: pd.DataFrame(
            {"a": canon(df["a"]),
             "bb": buckets_of(df["b"])}).drop_duplicates(),
        batch_format="pandas")
    # rename via map_batches: Dataset.rename_columns assumes Arrow
    # blocks and breaks on the pandas blocks this path produces
    side_a = side.map_batches(lambda df: df.rename(columns={"key": "a"}),
                              batch_format="pandas")
    routed = bucketed_join(
        ab, side_a, "a",
        {"a": kd, "bb": "int64"},
        {"a": kd, **dict.fromkeys(payload_cols, "object")}, nb,
        post=lambda m: m.drop_duplicates(subset=["a", "bb"]))
    routed_t = routed.map_batches(
        lambda df: mk(df, 1, df["bb"].to_numpy().astype(np.int64)
                      if len(df) else np.array([], dtype=np.int64)),
        batch_format="pandas")

    def tag_side_b(df: pd.DataFrame) -> pd.DataFrame:
        buckets = buckets_of(df["key"])
        return mk(df.rename(columns={"key": "b"}), 2, buckets)

    side_b_t = side.map_batches(tag_side_b, batch_format="pandas")

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[BUCKET_COL])
        kinds = g[KIND_COL].to_numpy()
        if packed:
            avs, bvs = [], []
            for blob in g.loc[kinds == 0, PK_COL]:
                arr = np.frombuffer(blob, dtype=np.int64)
                half = len(arr) // 2
                avs.append(arr[:half])
                bvs.append(arr[half:])
            pairs = pd.DataFrame({
                "a": np.concatenate(avs) if avs
                else np.array([], dtype=np.int64),
                "b": np.concatenate(bvs) if bvs
                else np.array([], dtype=np.int64)})
        else:
            pairs = g[kinds == 0][["a", "b"]]
        if dedupe_pairs:
            pairs = pairs.drop_duplicates()
        ar = g[kinds == 1]
        br = g[kinds == 2]
        amap = dict(zip(ar["a"].to_numpy(),
                        zip(*(ar[c].to_numpy() for c in payload_cols))))
        bmap = dict(zip(br["b"].to_numpy(),
                        zip(*(br[c].to_numpy() for c in payload_cols))))
        return verify(pairs, amap, bmap)

    from .shuffle import coalesce_blocks
    return (coalesce_blocks(pairs_t.union(routed_t, side_b_t))
            .groupby(BUCKET_COL)
            .map_groups(verify_bucket, batch_format="pandas"))


def _toks_side(docs, coded: bool, tok_fn=_token_set):
    """Per-document payload table for Jaccard verification:
    (key, [doc,] toks) — key is the int64 doc code when ``coded``."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        toks = [" ".join(tok_fn(t)) for t in b["text"]]
        if coded:
            return pd.DataFrame({
                "key": np.fromiter((_doc_code(d) for d in b["doc_id"]),
                                   np.int64, len(b)),
                "doc": b["doc_id"].to_numpy(),
                "toks": toks})
        return pd.DataFrame({"key": b["doc_id"].to_numpy(), "toks": toks})

    return docs.map_batches(fn, batch_format="pandas")


# buckets whose interned token vocabulary fits this many distinct
# tokens verify via packed bitsets (vocab/8 bytes per doc, popcount
# per pair chunk); larger vocabularies use the per-pair set loop
_VERIFY_VEC_VOCAB_CAP = 4096


def _verify_pairs_join(cands, docs, tau: float, coded: bool,
                       num_buckets: int | None = None,
                       dedupe_pairs: bool = False,
                       tok_fn=_token_set):
    """Exact-Jaccard verification of candidate (a, b) pairs via the
    grouped pair join (no driver broadcast, no per-pair payload
    duplication).  Emits (a, b) doc ids, a < b."""
    dt = _doc_key_dtype(docs)
    kd = "int64" if coded else dt
    payload = ["doc", "toks"] if coded else ["toks"]

    def emit(pairs_kept, amap, bmap) -> pd.DataFrame:
        if not coded:
            return _pairs_frame(pairs_kept[:, 0], pairs_kept[:, 1], dt)
        keep_a, keep_b = [], []
        for a, b in pairs_kept:                 # only VERIFIED pairs
            da, db = amap[a][0], bmap[b][0]
            if db < da:
                da, db = db, da
            keep_a.append(da); keep_b.append(db)
        return _pairs_frame(keep_a, keep_b, dt)

    def verify(pairs: pd.DataFrame, amap: dict, bmap: dict) -> pd.DataFrame:
        if not len(pairs):
            return _pairs_frame([], [], dt)
        av = pairs["a"].to_numpy()
        bv = pairs["b"].to_numpy()
        # intern the bucket's payload strings once (each doc's token
        # set travels as one space-joined string; clone docs share it)
        seen: dict[str, int] = {}
        sl: list[str] = []
        for m in (amap, bmap):
            for v in m.values():
                s = v[-1]
                if s not in seen:
                    seen[s] = len(sl)
                    sl.append(s)
        tok_lists = [s.split() for s in sl]
        sizes = np.fromiter((len(t) for t in tok_lists), np.int64, len(sl))
        codes, uniq = pd.factorize(
            np.asarray([t for tl in tok_lists for t in tl], dtype=object),
            sort=False)
        nv = len(uniq)
        if nv == 0:                      # every token set in bucket empty
            return _pairs_frame([], [], dt)
        if nv <= _VERIFY_VEC_VOCAB_CAP:
            # vectorized bitset path: ONE C factorize pass builds the
            # bucket vocabulary (no per-token dict loops), flat fancy
            # indexing sets the bits, and the pair loop is a chunked
            # uint64 AND + SWAR popcount (no table gather per byte).
            # Small-vocab buckets (dedup-heavy web shards, templated
            # corpora) hit this; diverse buckets fall back below.
            rows = np.repeat(np.arange(len(sl), dtype=np.int64), sizes)
            bits = np.zeros((len(sl), nv), dtype=bool)
            bits[rows, codes] = True
            p8 = np.packbits(bits, axis=1)
            pad = (-p8.shape[1]) % 8
            if pad:
                p8 = np.pad(p8, ((0, 0), (0, pad)))
            packed = np.ascontiguousarray(p8).view(np.uint64)
            arow = pd.Series({k: seen[v[-1]] for k, v in amap.items()})
            brow = pd.Series({k: seen[v[-1]] for k, v in bmap.items()})
            ai = arow[av].to_numpy(np.int64)
            bi = brow[bv].to_numpy(np.int64)
            keep = np.zeros(len(av), dtype=bool)
            step = 16384                    # bounds the uint64 AND temp
            for lo in range(0, len(av), step):
                hi = lo + step
                inter = _popcount64(packed[ai[lo:hi]] & packed[bi[lo:hi]]
                                    ).sum(axis=1).astype(np.int64)
                union = sizes[ai[lo:hi]] + sizes[bi[lo:hi]] - inter
                # same float expression as the scalar path: inter/union
                # >= tau (NOT inter >= tau*union, which rounds
                # differently at exact-boundary pairs)
                with np.errstate(divide="ignore", invalid="ignore"):
                    j = np.where(union > 0, inter / union, 0.0)
                keep[lo:hi] = (inter > 0) & (j >= tau)
            return emit(np.stack([av[keep], bv[keep]], axis=1), amap, bmap)

        strs = dict(zip(sl, tok_lists))
        cache: dict[str, frozenset] = {}

        def fs(s: str) -> frozenset:
            v = cache.get(s)
            if v is None:
                v = cache[s] = frozenset(strs.get(s) or s.split())
            return v

        kept = []
        for a, b in zip(av, bv):
            sa, sb = fs(amap[a][-1]), fs(bmap[b][-1])
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= tau:
                kept.append((a, b))
        return emit(np.array(kept).reshape(-1, 2), amap, bmap)

    return grouped_pair_join(cands, _toks_side(docs, coded, tok_fn),
                             kd, payload, verify, num_buckets,
                             dedupe_pairs=dedupe_pairs)


# --------------------------------------------- exact jaccard (prefix filter)

def _heavy_token_df(docs, capacity: int,
                    num_buckets: int | None = None) -> pd.DataFrame:
    """Bounded Misra–Gries document-frequency summary → pandas
    (token, df_lb), ≤ ``capacity`` rows.

    Per-batch exact doc-frequency Counters are MG-reduced to
    ``capacity`` rows (subtract the (capacity+1)-th largest, keep
    positives — the mergeable-summary reduction of Agarwal et al.),
    partials fold through the bounded-bucket sum, each bucket cuts to
    its top ``capacity``, and the driver keeps the global top
    ``capacity`` — O(num_buckets × capacity) driver rows, never
    vocabulary-sized.  Every token whose true df exceeds
    total_tokens/(capacity+1) is guaranteed present."""

    def mg_batch(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in b["text"]:
            c.update(_token_set(t))
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
        return g.head(capacity)

    cand = bucketed_groupby(partials, "token", bucket_sum,
                            num_buckets).to_pandas()
    cand = cand.sort_values(["n", "token"],
                            ascending=[False, True]).head(capacity)
    return cand.rename(columns={"n": "df_lb"}).reset_index(drop=True)


def jaccard_pairs(docs, tau: float = 0.9, df_capacity: int = 1 << 15):
    """Exact token-set Jaccard >= tau — AllPairs/PPJoin-style prefix
    filtering so the inverted index stays sparse:

      1. BOUNDED heavy-token document-frequency sketch (Misra–Gries,
         ≤ ``df_capacity`` rows — NOT the vocabulary): the prefix
         filter is exact under ANY fixed total token order; df order
         only minimizes candidates, so gating the order with the
         heavy hitters gives near-optimal pruning while the broadcast
         stays O(df_capacity) regardless of corpus vocabulary (the
         round-2 version broadcast a token→df map whose size scales
         with the data — removed);
      2. each doc indexes only its PREFIX: the ``|s| - ceil(tau*|s|) + 1``
         rarest tokens under the fixed order (unsketched tokens rank
         rarest, ties by token; two sets with J >= tau must share a
         prefix token under any fixed total order — the classic
         guarantee), each index row carrying |s| for the size filter;
      3. per prefix-token bucket: emit locally-deduped candidate pairs
         that pass the size filter ``|a| >= tau*|b|``;
      4. global pair DISTINCT (bucketed) → exact verification.

    Output: every (a, b), a < b, with exact Jaccard >= tau — equals the
    SQL oracle's answer; the prefix filter only prunes work, and its
    correctness does not depend on the sketch (candidate volume does).
    """
    import ray

    heavy = _heavy_token_df(docs, capacity=df_capacity)
    df_ref = ray.put(dict(zip(heavy["token"], heavy["df_lb"])))

    def prefix_index(batch: pd.DataFrame) -> pd.DataFrame:
        dfm = ray.get(df_ref)
        toks, ids, sizes = [], [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            ts = _token_set(t)
            n = len(ts)
            if not n:
                continue
            plen = n - int(np.ceil(tau * n)) + 1
            # fixed total order: unsketched (rare) tokens first by
            # token string, heavy tokens after by (df_lb, token)
            ts.sort(key=lambda x: (dfm.get(x, 0), x))
            toks.extend(ts[:plen])
            ids.extend([d] * plen)
            sizes.extend([n] * plen)
        return pd.DataFrame({"token": toks, "doc_id": ids, "n": sizes})

    index = docs.map_batches(prefix_index, batch_format="pandas")

    def pairs_of_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in pdf.groupby("token", sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            ns = g["n"].to_numpy()
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), k=1)
            na, nb = ns[ai], ns[bi]
            ok = np.minimum(na, nb) >= tau * np.maximum(na, nb)
            if ok.any():
                outs.append(pd.DataFrame({"a": ids[ai[ok]], "b": ids[bi[ok]]}))
        if not outs:
            return EMPTY_PAIRS
        return pd.concat(outs).drop_duplicates()

    # no standalone pair DISTINCT: different prefix tokens can emit the
    # same pair, but every copy shares bucket(b) in the verify join, so
    # the in-bucket dedupe there is a global distinct for free
    cands = bucketed_groupby(index, "token", pairs_of_bucket)
    return _verify_pairs_join(cands, docs, tau, coded=False,
                              dedupe_pairs=True)


# ------------------------------------------------------------ MinHash LSH

MINHASH_K = 64
LSH_BANDS = 12                    # 12 bands x 5 rows (60 of 64 hashes);
                                  # measured recall of exact-J>=0.9 pairs:
                                  # 16x4=1.0, 12x5=0.9998, 8x8=0.995 —
                                  # 12x5 cuts candidate volume ~1.7x at
                                  # ~zero recall loss on the test corpora
_MERSENNE = (1 << 61) - 1

_rng = np.random.default_rng(0xDECAF)
# a < 2^31 and 32-bit token hashes keep a*x + b < 2^64 (no overflow)
_A = _rng.integers(1, 1 << 31, size=MINHASH_K, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, size=MINHASH_K, dtype=np.uint64)


def _hash32(tokens: list[str] | np.ndarray) -> np.ndarray:
    """Vectorized 32-bit token hash: pandas' C-backed siphash over an
    object array (fixed default hash key → deterministic across
    processes and workers; no PYTHONHASHSEED dependence), masked to 32
    bits so ``_A*h + _B`` stays < 2^64.  Replaces the round-2
    per-token ``hashlib.blake2b`` Python loop — the bench's slowest
    query was spending its time here."""
    if not len(tokens):
        return np.array([], dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(tokens, dtype=object))
    return h & np.uint64(0xFFFFFFFF)


def minhash_signature(tokens: list[str]) -> np.ndarray:
    """k=64 universal-hash minhash of a token set (vectorized: one
    (64, n) uint64 broadcast multiply per doc)."""
    if not len(tokens):
        return np.full(MINHASH_K, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = _hash32(tokens)
    vals = (_A[:, None] * h[None, :] + _B[:, None]) % _MERSENNE
    return vals.min(axis=1)


# batch signature generation bounds its (64, n_tokens) uint64 temp to
# ~50 MB by processing docs in chunks of this many tokens
_SIG_CHUNK_TOKENS = 100_000

_SPLITMIX_A = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_B = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wraps mod 2^64)."""
    x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_A
    x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_B
    return x ^ (x >> np.uint64(31))


def batch_minhash_signatures(token_lists: list[list[str]]) -> np.ndarray:
    """(n_docs, MINHASH_K) signature matrix for a whole batch — ONE
    vectorized hash + broadcast-multiply pass over the batch's
    concatenated tokens, per-doc minima via ``np.minimum.reduceat``
    (no per-doc Python work beyond list concatenation).  Empty docs
    get the all-max signature, matching ``minhash_signature``."""
    n_docs = len(token_lists)
    sigs = np.full((n_docs, MINHASH_K), np.iinfo(np.uint64).max,
                   dtype=np.uint64)
    lens = np.fromiter((len(ts) for ts in token_lists), np.int64, n_docs)
    nz = np.flatnonzero(lens)
    if not len(nz):
        return sigs
    # chunk docs so the (64, chunk_tokens) temp stays bounded
    start = 0
    while start < len(nz):
        end = start
        tok_count = 0
        while end < len(nz) and (tok_count == 0
                                 or tok_count + lens[nz[end]]
                                 <= _SIG_CHUNK_TOKENS):
            tok_count += lens[nz[end]]
            end += 1
        idx = nz[start:end]
        flat: list[str] = []
        for i in idx:
            flat.extend(token_lists[i])
        h = _hash32(np.array(flat, dtype=object))
        vals = (_A[:, None] * h[None, :] + _B[:, None]) % _MERSENNE
        offs = np.zeros(len(idx), dtype=np.int64)
        np.cumsum(lens[idx[:-1]], out=offs[1:])
        sigs[idx] = np.minimum.reduceat(vals, offs, axis=1).T
        start = end
    return sigs


def batch_band_hashes(sigs: np.ndarray) -> np.ndarray:
    """(n_docs, LSH_BANDS) non-negative int64 band hashes — a
    vectorized uint64 polynomial over each band's rows with a
    splitmix64 finalizer (replaces the round-2 per-doc/per-band
    ``blake2b(chunk.tobytes())`` Python loop).  The band index is
    mixed into the seed, and the (band, band_hash) pair is the
    bucket key downstream, so cross-band collisions are harmless."""
    rows_per_band = MINHASH_K // LSH_BANDS
    cube = sigs[:, :LSH_BANDS * rows_per_band].reshape(
        -1, LSH_BANDS, rows_per_band)
    acc = _mix64(np.arange(1, LSH_BANDS + 1, dtype=np.uint64)
                 )[None, :] * np.ones((len(sigs), 1), dtype=np.uint64)
    for r in range(rows_per_band):
        acc = _mix64(acc ^ cube[:, :, r])
    return (acc >> np.uint64(1)).astype(np.int64)


def _doc_code(doc_id: str) -> int:
    """Stable 63-bit integer code for a doc_id — candidate pairs travel
    the shuffle as two int64 columns instead of two strings (6-8x less
    data + numpy dedup).  Collision odds are ~n^2/2^63; at 10^12 docs
    switch to a 128-bit code (two columns) — flagged here."""
    return int.from_bytes(
        hashlib.blake2b(str(doc_id).encode("utf-8"), digest_size=8).digest(),
        "little") >> 1


_STAR_CAP = 4096   # LSH groups past this size emit star edges only


def _int_pairs_of_groups(pdf: pd.DataFrame, group_keys: list[str],
                         star_cap: int | None = _STAR_CAP,
                         band_col: str | None = None,
                         allband_col: str | None = None) -> pd.DataFrame:
    """Per group: sorted unique int codes → upper-triangle pairs.

    Groups larger than ``star_cap`` (a pathological clone cluster — a
    million copies of one page share every band signature) emit STAR
    edges to the group's min code instead of all pairs: candidate
    volume drops from O(c²) to O(c) while every member still connects
    to the cluster for components/removal, and exact verification
    still gates each emitted edge.  Ordinary groups (every real corpus
    bucket measured: ≤ hundreds) are unaffected.  Pass
    ``star_cap=None`` when large groups are NOT clone clusters (the
    embedding-LSH signature partitions) — star edges there would gut
    recall; fix the group size at the signature level instead.

    ``band_col``/``allband_col`` switch on EXACT cross-band candidate
    dedup at generation time: each row's ``allband_col`` carries the
    doc's FULL per-band hash vector packed as little-endian int64
    bytes, and a pair found in the group of band k is emitted only if
    no earlier band j < k also collides — that band's group already
    emitted it.  Each candidate then crosses the verify exchange once
    instead of once per matching band (measured 3.7x fewer pair rows
    on the sf corpus), at the cost of one tiny bytes column on the
    (n_docs × n_bands)-row signature exchange.  Star-capped groups
    skip the filter (their star edges stay ≤ n_bands-duplicated, and
    the in-bucket pair DISTINCT downstream absorbs them): an earlier
    band's group holding the same pair may itself have been capped and
    emitted star edges instead of the pair, so "collided earlier"
    would not imply "emitted earlier" there.  One recall nuance vs the
    un-deduped form: a non-min pair of a CAPPED band-j group that also
    collides in a small band-k group is now dropped at band k —
    connectivity survives via band j's star edges (the components /
    removal consumers are unaffected); standalone-pair recall inside
    oversized clone clusters was already the documented cap tradeoff.
    """
    dedup_bands = band_col is not None and allband_col is not None
    outs_a, outs_b = [], []
    for _, g in pdf.groupby(group_keys, sort=False):
        if not dedup_bands:
            ids = np.unique(g["h"].to_numpy())
            if len(ids) < 2:
                continue
            if star_cap is not None and len(ids) > star_cap:
                outs_a.append(np.full(len(ids) - 1, ids[0], dtype=ids.dtype))
                outs_b.append(ids[1:])
                continue
            ai, bi = np.triu_indices(len(ids), k=1)
            outs_a.append(ids[ai]); outs_b.append(ids[bi])
            continue
        u = g.drop_duplicates(subset=["h"])
        hv = u["h"].to_numpy()
        if len(hv) < 2:
            continue
        order = np.argsort(hv, kind="stable")
        ids = hv[order]
        if star_cap is not None and len(ids) > star_cap:
            outs_a.append(np.full(len(ids) - 1, ids[0], dtype=ids.dtype))
            outs_b.append(ids[1:])
            continue
        k = int(u[band_col].iloc[0])
        ai, bi = np.triu_indices(len(ids), k=1)
        if k > 0:
            blobs = u[allband_col].to_numpy()[order]
            M = np.frombuffer(b"".join(blobs),
                              dtype=np.int64).reshape(len(ids), -1)
            keep = np.ones(len(ai), dtype=bool)
            for j in range(k):
                colj = M[:, j]
                np.logical_and(keep, colj[ai] != colj[bi], out=keep)
            ai, bi = ai[keep], bi[keep]
        outs_a.append(ids[ai]); outs_b.append(ids[bi])
    if not outs_a:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pd.DataFrame({"a": np.concatenate(outs_a),
                         "b": np.concatenate(outs_b)}).drop_duplicates()


def minhash_lsh_pairs(docs, tau: float = 0.9, cand_filter=None,
                      tokenizer: str = "words", shingle_k: int = 5,
                      band_filter=None):
    """MinHash+LSH near-dup pairs, verified with exact Jaccard:

      signature per doc (map_batches) → (band, band_hash, doc-code)
      int rows → per-band-bucket candidate pairs (numpy triu over
      unique codes) → global pair DISTINCT (bucketed shuffle over two
      int64 columns) → exact-Jaccard verification.

    Int-keyed corpora (the sf testdata) use the raw doc_id AS the code
    — no hash indirection, no decode payload in the verify join.

    Returns verified pairs (a, b) as doc ids.  Recall is the banding
    curve's — candidates missed by every band are lost, so this is
    rows-only checked (compared against ``jaccard_pairs`` in tests,
    not an SQL oracle).  Additionally, a band group past ``_STAR_CAP``
    members emits star edges only (see ``_int_pairs_of_groups``):
    standalone-PAIR recall between two non-min members of such a group
    relies on another band catching them — mitigated in practice by
    the 63-bit band hash making oversized groups near-clone sets, and
    immaterial for the components/removal consumers, which only need
    connectivity.

    ``cand_filter`` (optional, ``pd.DataFrame -> pd.DataFrame`` over
    int64 candidate columns (a, b) — doc CODES for string corpora, raw
    ids for int ones) prunes candidates BEFORE the verify exchange;
    callers who only care about a subset of pairs (e.g. cross-corpus
    contamination) use it to keep in-corpus candidate volume off the
    all-to-all entirely.

    ``tokenizer="shingles"`` switches the MinHash unit from word
    tokens to character ``shingle_k``-grams (Broder's original unit):
    char-level edits cost ~k shingles out of hundreds instead of a
    whole token out of tens, so typo'd near-clones that word tokens
    miss still pair.  Signatures AND the exact-Jaccard verify use the
    same unit.

    ``band_filter`` (optional, pandas map over the (band, band_hash,
    h, bhs) signature rows) prunes rows BEFORE the band exchange —
    the strongest lever a subset-seeking caller has: a group can only
    emit pairs among its surviving rows, so e.g. keeping only rows
    whose band_hash collides with a broadcast benchmark-side hash set
    shrinks the all-to-all from O(corpus × bands) to the colliding
    sliver.  Dropping rows can only REMOVE candidate pairs; callers
    must ensure the pairs they care about keep both members.
    """
    raw_int_ids = _doc_key_dtype(docs) == "int64"
    tok_fn = (_token_set if tokenizer == "words"
              else (lambda t: _shingle_set(t, shingle_k)))

    def signatures(batch: pd.DataFrame) -> pd.DataFrame:
        token_lists = [tok_fn(t) for t in batch["text"]]
        sigs = batch_minhash_signatures(token_lists)     # (n, 64)
        bh = batch_band_hashes(sigs)                     # (n, B)
        if raw_int_ids:
            codes = batch["doc_id"].to_numpy(np.int64)
        else:
            codes = np.fromiter((_doc_code(d) for d in batch["doc_id"]),
                                np.int64, len(batch))
        # each row also carries the doc's FULL band-hash vector (96
        # bytes) so the pair generator can emit a pair from only its
        # FIRST matching band — exact cross-band dedup at the source
        blobs = np.empty(len(batch), dtype=object)
        blobs[:] = [bh[i].tobytes() for i in range(len(batch))]
        return pd.DataFrame({
            "band": np.tile(np.arange(LSH_BANDS, dtype=np.int64),
                            len(batch)),
            "band_hash": bh.reshape(-1),
            "h": np.repeat(codes, LSH_BANDS),
            "bhs": np.repeat(blobs, LSH_BANDS)})

    bands = docs.map_batches(signatures, batch_format="pandas")
    if band_filter is not None:
        bands = bands.map_batches(band_filter, batch_format="pandas")
    # pairs leave their FIRST matching band only (see
    # _int_pairs_of_groups band_col/allband_col) — the verify exchange
    # moves each candidate once, not once per matching band; the
    # in-bucket pair DISTINCT remains to absorb star-edge duplicates
    cands = bucketed_groupby(
        bands, ["band", "band_hash"],
        lambda p: _int_pairs_of_groups(p, ["band", "band_hash"],
                                       band_col="band",
                                       allband_col="bhs"))
    if cand_filter is not None:
        cands = cands.map_batches(cand_filter, batch_format="pandas")
    # raw int ids: keys ARE doc ids → the non-coded verifier (token
    # payload only, pairs emitted as-is); else verify + decode via the
    # doc payload riding the coded join
    return _verify_pairs_join(cands, docs, tau, coded=not raw_int_ids,
                              dedupe_pairs=True, tok_fn=tok_fn)


# --------------------------------------------------------------- SimHash

def simhash64(tokens: list[str]) -> int:
    if not len(tokens):
        return 0
    h = _hash64_full(tokens)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int.from_bytes(
        np.packbits((v > 0).astype(np.uint8), bitorder="little").tobytes(),
        "little")


def _hash64_full(tokens: list[str] | np.ndarray) -> np.ndarray:
    """Vectorized full-64-bit token hash (see ``_hash32``)."""
    if not len(tokens):
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object))


_SWAR_M1 = np.uint64(0x5555555555555555)
_SWAR_M2 = np.uint64(0x3333333333333333)
_SWAR_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_SWAR_H = np.uint64(0x0101010101010101)


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 words — ~3.5x the uint8
    lookup-table gather (no table gathers, 6 arithmetic kernels)."""
    v = v - ((v >> np.uint64(1)) & _SWAR_M1)
    v = (v & _SWAR_M2) + ((v >> np.uint64(2)) & _SWAR_M2)
    v = (v + (v >> np.uint64(4))) & _SWAR_M4
    return (v * _SWAR_H) >> np.uint64(56)


def _hamming64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XORed 64-bit fingerprints."""
    return _popcount64(x.astype(np.uint64, copy=False)).astype(np.int64)


def _earlier_chunk_match(sa: np.ndarray, sb: np.ndarray,
                         band: int) -> np.ndarray:
    """True where two uint64 fingerprints share ANY 16-bit chunk below
    ``band`` — i.e. the pair already co-grouped (and emitted) in an
    earlier band's (band, chunk) group."""
    m = np.zeros(len(sa), dtype=bool)
    mask = np.uint64(0xFFFF)
    for j in range(band):
        sh = np.uint64(16 * j)
        m |= ((sa >> sh) & mask) == ((sb >> sh) & mask)
    return m


def _simhash_pairs_of_bucket(pdf: pd.DataFrame, max_hamming: int,
                             star_cap: int = _STAR_CAP) -> pd.DataFrame:
    """Hamming-verified candidate pairs for one hash bucket of
    (band, chunk, simhash, h) rows — module-level so the clone-aware
    cap below is unit-testable with synthetic fingerprints.

    Cross-band dedup is EXACT and needs no extra state: two docs share
    a band-j group iff chunk j of their fingerprints is equal, and the
    fingerprints already ride every row — so a band-k group emits a
    pair only when no chunk below k matches (``_earlier_chunk_match``),
    and identical-fingerprint pairs (all four chunks equal) emit at
    band 0 only.  Output rows are therefore globally DISTINCT and the
    caller needs no standalone pair-distinct shuffle.

    Groups past ``star_cap`` apply a CLONE-AWARE cap: each identical-
    fingerprint set collapses to intra-set star edges on its min id
    (those pairs are Hamming-0 clones by construction), while the full
    banding comparison still runs across every DISTINCT fingerprint via
    one min-id representative per set — an oversized bucket of
    unrelated docs loses no near-dup recall.  Only > ``star_cap``
    DISTINCT fingerprints in one group degrades to a verified star
    over representatives (and then a rep pair absorbed into an earlier
    band's star keeps connectivity through that star rather than
    re-emitting — the documented cap tradeoff)."""
    outs_a, outs_b = [], []
    for _, g in pdf.groupby(["band", "chunk"], sort=False):
        g = g.drop_duplicates("h").sort_values("h")
        ids = g["h"].to_numpy()
        if len(ids) < 2:
            continue
        band = int(g["band"].iloc[0])
        shs = g["simhash"].to_numpy().view(np.uint64)
        if len(ids) > star_cap:
            uniq_sh, inv = np.unique(shs, return_inverse=True)
            order = np.argsort(inv, kind="stable")
            first = order[np.unique(inv[order], return_index=True)[1]]
            if band == 0:
                # identical fps co-group in EVERY band: band 0 owns
                # their intra-set star edges
                rep_of = ids[first][inv]     # min id of own fp set
                m = ids != rep_of
                if m.any():
                    outs_a.append(rep_of[m]); outs_b.append(ids[m])
            reps, rep_shs = ids[first], uniq_sh
            ro = np.argsort(reps)
            reps, rep_shs = reps[ro], rep_shs[ro]
            if len(reps) < 2:
                continue
            if len(reps) > star_cap:
                ai = np.zeros(len(reps) - 1, dtype=np.intp)
                bi = np.arange(1, len(reps), dtype=np.intp)
            else:
                ai, bi = np.triu_indices(len(reps), k=1)
            keep = _hamming64(rep_shs[ai] ^ rep_shs[bi]) <= max_hamming
            if band > 0:
                keep &= ~_earlier_chunk_match(rep_shs[ai], rep_shs[bi],
                                              band)
            if keep.any():
                outs_a.append(reps[ai[keep]])
                outs_b.append(reps[bi[keep]])
            continue
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = _hamming64(shs[ai] ^ shs[bi]) <= max_hamming
        if band > 0:
            keep &= ~_earlier_chunk_match(shs[ai], shs[bi], band)
        if keep.any():
            outs_a.append(ids[ai[keep]]); outs_b.append(ids[bi[keep]])
    if not outs_a:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pd.DataFrame({"a": np.concatenate(outs_a),
                         "b": np.concatenate(outs_b)}).drop_duplicates()


def simhash_pairs(docs, max_hamming: int = 8):
    """SimHash near-dup: 64-bit fingerprints, banded into 4 x 16-bit
    chunks (pigeonhole: the 4-band scheme guarantees recall for
    hamming <= 3; wider radii may miss spread bit-flips — banding
    parameters are explicit).  Exact Hamming verified per candidate;
    each pair is emitted from its FIRST matching band only (the
    fingerprint on every row makes earlier-band collision computable
    in-bucket), so the output is distinct WITHOUT a standalone
    pair-DISTINCT all-to-all.

    Buckets larger than ``_STAR_CAP`` collapse each IDENTICAL
    fingerprint set to its min-id representative (intra-set edges
    become a star — those pairs are Hamming-0 clones) while the
    banding comparison still runs over every DISTINCT fingerprint, so
    the hamming<=3 guarantee holds at representative granularity: a
    non-rep clone connects to cross-set matches through its rep, which
    is what components/removal consume.  Only a bucket with more than
    ``_STAR_CAP`` *distinct* fingerprints (16-bit chunks collide freely
    past ~270M docs, i.e. > 10^9-doc corpora) degrades to a verified
    star over representatives.

    Int-keyed corpora skip the id-decode join entirely: pairs travel
    and emit as the raw int64 doc ids (sorted, so a < b holds)."""
    raw_int_ids = _doc_key_dtype(docs) == "int64"

    def sigs(batch: pd.DataFrame) -> pd.DataFrame:
        bands, chunks, shs, codes = [], [], [], []
        for d, t in zip(batch["doc_id"], batch["text"]):
            sh = simhash64(_token_set(t))
            code = int(d) if raw_int_ids else _doc_code(d)
            for band in range(4):
                bands.append(band)
                chunks.append((sh >> (16 * band)) & 0xFFFF)
                shs.append(sh)
                codes.append(code)
        return pd.DataFrame({"band": np.array(bands, np.int64),
                             "chunk": np.array(chunks, np.int64),
                             "simhash": np.array(shs, np.uint64).view(np.int64),
                             "h": np.array(codes, np.int64)})

    bands = docs.map_batches(sigs, batch_format="pandas")

    def pairs_of_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        return _simhash_pairs_of_bucket(pdf, max_hamming)

    # pair rows are globally distinct by construction (each pair leaves
    # its FIRST matching band only — _earlier_chunk_match), so the
    # former standalone pair-DISTINCT all-to-all is gone
    cands = bucketed_groupby(bands, ["band", "chunk"], pairs_of_bucket)
    if raw_int_ids:
        return cands
    return _decode_pairs_join(cands, docs)


def _decode_pairs_join(cands, docs, num_buckets: int | None = None):
    """Translate int-coded (a, b) pairs back to doc ids via the grouped
    pair join on the (code, doc_id) table — no driver-side corpus map;
    emits doc-id pairs ordered a < b."""
    dt = _doc_key_dtype(docs)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": np.fromiter((_doc_code(d) for d in b["doc_id"]),
                               np.int64, len(b)),
            "doc": b["doc_id"].to_numpy()})

    ids = docs.map_batches(fn, batch_format="pandas")

    def decode(pairs: pd.DataFrame, amap: dict, bmap: dict) -> pd.DataFrame:
        lo, hi = [], []
        for a, b in zip(pairs["a"].to_numpy(), pairs["b"].to_numpy()):
            da, db = amap[a][0], bmap[b][0]
            if db < da:
                da, db = db, da
            lo.append(da); hi.append(db)
        return _pairs_frame(lo, hi, dt)

    return grouped_pair_join(cands, ids, "int64", ["doc"], decode,
                             num_buckets)


# ----------------------------------------------------- embedding near-dup

def embedding_dup_pairs(embeddings, tau: float = 0.4):
    """Cosine >= tau pairs over an embedding column: the full normalized
    matrix is broadcast once (ray.put) and every block computes its
    rows x all via one float64 matmul.  O(n^2) work, O(n*d) broadcast —
    the brute-force ORACLE baseline; ``embedding_dup_pairs_lsh`` below
    is the bucketed scale path."""
    import ray

    mat_df = embeddings.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = mat_df["vec_id"].to_numpy()
    m = np.stack(mat_df["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, m))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_m = ray.get(ref)
        bm = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        bm /= np.linalg.norm(bm, axis=1, keepdims=True)
        cos = bm @ all_m.T
        bi = batch["vec_id"].to_numpy()
        rows = []
        for i in range(len(bi)):
            hits = np.flatnonzero(cos[i] >= tau)
            for j in hits:
                if bi[i] < all_ids[j]:
                    rows.append((int(bi[i]), int(all_ids[j])))
        return pd.DataFrame(rows, columns=["a", "b"]) if rows else \
            pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64")})

    return embeddings.map_batches(block, batch_format="pandas")


EMB_LSH_TABLES = 16
EMB_LSH_PLANES = 3
EMB_LSH_TARGET_GROUP = 512
# collision prob of one table at cos=0.4 (θ≈66°): (1-θ/π)^3 ≈ 0.25 →
# 16 tables: 1-(1-.25)^16 ≈ 0.99 theoretical recall at the threshold;
# tighter (higher-cos) pairs collide more often.  Measured recall on
# the synthetic embeddings: 12 tables → 0.94, 16 → asserted ≥ 0.95 in
# tests — table count is the recall/cost dial.

_emb_plane_cache: dict = {}


def _emb_planes(table: int, dim: int, planes: int) -> np.ndarray:
    key = (table, dim, planes)
    if key not in _emb_plane_cache:
        rng = np.random.default_rng(0xE1B000 + table)
        _emb_plane_cache[key] = rng.standard_normal((planes, dim))
    return _emb_plane_cache[key]


EMB_LSH_MAX_TABLES = 48    # default-call ceiling; see emb_lsh_params


def emb_lsh_params(n_vectors: int, tau: float,
                   target_recall: float = 0.95,
                   max_tables: int | None = EMB_LSH_MAX_TABLES
                   ) -> tuple[int, int]:
    """(n_planes, n_tables) for sign-random-projection LSH sized to the
    corpus: planes grow log2(n / target_group) so a signature group
    stays ~EMB_LSH_TARGET_GROUP vectors (the per-group pair work is
    quadratic in group size — a fixed 3-plane signature partitions any
    corpus into just 8 groups and degenerates to all-pairs); tables
    then restore ``target_recall`` at the ``tau`` collision probability
    p = (1 - θ/π)^planes, T = ln(1-recall)/ln(1-p).  Floors match the
    small-corpus defaults (3 planes / 16 tables) so test-scale behavior
    is unchanged.

    Honest cost note: at LOW tau and web-scale n the required T
    explodes — hyperplane LSH is an expensive regime there.  A default
    call therefore CAPS tables at ``max_tables`` (signature-row volume
    is linear in T) and logs the achieved theoretical recall, pointing
    at ``semantic_dedup`` (k-means partitioning) for the low-tau
    regime; pass ``max_tables=None`` (or explicit ``n_tables``) to opt
    into the uncapped sweep."""
    import math
    planes = max(EMB_LSH_PLANES,
                 math.ceil(math.log2(max(n_vectors, 1)
                                     / EMB_LSH_TARGET_GROUP))
                 if n_vectors > EMB_LSH_TARGET_GROUP else EMB_LSH_PLANES)
    p = (1.0 - math.acos(max(min(tau, 1.0), -1.0)) / math.pi) ** planes
    if p >= 1.0:
        return planes, EMB_LSH_TABLES
    tables = max(EMB_LSH_TABLES,
                 math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p)))
    if max_tables is not None and tables > max_tables:
        import logging
        achieved = 1.0 - (1.0 - p) ** max_tables
        logging.getLogger(__name__).warning(
            "emb_lsh_params: tau=%.2f over %d vectors wants %d hash "
            "tables for %.2f recall; capping at %d (theoretical recall "
            "%.2f). Low-tau near-dup over a large corpus is cheaper via "
            "semantic_dedup (k-means partitioning), or pass an explicit "
            "n_tables / max_tables=None to uncap.",
            tau, n_vectors, tables, target_recall, max_tables, achieved)
        tables = max_tables
    return planes, tables


def embedding_dup_pairs_lsh(embeddings, tau: float = 0.4,
                            n_tables: int | None = None,
                            n_planes: int | None = None,
                            num_buckets: int | None = None,
                            n_vectors: int | None = None):
    """Bucketed embedding near-dup — the partitioned path the
    brute-force matmul can't take:

      1. sign-random-projection signatures, ``n_tables`` independent
         ``n_planes``-plane tables per vector (one matmul per block;
         planes are regenerated deterministically per (table, dim,
         planes) in every task — nothing broadcast).  Defaults come
         from ``emb_lsh_params``: planes scale log2(n) so signature
         groups stay ~EMB_LSH_TARGET_GROUP vectors (fixed 3-plane
         signatures would partition ANY corpus into 8 groups and
         degenerate to all-pairs), tables restore ≥0.95 theoretical
         recall at ``tau``;
      2. per (table, signature) bucket: numpy upper-triangle candidate
         pairs of the bucket's vec_ids (int64 only through the
         shuffle; NO star cap — these groups are random partitions,
         not clone clusters, so group size is controlled by the plane
         count instead);
      3. global pair DISTINCT (bounded-bucket shuffle);
      4. exact-cosine verification via the grouped pair join — vectors
         travel once per referencing bucket (never per pair, never to
         the driver), same shape as the token-set verifiers above.

    Recall < 1 by design (pairs missed by every table are lost) —
    rows-only checked; recall vs ``embedding_dup_pairs`` measured in
    tests.  Precision is 1 (exact verification)."""
    if n_planes is None or n_tables is None:
        # pass n_vectors when the caller already knows the corpus size —
        # saves the auto-param count() pass over the dataset
        ap, at = emb_lsh_params(
            n_vectors if n_vectors is not None else embeddings.count(), tau)
        n_planes = n_planes if n_planes is not None else ap
        n_tables = n_tables if n_tables is not None else at

    def sigs(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        ids = b["vec_id"].astype("int64").to_numpy()
        tables, ss, hh = [], [], []
        sig_mat = np.empty((len(ids), n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = (m @ _emb_planes(t, m.shape[1], n_planes).T) > 0
            sig = (bits * (1 << np.arange(n_planes, dtype=np.int64))
                   ).sum(axis=1)
            sig_mat[:, t] = sig
            tables.append(np.full(len(ids), t, dtype=np.int64))
            ss.append(sig.astype(np.int64))
            hh.append(ids)
        # full per-table signature vector rides each row so the pair
        # generator emits a pair from its FIRST matching table only
        blobs = np.empty(len(ids), dtype=object)
        blobs[:] = [sig_mat[i].tobytes() for i in range(len(ids))]
        return pd.DataFrame({"table": np.concatenate(tables),
                             "sig": np.concatenate(ss),
                             "h": np.concatenate(hh),
                             "tbs": np.tile(blobs, n_tables)})

    bands = embeddings.map_batches(sigs, batch_format="pandas")
    # pairs leave their first matching table only (exact cross-table
    # dedup at generation — see _int_pairs_of_groups); the in-bucket
    # DISTINCT in the verify join stays as a no-op safety net
    cands = bucketed_groupby(
        bands, ["table", "sig"],
        lambda p: _int_pairs_of_groups(p, ["table", "sig"], star_cap=None,
                                       band_col="table",
                                       allband_col="tbs"),
        num_buckets)

    # embeddings travel the pair join as float32 BYTES blobs: a column
    # of raw ndarrays flips between pandas object dtype and Ray's
    # tensor-extension dtype across blocks (a real schema divergence
    # the executor warns on every bundle about); bytes stay uniformly
    # object-typed and pack tighter through the exchange
    def emb_side(b: pd.DataFrame) -> pd.DataFrame:
        blobs = np.empty(len(b), dtype=object)
        blobs[:] = [np.asarray(e, dtype=np.float32).tobytes()
                    for e in b["embedding"].to_numpy()]
        return pd.DataFrame({"key": b["vec_id"].astype("int64").to_numpy(),
                             "emb": blobs})

    side = embeddings.map_batches(emb_side, batch_format="pandas")

    def verify(pairs: pd.DataFrame, amap: dict, bmap: dict) -> pd.DataFrame:
        if not len(pairs):
            return _pairs_frame([], [], "int64")
        av = pairs["a"].to_numpy()
        bv = pairs["b"].to_numpy()
        ea = np.frombuffer(b"".join(amap[a][0] for a in av), np.float32
                           ).reshape(len(av), -1).astype(np.float64)
        eb = np.frombuffer(b"".join(bmap[b][0] for b in bv), np.float32
                           ).reshape(len(bv), -1).astype(np.float64)
        ea /= np.linalg.norm(ea, axis=1, keepdims=True)
        eb /= np.linalg.norm(eb, axis=1, keepdims=True)
        keep = np.einsum("ij,ij->i", ea, eb) >= tau
        return _pairs_frame(av[keep], bv[keep], "int64")

    return grouped_pair_join(cands, side, "int64", ["emb"], verify,
                             num_buckets, dedupe_pairs=True)


# ------------------------------------------------- dedup components

def dedup_components(docs, pairs, max_rounds: int = 25):
    """Connected components of the near-dup pair graph → per-doc
    cluster assignment and survivor flag:

        (doc_id, component_id, is_keeper)

    ``component_id`` is the smallest doc id reachable through the pair
    graph (singletons are their own component); ``is_keeper`` marks the
    one row per component a dedup job retains.

    Distributed min-label propagation, TWO flat bucketed shuffles per
    round (never nested joins — Ray pipelines built on a prior round's
    many-small-block output degrade superlinearly when the round graph
    deepens; measured 19s → 151s round-over-round with a join-based
    round, flat rounds stay constant):

      1. labels + both edge directions co-shuffle by the SOURCE node;
         each bucket emits (target, source_label) messages plus the
         label rows themselves;
      2. messages + old labels co-shuffle by the TARGET node; each
         bucket folds min and flags whether the label changed.

    The loop stops when no label changed (a cheap flag-sum over the
    materialized round output).  Rounds = graph diameter; near-dup
    components are dense cliques in practice, converging in 2-3 rounds
    — pointer jumping is the long-chain optimization if a corpus ever
    needs it.  Labels are materialized per round (one small row per
    doc — spillable at any scale).
    """
    from .shuffle import (BUCKET_COL, auto_num_buckets, buckets_for_values,
                          canon_series)
    dt = _doc_key_dtype(docs)
    nb = auto_num_buckets()

    def canon(s: pd.Series) -> pd.Series:
        return canon_series(s, dt)

    def buckets_of(s: pd.Series) -> np.ndarray:
        return buckets_for_values(s, dt, nb)

    def tagged(key, other, kind: int, changed=None) -> pd.DataFrame:
        n = len(key)
        out = pd.DataFrame({
            "key": canon(key), "other": canon(other),
            KIND_COL: np.full(n, kind, dtype=np.int8)})
        out["changed"] = (np.zeros(n, dtype=bool) if changed is None
                          else np.asarray(changed, dtype=bool))
        out[BUCKET_COL] = buckets_of(out["key"])
        return out

    def ids_frame(b: pd.DataFrame) -> pd.DataFrame:
        # kind 0 label row: key=node, other=label
        return tagged(b["doc_id"], b["doc_id"], 0)

    labels = docs.map_batches(ids_frame, batch_format="pandas").materialize()

    def edge_frames(b: pd.DataFrame) -> pd.DataFrame:
        # kind 1 edge rows, both directions: key=source, other=target
        return pd.concat([tagged(b["a"], b["b"], 1),
                          tagged(b["b"], b["a"], 1)], ignore_index=True)

    # Bounded block counts are load-bearing here: map_groups emits one
    # block per INPUT block, so without coalescing each round's labels
    # inherit round_in's block count (labels + edges) and grow by
    # |edges blocks| per round — measured 320→576→832→1088 blocks with
    # round time 13→32→67→113 s (the sort's driver overhead is
    # quadratic in block count).  Coalesce both the edge stream once
    # and the label output every round to ~2 blocks/core.
    try:
        import ray as _ray
        _cpus = int(_ray.cluster_resources().get("CPU", 0)) or 16
    except Exception:                                      # noqa: BLE001
        _cpus = 16
    base_blocks = 2 * _cpus

    edges = (pairs.map_batches(edge_frames, batch_format="pandas")
             .repartition(base_blocks, shuffle=False).materialize())

    def emit_messages(pdf: pd.DataFrame) -> pd.DataFrame:
        kinds = pdf[KIND_COL].to_numpy()
        lab = pdf[kinds == 0]
        edg = pdf[kinds == 1]
        lmap = dict(zip(lab["key"], lab["other"]))
        # pass the label rows through unchanged; edges become messages
        # (target, source_label) tagged kind 2
        msgs = tagged(edg["other"],
                      edg["key"].map(lmap), 2) if len(edg) else None
        out = [lab]
        if msgs is not None:
            out.append(msgs)
        return pd.concat(out, ignore_index=True)

    def fold_min(pdf: pd.DataFrame) -> pd.DataFrame:
        kinds = pdf[KIND_COL].to_numpy()
        old = pdf[kinds == 0]
        new = pdf.groupby("key", sort=False)["other"].min()
        old_map = dict(zip(old["key"], old["other"]))
        keys = new.index
        changed = np.fromiter((old_map[k] != v for k, v in new.items()),
                              dtype=bool, count=len(new))
        return tagged(pd.Series(list(keys)), pd.Series(new.to_numpy()),
                      0, changed=changed)

    import os
    import time as _time
    dbg = os.environ.get("ARX_DEBUG_COMPONENTS") == "1"
    converged = False
    for rnd in range(max_rounds):
        t0 = _time.perf_counter()
        round_in = labels.union(edges)
        msgs = (round_in.groupby(BUCKET_COL)
                .map_groups(lambda g: emit_messages(g), batch_format="pandas"))
        new_labels = (msgs.groupby(BUCKET_COL)
                      .map_groups(lambda g: fold_min(g),
                                  batch_format="pandas")
                      .repartition(base_blocks, shuffle=False)).materialize()
        n_changed = new_labels.map_batches(
            lambda df: pd.DataFrame(
                {"n": [int(df["changed"].sum())]}),
            batch_format="pandas").sum("n")
        labels = new_labels
        if dbg:
            print(f"[components] round {rnd}: "
                  f"{_time.perf_counter() - t0:.2f}s "
                  f"label_blocks={labels.num_blocks()} "
                  f"changed={int(n_changed)}", flush=True)
        if not n_changed:
            converged = True
            break
    if not converged:
        # unconverged labels look valid but split components — refuse
        # to return them (a chain-shaped graph with diameter >
        # max_rounds needs more rounds, or pointer jumping)
        raise RuntimeError(
            f"dedup_components did not converge in {max_rounds} rounds; "
            "the pair graph has a longer path than expected — raise "
            "max_rounds")

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        # the converged label IS the component's min id, so the keeper
        # test is a pure per-row map — no extra shuffle
        return pd.DataFrame({"doc_id": pdf["key"],
                             "component_id": pdf["other"],
                             "is_keeper": pdf["key"] == pdf["other"]})

    return labels.map_batches(finalize, batch_format="pandas")


# ------------------------------------------------- near-dup removal

def dedup_corpus(docs, pairs=None, tau: float = 0.9,
                 num_buckets: int | None = None):
    """Near-duplicate REMOVAL — the composed flagship curation job
    ("drop every near-duplicate document, keep one per cluster"):
    pair generation → connected components → keep each component's
    min-id member → semi-join survivors back to the full doc rows.

    ``pairs`` defaults to the exact prefix-filtered Jaccard pairs at
    ``tau`` (SQL-checkable end-to-end); pass any (a, b) pair Dataset —
    ``minhash_lsh_pairs`` for the cheap candidate path, ``simhash_pairs``,
    ``embedding_dup_pairs_lsh`` — to swap the similarity stage without
    touching the removal machinery.

    → the surviving ``documents`` rows (doc_id, text).

    Scale shape: composition of scale-shaped parts — bucketed pair
    generation, two flat bucketed shuffles per component round, and
    one hash-bucketed semi join; nothing driver-side at any stage.
    """
    if pairs is None:
        pairs = jaccard_pairs(docs, tau=tau)
    dt = _doc_key_dtype(docs)
    comp = dedup_components(docs, pairs)
    keepers = comp.map_batches(
        lambda d: d.loc[d["is_keeper"], ["doc_id"]],
        batch_format="pandas")
    return bucketed_join(
        docs, keepers, on="doc_id",
        left_schema={"doc_id": dt, "text": "object"},
        right_schema={"doc_id": dt},
        num_buckets=num_buckets, how="semi")


def dup_cluster_sizes(docs, pairs=None, tau: float = 0.9,
                      num_buckets: int | None = None) -> pd.DataFrame:
    """Cluster-size histogram of the near-dup graph — the dedup AUDIT
    view ("how much of the corpus is clones, and in what shapes"):
    → pandas (cluster_size, n_clusters), ascending by size.
    cluster_size 1 counts the singletons; the tail is the clone
    clusters a removal job will collapse.

    ``pairs`` defaults to exact Jaccard at ``tau`` (the SQL-checkable
    path); pass any (a, b) pair Dataset to audit a different
    similarity stage.

    Scale shape: components (two flat bucketed shuffles per round) →
    per-component sizes via per-batch partials + ONE bounded-bucket
    sum → size histogram via a second partial+bucketed sum; only the
    (distinct-size, count) rows — at most O(√pairs) of them — reach
    the driver."""
    from .shuffle import bucketed_agg

    if pairs is None:
        pairs = jaccard_pairs(docs, tau=tau)
    comp = dedup_components(docs, pairs)
    size_partials = comp.map_batches(
        lambda d: d.groupby("component_id", sort=False)
        .size().reset_index(name="n"),
        batch_format="pandas")
    per_comp = bucketed_agg(size_partials, "component_id",
                            {"n": ("n", "sum")}, num_buckets)
    hist_partials = per_comp.map_batches(
        lambda d: d.groupby("n", sort=False)
        .size().reset_index(name="n_clusters")
        .rename(columns={"n": "cluster_size"}),
        batch_format="pandas")
    hist = bucketed_agg(hist_partials, "cluster_size",
                        {"n_clusters": ("n_clusters", "sum")},
                        num_buckets).to_pandas()
    hist["cluster_size"] = hist["cluster_size"].astype("int64")
    hist["n_clusters"] = hist["n_clusters"].astype("int64")
    return (hist.sort_values("cluster_size")
            .reset_index(drop=True))


def dedup_corpus_keep_best(docs, pairs=None, tau: float = 0.9,
                           num_buckets: int | None = None):
    """Near-duplicate removal keeping the BEST copy per cluster, not
    the min-id one: among each connected component of the near-dup
    graph the survivor is the document with the most characters
    (ties → smallest doc_id).  Web crawls hold the same page as a
    full capture and several truncated ones — a curation job wants
    the longest copy, and "min id" picks arbitrarily.

    Same machinery as ``dedup_corpus`` (pair generation → connected
    components) with an argmax stage in place of the min-id keeper:

    - per-batch (doc_id, n_chars) partials join the component labels
      through one bucketed hash join on doc_id;
    - one bucketed groupby on component_id runs the per-component
      argmax (a component's rows land whole in one bucket);
    - survivors semi-join back to the full doc rows.

    → the surviving ``documents`` rows (doc_id, text).
    """
    from .shuffle import bucketed_groupby, bucketed_join

    if pairs is None:
        pairs = jaccard_pairs(docs, tau=tau)
    dt = _doc_key_dtype(docs)
    comp = dedup_components(docs, pairs)

    lengths = docs.map_batches(
        lambda d: pd.DataFrame({
            "doc_id": d["doc_id"],
            "n_chars": d["text"].fillna("").str.len().astype("int64")}),
        batch_format="pandas")
    labeled = bucketed_join(
        lengths,
        comp.map_batches(lambda d: d[["doc_id", "component_id"]],
                         batch_format="pandas"),
        on="doc_id",
        left_schema={"doc_id": dt, "n_chars": "int64"},
        right_schema={"doc_id": dt, "component_id": dt},
        num_buckets=num_buckets, how="inner")

    def argmax(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["component_id", "n_chars", "doc_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return (pdf.groupby("component_id", sort=False).head(1)
                [["doc_id"]].reset_index(drop=True))

    best = bucketed_groupby(labeled, "component_id", argmax, num_buckets)
    return bucketed_join(
        docs, best, on="doc_id",
        left_schema={"doc_id": dt, "text": "object"},
        right_schema={"doc_id": dt},
        num_buckets=num_buckets, how="semi")


# ------------------------------------------------- semantic dedup

def semantic_dedup(embeddings, k: int = 8, n_iter: int = 10,
                   tau: float = 0.95, num_buckets: int | None = None,
                   chunk: int = 2048):
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means partitions the embedding space, then
    each cluster prunes its own near-duplicates — a vector survives
    only if no already-kept cluster member has cosine >= ``tau``
    (greedy scan in ascending vec_id, so the lowest id of every
    mutually-similar set is the keeper).

    → (vec_id, cluster, is_keeper) — one row per input vector.

    Scale shape: the Lloyd fit folds fixed-size per-block partials
    (``analytics.kmeans_fit``); assignment is a stateless map with the
    k x d centroid matrix broadcast once via ``ray.put``; the
    quadratic prune runs per CLUSTER inside one hash bucket of one
    bounded shuffle keyed by cluster id — vectors ship exactly once
    and all-pairs work never crosses cluster lines.  The prune
    computes CHUNK-row cosine tiles against the kept set, never the
    full c x c cluster matrix, so a skewed cluster costs O(CHUNK * c)
    tile memory (float32) while FLOPs stay the SemDeDup quadratic.
    ``k`` remains the cluster-size dial for compute (pick
    k ~ N / target_cluster_size).  Deterministic: greedy order is
    global-id order,
    independent of row/block arrival.  No SQL oracle (iterative
    k-means) — rows-only gate + exact local-reference pytest.
    """
    import ray

    from .analytics import kmeans_fit

    cents = kmeans_fit(embeddings, k, n_iter)
    ref = ray.put(cents)

    def assign(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        c = ray.get(_ref)
        m = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.DataFrame({
            "vec_id": b["vec_id"].astype("int64").to_numpy(),
            "cluster": d2.argmin(axis=1).astype(np.int64),
            "embedding": b["embedding"].to_numpy()})

    assigned = embeddings.map_batches(assign, batch_format="pandas")

    CHUNK = chunk  # prune works on CHUNK x (kept + CHUNK) cosine tiles,
    # never the c x c cluster matrix — a skewed 50k-row cluster costs
    # ~CHUNK*c*4 bytes (float32) instead of c*c*8; output is
    # tile-size invariant (tested)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for ci, g in pdf.groupby("cluster", sort=False):
            ids = g["vec_id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            m = np.stack(g["embedding"].to_numpy()).astype(np.float32)[order]
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            m /= nrm
            n = len(ids)
            kept = np.zeros(n, dtype=bool)
            for s in range(0, n, CHUNK):
                e = min(s + CHUNK, n)
                chunk = m[s:e]
                prior = m[:s][kept[:s]]           # already-kept rows
                vs_prior = (chunk @ prior.T) if len(prior) else None
                within = chunk @ chunk.T
                for i in range(e - s):
                    dup = (vs_prior is not None
                           and bool((vs_prior[i] >= tau).any()))
                    if not dup:
                        local = kept[s:s + i]
                        dup = bool((within[i, :i][local] >= tau).any())
                    kept[s + i] = not dup
            outs.append(pd.DataFrame({
                "vec_id": ids,
                "cluster": np.full(n, ci, dtype=np.int64),
                "is_keeper": kept}))
        if not outs:
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype="int64"),
                "cluster": pd.Series([], dtype="int64"),
                "is_keeper": pd.Series([], dtype=bool)})
        return pd.concat(outs, ignore_index=True)

    return bucketed_groupby(assigned, "cluster", prune, num_buckets)
