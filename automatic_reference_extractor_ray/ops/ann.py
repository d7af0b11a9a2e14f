"""Approximate-nearest-neighbor search over an embedding column.

``brute_force_topk`` is the exact baseline: broadcast the (small) query
matrix with ``ray.put``, each block computes one float64 matmul against
its rows and emits per-block partial top-k; a single tiny
``groupby(query_id)`` merges the partials.  Shuffle volume is
O(n_queries * k * n_blocks) rows — never the embeddings.

``lsh_topk`` is the bucketed scale path: random-hyperplane signatures
partition vectors into buckets; each query probes only buckets within
``probe_hamming`` of its own signature.  Candidate generation is a
bucket equi-join (groupby), the final ranking identical to brute force
— recall < 1 by design (checked against the brute-force baseline, not
an SQL oracle).

``ivf_topk`` prunes candidates by inverted lists; ``pq_topk`` is the
MEMORY scale path — product-quantized codes + ADC table scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _rows_for_ids(embeddings, ids: list[int]) -> pd.DataFrame:
    vs = pa.array(ids, pa.int64())
    return (embeddings
            .map_batches(lambda t: t.filter(pc.is_in(t["vec_id"], value_set=vs)),
                         batch_format="pyarrow")
            .select_columns(["vec_id", "embedding"]).to_pandas())


def _query_matrix(embeddings, query_ids: list[int]):
    """(qids, normalized query matrix) in ``query_ids`` order — the
    shared prologue of every op in this module."""
    qdf = _rows_for_ids(embeddings, query_ids)
    qdf = qdf.set_index("vec_id").loc[list(query_ids)].reset_index()
    return (qdf["vec_id"].to_numpy(),
            _normalize(np.stack(qdf["embedding"].to_numpy())))


def _merge_topk(k: int):
    """Per-query merge of block-partial candidates — ONE definition of
    the (cos DESC, neighbor_id ASC) tie-break contract for all four
    ops (it must match the SQL oracle's ORDER BY exactly)."""
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"],
                          ascending=[False, True]).head(k).reset_index(drop=True)
        return pd.DataFrame({"query_id": g["query_id"],
                             "rank": np.arange(1, len(g) + 1, dtype="int64"),
                             "neighbor_id": g["neighbor_id"]})
    return merge


def _train_sample(embeddings, min_rows: int) -> np.ndarray:
    """Deterministic bounded training sample (vec_id order, no RNG in
    the scan) shared by the IVF and PQ fits."""
    sample = (embeddings.select_columns(["vec_id", "embedding"])
              .limit(min_rows).to_pandas())
    return _normalize(np.stack(sample["embedding"].to_numpy()))


def brute_force_topk(embeddings, query_ids: list[int], k: int = 10):
    """→ (query_id, rank, neighbor_id): exact cosine top-k, ties broken
    by ascending neighbor_id; the query vectors themselves are excluded.
    Integer output only — oracle-safe."""
    import ray

    qids, q = _query_matrix(embeddings, query_ids)
    qref = ray.put((qids, q))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, q_ = ray.get(qref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        ids = batch["vec_id"].to_numpy()
        cos = m @ q_.T                       # (rows, nq)
        rows = []
        for j, qid in enumerate(qids_):
            mask = ids != qid
            c = cos[mask, j]; cids = ids[mask]
            # tie-break (cos DESC, neighbor_id ASC) BEFORE truncating the
            # block-local top-k — a cosine tie at the k boundary must keep
            # the smaller id, matching the oracle's ORDER BY
            top = np.lexsort((cids, -c))[:k]
            for t in top:
                rows.append((int(qid), float(c[t]), int(cids[t])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"])

    partials = embeddings.map_batches(partial_topk, batch_format="pandas")
    return partials.groupby("query_id").map_groups(_merge_topk(k),
                                                   batch_format="pandas")


def ivf_fit(embeddings, n_lists: int = 16,
            train_iters: int = 5) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer on the bounded
    sample → (n_lists, dim) unit centroids (shared by IVF and IVF-PQ)."""
    x = _train_sample(embeddings, max(2048, 64 * n_lists))
    rng = np.random.default_rng(0xF00D)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(train_iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) or 1.0)
    return cent


def _probe_map(q: np.ndarray, cent: np.ndarray,
               n_probe: int) -> dict[int, list[int]]:
    """list_id -> indices of the queries probing it."""
    probe_lists = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    probes: dict[int, list[int]] = {}
    for qi in range(len(q)):
        for li in probe_lists[qi]:
            probes.setdefault(int(li), []).append(qi)
    return probes


def ivf_topk(embeddings, query_ids: list[int], k: int = 10,
             n_lists: int = 16, n_probe: int = 4, train_iters: int = 5):
    """IVF (inverted-file) ANN — the bucketed scale path:

      1. train: sample vectors to the driver, run a few deterministic
         k-means rounds → ``n_lists`` centroids (at 10^12 scale the
         sample is a ``ds.limit`` over a shuffled read; centroids stay
         tiny either way);
      2. broadcast centroids; every block assigns its rows to their
         nearest centroid (one matmul) and scores only the queries
         probing that list (each query probes its ``n_probe`` nearest
         centroids);
      3. merge per-block partial top-k per query (tiny groupby).

    Recall < 1 by design (vectors outside probed lists are unseen) —
    rows-only checked, recall measured against brute force in tests.
    """
    import ray

    qids, q = _query_matrix(embeddings, query_ids)
    cent = ivf_fit(embeddings, n_lists=n_lists, train_iters=train_iters)
    probes = _probe_map(q, cent, n_probe)
    ref = ray.put((qids, q, cent, probes))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, q_, cent_, probes_ = ray.get(ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        ids = batch["vec_id"].to_numpy()
        assign = (m @ cent_.T).argmax(axis=1)
        rows = []
        for li in np.unique(assign):
            members = np.flatnonzero(assign == li)
            for qi in probes_.get(int(li), ()):
                c = m[members] @ q_[qi]
                mids = ids[members]
                mask = mids != qids_[qi]
                cc, mm = c[mask], mids[mask]
                top = np.lexsort((mm, -cc))[:k]
                for t in top:
                    rows.append((int(qids_[qi]), float(cc[t]), int(mm[t])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"]) \
            if rows else pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                       "cos": pd.Series([], dtype="float64"),
                                       "neighbor_id": pd.Series([], dtype="int64")})

    partials = embeddings.map_batches(partial, batch_format="pandas")
    return partials.groupby("query_id").map_groups(_merge_topk(k),
                                                   batch_format="pandas")


def pq_topk(embeddings, query_ids: list[int], k: int = 10,
            m_sub: int = 16, n_codes: int = 64, train_iters: int = 8):
    """Product-quantization ANN (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011) — the MEMORY scale path
    next to IVF/LSH: every vector compresses to ``m_sub`` uint8 codes
    (e.g. 64 float32 dims -> 8 bytes, 32x), so a trillion-vector index
    fits where raw vectors cannot.

      1. train: the same bounded deterministic sample as ``ivf_topk``;
         per-subspace k-means gives ``m_sub`` codebooks of ``n_codes``
         centroids (a few KiB total, broadcast once);
      2. score: each block encodes its rows (one argmax matmul per
         subspace) and ranks queries by the classic ADC table lookup —
         per query the m_sub x n_codes inner-product table is computed
         once, a row's approximate cosine is the sum of its codes'
         table entries (pure numpy gathers, no per-row loop);
      3. merge per-block partial top-k per query (tiny groupby).

    Approximate by quantization (no candidate pruning: every row is
    scored, recall loss comes only from code granularity) — rows-only
    checked, recall measured against brute force in tests; ``m_sub``
    and ``n_codes`` are the memory/recall dials (measured recall@10 on
    the 64-dim synthetic embeddings: 0.41 at 8x32, 0.64 at the 16x64
    default = 16x compression, 0.84 at 32x64 = 8x).

    This is the one-shot convenience over the real surface —
    ``pq_fit`` / ``pq_encode`` / ``pq_search``: at scale you encode
    ONCE, persist the code Dataset, and amortize every later query
    batch over gather-only searches; a single ``pq_topk`` call pays
    the encode itself and is therefore NOT cheaper than brute force.
    """
    model = pq_fit(embeddings, m_sub=m_sub, n_codes=n_codes,
                   train_iters=train_iters)
    codes = pq_encode(embeddings, model)
    qids, q = _query_matrix(embeddings, query_ids)
    return pq_search(codes, model, qids, q, k=k)


def pq_fit(embeddings, m_sub: int = 16, n_codes: int = 64,
           train_iters: int = 8) -> dict:
    """Train PQ codebooks on the bounded deterministic sample →
    ``{"bounds", "books"}`` (a few KiB, broadcastable)."""
    x = _train_sample(embeddings, max(2048, 32 * n_codes))
    dim = x.shape[1]
    bounds = np.linspace(0, dim, m_sub + 1).astype(int)
    rng = np.random.default_rng(0xC0DE)
    books = []
    for s in range(m_sub):
        xs = x[:, bounds[s]:bounds[s + 1]]
        cb = xs[rng.choice(len(xs), size=min(n_codes, len(xs)),
                           replace=False)]
        for _ in range(train_iters):
            # nearest centroid by L2 on the subvector (the PQ metric)
            d = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(cb.shape[0]):
                msk = assign == c
                if msk.any():
                    cb[c] = xs[msk].mean(axis=0)
        books.append(cb)
    return {"bounds": bounds, "books": books}


def pq_encode(embeddings, model: dict):
    """Encode every vector ONCE → Dataset (vec_id, code) where ``code``
    is ``m_sub`` uint8s as a bytes value — the stored index artifact
    (8-32x smaller than the vectors).  This is the pass that realizes
    PQ's memory win: searches consume the codes, never the vectors."""
    import ray

    ref = ray.put((model["bounds"], model["books"]))

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        bounds, books = ray.get(ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        codes = np.empty((len(m), len(books)), dtype=np.uint8)
        for s, cb in enumerate(books):
            xs = m[:, bounds[s]:bounds[s + 1]]
            d = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d.argmin(axis=1)
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(),
                             "code": [c.tobytes() for c in codes]})

    return embeddings.map_batches(encode, batch_format="pandas")


def pq_search(codes, model: dict, qids: np.ndarray, q: np.ndarray,
              k: int = 10):
    """ADC search over an encoded Dataset: per query the
    m_sub x n_codes inner-product table is computed once, a row's
    approximate cosine is the sum of its codes' table entries — pure
    numpy gathers over the uint8 codes, the vectors never load."""
    import ray

    m_sub = len(model["books"])
    # tables[s] is (n_codes, nq)
    tables = [cb @ q[:, model["bounds"][s]:model["bounds"][s + 1]].T
              for s, cb in enumerate(model["books"])]
    ref = ray.put((qids, tables))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, tables_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        cm = np.frombuffer(b"".join(batch["code"]),
                           dtype=np.uint8).reshape(len(ids), m_sub)
        scores = np.zeros((len(ids), len(qids_)))
        for s in range(m_sub):
            scores += tables_[s][cm[:, s], :]
        rows = []
        for j, qid in enumerate(qids_):
            mask = ids != qid
            c = scores[mask, j]; cids = ids[mask]
            top = np.lexsort((cids, -c))[:k]
            for t in top:
                rows.append((int(qid), float(c[t]), int(cids[t])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"])

    partials = codes.map_batches(partial, batch_format="pandas")
    return partials.groupby("query_id").map_groups(_merge_topk(k),
                                                   batch_format="pandas")


def ivfpq_encode(embeddings, cent: np.ndarray, pq_model: dict):
    """Encode once for IVF-PQ → Dataset (vec_id, list_id, code): the
    coarse list assignment plus the PQ byte code — together the full
    stored index (the trillion-vector layout: codes partitioned by
    list, vectors never reloaded)."""
    import ray

    ref = ray.put((cent, pq_model["bounds"], pq_model["books"]))

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        cent_, bounds, books = ray.get(ref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        lists = (m @ cent_.T).argmax(axis=1).astype(np.int64)
        codes = np.empty((len(m), len(books)), dtype=np.uint8)
        for s, cb in enumerate(books):
            xs = m[:, bounds[s]:bounds[s + 1]]
            d = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d.argmin(axis=1)
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(),
                             "list_id": lists,
                             "code": [c.tobytes() for c in codes]})

    return embeddings.map_batches(encode, batch_format="pandas")


def ivfpq_search(encoded, cent: np.ndarray, pq_model: dict,
                 qids: np.ndarray, q: np.ndarray, k: int = 10,
                 n_probe: int = 4):
    """IVF-PQ search (the standard billion+-vector recipe, Jégou et
    al. 2011 §V): the coarse quantizer prunes to each query's
    ``n_probe`` lists, ADC tables score ONLY those lists' byte codes —
    compute per query drops from O(N) to O(N * n_probe / n_lists)
    gathers, on an index 8-32x smaller than the vectors."""
    import ray

    m_sub = len(pq_model["books"])
    probes = _probe_map(q, cent, n_probe)
    tables = [cb @ q[:, pq_model["bounds"][s]:pq_model["bounds"][s + 1]].T
              for s, cb in enumerate(pq_model["books"])]
    ref = ray.put((qids, probes, tables))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, probes_, tables_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        lists = batch["list_id"].to_numpy()
        cm = np.frombuffer(b"".join(batch["code"]),
                           dtype=np.uint8).reshape(len(ids), m_sub)
        rows = []
        for li in np.unique(lists):
            qis = probes_.get(int(li), ())
            if not qis:
                continue
            members = np.flatnonzero(lists == li)
            sub = cm[members]
            scores = np.zeros((len(members), len(qis)))
            for s in range(m_sub):
                scores += tables_[s][sub[:, s], :][:, qis]
            mids = ids[members]
            for j, qi in enumerate(qis):
                mask = mids != qids_[qi]
                c = scores[mask, j]; cids = mids[mask]
                top = np.lexsort((cids, -c))[:k]
                for t in top:
                    rows.append((int(qids_[qi]), float(c[t]), int(cids[t])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"]) \
            if rows else pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                       "cos": pd.Series([], dtype="float64"),
                                       "neighbor_id": pd.Series([], dtype="int64")})

    partials = encoded.map_batches(partial, batch_format="pandas")
    return partials.groupby("query_id").map_groups(_merge_topk(k),
                                                   batch_format="pandas")


def ivfpq_topk(embeddings, query_ids: list[int], k: int = 10,
               n_lists: int = 16, n_probe: int = 4, m_sub: int = 16,
               n_codes: int = 64):
    """One-shot IVF-PQ convenience (fit + encode + search in one call;
    like ``pq_topk``, persist the ``ivfpq_encode`` output to amortize
    at scale).  Recall compounds both approximations (list pruning x
    code granularity) — rows-only checked, recall-tested."""
    cent = ivf_fit(embeddings, n_lists=n_lists)
    pq = pq_fit(embeddings, m_sub=m_sub, n_codes=n_codes)
    encoded = ivfpq_encode(embeddings, cent, pq)
    qids, q = _query_matrix(embeddings, query_ids)
    return ivfpq_search(encoded, cent, pq, qids, q, k=k, n_probe=n_probe)


def rerank_topk(embeddings, query_ids: list[int], k: int = 10,
                overfetch: int = 4, n_lists: int = 16, n_probe: int = 4,
                m_sub: int = 16, n_codes: int = 64):
    """Two-stage retrieval (the production ANN recipe, Jégou et al.
    2011 §V-D): an IVF-PQ shortlist of ``k * overfetch`` candidates per
    query, re-ranked by EXACT cosine over the ORIGINAL vectors of the
    shortlist only.  The rerank pass removes the quantization error of
    the byte codes, so recall at fixed ``n_probe`` rises toward the
    IVF ceiling (list pruning is the only loss left); ``overfetch`` is
    the quality dial.

    Scale shape: the shortlist is ≤ n_queries × k × overfetch ids —
    broadcast once with the query matrix; the rerank is one streaming
    filtered scan of the embeddings (candidate rows score one matmul
    per probing query, non-candidates are skipped), then the standard
    per-query merge.  With ``n_probe = n_lists`` and
    ``k * overfetch >= n_vectors`` the output equals
    ``brute_force_topk`` exactly (the property the test pins).

    Approximate below that regime — rows-only checked, recall-tested
    against brute force next to its single-stage siblings.
    """
    import ray

    cent = ivf_fit(embeddings, n_lists=n_lists)
    pq = pq_fit(embeddings, m_sub=m_sub, n_codes=n_codes)
    encoded = ivfpq_encode(embeddings, cent, pq)
    qids, q = _query_matrix(embeddings, query_ids)
    short = ivfpq_search(encoded, cent, pq, qids, q,
                         k=k * overfetch, n_probe=n_probe).to_pandas()

    # per-query candidate id arrays (sorted for np.isin) + the union
    cand = {int(qid): np.sort(g["neighbor_id"].to_numpy(np.int64))
            for qid, g in short.groupby("query_id")}
    union = (np.unique(short["neighbor_id"].to_numpy(np.int64))
             if len(short) else np.array([], dtype=np.int64))
    ref = ray.put((qids, q, cand, union))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, q_, cand_, union_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        member = np.isin(ids, union_)
        if not member.any():
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64"),
                                 "neighbor_id": pd.Series([], dtype="int64")})
        m = _normalize(np.stack(batch["embedding"].to_numpy()[member]))
        mids = ids[member]
        cos = m @ q_.T                                 # (cands, nq)
        rows = []
        for j, qid in enumerate(qids_):
            sel = np.isin(mids, cand_.get(int(qid), _EMPTY_IDS))
            sel &= mids != qid
            c = cos[sel, j]; cids = mids[sel]
            top = np.lexsort((cids, -c))[:k]
            for t in top:
                rows.append((int(qid), float(c[t]), int(cids[t])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"]) \
            if rows else pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                       "cos": pd.Series([], dtype="float64"),
                                       "neighbor_id": pd.Series([], dtype="int64")})

    partials = embeddings.map_batches(partial, batch_format="pandas")
    return partials.groupby("query_id").map_groups(_merge_topk(k),
                                                   batch_format="pandas")


_EMPTY_IDS = np.array([], dtype=np.int64)


N_PLANES = 8


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(0x5EED)
    return rng.standard_normal((N_PLANES, dim))


def _signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64)


def lsh_topk(embeddings, query_ids: list[int], k: int = 10,
             probe_hamming: int = 3):
    """Bucketed ANN: sign-random-projection signatures; probe buckets
    within ``probe_hamming`` bits of the query signature (measured
    recall vs brute force on the synthetic embeddings: 0.28 @ 2 bits,
    0.56 @ 3, 0.81 @ 4 — multi-probe radius is the recall/cost dial)."""
    import ray

    qids, q = _query_matrix(embeddings, query_ids)
    planes = _planes(q.shape[1])
    qsig = _signature(q, planes)
    # bucket → list of probing queries
    probe: dict[int, list[int]] = {}
    for b in range(1 << N_PLANES):
        for qi, s in enumerate(qsig):
            if bin(b ^ int(s)).count("1") <= probe_hamming:
                probe.setdefault(b, []).append(qi)
    qref = ray.put((qids, q, planes, probe))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, q_, planes_, probe_ = ray.get(qref)
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        ids = batch["vec_id"].to_numpy()
        sig = _signature(m, planes_)
        rows = []
        for b in np.unique(sig):
            members = np.flatnonzero(sig == b)
            for qi in probe_.get(int(b), ()):
                c = m[members] @ q_[qi]
                mids = ids[members]
                mask = mids != qids_[qi]
                cc, mm = c[mask], mids[mask]
                top = np.lexsort((mm, -cc))[:k]
                for t in top:
                    rows.append((int(qids_[qi]), float(cc[t]), int(mm[t])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"])

    partials = embeddings.map_batches(partial, batch_format="pandas")
    return partials.groupby("query_id").map_groups(_merge_topk(k),
                                                   batch_format="pandas")
