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


def brute_force_topk(embeddings, query_ids: list[int], k: int = 10):
    """→ (query_id, rank, neighbor_id): exact cosine top-k, ties broken
    by ascending neighbor_id; the query vectors themselves are excluded.
    Integer output only — oracle-safe."""
    import ray
    from ray.data import from_pandas

    qdf = _rows_for_ids(embeddings, query_ids)
    qdf = qdf.set_index("vec_id").loc[list(query_ids)].reset_index()
    q = _normalize(np.stack(qdf["embedding"].to_numpy()))
    qids = qdf["vec_id"].to_numpy()
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
            top = np.argsort(-c, kind="stable")[:k]
            for t in top:
                rows.append((int(qid), float(c[t]), int(cids[t])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"])

    partials = embeddings.map_batches(partial_topk, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({"query_id": g["query_id"],
                             "rank": np.arange(1, len(g) + 1, dtype="int64"),
                             "neighbor_id": g["neighbor_id"]})

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


N_PLANES = 8


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(0x5EED)
    return rng.standard_normal((N_PLANES, dim))


def _signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64)


def lsh_topk(embeddings, query_ids: list[int], k: int = 10,
             probe_hamming: int = 2):
    """Bucketed ANN: sign-random-projection signatures; probe buckets
    within ``probe_hamming`` bits of the query signature."""
    import ray

    qdf = _rows_for_ids(embeddings, query_ids)
    q = _normalize(np.stack(qdf["embedding"].to_numpy()))
    qids = qdf["vec_id"].to_numpy()
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
                top = np.argsort(-cc, kind="stable")[:k]
                for t in top:
                    rows.append((int(qids_[qi]), float(cc[t]), int(mm[t])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"])

    partials = embeddings.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"],
                          ascending=[False, True]).head(k).reset_index(drop=True)
        return pd.DataFrame({"query_id": g["query_id"],
                             "rank": np.arange(1, len(g) + 1, dtype="int64"),
                             "neighbor_id": g["neighbor_id"]})

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
