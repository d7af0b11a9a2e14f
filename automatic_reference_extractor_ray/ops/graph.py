"""Iterative graph computation over an edge-list Dataset: PageRank.

Joins the engine's iterative-algorithm family (label-propagation
connected components in ``ops/dedup.py:dedup_components``, k-means in
``ops/analytics.py``): per-round state lives in a DISTRIBUTED
(node, rank) dataset, each round is one bucketed equi-join
(ranks ⋈ edges on src) plus one bucketed sum (contributions by dst),
and the round result is coalesced + materialized so lineage stays flat
(the components round-growth lesson from round 3).

Scale shape at 10^12 nodes: nothing node-proportional ever reaches the
driver — ranks and edges stream through the bounded-bucket shuffle
(``ops/shuffle.py``); per-round driver state is one float (teleport).
Hot DESTINATIONS (a page every node links to) are safe: contribution
rows bucket by dst VALUE hash and pandas-sum inside their bucket;
a pathological single-dst skew would salt the same way
``salted_lookup_join`` consumers do.

Float contract: every arithmetic step (1/n init, rank/outdeg
contribution, teleport + damping*sum update) is the same IEEE-double
expression the SQL oracle runs; only the SUM accumulation order
differs, so outputs are compared in pico-units (×1e12, half-up) where
the ~1e-17 reorder error is 5 orders below the quantum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .shuffle import bucketed_agg, bucketed_join, coalesce_blocks

# additive stride of the synthetic link generator — shared with the
# SQL oracle via ``synthetic_edges_sql``.  The src term is QUADRATIC
# on purpose: a linear (src*A + j*B) mod n map is a permutation per j
# whenever gcd(A, n) = 1, which gives every node identical in-degree
# and a uniform (vacuous) PageRank fixed point; src² mod n collides,
# so in-degrees — and ranks — genuinely vary.
_EDGE_B = 40503


def synthetic_link_edges(nodes, n_nodes: int, id_col: str = "node",
                         out_deg: int = 3):
    """Deterministic pseudo-random link graph over an int64 node-id
    dataset → (src, dst) edges, ``out_deg`` per node, no self-loops.

    dst_j = (id² + j*B) mod n, bumped one slot when it lands on the
    source.  Test scaffolding for ``pagerank`` (any real edge list
    works): SQL-expressible (``synthetic_edges_sql``) so the oracle
    derives the identical graph.  int64-safe for id < 2^31.
    """

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        if len(ids) and int(ids.max()) >= (1 << 31):
            raise ValueError("synthetic_link_edges: node id >= 2^31 "
                             "would overflow the int64 hash")
        src = np.repeat(ids, out_deg)
        j = np.tile(np.arange(1, out_deg + 1, dtype=np.int64), len(ids))
        dst = (src * src + j * _EDGE_B) % n_nodes
        dst = np.where(dst == src, (dst + 1) % n_nodes, dst)
        return pd.DataFrame({"src": src, "dst": dst})

    return nodes.map_batches(gen, batch_format="pandas")


def synthetic_edges_sql(table: str, id_col: str, out_deg: int = 3) -> str:
    """DuckDB CTE body deriving the same (src, dst) edges from
    ``table``'s ``id_col`` (node count read from the table itself)."""
    js = ", ".join(str(j) for j in range(1, out_deg + 1))
    return f"""
        SELECT src,
               CASE WHEN d = src THEN (d + 1) % ni ELSE d END AS dst
        FROM (SELECT {id_col} AS src,
                     ({id_col} * {id_col} + j * {_EDGE_B}) % ni AS d,
                     ni
              FROM {table}
              CROSS JOIN (SELECT UNNEST([{js}]) AS j)
              CROSS JOIN (SELECT COUNT(*) AS ni FROM {table}))"""


# node counts at or below this ride the dense-vector fast path (two
# float64 vectors of n_nodes on the driver — 64 MiB at the threshold);
# larger graphs take the fully-distributed bucketed path below
DENSE_NODE_THRESHOLD = 1 << 22


def pagerank(nodes, edges, n_nodes: int, id_col: str = "node",
             n_iter: int = 5, damping: float = 0.85,
             num_buckets: int | None = None,
             dense_threshold: int = DENSE_NODE_THRESHOLD):
    """``n_iter`` synchronous PageRank rounds → Dataset (node, rank).

    r_{t+1}(v) = (1-damping)/n + damping * Σ_{u→v} r_t(u)/outdeg(u);
    r_0 = 1/n.  Nodes without in-edges keep the teleport term (a zero
    contribution row per node guarantees presence without an outer
    join).  Out-degrees are computed once from ``edges`` and the
    degree-annotated edge table is materialized once — each round then
    moves only (src, rank) and (dst, contribution) rows.

    Two physical plans, same float semantics:

    - **dense** (``n_nodes <= dense_threshold``, ids must lie in
      ``[0, n_nodes)``): the kmeans/broadcast-model pattern — the rank
      vector rides ``ray.put`` each round, every edge batch
      pre-aggregates its contributions to sparse (dst, sum) partials
      (bincount, one C pass), the driver scatter-folds them.  One
      streaming pass per round over the once-materialized edge table:
      no exchange at all, ~10× less per-round fixed cost than the
      bucketed plan at bench scale.
    - **bucketed** (above the threshold, or any int64 ids): per-round
      state is a distributed (node, rank) dataset; each round is one
      bucketed equi-join plus one bucketed sum — nothing
      node-proportional reaches the driver at any graph size.
    """
    if n_nodes <= dense_threshold:
        return _pagerank_dense(nodes, edges, n_nodes, id_col,
                               n_iter, damping)
    tele = (1.0 - damping) / float(n_nodes)

    deg = bucketed_agg(edges, "src", {"outdeg": ("dst", "size")},
                       num_buckets)
    e = bucketed_join(
        edges, deg, on="src",
        left_schema={"src": "int64", "dst": "int64"},
        right_schema={"src": "int64", "outdeg": "int64"},
        num_buckets=num_buckets).materialize()

    def init(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "src": ids,
            "rank": np.full(len(ids), 1.0 / float(n_nodes))})

    # ranks are keyed "src" throughout so each round's join needs no
    # rename pass; the public output renames once at the end
    ranks = coalesce_blocks(
        nodes.map_batches(init, batch_format="pandas")).materialize()

    def contrib(merged: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dst": merged["dst"].to_numpy(dtype=np.int64),
            "c": (merged["rank"].to_numpy(dtype=np.float64)
                  / merged["outdeg"].to_numpy(dtype=np.float64))})

    def zeros(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dst": pdf["src"].to_numpy(dtype=np.int64),
            "c": np.zeros(len(pdf))})

    def update(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": pdf["dst"].to_numpy(dtype=np.int64),
            "rank": tele + damping * pdf["s"].to_numpy(dtype=np.float64)})

    for _ in range(n_iter):
        cs = bucketed_join(
            e, ranks, on="src",
            left_schema={"src": "int64", "dst": "int64",
                         "outdeg": "int64"},
            right_schema={"src": "int64", "rank": "float64"},
            num_buckets=num_buckets, post=contrib)
        zs = ranks.map_batches(zeros, batch_format="pandas")
        s = bucketed_agg(cs.union(zs), "dst", {"s": ("c", "sum")},
                         num_buckets)
        ranks = coalesce_blocks(
            s.map_batches(update, batch_format="pandas")).materialize()

    return ranks.map_batches(
        lambda b: b.rename(columns={"src": id_col}),
        batch_format="pandas")


def _pagerank_dense(nodes, edges, n_nodes: int, id_col: str,
                    n_iter: int, damping: float):
    """Dense-vector plan: see ``pagerank``.  Requires node ids in
    ``[0, n_nodes)`` (raises inside the first edge pass otherwise).
    The update arithmetic is the same IEEE-double expression as the
    bucketed plan; only SUM accumulation order differs (covered by the
    pico-unit comparison contract)."""
    import ray

    tele = (1.0 - damping) / float(n_nodes)
    e = edges.materialize()

    def _sparse(dst: np.ndarray, w: np.ndarray) -> pd.DataFrame:
        if len(dst) and (dst.min() < 0 or dst.max() >= n_nodes):
            raise ValueError("pagerank dense path: node id outside "
                             f"[0, {n_nodes}); pass dense_threshold=0 "
                             "to force the bucketed plan")
        # batch-local sparse sum — never allocates n_nodes per batch
        uq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=w)
        return pd.DataFrame({"i": uq.astype("int64"), "v": sums})

    def deg_part(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].to_numpy(dtype=np.int64)
        return _sparse(src, np.ones(len(src), dtype=np.float64))

    outdeg = np.zeros(n_nodes, dtype=np.float64)
    for p in (e.map_batches(deg_part, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        np.add.at(outdeg, p["i"].to_numpy(), p["v"].to_numpy())
    outdeg[outdeg == 0.0] = 1.0  # sources absent from edges divide 1

    rank = np.full(n_nodes, 1.0 / float(n_nodes))
    for _ in range(n_iter):
        ref = ray.put(rank / outdeg)

        def contrib_part(pdf: pd.DataFrame) -> pd.DataFrame:
            cw = ray.get(ref)
            src = pdf["src"].to_numpy(dtype=np.int64)
            dst = pdf["dst"].to_numpy(dtype=np.int64)
            if len(src) and (src.min() < 0 or src.max() >= n_nodes):
                raise ValueError("pagerank dense path: node id outside "
                                 f"[0, {n_nodes})")
            return _sparse(dst, cw[src])

        s = np.zeros(n_nodes, dtype=np.float64)
        for p in (e.map_batches(contrib_part, batch_format="pandas")
                  .iter_batches(batch_format="pandas")):
            np.add.at(s, p["i"].to_numpy(), p["v"].to_numpy())
        rank = tele + damping * s

    rank_ref = ray.put(rank)

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        rv = ray.get(rank_ref)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({id_col: ids, "rank": rv[ids]})

    return nodes.map_batches(emit, batch_format="pandas")


def node_degrees(edges, num_buckets: int | None = None):
    """Per-node in/out degree over an edge-list Dataset → (node,
    out_deg, in_deg); nodes appearing only as src (or only as dst)
    carry 0 on the other side.  The graph-shape profile (skew checks,
    supernode detection) before running anything iterative.

    Scale shape: each batch collapses both endpoints to (node, o, i)
    count partials; ONE bounded-bucket sum folds them — hot nodes
    pre-combine in every batch they touch."""
    from .shuffle import bucketed_agg

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["src"].value_counts()
        d = pdf["dst"].value_counts()
        return pd.DataFrame({
            "node": np.concatenate([s.index.to_numpy(),
                                    d.index.to_numpy()]),
            "out_deg": np.concatenate([
                s.to_numpy(dtype=np.int64),
                np.zeros(len(d), dtype=np.int64)]),
            "in_deg": np.concatenate([
                np.zeros(len(s), dtype=np.int64),
                d.to_numpy(dtype=np.int64)])})

    return bucketed_agg(
        edges.map_batches(part, batch_format="pandas"), "node",
        {"out_deg": ("out_deg", "sum"), "in_deg": ("in_deg", "sum")},
        num_buckets)


def quantize_rank(df: pd.DataFrame, id_col: str = "node") -> pd.DataFrame:
    """(node, rank) → (node, rank_pico): ×1e12, half-up — the oracle
    comparison units (see module docstring)."""
    return pd.DataFrame({
        id_col: df[id_col].to_numpy(dtype=np.int64),
        "rank_pico": np.floor(df["rank"].to_numpy(dtype=np.float64)
                              * 1e12 + 0.5).astype("int64")})


def pagerank_sql(table: str, id_col: str, n_iter: int = 5,
                 damping: float = 0.85, out_deg: int = 3) -> str:
    """DuckDB oracle: unrolled-iteration CTE chain over the synthetic
    graph, same double expressions, pico-unit output."""
    d = repr(float(damping))
    rounds = []
    for t in range(1, n_iter + 1):
        rounds.append(f"""
        r{t} AS (
          SELECT n2.node,
                 (1.0 - {d}) / (SELECT n FROM nn)
                   + {d} * COALESCE(c.s, 0.0) AS rank
          FROM nodes n2
          LEFT JOIN (SELECT e.dst AS node,
                            SUM(r.rank / CAST(dg.outdeg AS DOUBLE)) AS s
                     FROM edges e
                     JOIN deg dg ON e.src = dg.src
                     JOIN r{t - 1} r ON e.src = r.node
                     GROUP BY e.dst) c USING (node))""")
    return f"""
        WITH nodes AS (SELECT {id_col} AS node FROM {table}),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        edges AS ({synthetic_edges_sql(table, id_col, out_deg)}),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
        {",".join(rounds)}
        SELECT node,
               CAST(FLOOR(rank * 1000000000000.0 + 0.5) AS BIGINT)
                 AS rank_pico
        FROM r{n_iter} ORDER BY node"""
