"""PageRank + synthetic link graph + exact histogram — each against an
independent local (numpy/pandas) dense reference."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
N = 500          # documents at sf0.001


@pytest.fixture(scope="module")
def nodes_ds(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"]).to_pandas()
    return rd.from_pandas(
        ids.rename(columns={"doc_id": "node"})).materialize()


def _dense_reference(n: int, out_deg: int = 3, n_iter: int = 5,
                     damping: float = 0.85) -> np.ndarray:
    """Independent dense-matrix PageRank over the same synthetic graph
    (re-derives the edge formula; no shared code with ops/graph.py's
    distributed path beyond the two constants)."""
    ids = np.arange(n, dtype=np.int64)
    A = np.zeros((n, n))
    deg = np.zeros(n)
    for j in range(1, out_deg + 1):
        dst = (ids * ids + j * 40503) % n
        dst = np.where(dst == ids, (dst + 1) % n, dst)
        for s, d in zip(ids, dst):
            A[d, s] += 1.0
            deg[s] += 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1.0 - damping) / n + damping * (A @ (r / deg))
    return r


def test_synthetic_edges_shape(ray_session, nodes_ds):
    from automatic_reference_extractor_ray.ops.graph import (
        synthetic_link_edges)
    e = synthetic_link_edges(nodes_ds, N).to_pandas()
    assert len(e) == 3 * N
    assert (e["src"] != e["dst"]).all()
    assert e.groupby("src").size().eq(3).all()
    # the quadratic map must make in-degree (and therefore rank) vary —
    # a permutation-per-j graph would be a vacuous uniform fixed point
    assert e.groupby("dst").size().nunique() > 1


def test_pagerank_matches_dense_reference(ray_session, nodes_ds):
    from automatic_reference_extractor_ray.ops.graph import (
        pagerank, quantize_rank, synthetic_link_edges)
    edges = synthetic_link_edges(nodes_ds, N)
    got = (quantize_rank(pagerank(nodes_ds, edges, N, n_iter=5).to_pandas())
           .sort_values("node").reset_index(drop=True))
    exp = _dense_reference(N)
    exp_pico = np.floor(exp * 1e12 + 0.5).astype(np.int64)
    assert len(got) == N
    assert (got["node"].to_numpy() == np.arange(N)).all()
    # accumulation order differs (dense matmul vs bucketed sums): allow
    # one pico-unit, i.e. agreement to ~1e-12 absolute
    assert np.abs(got["rank_pico"].to_numpy() - exp_pico).max() <= 1


def test_pagerank_invariants(ray_session, nodes_ds):
    from automatic_reference_extractor_ray.ops.graph import (
        pagerank, synthetic_link_edges)
    edges = synthetic_link_edges(nodes_ds, N)
    r = pagerank(nodes_ds, edges, N, n_iter=3).to_pandas()["rank"].to_numpy()
    assert abs(r.sum() - 1.0) < 1e-9          # stochastic: mass conserved
    assert r.min() >= (1.0 - 0.85) / N - 1e-15  # teleport floor


def test_pagerank_bucket_invariant(ray_session, nodes_ds):
    # dense_threshold=0 forces the distributed bucketed plan (the
    # above-threshold scale path) — result must not depend on the
    # bucket count
    from automatic_reference_extractor_ray.ops.graph import (
        pagerank, quantize_rank, synthetic_link_edges)
    edges = synthetic_link_edges(nodes_ds, N)
    a = (quantize_rank(
            pagerank(nodes_ds, edges, N, n_iter=2, num_buckets=4,
                     dense_threshold=0)
            .to_pandas())
         .sort_values("node").reset_index(drop=True))
    b = (quantize_rank(
            pagerank(nodes_ds, edges, N, n_iter=2, num_buckets=32,
                     dense_threshold=0)
            .to_pandas())
         .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_pagerank_dense_matches_bucketed(ray_session, nodes_ds):
    # the two physical plans agree to the pico-unit contract
    from automatic_reference_extractor_ray.ops.graph import (
        pagerank, quantize_rank, synthetic_link_edges)
    edges = synthetic_link_edges(nodes_ds, N)
    dense = (quantize_rank(pagerank(nodes_ds, edges, N, n_iter=3)
                           .to_pandas())
             .sort_values("node").reset_index(drop=True))
    bucketed = (quantize_rank(
                    pagerank(nodes_ds, edges, N, n_iter=3,
                             dense_threshold=0).to_pandas())
                .sort_values("node").reset_index(drop=True))
    assert (dense["node"] == bucketed["node"]).all()
    assert np.abs(dense["rank_pico"].to_numpy()
                  - bucketed["rank_pico"].to_numpy()).max() <= 1


def test_pagerank_dense_rejects_out_of_range_ids(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.graph import pagerank
    nodes = rd.from_pandas(pd.DataFrame({"node": [0, 1, 7]}))
    edges = rd.from_pandas(pd.DataFrame({"src": [0, 7], "dst": [7, 0]}))
    with pytest.raises(Exception, match="outside"):
        pagerank(nodes, edges, n_nodes=3, n_iter=1).to_pandas()


def test_node_degrees_hand_graph(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.graph import node_degrees
    edges = pd.DataFrame({
        "src": np.array([0, 0, 1, 2, 2, 2], dtype="int64"),
        "dst": np.array([1, 2, 2, 0, 1, 3], dtype="int64")})
    out = (node_degrees(rd.from_pandas(edges).repartition(3))
           .to_pandas().set_index("node").sort_index())
    assert out.loc[0].tolist() == [2, 1]
    assert out.loc[1].tolist() == [1, 2]
    assert out.loc[2].tolist() == [3, 2]
    assert out.loc[3].tolist() == [0, 1]   # sink: out_deg 0


def test_value_histogram_vs_pandas(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        value_histogram)
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["value"]).to_pandas()
    ds = rd.from_pandas(df).materialize()
    got = value_histogram(ds, "value", 0.0, 500.0, 25)
    w = 500.0 / 25
    exp_bins = np.clip(np.floor(df["value"].to_numpy() / w),
                       0, 24).astype(np.int64)
    exp = np.bincount(exp_bins, minlength=25)
    assert (got["n"].to_numpy() == exp).all()
    assert got["n"].sum() == len(df)
    assert len(got) == 25                     # empty bins materialized
    assert got["lo_edge"].iloc[0] == 0.0
    assert got["hi_edge"].iloc[-1] == 500.0


def test_value_histogram_clamps_outliers(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        value_histogram)
    df = pd.DataFrame({"v": [-5.0, 0.0, 9.99, 10.0, 25.0, 99.0, 1e6]})
    ds = rd.from_pandas(df)
    got = value_histogram(ds, "v", 0.0, 100.0, 10)
    assert got["n"].sum() == len(df)
    assert got["n"].iloc[0] == 3              # -5 clamps in; 9.99 in bin 0
    assert got["n"].iloc[-1] == 2             # 99 and the 1e6 outlier
