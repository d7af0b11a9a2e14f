"""Bounded-bucket shuffle primitives: join correctness and the
bucket-count invariance property (outputs must not depend on the
parallelism dial)."""

import numpy as np
import pandas as pd
import pytest


def _ds(df):
    import ray.data as rd
    return rd.from_pandas(df)


def _pairs_df(n=200, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({"a": rng.integers(0, 40, n),
                         "b": rng.integers(0, 40, n)})


def _lookup_df():
    return pd.DataFrame({"a": np.arange(40),
                         "payload": [f"p{i}" for i in range(40)]})


def _norm(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bucketed_join_matches_pandas_merge(ray_session):
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_join
    pairs, lk = _pairs_df(), _lookup_df()
    got = bucketed_join(_ds(pairs), _ds(lk), "a",
                        {"a": "int64", "b": "int64"},
                        {"a": "int64", "payload": "object"},
                        num_buckets=8).to_pandas()
    exp = pairs.merge(lk, on="a", how="inner")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_bucketed_join_string_key_and_post(ray_session):
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_join
    left = pd.DataFrame({"k": list("abcabc"), "x": np.arange(6)})
    right = pd.DataFrame({"k": list("abd"), "y": ["ya", "yb", "yd"]})
    got = bucketed_join(
        _ds(left), _ds(right), "k",
        {"k": "object", "x": "int64"}, {"k": "object", "y": "object"},
        num_buckets=4,
        post=lambda m: m[m["x"] % 2 == 0][["k", "y"]]).to_pandas()
    exp = left.merge(right, on="k")
    exp = exp[exp["x"] % 2 == 0][["k", "y"]]
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_bucketed_join_rejects_ambiguous_schemas(ray_session):
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_join
    with pytest.raises(ValueError, match="both sides"):
        bucketed_join(_ds(_pairs_df()), _ds(_pairs_df()), "a",
                      {"a": "int64", "b": "int64"},
                      {"a": "int64", "b": "int64"})
    with pytest.raises(ValueError, match="dtype mismatch"):
        bucketed_join(_ds(_pairs_df()), _ds(_lookup_df()), "a",
                      {"a": "int64", "b": "int64"},
                      {"a": "object", "payload": "object"})


@pytest.mark.parametrize("nb", [3, 8, 64])
def test_bucket_count_invariance(ray_session, nb):
    """Aggregates, distinct and joins are pure functions of the data —
    the bucket count is a memory/parallelism dial only."""
    from automatic_reference_extractor_ray.ops.shuffle import (
        bucketed_agg, bucketed_distinct, bucketed_join)
    pairs = _pairs_df(300, seed=11)
    agg = bucketed_agg(_ds(pairs), "a", {"n": ("b", "size"),
                                         "mx": ("b", "max")},
                       num_buckets=nb).to_pandas()
    exp_agg = pairs.groupby("a").agg(n=("b", "size"),
                                     mx=("b", "max")).reset_index()
    pd.testing.assert_frame_equal(_norm(agg), _norm(exp_agg),
                                  check_dtype=False)

    dist = bucketed_distinct(_ds(pairs), ["a", "b"],
                             num_buckets=nb).to_pandas()
    pd.testing.assert_frame_equal(_norm(dist),
                                  _norm(pairs.drop_duplicates()))

    lk = _lookup_df()
    j = bucketed_join(_ds(pairs), _ds(lk), "a",
                      {"a": "int64", "b": "int64"},
                      {"a": "int64", "payload": "object"},
                      num_buckets=nb).to_pandas()
    pd.testing.assert_frame_equal(_norm(j), _norm(pairs.merge(lk, on="a")))


def test_auto_num_buckets_scales():
    from automatic_reference_extractor_ray.ops.shuffle import (
        TARGET_BUCKET_BYTES, auto_num_buckets)
    base = auto_num_buckets()
    assert base >= 32
    # size-aware: a 100 GiB input must get >= size/target buckets
    big = auto_num_buckets(size_bytes=100 << 30)
    assert big >= (100 << 30) // TARGET_BUCKET_BYTES
    assert auto_num_buckets(size_bytes=1) == base


@pytest.mark.parametrize("key_dtype", ["int64", "object"])
def test_grouped_pair_join_matches_naive(ray_session, key_dtype):
    """Randomized equivalence: grouped_pair_join with an
    attach-payloads verify must equal the naive pandas double-merge,
    for int and string keys."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import grouped_pair_join
    rng = np.random.default_rng(123)
    keys = np.arange(30)
    if key_dtype == "object":
        key_vals = np.array([f"k{i:03d}" for i in keys], dtype=object)
    else:
        key_vals = keys
    side = pd.DataFrame({"key": key_vals,
                         "payload": [f"p{i}" for i in keys]})
    a = key_vals[rng.integers(0, 30, 120)]
    b = key_vals[rng.integers(0, 30, 120)]
    cands = pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    def verify(pairs, amap, bmap):
        if not len(pairs):
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "pa": pd.Series([], dtype=object),
                                 "pb": pd.Series([], dtype=object)})
        return pd.DataFrame({
            "a": pairs["a"], "b": pairs["b"],
            "pa": [amap[x][0] for x in pairs["a"]],
            "pb": [bmap[x][0] for x in pairs["b"]]})

    got = grouped_pair_join(rd.from_pandas(cands), rd.from_pandas(side),
                            key_dtype, ["payload"], verify,
                            num_buckets=7).to_pandas()
    exp = (cands.merge(side.rename(columns={"key": "a",
                                            "payload": "pa"}), on="a")
           .merge(side.rename(columns={"key": "b", "payload": "pb"}),
                  on="b"))
    key = lambda df: sorted(map(tuple, df[["a", "b", "pa", "pb"]]
                                .to_numpy()))  # noqa: E731
    assert key(got) == key(exp)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_bucketed_join_modes(ray_session, how):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_join
    left = pd.DataFrame({"k": np.array([1, 2, 3, 4, 5], dtype="int64"),
                         "lv": ["a", "b", "c", "d", "e"]})
    right = pd.DataFrame({"k": np.array([2, 4, 4, 9], dtype="int64"),
                          "rv": np.array([20, 40, 41, 90], dtype="int64")})
    got = bucketed_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k",
        left_schema={"k": "int64", "lv": "object"},
        right_schema={"k": "int64", "rv": "int64"},
        num_buckets=5, how=how).to_pandas()
    if how == "inner":
        exp = left.merge(right, on="k")
    elif how == "left":
        exp = left.merge(right, on="k", how="left")
        exp["rv"] = exp["rv"].fillna(0).astype("int64")
    elif how == "semi":
        exp = left[left["k"].isin(right["k"])]
    else:
        exp = left[~left["k"].isin(right["k"])]
    skey = lambda df: sorted(map(tuple, df.to_numpy()))  # noqa: E731
    assert skey(got[exp.columns.tolist()]) == skey(exp)


def test_bucketed_join_bad_how(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_join
    df = pd.DataFrame({"k": np.array([1], dtype="int64")})
    with pytest.raises(ValueError):
        bucketed_join(rd.from_pandas(df), rd.from_pandas(df), on="k",
                      left_schema={"k": "int64"},
                      right_schema={"k": "int64"}, how="outer")


def test_bucketed_ops_survive_hot_key(ray_session):
    """95% of rows share one key: the two-level shapes (distinct on
    (key,val), per-batch combiners) must stay correct under skew."""
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        grouped_distinct_count)
    rng = np.random.default_rng(3)
    n = 20000
    keys = np.where(rng.random(n) < 0.95, "hot", "cold")
    vals = rng.integers(0, 500, n).astype("int64")
    df = pd.DataFrame({"k": keys, "v": vals})
    got = (grouped_distinct_count(rd.from_pandas(df).repartition(16),
                                  "k", "v", num_buckets=8)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.groupby("k")["v"].nunique().reset_index(name="n_distinct")
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_distinct": "int64"}),
        exp.astype({"n_distinct": "int64"}))


@pytest.mark.parametrize("how", ["inner", "semi", "anti"])
def test_salted_lookup_join_matches_unsalted(ray_session, how):
    """salted_lookup_join == bucketed_join for every mode, including a
    hot key carrying most of the left side (the case the salting
    exists for)."""
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.shuffle import (
        bucketed_join, salted_lookup_join)
    rng = np.random.default_rng(31)
    keys = np.array(["hot"] * 80 + [f"k{i}" for i in rng.integers(0, 9, 40)],
                    dtype=object)
    left = pd.DataFrame({"k": keys,
                         "doc": np.arange(len(keys), dtype="int64")})
    right = pd.DataFrame({"k": np.array(["hot", "k1", "k3", "zz"],
                                        dtype=object),
                          "v": np.array([1, 2, 3, 4], dtype="int64")})
    ls = {"k": "object", "doc": "int64"}
    rs = {"k": "object", "v": "int64"}
    exp = bucketed_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", left_schema=ls, right_schema=rs,
                        num_buckets=5, how=how).to_pandas()
    got = salted_lookup_join(rd.from_pandas(left), rd.from_pandas(right),
                             on="k", salt_col="doc", left_schema=ls,
                             right_schema=rs, num_buckets=5, salts=4,
                             how=how).to_pandas()
    key = lambda df: sorted(map(tuple, df.to_numpy()))  # noqa: E731
    assert key(got[exp.columns]) == key(exp)
