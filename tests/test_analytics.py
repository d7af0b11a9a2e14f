"""Analytics family: distinct counts, quantiles, splits, heavy
hitters, HLL, k-means, range join — each against an independent local
(pandas/numpy) reference."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_df():
    import pyarrow.parquet as pq
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def events_ds(ray_session, events_df):
    import ray.data as rd
    return rd.from_pandas(events_df).materialize()


def test_grouped_distinct_count(ray_session, events_ds, events_df):
    from automatic_reference_extractor_ray.ops.analytics import (
        grouped_distinct_count)
    got = (grouped_distinct_count(events_ds, "event_type", "user_id")
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    exp = (events_df.groupby("event_type")["user_id"].nunique()
           .reset_index(name="n_distinct").sort_values("event_type")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"n_distinct": "int64"}),
                                  exp.astype({"n_distinct": "int64"}))


def test_grouped_quantiles_exact_rank(ray_session, events_ds, events_df):
    from automatic_reference_extractor_ray.ops.analytics import (
        grouped_quantiles)
    qs = (0.25, 0.5, 0.99)
    got = grouped_quantiles(events_ds, "event_type", "value", qs).to_pandas()
    for et, g in events_df.groupby("event_type"):
        vals = np.sort(g["value"].to_numpy())
        for q in qs:
            rank = math.ceil(q * len(vals))      # 1-indexed discrete rank
            exp = vals[rank - 1]
            mine = got[(got["event_type"] == et) & (got["q"] == q)]
            assert len(mine) == 1
            assert mine["q_value"].iloc[0] == exp  # bit-exact: an existing value


def test_grouped_quantiles_bucket_invariant(ray_session, events_ds):
    from automatic_reference_extractor_ray.ops.analytics import (
        grouped_quantiles)
    a = (grouped_quantiles(events_ds, "event_type", "value", num_buckets=4)
         .to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True))
    b = (grouped_quantiles(events_ds, "event_type", "value", num_buckets=64)
         .to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_hash_split_deterministic_and_proportional(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import hash_split
    ids = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    got = hash_split(rd.from_pandas(ids), "doc_id").to_pandas()
    # independent reference: md5 prefix fraction of 2^32
    for v, s in zip(got["doc_id"], got["split"]):
        frac = int(hashlib.md5(str(int(v)).encode()).hexdigest()[:8], 16) / (1 << 32)
        exp = "train" if frac < 0.8 else ("val" if frac < 0.9 else "test")
        assert s == exp
    counts = got["split"].value_counts(normalize=True)
    assert abs(counts["train"] - 0.8) < 0.03
    assert abs(counts["val"] - 0.1) < 0.02
    assert abs(counts["test"] - 0.1) < 0.02


def test_topk_tokens_exact(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        TOKEN_RE, topk_tokens)
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, size=40,
                                 p=np.arange(300, 0, -1) / np.arange(300, 0, -1).sum()))
             for _ in range(400)]
    docs = pd.DataFrame({"doc_id": np.arange(400), "text": texts})
    got = topk_tokens(rd.from_pandas(docs), k=25)
    from collections import Counter
    c: Counter = Counter()
    for t in texts:
        c.update(TOKEN_RE.findall(t.lower()))
    exp = (pd.DataFrame({"token": list(c.keys()),
                         "n": np.fromiter(c.values(), np.int64, len(c))})
           .sort_values(["n", "token"], ascending=[False, True])
           .head(25).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_approx_distinct_error_bound(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import approx_distinct
    n = 20_000
    df = pd.DataFrame({"v": np.arange(n, dtype=np.int64)})
    est = approx_distinct(rd.from_pandas(df), "v")
    assert abs(est - n) / n < 0.05      # p=12 → ~1.6% typical, 5% ceiling

    # duplicates must not inflate the estimate
    df2 = pd.DataFrame({"v": np.arange(n, dtype=np.int64) % 500})
    est2 = approx_distinct(rd.from_pandas(df2), "v")
    assert abs(est2 - 500) / 500 < 0.05


def test_kmeans_matches_local_lloyds(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import kmeans
    rng = np.random.default_rng(11)
    k, d = 4, 8
    centers = rng.standard_normal((k, d)) * 10    # well-separated
    vecs = np.concatenate([centers[i] + 0.1 * rng.standard_normal((50, d))
                           for i in range(k)])
    ids = np.arange(len(vecs), dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids,
                                      "embedding": list(vecs)}))
    got = (kmeans(ds, k=k, n_iter=8).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    # local Lloyd's with the same deterministic init (k smallest ids)
    c = vecs[:k].astype(np.float64).copy()
    for _ in range(8):
        d2 = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for ci in range(k):
            if (a == ci).any():
                c[ci] = vecs[a == ci].mean(axis=0)
    d2 = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    exp = d2.argmin(axis=1)
    assert (got["cluster"].to_numpy() == exp).all()


def test_events_range_join_counts(ray_session, events_ds, events_df):
    from automatic_reference_extractor_ray.ops.analytics import (
        events_range_join_counts)
    got = (events_range_join_counts(events_ds, minutes=10).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    win = pd.Timedelta(minutes=10)
    rows = []
    for _, g in events_df.groupby("user_id"):
        for _, r in g.iterrows():
            n = ((g["ts"] >= r["ts"] - win) & (g["ts"] < r["ts"])).sum()
            rows.append((r["event_id"], n))
    exp = (pd.DataFrame(rows, columns=["event_id", "n_prior"])
           .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"n_prior": "int64"}),
                                  exp.astype({"n_prior": "int64"}))


def test_top_per_group_matches_window_rank(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import top_per_group
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "lang", "n_chars"]).to_pandas()
    got = (top_per_group(rd.from_pandas(df), "lang", "n_chars", "doc_id", k=3)
           .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True))
    exp = df.sort_values(["n_chars", "doc_id"],
                         ascending=[False, True], kind="mergesort").copy()
    exp = exp.groupby("lang", sort=False).head(3)
    exp["rank"] = (exp.groupby("lang", sort=False).cumcount() + 1)
    exp = (exp[["lang", "rank", "doc_id", "n_chars"]]
           .sort_values(["lang", "rank"]).reset_index(drop=True)
           .astype({"rank": "int64"}))
    pd.testing.assert_frame_equal(got, exp)


def test_top_per_group_block_invariant(ray_session):
    """Partial top-k per batch must not change the global answer even
    when blocks slice groups adversarially."""
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import top_per_group
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype="int64"),
        "lang": rng.choice(["aa", "bb", "cc"], 400),
        "n_chars": rng.integers(0, 5, 400).astype("int64"),  # heavy ties
    })
    outs = []
    for blocks in (1, 7, 64):
        ds = rd.from_pandas(df).repartition(blocks)
        outs.append(top_per_group(ds, "lang", "n_chars", "doc_id", k=5)
                    .to_pandas().sort_values(["lang", "rank"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_mixture_sample_deterministic_rates(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        _hex_threshold, mixture_sample)
    n = 4000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "lang": np.where(np.arange(n) % 2 == 0, "en", "zz")})
    got = (mixture_sample(rd.from_pandas(df), "lang", {"en": 0.25},
                          "doc_id", default_rate=0.75)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # local mirror
    keep = []
    for v, g in zip(df["doc_id"], df["lang"]):
        h8 = hashlib.md5(f"mix:{v}".encode()).hexdigest()[:8]
        keep.append(h8 < _hex_threshold(0.25 if g == "en" else 0.75))
    exp = df.loc[keep].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # observed rates near nominal
    en = got[got["lang"] == "en"]; zz = got[got["lang"] == "zz"]
    assert abs(len(en) / (n / 2) - 0.25) < 0.05
    assert abs(len(zz) / (n / 2) - 0.75) < 0.05


def test_decontaminate_matches_local_reference(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import _hex_threshold
    from automatic_reference_extractor_ray.ops.textstats import (
        _tokens, decontaminate)
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas()
    n, frac = 3, 0.2
    got = (decontaminate(rd.from_pandas(df), n=n, eval_frac=frac)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    thr = _hex_threshold(frac)

    def h8(d):
        return hashlib.md5(str(d).encode()).hexdigest()[:8]

    def grams(t):
        toks = _tokens(t)
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    eval_grams = set()
    for _, r in df.iterrows():
        if h8(r["doc_id"]) < thr:
            eval_grams |= grams(r["text"])
    rows = []
    for _, r in df.iterrows():
        if h8(r["doc_id"]) >= thr:
            shared = len(grams(r["text"]) & eval_grams)
            rows.append((r["doc_id"], shared, int(shared == 0)))
    exp = (pd.DataFrame(rows, columns=["doc_id", "n_shared", "keep"])
           .astype({"n_shared": "int64", "keep": "int64"})
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # non-degenerate: some contaminated, some clean
    assert 0 < (exp["keep"] == 0).sum() < len(exp)


def test_decontaminate_bucket_invariant(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.textstats import decontaminate
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas().head(200)
    outs = []
    for nb in (8, 64):
        outs.append(decontaminate(rd.from_pandas(df), n=3, eval_frac=0.2,
                                  num_buckets=nb)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_tfidf_top_terms_hand_case(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        tfidf_top_terms)
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype="int64"),
        "text": ["rare rare common", "common other", "common other"],
    })
    got = (tfidf_top_terms(rd.from_pandas(df), k=2)
           .to_pandas().sort_values(["doc_id", "rank"])
           .reset_index(drop=True))
    # df: rare=1, common=3, other=2; idf_x1000 = (1000*3)//df
    # doc1: rare tf2 -> 2*3000=6000; common tf1 -> 1*1000=1000
    d1 = got[got["doc_id"] == 1]
    assert list(d1["token"]) == ["rare", "common"]
    assert list(d1["score"]) == [6000, 1000]
    # docs 2/3: other 1500, common 1000
    d2 = got[got["doc_id"] == 2]
    assert list(d2["token"]) == ["other", "common"]
    assert list(d2["score"]) == [1500, 1000]


def test_tfidf_bucket_invariant(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        tfidf_top_terms)
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas().head(120)
    outs = []
    for blocks, nb in ((2, 8), (16, 64)):
        ds = rd.from_pandas(df).repartition(blocks)
        outs.append(tfidf_top_terms(ds, k=4, num_buckets=nb)
                    .to_pandas().sort_values(["doc_id", "rank"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_approx_quantiles_error_bound(ray_session, events_ds, events_df):
    from automatic_reference_extractor_ray.ops.analytics import (
        approx_quantiles)
    got = approx_quantiles(events_ds, "event_type", "value", n_bins=2048)
    for kv, g in events_df.groupby("event_type"):
        vals = np.sort(g["value"].to_numpy(np.float64))
        rng = vals[-1] - vals[0]
        for q in (0.5, 0.9, 0.99):
            exact = vals[math.ceil(q * len(vals)) - 1]
            approx = got.loc[(got["event_type"] == kv)
                             & (got["q"] == q), "q_value"].iloc[0]
            # right-edge-of-bin answer: within one bin width ABOVE the
            # exact rank value
            assert exact <= approx <= exact + rng / 2048 + 1e-9


def test_approx_quantiles_constant_column(ray_session):
    """Zero range (all values equal) must not divide by zero."""
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        approx_quantiles)
    df = pd.DataFrame({"k": ["a"] * 50, "v": np.full(50, 3.25)})
    got = approx_quantiles(rd.from_pandas(df), "k", "v", n_bins=64)
    assert np.allclose(got["q_value"], 3.25 + 1 / 64)


def test_sample_per_group_exact_k_and_deterministic(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        sample_per_group)
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "lang"]).to_pandas()
    outs = []
    for blocks in (2, 16):
        ds = rd.from_pandas(df).repartition(blocks)
        outs.append(sample_per_group(ds, "lang", "doc_id", k=5)
                    .to_pandas().sort_values(["lang", "doc_id"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    sizes = got.groupby("lang").size()
    counts = df.groupby("lang").size()
    for lang, n in counts.items():
        assert sizes.get(lang, 0) == min(5, n)
    # local mirror: k smallest salted hashes per lang
    def h(v):
        return hashlib.md5(f"smp:{v}".encode()).hexdigest()[:16]
    exp = df.assign(__h=df["doc_id"].map(h)).sort_values(["__h", "doc_id"])
    exp = (exp.groupby("lang", sort=False).head(5)[["lang", "doc_id"]]
           .sort_values(["lang", "doc_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_quantile_clip_thresholds_and_invariance(ray_session):
    """keep=1 iff value within the group's exact discrete [lo, hi]
    quantiles (rank ceil(q*n), same rule as grouped_quantiles), and the
    verdict is bucket-count invariant."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        quantile_clip)

    df = pd.DataFrame({
        "g": ["a"] * 10 + ["b"] * 4,
        "v": list(range(1, 11)) + [100, 200, 300, 400],
    })
    ds = rd.from_pandas(df)
    out = (quantile_clip(ds, "g", "v", lo=0.1, hi=0.9)
           .to_pandas().sort_values(["g", "v"]).reset_index(drop=True))
    a = out[out.g == "a"]
    # group a: n=10 → lo rank ceil(1)=1 → 1, hi rank ceil(9)=9 → 9
    assert a[a.keep == 1]["v"].tolist() == list(range(1, 10))
    b = out[out.g == "b"]
    # group b: n=4 → lo rank ceil(.4)=1 → 100, hi rank ceil(3.6)=4 → 400
    assert b["keep"].tolist() == [1, 1, 1, 1]

    out2 = (quantile_clip(ds, "g", "v", lo=0.1, hi=0.9, num_buckets=8)
            .to_pandas().sort_values(["g", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_grouped_approx_distinct_error_bound(ray_session):
    """Per-group HLL within 5% of the exact per-group distinct count on
    a skewed-cardinality input, and bucket-count invariant."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        grouped_approx_distinct)

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": np.repeat(["small", "mid", "big"], [200, 3000, 20000]),
        "v": np.concatenate([
            rng.integers(0, 50, 200),          # ~50 distinct
            rng.integers(0, 1500, 3000),       # ~1.3k distinct
            rng.integers(0, 15000, 20000),     # ~11k distinct
        ]),
    })
    exact = df.groupby("g")["v"].nunique()
    ds = rd.from_pandas(df)
    got = (grouped_approx_distinct(ds, "g", "v")
           .to_pandas().set_index("g")["n_distinct_approx"])
    for g in exact.index:
        rel = abs(got[g] - exact[g]) / exact[g]
        assert rel < 0.05, (g, got[g], exact[g])

    got2 = (grouped_approx_distinct(ds, "g", "v", num_buckets=8)
            .to_pandas().set_index("g")["n_distinct_approx"])
    assert got.sort_index().tolist() == got2.sort_index().tolist()


def test_topk_tokens_per_group_exact(ray_session):
    """Per-group top-k tokens match a local pandas reference with the
    (n DESC, token ASC) tie-break, across bucket counts."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        TOKEN_RE, topk_tokens_per_group)

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr"], 200),
        "text": [" ".join(rng.choice(vocab,
                                     size=rng.integers(0, 25),
                                     p=None)) for _ in range(200)],
    })
    rows = []
    for lang, t in zip(df["lang"], df["text"]):
        for tok in TOKEN_RE.findall(t.lower()):
            rows.append((lang, tok))
    ref = (pd.DataFrame(rows, columns=["lang", "token"])
           .groupby(["lang", "token"]).size().rename("n").reset_index()
           .sort_values(["n", "token"], ascending=[False, True])
           .groupby("lang").head(5))
    ref = ref.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True]).reset_index(drop=True)

    ds = rd.from_pandas(df)
    for nb in (8, 64):
        got = (topk_tokens_per_group(ds, "lang", k=5, num_buckets=nb)
               .to_pandas()
               .sort_values(["lang", "n", "token"],
                            ascending=[True, False, True])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["lang", "token", "n"]],
                                      ref[["lang", "token", "n"]],
                                      check_dtype=False)


def test_global_rank_total_order(ray_session):
    """Ranks are a dense permutation of 1..N matching the (value DESC,
    id ASC) order, invariant to bucket count and sample size (boundary
    choice is load-balance only)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import global_rank

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(500, dtype="int64"),
        "v": rng.integers(0, 40, 500),     # heavy value ties
    })
    ref = df.sort_values(["v", "id"], ascending=[False, True])
    ref = ref.assign(rank=np.arange(1, len(ref) + 1, dtype=np.int64))

    ds = rd.from_pandas(df)
    for kw in ({}, {"num_buckets": 8}, {"sample_size": 7}):
        got = (global_rank(ds, "v", "id", descending=True, **kw)
               .to_pandas().sort_values("rank").reset_index(drop=True))
        assert got["rank"].tolist() == list(range(1, 501))
        pd.testing.assert_frame_equal(
            got[["id", "v", "rank"]].reset_index(drop=True),
            ref[["id", "v", "rank"]].reset_index(drop=True),
            check_dtype=False)


def test_funnel_counts_greedy_walk(ray_session):
    """Funnel semantics: strictly-after ordering, non-increasing
    counts, a user converting via a LATER first-step event still
    counts (greedy-earliest == nested-MIN equivalence case)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        funnel_counts)

    ts = pd.Timestamp("2026-01-01")

    def ev(uid, t_off, typ, eid):
        return {"user_id": uid, "ts": ts + pd.Timedelta(minutes=t_off),
                "event_type": typ, "event_id": eid}

    rows = [
        # u1: full funnel in order
        ev(1, 0, "view", 1), ev(1, 5, "click", 2), ev(1, 9, "purchase", 3),
        # u2: click BEFORE view → stops at view
        ev(2, 0, "click", 4), ev(2, 5, "view", 5),
        # u3: view only
        ev(3, 0, "view", 6),
        # u4: equal timestamps are NOT strictly after → stops at view
        ev(4, 0, "view", 7), ev(4, 0, "click", 8),
        # u5: click after the earliest view, purchase after that click
        ev(5, 0, "view", 9), ev(5, 1, "view", 10),
        ev(5, 2, "click", 11), ev(5, 3, "purchase", 12),
        # u6: no view at all
        ev(6, 0, "purchase", 13),
    ]
    df = pd.DataFrame(rows)
    out = funnel_counts(rd.from_pandas(df))
    assert out["step"].tolist() == ["view", "click", "purchase"]
    assert out["n_users"].tolist() == [5, 2, 2]

    out2 = funnel_counts(rd.from_pandas(df), num_buckets=8)
    pd.testing.assert_frame_equal(out, out2)


def test_revenue_by_nation_star_join(ray_session):
    """Three-way star aggregate matches a local pandas reference,
    including orders whose customer is missing (dropped) and nations
    with no orders (absent)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        revenue_by_nation)

    orders = pd.DataFrame({
        "o_custkey": np.array([1, 1, 2, 3, 99], dtype="int64"),
        "o_totalprice": [10.005, 20.0, 5.5, 7.25, 100.0],  # 99: orphan
    })
    customer = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3, 4], dtype="int64"),
        "c_nationkey": np.array([0, 0, 1, 2], dtype="int32"),
    })
    nation = pd.DataFrame({
        "n_nationkey": np.array([0, 1, 2], dtype="int32"),
        "n_name": ["A", "B", "C"],
    })
    out = (revenue_by_nation(rd.from_pandas(orders),
                             rd.from_pandas(customer),
                             rd.from_pandas(nation))
           .to_pandas().sort_values("n_name").reset_index(drop=True))
    # A: cust1 (1001+2000) + cust2 (550) = 3551 cents / 3 orders
    # B: cust3 725 cents / 1 order; C (cust4): no orders → absent
    assert out["n_name"].tolist() == ["A", "B"]
    assert out["revenue_c"].tolist() == [3551, 725]
    assert out["n_orders"].tolist() == [3, 1]


def test_promo_revenue_share_q14(ray_session):
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        promo_revenue_share)

    part = pd.DataFrame({
        "p_partkey": np.array([1, 2], dtype="int64"),
        "p_type": ["ECONOMY", "SMALL"]})
    lineitem = pd.DataFrame({
        "l_partkey": np.array([1, 2, 1], dtype="int64"),
        "l_shipdate": pd.to_datetime(
            ["1996-02-01", "1996-03-01", "1997-01-01"]),  # 3rd drops
        "l_extendedprice": [10.0, 30.0, 99.0],
        "l_discount": [0.10, 0.0, 0.0]})
    out = promo_revenue_share(
        rd.from_pandas(lineitem).repartition(2), rd.from_pandas(part))
    promo = 1000 * 90                      # 10.00 at 10% off
    total = promo + 3000 * 100
    assert out["promo_cc"].tolist() == [promo]
    assert out["total_cc"].tolist() == [total]
    assert out["share_micro"].tolist() == [promo * 1_000_000 // total]


def test_local_supplier_volume_q5(ray_session):
    """Q5 shape: region gate, date window, SAME-nation cust/supp
    equality, centi-cent revenue."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        local_supplier_volume)

    region = pd.DataFrame({"r_regionkey": np.array([0, 1], dtype="int32"),
                           "r_name": ["ASIA", "EUROPE"]})
    nation = pd.DataFrame({
        "n_nationkey": np.array([0, 1, 2], dtype="int32"),
        "n_name": ["JAPAN", "CHINA", "FRANCE"],
        "n_regionkey": np.array([0, 0, 1], dtype="int32")})
    customer = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3], dtype="int64"),
        "c_nationkey": np.array([0, 1, 2], dtype="int32")})
    supplier = pd.DataFrame({
        "s_suppkey": np.array([7, 8], dtype="int64"),
        "s_nationkey": np.array([0, 1], dtype="int32")})
    orders = pd.DataFrame({
        "o_orderkey": np.array([10, 11, 12], dtype="int64"),
        "o_custkey": np.array([1, 2, 1], dtype="int64"),
        "o_orderdate": pd.to_datetime(
            ["1996-05-01", "1996-06-01", "1997-01-01"])})  # 12: wrong yr
    lineitem = pd.DataFrame({
        "l_orderkey": np.array([10, 10, 11, 12], dtype="int64"),
        # (10,7): JP cust + JP supp ok; (10,8): JP cust + CN supp drop;
        # (11,8): CN+CN ok; (12,7): 1997 drop
        "l_suppkey": np.array([7, 8, 8, 7], dtype="int64"),
        "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
        "l_discount": [0.05, 0.0, 0.10, 0.0]})
    out = local_supplier_volume(
        rd.from_pandas(customer), rd.from_pandas(orders),
        rd.from_pandas(lineitem).repartition(2),
        rd.from_pandas(supplier), rd.from_pandas(nation),
        rd.from_pandas(region), region_name="ASIA", year=1996)
    m = dict(zip(out["n_name"], out["revenue_c"]))
    assert m == {"JAPAN": 1000 * 95, "CHINA": 3000 * 90}
    assert out["n_name"].tolist() == ["CHINA", "JAPAN"]  # revenue desc


def test_large_volume_customers_q18(ray_session):
    """Q18 shape: HAVING cut, joins, cents, top-k tie-break."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        large_volume_customers)

    customer = pd.DataFrame({
        "c_custkey": np.array([1, 2], dtype="int64"),
        "c_name": ["Cust1", "Cust2"]})
    orders = pd.DataFrame({
        "o_orderkey": np.array([10, 11, 12], dtype="int64"),
        "o_custkey": np.array([1, 2, 1], dtype="int64"),
        "o_orderdate": pd.to_datetime(["2000-01-02", "2000-01-01",
                                       "2000-03-01"]),
        "o_totalprice": [100.0, 100.0, 50.0]})
    lineitem = pd.DataFrame({
        "l_orderkey": np.array([10, 10, 11, 11, 12], dtype="int64"),
        # 10: 30+20=50 (cut), 11: 40+25=65 (keep), 12: 70 (keep)
        "l_quantity": [30.0, 20.0, 40.0, 25.0, 70.0]})
    out = large_volume_customers(
        rd.from_pandas(customer), rd.from_pandas(orders).repartition(2),
        rd.from_pandas(lineitem).repartition(3), threshold=60, k=10)
    assert out["o_orderkey"].tolist() == [11, 12]   # price desc
    assert out["qty"].tolist() == [65, 70]
    assert out["total_c"].tolist() == [10000, 5000]
    assert out["rank"].tolist() == [1, 2]
    assert out["c_name"].tolist() == ["Cust2", "Cust1"]


def test_confusion_matrix_counts(ray_session):
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        confusion_matrix)

    df = pd.DataFrame({
        "y": ["a", "a", "a", "b", "b", "c"],
        "p": ["a", "a", "b", "b", "a", "c"]})
    out = confusion_matrix(rd.from_pandas(df).repartition(3), "y", "p")
    m = {(r.truth, r.pred): r.n for r in out.itertuples()}
    assert m == {("a", "a"): 2, ("a", "b"): 1, ("b", "b"): 1,
                 ("b", "a"): 1, ("c", "c"): 1}
    assert out["n"].dtype == np.int64


def test_compression_metrics_signal(ray_session):
    """Pinned vs direct zlib; repeated text compresses far better
    than varied text; empty text yields zeros."""
    import zlib

    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        compression_metrics)

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype="int64"),
        "text": ["spam " * 400,
                 " ".join(f"w{i}x{i * 7 % 113}" for i in range(400)),
                 ""]})
    out = (rd.from_pandas(df).repartition(2)
           .map_batches(compression_metrics, batch_format="pandas")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i in range(2):
        raw = df.loc[i, "text"].encode()
        assert out.loc[i, "n_bytes"] == len(raw)
        assert out.loc[i, "z_bytes"] == len(zlib.compress(raw, 6))
        assert out.loc[i, "ratio_micro"] == int(np.floor(
            len(raw) / len(zlib.compress(raw, 6)) * 1e6 + 0.5))
    assert out.loc[0, "ratio_micro"] > 3 * out.loc[1, "ratio_micro"]
    assert (out.loc[2, ["n_bytes", "z_bytes", "ratio_micro"]] == 0).all()


def test_stratified_split_quotas(ray_session):
    """Exact per-stratum eval sizes, small-stratum val-first fill,
    partition-invariant determinism, full-row coverage."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        stratified_split)

    df = pd.DataFrame({
        "doc_id": np.arange(130, dtype="int64"),
        "lang": (["en"] * 100 + ["fr"] * 25 + ["zh"] * 5)})
    out = (stratified_split(rd.from_pandas(df).repartition(5),
                            "lang", "doc_id", n_val=4, n_test=6)
           .to_pandas())
    assert len(out) == 130
    counts = out.groupby(["lang", "split"]).size()
    assert counts[("en", "val")] == 4 and counts[("en", "test")] == 6
    assert counts[("en", "train")] == 90
    assert counts[("fr", "val")] == 4 and counts[("fr", "test")] == 6
    # zh has only 5 rows: val fills first (4), then test (1), no train
    assert counts[("zh", "val")] == 4 and counts[("zh", "test")] == 1
    assert ("zh", "train") not in counts
    # determinism under repartitioning + row shuffle
    out2 = (stratified_split(
                rd.from_pandas(df.sample(frac=1.0, random_state=4))
                .repartition(9), "lang", "doc_id", n_val=4, n_test=6)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    a = out.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, out2)


def test_weighted_sample_exact_properties(ray_session):
    """Priority sampling: exact k, weight bias, determinism across
    partitionings, zero/negative weights excluded, under-k input."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        weighted_sample_exact)

    n = 600
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        # first half heavy (w=40), second half light (w=1), plus a
        # few ineligible rows
        "w": np.array([40] * (n // 2) + [1] * (n // 2), dtype="int64")})
    df.loc[[5, 6], "w"] = 0
    df.loc[7, "w"] = -3
    out = (weighted_sample_exact(rd.from_pandas(df).repartition(6),
                                 "doc_id", "w", k=100).to_pandas())
    assert len(out) == 100
    assert not set(out["doc_id"]) & {5, 6, 7}
    heavy = int((out["doc_id"] < n // 2).sum())
    assert heavy > 80            # 40:1 weights dominate the sample
    # partition-invariant determinism
    out2 = (weighted_sample_exact(
                rd.from_pandas(df.sample(frac=1.0, random_state=9))
                .repartition(11), "doc_id", "w", k=100).to_pandas())
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # fewer eligible rows than k: all eligible kept
    small = df.iloc[:10]
    o3 = weighted_sample_exact(rd.from_pandas(small), "doc_id", "w",
                               k=100).to_pandas()
    assert sorted(o3["doc_id"]) == [0, 1, 2, 3, 4, 8, 9]


def test_weighted_sample_exact_matches_sql(ray_session):
    import duckdb
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        weighted_sample_exact, weighted_sample_exact_sql)

    df = pd.DataFrame({
        "doc_id": np.arange(500, dtype="int64"),
        "w": (np.arange(500) % 13 + 1).astype("int64")})
    got = (weighted_sample_exact(rd.from_pandas(df).repartition(4),
                                 "doc_id", "w", k=50)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = (con.sql(weighted_sample_exact_sql("t", "doc_id", "w", 50))
           .df().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_events_pivot_crosstab(ray_session):
    """Wide hour-of-day matrix: fixed 24-column schema, counts land in
    the right cells, absent cells zero."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        events_pivot)

    ev = pd.DataFrame({
        "event_type": ["a", "a", "a", "b"],
        "ts": pd.to_datetime(["2020-01-01 03:15", "2020-01-02 03:59",
                              "2020-01-01 23:00", "2020-01-01 00:30"]),
    })
    out = events_pivot(rd.from_pandas(ev).repartition(3))
    assert list(out.columns) == ["event_type"] + [
        f"h{h}" for h in range(24)]
    out = out.set_index("event_type")
    assert out.loc["a", "h3"] == 2
    assert out.loc["a", "h23"] == 1
    assert out.loc["b", "h0"] == 1
    assert int(out.loc["a"].sum()) == 3
    assert (out.dtypes == np.int64).all()


def test_user_journeys_ordered_collect(ray_session):
    """string_agg ORDER BY parity: (ts, event_id) order, separator
    join, max_events truncation."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        user_journeys)

    ev = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2, 2], dtype="int64"),
        "ts": pd.to_datetime(["2020-01-01 10:00", "2020-01-01 09:00",
                              "2020-01-01 09:00", "2020-01-02 00:00",
                              "2020-01-01 00:00"]),
        "event_id": np.array([5, 9, 2, 1, 3], dtype="int64"),
        "event_type": ["buy", "view", "click", "view", "buy"],
    })
    out = (user_journeys(rd.from_pandas(ev).repartition(3))
           .to_pandas().set_index("user_id"))
    # user 1: ties on ts break by event_id (2 before 9)
    assert out.loc[1, "journey"] == "click>view>buy"
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, "journey"] == "buy>view"
    capped = (user_journeys(rd.from_pandas(ev), max_events=2)
              .to_pandas().set_index("user_id"))
    assert capped.loc[1, "journey"] == "click>view"
    assert capped.loc[1, "n_events"] == 2


def test_percent_rank_vs_pandas(ray_session):
    """Rank-based percentile transform: integer micro-units, id
    tie-break, endpoints 0 and 1e6, single-row n=1 edge."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        percent_rank)

    df = pd.DataFrame({
        "doc_id": np.arange(9, dtype="int64"),
        "v": np.array([5, 3, 3, 8, 1, 9, 3, 8, 2], dtype="int64")})
    out = (percent_rank(rd.from_pandas(df).repartition(4), "v", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # reference: ROW_NUMBER by (v asc, doc_id asc)
    ref = df.sort_values(["v", "doc_id"]).reset_index(drop=True)
    ref["rank"] = np.arange(1, len(ref) + 1, dtype="int64")
    ref["pct_micro"] = (ref["rank"] - 1) * 1_000_000 // (len(ref) - 1)
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert (out["rank"].to_numpy() == ref["rank"].to_numpy()).all()
    assert (out["pct_micro"].to_numpy()
            == ref["pct_micro"].to_numpy()).all()
    assert out["pct_micro"].min() == 0
    assert out["pct_micro"].max() == 1_000_000
    # n = 1: denominator clamps, pct 0
    one = percent_rank(
        rd.from_pandas(df.iloc[:1]), "v", "doc_id").to_pandas()
    assert one["pct_micro"].tolist() == [0]


def test_revenue_rollup_levels(ray_session):
    """ROLLUP(n_name, order_year): fine rows + per-nation subtotals
    (order_year=-1) + grand total ('ALL') vs a hand computation;
    orphan orders drop like the plain star aggregate."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        revenue_rollup)

    orders = pd.DataFrame({
        "o_custkey": np.array([1, 1, 2, 3, 99], dtype="int64"),
        "o_orderdate": pd.to_datetime(
            ["1995-03-01", "1996-07-09", "1995-12-31", "1996-01-01",
             "1995-05-05"]),
        "o_totalprice": [10.005, 20.0, 5.5, 7.25, 100.0],  # 99: orphan
    })
    customer = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3], dtype="int64"),
        "c_nationkey": np.array([0, 0, 1], dtype="int32"),
    })
    nation = pd.DataFrame({
        "n_nationkey": np.array([0, 1], dtype="int32"),
        "n_name": ["A", "B"],
    })
    out = revenue_rollup(rd.from_pandas(orders).repartition(3),
                         rd.from_pandas(customer),
                         rd.from_pandas(nation))
    rows = {(r.n_name, r.order_year): (r.revenue_c, r.n_orders)
            for r in out.itertuples()}
    assert rows[("A", 1995)] == (1001 + 550, 2)
    assert rows[("A", 1996)] == (2000, 1)
    assert rows[("B", 1996)] == (725, 1)
    assert rows[("A", -1)] == (3551, 3)       # nation subtotal
    assert rows[("B", -1)] == (725, 1)
    assert rows[("ALL", -1)] == (4276, 4)     # grand total
    assert len(rows) == 6
    assert out["order_year"].dtype == np.int64
    assert out["revenue_c"].dtype == np.int64


def test_shipping_priority_q3_hand_case(ray_session):
    """Q3 shape: segment filter, order-date/ship-date cuts, discounted
    integer-cents revenue, top-k tie-break — vs a hand computation and
    the operator's own DuckDB oracle."""
    import duckdb
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        shipping_priority, shipping_priority_sql)

    customer = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3], dtype="int64"),
        "c_mktsegment": ["BUILDING", "AUTO", "BUILDING"],
    })
    orders = pd.DataFrame({
        "o_orderkey": np.array([10, 11, 12, 13], dtype="int64"),
        "o_custkey": np.array([1, 2, 3, 1], dtype="int64"),
        # 13 is AFTER the cutoff -> excluded even though cust 1 matches
        "o_orderdate": pd.to_datetime(
            ["2000-01-01", "2000-01-02", "1999-06-01", "2000-03-01"]
        ).astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "1-URGENT"],
    })
    lineitem = pd.DataFrame({
        "l_orderkey": np.array([10, 10, 11, 12, 12], dtype="int64"),
        # second row of order 10 ships BEFORE the cutoff -> no revenue
        "l_shipdate": pd.to_datetime(
            ["2000-03-01", "2000-01-15", "2000-04-01", "2000-05-01",
             "2000-06-01"]).astype("datetime64[us]"),
        "l_extendedprice": [10.0, 99.0, 50.0, 20.0, 30.0],
        "l_discount": [0.10, 0.0, 0.05, 0.0, 0.50],
    })
    out = shipping_priority(
        rd.from_pandas(customer).repartition(2),
        rd.from_pandas(orders).repartition(2),
        rd.from_pandas(lineitem).repartition(3),
        segment="BUILDING", cutoff="2000-02-01", k=10)
    # order 10: cust 1 BUILDING, placed 1/1 < 2/1, one line ships after
    #   -> 1000c * 90 = 90000;  order 11: cust 2 wrong segment -> out
    # order 12: 2000c*100 + 3000c*50 = 350000;  order 13: placed after
    assert out["o_orderkey"].tolist() == [12, 10]
    assert out["revenue_c"].tolist() == [350000, 90000]
    assert out["rank"].tolist() == [1, 2]

    con = duckdb.connect()
    con.register("customer", customer)
    con.register("orders", orders)
    con.register("lineitem", lineitem)
    oracle = con.execute(
        shipping_priority_sql(segment="BUILDING",
                              cutoff="2000-02-01", k=10)).fetchdf()
    assert out["o_orderkey"].tolist() == oracle["o_orderkey"].tolist()
    assert out["revenue_c"].tolist() == oracle["revenue_c"].tolist()
    assert [t.date().isoformat() for t in out["o_orderdate"]] == \
        [t.date().isoformat() for t in oracle["o_orderdate"]]


def test_bloom_semi_join_matches_exact(ray_session):
    """The bloom pre-filter must never change the result — a TINY
    sketch (64 bits, guaranteed false positives) still yields output
    bit-identical to the plain bucketed join, for semi AND anti."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        bloom_semi_join)
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "event_id": np.arange(400, dtype="int64"),
        "user_id": rng.integers(0, 100, 400).astype("int64")})
    right = pd.DataFrame(
        {"user_id": rng.choice(100, 17, replace=False).astype("int64")})
    ls = {"event_id": "int64", "user_id": "int64"}
    rs = {"user_id": "int64"}

    for how in ("semi", "anti"):
        want = (bucketed_join(rd.from_pandas(left).repartition(4),
                              rd.from_pandas(right).repartition(2),
                              on="user_id", left_schema=ls,
                              right_schema=rs, how=how)
                .to_pandas().sort_values("event_id")
                .reset_index(drop=True))
        for m_bits in (64, 1 << 12):          # saturated and roomy
            got = (bloom_semi_join(rd.from_pandas(left).repartition(4),
                                   rd.from_pandas(right).repartition(2),
                                   on="user_id", left_schema=ls,
                                   right_schema=rs, how=how,
                                   m_bits=m_bits)
                   .to_pandas().sort_values("event_id")
                   .reset_index(drop=True))
            pd.testing.assert_frame_equal(
                got[["event_id", "user_id"]],
                want[["event_id", "user_id"]])
    # sanity: semi + anti partition the left side
    assert True


def test_user_window_functions_hand_case(ray_session):
    """Running sum / lag / row-number per user vs DuckDB window
    functions, including single-event users (delta -1) and ts ties
    broken by event_id."""
    import duckdb
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        USER_WINDOW_SQL, user_window_functions)

    events = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 5, 6], dtype="int64"),
        "user_id": np.array([7, 7, 7, 8, 9, 9], dtype="int64"),
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 00:00:10",
             "2024-01-01 00:00:10",  # tie with event 2 -> event_id order
             "2024-01-02 00:00:00", "2024-01-03 00:00:00",
             "2024-01-03 00:00:01"]).astype("datetime64[us]"),
        "value": [1.0, 2.5, 0.5, 10.0, 3.0, 4.0],
    })
    out = (user_window_functions(rd.from_pandas(events).repartition(3),
                                 num_buckets=5)
           .to_pandas().sort_values(["user_id", "seq"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", events)
    oracle = (con.execute(USER_WINDOW_SQL).fetchdf()
              .sort_values(["user_id", "seq"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["event_id", "user_id", "seq", "cum_value_c", "delta_us"]],
        oracle[["event_id", "user_id", "seq", "cum_value_c", "delta_us"]])
    # spot pins: user 7 cumsum 100, 350, 400; tie kept event 2 before 3;
    # first event of each user has delta -1
    u7 = out[out["user_id"] == 7]
    assert u7["cum_value_c"].tolist() == [100, 350, 400]
    assert u7["event_id"].tolist() == [1, 2, 3]
    assert u7["delta_us"].tolist() == [-1, 10_000_000, 0]
    assert out[out["seq"] == 1]["delta_us"].unique().tolist() == [-1]


def test_weighted_sample_rates_and_determinism(ray_session):
    """Keep decisions follow the per-row md5 threshold exactly (local
    recomputation), rates clip to [min, 1000], and weight=scale keeps
    ~everything while tiny weights keep ~min_x1000/1000."""
    import hashlib

    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        weighted_sample)

    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "w": np.where(np.arange(n) % 2 == 0, 50, 1000).astype("int64"),
    })
    out = (weighted_sample(rd.from_pandas(df), "id", "w", scale=1000,
                           min_x1000=100)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # exact per-row recomputation
    kept = set()
    for i, w in zip(df["id"], df["w"]):
        r = min(max(1000 * w // 1000, 100), 1000)
        h8 = hashlib.md5(f"wgt:{i}".encode()).hexdigest()[:8]
        thr = format(min(r * (1 << 32) // 1000, (1 << 32) - 1), "08x")
        if h8 < thr:
            kept.add(int(i))
    assert set(out["id"]) == kept
    assert set(out["rate_x1000"]) == {100, 1000}
    lo = out[out["w"] == 50]
    hi = out[out["w"] == 1000]
    assert len(hi) > 0.95 * (n / 2)           # rate 1000 keeps ~all
    assert 0.05 * (n / 2) < len(lo) < 0.15 * (n / 2)   # rate 100 ≈ 10%


def test_retention_cohorts_hand_case(ray_session):
    """Cohort = week of first signup; retained at offset k iff any
    event lands in cohort-week+k; pre-signup events and never-signed-up
    users are excluded."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        retention_cohorts)

    # 2026-01-05 is a Monday → week boundary-safe offsets
    base = pd.Timestamp("2026-01-05")

    def ev(uid, days, typ):
        return {"user_id": uid, "ts": base + pd.Timedelta(days=days),
                "event_type": typ}

    rows = [
        # u1: signs up week 0, active weeks 0 and 2
        ev(1, 0, "signup"), ev(1, 2, "click"), ev(1, 15, "view"),
        # u2: pre-signup event (ignored), signup week 1, active week 1
        ev(2, 3, "view"), ev(2, 8, "signup"), ev(2, 9, "click"),
        # u3: never signs up
        ev(3, 0, "view"),
    ]
    df = pd.DataFrame(rows)
    out = (retention_cohorts(rd.from_pandas(df))
           .to_pandas().sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    w0 = int(out["cohort_week"].min())
    got = {(int(r.cohort_week) - w0, int(r.week_offset)): int(r.n_users)
           for r in out.itertuples()}
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_approx_topk_tokens_mg_bounds(ray_session):
    """MG lower bounds: n_lb <= exact <= n_lb + N/(capacity+1), and the
    head of the exact top-k (tokens above the error bound) is fully
    recalled, on a Zipf-ish vocabulary with capacity << vocab."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        TOKEN_RE, approx_topk_tokens)

    rng = np.random.default_rng(13)
    vocab = np.array([f"tok{i}" for i in range(2000)])
    p = 1.0 / np.arange(1, 2001) ** 1.2
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=200, p=p)) for _ in range(100)]
    df = pd.DataFrame({"doc_id": np.arange(100, dtype="int64"),
                       "text": texts})
    exact = pd.Series(
        [t for s in texts for t in TOKEN_RE.findall(s)]).value_counts()
    total = int(exact.sum())
    cap = 64
    got = approx_topk_tokens(rd.from_pandas(df), k=20, capacity=cap)
    err = total // (cap + 1)
    for r in got.itertuples():
        ex = int(exact.get(r.token, 0))
        assert r.n_lb <= ex <= r.n_lb + err, (r.token, r.n_lb, ex, err)
    # every token with exact count > err must appear in the candidates
    heavy = set(exact[exact > err].head(20).index)
    assert heavy <= set(got["token"]), heavy - set(got["token"])


def test_exact_sample_exact_n_and_block_invariant(ray_session):
    """exact_sample returns EXACTLY n rows — the n smallest
    md5(salt|id) digests — regardless of block structure; n >= corpus
    keeps everything."""
    import hashlib

    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import exact_sample

    n_rows = 300
    df = pd.DataFrame({"doc_id": np.arange(n_rows, dtype="int64"),
                       "payload": [f"p{i}" for i in range(n_rows)]})
    exp = set(sorted(
        range(n_rows),
        key=lambda v: hashlib.md5(f"exact|{v}".encode()).hexdigest())[:40])

    for nblocks in (1, 7):
        ds = rd.from_pandas(df).repartition(nblocks)
        got = exact_sample(ds, "doc_id", n=40).to_pandas()
        assert set(got["doc_id"]) == exp
        assert list(got.columns) == ["doc_id", "payload"]  # full rows

    got_all = exact_sample(rd.from_pandas(df), "doc_id", n=1000).to_pandas()
    assert len(got_all) == n_rows


def test_scrub_dup_lines_boilerplate_removal(ray_session):
    """Lines shared by >=2 docs vanish from every doc, unique lines
    and sub-min_chars lines survive, fully-scrubbed docs come back as
    empty rows, and the result is bucket-count invariant."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        scrub_dup_lines)

    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype="int64"),
        "text": ["COPYRIGHT FOOTER\nunique one\n\nkeep me",
                 "COPYRIGHT FOOTER\nunique two",
                 "COPYRIGHT FOOTER",          # fully boilerplate
                 None],                       # null text → empty doc
    })
    exp = {1: "unique one\n\nkeep me",        # empty line survives
           2: "unique two",
           3: "",
           4: ""}
    for kw in ({}, {"num_buckets": 5}):
        out = (scrub_dup_lines(rd.from_pandas(df), min_docs=2, **kw)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert dict(zip(out["doc_id"], out["text"])) == exp


def test_shuffle_rank_is_deterministic_permutation(ray_session):
    """Positions are a permutation of 1..N, stable across block layouts
    and runs, and actually shuffled (not identity order)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import shuffle_rank

    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64")})
    outs = []
    for nblocks in (1, 7):
        got = (shuffle_rank(rd.from_pandas(df).repartition(nblocks),
                            "doc_id")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert sorted(got["pos"]) == list(range(1, 201))
        outs.append(got["pos"].tolist())
    assert outs[0] == outs[1]                       # layout-invariant
    assert outs[0] != sorted(outs[0])               # actually permuted


def test_collapse_repeated_lines_hand_case(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.textstats import (
        collapse_repeated_lines)
    df = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["x\nx\nx\ny\nx",      # run of 3 collapses, later x kept
                 "menu\nmenu\nbody\nmenu\nmenu\nmenu",
                 "",                    # empty doc survives as ''
                 "solo"]})
    got = (collapse_repeated_lines(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["x\ny\nx", "menu\nbody\nmenu", "", "solo"],
        "n_dropped": np.array([2, 3, 0, 0], dtype="int64")})
    pd.testing.assert_frame_equal(got, exp)


def test_collapse_repeated_lines_matches_local_reference(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.textstats import (
        collapse_repeated_lines)
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas()
    # plant consecutive duplicates so the op has real work
    df["text"] = df["text"].map(
        lambda t: "\n".join(ln for ln in (t or "").split("\n")
                            for _ in range(2)))
    got = (collapse_repeated_lines(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    rows = []
    for _, r in df.iterrows():
        lines = (r["text"] or "").split("\n")
        kept = [ln for i, ln in enumerate(lines)
                if i == 0 or ln != lines[i - 1]]
        rows.append((r["doc_id"], "\n".join(kept), len(lines) - len(kept)))
    exp = (pd.DataFrame(rows, columns=["doc_id", "text", "n_dropped"])
           .astype({"n_dropped": "int64"})
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert (exp["n_dropped"] > 0).any()


def test_contamination_report_matches_local_reference(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import _hex_threshold
    from automatic_reference_extractor_ray.ops.textstats import (
        _tokens, contamination_report)
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas()
    n, frac = 3, 0.2
    got = (contamination_report(rd.from_pandas(df), n=n, eval_frac=frac)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    thr = _hex_threshold(frac)

    def h8(d):
        return hashlib.md5(str(d).encode()).hexdigest()[:8]

    def grams(t):
        toks = _tokens(t)
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    train = {r["doc_id"]: grams(r["text"]) for _, r in df.iterrows()
             if h8(r["doc_id"]) >= thr}
    rows = []
    for _, r in df.iterrows():
        if h8(r["doc_id"]) < thr:
            eg = grams(r["text"])
            rows.append((r["doc_id"],
                         sum(1 for tg in train.values() if eg & tg)))
    exp = (pd.DataFrame(rows, columns=["doc_id", "n_train_docs"])
           .astype({"n_train_docs": "int64"})
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # non-degenerate: every eval doc present, some leaked, some clean
    assert len(exp) == sum(1 for d in df["doc_id"] if h8(d) < thr)
    assert (exp["n_train_docs"] > 0).any()


def test_contamination_report_bucket_invariant(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.textstats import (
        contamination_report)
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas().head(200)
    outs = []
    for nb in (8, 64):
        outs.append(contamination_report(rd.from_pandas(df), n=3,
                                         eval_frac=0.2, num_buckets=nb)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_temperature_sample_rates_and_determinism(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        temperature_sample)
    n_big, n_small = 4000, 250
    df = pd.DataFrame({
        "doc_id": [f"d{i:05d}" for i in range(n_big + n_small)],
        "lang": ["en"] * n_big + ["zz"] * n_small})
    alpha = 0.6
    got = temperature_sample(rd.from_pandas(df), "lang", "doc_id",
                             alpha=alpha).to_pandas()
    # smallest group keeps EVERYTHING (its rate is exactly 1.0)
    assert (got["lang"] == "zz").sum() == n_small
    # big group downsampled near its analytic rate (n_big/n_min)^(a-1)
    rate = (n_big / n_small) ** (alpha - 1.0)
    kept_big = (got["lang"] == "en").sum()
    assert abs(kept_big / n_big - rate) < 0.05
    # deterministic: identical rerun, and row-level md5 rule holds
    again = temperature_sample(rd.from_pandas(df), "lang", "doc_id",
                               alpha=alpha).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))
    thr = format(int(rate * 4294967296), "08x")
    for d in df.loc[df["lang"] == "en", "doc_id"].head(200):
        h8 = hashlib.md5(f"temp:{d}".encode()).hexdigest()[:8]
        assert (h8 < thr) == (d in set(got["doc_id"]))
    # alpha=1 keeps everything; bad alpha raises
    all_kept = temperature_sample(rd.from_pandas(df), "lang", "doc_id",
                                  alpha=1.0).to_pandas()
    assert len(all_kept) == len(df)
    with pytest.raises(ValueError):
        temperature_sample(rd.from_pandas(df), "lang", "doc_id", alpha=0.0)


def test_returned_item_report_q10(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.relational import (
        returned_item_report)
    import pyarrow.parquet as pq
    sf = "/root/testdata/sf0.001"
    t = {n: pq.read_table(f"{sf}/{n}.parquet").to_pandas()
         for n in ("lineitem", "orders", "customer", "nation")}
    got = returned_item_report(
        rd.from_pandas(t["lineitem"]), rd.from_pandas(t["orders"]),
        rd.from_pandas(t["customer"]), rd.from_pandas(t["nation"]),
        date_from="1996-01-01", date_to="1997-01-01", k=15)
    # local pandas reference with the same integer-cents math
    li = t["lineitem"][t["lineitem"]["l_returnflag"] == "R"].copy()
    li["rev_c"] = (np.round(li["l_extendedprice"] * 100).astype("int64")
                   * (100 - np.round(li["l_discount"] * 100).astype("int64")))
    o = t["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1996-01-01"))
          & (o["o_orderdate"] < pd.Timestamp("1997-01-01"))]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    per_cust = m.groupby("o_custkey")["rev_c"].sum().rename("revenue_c")
    c = t["customer"].set_index("c_custkey")
    exp = per_cust.to_frame().join(c, how="inner")
    exp["acctbal_c"] = np.round(exp["c_acctbal"] * 100).astype("int64")
    nmap = t["nation"].set_index("n_nationkey")["n_name"]
    exp["n_name"] = exp["c_nationkey"].map(nmap)
    exp = (exp.reset_index(names="c_custkey")
           .sort_values(["revenue_c", "c_custkey"],
                        ascending=[False, True], kind="mergesort").head(15)
           .reset_index(drop=True))
    exp.insert(0, "rank", np.arange(1, len(exp) + 1, dtype="int64"))
    exp = exp[["rank", "c_custkey", "c_name", "n_name", "acctbal_c",
               "revenue_c"]]
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    assert len(got) == 15


def test_parts_supplier_counts_q16(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.relational import (
        parts_supplier_counts)
    import pyarrow.parquet as pq
    sf = "/root/testdata/sf0.001"
    t = {n: pq.read_table(f"{sf}/{n}.parquet").to_pandas()
         for n in ("lineitem", "part", "supplier")}
    # sf0.001 has no negative balances — plant complaints so the anti
    # join is non-degenerate (the sf0.01 gate corpus has 6 naturally)
    t["supplier"] = t["supplier"].copy()
    t["supplier"].loc[t["supplier"].index[::7], "s_acctbal"] = -10.0
    got = (parts_supplier_counts(
        rd.from_pandas(t["lineitem"]), rd.from_pandas(t["part"]),
        rd.from_pandas(t["supplier"])).to_pandas()
        .sort_values(["p_brand", "p_type", "p_size"])
        .reset_index(drop=True))
    bad = set(t["supplier"].loc[t["supplier"]["s_acctbal"] < 0,
                                "s_suppkey"])
    pairs = (t["lineitem"][["l_partkey", "l_suppkey"]].drop_duplicates())
    pairs = pairs[~pairs["l_suppkey"].isin(bad)]
    m = pairs.merge(t["part"], left_on="l_partkey", right_on="p_partkey")
    exp = (m.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
           .nunique().rename("supplier_cnt").reset_index()
           .astype({"p_size": "int64", "supplier_cnt": "int64"})
           .sort_values(["p_brand", "p_type", "p_size"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert len(bad) > 0 and len(exp) > 100


def test_grouped_outliers_matches_numpy_and_boundary(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        grouped_outliers)
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(3000)],
        "lang": rng.choice(["en", "de", "fr"], size=3000),
        "n_chars": rng.integers(100, 2000, size=3000).astype("int64")})
    # plant extreme values so flags exist
    df.loc[df.index[:5], "n_chars"] = 90000
    got = (grouped_outliers(rd.from_pandas(df), "lang", "n_chars",
                            "doc_id", k_sigma=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp_flags = {}
    for g, sub in df.groupby("lang"):
        x = sub["n_chars"].to_numpy("int64")
        n, s, ss = len(x), int(x.sum()), int((x * x).sum())
        for d, v in zip(sub["doc_id"], x):
            dlt = n * int(v) - s
            exp_flags[d] = int(dlt * dlt > 9 * (n * ss - s * s))
    assert (got["is_outlier"].to_numpy()
            == np.array([exp_flags[d] for d in got["doc_id"]])).all()
    assert got["is_outlier"].sum() == 5
    # boundary is STRICT: |x - mu| == k*sigma exactly must not flag
    # (group [0,0,18,18] with k=3: mu=9, sigma=9, 18-9 == 1*9... use
    # k=1: n*x-s = 4*18-36 = 36; k2*(n*ss-s2) = 1*(4*648-1296) = 1296
    # = 36*36 -> strict > fails -> not an outlier)
    b = pd.DataFrame({"doc_id": ["a", "b", "c", "d"],
                      "lang": ["x"] * 4,
                      "n_chars": np.array([0, 0, 18, 18], dtype="int64")})
    gb = grouped_outliers(rd.from_pandas(b), "lang", "n_chars",
                          "doc_id", k_sigma=1).to_pandas()
    assert gb["is_outlier"].sum() == 0


def test_distribution_match_flattens_and_is_deterministic(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import (
        distribution_match)
    rng = np.random.default_rng(11)
    # skewed lengths: bin shares ~ (0.7, 0.2, 0.1) over [0, 300)
    vals = np.concatenate([
        rng.integers(0, 100, 7000), rng.integers(100, 200, 2000),
        rng.integers(200, 300, 1000)]).astype("int64")
    df = pd.DataFrame({"doc_id": [f"d{i:05d}" for i in range(len(vals))],
                       "n_chars": vals})
    got = distribution_match(rd.from_pandas(df), "n_chars", "doc_id",
                             0, 300, 3).to_pandas()
    # the rarest bin keeps everything; kept shares flatten toward
    # uniform (each bin ends up near the rare bin's count)
    kept = got.groupby("bin").size()
    assert kept[2] == 1000
    assert abs(kept[0] - 1000) < 100 and abs(kept[1] - 1000) < 100
    # deterministic rerun + row-level md5 rule on a sample
    again = distribution_match(rd.from_pandas(df), "n_chars", "doc_id",
                               0, 300, 3).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))
    rate0 = (1 / 3) / (7000 / 10000)
    rate0 /= (1 / 3) / (1000 / 10000)
    thr0 = format(int(rate0 * 4294967296), "08x")
    in_got = set(got["doc_id"])
    for d, v in list(zip(df["doc_id"], df["n_chars"]))[:300]:
        if v < 100:
            h8 = hashlib.md5(f"dmatch:{d}".encode()).hexdigest()[:8]
            assert (h8 < thr0) == (d in in_got)
    # bad target length raises
    with pytest.raises(ValueError):
        distribution_match(rd.from_pandas(df), "n_chars", "doc_id",
                           0, 300, 3, target=[0.5, 0.5])


def test_global_prospects_q22(ray_session):
    import ray.data as rd
    import pyarrow.parquet as pq
    from automatic_reference_extractor_ray.ops.relational import (
        global_prospects)
    sf = "/root/testdata/sf0.001"
    t = {n: pq.read_table(f"{sf}/{n}.parquet").to_pandas()
         for n in ("customer", "orders", "nation")}
    got = global_prospects(rd.from_pandas(t["customer"]),
                           rd.from_pandas(t["orders"]),
                           rd.from_pandas(t["nation"]))
    c = t["customer"].copy()
    c["c"] = np.round(c["c_acctbal"] * 100).astype("int64")
    pos = c.loc[c["c"] > 0, "c"]
    n_pos, s_pos = len(pos), int(pos.sum())
    o = t["orders"]
    with_recent = set(
        o.loc[o["o_orderdate"] >= pd.Timestamp("2000-01-01"), "o_custkey"])
    sel = c[(c["c"] * n_pos > s_pos)
            & ~c["c_custkey"].isin(with_recent)]
    nmap = t["nation"].set_index("n_nationkey")["n_name"]
    exp = (sel.assign(n_name=sel["c_nationkey"].map(nmap))
           .groupby("n_name")["c"].agg(["size", "sum"]).reset_index()
           .rename(columns={"size": "n_prospects",
                            "sum": "total_acctbal_c"})
           .astype({"n_prospects": "int64", "total_acctbal_c": "int64"})
           .sort_values("n_name", kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert len(exp) > 1 and exp["n_prospects"].sum() > 0


def test_collocations_pmi_rank(ray_session):
    """Planted 'zig zag' collocation: rare tokens that always co-occur
    outrank frequent-token bigrams; score is the exact integer ratio
    and the output is deterministic across runs."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        collocations)

    rows = []
    for i in range(40):
        # common filler: 'the data' everywhere, 'zig zag' in 10 docs
        txt = "the data flows the data rests"
        if i % 4 == 0:
            txt += " zig zag"
        rows.append({"doc_id": i, "text": txt})
    docs = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    out = collocations(docs, k=10, min_count=5)
    out2 = collocations(docs, k=10, min_count=5)
    pd.testing.assert_frame_equal(out, out2)
    assert out.iloc[0]["a"] == "zig" and out.iloc[0]["b"] == "zag"
    # exact integer score: c_ab * N * 1e4 // (c_a * c_b)
    n_total = 40 * 6 + 10 * 2
    assert out.iloc[0]["score_e4"] == 10 * n_total * 10000 // (10 * 10)
    # 'the data' appears 80 times but its parts are frequent -> lower
    td = out[(out["a"] == "the") & (out["b"] == "data")]
    assert len(td) == 1 and td.iloc[0]["score_e4"] < out.iloc[0]["score_e4"]


def test_collocations_property_random_corpora(ray_session):
    """Property: on random corpora the distributed op equals an
    independent pure-Python PMI-rank reference (exact integer score,
    same tie order)."""
    from collections import Counter

    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import (
        TOKEN_RE, collocations)

    for seed in (1, 7, 23):
        rng = np.random.Generator(np.random.PCG64(seed))
        vocab = [f"t{j}" for j in range(int(rng.integers(5, 40)))]
        rows = []
        for i in range(int(rng.integers(5, 60))):
            n = int(rng.integers(0, 30))
            rows.append({"doc_id": i,
                         "text": " ".join(rng.choice(vocab, n))})
        docs = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
        k, mc = 15, 2
        got = collocations(docs, k=k, min_count=mc)

        uni, bi, total = Counter(), Counter(), 0
        for r in rows:
            toks = TOKEN_RE.findall(r["text"].lower())
            total += len(toks)
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        ref = []
        for (a, b), c in bi.items():
            if c < mc:
                continue
            ref.append((a, b, c, c * total * 10_000
                        // (uni[a] * uni[b])))
        ref.sort(key=lambda r: (-r[3], r[0], r[1]))
        want = pd.DataFrame(ref[:k], columns=["a", "b", "c_ab",
                                              "score_e4"])
        want["c_ab"] = want["c_ab"].astype("int64")
        want["score_e4"] = want["score_e4"].astype("int64")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True))


def test_user_windows_chunked_supernode(ray_session):
    """The hot-key escape hatch (chunk_days): a supernode user holding
    half the corpus is split across time chunks — the exchange never
    co-locates the user whole — and the carried prefix state stitches
    the sequential frame back BIT-EXACT vs the SQL oracle and the
    default path."""
    import duckdb
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        USER_WINDOW_SQL, user_window_functions)

    rng = np.random.Generator(np.random.PCG64(42))
    n = 1200
    hot = rng.random(n) < 0.5                 # user 7 = half the events
    user = np.where(hot, 7, rng.integers(100, 160, n)).astype("int64")
    # 60 days of activity -> chunk_days=7 spreads user 7 over ~9 chunks
    ts = (pd.Timestamp("2024-01-01").value // 1000
          + rng.integers(0, 60 * 86_400_000_000, n))
    # plant exact-ts ties (event_id breaks them) incl. across chunks
    ts[10] = ts[11]
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": user,
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
        "value": np.round(rng.random(n) * 50, 2),
    })
    chunked = (user_window_functions(
        rd.from_pandas(events).repartition(5), num_buckets=7,
        chunk_days=7)
        .to_pandas().sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", events)
    oracle = (con.execute(USER_WINDOW_SQL).fetchdf()
              .sort_values("event_id").reset_index(drop=True))
    cols = ["event_id", "user_id", "seq", "cum_value_c", "delta_us"]
    pd.testing.assert_frame_equal(chunked[cols], oracle[cols])
    default = (user_window_functions(
        rd.from_pandas(events).repartition(5), num_buckets=7)
        .to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(chunked[cols], default[cols])
    # the hatch really splits the hot user: >1 distinct chunk
    hot_ts = events.loc[events["user_id"] == 7, "ts"]
    hot_chunks = (hot_ts.astype("datetime64[us]").astype("int64")
                  // (7 * 86_400_000_000)).nunique()
    assert hot_chunks > 5


def test_user_journeys_chunked_supernode(ray_session):
    """Chunked user_journeys: per-chunk journey partials + carried
    prefix counts reproduce the default path and the SQL string_agg,
    including max_events truncation (later chunks prune entirely)."""
    import duckdb
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        user_journeys)

    rng = np.random.Generator(np.random.PCG64(7))
    n = 800
    hot = rng.random(n) < 0.5
    user = np.where(hot, 3, rng.integers(50, 90, n)).astype("int64")
    ts = (pd.Timestamp("2024-03-01").value // 1000
          + rng.integers(0, 40 * 86_400_000_000, n))
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": user,
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
    })
    con = duckdb.connect()
    con.register("events", events)
    oracle = (con.execute("""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id)
                 AS journey
        FROM events GROUP BY user_id""").fetchdf()
        .sort_values("user_id").reset_index(drop=True))
    got = (user_journeys(rd.from_pandas(events).repartition(4),
                         chunk_days=5, num_buckets=7)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events", "journey"]],
        oracle[["user_id", "n_events", "journey"]])
    # truncated form matches the default path exactly
    for k in (1, 7):
        d = (user_journeys(rd.from_pandas(events), max_events=k)
             .to_pandas().sort_values("user_id")
             .reset_index(drop=True))
        c = (user_journeys(rd.from_pandas(events), max_events=k,
                           chunk_days=5, num_buckets=6)
             .to_pandas().sort_values("user_id")
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            c[["user_id", "n_events", "journey"]],
            d[["user_id", "n_events", "journey"]])


def test_trade_volume_q7(ray_session):
    """Q7 shape: two-nation cross pairs both directions, ship-year
    window, cross-nation inequality, centi-cent revenue."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        trade_volume)

    nation = pd.DataFrame({
        "n_nationkey": np.array([0, 1, 2], dtype="int32"),
        "n_name": ["JAPAN", "CHINA", "FRANCE"]})
    supplier = pd.DataFrame({
        "s_suppkey": np.array([7, 8, 9], dtype="int64"),
        "s_nationkey": np.array([0, 1, 2], dtype="int32")})
    customer = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3], dtype="int64"),
        "c_nationkey": np.array([0, 1, 2], dtype="int32")})
    orders = pd.DataFrame({
        "o_orderkey": np.array([10, 11, 12], dtype="int64"),
        "o_custkey": np.array([1, 2, 3], dtype="int64")})
    lineitem = pd.DataFrame({
        # (10,8): JP cust <- CN supp 1995 ok; (10,7): JP<-JP same drop;
        # (11,7): CN cust <- JP supp 1996 ok; (11,9): FR supp drop;
        # (10,8)@1997: outside window
        "l_orderkey": np.array([10, 10, 11, 11, 10], dtype="int64"),
        "l_suppkey": np.array([8, 7, 7, 9, 8], dtype="int64"),
        "l_extendedprice": [10.0, 20.0, 30.0, 40.0, 50.0],
        "l_discount": [0.05, 0.0, 0.10, 0.0, 0.0],
        "l_shipdate": pd.to_datetime(
            ["1995-03-01", "1995-04-01", "1996-05-01", "1996-06-01",
             "1997-07-01"])})
    out = trade_volume(
        rd.from_pandas(supplier),
        rd.from_pandas(lineitem).repartition(2),
        rd.from_pandas(orders), rd.from_pandas(customer),
        rd.from_pandas(nation),
        nation_a="JAPAN", nation_b="CHINA",
        year_from=1995, year_to=1996)
    rows = list(out.itertuples(index=False, name=None))
    assert rows == [("CHINA", "JAPAN", 1995, 1000 * 95),
                    ("JAPAN", "CHINA", 1996, 3000 * 90)]


def test_market_share_q8(ray_session):
    """Q8 shape: part-type gate, customer-region gate, order-year
    window, exact integer share (num/den + floor-div e6)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        market_share)

    region = pd.DataFrame({"r_regionkey": np.array([0, 1], dtype="int32"),
                           "r_name": ["ASIA", "EUROPE"]})
    nation = pd.DataFrame({
        "n_nationkey": np.array([0, 1, 2], dtype="int32"),
        "n_name": ["JAPAN", "CHINA", "FRANCE"],
        "n_regionkey": np.array([0, 0, 1], dtype="int32")})
    part = pd.DataFrame({
        "p_partkey": np.array([100, 101], dtype="int64"),
        "p_type": ["STANDARD", "PROMO"]})
    supplier = pd.DataFrame({
        "s_suppkey": np.array([7, 8], dtype="int64"),
        "s_nationkey": np.array([0, 1], dtype="int32")})   # 7=JP target
    customer = pd.DataFrame({
        "c_custkey": np.array([1, 3], dtype="int64"),
        "c_nationkey": np.array([1, 2], dtype="int32")})   # 1 ASIA, 3 EU
    orders = pd.DataFrame({
        "o_orderkey": np.array([10, 11, 12], dtype="int64"),
        "o_custkey": np.array([1, 1, 3], dtype="int64"),
        "o_orderdate": pd.to_datetime(
            ["1995-02-01", "1996-02-01", "1995-03-01"])})
    lineitem = pd.DataFrame({
        # 10: JP supp STANDARD ok (target); 10: CN supp STANDARD ok
        # (non-target); 11: JP supp PROMO drop; 12: EU customer drop
        "l_orderkey": np.array([10, 10, 11, 12], dtype="int64"),
        "l_partkey": np.array([100, 100, 101, 100], dtype="int64"),
        "l_suppkey": np.array([7, 8, 7, 7], dtype="int64"),
        "l_extendedprice": [10.0, 30.0, 50.0, 70.0],
        "l_discount": [0.0, 0.0, 0.0, 0.0]})
    out = market_share(
        rd.from_pandas(part), rd.from_pandas(supplier),
        rd.from_pandas(lineitem).repartition(2),
        rd.from_pandas(orders), rd.from_pandas(customer),
        rd.from_pandas(nation), rd.from_pandas(region),
        region_name="ASIA", nation_name="JAPAN",
        part_type="STANDARD", year_from=1995, year_to=1996)
    assert out.columns.tolist() == ["o_year", "nation_rev_c",
                                    "total_rev_c", "share_e6"]
    rows = list(out.itertuples(index=False, name=None))
    nat = 1000 * 100
    tot = nat + 3000 * 100
    assert rows == [(1995, nat, tot, 1_000_000 * nat // tot)]


def test_discounted_revenue_q19(ray_session):
    """Q19 shape: disjunctive brand/qty/size branches post-filter
    inside the partkey exchange; scalar centi-cent revenue."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        discounted_revenue)

    part = pd.DataFrame({
        "p_partkey": np.array([1, 2, 3], dtype="int64"),
        "p_brand": ["Brand#2", "Brand#4", "Brand#9"],
        "p_size": np.array([3, 8, 1], dtype="int64")})
    lineitem = pd.DataFrame({
        # (1): qty 5 in [1,11], size 3 in [1,5] -> hit
        # (1): qty 20 out -> miss; (2): qty 15 size 8 -> hit
        # (3): brand not in any branch -> miss
        "l_partkey": np.array([1, 1, 2, 3], dtype="int64"),
        "l_quantity": [5.0, 20.0, 15.0, 25.0],
        "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
        "l_discount": [0.05, 0.0, 0.10, 0.0]})
    out = discounted_revenue(
        rd.from_pandas(lineitem).repartition(2), rd.from_pandas(part))
    assert out["revenue_c"].tolist() == [1000 * 95 + 3000 * 90]


def test_chunked_windows_chunk_size_invariant(ray_session):
    """The chunk_days dial is purely a memory/skew knob: any chunking
    (including one finer than the data's time span and one coarser
    than it) must give identical output."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        user_journeys, user_window_functions)

    rng = np.random.Generator(np.random.PCG64(11))
    n = 400
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, 12, n).astype("int64"),
        "ts": pd.to_datetime(
            pd.Timestamp("2024-05-01").value // 1000
            + rng.integers(0, 30 * 86_400_000_000, n), unit="us")
        .astype("datetime64[us]"),
        "value": np.round(rng.random(n) * 9, 2),
        "event_type": rng.choice(["x", "y", "z"], n),
    })
    outs = []
    for cd in (1, 9, 365):
        o = (user_window_functions(rd.from_pandas(events),
                                   num_buckets=5, chunk_days=cd)
             .to_pandas().sort_values("event_id")
             .reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    js = []
    for cd in (1, 9, 365):
        j = (user_journeys(rd.from_pandas(events), max_events=5,
                           num_buckets=5, chunk_days=cd)
             .to_pandas().sort_values("user_id")
             .reset_index(drop=True))
        js.append(j)
    pd.testing.assert_frame_equal(js[0], js[1])
    pd.testing.assert_frame_equal(js[0], js[2])
