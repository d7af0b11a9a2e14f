"""Randomized equivalence tests for the round-3 ops: each op must
match a straight-line local reference on seeded random corpora, across
block layouts (the properties a 100-TB run relies on: block-structure
invariance and exact agreement with the sequential semantics)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _rand_corpus(rng, n_docs: int):
    """Small corpora with heavy line sharing and null/empty texts."""
    pool = [f"line {i}" for i in range(6)]
    texts = []
    for _ in range(n_docs):
        kind = rng.integers(0, 10)
        if kind == 0:
            texts.append(None)
        elif kind == 1:
            texts.append("")
        else:
            k = int(rng.integers(1, 5))
            texts.append("\n".join(
                pool[int(j)] if rng.integers(0, 2) else f"u{rng.integers(1e6)}"
                for j in rng.integers(0, len(pool), k)))
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype="int64"),
                         "text": texts})


def _local_scrub(df: pd.DataFrame, min_docs: int, min_chars: int):
    per_doc = {d: (t or "").split("\n")
               for d, t in zip(df["doc_id"], df["text"])}
    nd: dict[str, set] = {}
    for d, lines in per_doc.items():
        for ln in set(lines):
            if len(ln) >= min_chars:
                nd.setdefault(ln, set()).add(d)
    removed = {ln for ln, ds in nd.items() if len(ds) >= min_docs}
    return {d: "\n".join(ln for ln in lines if ln not in removed)
            for d, lines in per_doc.items()}


def test_scrub_dup_lines_matches_local_reference(ray_session):
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        scrub_dup_lines)

    for seed in (1, 7, 23):
        rng = np.random.default_rng(seed)
        df = _rand_corpus(rng, 40)
        exp = _local_scrub(df, 2, 1)
        ds = rd.from_pandas(df).repartition(int(rng.integers(1, 6)))
        got = scrub_dup_lines(ds, min_docs=2).to_pandas()
        assert dict(zip(got["doc_id"], got["text"])) == exp, seed


def test_exact_sample_matches_local_reference(ray_session):
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import exact_sample

    for seed in (3, 11):
        rng = np.random.default_rng(seed)
        ids = rng.choice(10_000, size=150, replace=False).astype("int64")
        df = pd.DataFrame({"doc_id": ids})
        n = int(rng.integers(1, 120))
        exp = set(sorted(
            ids.tolist(),
            key=lambda v: hashlib.md5(f"exact|{v}".encode()).hexdigest())[:n])
        ds = rd.from_pandas(df).repartition(int(rng.integers(1, 8)))
        got = exact_sample(ds, "doc_id", n=n).to_pandas()
        assert len(got) == n and set(got["doc_id"]) == exp, seed


def _local_components(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully collapse, then label by min-reachable id
    return {i: find(i) for i in ids}


def test_dedup_corpus_matches_union_find(ray_session):
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import dedup_corpus

    for seed in (5, 17):
        rng = np.random.default_rng(seed)
        n = 30
        ids = list(range(n))
        df = pd.DataFrame({"doc_id": np.array(ids, dtype="int64"),
                           "text": [f"t{i}" for i in ids]})
        m = int(rng.integers(0, 25))
        pairs = [(int(a), int(b)) for a, b in
                 zip(rng.integers(0, n, m), rng.integers(0, n, m)) if a != b]
        labels = _local_components(ids, pairs)
        exp = sorted(i for i in ids if labels[i] == i)
        pr = pd.DataFrame({
            "a": np.array([p[0] for p in pairs], dtype="int64"),
            "b": np.array([p[1] for p in pairs], dtype="int64")}) \
            if pairs else pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                        "b": pd.Series([], dtype="int64")})
        got = dedup_corpus(rd.from_pandas(df),
                           pairs=rd.from_pandas(pr)).to_pandas()
        assert sorted(got["doc_id"]) == exp, seed


def test_dup_gram_fraction_matches_local_reference(ray_session):
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        _tokens, dup_gram_fraction)

    n = 3
    texts = ["the quick brown fox jumps",         # shares 'the quick brown'
             "the quick brown dog sits",
             "completely novel text here now",
             None, ""]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype="int64"),
                       "text": texts})

    def gset(t):
        tk = _tokens(t)
        return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}

    sets = {d: gset(t) for d, t in zip(df["doc_id"], df["text"])}
    holders: dict[str, set] = {}
    for d, gs in sets.items():
        for g in gs:
            holders.setdefault(g, set()).add(d)
    shared = {g for g, ds in holders.items() if len(ds) >= 2}

    got = (dup_gram_fraction(rd.from_pandas(df).repartition(3), n=n)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 1, 2, 3, 4]
    for _, row in got.iterrows():
        gs = sets[row["doc_id"]]
        nd = len(gs & shared)
        assert row["n_grams"] == len(gs)
        assert row["n_dup_grams"] == nd
        assert row["dup_frac_x1000"] == ((1000 * nd) // len(gs) if gs else 0)
    assert got.loc[0, "n_dup_grams"] >= 1      # planted shared gram
    assert got.loc[3, "n_grams"] == 0 == got.loc[4, "n_grams"]


def test_round3_ops_zero_and_empty_edges(ray_session):
    """n=0 and empty-corpus calls return empty results, never crash."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import exact_sample
    from automatic_reference_extractor_ray.ops.textstats import (
        dup_gram_fraction, scrub_dup_lines)

    df = pd.DataFrame({"doc_id": np.arange(3, dtype="int64"),
                       "text": ["a b", "a b", None]})
    assert exact_sample(rd.from_pandas(df), "doc_id", n=0).count() == 0

    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype=object)}))
    assert scrub_dup_lines(empty).count() == 0
    assert dup_gram_fraction(empty).count() == 0
    assert exact_sample(empty, "doc_id", 5).count() == 0


def test_scrub_dup_lines_paragraph_mode(ray_session):
    """delimiter='\\n\\n' dedups PARAGRAPHS: a shared paragraph
    containing single newlines vanishes whole, single-line overlap
    within differing paragraphs survives."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        scrub_dup_lines)

    boiler = "terms of use\napply here"
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype="int64"),
        "text": [f"{boiler}\n\nunique one",
                 f"{boiler}\n\nunique two",
                 "terms of use\nbut in one paragraph only"],
    })
    got = (scrub_dup_lines(rd.from_pandas(df), min_docs=2,
                           delimiter="\n\n")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["text"].tolist() == [
        "unique one", "unique two",
        "terms of use\nbut in one paragraph only"]


def test_doc_gram_hashes128_matches_string_grams():
    """The 128-bit gram-hash kernel is a bijection of the string gram
    set in practice: per-doc distinct counts match exact string sets,
    equal grams hash equal ACROSS docs, boundary-straddling windows
    are masked, and sub-n-token / null docs contribute nothing."""
    from automatic_reference_extractor_ray.ops.textstats import (
        _doc_gram_hashes128, _tokens)

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
             for _ in range(40)] + [None, "", "one two"]
    for n in (2, 4):
        dv, g1, g2 = _doc_gram_hashes128(texts, n)
        # per-doc distinct string-gram reference
        ref = {}
        for i, t in enumerate(texts):
            tk = _tokens(t)
            ref[i] = {" ".join(tk[j:j + n]) for j in range(len(tk) - n + 1)}
        got_counts = dict(zip(*np.unique(dv, return_counts=True)))
        for i, gs in ref.items():
            assert got_counts.get(i, 0) == len(gs), (n, i)
        # cross-doc equality: same gram string -> same (g1, g2);
        # distinct gram strings in this corpus -> distinct hashes
        key_of = {}
        for i in range(len(texts)):
            tk = _tokens(texts[i])
            grams_i = [" ".join(tk[j:j + n])
                       for j in range(len(tk) - n + 1)]
            mask = dv == i
            hset = set(zip(g1[mask].tolist(), g2[mask].tolist()))
            assert len(hset) == len(set(grams_i))
        all_strings = set().union(*ref.values()) if ref else set()
        all_hashes = set(zip(g1.tolist(), g2.tolist()))
        assert len(all_hashes) == len(all_strings)


def _local_window_scrub(df: pd.DataFrame, k: int, min_docs: int):
    """Straight-line ExactSubstr reference: cover every token under a
    k-window whose token tuple appears in >= min_docs distinct docs."""
    from automatic_reference_extractor_ray.ops.textstats import _tokens
    toks = {d: _tokens(t) for d, t in zip(df["doc_id"], df["text"])}
    owner: dict[tuple, set] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            owner.setdefault(tuple(ts[i:i + k]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        cov = [False] * len(ts)
        for i in range(len(ts) - k + 1):
            if len(owner[tuple(ts[i:i + k])]) >= min_docs:
                cov[i:i + k] = [True] * k
        out[d] = (" ".join(t for t, c in zip(ts, cov) if not c),
                  len(ts), sum(cov))
    return out


def test_scrub_dup_windows_matches_local_reference(ray_session):
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        scrub_dup_windows)

    for seed in (1, 7, 23):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(20)]
        shared = " ".join(rng.choice(vocab, 9))     # > k shared run
        texts = []
        for i in range(40):
            body = " ".join(rng.choice(vocab, int(rng.integers(0, 30))))
            if i % 3 == 0:
                body = f"{body} {shared} tail{i}"
            texts.append(body if i % 11 else None)
        df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                           "text": texts})
        exp = _local_window_scrub(df, 6, 2)
        ds = rd.from_pandas(df).repartition(int(rng.integers(1, 6)))
        got = scrub_dup_windows(ds, k=6, min_docs=2).to_pandas()
        assert len(got) == len(df), seed
        for r in got.itertuples():
            assert (r.text, r.n_tokens, r.n_removed) == exp[r.doc_id], (
                seed, r.doc_id)


def test_scrub_dup_windows_edges(ray_session):
    """Sub-k docs and empty corpora pass through; a mid-document
    shared run is cut wherever it sits (no line alignment needed) and
    the cut is exactly the union of its k-windows."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        scrub_dup_windows)

    run = "a b c d e f"                            # 6 shared tokens
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype="int64"),
        "text": [f"left1 {run} right1", f"left2 left2b {run} right2",
                 "tiny"],
    })
    got = (scrub_dup_windows(rd.from_pandas(df), k=4, min_docs=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["text"].tolist() == ["left1 right1",
                                    "left2 left2b right2", "tiny"]
    assert got["n_removed"].tolist() == [6, 6, 0]

    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype=object)}))
    assert scrub_dup_windows(empty).count() == 0


def test_normalize_url_idempotent_property():
    """Canonicalization is a projection: normalize∘normalize ==
    normalize over a hypothesis-driven messy-URL space."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from automatic_reference_extractor_ray.ops.weburl import normalize_url

    host_label = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ09-",
        min_size=1, max_size=8).filter(
        lambda s: not s.startswith("-") and not s.endswith("-"))
    params = st.lists(st.tuples(
        st.sampled_from(["a", "b", "utm_x", "ref", "gclid", "zz"]),
        st.integers(0, 99)), max_size=4)

    @settings(max_examples=200, deadline=None)
    @given(scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
           labels=st.lists(host_label, min_size=1, max_size=4),
           port=st.sampled_from(["", ":80", ":443", ":8080"]),
           path=st.sampled_from(["", "/", "/x", "/x/y.html"]),
           ps=params,
           frag=st.sampled_from(["", "#top", "#sec2"]))
    def check(scheme, labels, port, path, ps, frag):
        q = "&".join(f"{k}={v}" for k, v in ps)
        url = (f"{scheme}://{'.'.join(labels)}{port}{path}"
               f"{'?' + q if q else ''}{frag}")
        once = normalize_url(url)
        assert normalize_url(once) == once

    check()


def test_percent_rank_bounds_property(ray_session):
    """pct_micro is a bijection-ranked integer in [0, 1e6] hitting
    both endpoints for any n >= 2 and any value multiset."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.analytics import percent_rank

    rng = np.random.Generator(np.random.PCG64(17))
    for n in (2, 3, 17, 100):
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 5, n).astype("int64")})
        out = percent_rank(rd.from_pandas(df).repartition(3),
                           "v", "doc_id").to_pandas()
        assert out["pct_micro"].min() == 0
        assert out["pct_micro"].max() == 1_000_000
        assert out["pct_micro"].between(0, 1_000_000).all()
        assert sorted(out["rank"]) == list(range(1, n + 1))
