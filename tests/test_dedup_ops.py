"""Dedup family + bucketed shuffle primitives."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd
    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).materialize()


def _pairs(ds) -> set:
    df = ds.to_pandas()
    return set(zip(df["a"], df["b"]))


def test_bucketed_agg_equals_pandas(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_agg
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 5000, 200_000),
                       "v": rng.integers(0, 100, 200_000)})
    got = (bucketed_agg(rd.from_pandas(df), "k",
                        {"s": ("v", "sum"), "n": ("v", "size")})
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.groupby("k").agg(s=("v", "sum"), n=("v", "size"))
           .reset_index().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"s": "int64", "n": "int64"}),
        exp.astype({"s": "int64", "n": "int64"}))


def test_bucketed_distinct(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_distinct
    df = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": [9, 9, 8, 8, 7]})
    out = bucketed_distinct(rd.from_pandas(df), ["a", "b"]).to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == [(1, 9), (2, 8), (3, 7)]


def test_jaccard_exact_matches_duckdb(ray_session, docs_ds):
    import duckdb
    from automatic_reference_extractor_ray.ops.dedup import jaccard_pairs
    got = _pairs(jaccard_pairs(docs_ds, tau=0.9))
    exp = set(map(tuple, duckdb.connect().execute("""
        WITH tok AS (SELECT doc_id,
               unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token
             FROM read_parquet('/root/testdata/sf0.001/documents.parquet')),
        sizes AS (SELECT doc_id, COUNT(*) n FROM tok GROUP BY doc_id),
        inter AS (SELECT t1.doc_id a, t2.doc_id b, COUNT(*) i
                  FROM tok t1 JOIN tok t2
                    ON t1.token = t2.token AND t1.doc_id < t2.doc_id
                  GROUP BY 1, 2)
        SELECT a, b FROM inter
        JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.9""").fetchall()))
    assert got == exp


def test_minhash_verified_subset_and_recall(ray_session, docs_ds):
    """Verified MinHash pairs ⊆ exact pairs (verification is exact);
    16x4 banding at tau=0.9 should recall essentially all of them."""
    from automatic_reference_extractor_ray.ops.dedup import (
        jaccard_pairs, minhash_lsh_pairs)
    exact = _pairs(jaccard_pairs(docs_ds, tau=0.9))
    mh = _pairs(minhash_lsh_pairs(docs_ds, tau=0.9))
    assert mh <= exact
    assert len(mh) >= 0.98 * len(exact)


def test_simhash_pairs_are_close_fingerprints(ray_session, docs_ds):
    from automatic_reference_extractor_ray.ops.dedup import (
        _token_set, simhash64, simhash_pairs)
    pairs = list(_pairs(simhash_pairs(docs_ds, max_hamming=8)))[:50]
    texts = dict(zip(*(lambda d: (d["doc_id"], d["text"]))(
        docs_ds.to_pandas())))
    for a, b in pairs:
        ham = bin(simhash64(_token_set(texts[a]))
                  ^ simhash64(_token_set(texts[b]))).count("1")
        assert ham <= 8, (a, b, ham)


def test_exact_dedup_groups(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.dedup import exact_dedup
    df = pd.DataFrame({
        "doc_id": ["d1", "d2", "d3"],
        "text": ["Hello  World", "hello world", "unrelated"],
    })
    out = exact_dedup(rd.from_pandas(df)).to_pandas()
    dup = out[out["n_dups"] == 2]
    assert len(dup) == 1 and dup["keeper_doc_id"].iloc[0] == "d1"
    assert len(out) == 2


def _emb_ds():
    import ray.data as rd
    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_embedding_lsh_recall_vs_brute_force(ray_session):
    """The bucketed LSH path must recover >=95% of the exact cosine
    pairs at tau=0.4, with perfect precision (exact verification)."""
    from automatic_reference_extractor_ray.ops.dedup import (
        embedding_dup_pairs, embedding_dup_pairs_lsh)
    exact = {(r["a"], r["b"])
             for r in embedding_dup_pairs(_emb_ds(), tau=0.4).take_all()}
    lsh = {(r["a"], r["b"])
           for r in embedding_dup_pairs_lsh(_emb_ds(), tau=0.4).take_all()}
    assert exact, "baseline produced no pairs — test corpus changed?"
    assert lsh <= exact                       # precision 1
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f} ({len(lsh)}/{len(exact)})"


def test_dedup_components_chain_and_singleton(ray_session):
    """Chain 1-2-3 collapses to one component (multi-round propagation),
    4-5 to another, 6 stays a singleton keeper."""
    import pandas as pd
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import dedup_components
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["x"] * 6}))
    pairs = rd.from_pandas(pd.DataFrame({"a": [2, 1, 4], "b": [3, 2, 5]}))
    out = dedup_components(docs, pairs).to_pandas().sort_values("doc_id")
    assert list(out["component_id"]) == [1, 1, 1, 4, 4, 6]
    assert list(out["is_keeper"]) == [True, False, False, True, False, True]


def test_minhash_simhash_string_ids(ray_session):
    """String-keyed corpora exercise the coded path (doc-id hashing +
    decode through the verification join) — int corpora bypass it."""
    import pandas as pd
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import (
        jaccard_pairs, minhash_lsh_pairs, simhash_pairs)
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": ["doc-a", "doc-b", "doc-c", "doc-d"],
        "text": [base, base + " extra", base + " extra",
                 "completely different words describing unrelated topics "
                 "with zero overlap whatsoever here now"]}))
    mh = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, tau=0.8).take_all()}
    jc = {(r["a"], r["b"]) for r in jaccard_pairs(docs, tau=0.8).take_all()}
    assert ("doc-b", "doc-c") in jc and jc <= {
        ("doc-a", "doc-b"), ("doc-a", "doc-c"), ("doc-b", "doc-c")}
    assert mh == jc                      # banding recall 1.0 on near-dups
    sh = {(r["a"], r["b"]) for r in simhash_pairs(docs).take_all()}
    assert ("doc-b", "doc-c") in sh
    assert all(a < b for a, b in sh)


def test_dedup_components_raises_when_unconverged(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import dedup_components
    n = 8
    docs = rd.from_pandas(pd.DataFrame({"doc_id": list(range(n)),
                                        "text": ["x"] * n}))
    chain = rd.from_pandas(pd.DataFrame({"a": list(range(n - 1)),
                                         "b": list(range(1, n))}))
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_components(docs, chain, max_rounds=2)


def test_decontaminate_fuzzy_near_dups(ray_session):
    """Planted near-dups of eval docs drop from train; exact-Jaccard
    ground truth agrees; unrelated train docs survive."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import (
        decontaminate_fuzzy)

    def words(seed, n=40):
        rng = np.random.Generator(np.random.PCG64(seed))
        return [f"w{int(x)}" for x in rng.integers(0, 300, n)]

    eval_rows = [(1000 + i, " ".join(words(i))) for i in range(5)]
    train_rows = []
    # 0-4: near-clones of eval docs (drop one word -> J ~ 0.97)
    for i in range(5):
        train_rows.append((i, " ".join(words(i)[:-1])))
    # 5-14: unrelated
    for i in range(5, 15):
        train_rows.append((i, " ".join(words(900 + i))))
    train = pd.DataFrame({"doc_id": np.array([r[0] for r in train_rows],
                                             dtype="int64"),
                          "text": [r[1] for r in train_rows]})
    evald = pd.DataFrame({"doc_id": np.array([r[0] for r in eval_rows],
                                             dtype="int64"),
                          "text": [r[1] for r in eval_rows]})
    v = (decontaminate_fuzzy(rd.from_pandas(train).repartition(3),
                             rd.from_pandas(evald), tau=0.9)
         .to_pandas().set_index("doc_id")["keep"])
    for i in range(5):
        assert v[i] == 0, i
    for i in range(5, 15):
        assert v[i] == 1, i
    assert len(v) == 15

    # tokenizer='shingles' must forward into the eval band-hash prune
    # too — a words-mode prune against shingle-mode bands would drop
    # every cross pair and report zero contamination (found by review)
    vs = (decontaminate_fuzzy(rd.from_pandas(train).repartition(3),
                              rd.from_pandas(evald), tau=0.9,
                              tokenizer="shingles")
          .to_pandas().set_index("doc_id")["keep"])
    assert (vs[list(range(5))] == 0).all()
    assert (vs[list(range(5, 15))] == 1).all()


def test_merge_corpora_priority(ray_session):
    """Priority union: the same content in several corpora survives
    from the highest-priority one; within a corpus min doc_id wins;
    unique content always survives."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import merge_corpora

    a = pd.DataFrame({"doc_id": np.array([10, 11], dtype="int64"),
                      "text": ["shared one", "only in a"]})
    b = pd.DataFrame({"doc_id": np.array([20, 21, 22], dtype="int64"),
                      "text": ["shared one", "shared two",
                               "only in b"]})
    c = pd.DataFrame({"doc_id": np.array([30, 31], dtype="int64"),
                      "text": ["shared two", "Shared   ONE"]})  # norm dup
    out = (merge_corpora([rd.from_pandas(a).repartition(2),
                          rd.from_pandas(b),
                          rd.from_pandas(c)])
           .to_pandas().set_index("keeper_doc_id").sort_index())
    # "shared one" (normalized) exists in a(10), b(20), c(31) -> a wins
    # "shared two" in b(21), c(30) -> b wins
    keepers = set(out.index)
    assert keepers == {10, 11, 21, 22}
    assert out.loc[10, "src"] == 0
    assert out.loc[21, "src"] == 1


def test_incremental_dedup_verdicts(ray_session):
    """A new doc survives iff its content hash is absent from the base
    AND it is the min-doc_id holder within the increment; verdicts are
    bucket-count invariant and null-safe."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import (
        incremental_dedup)

    base = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype="int64"),
        "text": ["alpha beta", "gamma delta"],
    })
    new = pd.DataFrame({
        "doc_id": np.array([10, 11, 12, 13, 14], dtype="int64"),
        "text": ["ALPHA   beta",      # dup of base (normalized)
                 "epsilon zeta",      # fresh, first holder
                 "epsilon zeta",      # dup within increment
                 "eta theta",         # fresh
                 None],               # null text → fresh empty doc
    })
    out = (incremental_dedup(rd.from_pandas(base), rd.from_pandas(new))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [10, 11, 12, 13, 14]
    assert out["keep"].tolist() == [0, 1, 0, 1, 1]

    out2 = (incremental_dedup(rd.from_pandas(base), rd.from_pandas(new),
                              num_buckets=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_semantic_dedup_greedy_prune(ray_session):
    """semantic_dedup == (the op's own cluster assignment) + an exact
    local greedy lowest-id prune within each cluster; every cluster
    keeps >=1 vector, output covers every input exactly once, and the
    result is bucket-count invariant."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import semantic_dedup

    rng = np.random.default_rng(77)
    n, dim, tau = 240, 16, 0.9
    base = rng.standard_normal((n, dim))
    # plant near-duplicates: vectors 3i+1 and 3i+2 are tiny
    # perturbations of 3i for i < 30
    for i in range(30):
        base[3 * i + 1] = base[3 * i] + 0.01 * rng.standard_normal(dim)
        base[3 * i + 2] = base[3 * i] + 0.01 * rng.standard_normal(dim)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": list(base)})
    ds = rd.from_pandas(df)

    out = (semantic_dedup(ds, k=6, n_iter=5, tau=tau)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert out["vec_id"].tolist() == list(range(n))
    assert out.groupby("cluster")["is_keeper"].any().all()
    assert (~out["is_keeper"]).sum() >= 30   # planted dups get pruned

    # exact local reference: greedy lowest-id scan per (op-assigned)
    # cluster over normalized cosines
    normed = base / np.linalg.norm(base, axis=1, keepdims=True)
    for _, g in out.groupby("cluster"):
        ids = g["vec_id"].to_numpy()
        m = normed[ids]
        cos = m @ m.T
        kept: list[int] = []
        for i in range(len(ids)):
            dup = any(cos[i, j] >= tau for j in kept)
            assert bool(g["is_keeper"].to_numpy()[i]) == (not dup), ids[i]
            if not dup:
                kept.append(i)

    out2 = (semantic_dedup(ds, k=6, n_iter=5, tau=tau, num_buckets=5)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_dedup_corpus_keeps_one_per_cluster(ray_session):
    """Near-dup removal keeps the min-id doc of each Jaccard cluster
    with its text intact; a custom pair Dataset swaps the similarity
    stage without changing the removal semantics."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import dedup_corpus

    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4, 5], dtype="int64"),
        "text": ["alpha beta gamma delta",
                 "alpha beta gamma delta",     # dup of 1
                 "unrelated text entirely",
                 "epsilon zeta eta theta",
                 "epsilon zeta eta theta"],    # dup of 4
    })
    out = (dedup_corpus(rd.from_pandas(df), tau=0.9)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 3, 4]
    assert out["text"].tolist() == [df["text"][0], df["text"][2],
                                    df["text"][3]]

    # custom pair stream: chain 1-2, 2-3 → one cluster keeps only 1
    pairs = rd.from_pandas(pd.DataFrame(
        {"a": np.array([1, 2], dtype="int64"),
         "b": np.array([2, 3], dtype="int64")}))
    out2 = (dedup_corpus(rd.from_pandas(df), pairs=pairs)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out2["doc_id"].tolist() == [1, 4, 5]


def test_dedup_corpus_keep_best_prefers_longest(ray_session):
    """Keep-best removal retains the LONGEST copy per cluster (ties →
    min id), not the min-id one; singletons always survive."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import (
        dedup_corpus_keep_best)

    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4, 5, 6], dtype="int64"),
        "text": ["alpha beta gamma delta",
                 "alpha beta gamma delta PLUS A LONGER TAIL",  # longest
                 "unrelated text entirely",
                 "epsilon zeta eta theta",       # tie cluster {4,5}
                 "epsilon zeta eta thetaX",      # same length as 4 +1
                 None],                          # null text singleton
    })
    # explicit pair stream so cluster membership is exact: {1,2}, {4,5}
    pairs = rd.from_pandas(pd.DataFrame(
        {"a": np.array([1, 4], dtype="int64"),
         "b": np.array([2, 5], dtype="int64")}))
    out = (dedup_corpus_keep_best(rd.from_pandas(df).repartition(3),
                                  pairs=pairs)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # cluster {1,2}: 2 is longer -> survives; {4,5}: 5 longer by 1 char
    assert out["doc_id"].tolist() == [2, 3, 5, 6]

    # exact tie -> min id: make 4 and 5 equal length
    df2 = df.copy()
    df2.loc[4, "text"] = "epsilon zeta eta theta"
    out2 = (dedup_corpus_keep_best(rd.from_pandas(df2), pairs=pairs)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out2["doc_id"].tolist() == [2, 3, 4, 6]


def test_semantic_dedup_tile_size_invariant(ray_session):
    """The chunked prune (memory-bounded cosine tiles) must produce
    byte-identical verdicts at any tile size, including tiles smaller
    than the planted duplicate groups."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import semantic_dedup

    rng = np.random.default_rng(5)
    n, dim = 300, 8
    base = rng.standard_normal((n, dim))
    for i in range(60):
        base[4 * i + 1] = base[4 * i] + 0.02 * rng.standard_normal(dim)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": list(base)})
    ds = rd.from_pandas(df)
    ref = (semantic_dedup(ds, k=3, n_iter=3, tau=0.8)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert (~ref["is_keeper"]).sum() >= 50
    for c in (7, 64):
        got = (semantic_dedup(ds, k=3, n_iter=3, tau=0.8, chunk=c)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, ref)


def test_emb_lsh_params_scale_with_corpus():
    """Planes grow log2(n) so signature groups stay bounded; tables
    restore recall; small-corpus floors keep test-scale behavior."""
    from automatic_reference_extractor_ray.ops.dedup import emb_lsh_params
    assert emb_lsh_params(500, 0.4) == (3, 16)       # sf scale: unchanged
    p6, t6 = emb_lsh_params(1_000_000, 0.9)
    assert p6 == 11 and t6 >= 16                      # near-dup regime: cheap
    pl, tl = emb_lsh_params(1_000_000, 0.4, max_tables=None)
    assert pl == 11 and tl > 100                      # low-tau: honest blow-up
    # expected group size n / 2^planes stays near the target
    assert 1_000_000 / 2 ** pl <= 2 * 512
    # a DEFAULT call caps the sweep (+ logs a pointer at semantic_dedup)
    from automatic_reference_extractor_ray.ops.dedup import (
        EMB_LSH_MAX_TABLES)
    pc, tc = emb_lsh_params(1_000_000, 0.4)
    assert pc == pl and tc == EMB_LSH_MAX_TABLES


def test_simhash_clone_aware_star_cap():
    """Past star_cap, identical-fingerprint sets collapse to intra-set
    stars while DISTINCT fingerprints keep the full banding comparison
    — near-dup pairs between two clone SETS survive the cap (the
    round-3 cap dropped them whenever the group mixed fingerprints)."""
    import numpy as np
    import pandas as pd

    from automatic_reference_extractor_ray.ops.dedup import (
        _simhash_pairs_of_bucket)

    fp_a = np.uint64(0)
    fp_b = np.uint64(0b11)                 # hamming 2 from fp_a
    fp_c = np.uint64((1 << 30) - 1)        # hamming 30 from both
    rows = []
    for i in range(1, 6):
        rows.append((i, fp_a))             # clone set A: ids 1..5
    for i in range(6, 11):
        rows.append((i, fp_b))             # clone set B: ids 6..10
    for i in range(11, 13):
        rows.append((i, fp_c))             # far set C: ids 11..12
    pdf = pd.DataFrame({
        "band": np.zeros(len(rows), np.int64),
        "chunk": np.zeros(len(rows), np.int64),
        "simhash": np.array([f for _, f in rows],
                            np.uint64).view(np.int64),
        "h": np.array([i for i, _ in rows], np.int64)})

    out = _simhash_pairs_of_bucket(pdf, max_hamming=8, star_cap=6)
    got = set(zip(out["a"].tolist(), out["b"].tolist()))
    # intra-set stars on each set's min id
    assert {(1, i) for i in range(2, 6)} <= got
    assert {(6, i) for i in range(7, 11)} <= got
    assert (11, 12) in got
    # the cross-set near-dup edge the old cap lost: rep(A)-rep(B)
    assert (1, 6) in got
    # far fingerprints stay unpaired
    assert not any(a in (11, 12) or b in (11, 12)
                   for a, b in got - {(11, 12)})
    # below the cap the same input yields full verified triu pairs
    full = _simhash_pairs_of_bucket(pdf, max_hamming=8, star_cap=100)
    fg = set(zip(full["a"].tolist(), full["b"].tolist()))
    assert {(a, b) for a in range(1, 11) for b in range(a + 1, 11)} == {
        (a, b) for a, b in fg if a < 11 and b < 11}
    # cap vs no-cap: identical CONNECTIVITY over the near-dup component
    assert got <= fg | {(1, 6)}


def test_simhash_first_matching_band_dedup():
    """A pair colliding in several bands is emitted from the FIRST
    matching band only — and identical fingerprints (all four chunks
    equal) emit at band 0 only, so the union over band groups is
    globally distinct without a standalone pair DISTINCT."""
    import numpy as np
    import pandas as pd

    from automatic_reference_extractor_ray.ops.dedup import (
        _simhash_pairs_of_bucket)

    # fp_a and fp_b share chunks 0 and 2; differ in chunks 1, 3
    fp_a = np.uint64(0)
    fp_b = np.uint64((1 << 16) | (1 << 48))

    def group(band, fps_ids):
        return pd.DataFrame({
            "band": np.full(len(fps_ids), band, np.int64),
            "chunk": np.array(
                [int((f >> np.uint64(16 * band)) & np.uint64(0xFFFF))
                 for f, _ in fps_ids], np.int64),
            "simhash": np.array([f for f, _ in fps_ids],
                                np.uint64).view(np.int64),
            "h": np.array([i for _, i in fps_ids], np.int64)})

    both = [(fp_a, 1), (fp_b, 2)]
    # band 0 group (chunk match) emits the pair ...
    out0 = _simhash_pairs_of_bucket(group(0, both), max_hamming=8)
    assert set(zip(out0["a"], out0["b"])) == {(1, 2)}
    # ... band 2 group (also a chunk match) does NOT re-emit it
    out2 = _simhash_pairs_of_bucket(group(2, both), max_hamming=8)
    assert len(out2) == 0

    # identical fingerprints: emitted at band 0, suppressed at 1..3
    clones = [(fp_a, 5), (fp_a, 6)]
    assert len(_simhash_pairs_of_bucket(group(0, clones),
                                        max_hamming=8)) == 1
    for band in (1, 2, 3):
        assert len(_simhash_pairs_of_bucket(group(band, clones),
                                            max_hamming=8)) == 0

    # capped group at band > 0: intra-set stars stay suppressed
    # (band 0 owns them) while NEW rep pairs still emit
    rows = [(fp_a, i) for i in range(1, 6)] + [(fp_b, i)
                                               for i in range(6, 11)]
    out_cap = _simhash_pairs_of_bucket(group(2, rows), max_hamming=8,
                                       star_cap=6)
    got = set(zip(out_cap["a"], out_cap["b"]))
    assert not any(a in (1, 6) and b in (2, 3, 4, 5, 7, 8, 9, 10)
                   and a != 1 or False for a, b in got)  # no intra stars
    # chunks 0 and 2 of fp_a/fp_b match -> rep pair (1, 6) was band 0's
    assert (1, 6) not in got and len(got) == 0
    # same capped group at band 1 (fp chunks differ there) would not
    # co-group at all -- nothing to assert; band 3 mirrors band 2
    out_cap0 = _simhash_pairs_of_bucket(group(0, rows), max_hamming=8,
                                        star_cap=6)
    got0 = set(zip(out_cap0["a"], out_cap0["b"]))
    assert {(1, i) for i in range(2, 6)} <= got0
    assert {(6, i) for i in range(7, 11)} <= got0
    assert (1, 6) in got0


def test_minhash_band_vector_dedup_pairs_distinct():
    """_int_pairs_of_groups with band_col/allband_col emits each pair
    from its first matching band only."""
    import numpy as np
    import pandas as pd

    from automatic_reference_extractor_ray.ops.dedup import (
        _int_pairs_of_groups)

    # docs 1 and 2 share band hashes at bands 1 and 3 (not 0, 2)
    bh1 = np.array([10, 77, 30, 99], np.int64)
    bh2 = np.array([11, 77, 31, 99], np.int64)

    def rows(band):
        return pd.DataFrame({
            "band": np.array([band, band], np.int64),
            "band_hash": np.array([bh1[band], bh2[band]], np.int64),
            "h": np.array([1, 2], np.int64),
            "bhs": np.array([bh1.tobytes(), bh2.tobytes()],
                            dtype=object)})

    out1 = _int_pairs_of_groups(rows(1), ["band", "band_hash"],
                                band_col="band", allband_col="bhs")
    assert list(zip(out1["a"], out1["b"])) == [(1, 2)]
    out3 = _int_pairs_of_groups(rows(3), ["band", "band_hash"],
                                band_col="band", allband_col="bhs")
    assert len(out3) == 0


def test_dup_cluster_sizes_planted(ray_session):
    """Planted shapes: 30 singletons + one 4-clone cluster + one
    3-clone cluster -> histogram {1: 30, 3: 1, 4: 1}."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import (
        dup_cluster_sizes)

    rng = np.random.Generator(np.random.PCG64(7))
    vocab = [f"w{j}" for j in range(500)]
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": " ".join(rng.choice(vocab, 40))})
    clone_a = " ".join(rng.choice(vocab, 40))
    for i in range(4):
        rows.append({"doc_id": 100 + i, "text": clone_a})
    clone_b = " ".join(rng.choice(vocab, 40))
    for i in range(3):
        rows.append({"doc_id": 200 + i, "text": clone_b})
    docs = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    hist = dup_cluster_sizes(docs, tau=0.9)
    got = dict(zip(hist["cluster_size"], hist["n_clusters"]))
    assert got == {1: 30, 3: 1, 4: 1}


def test_minhash_shingle_mode_catches_char_edits(ray_session):
    """Character-shingle tokenizer: typo'd near-clones whose WORD
    Jaccard falls below tau still pair under shingles (each typo
    costs k shingles out of hundreds but a whole token out of few);
    verified pairs match the brute-force shingle-Jaccard truth."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import (
        _shingle_set, minhash_lsh_pairs)

    rng = np.random.Generator(np.random.PCG64(3))
    vocab = [f"wordtoken{j:04d}" for j in range(300)]   # 13-char words
    rows = []
    for i in range(20):
        words = list(rng.choice(vocab, 30))
        rows.append({"doc_id": 2 * i, "text": " ".join(words)})
        # typo every sixth word (5 of 30): word Jaccard 25/35 ≈ 0.71
        # (< tau) but each typo only costs ~7 of ~390 shingles, so
        # shingle Jaccard stays ~0.84 (≥ tau)
        typo = [w[:-1] + "x" if j % 6 == 0 else w
                for j, w in enumerate(words)]
        rows.append({"doc_id": 2 * i + 1, "text": " ".join(typo)})
    docs = rd.from_pandas(pd.DataFrame(rows)).repartition(4)

    got = {(r["a"], r["b"]) for r in minhash_lsh_pairs(
        docs, tau=0.75, tokenizer="shingles", shingle_k=5).take_all()}

    # brute-force shingle-Jaccard truth
    texts = {r["doc_id"]: r["text"] for r in rows}
    want = set()
    ids = sorted(texts)
    sets = {d: set(_shingle_set(texts[d], 5)) for d in ids}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter / (len(sets[a]) + len(sets[b]) - inter) >= 0.75:
                want.add((a, b))
    assert got <= want                       # verification is exact
    assert len(want) >= 15                   # the planted pairs exist
    assert len(got) >= 0.9 * len(want)       # banding recall
    # word mode misses them (each typo kills a whole token)
    got_words = {(r["a"], r["b"]) for r in minhash_lsh_pairs(
        docs, tau=0.75).take_all()}
    assert len(got_words & want) < len(want) / 2


def test_fuzzy_decontam_band_prune_identity(ray_session):
    """The eval-collision band prune must be invisible in the output:
    verdicts with the pruned path equal a reference computed from the
    UNPRUNED pair set (random corpus with planted leaks)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import (
        decontaminate_fuzzy, minhash_lsh_pairs)

    rng = np.random.Generator(np.random.PCG64(11))
    vocab = [f"tok{j}" for j in range(400)]
    train_rows, eval_rows = [], []
    for i in range(40):
        words = list(rng.choice(vocab, 50))
        train_rows.append({"doc_id": i, "text": " ".join(words)})
        if i % 8 == 0:   # planted leak: eval doc near-clones train doc
            leaked = words[:-1] + ["extraword"]
            eval_rows.append({"doc_id": 1000 + i,
                              "text": " ".join(leaked)})
    for i in range(10):  # clean eval docs
        eval_rows.append({"doc_id": 2000 + i,
                          "text": " ".join(rng.choice(vocab, 50))})
    train = rd.from_pandas(pd.DataFrame(train_rows)).repartition(4)
    evald = rd.from_pandas(pd.DataFrame(eval_rows)).repartition(2)

    got = (decontaminate_fuzzy(train, evald, tau=0.8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # reference: unpruned union pairs -> contaminated train ids
    pairs = minhash_lsh_pairs(train.union(evald), tau=0.8).to_pandas()
    eval_ids = {r["doc_id"] for r in eval_rows}
    bad = set()
    for a, b in zip(pairs["a"], pairs["b"]):
        if (a in eval_ids) != (b in eval_ids):
            bad.add(a if b in eval_ids else b)
    want = pd.DataFrame({
        "doc_id": [r["doc_id"] for r in train_rows],
        "keep": [0 if r["doc_id"] in bad else 1 for r in train_rows],
    }).sort_values("doc_id").reset_index(drop=True)
    got["doc_id"] = got["doc_id"].astype("int64")
    got["keep"] = got["keep"].astype("int64")
    pd.testing.assert_frame_equal(got, want.astype("int64"))
    assert (got["keep"] == 0).sum() == 5     # the planted leaks
