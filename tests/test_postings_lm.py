"""Inverted-index (build_postings) and bigram-LM scoring (lm_score)."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _docs(rows):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame(rows)).repartition(4)


CORPUS = [
    {"doc_id": 1, "text": "the cat sat on the mat"},
    {"doc_id": 2, "text": "the dog sat on the log"},
    {"doc_id": 3, "text": "cats and dogs and cats"},
    {"doc_id": 4, "text": "THE CAT the cat the cat"},
    {"doc_id": 5, "text": ""},
    {"doc_id": 6, "text": None},
    {"doc_id": 7, "text": "qzx"},
]


def test_build_postings_matches_duckdb(ray_session):
    from automatic_reference_extractor_ray.ops.postings import (
        build_postings, build_postings_sql)
    mine = (build_postings(_docs(CORPUS), k=3, min_df=1)
            .to_pandas().sort_values("token").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(CORPUS))
    oracle = (con.execute(build_postings_sql(k=3, min_df=1)).fetchdf()
              .sort_values("token").reset_index(drop=True))
    assert list(mine["token"]) == list(oracle["token"])
    assert list(mine["df"].astype(int)) == list(oracle["df"].astype(int))
    assert list(mine["postings"]) == list(oracle["postings"])
    # spot-pin the semantics: df is DISTINCT docs (doc 4 counts once
    # for "the"/"cat"), postings are the k smallest ids ascending
    row = mine[mine["token"] == "the"].iloc[0]
    assert row["df"] == 3 and row["postings"] == "1,2,4"
    row = mine[mine["token"] == "cats"].iloc[0]
    assert row["df"] == 1 and row["postings"] == "3"


def test_bm25_matches_duckdb(ray_session):
    from automatic_reference_extractor_ray.ops.postings import (
        bm25_topk, bm25_topk_sql)
    terms = ["cat", "dog", "the"]
    mine = bm25_topk(_docs(CORPUS), terms, k=5).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(CORPUS))
    oracle = con.execute(bm25_topk_sql(terms, k=5)).fetchdf()
    assert list(mine["rank"]) == list(oracle["rank"])
    assert list(mine["doc_id"].astype(int)) == list(oracle["doc_id"].astype(int))
    assert list(mine["score_micro"].astype(int)) == \
        list(oracle["score_micro"].astype(int))
    # semantics pin: doc 4 repeats "cat"/"the" maximally and is short →
    # highest score; doc 7 shares no query term and never appears
    assert mine.iloc[0]["doc_id"] == 4
    assert 7 not in set(mine["doc_id"])


def test_bm25_reference_scoring(ray_session):
    """Pin scoring against an independently-written O(n²) pure-Python
    BM25 (no shared code with the operator)."""
    import math
    import re

    from automatic_reference_extractor_ray.ops.postings import bm25_topk

    terms = ["cat", "sat", "dogs"]
    k1, b = 1.2, 0.75
    tok = lambda s: re.findall(r"[a-z0-9]+", (s or "").lower())
    docs = {r["doc_id"]: tok(r["text"]) for r in CORPUS}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    scores = {}
    for did, toks in docs.items():
        s = 0
        for t in terms:
            tf = sum(1 for x in toks if x == t)
            if not tf:
                continue
            df = sum(1 for v in docs.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            core = (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * (len(toks) / avgdl)))
            s += int(math.floor(idf * core * 1e6 + 0.5))
        if s > 0:
            scores[did] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    mine = bm25_topk(_docs(CORPUS), terms, k=3)
    got = list(zip(mine["doc_id"].astype(int), mine["score_micro"].astype(int)))
    assert got == want


def test_bm25_empty_and_missing_terms(ray_session):
    from automatic_reference_extractor_ray.ops.postings import bm25_topk
    out = bm25_topk(_docs(CORPUS), ["zzznotaterm"], k=5)
    assert len(out) == 0
    assert list(out.columns) == ["rank", "doc_id", "score_micro"]


def test_build_postings_min_df_and_cap(ray_session):
    from automatic_reference_extractor_ray.ops.postings import build_postings
    out = build_postings(_docs(CORPUS), k=2, min_df=2).to_pandas()
    assert (out["df"] >= 2).all()
    assert all(len(p.split(",")) <= 2 for p in out["postings"])
    # hot token capped to the 2 SMALLEST ids
    assert out.set_index("token").loc["the", "postings"] == "1,2"


def test_build_postings_bucket_invariant(ray_session):
    from automatic_reference_extractor_ray.ops.postings import build_postings
    a = (build_postings(_docs(CORPUS), k=4, num_buckets=2)
         .to_pandas().sort_values("token").reset_index(drop=True))
    b = (build_postings(_docs(CORPUS), k=4, num_buckets=37)
         .to_pandas().sort_values("token").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------- LM

LM_CORPUS = [
    {"doc_id": i, "text": "the quick brown fox jumps over the lazy dog "
                          "and the quick brown fox runs"}
    for i in range(1, 9)
] + [
    {"doc_id": 9, "text": "zzq wvk jjx qqp mmz"},          # gibberish
    {"doc_id": 10, "text": "the quick brown fox"},          # fluent
    {"doc_id": 11, "text": "fox the over dog quick"},       # scrambled
    {"doc_id": 12, "text": "single"},                       # no bigram
    {"doc_id": 13, "text": ""},
]


def test_lm_score_matches_pure_python_reference(ray_session):
    from automatic_reference_extractor_ray.ops.lm import (
        fit_bigram_lm, lm_score, lm_score_reference)
    ds = _docs(LM_CORPUS)
    model = fit_bigram_lm(ds, vocab_size=64, max_bigrams=256)
    got = (lm_score(_docs(LM_CORPUS), model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pdf = pd.DataFrame(LM_CORPUS)
    ref = lm_score_reference(list(pdf["text"]), list(pdf["doc_id"]), model)
    assert list(got["n_bigrams"]) == list(ref["n_bigrams"])
    np.testing.assert_allclose(got["logprob"], ref["logprob"],
                               rtol=0, atol=1e-10)


def test_lm_score_orders_fluent_above_gibberish(ray_session):
    from automatic_reference_extractor_ray.ops.lm import lm_score
    got = (lm_score(_docs(LM_CORPUS), None, vocab_size=64,
                    max_bigrams=256)
           .to_pandas().set_index("doc_id"))
    fluent = got.loc[10, "logprob"]
    scrambled = got.loc[11, "logprob"]
    gibberish = got.loc[9, "logprob"]
    assert fluent > scrambled > gibberish
    # degenerate docs: no pairs -> 0 bigrams, 0.0 score
    assert got.loc[12, "n_bigrams"] == 0 and got.loc[12, "logprob"] == 0.0
    assert got.loc[13, "n_bigrams"] == 0 and got.loc[13, "logprob"] == 0.0


def test_lm_fit_deterministic_and_bucket_invariant(ray_session):
    from automatic_reference_extractor_ray.ops.lm import fit_bigram_lm
    a = fit_bigram_lm(_docs(LM_CORPUS), vocab_size=8, max_bigrams=16,
                      num_buckets=2)
    b = fit_bigram_lm(_docs(LM_CORPUS), vocab_size=8, max_bigrams=16,
                      num_buckets=41)
    assert list(a["vocab"]) == list(b["vocab"])
    assert list(a["uni"]) == list(b["uni"])
    assert a["total"] == b["total"]
    assert list(a["bi_keys"]) == list(b["bi_keys"])
    assert list(a["bi_counts"]) == list(b["bi_counts"])
    # caps hold
    assert len(a["vocab"]) <= 8 and len(a["bi_keys"]) <= 16


def test_lm_fit_sample_frac_subsets_counts(ray_session):
    from automatic_reference_extractor_ray.ops.lm import fit_bigram_lm
    full = fit_bigram_lm(_docs(LM_CORPUS), vocab_size=64, max_bigrams=256)
    half = fit_bigram_lm(_docs(LM_CORPUS), vocab_size=64, max_bigrams=256,
                         sample_frac=0.5)
    assert 0 < half["total"] < full["total"]
    assert set(half["vocab"]) <= set(full["vocab"])


def test_build_postings_string_doc_ids(ray_session):
    from automatic_reference_extractor_ray.ops.postings import build_postings
    rows = [{"doc_id": f"d{i:03d}", "text": t["text"]}
            for i, t in enumerate(CORPUS)]
    out = build_postings(_docs(rows), k=2).to_pandas().set_index("token")
    # lexical order of the string ids, capped at 2
    assert out.loc["the", "postings"] == "d000,d001"
    assert out.loc["cats", "postings"] == "d002"


def test_build_postings_digit_string_ids_stay_lexical(ray_session):
    # the min-k combiner must apply ONE order on both the partial cut
    # and the bucket merge: digit-STRING ids are lexical end-to-end
    # ("10" < "2"), matching a varchar ORDER BY, at ANY partitioning
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.postings import build_postings
    rows = [{"doc_id": "2", "text": "zebra"},
            {"doc_id": "10", "text": "zebra"}]
    for parts in (1, 2):
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(parts)
        out = build_postings(ds, k=1).to_pandas().set_index("token")
        assert out.loc["zebra", "postings"] == "10", parts


def test_lm_score_with_empty_bigram_table(ray_session):
    # an all-hapax corpus under the default min_count=2 fits a model
    # with NO vocab and NO bigrams; scoring must fall back to the unk
    # backoff for every pair instead of crashing
    import math
    from automatic_reference_extractor_ray.ops.lm import (
        fit_bigram_lm, lm_score)
    hapax = [{"doc_id": i, "text": f"tok{i}a tok{i}b tok{i}c"}
             for i in range(6)]
    model = fit_bigram_lm(_docs(hapax))
    assert len(model["vocab"]) == 0 and len(model["bi_keys"]) == 0
    got = (lm_score(_docs(hapax), model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["n_bigrams"]) == [2] * 6
    expect = math.log10(model["alpha"]) + math.log10(
        1.0 / (model["total"] + 1.0))
    np.testing.assert_allclose(got["logprob"], [expect] * 6, atol=1e-12)


def test_lm_model_npz_roundtrip(ray_session, tmp_path):
    # the run_index.py artifact convention: a saved model scores
    # identically to the in-memory one
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from jobs.run_index import load_lm_model, save_lm_model
    from automatic_reference_extractor_ray.ops.lm import (
        fit_bigram_lm, lm_score)
    model = fit_bigram_lm(_docs(LM_CORPUS), vocab_size=64, max_bigrams=256)
    path = str(tmp_path / "m.npz")
    save_lm_model(model, path)
    loaded = load_lm_model(path)
    a = (lm_score(_docs(LM_CORPUS), model).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm_score(_docs(LM_CORPUS), loaded).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
