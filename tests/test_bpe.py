"""BPE vocabulary fit + tokenization (ops/bpe.py) and the token
frequency spectrum (analytics.token_spectrum)."""

from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pytest

from automatic_reference_extractor_ray.ops.bpe import (
    END_OF_WORD, _merge_loop, encode_word, fit_bpe, bpe_tokenize)


def _docs(rows):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame(rows)).repartition(4)


CORPUS = [
    {"doc_id": 1, "text": "lower lowest low low lower newest"},
    {"doc_id": 2, "text": "the newest widest lowest list"},
    {"doc_id": 3, "text": "new newer newest news"},
    {"doc_id": 4, "text": "LOW Low lower, lowest! low"},
    {"doc_id": 5, "text": ""},
    {"doc_id": 6, "text": None},
    {"doc_id": 7, "text": "banana bananas ban"},
]


# ---------------------------------------------------------------- reference

def _naive_bpe(word_counts: dict, n_merges: int):
    """Independent textbook implementation: full pair recount each
    round, max count / lexicographically-smallest tie-break."""
    seqs = {w: tuple(w) + (END_OF_WORD,) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, seq in seqs.items():
            for p in zip(seq[:-1], seq[1:]):
                pc[p] += word_counts[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, seq in seqs.items():
            new, j = [], 0
            while j < len(seq):
                if j < len(seq) - 1 and (seq[j], seq[j + 1]) == best:
                    new.append(best[0] + best[1])
                    j += 2
                else:
                    new.append(seq[j])
                    j += 1
            seqs[w] = tuple(new)
    return merges, seqs


def _word_counts_local(rows) -> dict:
    from automatic_reference_extractor_ray.ops.analytics import TOKEN_RE
    c: Counter = Counter()
    for r in rows:
        c.update(TOKEN_RE.findall((r["text"] or "").lower()))
    return dict(c)


# ---------------------------------------------------------------- unit

def test_merge_loop_matches_naive_randomized():
    import random
    rng = random.Random(11)
    pool = ["the", "there", "then", "low", "lower", "lowest", "newer",
            "wider", "aaaa", "aaab", "banana", "bananas", "x", "xy"]
    for _ in range(25):
        wc = {w: rng.randint(1, 40)
              for w in rng.sample(pool, rng.randint(2, len(pool)))}
        ref_m, ref_seqs = _naive_bpe(dict(wc), 40)
        got = _merge_loop(list(wc), np.array(list(wc.values()), np.int64), 40)
        assert got == ref_m
        ranks = {p: r for r, p in enumerate(got)}
        for w in wc:
            # encode reproduces the training segmentation exactly for
            # words the fit saw
            assert tuple(encode_word(w, ranks)) == ref_seqs[w]


def test_encode_unseen_word_decays_gracefully():
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]
    ranks = {p: r for r, p in enumerate(merges)}
    assert encode_word("low", ranks) == ["low", END_OF_WORD]
    assert encode_word("lower", ranks) == ["lower", END_OF_WORD]
    # unseen word: applicable merges apply, the rest stays chars
    assert encode_word("glow", ranks) == ["g", "low", END_OF_WORD]
    assert encode_word("qzk", ranks) == ["q", "z", "k", END_OF_WORD]
    # roundtrip: concatenated symbols reproduce word + end marker
    for w in ["low", "lower", "glow", "qzk", "lowerlow"]:
        assert "".join(encode_word(w, ranks)) == w + END_OF_WORD


def test_zero_merges_is_character_tokenization():
    assert encode_word("abc", {}) == ["a", "b", "c", END_OF_WORD]


# ---------------------------------------------------------------- dataset

def test_fit_bpe_matches_naive_on_corpus(ray_session):
    wc = _word_counts_local(CORPUS)
    ref_m, _ = _naive_bpe({w: c for w, c in wc.items() if c >= 2}, 20)
    model = fit_bpe(_docs(CORPUS), n_merges=20, min_count=2)
    assert model["merges"] == ref_m
    assert model["ranks"] == {p: r for r, p in enumerate(ref_m)}


def test_fit_bpe_bucket_count_invariant(ray_session):
    m2 = fit_bpe(_docs(CORPUS), n_merges=16, num_buckets=2)
    m8 = fit_bpe(_docs(CORPUS), n_merges=16, num_buckets=8)
    assert m2["merges"] == m8["merges"]


def test_bpe_tokenize_counts_pin(ray_session):
    from automatic_reference_extractor_ray.ops.analytics import TOKEN_RE
    model = fit_bpe(_docs(CORPUS), n_merges=20, min_count=2)
    out = (bpe_tokenize(_docs(CORPUS), model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(CORPUS)
    for _, row in out.iterrows():
        text = next(r["text"] for r in CORPUS if r["doc_id"] == row["doc_id"])
        words = TOKEN_RE.findall((text or "").lower())
        assert row["n_words"] == len(words)
        assert row["n_chars"] == sum(len(w) + 1 for w in words)
        want = sum(len(encode_word(w, model["ranks"])) for w in words)
        assert row["n_tokens"] == want
    # compression: with merges, tokens < chars wherever words repeat
    tot = out.sum(numeric_only=True)
    assert tot["n_tokens"] < tot["n_chars"]


def test_more_merges_never_increase_token_count(ray_session):
    docs = _docs(CORPUS)
    base = bpe_tokenize(docs, fit_bpe(docs, n_merges=4, min_count=1)
                        ).to_pandas()["n_tokens"].sum()
    more = bpe_tokenize(docs, fit_bpe(docs, n_merges=32, min_count=1)
                        ).to_pandas()["n_tokens"].sum()
    zero = bpe_tokenize(docs, {"merges": [], "ranks": {}}
                        ).to_pandas()
    assert more <= base <= zero["n_tokens"].sum()
    # zero merges == character tokenization == n_chars
    assert (zero["n_tokens"] == zero["n_chars"]).all()


# ---------------------------------------------------------------- spectrum

def test_token_spectrum_matches_duckdb(ray_session):
    from automatic_reference_extractor_ray.ops.analytics import (
        token_spectrum, token_spectrum_sql)
    mine = token_spectrum(_docs(CORPUS)).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(CORPUS))
    oracle = con.execute(token_spectrum_sql("documents")).fetchdf()
    assert list(mine["freq"]) == list(oracle["freq"])
    assert list(mine["n_tokens"]) == list(oracle["n_tokens"])
    # sanity: spectrum masses sum to the vocabulary size
    wc = _word_counts_local(CORPUS)
    assert mine["n_tokens"].sum() == len(wc)
    assert (mine["freq"] * mine["n_tokens"]).sum() == sum(wc.values())


def test_token_spectrum_bucket_invariant_and_empty(ray_session):
    from automatic_reference_extractor_ray.ops.analytics import (
        token_spectrum)
    s2 = token_spectrum(_docs(CORPUS), num_buckets=2)
    s8 = token_spectrum(_docs(CORPUS), num_buckets=8)
    pd.testing.assert_frame_equal(s2, s8)
    empty = token_spectrum(_docs([{"doc_id": 1, "text": ""}]))
    assert len(empty) == 0 and list(empty.columns) == ["freq", "n_tokens"]
