"""Composed curation pipeline: verdict table vs an independent local
(pandas) reference, plus stream/bucket invariance."""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    import pyarrow.parquet as pq
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas()


def _local_curate(df, *, n=3, train_frac=0.8, rates=None, default_rate=1.0):
    from automatic_reference_extractor_ray.ops.analytics import _hex_threshold
    from automatic_reference_extractor_ray.ops.dedup import _norm
    from automatic_reference_extractor_ray.ops.textstats import (
        _tokens, quality_filter)
    rates = rates or {}
    thr = _hex_threshold(train_frac)

    def h8(d):
        return hashlib.md5(str(d).encode()).hexdigest()[:8]

    def mh8(d):
        return hashlib.md5(f"mix:{d}".encode()).hexdigest()[:8]

    def grams(t):
        toks = _tokens(t)
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    qf = quality_filter(df).set_index("doc_id")["keep"]
    eval_grams = set()
    for _, r in df.iterrows():
        if h8(r["doc_id"]) >= thr:
            eval_grams |= grams(r["text"])
    chash = df["text"].map(lambda s: hashlib.md5(
        _norm(s).encode()).hexdigest())
    keeper = df.assign(ch=chash).groupby("ch")["doc_id"].transform("min")
    rows = []
    for i, r in df.iterrows():
        d = r["doc_id"]
        if h8(d) >= thr:
            continue
        shared = len(grams(r["text"]) & eval_grams)
        kq = int(bool(qf.loc[d]))
        kdc = int(shared == 0)
        kdd = int(d == keeper.loc[i])
        km = int(mh8(d) < _hex_threshold(
            rates.get(r["lang"], default_rate)))
        rows.append((d, shared, kq, kdc, kdd, km,
                     int(kq and kdc and kdd and km)))
    return (pd.DataFrame(rows, columns=[
        "doc_id", "n_shared", "keep_quality", "keep_decontam",
        "keep_dedup", "keep_mix", "keep"])
        .astype({c: "int64" for c in ["n_shared", "keep_quality",
                                      "keep_decontam", "keep_dedup",
                                      "keep_mix", "keep"]})
        .sort_values("doc_id").reset_index(drop=True))


def test_curate_matches_local_reference(ray_session, docs_df):
    import ray.data as rd
    from automatic_reference_extractor_ray.pipelines.curate import (
        curate_corpus)
    rates = {"en": 0.5, "zh": 0.25}
    # inject exact duplicates of the first docs under fresh ids so the
    # dedup stage has something to reject (sf0.001 has no dupes)
    dup = docs_df.head(8).copy()
    dup["doc_id"] = docs_df["doc_id"].max() + 1 + np.arange(8)
    df = pd.concat([docs_df, dup], ignore_index=True)
    got = (curate_corpus(rd.from_pandas(df), decontam_n=4,
                         mix_rates=rates)
           .to_pandas().sort_values("doc_id").reset_index(drop=True)
           [["doc_id", "n_shared", "keep_quality", "keep_decontam",
             "keep_dedup", "keep_mix", "keep"]])
    exp = _local_curate(df, n=4, rates=rates)
    pd.testing.assert_frame_equal(got, exp)
    # every stage must actually reject something on this corpus, and
    # something must survive end to end
    assert (exp["keep_quality"] == 0).any()
    assert (exp["keep_decontam"] == 0).any()
    assert (exp["keep_dedup"] == 0).any()
    assert (exp["keep_mix"] == 0).any()
    assert exp["keep"].sum() > 0


def test_curate_bucket_and_block_invariant(ray_session, docs_df):
    import ray.data as rd
    from automatic_reference_extractor_ray.pipelines.curate import (
        curate_corpus)
    outs = []
    for blocks, nb in ((2, 8), (16, 64)):
        ds = rd.from_pandas(docs_df).repartition(blocks)
        outs.append(curate_corpus(ds, decontam_n=3, num_buckets=nb)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_decontaminate_holdout_high_complements_split(ray_session, docs_df):
    """holdout='high' with eval_frac=0.2 must emit verdicts for exactly
    hash_split's 'train' docs."""
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.analytics import hash_split
    from automatic_reference_extractor_ray.ops.textstats import decontaminate
    got = (decontaminate(rd.from_pandas(docs_df), n=3, eval_frac=0.2,
                         holdout="high")
           .to_pandas())
    split = hash_split(
        rd.from_pandas(docs_df[["doc_id"]]), "doc_id").to_pandas()
    train_ids = set(split.loc[split["split"] == "train", "doc_id"])
    assert set(got["doc_id"]) == train_ids


def test_decontaminate_bad_holdout_rejected(ray_session, docs_df):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.textstats import decontaminate
    with pytest.raises(ValueError):
        decontaminate(rd.from_pandas(docs_df), holdout="sideways")


def test_repetition_metrics_hand_cases():
    from automatic_reference_extractor_ray.ops.textstats import (
        repetition_metrics)
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype="int64"),
        "text": [
            "a b\na b\na b\nc d",          # 4 lines, 2 distinct -> 500
            ("x y " * 15).strip(),        # 29 bigrams, (x,y) x15 -> 517
            "unique words only here",     # clean, too short for 2g rule
            "",                           # degenerate: 1 empty line
        ],
    })
    got = repetition_metrics(df)
    assert list(got["n_lines"]) == [4, 1, 1, 1]
    assert list(got["dup_line_frac_x1000"]) == [500, 0, 0, 0]
    # doc1 tokens a,b,a,b,a,b,c,d -> 7 bigrams, (a,b) x3 -> 3000//7;
    # doc3 has 3 distinct bigrams -> 333 but under the 20-bigram floor
    assert list(got["top_2gram_frac_x1000"]) == [428, 517, 333, 0]
    assert list(got["keep"]) == [False, False, True, True]


def test_text_ops_null_safe():
    """None text must read as empty text in every flat-table text op,
    not crash — real documents tables carry nulls."""
    from automatic_reference_extractor_ray.ops.dedup import add_content_hash
    from automatic_reference_extractor_ray.ops.textstats import (
        fingerprint, lang_guess, quality_filter, quality_metrics,
        repetition_metrics, token_counts)
    df = pd.DataFrame({"doc_id": np.array([1, 2], dtype="int64"),
                       "text": [None, "the quick fox"]})
    for fn in (token_counts, quality_metrics, lang_guess, fingerprint,
               quality_filter, repetition_metrics, add_content_hash):
        out = fn(df)
        assert len(out) == 2, fn.__name__
    assert token_counts(df)["n_tokens"].tolist() == [0, 3]


def test_scrub_text_semantics_and_oracle():
    """Pattern scrubbing: sequential replacement, per-pattern counts,
    null text as empty — and the SQL oracle agrees byte-for-byte on a
    table that exercises every pattern (the synthetic corpus has no
    emails, so the email path is proven here)."""
    import duckdb
    import pyarrow as pa

    from automatic_reference_extractor_ray.ops.textstats import (
        scrub_sql, scrub_text)

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [None,
                 "mail a.b@x.co or c@d.org customer",
                 "supplier customer supplier",
                 "no hits here"],
    })
    got = scrub_text(tbl).to_pandas()
    assert got["n_email"].tolist() == [0, 2, 0, 0]
    assert got["n_entity"].tolist() == [0, 1, 3, 0]
    assert got["n_redactions"].tolist() == [0, 3, 3, 0]
    assert got["text_scrubbed"].tolist() == [
        "", "mail [EMAIL] or [EMAIL] [ENTITY]",
        "[ENTITY] [ENTITY] [ENTITY]", "no hits here"]

    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.sql(scrub_sql()).df()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values("doc_id").reset_index(drop=True),
        exp[cols].sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)


def test_scrub_text_custom_patterns_sequential():
    """Later patterns see earlier replacements (the chain is ordered)."""
    import pyarrow as pa

    from automatic_reference_extractor_ray.ops.textstats import scrub_text

    pats = [("ab", r"ab", "X"), ("x", r"X+", "Y")]
    out = scrub_text(pa.table({"doc_id": [1], "text": ["abab"]}),
                     patterns=pats).to_pandas()
    assert out["text_scrubbed"].tolist() == ["Y"]
    assert out["n_ab"].tolist() == [2]
    assert out["n_x"].tolist() == [1]


def test_chunk_documents_windows_and_oracle():
    """Window starts every chunk-overlap tokens, tail carries >=1 new
    token, empty/null docs emit nothing — and the SQL oracle agrees."""
    import duckdb
    import pyarrow as pa

    from automatic_reference_extractor_ray.ops.textstats import (
        chunk_documents, chunk_sql)

    long = " ".join(f"w{i}" for i in range(65))
    df = pd.DataFrame({"doc_id": np.array([1, 2, 3, 4], dtype="int64"),
                       "text": [None, "", "a b c", long]})
    got = chunk_documents(df, chunk=64, overlap=8)
    assert got.groupby("doc_id").size().to_dict() == {3: 1, 4: 2}
    assert got[got.doc_id == 4]["n_tokens"].tolist() == [64, 9]
    # tail window starts at 56 → its first token is w56 (8 overlap)
    assert got[got.doc_id == 4]["text_chunk"].iloc[1].split()[0] == "w56"

    con = duckdb.connect()
    con.register("documents", pa.Table.from_pandas(df))
    exp = con.sql(chunk_sql(chunk=64, overlap=8)).df()
    cols = sorted(got.columns)
    key = ["doc_id", "chunk_idx"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        exp[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False)

    # a fully-contained tail is never emitted: 68 tokens, starts 0 and
    # 56 (68-8=60 > 56), NOT 112
    df2 = pd.DataFrame({"doc_id": np.array([1], dtype="int64"),
                        "text": [" ".join("x%d" % i for i in range(68))]})
    assert chunk_documents(df2)["chunk_idx"].tolist() == [0, 1]

    import pytest
    with pytest.raises(ValueError):
        chunk_documents(df, chunk=8, overlap=8)


def test_pack_sequences_shard_local_and_invariant(ray_session):
    """Packing: shard-local prefix-sum bins, bucket-count invariance,
    and the documented overflow bound (≤ budget + chunk - 1)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        pack_sequences)

    rng = np.random.default_rng(7)
    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype="int64"),
        "text": [" ".join(f"t{rng.integers(30)}"
                          for _ in range(int(rng.integers(0, 150))))
                 for _ in range(40)],
    })
    ds = rd.from_pandas(docs)
    key = ["doc_id", "chunk_idx"]
    a = (pack_sequences(ds, budget=100, chunk=32, overlap=4, num_shards=4,
                        num_buckets=8)
         .to_pandas().sort_values(key).reset_index(drop=True))
    b = (pack_sequences(ds, budget=100, chunk=32, overlap=4, num_shards=4,
                        num_buckets=64)
         .to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    assert (a["shard"] == a["doc_id"] % 4).all()
    sums = a.groupby(["shard", "seq_in_shard"])["n_tokens"].sum()
    assert sums.max() <= 100 + 32 - 1
    # within a shard, sequence ids are dense from 0
    for _, g in a.groupby("shard"):
        ids = sorted(g["seq_in_shard"].unique())
        assert ids == list(range(len(ids)))


def test_decontaminate_bloom_one_sided_vs_exact(ray_session):
    """The Bloom path never misses a truly contaminated doc and never
    under-counts per doc; with a deliberately tiny sketch it still has
    no false negatives (the one-sided guarantee) while FPs appear."""
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        decontaminate, decontaminate_bloom)

    rng = np.random.default_rng(3)
    vocab = [f"v{i}" for i in range(12)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype="int64"),
        "text": [" ".join(rng.choice(vocab, size=30)) for _ in range(60)],
    })
    ds = rd.from_pandas(docs)
    ex = decontaminate(ds, n=4, eval_frac=0.3).to_pandas() \
        .set_index("doc_id").sort_index()
    bl = decontaminate_bloom(ds, n=4, eval_frac=0.3) \
        .to_pandas().set_index("doc_id").sort_index()
    assert list(ex.index) == list(bl.index)
    assert not ((ex["n_shared"] > 0) & (bl["n_flagged"] == 0)).any()
    assert (bl["n_flagged"] >= ex["n_shared"]).all()

    tiny = decontaminate_bloom(ds, n=4, eval_frac=0.3, m_bits=256, k=2) \
        .to_pandas().set_index("doc_id").sort_index()
    assert not ((ex["n_shared"] > 0) & (tiny["n_flagged"] == 0)).any()
    assert (tiny["n_flagged"] >= bl["n_flagged"]).all()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 20), max_size=300),
       st.integers(2, 40), st.integers(0, 39))
def test_chunk_reconstruction_property(tok_ids, chunk, overlap):
    """Concatenating chunk 0 with every later chunk's post-overlap
    suffix reproduces the document's token stream exactly, for any
    (chunk, overlap<chunk) pair."""
    from automatic_reference_extractor_ray.ops.textstats import (
        chunk_documents)
    if overlap >= chunk:
        overlap %= chunk
    toks = [f"t{i}" for i in tok_ids]
    df = pd.DataFrame({"doc_id": np.array([0], dtype="int64"),
                       "text": [" ".join(toks)]})
    out = chunk_documents(df, chunk=chunk, overlap=overlap)
    rebuilt = []
    for i, row in out.sort_values("chunk_idx").iterrows():
        parts = row["text_chunk"].split()
        rebuilt.extend(parts if row["chunk_idx"] == 0 else parts[overlap:])
    assert rebuilt == toks
    # every non-final chunk is full-size
    sizes = out.sort_values("chunk_idx")["n_tokens"].tolist()
    assert all(s == chunk for s in sizes[:-1])


def test_normalize_text_accent_parity():
    """Python NFD-strip normalization agrees byte-for-byte with the
    DuckDB strip_accents oracle on accented, tab/newline, and null
    fixtures (the corpus is ASCII, so the unit test carries the
    non-ASCII weight)."""
    import duckdb
    import pyarrow as pa

    from automatic_reference_extractor_ray.ops.textstats import (
        NORMALIZE_SQL, normalize_text)

    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4, 5], dtype="int64"),
        "text": [None, "  Ça  COÛTE\t5€\nnaïve ", "Grüße—ok",
                 "ÀÉÎÕÜ çğış", "plain  text"],
    })
    got = normalize_text(df)
    assert got["text_norm"].tolist()[1] == "ca coute 5€ naive"
    con = duckdb.connect()
    con.register("documents", pa.Table.from_pandas(df))
    exp = con.sql(NORMALIZE_SQL).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)
