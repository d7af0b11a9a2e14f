"""Corpus diff: hand statuses, duplicate-id guard, and the DuckDB
oracle cross-check on a shuffled/partition-adversarial input."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from automatic_reference_extractor_ray.ops.diff import (
    corpus_diff, corpus_diff_sql)


def test_all_four_statuses(ray_session):
    import ray.data as rd
    old = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    new = pd.DataFrame({"doc_id": [2, 3, 4], "text": ["b", "C!", "d"]})
    out = (corpus_diff(rd.from_pandas(old).repartition(2),
                       rd.from_pandas(new).repartition(3))
           .to_pandas().set_index("doc_id")["status"])
    assert out[1] == "removed"
    assert out[2] == "same"
    assert out[3] == "changed"
    assert out[4] == "added"
    assert len(out) == 4


def test_duplicate_id_raises(ray_session):
    import ray.data as rd
    old = pd.DataFrame({"doc_id": [1, 1], "text": ["a", "a2"]})
    new = pd.DataFrame({"doc_id": [1], "text": ["a"]})
    with pytest.raises(Exception, match="duplicate"):
        corpus_diff(rd.from_pandas(old),
                    rd.from_pandas(new)).to_pandas()


def test_matches_sql_oracle_random(ray_session):
    import ray.data as rd
    rng = np.random.Generator(np.random.PCG64(11))
    n = 400
    ids = np.arange(n, dtype="int64")
    texts = [f"doc {i} {'x' * int(rng.integers(0, 5))}" for i in ids]
    base = pd.DataFrame({"doc_id": ids, "text": texts})
    old = base[base["doc_id"] % 3 != 0].copy()
    new = base[base["doc_id"] % 4 != 1].copy()
    new.loc[new["doc_id"] % 7 == 0, "text"] += " edited"
    got = (corpus_diff(
               rd.from_pandas(
                   old.sample(frac=1.0, random_state=2)).repartition(5),
               rd.from_pandas(
                   new.sample(frac=1.0, random_state=3)).repartition(7))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("o_t", old)
    con.register("n_t", new)
    exp = (con.sql(corpus_diff_sql("SELECT * FROM o_t",
                                   "SELECT * FROM n_t")).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, exp.astype({"doc_id": "int64"}))
