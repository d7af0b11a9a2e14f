"""Persistent content-hash index: indexed verdicts == direct
incremental_dedup, append makes re-landing idempotent, and the read is
genuinely pruned to the increment's buckets."""

import os
import shutil

import numpy as np
import pandas as pd


def _corpora():
    base = pd.DataFrame({
        "doc_id": np.arange(50, dtype="int64"),
        "text": [f"base doc {i % 30}" for i in range(50)],
    })
    new = pd.DataFrame({
        "doc_id": np.arange(100, 140, dtype="int64"),
        "text": [f"base doc {i % 30}" if i % 3 == 0
                 else f"new doc {i % 7}" for i in range(40)],
    })
    return base, new


def test_indexed_matches_direct_and_append(ray_session, tmp_path):
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import incremental_dedup
    from automatic_reference_extractor_ray.state.hash_index import (
        build_hash_index, incremental_dedup_indexed)

    base, new = _corpora()
    bd, nd = rd.from_pandas(base), rd.from_pandas(new)
    idx = str(tmp_path / "hidx")

    ref = (incremental_dedup(bd, nd).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    build_hash_index(bd, idx, num_parts=8)
    got = (incremental_dedup_indexed(nd, idx).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(ref[sorted(ref.columns)],
                                  got[sorted(got.columns)])
    assert got["keep"].sum() > 0

    # append folds survivors in → re-landing the same increment keeps 0
    incremental_dedup_indexed(nd, idx, append=True).materialize()
    again = incremental_dedup_indexed(nd, idx).to_pandas()
    assert int(again["keep"].sum()) == 0

    # rebuild is atomic: a second build replaces, not accumulates
    build_hash_index(bd, idx, num_parts=8)
    fresh = (incremental_dedup_indexed(nd, idx).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(ref[sorted(ref.columns)],
                                  fresh[sorted(fresh.columns)])


def test_indexed_read_is_pruned(ray_session, tmp_path):
    """Verdicts survive deleting every bucket dir the increment does
    NOT touch — proof the read never opens unneeded partitions."""
    import ray.data as rd

    from automatic_reference_extractor_ray.state.hash_index import (
        _hashes_with_bucket, build_hash_index, incremental_dedup_indexed)

    base, new = _corpora()
    bd, nd = rd.from_pandas(base), rd.from_pandas(new)
    idx = str(tmp_path / "hidx")
    build_hash_index(bd, idx, num_parts=16)

    before = (incremental_dedup_indexed(nd, idx).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))

    needed = set(
        _hashes_with_bucket(nd, 16).to_pandas()["bucket"].unique())
    removed = 0
    for d in os.listdir(idx):
        if d.startswith("bucket=") and int(d.split("=")[1]) not in needed:
            shutil.rmtree(os.path.join(idx, d))
            removed += 1
    assert removed > 0, "test needs at least one untouched bucket"

    after = (incremental_dedup_indexed(nd, idx).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(before[sorted(before.columns)],
                                  after[sorted(after.columns)])
