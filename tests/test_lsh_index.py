"""Persistent MinHash-LSH index: incremental near-dup landing —
clone detection, novel survival, within-increment ordering, append
idempotence, and the pruned-read proof."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from automatic_reference_extractor_ray.state.lsh_index import (
    LSH_BANDS, _sig_rows, build_lsh_index, incremental_minhash_dedup)


def _text(seed: int, n: int = 60) -> str:
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = [f"tok{j}" for j in range(400)]
    return " ".join(rng.choice(vocab, n))


def _base():
    return pd.DataFrame({
        "doc_id": np.arange(100, dtype="int64"),
        "text": [_text(i) for i in range(100)]})


def _increment():
    # 0-9: exact clones of base docs 0-9; 10-14: near clones (one
    # word appended); 15-24: novel; 25-26: within-increment twins
    rows = []
    for i in range(10):
        rows.append((1000 + i, _text(i)))
    for i in range(5):
        rows.append((1010 + i, _text(10 + i) + " extraword"))
    for i in range(10):
        rows.append((1015 + i, _text(5000 + i)))
    rows.append((1025, _text(7777)))
    rows.append((1026, _text(7777)))          # twin of 1025
    return pd.DataFrame({"doc_id": np.array([r[0] for r in rows],
                                            dtype="int64"),
                         "text": [r[1] for r in rows]})


def test_land_increment_and_append(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "lshidx")
    build_lsh_index(rd.from_pandas(_base()).repartition(4), idx,
                    num_parts=8)

    inc = rd.from_pandas(_increment()).repartition(3)
    v = (incremental_minhash_dedup(inc, idx, tau=0.9, append=True)
         .to_pandas().set_index("doc_id")["keep"])
    # exact clones of base: dropped
    for i in range(10):
        assert v[1000 + i] == 0, i
    # near clones (61 vs 60 tokens, J ~ 0.98): dropped
    for i in range(5):
        assert v[1010 + i] == 0, i
    # novel docs survive
    for i in range(10):
        assert v[1015 + i] == 1, i
    # within-increment twin: smaller id wins
    assert v[1025] == 1 and v[1026] == 0
    # RE-LAND the same increment: everything now in the index -> 0
    v2 = (incremental_minhash_dedup(inc, idx, tau=0.9)
          .to_pandas()["keep"])
    assert (v2 == 0).all()


def test_pruned_read(ray_session, tmp_path):
    """Verdicts survive deleting every (band, part) partition the
    increment does NOT touch."""
    import ray.data as rd

    idx = str(tmp_path / "lshidx2")
    build_lsh_index(rd.from_pandas(_base()), idx, num_parts=8)
    inc_df = _increment().iloc[:5]            # tiny increment
    inc = rd.from_pandas(inc_df)

    before = (incremental_minhash_dedup(inc, idx).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))

    needed = set()
    rows = _sig_rows(inc_df, 8)
    for band, part in rows[["band", "part"]].drop_duplicates()\
            .itertuples(index=False):
        needed.add((int(band), int(part)))
    removed = 0
    for bd in os.listdir(idx):
        if not bd.startswith("band="):
            continue
        b = int(bd.split("=")[1])
        for pdir in os.listdir(os.path.join(idx, bd)):
            p = int(pdir.split("=")[1])
            if (b, p) not in needed:
                shutil.rmtree(os.path.join(idx, bd, pdir))
                removed += 1
    assert removed > 0

    after = (incremental_minhash_dedup(inc, idx).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(before, after)


def test_band_count_constant():
    assert LSH_BANDS == 12
    rows = _sig_rows(_base().iloc[:3], 8)
    assert len(rows) == 3 * LSH_BANDS
    assert set(rows.columns) == {"band", "bh", "doc_id", "sig", "part"}
    assert all(len(s) == 64 * 8 for s in rows["sig"])


def test_recompaction_keeps_prior_compact_rows(ray_session, tmp_path):
    """Re-running compaction after an append must MERGE earlier
    compact-* outputs, not overwrite them (the fixed-name os.replace
    bug silently deleted the first compaction's rows)."""
    import glob

    import ray.data as rd

    from automatic_reference_extractor_ray.state.lsh_index import (
        append_to_lsh_index, compact_lsh_index)

    idx = str(tmp_path / "idx")
    build_lsh_index(rd.from_pandas(_base()).repartition(4), idx,
                    num_parts=4)  # build already compacts

    def rows() -> int:
        import pyarrow.parquet as pq
        return sum(pq.read_metadata(f).num_rows for f in
                   glob.glob(idx + "/band=*/part=*/*.parquet"))

    n0 = rows()
    extra = pd.DataFrame({
        "doc_id": np.arange(500, 520, dtype="int64"),
        "text": [_text(9000 + i) for i in range(20)]})
    append_to_lsh_index(rd.from_pandas(extra).repartition(3), idx)
    n1 = rows()
    assert n1 == n0 + 20 * LSH_BANDS
    compact_lsh_index(idx)
    assert rows() == n1          # nothing lost
    compact_lsh_index(idx)       # idempotent re-run
    assert rows() == n1


def test_compaction_crash_replay(ray_session, tmp_path):
    """A crash between publishing a compact-* file and deleting its
    inputs leaves duplicate rows; the NEXT compaction must replay the
    input manifest and drop the leftovers instead of re-merging them
    forever (unbounded bloat — found by review)."""
    import glob
    import json as _json

    import pyarrow.parquet as pq
    import ray.data as rd

    from automatic_reference_extractor_ray.state.lsh_index import (
        append_to_lsh_index, compact_lsh_index)

    idx = str(tmp_path / "idx")
    build_lsh_index(rd.from_pandas(_base()).repartition(4), idx,
                    num_parts=2)

    def rows() -> int:
        return sum(pq.read_metadata(f).num_rows for f in
                   glob.glob(idx + "/band=*/part=*/*.parquet"))

    n0 = rows()
    # simulate the crash in one partition dir: merge two files into a
    # compact output + manifest but "crash" before removing the inputs
    d = sorted(glob.glob(idx + "/band=*/part=*"))[0]
    append_to_lsh_index(
        rd.from_pandas(pd.DataFrame({
            "doc_id": np.arange(600, 610, dtype="int64"),
            "text": [_text(9500 + i) for i in range(10)]})), idx)
    n1 = rows()
    files = sorted(glob.glob(d + "/*.parquet"))
    assert len(files) >= 2
    victims = files[:2]
    import pyarrow as pa
    merged = pa.concat_tables([pq.read_table(f) for f in victims])
    out = os.path.join(d, "compact-deadbeef.parquet")
    with open(out[:-len(".parquet")] + ".inputs.json", "w") as fh:
        _json.dump([os.path.basename(f) for f in victims], fh)
    pq.write_table(merged, out)
    dup_rows = merged.num_rows
    assert rows() == n1 + dup_rows          # duplicates present

    compact_lsh_index(idx)                  # heal pass
    assert rows() == n1                     # duplicates gone, none lost
    assert not glob.glob(idx + "/band=*/part=*/*.inputs.json*")

    # orphan manifest with NO published output: discarded harmlessly
    with open(os.path.join(d, "compact-0badf00d.inputs.json"),
              "w") as fh:
        _json.dump(["never-written.parquet"], fh)
    compact_lsh_index(idx)
    assert rows() == n1
    assert not glob.glob(idx + "/band=*/part=*/*.inputs.json*")
