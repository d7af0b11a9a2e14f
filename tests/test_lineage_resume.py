"""Resumable partitioned output: kill-and-rerun leaves completed
partitions untouched and produces identical final content."""

import os

import pandas as pd
import pyarrow.dataset as pads


def _docs_factory():
    from automatic_reference_extractor_ray.sources.interleave import (
        read_interleaved_docs)
    return lambda: read_interleaved_docs("/root/testdata/sf0.001")


def _read_all(out_dir: str) -> pd.DataFrame:
    parts = [os.path.join(out_dir, d) for d in os.listdir(out_dir)
             if d.startswith("part-") and not d.endswith(".tmp")]
    df = pads.dataset([pads.dataset(p) for p in parts]).to_table().to_pandas()
    df["authors"] = df["authors"].map(tuple)
    return df.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)


def test_resume_skips_completed_and_matches(ray_session, tmp_path):
    from automatic_reference_extractor_ray.state.lineage import (
        completed_partitions, read_lineage, run_resumable_extract)

    out = str(tmp_path / "out")
    factory = _docs_factory()
    m1 = run_resumable_extract(factory, out, num_partitions=4)
    assert m1["partitions_run"] == 4 and m1["partitions_skipped"] == 0
    full = _read_all(out)
    assert len(full) > 0
    lineage = read_lineage(out)
    assert len(lineage) == 4
    assert sum(r["n_refs"] for r in lineage) == len(full)
    assert all(r["provenance"] for r in lineage if r["n_refs"])
    # parser-coverage signal (r3 VERDICT task 5): every partition tallies
    # the matched template shapes and its fallback-path hit rate, and the
    # run metrics roll them up
    assert all("field_shapes" in r and "fallback_rate" in r
               for r in lineage)
    assert m1["refs_parsed"] == sum(
        sum(r["field_shapes"].values()) for r in lineage)
    assert m1["refs_fallback"] == sum(
        r["field_shapes"].get("fallback", 0) for r in lineage)

    # simulate a crash that lost partitions 1 and 3
    import shutil
    for p in (1, 3):
        shutil.rmtree(os.path.join(out, f"part-{p}"))
        os.remove(os.path.join(out, "_lineage", f"partition-{p}.json"))
    assert completed_partitions(out) == {0, 2}
    mtime_before = os.path.getmtime(os.path.join(out, "part-0"))

    m2 = run_resumable_extract(factory, out, num_partitions=4)
    assert m2["partitions_skipped"] == 2 and m2["partitions_run"] == 2
    assert os.path.getmtime(os.path.join(out, "part-0")) == mtime_before

    resumed = _read_all(out)
    pd.testing.assert_frame_equal(resumed, full)


def test_resume_rejects_changed_input(ray_session, tmp_path):
    import pytest

    from automatic_reference_extractor_ray.state.lineage import (
        fingerprint_dir, run_resumable_extract)
    out = str(tmp_path / "outfp")
    fp = fingerprint_dir("/root/testdata/sf0.001")
    assert fp == fingerprint_dir("/root/testdata/sf0.001")
    run_resumable_extract(_docs_factory(), out, num_partitions=2,
                          input_fingerprint=fp)
    # same input resumes cleanly (all partitions skipped)
    m = run_resumable_extract(_docs_factory(), out, num_partitions=2,
                              input_fingerprint=fp)
    assert m["partitions_skipped"] == 2
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        run_resumable_extract(_docs_factory(), out, num_partitions=2,
                              input_fingerprint="deadbeef")


def test_golden_matches_partitioned_output(ray_session, tmp_path):
    from automatic_reference_extractor_ray.sources.goldens import (
        golden_table, sf_doc_keys)
    from automatic_reference_extractor_ray.state.lineage import (
        run_resumable_extract)

    out = str(tmp_path / "out2")
    run_resumable_extract(_docs_factory(), out, num_partitions=3)
    got = _read_all(out)
    exp = golden_table(sf_doc_keys("/root/testdata/sf0.001")).to_pandas()
    exp["authors"] = exp["authors"].map(tuple)
    exp = exp.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_resume_rejects_changed_partition_layout(ray_session, tmp_path):
    import pytest

    from automatic_reference_extractor_ray.state.lineage import (
        run_resumable_extract)
    out = str(tmp_path / "outnp")
    run_resumable_extract(_docs_factory(), out, num_partitions=2)
    with pytest.raises(ValueError, match="layout mismatch"):
        run_resumable_extract(_docs_factory(), out, num_partitions=4)


def test_layout_resume_scans_only_pending_partitions(ray_session, tmp_path):
    """With the partition-keyed input layout, a resumed run's input
    scan is proportional to the pending partitions — not the whole
    input (round-1 scan-amplification fix)."""
    import shutil

    from automatic_reference_extractor_ray.state.lineage import (
        run_resumable_extract)
    out = str(tmp_path / "outlay")
    m1 = run_resumable_extract(_docs_factory(), out, num_partitions=4)
    total = m1["docs_scanned"]
    assert total > 0 and m1["partitions_run"] == 4
    full = _read_all(out)

    shutil.rmtree(os.path.join(out, "part-1"))
    os.remove(os.path.join(out, "_lineage", "partition-1.json"))
    m2 = run_resumable_extract(_docs_factory(), out, num_partitions=4)
    assert m2["partitions_run"] == 1
    assert 0 < m2["docs_scanned"] < total / 2   # one shard only
    pd.testing.assert_frame_equal(_read_all(out), full)


def test_output_is_natural_sorted_within_partition(ray_session, tmp_path):
    """O4: each written partition is ordered by natural doc_id order
    then span_idx."""
    from automatic_reference_extractor_ray.functions.textkit import natsort_key
    from automatic_reference_extractor_ray.state.lineage import (
        run_resumable_extract)
    out = str(tmp_path / "outsort")
    run_resumable_extract(_docs_factory(), out, num_partitions=2)
    for d in os.listdir(out):
        if not d.startswith("part-") or d.endswith(".tmp"):
            continue
        df = pads.dataset(os.path.join(out, d)).to_table(
            columns=["doc_id", "span_idx"]).to_pandas()
        keys = list(zip(df["doc_id"].map(natsort_key), df["span_idx"]))
        assert keys == sorted(keys), d
