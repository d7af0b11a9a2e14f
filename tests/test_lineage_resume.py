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
