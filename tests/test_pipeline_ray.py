"""End-to-end Ray pipeline: golden span-sequence equality
(kind, text, media_ref, order), order-independence under repartitioning,
and the version-dedup broadcast semi-join."""

import numpy as np
import pandas as pd
import pytest

from automatic_reference_extractor_ray.sources.goldens import (
    golden_table, sf_doc_keys)

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    df["authors"] = df["authors"].map(lambda a: tuple(a))
    return df


@pytest.fixture(scope="module")
def golden_df(ray_session):
    return _norm(golden_table(sf_doc_keys(SF)).to_pandas())


def run_pipeline(**kw):
    from automatic_reference_extractor_ray.pipelines.extract import extract_refs
    from automatic_reference_extractor_ray.sources.interleave import (
        read_interleaved_docs)
    docs = read_interleaved_docs(SF, **{k: v for k, v in kw.items()
                                        if k in ("override_num_blocks",)})
    pk = {k: v for k, v in kw.items() if k not in ("override_num_blocks",)}
    return _norm(extract_refs(docs, **pk).to_pandas())


def assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    assert len(a) == len(b)
    for c in b.columns:
        x, y = a[c], b[c]
        if x.dtype == object:
            assert list(x) == list(y), f"column {c}"
        else:
            assert (x.to_numpy() == y.to_numpy()).all(), f"column {c}"


def test_e2e_matches_golden(ray_session, golden_df):
    out = run_pipeline()
    assert_frames_equal(out, golden_df)


def test_order_independence_under_partitioning(ray_session, golden_df):
    """The distributed invariant the reference never faced: block layout
    and parallelism must not change any document's span sequence."""
    out = run_pipeline(override_num_blocks=7)
    assert_frames_equal(out, golden_df)


def test_order_independence_under_input_shuffle(ray_session, golden_df):
    """Randomly permuting input rows must not change any document's
    span sequence (adversarial layout per SURVEY.md §5.3)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.pipelines.extract import extract_refs
    from automatic_reference_extractor_ray.sources.goldens import sf_doc_keys
    from automatic_reference_extractor_ray.sources.corpus import build_doc
    from automatic_reference_extractor_ray.sources.interleave import (
        rows_to_docs_table)
    rows = []
    for k in sf_doc_keys(SF):
        r, _ = build_doc(k)
        rows.extend(r)
    rng = np.random.default_rng(99)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    ds = rd.from_arrow(rows_to_docs_table(rows)).repartition(13)
    out = _norm(extract_refs(ds).to_pandas())
    assert_frames_equal(out, golden_df)


def test_rebalance_by_cost_preserves_output(ray_session, golden_df):
    out = run_pipeline(rebalance=True)
    assert_frames_equal(out, golden_df)


def test_span_sequence_contract(ray_session, golden_df):
    """Per-row invariant: span-sequence equality (kind, text, media_ref,
    order) per document."""
    out = run_pipeline()
    for doc_id, g in golden_df.groupby("doc_id"):
        o = out[out["doc_id"] == doc_id]
        assert list(zip(o["kind"], o["text"], o["media_ref"])) == \
            list(zip(g["kind"], g["text"], g["media_ref"])), doc_id


def test_version_dedup_broadcast(ray_session):
    import ray.data as rd

    from automatic_reference_extractor_ray.sources.corpus import build_doc
    from automatic_reference_extractor_ray.sources.interleave import (
        rows_to_docs_table)
    from automatic_reference_extractor_ray.stages.dedup_version import (
        compute_latest_versions, latest_version_filter)
    rows = []
    for i in range(2000):
        key = f"doc-{i:06d}"
        from automatic_reference_extractor_ray.sources.corpus import doc_class
        if doc_class(key) == "versioned":
            r, _ = build_doc(key)
            rows.extend(r)
            if sum(1 for _ in rows) >= 4:
                break
    plain, _ = build_doc("doc-000000")
    rows.extend(plain)
    ds = rd.from_arrow(rows_to_docs_table(rows))
    latest = compute_latest_versions(ds)
    assert all(v == 2 for v in latest.values()) and latest
    kept = latest_version_filter(ds).to_pandas()["doc_id"].tolist()
    assert all(not d.endswith("~1") for d in kept)
    assert any(d.endswith("~2") for d in kept)
    assert plain[0]["doc_id"] in kept


def test_poison_row_becomes_error_record(ray_session):
    """A malformed unit (unresolvable media_ref) yields one explicit
    kind='error' record; healthy documents in the same block are
    unaffected (SURVEY.md §4 poison-row containment)."""
    import ray.data as rd

    from automatic_reference_extractor_ray.pipelines.extract import extract_refs
    from automatic_reference_extractor_ray.sources.corpus import build_doc
    from automatic_reference_extractor_ray.sources.interleave import (
        rows_to_docs_table)
    good, golden = build_doc("doc-000001")
    poison = [{"doc_id": "poison-doc", "spans": [
        {"kind": "media", "text": "", "media_ref": "not-a-valid-ref",
         "offset": 0}]}]
    ds = rd.from_arrow(rows_to_docs_table(good + poison))
    out = extract_refs(ds).to_pandas()
    err = out[out["kind"] == "error"]
    assert list(err["doc_id"]) == ["poison-doc"]
    assert err["detector"].iloc[0] == "Error"
    assert (err["x1"].iloc[0], err["y1"].iloc[0]) == (0, 0)
    healthy = out[out["doc_id"] != "poison-doc"]
    assert len(healthy) == len(golden)
    assert list(healthy.sort_values("span_idx")["text"]) == \
        [g["text"] for g in golden]


def test_version_dedup_all_versioned(ray_session):
    """~100% of docs versioned: the shuffle-free fold must return every
    version-SUFFIXED base_id with its max version (the filter drops a
    row iff its version differs from that max, so a single-version
    ``solo~2`` entry is a harmless no-op — outcome-equivalent to the
    old multi-version-only contract), and the filter outcome must keep
    exactly the max-version rows."""
    import pyarrow as pa
    import ray.data as rd

    from automatic_reference_extractor_ray.schema import SPAN_STRUCT
    from automatic_reference_extractor_ray.stages.dedup_version import (
        compute_latest_versions, latest_version_filter)
    ids = []
    for i in range(500):
        ids += [f"d{i}~1", f"d{i}~3"]
    ids += ["solo~2", "solo~2"]          # duplicated single-version rows
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "spans": pa.array([[] for _ in ids], pa.list_(SPAN_STRUCT))}))
    latest = compute_latest_versions(ds)
    assert len(latest) == 501
    assert latest["solo"] == 2           # single-version: filter no-op
    assert all(v == 3 for b, v in latest.items() if b != "solo")
    kept = sorted(set(latest_version_filter(ds).to_pandas()["doc_id"]))
    assert kept == sorted([f"d{i}~3" for i in range(500)] + ["solo~2"])


def test_stitch_bucket_count_invariance(ray_session):
    """stitch_records output is identical at 8/64/256 buckets — bucket
    count is purely a memory/parallelism dial (scale sizing check)."""
    import pandas as pd

    from automatic_reference_extractor_ray.pipelines.extract import extract_refs
    from automatic_reference_extractor_ray.sources.interleave import (
        read_interleaved_docs)

    def run(nb):
        from automatic_reference_extractor_ray.stages import stitch as st
        docs = read_interleaved_docs("/root/testdata/sf0.001")
        # extract_refs stitches internally with the default; re-stitch
        # explicitly by monkey-free direct call at chosen bucket counts
        from automatic_reference_extractor_ray.config import DEFAULT_CONFIG
        from automatic_reference_extractor_ray.stages.explode import (
            explode_to_units)
        from automatic_reference_extractor_ray.stages.extract import (
            ExtractUnits)
        units = docs.map_batches(
            lambda b: explode_to_units(b, DEFAULT_CONFIG),
            batch_format="pyarrow")
        records = units.map_batches(
            ExtractUnits, batch_format="pyarrow", concurrency=2)
        df = st.stitch_records(records, num_buckets=nb).to_pandas()
        df["authors"] = df["authors"].map(tuple)
        return df.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)

    base = run(8)
    for nb in (64, 256):
        pd.testing.assert_frame_equal(run(nb), base)


def test_version_parse_scalar_vector_parity(ray_session):
    """The vectorized pre-pass and the per-row filter MUST agree on
    what counts as a version suffix (digits only) — a looser vectorized
    parse would count versions the filter refuses and silently drop
    docs (regression: '~3.5' used to be parsed as version 3)."""
    import pyarrow as pa
    import ray.data as rd

    from automatic_reference_extractor_ray.functions.textkit import (
        split_versioned_doc_id)
    from automatic_reference_extractor_ray.schema import SPAN_STRUCT
    from automatic_reference_extractor_ray.stages.dedup_version import (
        compute_latest_versions, latest_version_filter)
    ids = ["r~2", "r~3.5", "x~+3", "y~ 4", "z~1_0", "w~07", "w~8", "plain"]
    for d in ids:
        base, ver = split_versioned_doc_id(d)
        assert (ver > 0) == (d in ("r~2", "w~07", "w~8")), d
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "spans": pa.array([[] for _ in ids], pa.list_(SPAN_STRUCT))}))
    latest = compute_latest_versions(ds)
    assert latest == {"w": 8, "r": 2}    # r: single version → filter no-op
    kept = sorted(r["doc_id"] for r in latest_version_filter(ds).take_all())
    # only w~07 (superseded by w~8) drops; odd suffixes are whole ids
    assert kept == sorted(set(ids) - {"w~07"})


def test_layout_survives_missing_meta(ray_session, tmp_path):
    """A layout dir without _META.json (crash artifact) is rebuilt, not
    a permanent rename failure."""
    import json
    import os

    from automatic_reference_extractor_ray.sources.interleave import (
        read_interleaved_docs)
    from automatic_reference_extractor_ray.state.lineage import (
        ensure_partitioned_layout)
    out = str(tmp_path / "o")
    os.makedirs(out)
    factory = lambda: read_interleaved_docs("/root/testdata/sf0.001")  # noqa: E731
    layout = ensure_partitioned_layout(factory, out, 2)
    assert os.path.exists(os.path.join(layout, "_META.json"))
    os.remove(os.path.join(layout, "_META.json"))     # simulate crash
    layout2 = ensure_partitioned_layout(factory, out, 2)
    with open(os.path.join(layout2, "_META.json")) as f:
        assert json.load(f)["num_partitions"] == 2
