"""Input-contract validation (S1 ingest gate)."""

import pyarrow as pa
import pytest

from automatic_reference_extractor_ray.schema import SPAN_STRUCT


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "spans": pa.array([r[1] for r in rows], pa.list_(SPAN_STRUCT)),
    }))


GOOD = ("ok-doc", [{"kind": "text", "text": "body", "media_ref": "",
                    "offset": 0},
                   {"kind": "media", "text": "", "media_ref": "synth://x",
                    "offset": 1}])


def test_valid_rows_pass(ray_session):
    from automatic_reference_extractor_ray.stages.validate import (
        validate_documents)
    out = validate_documents(_docs([GOOD])).take_all()
    assert len(out) == 1


@pytest.mark.parametrize("bad,reason", [
    (("gap", [{"kind": "text", "text": "x", "media_ref": "", "offset": 1}]),
     "offsets not dense"),
    (("kind", [{"kind": "video", "text": "", "media_ref": "m", "offset": 0}]),
     "invalid span kind"),
    (("noref", [{"kind": "media", "text": "", "media_ref": "", "offset": 0}]),
     "empty media_ref"),
    (("txtref", [{"kind": "text", "text": "x", "media_ref": "m", "offset": 0}]),
     "text span carrying"),
])
def test_invalid_rows_fail_fast(ray_session, bad, reason):
    from automatic_reference_extractor_ray.stages.validate import (
        validate_documents)
    with pytest.raises(Exception, match=reason):
        validate_documents(_docs([GOOD, bad])).take_all()


def test_quarantine_drops_only_offenders(ray_session):
    from automatic_reference_extractor_ray.stages.validate import (
        validate_documents)
    bad = ("bad", [{"kind": "nope", "text": "", "media_ref": "", "offset": 0}])
    out = validate_documents(_docs([GOOD, bad]), quarantine=True).take_all()
    assert [r["doc_id"] for r in out] == ["ok-doc"]


def test_missing_column_is_named(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.stages.validate import (
        validate_documents)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(["x"], pa.string())}))
    with pytest.raises(Exception, match="missing column"):
        validate_documents(ds).take_all()


def test_quarantine_survives_null_span_structs(ray_session):
    from automatic_reference_extractor_ray.stages.validate import (
        validate_documents)
    nullspan = ("nullspan", [None])
    nulloff = ("nulloff", [{"kind": "text", "text": "x", "media_ref": "",
                            "offset": None}])
    out = validate_documents(_docs([GOOD, nullspan, nulloff]),
                             quarantine=True).take_all()
    assert [r["doc_id"] for r in out] == ["ok-doc"]


def test_quarantine_dir_collects_tagged_offenders(ray_session, tmp_path):
    from automatic_reference_extractor_ray.stages.validate import (
        read_quarantined, validate_documents)
    qdir = str(tmp_path / "dead_letters")
    bad1 = ("bad1", [{"kind": "nope", "text": "", "media_ref": "", "offset": 0}])
    bad2 = ("bad2", [None])
    out = validate_documents(_docs([GOOD, bad1, bad2]), quarantine=True,
                             quarantine_dir=qdir).take_all()
    assert [r["doc_id"] for r in out] == ["ok-doc"]
    side = read_quarantined(qdir).to_pandas().sort_values("doc_id")
    assert list(side["doc_id"]) == ["bad1", "bad2"]
    assert list(side["_invalid_reason"]) == [
        "invalid span kind 'nope'", "null span element"]


def test_quarantine_dir_requires_quarantine_mode(ray_session, tmp_path):
    import pytest

    from automatic_reference_extractor_ray.stages.validate import (
        validate_documents)
    with pytest.raises(ValueError, match="requires quarantine"):
        validate_documents(_docs([GOOD]), quarantine_dir=str(tmp_path / "q"))


def test_quarantine_side_table_idempotent_on_reexecution(ray_session, tmp_path):
    """The dead-letter write is a side effect inside a lazy map_batches;
    Ray re-executes per consumer — content-addressed file names keep the
    audit table duplicate-free."""
    from automatic_reference_extractor_ray.stages.validate import (
        read_quarantined, validate_documents)
    qdir = str(tmp_path / "q")
    bad = ("bad", [{"kind": "nope", "text": "", "media_ref": "", "offset": 0}])
    ds = validate_documents(_docs([GOOD, bad]), quarantine=True,
                            quarantine_dir=qdir)
    assert ds.count() == 1          # consumer 1
    assert len(ds.take_all()) == 1  # consumer 2 → check() re-executes
    side = read_quarantined(qdir)
    assert side.num_rows == 1
