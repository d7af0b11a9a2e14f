"""Corpus generator invariants: determinism, class coverage, version
semantics, media-ref self-containment."""

from automatic_reference_extractor_ray.functions.xmlrefs import extract_xml_citations
from automatic_reference_extractor_ray.sources.corpus import (
    DOC_CLASSES, build_doc, doc_class, parse_media_ref)
from automatic_reference_extractor_ray.sources.media_store import (
    DirMediaStore, SynthMediaStore)


def test_build_doc_deterministic():
    a = build_doc("doc-000042")
    b = build_doc("doc-000042")
    assert a == b


def test_all_classes_reachable():
    seen = {doc_class(f"doc-{i:06d}") for i in range(3000)}
    assert set(DOC_CLASSES) <= seen
    assert "scan_heavy" in seen


def test_versioned_two_rows_golden_from_latest():
    for i in range(2000):
        key = f"doc-{i:06d}"
        if doc_class(key) == "versioned":
            rows, golden = build_doc(key)
            assert [r["doc_id"] for r in rows] == [f"{key}~1", f"{key}~2"]
            assert golden and all(g["doc_id"] == f"{key}~2" for g in golden)
            return
    raise AssertionError("no versioned doc found")


def test_golden_span_idx_dense_ordered():
    for i in range(200):
        _, golden = build_doc(f"doc-{i:06d}")
        assert [g["span_idx"] for g in golden] == list(range(len(golden)))
        offs = [g["src_offset"] for g in golden]
        assert offs == sorted(offs)


def test_media_ref_roundtrip_and_store():
    store = SynthMediaStore()
    for i in range(300):
        rows, _ = build_doc(f"doc-{i:06d}")
        for row in rows:
            for s in row["spans"]:
                if s["kind"] == "media":
                    cls, seed, page, nr = parse_media_ref(s["media_ref"])
                    p1 = store.fetch(s["media_ref"])
                    p2 = store.fetch(s["media_ref"])
                    assert p1 == p2 and len(p1) > 100
                    return


def test_dir_media_store(tmp_path):
    store = DirMediaStore(str(tmp_path))
    store.put("synth://scan_single/0000002a/0/3", b"payload")
    assert store.fetch("synth://scan_single/0000002a/0/3") == b"payload"


def test_xml_docs_extract():
    for i in range(2000):
        key = f"doc-{i:06d}"
        if doc_class(key) == "xml_citation":
            rows, golden = build_doc(key)
            refs = extract_xml_citations(rows[0]["spans"][0]["text"])
            assert refs == [g["text"] for g in golden]
            return
    raise AssertionError("no xml doc found")


def test_xml_entity_unescape_order():
    """'&amp;lt;' must unescape to '&lt;' (one level), not '<'."""
    from automatic_reference_extractor_ray.functions.xmlrefs import (
        extract_xml_citations)
    markup = ('<Citations><Citation ID="1"><BibUnstructured>'
              'A &amp;lt; B &amp; C &lt;x&gt;'
              '</BibUnstructured></Citation></Citations>')
    assert extract_xml_citations(markup) == ["[1] A &lt; B & C <x>"]


def test_top_level_api_exports_resolve():
    """Every name in the package's lazy __all__ resolves to a real
    callable (PEP 562 exports stay in sync with the modules)."""
    import automatic_reference_extractor_ray as arx
    for name in arx.__all__:
        if name == "__version__":
            continue
        assert callable(getattr(arx, name)), name


def test_golden_version_is_content_derived(tmp_path):
    """GOLDEN_VERSION must change whenever a generator source changes —
    a hand-bumped constant let a citation-template change ship without
    invalidating /tmp corpus caches (round-4 staleness bug)."""
    import re

    from automatic_reference_extractor_ray.sources.goldens import (
        GOLDEN_VERSION, _generator_version, write_oracle_tables)
    assert re.fullmatch(r"[0-9a-f]{10}", GOLDEN_VERSION)
    assert _generator_version() == GOLDEN_VERSION  # deterministic

    # a stale marker (old hand-bumped "3", or any other version) forces
    # regeneration
    import os
    out = write_oracle_tables("/root/testdata/sf0.001", str(tmp_path))
    with open(os.path.join(out, "_DONE")) as f:
        assert f.read().strip() == GOLDEN_VERSION
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("3")
    mt = os.path.getmtime(os.path.join(out, "golden_refs.parquet"))
    out2 = write_oracle_tables("/root/testdata/sf0.001", str(tmp_path))
    assert out2 == out
    assert os.path.getmtime(os.path.join(out, "golden_refs.parquet")) >= mt
    with open(os.path.join(out, "_DONE")) as f:
        assert f.read().strip() == GOLDEN_VERSION
