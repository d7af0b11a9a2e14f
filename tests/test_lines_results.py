"""Lines table (E3/J8), result view (E2/J6), and output XML (S4)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _lines_table(rows):
    return pa.table({
        "media_ref": pa.array([r[0] for r in rows], pa.string()),
        "line_no": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "x1": pa.array([r[3][0] for r in rows], pa.int32()),
        "y1": pa.array([r[3][1] for r in rows], pa.int32()),
        "x2": pa.array([r[3][2] for r in rows], pa.int32()),
        "y2": pa.array([r[3][3] for r in rows], pa.int32()),
    })


def test_segment_lookup_geometry():
    from automatic_reference_extractor_ray.pipelines.lines import segment_lookup
    tbl = _lines_table([
        ("m", 0, "Above the box", (100, 100, 500, 140)),
        ("m", 1, "Weber, K. (2001). Deep pars-", (100, 200, 500, 240)),
        ("m", 2, "ing methods. J. Docs, 3, 1-9.", (100, 250, 500, 290)),
        ("m", 3, "Far below", (100, 900, 500, 940)),
    ])
    # user box overlapping lines 1-2 only
    rec = segment_lookup(tbl, "m", (90, 210, 510, 280))
    assert rec is not None
    # hyphenation repair joins 'pars-' + 'ing' (no digit before '-')
    assert rec["raw_string"] == "Weber, K. (2001). Deep parsing methods. J. Docs, 3, 1-9."
    assert rec["coordinates"] == (100, 200, 500, 290)
    assert rec["detector"] == "Image" and rec["namer"] == "Grobid"
    # no overlap → None; unknown page → None
    assert segment_lookup(tbl, "m", (600, 600, 700, 700)) is None
    assert segment_lookup(tbl, "nope", (0, 0, 10, 10)) is None


def test_segment_lookup_on_synthetic_page():
    from automatic_reference_extractor_ray.pipelines.lines import (
        LINES_SCHEMA, OcrLines, segment_lookup)
    from automatic_reference_extractor_ray.sources.pagegen import page_plan
    ref = "synth://scan_single/0000002a/0/3"
    plan = page_plan(0x2A, 0, "scan_single", 3)
    ocr = OcrLines()
    tbl = ocr(pa.table({"media_ref": pa.array([ref], pa.string())}))
    assert tbl.schema.equals(LINES_SCHEMA)
    # pipeline lines == analytic plan lines, same order
    assert tbl.column("text").to_pylist() == [t for t, _ in plan.lines]
    got_boxes = list(zip(*(tbl.column(c).to_pylist() for c in ("x1", "y1", "x2", "y2"))))
    assert got_boxes == [tuple(b) for _, b in plan.lines]
    # user draws exactly around one line → that line's text comes back
    text0, box0 = plan.lines[0]
    rec = segment_lookup(tbl, ref, box0)
    assert text0.strip() in rec["raw_string"]


def test_result_view(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.pipelines.results import result_view
    requested = rd.from_pandas(pd.DataFrame({"doc_id": ["a", "b", "c", "d"]}))
    refs = rd.from_pandas(pd.DataFrame({"doc_id": ["a", "a", "c", "zz"]}))
    out = result_view(requested, refs).to_pandas().sort_values("doc_id")
    assert dict(zip(out["doc_id"], out["status"])) == {
        "a": "found", "b": "missing", "c": "found", "d": "missing"}
    assert "zz" not in set(out["doc_id"])          # output-only ids dropped


def test_render_doc_xml_exact():
    from automatic_reference_extractor_ray.functions.xmlout import render_doc_xml
    recs = [
        dict(text="Weber, K. <2001>", detector="Image", namer="ParsCit",
             x1=1, y1=2, x2=3, y2=4, authors=["Weber, K."], title="T & t",
             journal="", date="2001", publisher="", location="", volume="7",
             issue="", pages="1-9"),
        dict(text="Plain ref", detector="ParsCit", namer="ParsCit",
             x1=0, y1=0, x2=9, y2=9, authors=[], title="", journal="",
             date="", publisher="", location="", volume="", issue="", pages=""),
    ]
    xml = render_doc_xml("doc-1", recs)
    assert xml == (
        '<algorithm name="LOCDB Web service" fname="doc-1">'
        '<BibStructured detector="Image" namer="ParsCit">'
        '<rawString coordinates="1 2 3 4">Weber, K. &lt;2001&gt;</rawString>'
        '<authors><author>Weber, K.</author></authors>'
        '<title>T &amp; t</title><date>2001</date><volume>7</volume>'
        '<pages>1-9</pages></BibStructured>'
        '<BibStructured detector="ParsCit" namer="ParsCit">'
        '<rawString coordinates="0 0 9 9">Plain ref</rawString>'
        '</BibStructured></algorithm>')


def test_doc_xml_orders_by_span_idx(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.pipelines.results import doc_xml
    df = pd.DataFrame({
        "doc_id": ["d", "d"], "span_idx": [1, 0],
        "text": ["second", "first"], "detector": ["ParsCit"] * 2,
        "namer": ["ParsCit"] * 2, "x1": [0, 0], "y1": [0, 0],
        "x2": [1, 1], "y2": [1, 1],
        "authors": ["", ""], "title": ["", ""], "journal": ["", ""],
        "date": ["", ""], "publisher": ["", ""], "location": ["", ""],
        "volume": ["", ""], "issue": ["", ""], "pages": ["", ""],
    })
    out = doc_xml(rd.from_pandas(df)).to_pandas()
    assert len(out) == 1 and out["n_refs"].iloc[0] == 2
    xml = out["xml"].iloc[0]
    assert xml.index(">first<") < xml.index(">second<")
