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


def test_events_asof_orders_semantics(ray_session):
    """Hand-built as-of case: latest order at-or-before each event,
    date ties -> larger orderkey, no prior order -> dropped."""
    import pandas as pd
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import (
        events_asof_orders)
    ts = pd.Timestamp
    events = rd.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 9],
        "ts": [ts("2024-01-10"), ts("2024-01-20"), ts("2024-01-01"),
               ts("2024-01-10")]}))
    orders = rd.from_pandas(pd.DataFrame({
        "o_orderkey": [100, 101, 102, 200],
        "o_custkey": [7, 7, 7, 8],
        "o_orderdate": [ts("2024-01-05"), ts("2024-01-10"),
                        ts("2024-01-10"), ts("2024-01-01")]}))
    got = {r["event_id"]: r["asof_orderkey"]
           for r in events_asof_orders(events, orders).take_all()}
    # event 1 @01-10: orders 100(01-05),101/102(01-10) -> tie -> 102
    # event 2 @01-20: latest is 102; event 3 @01-01: none; user 9: none
    assert got == {1: 102, 2: 102}


def test_events_sliding_fanout(ray_session):
    """Every event lands in exactly win/slide windows."""
    import pandas as pd
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.relational import events_sliding
    events = rd.from_pandas(pd.DataFrame({
        "event_type": ["x"],
        "ts": [pd.Timestamp("2024-01-01 00:25:00")],
        "value": [1.0]}))
    got = events_sliding(events).to_pandas().sort_values("window_start")
    assert list(got["window_start"]) == [
        pd.Timestamp("2024-01-01 00:00:00"),
        pd.Timestamp("2024-01-01 00:10:00"),
        pd.Timestamp("2024-01-01 00:20:00")]
    assert list(got["n"]) == [1, 1, 1]


def test_duplicated_passages(ray_session):
    import pandas as pd
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import (
        duplicated_passages)
    passage = "the quick brown fox jumps over the lazy dog"   # 9 tokens
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"intro words here {passage}",
                 f"{passage} trailing bits",
                 "completely different text with no repeats at all ok"]}))
    got = duplicated_passages(docs, n=9).to_pandas()
    assert list(got["gram"]) == [passage]
    assert list(got["n_occurrences"]) == [2]
    assert list(got["n_docs"]) == [2]


def test_quality_filter_rules(ray_session):
    import pandas as pd
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.textstats import quality_filter
    good = ("the quality document contains useful information and "
            "the sections describe methods for processing with care "
            "on relevant topics today ") * 3
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [good,
                 "too short",
                 "xx " * 100,                         # 2-char words, no stops
                 ("supercalifragilisticexpialidocious " * 60)]}))
    out = (docs.map_batches(quality_filter, batch_format="pandas")
           .to_pandas().set_index("doc_id"))
    assert bool(out.loc[1, "keep"])
    assert bool(out.loc[2, "flag_too_short"]) and not out.loc[2, "keep"]
    assert bool(out.loc[3, "flag_bad_word_len"]) or \
        bool(out.loc[3, "flag_low_stopwords"])
    assert bool(out.loc[4, "flag_bad_word_len"]) and not out.loc[4, "keep"]


def test_render_bibstructured_author_string_convention():
    # \x1f-TERMINATED flat-string authors: "" = no authors,
    # "A\x1fB\x1f" = ["A", "B"], and "\x1f" = [""] — the org-author
    # quirk (an orgName author joins to an empty name,
    # imgProcessing.py:816-846) must still render its empty
    # <author></author> element, exactly like the list form does
    from automatic_reference_extractor_ray.functions.xmlout import (
        render_bibstructured)
    base = dict(text="t", detector="D", namer="N", x1=0, y1=0, x2=1, y2=1,
                title="", journal="", date="", publisher="", location="",
                volume="", issue="", pages="")
    for lst, flat in ([], ""), (["A", "B"], "A\x1fB\x1f"), ([""], "\x1f"):
        as_list = render_bibstructured({**base, "authors": lst})
        as_flat = render_bibstructured({**base, "authors": flat})
        assert as_list == as_flat, (lst, flat)
    org = render_bibstructured({**base, "authors": [""]})
    assert "<authors><author></author></authors>" in org
    none = render_bibstructured({**base, "authors": []})
    assert "<authors>" not in none
