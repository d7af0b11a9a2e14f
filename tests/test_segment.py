"""Section localization + segmentation heuristics (the ParsCit-CRF
analogue; decoy contract LOCDB-V3/textProcessing.py:117-129)."""

from automatic_reference_extractor_ray.functions.segment import (
    find_heading_line, segment_region, segment_text)


def test_heading_last_wins():
    lines = ["References", "body", "REFERENCES", "x"]
    assert find_heading_line(lines) == 2


def test_heading_variants():
    for h in ["References", "REFERENCES", "Bibliography", "Works Cited",
              "Literature Cited", "references:", "7. References"]:
        assert find_heading_line([h]) == 0, h
    for nh in ["The References", "References to things", "Refs"]:
        assert find_heading_line([nh]) is None, nh


def test_numbered_segmentation_strips_marker():
    text = "body\n\nReferences\n\n[1] Alpha beta gamma.\n[2] Delta epsilon zeta."
    assert segment_text(text) == ["Alpha beta gamma.", "Delta epsilon zeta."]


def test_numbered_multiline():
    text = "References\n1. Alpha beta\ngamma delta.\n2. Epsilon zeta."
    assert segment_text(text) == ["Alpha beta gamma delta.", "Epsilon zeta."]


def test_blank_line_segmentation():
    text = "References\n\nAlpha beta gamma.\nmore alpha.\n\nDelta epsilon."
    assert segment_text(text) == ["Alpha beta gamma. more alpha.", "Delta epsilon."]


def test_hanging_indent_segmentation():
    text = "References\nAlpha beta gamma\n    continued here.\nDelta epsilon zeta."
    assert segment_text(text) == ["Alpha beta gamma continued here.",
                                  "Delta epsilon zeta."]


def test_no_heading_no_refs():
    assert segment_text("Just body text.\nNothing else.") == []


def test_min_length_filter():
    text = "References\n\n[1] abc.\n[2] Long enough reference here."
    assert segment_text(text) == ["Long enough reference here."]


def test_region_after_last_heading_only():
    text = "References\n[1] Early one ignored.\nReferences\n[1] Kept alpha beta.\n[2] Kept gamma delta."
    assert segment_text(text) == ["Kept alpha beta.", "Kept gamma delta."]


def test_segment_region_joins_with_hyphen_repair():
    lines = ["References", "1. Alpha spect-", "ral beta.", "2. Gamma delta epsilon."]
    segs = segment_region([1, 2, 3], lines)
    assert [raw for _, raw in segs] == ["Alpha spectral beta.",
                                       "Gamma delta epsilon."]


def test_title_pipe_repair_flows_through_text_route():
    """M10: a converted doc whose first line is 'title|real' extracts
    the same references as the clean text."""
    from automatic_reference_extractor_ray.functions.dockit import (
        extract_text_unit)
    clean = ("Intro line\n\nReferences\n\n"
             "[1] Miller, A. (1999). Adaptive methods. "
             "Journal of Document Analysis, 12(3), 45-67.")
    piped = "Bogus Extracted Title|" + clean
    assert [r["text"] for r in extract_text_unit(piped)] == \
        [r["text"] for r in extract_text_unit(clean)]
