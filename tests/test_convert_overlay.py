"""Converter seam (prepareText analogue) + QA overlay rendering."""

import pyarrow as pa
import pytest


def test_txt_passthrough_and_whitelist():
    from automatic_reference_extractor_ray.sources.convert import (
        convert_payload_to_text)
    assert convert_payload_to_text(b"hello\nworld", "txt") == "hello\nworld"
    assert convert_payload_to_text(b"x", ".TXT") == "x"
    with pytest.raises(ValueError, match="whitelist"):
        convert_payload_to_text(b"", "exe")


def test_office_formats_gated():
    from automatic_reference_extractor_ray.sources.convert import (
        convert_payload_to_text, converter_available)
    if converter_available():
        pytest.skip("LibreOffice present - gate not exercisable")
    with pytest.raises(RuntimeError, match="LibreOffice"):
        convert_payload_to_text(b"old-word-doc", "doc")


def test_pdf_route_gated_on_pdftotext():
    """PDFs route to a dedicated extractor (LibreOffice cannot convert
    them), gated on the poppler binary."""
    from automatic_reference_extractor_ray.sources.convert import (
        convert_payload_to_text, pdf_converter_available)
    if pdf_converter_available():
        pytest.skip("pdftotext present - gate not exercisable")
    with pytest.raises(RuntimeError, match="pdftotext"):
        convert_payload_to_text(b"%PDF-1.4", "pdf")


def test_convert_docs_stage_feeds_extraction(ray_session):
    """txt payloads flow through the ingest stage into the extraction
    pipeline, including the M10 title|-repair on the text route."""
    import ray.data as rd

    from automatic_reference_extractor_ray.pipelines.extract import extract_refs
    from automatic_reference_extractor_ray.sources.convert import convert_docs
    body = ("Bogus Title|Intro line\n\nReferences\n\n"
            "[1] Miller, A. (1999). Adaptive methods. "
            "Journal of Document Analysis, 12(3), 45-67.")
    raw = rd.from_arrow(pa.table({
        "doc_id": pa.array(["up-1"], pa.string()),
        "payload": pa.array([body.encode()], pa.binary()),
        "ext": pa.array(["txt"], pa.string())}))
    docs = convert_docs(raw)
    refs = extract_refs(docs, version_dedup=False).to_pandas()
    assert list(refs["doc_id"]) == ["up-1"]
    assert refs["text"].iloc[0].startswith("Miller, A. (1999)")
    assert refs["journal"].iloc[0] == "Journal of Document Analysis"


def test_page_overlay_svg_shape():
    import numpy as np

    from automatic_reference_extractor_ray.functions.hocr import PageObservation
    from automatic_reference_extractor_ray.functions.overlay import (
        page_overlay_svg)
    obs = PageObservation(
        lines=["a"], line_boxes=np.array([[1, 2, 11, 22]]),
        det_boxes=np.array([[5, 6, 50, 60]]),
        col_boxes=np.zeros((0, 4), np.int64))
    svg = page_overlay_svg(obs)
    assert svg.startswith('<svg xmlns="http://www.w3.org/2000/svg" '
                          'width="2480" height="3500">')
    assert ('<rect class="ocr-line" x="1" y="2" width="10" height="20"/>'
            in svg)
    assert '<rect class="det-box" x="5" y="6" width="45" height="54"/>' in svg
    assert svg.endswith("</svg>")
