"""Visual QA overlay — the codec-free analogue of the reference's
box-drawing QA images (LOCDB-V3/imgProcessing.py:1127-1247, which
paints detected/OCR rectangles onto the page raster for inspection).

Without image codecs in the engine, the overlay is an SVG document:
one ``<rect>`` per OCR line (class ``ocr-line``), one per detection box
(class ``det-box``), one per column box (class ``col-box``) — viewable
in any browser on top of the page scan.  The string layout is fixed
and deterministic so the output is oracle-comparable by md5.
"""

from __future__ import annotations

from .hocr import PageObservation

PAGE_W, PAGE_H = 2480, 3500     # pagegen raster size (300dpi-ish A4)

_HEADER = (f'<svg xmlns="http://www.w3.org/2000/svg" '
           f'width="{PAGE_W}" height="{PAGE_H}">')


def _rect(cls: str, x1: int, y1: int, x2: int, y2: int) -> str:
    return (f'<rect class="{cls}" x="{x1}" y="{y1}" '
            f'width="{x2 - x1}" height="{y2 - y1}"/>')


def page_overlay_svg(obs: PageObservation) -> str:
    """One page's QA overlay.  Rect order: OCR lines in observation
    order, then detection boxes, then column boxes — stable, so the
    md5 is a content fingerprint."""
    parts = [_HEADER]
    for (x1, y1, x2, y2) in obs.line_boxes:
        parts.append(_rect("ocr-line", int(x1), int(y1), int(x2), int(y2)))
    for (x1, y1, x2, y2) in obs.det_boxes:
        parts.append(_rect("det-box", int(x1), int(y1), int(x2), int(y2)))
    for (x1, y1, x2, y2) in obs.col_boxes:
        parts.append(_rect("col-box", int(x1), int(y1), int(x2), int(y2)))
    parts.append("</svg>")
    return "".join(parts)
