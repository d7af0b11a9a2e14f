"""hOCR parsing/serialization — M3 (LOCDB-V3/imgProcessing.py:457-485).

The OCR engine contract is "page payload bytes → hOCR markup"; the
parser extracts ``span.ocr_line`` boxes (``title="bbox x1 y1 x2 y2"``)
and joins their ``span.ocrx_word`` children with spaces, dropping empty
lines — exactly the reference's Tesseract parse.

Two extension span classes carry what the reference obtained from its
two Detectron subprocesses, so a synthetic page payload is
self-contained and the detector "model" is deterministic:

  ``span.det_box``  reference-region detection [x1 y1 x2 y2, conf]
                    (Mask R-CNN output, tools/infer_simple-custom.py:160-163)
  ``span.col_box``  column/layout detection    [x1 y1 x2 y2, conf]
                    (Faster R-CNN output, tools/infer_simple-custom2.py)

A real OCR/detector engine plugs in behind the same
``bytes → PageObservation`` interface (stages/ocr.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from .minidom import parse_html

_TITLE_RE = re.compile(
    r"bbox (?P<x1>\d+) (?P<y1>\d+) (?P<x2>\d+) (?P<y2>\d+)(?:; conf (?P<conf>[0-9.]+))?")


@dataclass
class PageObservation:
    """Everything the downstream per-page kernel needs about one page."""
    lines: list[str] = field(default_factory=list)
    line_boxes: np.ndarray = field(default_factory=lambda: np.zeros((0, 4), np.int64))
    det_boxes: np.ndarray = field(default_factory=lambda: np.zeros((0, 4), np.int64))
    det_conf: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))
    col_boxes: np.ndarray = field(default_factory=lambda: np.zeros((0, 4), np.int64))
    col_conf: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))


_FAST_SPAN_RE = re.compile(
    r"<span class='(?P<cls>ocr_line|det_box|col_box)' title='(?P<title>[^']*)'>"
    r"(?P<body>.*?)</span>\s*$", re.M)
_FAST_WORD_RE = re.compile(r"<span class='ocrx_word'>(?P<w>[^<]*)</span>")


def _parse_hocr_fast(markup: str) -> PageObservation | None:
    """Regex parse of the single-quoted one-span-per-line hOCR shape
    ``build_hocr`` emits (and warm OCR engines configured to match).
    Returns None when the markup doesn't fit — caller falls back to the
    tolerant DOM parse.  ~10x faster than html.parser on the hot path."""
    import html as _html
    lines, lboxes, dets, dconf, cols, cconf = [], [], [], [], [], []
    n = 0
    for m in _FAST_SPAN_RE.finditer(markup):
        n += 1
        t = _TITLE_RE.search(m["title"])
        if t is None:
            continue
        box = [int(t["x1"]), int(t["y1"]), int(t["x2"]), int(t["y2"])]
        cls = m["cls"]
        if cls == "ocr_line":
            words = [_html.unescape(w).strip()
                     for w in _FAST_WORD_RE.findall(m["body"])]
            text = " ".join(words).strip()
            if text:
                lines.append(text)
                lboxes.append(box)
        elif cls == "det_box":
            dets.append(box); dconf.append(float(t["conf"] or 0.0))
        else:
            cols.append(box); cconf.append(float(t["conf"] or 0.0))
    if n == 0 and "<span" in markup:
        return None                      # unfamiliar shape → DOM parse
    return PageObservation(
        lines=lines,
        line_boxes=np.asarray(lboxes, np.int64).reshape(-1, 4),
        det_boxes=np.asarray(dets, np.int64).reshape(-1, 4),
        det_conf=np.asarray(dconf, np.float64),
        col_boxes=np.asarray(cols, np.int64).reshape(-1, 4),
        col_conf=np.asarray(cconf, np.float64),
    )


def parse_hocr(markup: str) -> PageObservation:
    fast = _parse_hocr_fast(markup)
    if fast is not None:
        return fast
    root = parse_html(markup)
    lines: list[str] = []
    lboxes: list[list[int]] = []
    dets: list[list[int]] = []
    dconf: list[float] = []
    cols: list[list[int]] = []
    cconf: list[float] = []
    for span in root.find_all("span"):
        classes = set(span.classes)
        m = _TITLE_RE.search(span.attrs.get("title", ""))
        if m is None:
            continue
        box = [int(m["x1"]), int(m["y1"]), int(m["x2"]), int(m["y2"])]
        if "ocr_line" in classes:
            # join ALL word spans with single spaces — an empty
            # ocrx_word yields a double space, exactly like the
            # reference's ``tempLineString + " " + word.string`` loop
            # (imgProcessing.py:471-475); this is what later defeats the
            # J2 substring back-map (collapse_ws'd segment raw vs
            # double-spaced concatenated text) → M14 scrub.
            words = [w.text.strip() for w in span.find_all("span", cls="ocrx_word")]
            text = " ".join(words).strip()
            if text:                             # drop empty lines (:478)
                lines.append(text.strip())
                lboxes.append(box)
        elif "det_box" in classes or "col_box" in classes:
            conf = float(m["conf"] or 0.0)
            if "det_box" in classes:
                dets.append(box); dconf.append(conf)
            else:
                cols.append(box); cconf.append(conf)
    return PageObservation(
        lines=lines,
        line_boxes=np.asarray(lboxes, np.int64).reshape(-1, 4),
        det_boxes=np.asarray(dets, np.int64).reshape(-1, 4),
        det_conf=np.asarray(dconf, np.float64),
        col_boxes=np.asarray(cols, np.int64).reshape(-1, 4),
        col_conf=np.asarray(cconf, np.float64),
    )


def build_hocr(lines: list[tuple[str, tuple[int, int, int, int]]],
               det_boxes: list[tuple[tuple[int, int, int, int], float]] = (),
               col_boxes: list[tuple[tuple[int, int, int, int], float]] = ()) -> str:
    """Serialize a synthetic page to hOCR markup (inverse of
    :func:`parse_hocr`; words are the line's whitespace tokens)."""
    parts = ["<html><body><div class='ocr_page'>"]
    def esc(w: str) -> str:
        return w.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    for text, (x1, y1, x2, y2) in lines:
        # split on single spaces so a double space round-trips as an
        # empty ocrx_word (a real Tesseract artifact)
        words = " ".join(f"<span class='ocrx_word'>{esc(w)}</span>" for w in text.split(" "))
        parts.append(f"<span class='ocr_line' title='bbox {x1} {y1} {x2} {y2}'>{words}</span>")
    for (x1, y1, x2, y2), conf in det_boxes:
        parts.append(f"<span class='det_box' title='bbox {x1} {y1} {x2} {y2}; conf {conf:.4f}'></span>")
    for (x1, y1, x2, y2), conf in col_boxes:
        parts.append(f"<span class='col_box' title='bbox {x1} {y1} {x2} {y2}; conf {conf:.4f}'></span>")
    parts.append("</div></body></html>")
    return "\n".join(parts)
