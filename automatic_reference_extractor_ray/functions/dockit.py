"""Per-text-span extraction kernel + document-kind routing (M1).

The reference routes by filename extension
(LOCDB-V3/fileProcessor.py:50-52, 99-115); a span-table engine routes by
content sniffing with three fixed, SQL-expressible rules (used verbatim
by the route_counts oracle):

    contains "<Citation"                      → xml   (M8 extractor)
    contains "<cite" | "<dl" | "<div" | "<td" → html  (M7 families + M13)
    otherwise                                 → text  (localize + segment)

Each extractor returns ordered record dicts with provenance matching the
reference's observable output (see functions/htmlrefs.py /
functions/xmlrefs.py / functions/segment.py docstrings).
"""

from __future__ import annotations

from .fields import EMPTY_FIELDS, parse_fields
from .htmlrefs import extract_html_refs, has_cite, map_html_cite_fields
from .segment import segment_text
from .textkit import repair_title_line
from .xmlrefs import extract_xml_citations

FIELD_KEYS = ["authors", "title", "journal", "date", "publisher",
              "location", "volume", "issue", "pages"]


def sniff_kind(text: str) -> str:
    if "<Citation" in text:
        return "xml"
    if ("<cite" in text) or ("<dl" in text) or ("<div" in text) or ("<td" in text):
        return "html"
    return "text"


def _rec(raw: str, detector: str, namer: str, fields: dict) -> dict:
    r = dict(text=raw, detector=detector, namer=namer,
             x1=0, y1=0, x2=0, y2=0, column=0)
    for k in FIELD_KEYS:
        v = fields.get(k, [] if k == "authors" else "")
        r[k] = [str(a) for a in v] if k == "authors" else str(v)
    return r


def extract_text_unit(text: str, min_len: int = 5) -> list[dict]:
    """One text span → ordered extraction records."""
    kind = sniff_kind(text)
    if kind == "xml":
        return [_rec(raw, "ParsCit", "ParsCit", parse_fields(raw))
                for raw in extract_xml_citations(text)]
    if kind == "html":
        recs = [_rec(raw, "ParsCit", "ParsCit", parse_fields(raw))
                for raw in extract_html_refs(text)]
        if has_cite(text):
            # mapHTML records are appended after the ParsCit ones
            # (xmlProcessing.py:43-47)
            for f in map_html_cite_fields(text):
                recs.append(_rec(str(f["raw"]), "Mapping", "Mapping", f))
        return recs
    # M10: converted text first-line "title|..." repair runs only on
    # the plain-text route, like the reference's prepareText
    return [_rec(raw, "ParsCit", "ParsCit", parse_fields(raw))
            for raw in segment_text(repair_title_line(text), min_len)]
