"""Output-XML rendering — the reference's per-document result format
(S4): an ``<algorithm name="LOCDB Web service">`` element wrapping
ordered ``BibStructured`` children, each carrying ``detector``/``namer``
provenance attributes, a ``rawString`` child with a
``coordinates="x1 y1 x2 y2"`` attribute (LOCDB-V3/imgProcessing.py:
196-212 structure; coordinate codec :385), and one child per non-empty
citation field in the M12 field order (authors nested as
``<authors><author>…</author></authors>``, :801-968).

Pure string building — deterministic, no DOM library.
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

FIELD_ORDER = ["title", "journal", "date", "publisher", "location",
               "volume", "issue", "pages"]


def _coords(rec: dict) -> str:
    return f"{rec['x1']} {rec['y1']} {rec['x2']} {rec['y2']}"


def render_bibstructured(rec: dict) -> str:
    """One record dict (REFS_SCHEMA row; ``authors`` may be a list or a
    \\x1f-joined string) → ``<BibStructured>…`` element."""
    parts = [f"<BibStructured detector={quoteattr(str(rec['detector']))} "
             f"namer={quoteattr(str(rec['namer']))}>"]
    parts.append(f"<rawString coordinates={quoteattr(_coords(rec))}>"
                 f"{escape(str(rec['text']))}</rawString>")
    authors = rec.get("authors", [])
    if isinstance(authors, str):
        # \x1f-TERMINATED convention (one separator per author, so
        # "" = no authors but "\x1f" = [""]): an organizational
        # author maps to one EMPTY name string (the reference's
        # forename/surname-only join over an orgName author,
        # imgProcessing.py:816-846) and must still render its empty
        # <author></author> element, exactly as len(tempAuthors) > 0
        # does in the reference writer
        authors = authors.split("\x1f")[:-1] if authors else []
    if len(authors):
        parts.append("<authors>" + "".join(
            f"<author>{escape(str(a))}</author>" for a in authors) + "</authors>")
    for f in FIELD_ORDER:
        v = rec.get(f, "")
        if v:
            parts.append(f"<{f}>{escape(str(v))}</{f}>")
    parts.append("</BibStructured>")
    return "".join(parts)


def render_doc_xml(fname: str, records: list[dict]) -> str:
    """Ordered records of one document → the per-doc output XML."""
    body = "".join(render_bibstructured(r) for r in records)
    return (f"<algorithm name=\"LOCDB Web service\" fname={quoteattr(fname)}>"
            f"{body}</algorithm>")
