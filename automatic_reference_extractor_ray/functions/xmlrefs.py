"""XML citation extraction — M8 (LOCDB-V3/xmlProcessing.py:84-107).

``<Citation ID="n">…<BibUnstructured>text</BibUnstructured>…</Citation>``
→ one raw reference string ``"[n] text"`` per citation, newlines
stripped.  (The reference's J5 exact-string rejoin against ParsCit
output, xmlProcessing.py:128-141, is dead code in V3 — the route check
at :38 uses ``filename[:-3]`` instead of ``[-3:]`` so XML files take the
``createBibstructHTML`` path; we therefore emit the extracted citations
directly with ParsCit/ParsCit provenance, matching V3's observable
output.)
"""

from __future__ import annotations

import re

from .textkit import collapse_ws

_CITATION_RE = re.compile(
    r"<Citation\b[^>]*?\bID\s*=\s*\"(?P<id>[^\"]*)\"[^>]*>(?P<body>.*?)</Citation>",
    re.DOTALL | re.IGNORECASE)
_BIBU_RE = re.compile(
    r"<BibUnstructured\b[^>]*>(?P<text>.*?)</BibUnstructured>",
    re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_xml_citations(markup: str) -> list[str]:
    """Ordered ``"[ID] text"`` strings, one per BibUnstructured inside a
    Citation (regex-based — the corpus XML is flat; no stdlib XML parse
    needed, and sloppy entities can't kill the stage)."""
    refs: list[str] = []
    for cm in _CITATION_RE.finditer(markup):
        cid = cm.group("id")
        for bm in _BIBU_RE.finditer(cm.group("body")):
            text = _TAG_RE.sub("", bm.group("text"))
            # &lt;/&gt; first, &amp; LAST — the reverse order would
            # double-unescape "&amp;lt;" into "<" instead of "&lt;"
            text = text.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
            refs.append(f"[{cid}] " + collapse_ws(text))
    return refs


def looks_like_citation_xml(markup: str) -> bool:
    return "<Citation" in markup
