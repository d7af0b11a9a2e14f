"""Citation-field tokenizer: raw reference string → BibStructured fields.

Replaces the reference's two external field namers — ParsCit's CRF
(LOCDB-V3/textProcessing.py:35-42) and the Grobid HTTP service whose TEI
output is mapped at LOCDB-V3/imgProcessing.py:801-968 — with one
deterministic rule-based parser producing the same field set:

    authors (list), title, journal, date, publisher, location,
    volume, issue, pages

Field semantics follow the Grobid TEI mapper (M12): authors are joined
"First [Middle] Last"-style name strings; pages are ``from-to``
(imgProcessing.py:948-956); date is the publication year.  Three
recognized citation shapes (the synthetic-corpus templates) parse
exactly; anything else falls back to year/sentence heuristics.
"""

from __future__ import annotations

import re

EMPTY_FIELDS: dict[str, object] = {
    "authors": [], "title": "", "journal": "", "date": "", "publisher": "",
    "location": "", "volume": "", "issue": "", "pages": "",
}

# Leading segment markers: "[12] ", "12. ", "12) " (segmenter/XML-path
# numbering conventions, LOCDB-V3/imgProcessing.py:759-765 and
# xmlProcessing.py:95).
MARKER_PREFIX_RE = re.compile(r"^\s*(?:\[\d+\]|\d+[.)])\s+")

# T1 journal article: "Last, A. and Last2, B. (1999). Title words. Journal Name, 12(3), 45-67."
_T1 = re.compile(
    r"^(?P<auth>.+?) \((?P<year>(?:19|20)\d{2})\)\. "
    r"(?P<title>[^.]+)\. (?P<journal>[^,.]+), "
    r"(?P<vol>\d+)\((?P<iss>\d+)\), (?P<p1>\d+)-(?P<p2>\d+)\.$")

# T2 book: "Last, A. (2001). Title words. Publisher Name, City."
_T2 = re.compile(
    r"^(?P<auth>.+?) \((?P<year>(?:19|20)\d{2})\)\. "
    r"(?P<title>[^.]+)\. (?P<publisher>[^,.]+), (?P<loc>[^,.]+)\.$")

# T3 surname-style: "Last and Last2. Title words. Journal Name 12:45-67, 1999."
_T3 = re.compile(
    r"^(?P<auth>[A-Z][A-Za-z]+(?: and [A-Z][A-Za-z]+)?)\. "
    r"(?P<title>[^.]+)\. (?P<journal>.+?) "
    r"(?P<vol>\d+):(?P<p1>\d+)-(?P<p2>\d+), (?P<year>(?:19|20)\d{2})\.$")

_YEAR_RE = re.compile(r"\b(19|20)\d{2}\b")


def strip_marker(raw: str) -> str:
    return MARKER_PREFIX_RE.sub("", raw, count=1)


def _split_authors(auth: str) -> list[str]:
    return [a.strip() for a in auth.split(" and ") if a.strip()]


def parse_fields(raw: str) -> dict[str, object]:
    """Tokenize one raw reference string into the BibStructured field
    dict.  Deterministic; unknown shapes degrade to best-effort
    year/sentence heuristics with empty remaining fields."""
    s = strip_marker(raw).strip()
    f = dict(EMPTY_FIELDS)
    m = _T1.match(s)
    if m:
        f.update(authors=_split_authors(m["auth"]), title=m["title"],
                 journal=m["journal"], date=m["year"], volume=m["vol"],
                 issue=m["iss"], pages=f"{m['p1']}-{m['p2']}")
        return f
    m = _T2.match(s)
    if m:
        f.update(authors=_split_authors(m["auth"]), title=m["title"],
                 date=m["year"], publisher=m["publisher"], location=m["loc"])
        return f
    m = _T3.match(s)
    if m:
        f.update(authors=_split_authors(m["auth"]), title=m["title"],
                 journal=m["journal"], date=m["year"], volume=m["vol"],
                 pages=f"{m['p1']}-{m['p2']}")
        return f
    # Fallback: year anywhere; first sentence = authors, second = title.
    ym = _YEAR_RE.search(s)
    if ym:
        f["date"] = ym.group(0)
    parts = [p.strip() for p in s.split(". ") if p.strip()]
    if len(parts) >= 2:
        f["authors"] = _split_authors(re.sub(r"\s*\(\d{4}\)$", "", parts[0]))
        f["title"] = parts[1]
    return f
