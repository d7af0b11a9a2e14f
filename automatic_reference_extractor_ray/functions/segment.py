"""Reference-section localization + per-reference segmentation.

This is the non-neural analogue of the reference's region/segmentation
machinery: the Mask-R-CNN reference-region detector
(LOCDB-V3/tools/infer_simple-custom.py) plus ParsCit's CRF segmenter
(LOCDB-V3/imgProcessing.py:539-561).  The reference's "decoy corpus"
trick — prepending dummy.txt + a ``REFERENCES`` heading so ParsCit sees
a plausible paper (LOCDB-V3/textProcessing.py:117-129,
xmlProcessing.py:98-107) — encodes the real contract: *text after the
last REFERENCES-like heading is the candidate region*.  We implement
that contract directly with line heuristics (heading match, ``[N]`` /
``N.`` / ``N)`` numbering, blank-line grouping, hanging indent), per
SURVEY.md §7.
"""

from __future__ import annotations

import re

from .textkit import collapse_ws, join_lines_repaired

HEADING_RE = re.compile(
    r"^\s*(?:\d+\.?\s+)?(references?|bibliography|works\s+cited|"
    r"literature(\s+cited)?|literaturverzeichnis)\s*:?\s*$",
    re.IGNORECASE)

# A line that *starts* a numbered reference: "[12] ...", "12. ...",
# "12) ...".  Bare numbers are bounded to 3 digits: a wrapped line that
# begins with a YEAR ("1995. Graph large ..." — the CSE name-year shape
# breaks lines there) must read as a continuation, not a marker; no
# real bibliography numbers entries into the thousands.  Bracketed
# markers stay unbounded ("[1234]" is unambiguous).
MARKER_LINE_RE = re.compile(r"^\s*(?:\[(\d+)\]|(\d{1,3})[.)])[ \t]+\S")

_LETTER_RE = re.compile(r"[^\W\d_]", re.UNICODE)


def find_heading_line(lines: list[str]) -> int | None:
    """Index of the *last* REFERENCES-like heading line, or None."""
    idx = None
    for i, ln in enumerate(lines):
        if HEADING_RE.match(ln):
            idx = i
    return idx


def reference_region_lines(lines: list[str]) -> list[int]:
    """Indices of the candidate reference-region lines (everything after
    the last heading); empty when no heading is present."""
    h = find_heading_line(lines)
    if h is None:
        return []
    return list(range(h + 1, len(lines)))


def _group_by_markers(idxs: list[int], lines: list[str]) -> list[list[int]] | None:
    # a line directly after a hyphen-ending line is the wrapped tail of
    # the previous reference (the join_lines_repaired rule) no matter
    # how marker-like it looks — "...277-\n286. doi:10..." must not
    # start a new segment at "286."
    marker_positions = [
        i for i in idxs
        if MARKER_LINE_RE.match(lines[i])
        and not (i > 0 and lines[i - 1].rstrip().endswith("-"))]
    if len(marker_positions) < 2:
        return None
    groups: list[list[int]] = []
    for pos, start in enumerate(marker_positions):
        end = marker_positions[pos + 1] if pos + 1 < len(marker_positions) else idxs[-1] + 1
        groups.append([i for i in idxs if start <= i < end])
    return groups


def _group_by_blanks(idxs: list[int], lines: list[str]) -> list[list[int]] | None:
    groups: list[list[int]] = []
    cur: list[int] = []
    saw_blank = False
    for i in idxs:
        if lines[i].strip() == "":
            saw_blank = True
            if cur:
                groups.append(cur)
                cur = []
        else:
            cur.append(i)
    if cur:
        groups.append(cur)
    return groups if saw_blank and groups else None


def _group_by_hanging_indent(idxs: list[int], lines: list[str]) -> list[list[int]]:
    """New reference starts at a flush-left line; indented lines continue
    the previous one (hanging-indent detection, SURVEY.md §7 step 2)."""
    groups: list[list[int]] = []
    cur: list[int] = []
    for i in idxs:
        ln = lines[i]
        if ln.strip() == "":
            continue
        flush = not ln[:1].isspace()
        if flush and cur:
            groups.append(cur)
            cur = []
        cur.append(i)
    if cur:
        groups.append(cur)
    return groups


def segment_region(idxs: list[int], lines: list[str], min_len: int = 5,
                   ) -> list[tuple[list[int], str]]:
    """Segment the candidate region (line indices into ``lines``) into
    references.

    Strategy order: numbering markers (>=2 markers), blank-line groups,
    hanging indent.  Each segment's raw string is the marker-stripped,
    whitespace-collapsed join of its lines; segments shorter than
    ``min_len`` or without any letter are dropped (the reference's
    ``len > 5`` filter, LOCDB-V3/xmlProcessing.py:217).

    Returns ``[(line_indices, raw_string), ...]`` in document order.
    """
    idxs = [i for i in idxs]
    if not idxs:
        return []
    groups = _group_by_markers(idxs, lines)
    if groups is None:
        groups = _group_by_blanks(idxs, lines)
    if groups is None:
        groups = _group_by_hanging_indent(idxs, lines)
    out: list[tuple[list[int], str]] = []
    for g in groups:
        g = [i for i in g if lines[i].strip() != ""]
        if not g:
            continue
        first = re.sub(r"^\s*(?:\[\d+\]|\d{1,3}[.)])[ \t]+", "",
                       lines[g[0]], count=1)
        # join with the hyphenation-repair rule so a line-broken word is
        # reassembled the same way the concatenated back-map text is
        raw = collapse_ws(join_lines_repaired([first] + [lines[i] for i in g[1:]]))
        if len(raw) > min_len and _LETTER_RE.search(raw):
            out.append((g, raw))
    return out


def segment_text(text: str, min_len: int = 5) -> list[str]:
    """Text-document entry point: localize the reference section inside
    a plain-text document and segment it.  No heading → no references
    (the decoy convention guarantees a heading on the reference's text
    path; we make the contract explicit)."""
    lines = text.split("\n")
    region = reference_region_lines(lines)
    return [raw for _, raw in segment_region(region, lines, min_len)]
