"""Text kernels: hyphenation repair + char-index map, whitespace
normalization, codecs.

The hyphenation/char-index math reproduces the reference byte-for-byte
(LOCDB-V3/imgProcessing.py:487-527): OCR lines are concatenated into one
string; a line's trailing ``-`` is dropped *unless the character before
it is a digit* (page-number heuristic keeps e.g. ``123-``); lines not
ending in ``-`` get a trailing space.  Each line's ``[start, end]``
range in the concatenated string is recorded with the reference's exact
(quirky) bounds: with ``prev`` starting at ``-1`` and an adjusted line
length ``L``, line *i* covers ``[prev+1, prev+L]`` inclusive — i.e. the
``end`` bound overlaps the first character of line *i+1* by one.  The
back-map (J2, LOCDB-V3/imgProcessing.py:318-346) depends on these exact
bounds, so we pin them rather than "fixing" them.
"""

from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")


def repair_line(line: str) -> tuple[str, int]:
    """Apply the reference's per-line hyphenation rule.

    Returns ``(emitted_text, adjusted_len)`` where ``adjusted_len`` is
    the length the reference's index math charges for this line:
    ``len(line) - 1`` when a non-digit-preceded trailing hyphen is
    dropped, ``len(line) + 1`` when a joining space is appended,
    ``len(line)`` when a digit-preceded hyphen is kept
    (LOCDB-V3/imgProcessing.py:498-508).
    """
    n = len(line)
    if line.endswith("-"):
        if len(line) >= 2 and line[-2].isdigit():
            return line, n  # keep: likely a page-number range artifact
        return line[:-1], n - 1
    return line + " ", n + 1


def concat_lines_with_index(lines: list[str]) -> tuple[str, list[tuple[int, int]]]:
    """Concatenate OCR lines with hyphenation repair; emit the per-line
    inclusive ``[start, end]`` char ranges used by the coordinate
    back-map (LOCDB-V3/imgProcessing.py:487-527, the ``all-text2`` /
    ``all-text-indeces`` files)."""
    parts: list[str] = []
    ranges: list[tuple[int, int]] = []
    prev = -1
    for line in lines:
        emitted, adj = repair_line(line)
        parts.append(emitted)
        ranges.append((prev + 1, prev + adj))
        prev += adj
    return "".join(parts), ranges


def join_lines_repaired(lines: list[str]) -> str:
    """Join a group of OCR lines into one reference string using the
    same hyphenation rule, then strip the trailing join space.

    Divergence from the reference, documented: LOCDB-V3's J1 merge joins
    lines with plain spaces (imgProcessing.py:718 ``tempBoxString += " "
    + currLine``), so hyphen-split words survive as ``"exam- ple"`` and
    the later substring back-map (J2) fails for them.  We apply the same
    repair rule in both the merge and the concatenated text so merged
    candidate strings are always back-mappable; observable outputs for
    non-hyphenated refs are identical.
    """
    text, _ = concat_lines_with_index(lines)
    return text.rstrip(" ")


def collapse_ws(s: str) -> str:
    """Collapse runs of whitespace (incl. newlines) into single spaces
    and strip — the normalization applied to every extracted raw
    reference string (cf. ``.replace('\\n','')`` + ``.strip()`` all over
    LOCDB-V3/xmlProcessing.py:190-264)."""
    return _WS_RE.sub(" ", s).strip()


def coords_to_str(box: tuple[int, int, int, int]) -> str:
    """``"x1 y1 x2 y2"`` space-joined ints (LOCDB-V3/imgProcessing.py:385)."""
    return f"{box[0]} {box[1]} {box[2]} {box[3]}"


def split_versioned_doc_id(doc_id: str) -> tuple[str, int]:
    """Split ``"<base>~<version>"`` → ``(base, version)``; version 0 when
    absent.  Models the reference's ``YYYYMMDDHHMMSS_<name>`` timestamp
    prefix whose max wins (``findLatest``,
    LOCDB-V3/fileProcessor.py:223-265).

    A suffix counts as a version ONLY if it is plain digits — not the
    looser ``int()`` grammar ("+3", " 3", "3_0") and not floats.  The
    vectorized batch parser (stages/dedup_version._base_ver) implements
    the SAME digits-only rule; the two MUST agree or the version filter
    can drop documents the pre-pass never counted."""
    base, sep, ver = doc_id.rpartition("~")
    if not sep or not ver.isascii() or not ver.isdigit():
        return doc_id, 0
    return base, int(ver)


_DIGIT_RUN_RE = re.compile(r"\d+")


def natsort_key(s: str) -> str:
    """Flat natural-order sort key: every digit run is replaced by
    ``<2-digit length><run>`` so lexicographic order of keys == natural
    order for runs of ANY length up to 99 digits (fixed-width
    zero-padding alone breaks once a run outgrows the pad — e.g.
    13-digit ids vs 12-digit ids, or the reference's 14-digit
    YYYYMMDDHHMMSS prefixes).  String-typed so it sorts inside Arrow
    blocks (O4; the reference uses natsort.natsorted)."""
    return _DIGIT_RUN_RE.sub(
        lambda m: f"{min(len(m.group(0)), 99):02d}{m.group(0)}", s)


def repair_title_line(text: str) -> str:
    """M10 pdf-inspector title repair: the converter prepends
    ``title|`` to the first line; keep the SECOND ``|``-segment
    (production-version/textProcessing.py:95-104, ``firstline[1]``).
    Quirk-exact: with three or more segments the kept segment carries
    no newline, so the original second line concatenates onto it —
    exactly what the reference's readlines/write round-trip does."""
    nl = text.find("\n")
    first_line = text if nl < 0 else text[:nl]
    if "|" not in first_line:               # hot path: no repair needed
        return text
    lines = text.splitlines(keepends=True)
    if not lines:
        return text
    first = lines[0].split("|")
    if len(first) > 1:
        lines[0] = first[1]
    return "".join(lines)
