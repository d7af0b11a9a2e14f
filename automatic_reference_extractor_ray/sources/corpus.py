"""Deterministic synthetic interleaved-document corpus + analytic golden.

One fixture class per reference code path (FIXTURES.md): plain/blank/
hanging text segmentation, the five HTML selector families, XML
citations, the scan classes (single/multi-column, hyphenation,
back-map-fail, near-dup boundary, no-heading, noise box, multi-page,
heavy), version duplicates and empty docs.

``build_doc(doc_key)`` → (input rows, golden rows).  Everything is a
pure function of ``doc_key`` (crc32 seed), so the corpus can be built
from just a list of ids — inside ``map_batches`` on any worker — and the
golden is computed analytically (never by running the pipeline).
"""

from __future__ import annotations

import zlib

import numpy as np

from ..functions.fields import EMPTY_FIELDS
from ..functions.textkit import collapse_ws
from .citegen import Citation, gen_body_sentence, gen_citation
from .pagegen import page_plan

DOC_CLASSES = [
    "txt_plain", "txt_plain", "txt_blank", "txt_hanging", "txt_multispan",
    "html_cite", "html_dl", "html_pll", "html_cc", "html_td",
    "xml_citation", "empty", "versioned",
    "scan_single", "scan_single", "scan_multicol", "scan_3col",
    "scan_hyphen", "scan_backfail", "scan_neardup", "scan_nohead",
    "scan_noise", "scan_multipage",
]
HEAVY_EVERY = 59   # every 59th seed becomes a media-dense straggler doc

GOLDEN_FIELD_KEYS = ["authors", "title", "journal", "date", "publisher",
                     "location", "volume", "issue", "pages"]


def doc_seed(doc_key: str) -> int:
    return zlib.crc32(doc_key.encode("utf-8")) & 0xFFFFFFFF


def doc_class(doc_key: str) -> str:
    seed = doc_seed(doc_key)
    if seed % HEAVY_EVERY == 0:
        return "scan_heavy"
    return DOC_CLASSES[seed % len(DOC_CLASSES)]


def _rng(seed: int, *extra: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64([seed, *extra, 0xC0FFEE]))


def doc_ids_for_key(doc_key: str) -> list[str]:
    """The doc_id rows ``build_doc`` emits for a key, without building
    the documents — the column-pruned id read of a real table."""
    if doc_class(doc_key) == "versioned":
        return [f"{doc_key}~1", f"{doc_key}~2"]
    return [doc_key]


def media_ref_for(cls: str, seed: int, page: int, n_refs: int = 0) -> str:
    return f"synth://{cls}/{seed:08x}/{page}/{n_refs}"


def parse_media_ref(ref: str) -> tuple[str, int, int, int]:
    """``synth://cls/seedhex/page/nrefs`` → (cls, seed, page, n_refs)."""
    assert ref.startswith("synth://"), ref
    cls, seedhex, page, nr = ref[len("synth://"):].split("/")
    return cls, int(seedhex, 16), int(page), int(nr)


# ---------------------------------------------------------------- helpers

def _safe_split(raw: str, nlines: int) -> list[str]:
    """Split at word boundaries, never starting a chunk with a digit
    (would fake a numbering marker for the segmenter)."""
    words = raw.split(" ")
    nlines = max(1, min(nlines, len(words)))
    per = (len(words) + nlines - 1) // nlines
    chunks: list[list[str]] = []
    cur: list[str] = []
    for w in words:
        if len(cur) >= per and not w[:1].isdigit():
            chunks.append(cur)
            cur = []
        cur.append(w)
    if cur:
        chunks.append(cur)
    return [" ".join(c) for c in chunks]


def _mk_record(raw: str, detector: str, namer: str, fields: dict,
               box=(0, 0, 0, 0), column: int = 0) -> dict:
    r = dict(text=raw, detector=detector, namer=namer,
             x1=int(box[0]), y1=int(box[1]), x2=int(box[2]), y2=int(box[3]),
             column=int(column))
    for k in GOLDEN_FIELD_KEYS:
        r[k] = list(fields.get(k, [])) if k == "authors" else str(fields.get(k, ""))
    return r


def _body_lines(rng, n=None) -> list[str]:
    return [gen_body_sentence(rng) for _ in range(n or int(rng.integers(3, 6)))]


def _text_refs_block(cits: list[Citation], style: str, rng) -> list[str]:
    """Render a references section body for a text span."""
    lines: list[str] = []
    if style == "numbered":
        for i, c in enumerate(cits):
            lines.append(f"[{i + 1}] {c.raw}")
    elif style == "blank":
        for i, c in enumerate(cits):
            if i:
                lines.append("")
            lines.extend(_safe_split(c.raw, 2))
    elif style == "hanging":
        for c in cits:
            chunks = _safe_split(c.raw, 2)
            lines.append(chunks[0])
            lines.extend("    " + ch for ch in chunks[1:])
    return lines


def _txt_doc_span(rng, cits, style) -> str:
    parts = _body_lines(rng)
    parts.append("")
    parts.append("References")
    if style != "hanging":
        parts.append("")
    parts.extend(_text_refs_block(cits, style, rng))
    return "\n".join(parts)


# ------------------------------------------------------------- HTML docs

def _cite_fallback_fields(pieces: list[str], date: str) -> dict:
    """Analytic expectation for the ParsCit twin of a <cite>: the raw
    string is the space-joined span values, whose FIRST ". " boundary
    is inside the lead author's initials (titles/journals/pools carry
    no periods — a generator invariant; middle-initial authors add a
    second boundary which stays in the tail).  A year/sentence
    heuristic therefore recovers: authors = the head before the first
    boundary, title = the entire tail, date = the (unique) year.
    Derived here from the construction — NOT by calling the pipeline's
    parse_fields (round-1 circularity fix); tests assert parse_fields
    agrees."""
    f = dict(EMPTY_FIELDS)
    f["date"] = date
    joined = collapse_ws(" ".join(p for p in pieces if p))
    head, sep, tail = joined.partition(". ")
    if sep:
        f["authors"] = [head]
        f["title"] = tail
    return f


def _html_cite_doc(rng, cits):
    """Old format: <cite> with span.cit-* fields → ParsCit records (raw
    text) + Mapping records (mapped fields) appended after
    (xmlProcessing.py:187-191 + mapHTML append at :43-47)."""
    markup = ["<html><body>"]
    pars_recs, map_recs = [], []
    for c in cits:
        f = c.fields
        lead_author = f["authors"][0] if f["authors"] else ""
        spans = []
        if lead_author:
            spans.append(f'<span class="cit-auth"><span>{lead_author}</span></span>')
        spans.append(f'<span class="cit-pub-date">{f["date"]}</span>')
        spans.append(f'<span class="cit-article-title">{f["title"]}</span>')
        if f["journal"]:
            spans.append(f'<span class="cit-jnl-abbrev">{f["journal"]}</span>')
        if f["volume"]:
            spans.append(f'<span class="cit-vol">{f["volume"]}</span>')
        p1, _, p2 = f["pages"].partition("-") if f["pages"] else ("", "", "")
        if f["pages"]:
            spans.append(f'<span class="cit-fpage">{p1}</span>')
            spans.append(f'<span class="cit-lpage">{p2}</span>')
        if f["publisher"]:
            spans.append(f'<span class="cit-publ-name">{f["publisher"]}</span>')
        if f["location"]:
            spans.append(f'<span class="cit-publ-loc">{f["location"]}</span>')
        markup.append("<cite>" + " ".join(spans) + "</cite>")
        pieces = ([lead_author] if lead_author else []) \
            + [str(f["date"]), str(f["title"])] \
            + ([str(f["journal"])] if f["journal"] else []) \
            + ([str(f["volume"])] if f["volume"] else []) \
            + ([p1, p2] if f["pages"] else []) \
            + ([str(f["publisher"])] if f["publisher"] else []) \
            + ([str(f["location"])] if f["location"] else [])
        raw = collapse_ws(" ".join(pieces))
        pars_recs.append(_mk_record(raw, "ParsCit", "ParsCit",
                                    _cite_fallback_fields(pieces, f["date"])))
        mf = dict(f)
        mf["authors"] = [lead_author] if lead_author else []
        mf["issue"] = ""   # mapHTML has no cit-issue class
        # mapHTML joins pages only when BOTH fpage and lpage are
        # non-empty (xmlProcessing.py:389-395) — a from-only page
        # (T6) yields an empty lpage span and therefore NO pages
        mf["pages"] = f["pages"] if (p1 and p2) else ""
        map_recs.append(_mk_record(raw, "Mapping", "Mapping", mf))
    markup.append("</body></html>")
    return "\n".join(markup), pars_recs + map_recs


def _html_dl_doc(rng, cits):
    markup = ['<html><body><dl class="references">']
    recs = []
    for i, c in enumerate(cits):
        content = c.raw[:-1] if c.raw.endswith(".") else c.raw
        markup.append(f'<dt class="label">{i + 1}</dt>')
        markup.append(f'<dd><span>{content}</span>'
                      f'<span class="ReferenceLinks">Google Scholar</span></dd>')
        golden = content + "."          # family adds the trailing dot
        # golden text == c.raw (templates end with "."), so the
        # generator-truth fields apply — no parse_fields circularity
        recs.append(_mk_record(golden, "ParsCit", "ParsCit", c.fields))
    markup.append("</dl></body></html>")
    return "\n".join(markup), recs


def _html_pll_doc(rng, cits):
    markup = ['<html><body><div class="pll">']
    recs = []
    for i, c in enumerate(cits):
        if i % 2 == 0:
            inner = f"['{c.raw[:-1]}']"     # wrapped, no trailing dot inside
            golden = c.raw[:-1] + "."
        else:
            inner = c.raw[:-1]              # missing trailing dot
            golden = c.raw[:-1] + "."
        markup.append(f'<div class="media-body mls plxl reference-contains">{inner}</div>')
        # golden text == c.raw → generator-truth fields (see _html_dl_doc)
        recs.append(_mk_record(golden, "ParsCit", "ParsCit", c.fields))
    markup.append("</div></body></html>")
    return "\n".join(markup), recs


def _html_cc_doc(rng, cits):
    markup = ['<html><body><div class="content">']
    recs = []
    for i, c in enumerate(cits):
        markup.append(f'<div class="CitationContent"><span>{i + 1}.</span> {c.raw}</div>')
        recs.append(_mk_record(c.raw, "ParsCit", "ParsCit", c.fields))
    markup.append("</div></body></html>")
    return "\n".join(markup), recs


def _html_td_doc(rng, cits):
    markup = ["<html><body><table>"]
    recs = []
    for c in cits:
        markup.append(f'<tr><td valign="top">{c.raw} '
                      f'<span class="ref-google">Google Scholar</span> '
                      f'<span class="ref-xLink">CrossRef</span></td></tr>')
        recs.append(_mk_record(c.raw, "ParsCit", "ParsCit", c.fields))
    markup.append("</table></body></html>")
    return "\n".join(markup), recs


def _xml_doc(rng, cits):
    markup = ["<Citations>"]
    recs = []
    for i, c in enumerate(cits):
        markup.append(f'<Citation ID="{i + 1}"><BibUnstructured>{c.raw}'
                      f"</BibUnstructured></Citation>")
        raw = f"[{i + 1}] {c.raw}"
        recs.append(_mk_record(raw, "ParsCit", "ParsCit", c.fields))
    markup.append("</Citations>")
    return "\n".join(markup), recs


# ----------------------------------------------------------- doc builder

def build_doc(doc_key: str) -> tuple[list[dict], list[dict]]:
    """→ (input_rows, golden_rows).

    input row:  {doc_id, spans: [{kind, text, media_ref, offset}]}
    golden row: {doc_id, span_idx, kind, text, media_ref, detector, namer,
                 x1..y2, column, src_offset, <fields>}
    """
    cls = doc_class(doc_key)
    seed = doc_seed(doc_key)
    rng = _rng(seed)

    if cls == "versioned":
        rows_all, golden_all = [], []
        for ver in (1, 2):
            vid = f"{doc_key}~{ver}"
            vrng = _rng(seed, ver)
            cits = [gen_citation(vrng) for _ in range(int(vrng.integers(2, 5)))]
            text = _txt_doc_span(vrng, cits, "numbered")
            rows_all.append(_row(vid, [("text", text, "")]))
            if ver == 2:
                units = [[_mk_record(f.raw, "ParsCit", "ParsCit", f.fields)
                          for f in cits]]
                golden_all = _golden(vid, units, [("text", "")])
        return rows_all, golden_all

    nr = int(rng.integers(2, 6))
    cits = [gen_citation(rng) for _ in range(nr)]

    if cls in ("txt_plain", "txt_blank", "txt_hanging"):
        style = {"txt_plain": "numbered", "txt_blank": "blank",
                 "txt_hanging": "hanging"}[cls]
        text = _txt_doc_span(rng, cits, style)
        recs = [_mk_record(c.raw, "ParsCit", "ParsCit", c.fields) for c in cits]
        return [_row(doc_key, [("text", text, "")])], \
            _golden(doc_key, [recs], [("text", "")])

    if cls == "txt_multispan":
        body = "\n".join(_body_lines(rng))
        text = _txt_doc_span(rng, cits, "numbered")
        recs = [_mk_record(c.raw, "ParsCit", "ParsCit", c.fields) for c in cits]
        return [_row(doc_key, [("text", body, ""), ("text", text, "")])], \
            _golden(doc_key, [[], recs], [("text", ""), ("text", "")])

    if cls.startswith("html_") or cls == "xml_citation":
        builder = {"html_cite": _html_cite_doc, "html_dl": _html_dl_doc,
                   "html_pll": _html_pll_doc, "html_cc": _html_cc_doc,
                   "html_td": _html_td_doc, "xml_citation": _xml_doc}[cls]
        markup, recs = builder(rng, cits)
        return [_row(doc_key, [("text", markup, "")])], \
            _golden(doc_key, [recs], [("text", "")])

    if cls == "empty":
        if seed % 2 == 0:
            body = "\n".join(_body_lines(rng))
            return [_row(doc_key, [("text", body, "")])], []
        return [_row(doc_key, [])], []

    if cls in ("scan_single", "scan_multicol", "scan_3col", "scan_hyphen",
               "scan_backfail", "scan_neardup", "scan_nohead", "scan_noise"):
        ref = media_ref_for(cls, seed, 0, nr)
        plan = page_plan(seed, 0, cls, nr)
        recs = [_mk_record(r["raw"], r["detector"], r["namer"], r["fields"],
                           r["box"], r["column"]) for r in plan.records]
        body = "\n".join(_body_lines(rng))
        return [_row(doc_key, [("text", body, ""), ("media", "", ref)])], \
            _golden(doc_key, [[], recs], [("text", ""), ("media", ref)])

    if cls == "scan_multipage":
        n_pages = int(rng.integers(2, 5))
        spans, units, unit_meta = [], [], []
        for p in range(n_pages):
            body = "\n".join(_body_lines(rng, 2))
            spans.append(("text", body, ""))
            units.append([])
            unit_meta.append(("text", ""))
            ref = media_ref_for("scan_single", seed, p, 0)
            plan = page_plan(seed, p, "scan_single")
            spans.append(("media", "", ref))
            units.append([_mk_record(r["raw"], r["detector"], r["namer"],
                                     r["fields"], r["box"], r["column"])
                          for r in plan.records])
            unit_meta.append(("media", ref))
        return [_row(doc_key, spans)], _golden(doc_key, units, unit_meta)

    if cls == "scan_heavy":
        n_pages = 16
        spans, units, unit_meta = [], [], []
        for p in range(n_pages):
            ref = media_ref_for("scan_heavy", seed, p, 3)
            plan = page_plan(seed, p, "scan_heavy", 3)
            spans.append(("media", "", ref))
            units.append([_mk_record(r["raw"], r["detector"], r["namer"],
                                     r["fields"], r["box"], r["column"])
                          for r in plan.records])
            unit_meta.append(("media", ref))
        return [_row(doc_key, spans)], _golden(doc_key, units, unit_meta)

    raise ValueError(f"unknown doc class {cls!r}")


def _row(doc_id: str, spans: list[tuple[str, str, str]]) -> dict:
    return dict(doc_id=doc_id,
                spans=[dict(kind=k, text=t, media_ref=m, offset=i)
                       for i, (k, t, m) in enumerate(spans)])


def _golden(doc_id: str, units: list[list[dict]],
            unit_meta: list[tuple[str, str]]) -> list[dict]:
    rows: list[dict] = []
    idx = 0
    for off, (recs, (kind, media_ref)) in enumerate(zip(units, unit_meta)):
        for r in recs:
            row = dict(doc_id=doc_id, span_idx=idx, kind="text",
                       media_ref=media_ref, src_offset=off, **r)
            rows.append(row)
            idx += 1
    return rows
