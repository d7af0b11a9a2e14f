"""Deterministic synthetic scanned-page generation.

A media span's ``media_ref`` is ``synth://cls/<seed-hex>/<page>/<nrefs>``;
everything about the page — OCR lines with boxes, detection boxes,
column boxes — is a pure function of ``(cls, seed, page, nrefs)``, so
the media store (``media_store.SynthMediaStore``) can materialize the
payload anywhere in the cluster without a lookup table or shuffle,
exactly like resolving an object-store URI.

``page_plan`` also computes the page's *expected* extraction records via
an independent differential implementation of the spec in
functions/pagekit.py: the generator knows the layout analytically (which
lines belong to which reference, which detection box covers what) and
applies the documented decision rules (J1 thresholds, J3 box equality,
J4 Levenshtein anti-join, M14 scrub, O1 ordering) using only the
unit-test-pinned pure kernels.  It never calls ``process_page``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..functions.boxes import iou, union_box
from ..functions.editdist import near_any, snapshot_counts
from ..functions.fields import parse_fields
from ..functions.textkit import collapse_ws, join_lines_repaired
from .citegen import Citation, gen_body_sentence, gen_citation

PAGE_W, PAGE_H = 2480, 3500
LINE_H, LINE_STEP, CHAR_W = 40, 50, 14

REF_CONF, COL_CONF, IOU_LINE, IOU_GROUP, NEAR_DUP = 0.75, 0.91, 0.03, 0.5, 10

SCAN_CLASSES = ["scan_single", "scan_multicol", "scan_3col", "scan_hyphen",
                "scan_backfail", "scan_neardup", "scan_nohead", "scan_noise",
                "scan_heavy"]


@dataclass
class PagePlan:
    lines: list = field(default_factory=list)       # (text, (x1,y1,x2,y2))
    dets: list = field(default_factory=list)        # ((x1,y1,x2,y2), conf)
    cols: list = field(default_factory=list)        # ((x1,y1,x2,y2), conf)
    records: list = field(default_factory=list)     # golden dicts


class _Col:
    """One column under construction: lines are appended top-down, so
    layout order == reading order."""

    def __init__(self, col_idx: int, ncols: int):
        self.cw = PAGE_W // ncols
        self.x0 = col_idx * self.cw
        self.idx = col_idx
        self.y = 200
        self.lines: list[tuple[str, tuple[int, int, int, int]]] = []
        self.dets: list[tuple[tuple[int, int, int, int], float]] = []
        # primaries expected to segment+back-map: (raw, line_ids, fields)
        self.primaries: list[tuple[str, list[int], dict]] = []
        # ALL raws the segmenter will produce pre-scrub (J4 snapshot)
        self.segmented_raws: list[str] = []
        self.has_heading = False

    def add(self, text: str) -> int:
        x1 = self.x0 + 60
        x2 = min(x1 + CHAR_W * len(text), self.x0 + self.cw - 40)
        box = (x1, self.y, max(x2, x1 + CHAR_W), self.y + LINE_H)
        self.lines.append((text, box))
        self.y += LINE_STEP
        return len(self.lines) - 1

    def boxes(self, ids: list[int]) -> list[tuple[int, int, int, int]]:
        return [self.lines[i][1] for i in ids]


def _union(boxes) -> tuple[int, int, int, int]:
    u = union_box(np.asarray(boxes, np.int64))
    return (int(u[0]), int(u[1]), int(u[2]), int(u[3]))


def _inflate(b, dx=8, dy=4):
    return (b[0] - dx, b[1] - dy, b[2] + dx, b[3] + dy)


def _split_ref(raw: str, nlines: int, hyphen_word: bool = False,
               digit_hyphen: bool = False) -> list[str]:
    """Split a citation into page lines.  Space splits reconstruct via
    the join-space rule; ``hyphen_word`` breaks inside an alphabetic
    word with a trailing ``-``; ``digit_hyphen`` breaks right after a
    ``<digit>-`` (the repair rule keeps that hyphen)."""
    if digit_hyphen:
        k = raw.find("-")
        while k > 0 and not raw[k - 1].isdigit():
            k = raw.find("-", k + 1)
        if k > 0:
            return [raw[:k + 1], raw[k + 1:]]
    if hyphen_word:
        words = raw.split(" ")
        for wi, w in enumerate(words):
            if wi > 0 and len(w) >= 6 and w[:3].isalpha():
                head = " ".join(words[:wi]) + " " + w[:3] + "-"
                tail = w[3:] + (" " + " ".join(words[wi + 1:]) if wi + 1 < len(words) else "")
                return [head, tail]
    words = raw.split(" ")
    nlines = max(1, min(nlines, len(words)))
    per = (len(words) + nlines - 1) // nlines
    return [" ".join(words[i:i + per]) for i in range(0, len(words), per)]


def _perturb(raw: str, k: int, rng: np.random.Generator) -> str:
    """Substitute ``k`` non-space chars with rare symbols at spread
    positions → space-stripped Levenshtein distance exactly k."""
    chars = list(raw)
    positions = [i for i, c in enumerate(chars) if c != " "]
    step = max(1, len(positions) // (k + 1))
    subs = "@#%=+~^*!?"
    n = 0
    for j in range(step, len(positions), step):
        if n >= k:
            break
        chars[positions[j]] = subs[n % len(subs)]
        n += 1
    return "".join(chars)


def _add_ref(col: _Col, rng, idx: int, cit: Citation, mode: dict) -> None:
    nlines = int(rng.integers(1, 4))
    chunks = _split_ref(cit.raw, nlines, mode.get("hyphen_word", False),
                        mode.get("digit_hyphen", False))
    chunks[0] = f"{idx}. " + chunks[0]
    if mode.get("double_space"):
        t = chunks[0]
        sp = t.find(" ", len(str(idx)) + 3)
        if sp > 0:
            chunks[0] = t[:sp] + "  " + t[sp + 1:]
    ids = [col.add(c) for c in chunks]
    col.dets.append((_inflate(_union(col.boxes(ids))),
                     0.85 + 0.14 * float(rng.random())))
    col.segmented_raws.append(cit.raw)   # collapse_ws of joined lines == raw
    if not mode.get("double_space"):
        col.primaries.append((cit.raw, ids, cit.fields))
    # a double-space ref still segments (raw == cit.raw after collapse)
    # but its back-map misses the double-spaced text → zero coords → scrub


def _emit_refs(col: _Col, rng, cits: list[Citation], *, heading: bool = True,
               split_modes: list[dict] | None = None, marker_start: int = 1) -> None:
    for _ in range(int(rng.integers(2, 5))):
        col.add(gen_body_sentence(rng))
    if heading:
        col.add("References")
        col.has_heading = True
    for i, cit in enumerate(cits):
        mode = (split_modes[i] if split_modes else {})
        _add_ref(col, rng, marker_start + i, cit, mode)


def _column_golden(col: _Col) -> list[dict]:
    """Differential implementation of the per-column decision rules
    (see functions/pagekit.py docstring) over the known layout."""
    texts = [t for t, _ in col.lines]
    boxes = np.asarray([b for _, b in col.lines], np.int64).reshape(-1, 4)

    # J1 candidates with the real thresholds
    candidates: list[tuple[str, tuple[int, int, int, int]]] = []
    for det, conf in col.dets:
        if conf < REF_CONF:
            continue
        det_a = np.asarray(det, np.int64)
        hits = [i for i in range(len(texts)) if iou(det_a, boxes[i]) > IOU_LINE]
        if not hits:
            continue
        ub = _union(boxes[hits])
        if iou(det_a, np.asarray(ub, np.int64)) > IOU_GROUP:
            candidates.append((collapse_ws(join_lines_repaired([texts[i] for i in hits])), ub))

    recs: list[dict] = []
    seq = 0
    cand_boxes = [b for _, b in candidates]
    if col.has_heading:
        for raw, ids, fields in col.primaries:
            box = _union(boxes[ids])
            if box in cand_boxes:
                for namer in ("ParsCit", "Grobid"):
                    recs.append(dict(raw=raw, box=box, column=col.idx,
                                     detector="Image", namer=namer, seq=seq,
                                     fields=fields))
                    seq += 1
            else:
                recs.append(dict(raw=raw, box=box, column=col.idx,
                                 detector="ParsCit", namer="ParsCit", seq=seq,
                                 fields=fields))
                seq += 1
        snapshot = snapshot_counts(
            [r.replace(" ", "") for r in col.segmented_raws])
    else:
        snapshot = []
    for cand_raw, ub in candidates:
        stripped = cand_raw.replace(" ", "")
        if near_any(stripped, snapshot, NEAR_DUP):
            continue
        recs.append(dict(raw=cand_raw, box=ub, column=col.idx,
                         detector="Image", namer="Grobid", seq=seq,
                         fields=parse_fields(cand_raw)))
        seq += 1
    recs.sort(key=lambda r: (r["box"][1], r["box"][0], r["seq"]))
    return recs


def _finalize(plan: PagePlan, cols: list[_Col],
              with_records: bool = True) -> PagePlan:
    for c in cols:
        plan.lines.extend(c.lines)
        plan.dets.extend(c.dets)
        if with_records:
            plan.records.extend(_column_golden(c))
    if len(cols) > 1:
        for c in cols:
            plan.cols.append(((c.x0 + 10, 100, c.x0 + c.cw - 20, PAGE_H - 100), 0.95))
    return plan


def page_plan(seed: int, page: int, cls: str | None = None,
              n_refs: int | None = None,
              with_records: bool = True) -> PagePlan:
    """The deterministic page: layout + detector output + golden records.

    ``with_records=False`` skips the analytic golden-record derivation
    (the most expensive part — it runs the near-dup snapshot math):
    the synthetic media STORE only needs lines/dets/cols to render the
    hOCR payload, and paying golden-generation cost inside every OCR
    actor fetch was ~35% of benchmark extraction time."""
    if cls is None:
        cls = SCAN_CLASSES[seed % len(SCAN_CLASSES)]
    rng = np.random.Generator(np.random.PCG64([seed & 0xFFFFFFFF, page, 0xA11CE]))
    plan = PagePlan()
    nr = n_refs if n_refs is not None else int(rng.integers(2, 6))
    cits = [gen_citation(rng) for _ in range(nr)]

    if cls in ("scan_single", "scan_heavy"):
        col = _Col(0, 1)
        _emit_refs(col, rng, cits)
        # low-confidence detector noise over body → filtered by M6 (0.75)
        col.dets.append((_inflate(col.lines[0][1]), 0.40))
        return _finalize(plan, [col], with_records)

    if cls in ("scan_multicol", "scan_3col"):
        ncols = 2 if cls == "scan_multicol" else 3
        nr = max(4, nr)                 # >=2 numbered refs per column
        cits = cits + [gen_citation(rng) for _ in range(nr - len(cits))]
        m = nr // 2
        cols = [_Col(i, ncols) for i in range(ncols)]
        _emit_refs(cols[0], rng, cits[:m])
        _emit_refs(cols[1], rng, cits[m:], marker_start=m + 1)
        for extra in cols[2:]:
            for _ in range(int(rng.integers(2, 5))):
                extra.add(gen_body_sentence(rng))
        _finalize(plan, cols, with_records)
        # spurious low-confidence column box (filtered by 0.91)
        plan.cols.append(((PAGE_W // 2 - 40, 100, PAGE_W // 2 + 40, 500), 0.50))
        return plan

    if cls == "scan_hyphen":
        modes: list[dict] = [{} for _ in cits]
        modes[0] = {"hyphen_word": True}
        if len(cits) > 1:
            modes[1] = {"digit_hyphen": True}
        col = _Col(0, 1)
        _emit_refs(col, rng, cits, split_modes=modes)
        return _finalize(plan, [col], with_records)

    if cls == "scan_backfail":
        modes = [{} for _ in cits]
        modes[0] = {"double_space": True}
        col = _Col(0, 1)
        _emit_refs(col, rng, cits, split_modes=modes)
        return _finalize(plan, [col], with_records)

    if cls == "scan_neardup":
        col = _Col(0, 1)
        # header noise BEFORE body/heading: perturbed copies of ref 0
        for dist in (9, 14):            # <10 suppressed / >=10 kept
            noise = _perturb(cits[0].raw, dist, rng)
            ids = [col.add(c) for c in _split_ref(noise, 2)]
            col.dets.append((_inflate(_union(col.boxes(ids))), 0.92))
        _emit_refs(col, rng, cits)
        return _finalize(plan, [col], with_records)

    if cls == "scan_nohead":
        col = _Col(0, 1)
        _emit_refs(col, rng, cits, heading=False)
        return _finalize(plan, [col], with_records)

    if cls == "scan_noise":
        col = _Col(0, 1)
        b1 = col.add(gen_body_sentence(rng))
        b2 = col.add(gen_body_sentence(rng))
        col.dets.append((_inflate(_union(col.boxes([b1, b2]))), 0.80))
        _emit_refs(col, rng, cits)
        return _finalize(plan, [col], with_records)

    raise ValueError(f"unknown scan class {cls!r}")
