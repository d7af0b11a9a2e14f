"""Per-page extraction kernel for media (scanned-page) spans.

Composes, in pure numpy/python over one ``PageObservation``, the whole
image path of the reference (LOCDB-V3/imgProcessing.py):

  A1  column split: col_boxes (conf >= 0.91) sorted left→right; lines and
      detection boxes are partitioned at the column x1 boundaries and
      shifted to column-local x, exactly like the image crops
      (imgProcessing.py:84-132); the final records get the offset added
      back (M15, :176-189).
  O2  per-column reading-order line sort by (y1, x1) (:636-650).
  M4  line concatenation + hyphenation repair + char-index map (:487-527).
  --  primary segmentation: REFERENCES-heading + numbering/indent
      heuristics over the sorted column lines (the ParsCit-CRF analogue,
      SURVEY.md §7).
  J1  detection-box ⋈ OCR-line spatial join: conf >= 0.75 boxes collect
      lines with IoU > 0.03, union them, accept when IoU(union, det) >
      0.5 → candidate (string, box) (:652-747).
  J2  substring back-map of each primary raw string into the
      concatenated text → line range → box union; not found → [0,0,0,0]
      (:291-385).  The reference's "last match wins" line-range loop and
      its inclusive off-by-one index bounds are reproduced.
  J3  ensemble: primary box ∈ candidate boxes → detector='Image' and a
      twin Grobid-named record is appended right after (:386-412).
  J4  fuzzy anti-join: candidates whose space-stripped Levenshtein
      distance to any *primary* rawString is < 10 are suppressed; the
      rest are appended as Image/Grobid records.  The comparison set is
      a snapshot taken before appending (so J4 records are not compared
      with each other), as in the reference (:414-448).
  M14 zero-coordinate scrub (:565-586).
  O1  per-column record sort by y1 (stable, tie (x1, seq)); columns
      concatenated left→right (:1085-1112 + per-crop concat :139-206).

Returns a list of record dicts: raw, box (page coords), column,
detector, namer, seq (emission order pre-sort).
"""

from __future__ import annotations

import numpy as np

from ..config import ExtractConfig
from .boxes import iou, iou_matrix, union_box
from .hocr import PageObservation
from .segment import reference_region_lines, segment_region
from .textkit import collapse_ws, concat_lines_with_index, join_lines_repaired


def _column_boundaries(obs: PageObservation, cfg: ExtractConfig) -> list[int]:
    """x1 boundaries of the column crops: [0, col2.x1, col3.x1, ...]
    (imgProcessing.py:115-160: crop k spans [cols[k].x1, cols[k+1].x1))."""
    keep = obs.col_conf >= cfg.column_confidence_threshold
    cols = obs.col_boxes[keep]
    if cols.shape[0] <= 1:
        return [0]
    order = np.argsort(cols[:, 0], kind="stable")
    cols = cols[order]
    return [0] + [int(x) for x in cols[1:, 0]]


def _assign_columns(x1s: np.ndarray, boundaries: list[int]) -> np.ndarray:
    """Column index per box by its x1 against the crop boundaries."""
    bounds = np.asarray(boundaries, dtype=np.int64)
    return np.maximum(np.searchsorted(bounds, x1s, side="right") - 1, 0)


def process_page(obs: PageObservation, cfg: ExtractConfig) -> list[dict]:
    boundaries = _column_boundaries(obs, cfg)
    n_lines = obs.line_boxes.shape[0]
    line_cols = (_assign_columns(obs.line_boxes[:, 0], boundaries)
                 if n_lines else np.zeros(0, np.int64))
    det_keep = obs.det_conf >= cfg.ref_confidence_threshold
    det_boxes = obs.det_boxes[det_keep]
    det_cols = (_assign_columns(det_boxes[:, 0], boundaries)
                if det_boxes.shape[0] else np.zeros(0, np.int64))

    records: list[dict] = []
    for col, x_off in enumerate(boundaries):
        lmask = line_cols == col
        lines_local = [obs.lines[i] for i in np.flatnonzero(lmask)]
        boxes_local = obs.line_boxes[lmask].copy()
        boxes_local[:, 0] -= x_off
        boxes_local[:, 2] -= x_off
        dmask = det_cols == col
        dets_local = det_boxes[dmask].copy()
        if dets_local.shape[0]:
            dets_local[:, 0] -= x_off
            dets_local[:, 2] -= x_off
        col_records = _process_column(lines_local, boxes_local, dets_local, cfg)
        for r in col_records:                      # M15 offset restore
            r["box"] = (r["box"][0] + x_off, r["box"][1],
                        r["box"][2] + x_off, r["box"][3])
            r["column"] = col
        records.extend(col_records)
    return records


def _process_column(lines: list[str], boxes: np.ndarray, dets: np.ndarray,
                    cfg: ExtractConfig) -> list[dict]:
    if not lines:
        out = []
        # detection boxes over an empty column produce nothing (no lines
        # to merge: J1's empty-group `continue`, imgProcessing.py:735).
        return out
    # O2 reading-order sort
    order = np.lexsort((boxes[:, 0], boxes[:, 1]))
    lines = [lines[i] for i in order]
    boxes = boxes[order]

    # M4 concat + index map
    full_text, ranges = concat_lines_with_index(lines)

    # primary segmentation (heading + markers/indent)
    region = reference_region_lines(lines)
    segments = segment_region(region, lines, cfg.min_ref_len)

    # J1 candidates
    candidates: list[tuple[str, np.ndarray]] = []
    if dets.shape[0] and boxes.shape[0]:
        m = iou_matrix(dets, boxes)
        for d in range(dets.shape[0]):
            hit = np.flatnonzero(m[d] > cfg.line_merge_iou)
            if hit.size == 0:
                continue
            ub = union_box(boxes[hit])
            if iou(dets[d], ub) > cfg.group_accept_iou:
                cand = collapse_ws(join_lines_repaired([lines[i] for i in hit]))
                candidates.append((cand, ub))

    # J2 back-map + J3 ensemble
    cand_boxes = [tuple(int(v) for v in b) for _, b in candidates]
    records: list[dict] = []
    seq = 0
    for _, raw in segments:
        box = _backmap(raw, full_text, ranges, boxes)
        boxt = tuple(int(v) for v in box)
        if boxt in cand_boxes:
            records.append(dict(raw=raw, box=boxt, detector="Image",
                                namer="ParsCit", seq=seq)); seq += 1
            records.append(dict(raw=raw, box=boxt, detector="Image",
                                namer="Grobid", seq=seq)); seq += 1
        else:
            records.append(dict(raw=raw, box=boxt, detector="ParsCit",
                                namer="ParsCit", seq=seq)); seq += 1

    # J4 fuzzy anti-join (snapshot of primary rawStrings)
    from .editdist import near_any, snapshot_counts
    snapshot = snapshot_counts(
        [r["raw"].strip().replace(" ", "") for r in records])
    for cand, ub in candidates:
        stripped = cand.strip().replace(" ", "")
        if near_any(stripped, snapshot, cfg.near_dup_max_distance):
            continue
        records.append(dict(raw=cand, box=tuple(int(v) for v in ub),
                            detector="Image", namer="Grobid", seq=seq))
        seq += 1

    # M14 scrub
    records = [r for r in records if r["box"] != (0, 0, 0, 0)]

    # O1 stable sort by (y1, x1, seq)
    records.sort(key=lambda r: (r["box"][1], r["box"][0], r["seq"]))
    return records


def _backmap(raw: str, full_text: str, ranges: list[tuple[int, int]],
             boxes: np.ndarray) -> np.ndarray:
    """J2: find ``raw`` in the concatenated text, map its char range to a
    line range with the reference's inclusive last-match-wins loop
    (imgProcessing.py:318-346), union those line boxes; not found →
    zeros (→ M14 scrub)."""
    start = full_text.find(raw)
    if start < 0:
        return np.zeros(4, np.int64)
    end = start + len(raw)
    li_start = li_end = None
    for i, (s, e) in enumerate(ranges):
        if s <= start <= e:
            li_start = i
        if s <= end <= e:
            li_end = i
    if li_start is None:
        return np.zeros(4, np.int64)
    if li_end is None or li_end < li_start:
        li_end = len(ranges) - 1 if li_end is None else li_start
    return union_box(boxes[li_start:li_end + 1])
