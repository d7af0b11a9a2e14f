"""Bounding-box kernels, vectorized with numpy.

Boxes are ``[x1, y1, x2, y2]`` int arrays in hOCR/page coordinates.
"""

from __future__ import annotations

import numpy as np


def iou(pbox: np.ndarray, obox: np.ndarray) -> float:
    """Single-pair IoU with the reference's exact arithmetic
    (LOCDB-V3/imgProcessing.py:606-619 ``bb_intersection``): the
    intersection area has *no* +1, both box areas have +1 on each side.
    """
    xa = max(pbox[0], obox[0]); ya = max(pbox[1], obox[1])
    xb = min(pbox[2], obox[2]); yb = min(pbox[3], obox[3])
    inter = max(0, xb - xa) * max(0, yb - ya)
    pa = (pbox[2] - pbox[0] + 1) * (pbox[3] - pbox[1] + 1)
    oa = (obox[2] - obox[0] + 1) * (obox[3] - obox[1] + 1)
    return float(inter) / float(pa + oa - inter)


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU between box arrays ``a (n,4)`` and ``b (m,4)`` →
    ``(n, m)`` float64.  Same +1/no-+1 convention as :func:`iou`."""
    a = np.asarray(a, dtype=np.int64).reshape(-1, 4)
    b = np.asarray(b, dtype=np.int64).reshape(-1, 4)
    xa = np.maximum(a[:, None, 0], b[None, :, 0])
    ya = np.maximum(a[:, None, 1], b[None, :, 1])
    xb = np.minimum(a[:, None, 2], b[None, :, 2])
    yb = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(xb - xa, 0, None) * np.clip(yb - ya, 0, None)
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def union_box(boxes: np.ndarray) -> np.ndarray:
    """Min/max fold of a non-empty ``(k, 4)`` box array →
    ``[min x1, min y1, max x2, max y2]``
    (LOCDB-V3/imgProcessing.py:361-378, :725-746)."""
    boxes = np.asarray(boxes, dtype=np.int64).reshape(-1, 4)
    return np.array([boxes[:, 0].min(), boxes[:, 1].min(),
                     boxes[:, 2].max(), boxes[:, 3].max()], dtype=np.int64)


def reading_order(boxes: np.ndarray, columns: np.ndarray | None = None) -> np.ndarray:
    """Stable reading-order permutation: by (column, y1, x1).

    The reference sorts each column crop's records by y1 alone with an
    exchange sort (``sortResults``, LOCDB-V3/imgProcessing.py:1085-1112)
    and concatenates crops left-to-right (column-major), so the
    observable order is (column, y1).  We pin the tie-break to (x1,
    original index) — stable and deterministic, where the reference's
    tie order was implementation-defined.
    """
    boxes = np.asarray(boxes, dtype=np.int64).reshape(-1, 4)
    n = boxes.shape[0]
    if columns is None:
        columns = np.zeros(n, dtype=np.int64)
    # np.lexsort: last key is primary.
    return np.lexsort((np.arange(n), boxes[:, 0], boxes[:, 1], np.asarray(columns)))
