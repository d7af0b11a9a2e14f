"""IoU/union/reading-order kernels vs the reference arithmetic
(LOCDB-V3/imgProcessing.py:606-619, :361-378, :1085-1112)."""

import numpy as np

from automatic_reference_extractor_ray.functions.boxes import (
    iou, iou_matrix, reading_order, union_box)


def test_iou_identical_box():
    b = np.array([0, 0, 9, 9])
    # inter = 9*9 = 81 (no +1), areas = 10*10 = 100 (+1 convention)
    assert abs(iou(b, b) - 81 / 119) < 1e-12


def test_iou_disjoint():
    assert iou(np.array([0, 0, 10, 10]), np.array([20, 20, 30, 30])) == 0.0


def test_iou_matrix_matches_scalar():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 100, size=(5, 4)); a[:, 2:] += 100
    b = rng.integers(0, 100, size=(7, 4)); b[:, 2:] += 100
    m = iou_matrix(a, b)
    for i in range(5):
        for j in range(7):
            assert abs(m[i, j] - iou(a[i], b[j])) < 1e-12


def test_union_box():
    u = union_box(np.array([[5, 7, 10, 12], [1, 9, 8, 20]]))
    assert u.tolist() == [1, 7, 10, 20]


def test_reading_order_column_major():
    boxes = np.array([
        [500, 100, 600, 120],   # col 1, top
        [0, 300, 90, 320],      # col 0, bottom
        [0, 100, 90, 120],      # col 0, top
    ])
    cols = np.array([1, 0, 0])
    assert reading_order(boxes, cols).tolist() == [2, 1, 0]


def test_reading_order_stable_ties():
    boxes = np.array([[0, 10, 5, 20], [0, 10, 5, 20]])
    assert reading_order(boxes).tolist() == [0, 1]
