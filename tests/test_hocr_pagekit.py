"""hOCR round-trip (M3) + the per-page kernel (J1–J4/M14/M15/O1/O2)
against the generator's differential golden, plus direct edge cases."""

import numpy as np
import pytest

from automatic_reference_extractor_ray.config import DEFAULT_CONFIG
from automatic_reference_extractor_ray.functions.hocr import (
    PageObservation, build_hocr, parse_hocr)
from automatic_reference_extractor_ray.functions.pagekit import process_page
from automatic_reference_extractor_ray.sources.pagegen import (
    SCAN_CLASSES, page_plan)


def test_hocr_roundtrip_basic():
    lines = [("Alpha beta", (10, 20, 110, 60)), ("Gamma", (10, 70, 80, 110))]
    dets = [((5, 15, 120, 65), 0.93)]
    cols = [((0, 0, 1000, 2000), 0.95)]
    obs = parse_hocr(build_hocr(lines, dets, cols))
    assert obs.lines == ["Alpha beta", "Gamma"]
    assert obs.line_boxes.tolist() == [[10, 20, 110, 60], [10, 70, 80, 110]]
    assert obs.det_boxes.tolist() == [[5, 15, 120, 65]]
    assert abs(obs.det_conf[0] - 0.93) < 1e-9
    assert obs.col_boxes.tolist() == [[0, 0, 1000, 2000]]


def test_hocr_preserves_double_space():
    # empty ocrx_word → double space, as the reference's join produces
    # (imgProcessing.py:471-475)
    obs = parse_hocr(build_hocr([("a  b", (0, 0, 50, 40))]))
    assert obs.lines == ["a  b"]


def test_hocr_drops_empty_lines():
    obs = parse_hocr(build_hocr([("", (0, 0, 10, 40)), ("x y", (0, 50, 10, 90))]))
    assert obs.lines == ["x y"]


@pytest.mark.parametrize("cls", SCAN_CLASSES)
def test_page_kernel_matches_golden(cls):
    for seed in range(0, 1200, 37):
        plan = page_plan(seed, 0, cls, 3 if cls == "scan_heavy" else None)
        obs = parse_hocr(build_hocr(plan.lines, plan.dets, plan.cols))
        recs = process_page(obs, DEFAULT_CONFIG)
        got = [(r["raw"], tuple(r["box"]), r["column"], r["detector"], r["namer"])
               for r in recs]
        exp = [(r["raw"], tuple(r["box"]), r["column"], r["detector"], r["namer"])
               for r in plan.records]
        assert got == exp, (cls, seed)


def test_zero_coordinate_scrub_direct():
    """M14: a segmented ref whose raw is not a substring of the
    concatenated text (double space) is dropped."""
    lines = ["References", "1. Alpha  beta gamma delta.", "2. Epsilon zeta eta theta."]
    boxes = np.array([[60, 200, 300, 240], [60, 250, 800, 290], [60, 300, 800, 340]])
    obs = PageObservation(lines=lines, line_boxes=boxes)
    recs = process_page(obs, DEFAULT_CONFIG)
    assert [r["raw"] for r in recs] == ["Epsilon zeta eta theta."]


def test_confidence_filters():
    """M6: det conf < 0.75 ignored; col conf < 0.91 ignored."""
    plan = page_plan(11, 0, "scan_single")
    low = [(b, 0.5) for b, _ in plan.dets]
    obs = parse_hocr(build_hocr(plan.lines, low, plan.cols))
    assert process_page(obs, DEFAULT_CONFIG) == [
        r for r in process_page(obs, DEFAULT_CONFIG)]
    # all candidates gone → every primary is ParsCit/ParsCit, no twins
    recs = process_page(obs, DEFAULT_CONFIG)
    assert recs and all(r["detector"] == "ParsCit" for r in recs)


def test_multicol_column_major_order():
    plan = page_plan(13, 0, "scan_multicol")
    obs = parse_hocr(build_hocr(plan.lines, plan.dets, plan.cols))
    cols = [r["column"] for r in process_page(obs, DEFAULT_CONFIG)]
    assert cols == sorted(cols)          # col 0 records before col 1
    assert set(cols) == {0, 1}


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 10**9), st.sampled_from(SCAN_CLASSES))
def test_page_kernel_matches_golden_random_seeds(seed, cls):
    # the parametrized sweep above strides low seeds; this drives the
    # same invariant across the whole seed space (the round-4 CSE
    # year-as-marker segmenter bug needed a template x line-break
    # coincidence that low-seed strides missed until the 500-doc e2e)
    plan = page_plan(seed, 0, cls, 3 if cls == "scan_heavy" else None)
    obs = parse_hocr(build_hocr(plan.lines, plan.dets, plan.cols))
    recs = process_page(obs, DEFAULT_CONFIG)
    got = [(r["raw"], tuple(r["box"]), r["column"], r["detector"], r["namer"])
           for r in recs]
    exp = [(r["raw"], tuple(r["box"]), r["column"], r["detector"], r["namer"])
           for r in plan.records]
    assert got == exp, (cls, seed)
