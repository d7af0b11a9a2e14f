"""Trained reference-line classifier: label derivation, bounded-fit
determinism, actor-pool scoring contract, and the held-out accuracy
floor on the sf0.001 corpus."""

import numpy as np
import pandas as pd
import ray.data as rd

from automatic_reference_extractor_ray.ops.lineclf import (
    N_LINE_FEATURES, fit_ref_line_model, line_features,
    ref_line_classifier, score_ref_lines, text_doc_lines)

SF = "/root/testdata/sf0.001"


def _units():
    from automatic_reference_extractor_ray.config import DEFAULT_CONFIG
    from automatic_reference_extractor_ray.sources.interleave import (
        read_interleaved_docs)
    from automatic_reference_extractor_ray.stages.explode import (
        explode_to_units)
    return read_interleaved_docs(SF).map_batches(
        lambda b: explode_to_units(b, DEFAULT_CONFIG),
        batch_format="pyarrow")


def test_line_features_shape_and_empty():
    X = line_features(["[1] Smith, J. (1999). A title. Journal, 3, 45-67.",
                       "plain body words here"])
    assert X.shape == (2, N_LINE_FEATURES + 1)
    assert (X[:, -1] == 1.0).all()                 # bias column
    assert X[0, 5] == 1.0 and X[1, 5] == 0.0       # marker flag
    assert X[0, 6] == 1.0 and X[1, 6] == 0.0       # year flag
    assert line_features([]).shape == (0, N_LINE_FEATURES + 1)


def test_text_doc_lines_labels(ray_session):
    text = "body one\nbody two\n\nReferences\n\n[1] A ref.\n[2] B ref."
    units = rd.from_pandas(pd.DataFrame({
        "doc_id": ["d1", "d2"],
        "kind": ["text", "text"],
        "text": [text, "no heading here\njust body"]}))
    out = (text_doc_lines(units).to_pandas()
           .sort_values("line_no").reset_index(drop=True))
    # headingless d2 skipped; d1's empties dropped
    assert out["doc_id"].unique().tolist() == ["d1"]
    assert out["text"].tolist() == [
        "body one", "body two", "References", "[1] A ref.", "[2] B ref."]
    assert out["label"].tolist() == [0, 0, 0, 1, 1]


def test_fit_deterministic_and_holdout_accuracy(ray_session):
    units = _units()
    lines = text_doc_lines(units).materialize()
    m1 = fit_ref_line_model(lines, fit_sample=2048)
    m2 = fit_ref_line_model(lines, fit_sample=2048)
    assert np.array_equal(m1.w, m2.w)

    out = ref_line_classifier(units, fit_sample=2048).to_pandas()
    assert len(out) > 200
    acc = (out["pred"] == out["label"]).mean()
    assert acc >= 0.93, f"held-out line accuracy {acc:.3f} < 0.93"
    # pred is exactly the micro-score threshold
    assert ((out["score_micro"] >= 500_000).astype("int64")
            == out["pred"]).all()


def test_scorer_pool_matches_driver_eval(ray_session):
    units = _units()
    lines = text_doc_lines(units).materialize()
    model = fit_ref_line_model(lines, fit_sample=1024)
    pool = (score_ref_lines(lines, model).to_pandas()
            .sort_values(["doc_id", "line_no"]).reset_index(drop=True))
    local = lines.to_pandas().sort_values(
        ["doc_id", "line_no"]).reset_index(drop=True)
    X = line_features(local["text"])
    p = 1.0 / (1.0 + np.exp(-(X @ model.w)))
    micro = np.floor(p * 1_000_000.0 + 0.5).astype(np.int64)
    assert np.array_equal(pool["score_micro"].to_numpy(), micro)
