"""Linear quality classifier: reference-pin + separability tests.

The fit is approximate-by-design (hashed features, iterative
optimizer) so there is no SQL oracle; instead the distributed fit is
pinned against an independent pure-Python featurizer+optimizer run on
the SAME deterministic sample, and the synthetic language task puts a
floor under end-to-end accuracy.
"""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from automatic_reference_extractor_ray.ops.classifier import (
    LogRegModel, _features, _gd_fit, fit_logreg, logreg_score,
    quality_classifier)


def _docs(n=300, seed=7):
    """Two-vocabulary corpus: label-1 docs draw from vocab A,
    label-0 from vocab B, with a shared-word floor."""
    rng = np.random.Generator(np.random.PCG64(seed))
    va = "alpha beta gamma delta epsilon zeta".split()
    vb = "omega sigma lambda kappa theta iota".split()
    shared = "the of and a to in".split()
    rows = []
    for i in range(n):
        lab = int(i % 2 == 0)
        vocab = va if lab else vb
        words = list(rng.choice(vocab, 30)) + list(rng.choice(shared, 10))
        rng.shuffle(words)
        rows.append({"doc_id": i, "text": " ".join(words), "label": lab})
    return pd.DataFrame(rows)


def _reference_fit(df, n_buckets, fit_sample, n_iter, lr, l2, salt):
    """Independent re-derivation: row-at-a-time featurizer (same
    public hash so buckets agree), explicit-loop Adagrad."""
    keyed = sorted(
        (hashlib.md5(f"{salt}|{v}".encode()).hexdigest(), v)
        for v in df["doc_id"].tolist())[:fit_sample]
    ids = [v for _, v in keyed]
    sub = df.set_index("doc_id").loc[ids]
    X = _features(sub["text"].tolist(), n_buckets)
    y = sub["label"].to_numpy(dtype=np.float64)
    n, d = X.shape
    w = [0.0] * d
    gsq = [0.0] * d
    for _ in range(n_iter):
        wv = np.asarray(w)
        p = 1.0 / (1.0 + np.exp(-(X @ wv)))
        g = X.T @ (p - y) / n
        for j in range(d):
            gj = g[j] + (l2 * w[j] if j < d - 1 else 0.0)
            gsq[j] += gj * gj
            w[j] -= lr * gj / (math.sqrt(gsq[j]) + 1e-8)
    return np.asarray(w)


def test_fit_matches_reference(ray_session):
    import ray.data as rd
    df = _docs()
    ds = rd.from_pandas(df).repartition(5)
    m = fit_logreg(ds, "label", n_buckets=256, fit_sample=100,
                   n_iter=50, lr=0.3, l2=1e-6)
    ref = _reference_fit(df, 256, 100, 50, 0.3, 1e-6, "logreg")
    np.testing.assert_allclose(m.w, ref, rtol=1e-9, atol=1e-12)


def test_separable_task_high_accuracy(ray_session):
    import ray.data as rd
    df = _docs(n=400)
    ds = rd.from_pandas(df).repartition(7)
    out = quality_classifier(ds, "label", n_buckets=512,
                             fit_sample=200).to_pandas()
    j = out.merge(df[["doc_id", "label"]], on="doc_id")
    assert len(j) == 400
    acc = float((j["pred"] == j["label"]).mean())
    assert acc >= 0.97, acc
    # scores are micro-quantized ints in [0, 1e6]
    assert j["score_micro"].between(0, 1_000_000).all()


def test_scoring_deterministic_and_order_free(ray_session):
    import ray.data as rd
    df = _docs(n=120)
    m = fit_logreg(rd.from_pandas(df).repartition(3), "label",
                   n_buckets=128, fit_sample=60, n_iter=30)
    a = (logreg_score(rd.from_pandas(df).repartition(2), m)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    b = (logreg_score(rd.from_pandas(shuffled).repartition(9), m)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_empty_and_gramless_rows(ray_session):
    import ray.data as rd
    df = _docs(n=40)
    df.loc[0, "text"] = ""
    df.loc[1, "text"] = "!!! ???"
    ds = rd.from_pandas(df).repartition(2)
    m = fit_logreg(ds, "label", n_buckets=64, fit_sample=40, n_iter=20)
    out = logreg_score(ds, m).to_pandas()
    assert len(out) == 40
    # gram-less rows score sigmoid(bias) — finite and in range
    assert out["score_micro"].between(0, 1_000_000).all()


def test_empty_dataset_raises(ray_session):
    import ray.data as rd
    df = _docs(n=4).iloc[:0]
    ds = rd.from_pandas(df)
    with pytest.raises(ValueError):
        fit_logreg(ds, "label", n_buckets=32, fit_sample=8)


def test_model_artifact_roundtrip(ray_session, tmp_path):
    """save_logreg_model -> load_logreg_model scores identically —
    the re-score-a-later-drop contract of jobs/run_classify.py."""
    import ray.data as rd

    from jobs.run_classify import load_logreg_model, save_logreg_model

    df = _docs(n=80)
    ds = rd.from_pandas(df).repartition(2)
    m = fit_logreg(ds, "label", n_buckets=128, fit_sample=40, n_iter=30)
    path = str(tmp_path / "m.npz")
    save_logreg_model(m, path)
    m2 = load_logreg_model(path)
    assert m2.n_buckets == m.n_buckets
    np.testing.assert_array_equal(m2.w, m.w)
    a = (logreg_score(ds, m).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (logreg_score(ds, m2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_model_roundtrip_shape():
    m = LogRegModel(w=np.zeros(65), n_buckets=64)
    assert m.w.shape == (m.n_buckets + 1,)
    X = _features(["a b c", ""], 64)
    assert X.shape == (2, 65)
    # bias column present, L2 norm of gram block <= 1
    assert (X[:, -1] == 1.0).all()
    w = _gd_fit(X, np.array([1.0, 0.0]), 10, 0.3, 0.0)
    assert np.isfinite(w).all()
