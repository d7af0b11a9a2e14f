"""DSIR-style importance resampling (ops/dsir.py) — pinned against an
independently-written pure-Python reference (no shared code with the
operator beyond the hash spec: pandas siphash of the gram string,
bigrams joined with \\x1e)."""

import math
import re

import numpy as np
import pandas as pd


def _docs(rows):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame(rows)).repartition(4)


RAW = [
    {"doc_id": 1, "text": "stock market prices rise on earnings"},
    {"doc_id": 2, "text": "protein folding and gene expression"},
    {"doc_id": 3, "text": "market earnings beat stock forecasts"},
    {"doc_id": 4, "text": "the cell nucleus and gene regulation"},
    {"doc_id": 5, "text": "football match ends in a draw"},
    {"doc_id": 6, "text": ""},
    {"doc_id": 7, "text": None},
]
TARGET = [
    {"doc_id": 100, "text": "gene expression in the cell"},
    {"doc_id": 101, "text": "protein structure and gene function"},
]


def _ref_weights(raw_rows, target_rows, n_buckets):
    """Independent reference: dict-based counting, per-doc float sum."""
    tok = lambda s: re.findall(r"[a-z0-9]+", (s or "").lower())

    def grams(text):
        ts = tok(text)
        out = list(ts)
        out += [a + "\x1e" + b for a, b in zip(ts, ts[1:])]
        return out

    def bucket(g):
        # int() BEFORE the modulo: numpy uint64 % python int goes
        # through float64 and mangles values above 2^52
        return int(pd.util.hash_array(np.array([g], dtype=object))[0]) \
            % n_buckets

    def counts(rows):
        c = {}
        tot = 0
        for r in rows:
            for g in grams(r["text"]):
                c[bucket(g)] = c.get(bucket(g), 0) + 1
                tot += 1
        return c, tot

    tc, tn = counts(target_rows)
    rc, rn = counts(raw_rows)
    weights = {}
    for r in raw_rows:
        w = 0.0
        for g in grams(r["text"]):
            h = bucket(g)
            lp = math.log(tc.get(h, 0) + 1.0) - math.log(tn + n_buckets)
            lq = math.log(rc.get(h, 0) + 1.0) - math.log(rn + n_buckets)
            w += lp - lq
        weights[r["doc_id"]] = int(math.floor(w * 1e6 + 0.5))
    return weights


def test_dsir_weights_match_reference(ray_session):
    from automatic_reference_extractor_ray.ops.dsir import (
        dsir_log_ratio, dsir_weights)
    nb = 512
    lr = dsir_log_ratio(_docs(RAW), _docs(TARGET), n_buckets=nb)
    out = dsir_weights(_docs(RAW), lr).to_pandas()
    got = out.set_index("doc_id")["logw_micro"].to_dict()
    want = _ref_weights(RAW, TARGET, nb)
    assert got == want
    # gram counts: unigrams + bigrams, 0 for empty/None texts
    ng = out.set_index("doc_id")["n_grams"].to_dict()
    assert ng[1] == 6 + 5 and ng[6] == 0 and ng[7] == 0


def test_dsir_select_prefers_target_domain(ray_session):
    from automatic_reference_extractor_ray.ops.dsir import dsir_select
    top = dsir_select(_docs(RAW), _docs(TARGET), k=2, n_buckets=512)
    # the two biology docs outrank finance/sports
    assert set(top["doc_id"]) == {2, 4}
    assert top["rank"].tolist() == [1, 2]
    # ranked by weight desc (2 shares more target grams than 4)
    assert top["logw_micro"].is_monotonic_decreasing


def test_dsir_select_deterministic_and_block_invariant(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.dsir import dsir_select
    a = dsir_select(_docs(RAW), _docs(TARGET), k=5, n_buckets=256)
    b = dsir_select(rd.from_pandas(pd.DataFrame(RAW)).repartition(1),
                    rd.from_pandas(pd.DataFrame(TARGET)).repartition(2),
                    k=5, n_buckets=256)
    pd.testing.assert_frame_equal(a, b)
    # gram-less docs (empty/None) carry no evidence and are excluded
    # from selection even with room to spare
    full = dsir_select(_docs(RAW), _docs(TARGET), k=10, n_buckets=256)
    assert len(full) == len(RAW) - 2
    assert {6, 7}.isdisjoint(set(full["doc_id"]))
