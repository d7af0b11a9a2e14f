"""Field tokenizer (M12 field set, LOCDB-V3/imgProcessing.py:801-968)
against the generator's analytic ground truth and hand cases."""

import numpy as np

from automatic_reference_extractor_ray.functions.fields import (
    parse_fields, strip_marker)
from automatic_reference_extractor_ray.sources.citegen import gen_citation


def test_generator_roundtrip_many_seeds():
    for seed in range(300):
        rng = np.random.Generator(np.random.PCG64(seed))
        cit = gen_citation(rng)
        got = parse_fields(cit.raw)
        assert got == cit.fields, (cit.raw, got, cit.fields)


def test_marker_stripped_before_parse():
    rng = np.random.Generator(np.random.PCG64(5))
    cit = gen_citation(rng)
    assert parse_fields(f"[3] {cit.raw}") == cit.fields
    assert parse_fields(f"12. {cit.raw}") == cit.fields


def test_strip_marker_variants():
    assert strip_marker("[12] x") == "x"
    assert strip_marker("3. x") == "x"
    assert strip_marker("3) x") == "x"
    assert strip_marker("no marker") == "no marker"


def test_t1_hand_case():
    f = parse_fields("Miller, A. and Kim, B. (1999). Sparse graph inference. "
                     "Journal of Document Analysis, 12(3), 45-67.")
    assert f["authors"] == ["Miller, A.", "Kim, B."]
    assert f["title"] == "Sparse graph inference"
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999"
    assert f["volume"] == "12"
    assert f["issue"] == "3"
    assert f["pages"] == "45-67"     # from-to join, imgProcessing.py:948-956


def test_t2_hand_case():
    f = parse_fields("Okafor, S. (2013). Neural retrieval methods. Springer, Berlin.")
    assert f["publisher"] == "Springer"
    assert f["location"] == "Berlin"
    assert f["journal"] == ""


def test_fallback_keeps_year():
    f = parse_fields("Some unparseable thing from 2004. With stuff.")
    assert f["date"] == "2004"
