"""Held-out citation-grammar generalization (round-4 VERDICT task 2).

``tests/data/heldout_citations.tsv`` is a hand-curated corpus of 238
real-world-shaped reference strings — classic public-domain works in
APA/MLA/Chicago/Harvard/Vancouver/IEEE/ACS/BibTeX/CrossRef renderings,
mixed-language (German/French/Spanish/transliterated Russian/CJK),
theses, patents, reports, software, newspapers — none of which
``sources/citegen.py`` can emit (different vocabulary, different
year spans, different surface forms).  The 48-shape grammar's
"0 fallbacks" on its own generator says nothing about these; this
file pins the measured OFF-generator behavior so coverage regressions
(and improvements) are visible.

Measured 2026-08-20 (grammar at T67): 0/238 fallback (was 116/208 =
55.8% before T49-T67 — batch 1 took it to 18.8%, batch 2 — CrossRef
period-less tails, patents with office tails, in-press, APA
newspapers/software, Vancouver books and ?-titles, MLA vol/no-less
articles, retrieval-date URL tails, issue ranges, pre-1900 years in
the Chicago/ACS shapes — to zero).  The ceiling below ratchets DOWN
with the grammar; new fixture rows may legitimately raise the rate
until their shapes land.  After reaching zero, 30 HARDER rows were
added (et al. lists, DOI tails on books, edition parentheticals,
multi-editor volumes, no-issue IEEE, six-author Vancouver, versioned
arXiv ids) — all 238 parse.
"""

import os

import pytest

from automatic_reference_extractor_ray.functions.fields import (
    parse_fields_ex)

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "heldout_citations.tsv")


def _load():
    rows = []
    with open(FIXTURE) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            fam, cite = line.split("\t", 1)
            rows.append((fam, cite))
    return rows


def test_heldout_fixture_size_and_families():
    rows = _load()
    assert len(rows) >= 200
    fams = {f for f, _ in rows}
    # style breadth: the fixture must keep covering the major guides
    for fam in ["apa-journal", "apa-book", "mla", "chicago", "harvard",
                "vancouver", "ieee", "acs", "arxiv", "bibtex-plain",
                "german", "french", "thesis", "org-author", "numbered"]:
        assert fam in fams, fam


def test_heldout_fallback_rate_ceiling():
    """The off-generator fallback rate is the grammar-coverage metric;
    this ceiling ratchets DOWN as shapes are added (0.56 before
    T49, 0.19 at T58, 0.00 at T67) and must never silently climb
    back up."""
    rows = _load()
    n_fb = sum(parse_fields_ex(c)[1].startswith("fallback")
               for _, c in rows)
    rate = n_fb / len(rows)
    assert rate <= 0.05, f"held-out fallback rate regressed: {rate:.3f}"


def test_heldout_top_families_parse():
    """The round-4 top-3 failing families (apa-book 9/9, bibtex-plain
    8/8, mla 7/7 fallback) must now parse with at most one miss
    each."""
    rows = _load()
    for fam in ["apa-book", "bibtex-plain", "mla"]:
        sub = [c for f, c in rows if f == fam]
        assert sub, fam
        n_fb = sum(parse_fields_ex(c)[1].startswith("fallback")
                   for c in sub)
        assert n_fb <= 1, f"{fam}: {n_fb}/{len(sub)} fallback"


@pytest.mark.parametrize("cite,authors,title,date,extra", [
    ("Darwin, C. (1859). On the origin of species by means of natural "
     "selection. John Murray.",
     ["Darwin, C."],
     "On the origin of species by means of natural selection",
     "1859", {"publisher": "John Murray"}),
    ("Popper, K. R. (1959). The logic of scientific discovery. "
     "London: Hutchinson.",
     ["Popper, K. R."], "The logic of scientific discovery", "1959",
     {"publisher": "Hutchinson", "location": "London"}),
    ("D. Huffman. A method for the construction of minimum-redundancy "
     "codes. Proceedings of the IRE, 40(9):1098-1101, 1952.",
     ["D. Huffman"],
     "A method for the construction of minimum-redundancy codes",
     "1952", {"journal": "Proceedings of the IRE", "volume": "40",
              "issue": "9", "pages": "1098-1101"}),
    ("Orwell, George. Nineteen Eighty-Four. Secker and Warburg, 1949.",
     ["Orwell, George"], "Nineteen Eighty-Four", "1949",
     {"publisher": "Secker and Warburg"}),
    ("Keynes, J.M., 1936. The general theory of employment, interest "
     "and money. Macmillan, London.",
     ["Keynes, J.M."],
     "The general theory of employment, interest and money", "1936",
     {"publisher": "Macmillan", "location": "London"}),
    ("Hotelling, H., 1929. Stability in competition. The Economic "
     "Journal 39(153), pp. 41-57.",
     ["Hotelling, H."], "Stability in competition", "1929",
     {"journal": "The Economic Journal", "volume": "39",
      "issue": "153", "pages": "41-57"}),
    ("Backus, J. (1978). Can programming be liberated from the von "
     "Neumann style? In Proceedings of the ACM Annual Conference "
     "(pp. 613-641). ACM.",
     ["Backus, J."],
     "Can programming be liberated from the von Neumann style?",
     "1978", {"publisher": "ACM", "pages": "613-641"}),
    ("Shannon, C. E. (1940). A symbolic analysis of relay and "
     "switching circuits (Master's thesis). Massachusetts Institute "
     "of Technology.",
     ["Shannon, C. E."],
     "A symbolic analysis of relay and switching circuits", "1940",
     {}),
    ("Smith, A., 1776. An inquiry into the nature and causes of the "
     "wealth of nations. Strahan and Cadell, London.",
     ["Smith, A."],
     "An inquiry into the nature and causes of the wealth of nations",
     "1776", {"publisher": "Strahan and Cadell", "location": "London"}),
])
def test_heldout_hand_truth(cite, authors, title, date, extra):
    f, shape = parse_fields_ex(cite)
    assert not shape.startswith("fallback"), shape
    assert f["authors"] == authors
    assert f["title"] == title
    assert f["date"] == date
    for k, v in extra.items():
        assert f[k] == v, (k, f[k], v)


def test_arxiv_tail_both_id_styles():
    f, shape = parse_fields_ex(
        "Perelman, G. (2002). The entropy formula for the Ricci flow "
        "and its geometric applications. arXiv:math/0211159")
    assert shape == "T13+arxiv"
    assert f["title"] == ("The entropy formula for the Ricci flow and "
                          "its geometric applications")
    f2, shape2 = parse_fields_ex(
        "Kingma, D. P., & Ba, J. (2014). Adam: A method for "
        "stochastic optimization. arXiv:1412.6980")
    assert shape2 == "T13+arxiv"
    assert f2["authors"] == ["Kingma, D. P.", "Ba, J."]


def test_paren_numbered_marker_strips():
    f, shape = parse_fields_ex(
        "(4) Kruskal, J. B. (1956). On the shortest spanning subtree "
        "of a graph and the traveling salesman problem. Proceedings "
        "of the American Mathematical Society, 7(1), 48-50.")
    assert shape == "T1"
    assert f["authors"] == ["Kruskal, J. B."]
