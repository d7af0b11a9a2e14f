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


def test_t8_middle_initials():
    f = parse_fields("Miller, A. B. and Kim, C. D. (2001). Robust "
                     "segmentation. Data Engineering Bulletin, 7(2), 10-20.")
    # forename first + middle stay inside one author string; the
    # comma-after-initial splitter must not split at " B."
    assert f["authors"] == ["Miller, A. B.", "Kim, C. D."]
    assert f["journal"] == "Data Engineering Bulletin"


def test_t9_chapter_in_edited_volume():
    f = parse_fields("Silva, R. (1998). Automated citation extraction. "
                     "In: Weber, K. (ed.), Historical records analysis, "
                     "MIT Press, Boston, 101-120.")
    assert f["authors"] == ["Silva, R."]            # editor ignored
    assert f["title"] == "Automated citation extraction"  # level a wins
    assert f["journal"] == ""                       # book title dropped
    assert f["publisher"] == "MIT Press"
    assert f["location"] == "Boston"
    assert f["pages"] == "101-120"


def test_t10_month_date_keeps_when_value():
    # the reference stores the full date@when attribute
    # (imgProcessing.py:889-894): "(2015, March)" → "2015-03"
    f = parse_fields("Novak, P. (2015, March). Streaming analysis. "
                     "Archive Science Quarterly, 3(1), 5-9.")
    assert f["date"] == "2015-03"
    assert f["volume"] == "3"
    assert f["pages"] == "5-9"


def test_t11_forename_first_authors():
    f = parse_fields("A. Miller and C. Kim (2007). Spectral methods. "
                     "Information Processing Letters, 9(4), 12-30.")
    assert f["authors"] == ["A. Miller", "C. Kim"]
    assert f["journal"] == "Information Processing Letters"


def test_t12_bare_surname_comma_list():
    f = parse_fields("Miller, Schmidt, and Tanaka (2003). Graph "
                     "inference. Data Engineering Bulletin, 5(2), 8-19.")
    assert f["authors"] == ["Miller", "Schmidt", "Tanaka"]
    # the inverted-name guard: "Miller, A" is ONE name, not a list
    # (the fallback head of a <cite> twin stops before the ". ")
    f2 = parse_fields("Miller, A. 1999 Sparse graph inference")
    assert f2["authors"] == ["Miller, A"]


def test_t13_monograph_without_imprint():
    f = parse_fields("Okafor, S. (2013). Neural retrieval methods.")
    assert f["authors"] == ["Okafor, S."]
    assert f["title"] == "Neural retrieval methods"
    assert f["date"] == "2013"
    assert f["journal"] == "" and f["publisher"] == "" and f["pages"] == ""


def test_t14_page_marker():
    f = parse_fields("Silva, D. (2010). Streaming analysis. "
                     "Archive Science Quarterly, 3(1), p. 77.")
    assert f["pages"] == "77" and f["issue"] == "1"
    assert f["journal"] == "Archive Science Quarterly"


def test_t15_apa_ampersand_authors():
    f = parse_fields("Miller, A., Schmidt, B., & Tanaka, C. (2005). "
                     "Sparse graph inference. Journal of Document "
                     "Analysis, 12(3), 45-67.")
    assert f["authors"] == ["Miller, A.", "Schmidt, B.", "Tanaka, C."]
    assert f["pages"] == "45-67"


def test_t16_page_range_markers():
    f = parse_fields("Silva, D. (2010). Streaming analysis. "
                     "Archive Science Quarterly, 3(1), pp. 45-67.")
    assert f["pages"] == "45-67" and f["issue"] == "1"
    # European "Seiten" marker
    f = parse_fields("Weber, E. (1995). Neural retrieval. "
                     "Information Processing Letters, 44(2), S. 5-9.")
    assert f["pages"] == "5-9" and f["volume"] == "44"


def test_t17_quoted_title_drops_quotes():
    f = parse_fields('Okafor, S. (2013). "Neural retrieval methods". '
                     "Journal of Document Analysis, 7(2), 10-19.")
    assert f["title"] == "Neural retrieval methods"
    assert f["journal"] == "Journal of Document Analysis"


def test_inverted_fullname_stays_single_author():
    # ADVICE r3: a lone dotless "Surname, Forename" is ONE fully
    # spelled inverted name, not a two-surname list
    f = parse_fields("Miller, Anne (2003). Graph inference. "
                     "Data Engineering Bulletin, 5(2), 8-19.")
    assert f["authors"] == ["Miller, Anne"]


def test_parse_fields_ex_shape_labels():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    assert parse_fields_ex(
        "Miller, A. (1999). Sparse graphs. Journal of Document "
        "Analysis, 12(3), 45-67.")[1] == "T1"
    assert parse_fields_ex("Some unparseable thing from 2004. With "
                           "stuff.")[1] == "fallback"


def test_fallback_keeps_year():
    f = parse_fields("Some unparseable thing from 2004. With stuff.")
    assert f["date"] == "2004"


def test_cite_fallback_golden_agrees_with_parser():
    """The <cite> ParsCit twin's golden fields are derived analytically
    in the generator (corpus._cite_fallback_fields) — parse_fields must
    independently produce the same result for every template's span
    join (the round-1 circularity fix's agreement check)."""
    from automatic_reference_extractor_ray.sources.corpus import (
        _cite_fallback_fields)
    for seed in range(200):
        rng = np.random.Generator(np.random.PCG64(seed))
        f = gen_citation(rng).fields
        lead = f["authors"][0] if f["authors"] else ""
        p1, _, p2 = f["pages"].partition("-") if f["pages"] else ("", "", "")
        pieces = ([lead] if lead else []) \
            + [str(f["date"]), str(f["title"])] \
            + ([str(f["journal"])] if f["journal"] else []) \
            + ([str(f["volume"])] if f["volume"] else []) \
            + ([p1, p2] if f["pages"] else []) \
            + ([str(f["publisher"])] if f["publisher"] else []) \
            + ([str(f["location"])] if f["location"] else [])
        raw = " ".join(p for p in pieces if p)
        assert parse_fields(raw) == _cite_fallback_fields(pieces, f["date"]), raw


def test_new_template_hand_cases():
    # T4 three-author comma list
    f = parse_fields("Miller, A., Kim, B., and Novak, C. (2001). "
                     "Robust segmentation. Data Engineering Bulletin, "
                     "7(2), 10-19.")
    assert f["authors"] == ["Miller, A.", "Kim, B.", "Novak, C."]
    # T5 editor book: editors ignored by the TEI mapper -> no authors
    f = parse_fields("Larsen, P. (ed.) (1988). Historical records. "
                     "MIT Press, Boston.")
    assert f["authors"] == [] and f["publisher"] == "MIT Press"
    assert f["location"] == "Boston" and f["date"] == "1988"
    # T6 from-only page (biblScope unit="page" fallback)
    f = parse_fields("Silva, D. (2010). Streaming analysis. "
                     "Archive Science Quarterly, 3(1), 77.")
    assert f["pages"] == "77" and f["issue"] == "1"
    # T7 volume without issue
    f = parse_fields("Weber, E. (1995). Neural retrieval. "
                     "Information Processing Letters, 44, 5-9.")
    assert f["volume"] == "44" and f["issue"] == "" and f["pages"] == "5-9"


def test_etal_author_list():
    # T18: the unnamed "et al." tail maps to NO <author> tags — only
    # the named lead author(s) survive
    f = parse_fields("Miller, A., et al. (1999). Sparse graph inference. "
                     "Journal of Document Analysis, 12(3), 45-67.")
    assert f["authors"] == ["Miller, A."]
    assert f["journal"] == "Journal of Document Analysis"
    assert f["pages"] == "45-67"
    f = parse_fields("Miller, A., Kim, B., et al. (2003). Neural "
                     "retrieval. Data Engineering Bulletin, 5(2), 8-19.")
    assert f["authors"] == ["Miller, A.", "Kim, B."]


def test_trailing_doi_stripped():
    # T19: the DOI is TEI <idno>, never read by the reference mapper
    # (imgProcessing.py:801-968) — fields come out as the T1 shape's
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    base = ("Miller, A. (1999). Sparse graph inference. "
            "Journal of Document Analysis, 12(3), 45-67.")
    want = parse_fields(base)
    for doi in (" doi:10.1234/jda.1999.12.",
                " https://doi.org/10.1234/jda.1999.12.",
                " http://dx.doi.org/10.5555/x7."):
        f, shape = parse_fields_ex(base + doi)
        assert f == want, doi
        assert shape == "T1+doi", doi
    # a DOI on a non-journal shape strips the same way
    f = parse_fields("Silva, D. (2010). Streaming analysis. "
                     "Archive Science Quarterly, 3(1), 77. "
                     "doi:10.9999/asq.77.")
    assert f["pages"] == "77" and f["issue"] == "1"


def test_conference_proceedings():
    # T20: the proceedings name is the monogr's level-m title and
    # drops (same rule as T9's book title); pages still map.  Must
    # not fall through to T2, which would read "In Proceedings of
    # ..." as a publisher.
    f = parse_fields("Miller, A. (1999). Sparse graph inference. "
                     "In Proceedings of the 5th Conference on "
                     "Document Analysis, pages 45-67.")
    assert f["authors"] == ["Miller, A."]
    assert f["title"] == "Sparse graph inference"
    assert f["journal"] == "" and f["publisher"] == ""
    assert f["pages"] == "45-67" and f["date"] == "1999"


def test_trailing_retrieval_url_stripped():
    # T21: "Retrieved from <url>" / "Available at: <url>" is Grobid's
    # <ptr target>, never read by the reference mapper — stripped like
    # a DOI tail, shape suffixed "+url"
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    base = ("Miller, A. (1999). Sparse graph inference. "
            "Journal of Document Analysis, 12(3), 45-67.")
    want = parse_fields(base)
    for tail in (" Retrieved from http://archive.example.org/p/123.",
                 " Available at: https://archive.example.org/p/9."):
        f, shape = parse_fields_ex(base + tail)
        assert f == want, tail
        assert shape == "T1+url", tail


def test_vancouver_style():
    # T22: dotless "Surname AB" tokens, year after the journal,
    # ;vol(iss):pages run — the NLM/medical surface form of T1
    f, shape = __import__(
        "automatic_reference_extractor_ray.functions.fields",
        fromlist=["parse_fields_ex"]).parse_fields_ex(
        "Miller A, Schmidt B, Tanaka C. Adaptive spectral methods. "
        "Journal of Document Analysis. 1999;12(3):45-67.")
    assert shape == "T22"
    assert f["authors"] == ["Miller A", "Schmidt B", "Tanaka C"]
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["issue"] == "3" and f["pages"] == "45-67"


def test_ieee_style():
    # T23: quoted title keeps its comma inside the quotes; vol./no./pp.
    # markers; year last.  Mapped fields are T1's.
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        'A. Miller, B. Schmidt, and C. Tanaka, "Robust segmentation '
        'in scanned documents," Archive Science Quarterly, vol. 30, '
        "no. 11, pp. 200-230, 2020.")
    assert shape == "T23"
    assert f["authors"] == ["A. Miller", "B. Schmidt", "C. Tanaka"]
    assert f["title"] == "Robust segmentation in scanned documents"
    assert f["journal"] == "Archive Science Quarterly"
    assert f["date"] == "2020" and f["volume"] == "30"
    assert f["issue"] == "11" and f["pages"] == "200-230"


def test_apa_edited_chapter():
    # T24: chapter title (level a) wins, book title (level m) DROPS,
    # the editor maps to no <author> — same TEI rules as T9 under the
    # APA "(Ed.), ... (pp. N-M)" surface form
    f = parse_fields(
        "Miller, A. (1999). Sparse graph inference. In B. Schmidt "
        "(Ed.), Historical records analysis (pp. 45-67). Springer.")
    assert f["authors"] == ["Miller, A."]
    assert f["title"] == "Sparse graph inference"
    assert f["journal"] == "" and f["publisher"] == "Springer"
    assert f["pages"] == "45-67" and f["date"] == "1999"


def test_org_author_maps_to_one_empty_name():
    # T25: Grobid tags a corporate author as <author><orgName>…</…>;
    # the reference's name join reads forename/surname children ONLY
    # (imgProcessing.py:816-846), so the org author maps to ONE EMPTY
    # name string — present but empty, unlike T5's absent editors
    f = parse_fields("World Health Organization. (2020). Automated "
                     "citation extraction. Springer, Berlin.")
    assert f["authors"] == [""]
    assert f["publisher"] == "Springer" and f["location"] == "Berlin"
    assert f["date"] == "2020"
    # person names and "and"-joined lists never trip the org branch
    from automatic_reference_extractor_ray.functions.fields import (
        _split_authors)
    assert _split_authors("Miller and Schmidt") == ["Miller", "Schmidt"]
    assert _split_authors("Anne Miller") == ["Anne Miller"]


def test_chicago_article():
    # T26: fully-spelled inverted name stays ONE author; the quoted
    # title drops its quotes AND the in-quote period
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        'Miller, Anne. "Adaptive spectral methods." Journal of '
        "Document Analysis 12, no. 3 (1999): 45-67.")
    assert shape == "T26"
    assert f["authors"] == ["Miller, Anne"]
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["issue"] == "3" and f["pages"] == "45-67"


def test_chicago_book():
    # T27: "City: Publisher, year." imprint — pubPlace before
    # publisher; must NOT shadow the surname-style T3 (whose
    # "Journal 12:45-67, 1999." tail also carries a colon)
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Miller, Anne. Adaptive spectral methods. Boston: "
        "MIT Press, 1999.")
    assert shape == "T27"
    assert f["authors"] == ["Miller, Anne"]
    assert f["publisher"] == "MIT Press" and f["location"] == "Boston"
    assert f["date"] == "1999"
    f, shape = parse_fields_ex(
        "Miller and Schmidt. Sparse graph inference. Journal of "
        "Document Analysis 12:45-67, 1999.")
    assert shape == "T3" and f["volume"] == "12"


def test_adversarial_strings_never_mismatch_a_template():
    # Wrong-template matches are worse than fallback: strings NEAR a
    # template shape but semantically outside it must degrade to the
    # year/sentence fallback (or hit the genuinely-correct template),
    # never bind fields from the wrong grammar.
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    falls = [
        # abbreviation period inside the title breaks T1's title atom
        "Smith, J. (2020). Title with Abbrev. Inside. Journal, 3(2), 1-5.",
        # lowercase initials are not Vancouver author tokens
        "miller a, schmidt b. Title. Journal. 1999;12(3):45-67.",
        # IEEE shape without the trailing year
        'A. Miller, "Title," Journal, vol. 12, no. 3, pp. 45-67.',
        # digits in the place forbid the Chicago-book imprint
        "Miller, Anne. Title. Sector 7: MIT Press, 1999.",
    ]
    for s in falls:
        assert parse_fields_ex(s)[1] == "fallback", s
    # an org suffix word elsewhere in a person head must not trip the
    # org branch (comma present -> person): normal T2, author kept
    f, shape = parse_fields_ex(
        "Institute Miller, A. (2001). Title. Springer, Berlin.")
    assert shape == "T2" and f["authors"] == ["Institute Miller, A."]


def test_t28_harvard():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Miller, A. (1999) 'Adaptive spectral methods', Journal of "
        "Document Analysis, 12(3), pp. 45-67.")
    assert shape == "T28"
    assert f["authors"] == ["Miller, A."]
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["issue"] == "3" and f["pages"] == "45-67"


def test_t29_thesis_tail_drops():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    for degree in ("PhD", "Master's"):
        f, shape = parse_fields_ex(
            f"Miller, A. (1999). Adaptive spectral methods. {degree} "
            "thesis, University of Oslo.")
        assert shape == "T29", degree
        assert f["authors"] == ["Miller, A."]
        assert f["title"] == "Adaptive spectral methods"
        assert f["date"] == "1999"
        # institution/degree live outside the imprint: nothing maps
        assert f["publisher"] == "" and f["location"] == ""


def test_t30_arxiv_tail_stripped():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Miller, A. (2015). Adaptive spectral methods. arXiv preprint "
        "arXiv:1501.12345.")
    assert shape == "T13+arxiv"
    assert f["authors"] == ["Miller, A."]
    assert f["title"] == "Adaptive spectral methods"
    assert f["date"] == "2015"
    # versioned ids strip the same way
    f, shape = parse_fields_ex(
        "Miller, A. (2015). Adaptive spectral methods. arXiv preprint "
        "arXiv:1501.12345v2.")
    assert shape == "T13+arxiv" and f["title"] == "Adaptive spectral methods"


def test_t31_mla_article():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        'Miller, Anne. "Adaptive spectral methods." Journal of '
        "Document Analysis, vol. 12, no. 3, 1999, pp. 45-67.")
    assert shape == "T31"
    assert f["authors"] == ["Miller, Anne"]      # ONE inverted name
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["issue"] == "3" and f["pages"] == "45-67"


def test_t32_edition_and_report_parentheticals_drop():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    for par in ("2nd ed.", "5th ed.", "Tech. Rep. No. 42"):
        f, shape = parse_fields_ex(
            f"Miller, A. (1999). Adaptive spectral methods ({par}). "
            "Springer, Berlin.")
        assert shape == "T32", par
        assert f["authors"] == ["Miller, A."]
        assert f["title"] == "Adaptive spectral methods"
        assert f["publisher"] == "Springer" and f["location"] == "Berlin"
        assert f["date"] == "1999"


def test_t33_german_article_semicolon_authors():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Schmidt, A.; Meier, B.: Adaptive spectral methods. In: "
        "Journal of Document Analysis 12 (1999), Nr. 3, S. 45-67.")
    assert shape == "T33"
    assert f["authors"] == ["Schmidt, A.", "Meier, B."]
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["issue"] == "3" and f["pages"] == "45-67"
    # single author too
    f, shape = parse_fields_ex(
        "Schmidt, A.: Adaptive spectral methods. In: Journal of "
        "Document Analysis 12 (1999), Nr. 3, S. 45-67.")
    assert shape == "T33" and f["authors"] == ["Schmidt, A."]


def test_t34_lncs_proceedings_name_drops():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Schmidt, A.: Adaptive spectral methods. In: Proceedings of "
        "the 5th Conference on Document Analysis, pp. 45-67. "
        "Springer, Berlin (1999).")
    assert shape == "T34"
    assert f["authors"] == ["Schmidt, A."]
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == ""              # level m drops
    assert f["publisher"] == "Springer" and f["location"] == "Berlin"
    assert f["date"] == "1999" and f["pages"] == "45-67"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=300))
def test_parse_fields_never_crashes_and_keeps_schema(s):
    # the parser sees arbitrary segmenter output on real corpora: any
    # string must produce the full field dict (never an exception),
    # with authors a list of strings and every other field a string
    from automatic_reference_extractor_ray.functions.fields import (
        EMPTY_FIELDS, parse_fields_ex)
    f, shape = parse_fields_ex(s)
    assert set(f) == set(EMPTY_FIELDS)
    assert isinstance(f["authors"], list)
    assert all(isinstance(a, str) for a in f["authors"])
    assert all(isinstance(f[k], str) for k in f if k != "authors")
    assert isinstance(shape, str) and shape


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10**9))
def test_generator_roundtrip_random_seeds(seed):
    # the 300-seed roundtrip pinned low seeds; this drives the same
    # invariant across the whole seed space
    import numpy as np
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields)
    from automatic_reference_extractor_ray.sources.citegen import (
        gen_citation)
    rng = np.random.Generator(np.random.PCG64(seed))
    c = gen_citation(rng)
    assert parse_fields(c.raw) == c.fields


def test_t35_nature_style():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Miller, A. & Kim, B. Adaptive spectral methods. Journal of "
        "Document Analysis 12, 45-67 (1999).")
    assert shape == "T35"
    assert f["authors"] == ["Miller, A.", "Kim, B."]   # dots survive
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["issue"] == "" and f["pages"] == "45-67"
    # single author
    f, shape = parse_fields_ex(
        "Miller, A. Adaptive spectral methods. Journal of Document "
        "Analysis 12, 45-67 (1999).")
    assert shape == "T35" and f["authors"] == ["Miller, A."]


def test_t36_cse_name_year():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Miller A, Schmidt B. 1999. Adaptive spectral methods. "
        "Journal of Document Analysis 12(3):45-67.")
    assert shape == "T36"
    assert f["authors"] == ["Miller A", "Schmidt B"]
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["issue"] == "3" and f["pages"] == "45-67"


def test_t37_acs_style():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Miller, A. B.; Kim, C. Adaptive spectral methods. Journal of "
        "Document Analysis 1999, 12, 45-67.")
    assert shape == "T37"
    assert f["authors"] == ["Miller, A. B.", "Kim, C."]
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["issue"] == "" and f["pages"] == "45-67"


def test_t38_aps_letters_no_title():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "A. Miller and B. Kim, Journal of Document Analysis 12, "
        "4567 (1999).")
    assert shape == "T38"
    assert f["authors"] == ["A. Miller", "B. Kim"]
    assert f["title"] == ""                    # physics letters: none
    assert f["journal"] == "Journal of Document Analysis"
    assert f["date"] == "1999" and f["volume"] == "12"
    assert f["pages"] == "4567"                # from-only page


def test_t39_acm_reference_format():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)
    f, shape = parse_fields_ex(
        "Anne Miller and Ben Schmidt. 1999. Adaptive spectral methods. "
        "In Proceedings of the 5th Conference on Web Search. "
        "Academic Press, Boston, 45-67.")
    assert shape == "T39"
    assert f["authors"] == ["Anne Miller", "Ben Schmidt"]  # one each
    assert f["title"] == "Adaptive spectral methods"
    assert f["journal"] == ""        # proceedings name is level m
    assert f["publisher"] == "Academic Press"
    assert f["location"] == "Boston"
    assert f["date"] == "1999" and f["pages"] == "45-67"


def test_t44_t48_hand_cases():
    from automatic_reference_extractor_ray.functions.fields import (
        parse_fields_ex)

    f, sh = parse_fields_ex(
        "Miller, A. (n.d.). Graph methods. Journal of Tests, "
        "12(3), 45-67.")
    assert sh == "T1" and f["date"] == "" and f["journal"] == \
        "Journal of Tests"
    f, sh = parse_fields_ex(
        'Miller, Anne. "Archive floods downtown." City Herald, '
        "12 Mar. 1999, p. 4.")
    assert sh == "T45"
    assert f["authors"] == ["Miller, Anne"]      # ONE author
    assert f["date"] == "1999-03-12" and f["pages"] == "4"
    assert f["journal"] == "City Herald"
    f, sh = parse_fields_ex(
        "Python Software Foundation. (2020). Python (Version 3.8) "
        "[Computer software]. https://python.org")
    assert sh == "T46" and f["authors"] == [""] and f["title"] == \
        "Python" and f["date"] == "2020"
    # URL-less form parses identically
    f2, sh2 = parse_fields_ex(
        "Python Software Foundation. (2020). Python (Version 3.8) "
        "[Computer software].")
    assert sh2 == "T46" and f2 == f
    f, sh = parse_fields_ex(
        "Miller, A. (1999). Document scanner assembly. "
        "U.S. Patent No. 5,123,456.")
    assert sh == "T47" and f["title"] == "Document scanner assembly"
    f, sh = parse_fields_ex(
        "Miller, A. (1999). Survey results (Report No. 42). "
        "Data Press.")
    assert sh == "T48" and f["publisher"] == "Data Press"
    assert f["title"] == "Survey results"
