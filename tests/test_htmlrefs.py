"""The five HTML selector families (M7,
LOCDB-V3/xmlProcessing.py:179-277) and the <cite> field mapper (M13)."""

from automatic_reference_extractor_ray.functions.htmlrefs import (
    extract_html_refs, map_html_cite_fields)


def test_old_format_cite_alone():
    html = "<html><body><cite>Alpha beta gamma delta.</cite>" \
           "<dl class='references'><dd><span>ignored because cite wins</span></dd></dl></body></html>"
    assert extract_html_refs(html) == ["Alpha beta gamma delta."]


def test_family1_dl_references():
    html = ("<dl class='references'>"
            "<dt class='label'>1</dt>"
            "<dd><span>Alpha beta gamma</span>"
            "<span class='ReferenceLinks'>Google</span></dd>"
            "</dl>")
    assert extract_html_refs(html) == ["Alpha beta gamma."]


def test_family1_contribution_strong_after_text():
    html = ("<dl class='references'><dd>"
            "<span class='contribution'>Miller, A<strong>Great title</strong></span>"
            "</dd></dl>")
    assert extract_html_refs(html) == ["Miller, A. Great title."]


def test_family1_contribution_em_strong():
    html = ("<dl class='references'><dd>"
            "<span class='contribution'><em>Kim, B</em><strong>Other title</strong></span>"
            "</dd></dl>")
    assert extract_html_refs(html) == ["Kim, B Other title."]


def test_family2_pll_unwrap_and_dot():
    html = ("<div class='pll'>"
            "<div class='media-body mls plxl reference-contains'>['Alpha beta gamma']</div>"
            "<div class='media-body mls plxl reference-contains'>Delta epsilon zeta</div>"
            "</div>")
    assert extract_html_refs(html) == ["Alpha beta gamma.", "Delta epsilon zeta."]


def test_family3_citationcontent_counter_removed():
    html = ("<div class='content'>"
            "<div class='CitationContent'><span>2.</span> Alpha beta gamma.</div>"
            "</div>")
    assert extract_html_refs(html) == ["Alpha beta gamma."]


def test_family4_td_noise_removed():
    html = ("<table><tr><td valign='top'>Alpha beta gamma. "
            "<span class='ref-google'>Google Scholar</span>"
            "<span class='ref-xLink'>CrossRef</span></td></tr></table>")
    assert extract_html_refs(html) == ["Alpha beta gamma."]


def test_min_length_filter():
    html = "<div class='pll'><div class='media-body mls plxl reference-contains'>abc</div></div>"
    assert extract_html_refs(html) == []


def test_cite_field_mapping():
    html = ("<cite><span class='cit-auth'><span>Miller, A.</span></span> "
            "<span class='cit-pub-date'>1999</span> "
            "<span class='cit-article-title'>Great title</span> "
            "<span class='cit-jnl-abbrev'>J. Doc. Anal.</span> "
            "<span class='cit-vol'>12</span> "
            "<span class='cit-fpage'>45</span> <span class='cit-lpage'>67</span></cite>")
    [f] = map_html_cite_fields(html)
    assert f["authors"] == ["Miller, A."]
    assert f["date"] == "1999"
    assert f["title"] == "Great title"
    assert f["journal"] == "J. Doc. Anal."
    assert f["volume"] == "12"
    assert f["pages"] == "45-67"


def test_cite_source_fallback_title():
    html = "<cite><span class='cit-source'>Book title</span></cite>"
    [f] = map_html_cite_fields(html)
    assert f["title"] == "Book title"
