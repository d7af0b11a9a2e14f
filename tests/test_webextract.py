"""Main-content extraction: the density classifier against
hand-written pages, adversarial markup, and the synthetic web corpus's
construction-time golden."""

import pandas as pd
import pytest

from automatic_reference_extractor_ray.ops.webextract import (
    extract_main_content, main_content)
from automatic_reference_extractor_ray.sources.webgen import build_page

LONG = ("This paragraph carries well over sixty characters of plain "
        "article prose so the density rule keeps it.")


def test_keeps_long_plain_paragraph_drops_chrome():
    page = f"""<html><body>
      <nav><ul><li><a href="/">Home</a></li><li><a href="/b">Blog</a></li></ul></nav>
      <h1>Short Title</h1>
      <p>{LONG}</p>
      <footer><p>© 2024</p></footer>
    </body></html>"""
    text, n = extract_main_content(page)
    assert text == LONG
    assert n == 1


def test_link_dense_long_block_dropped():
    words = " ".join(f'<a href="/{i}">linked words here</a>' for i in range(6))
    page = f"<body><div>{words}</div><p>{LONG}</p></body>"
    text, n = extract_main_content(page)
    assert text == LONG and n == 1


def test_inline_link_within_density_kept():
    para = LONG[:-1] + ' with <a href="/x">one link</a> inside.'
    text, n = extract_main_content(f"<body><p>{para}</p></body>")
    assert n == 1
    assert "one link inside" in text
    assert "<a" not in text


def test_script_style_comment_payloads_never_leak():
    page = f"""<head><style>body {{ margin: 0; padding: 0; width: 100%;
      font-family: serif; color: #222222; }}</style>
      <script>var analytics = beaconLoop("{'x' * 100}");</script></head>
      <body><!-- {'c' * 100} --><p>{LONG}</p></body>"""
    text, n = extract_main_content(page)
    assert text == LONG and n == 1


def test_entities_unescaped_whitespace_collapsed():
    para = ("Rock &amp; roll   needs\n plenty of characters to pass the "
            "minimum length gate of the block classifier.")
    text, n = extract_main_content(f"<p>{para}</p>")
    assert n == 1
    assert "Rock & roll needs plenty" in text


def test_empty_and_markup_only_pages():
    assert extract_main_content("") == ("", 0)
    assert extract_main_content("<html><body><br><hr></body></html>") == ("", 0)


def test_generator_golden_roundtrip_800_seeds():
    texts = ["", "tiny", "lorem ipsum dolor sit amet " * 40,
             "mixed CASE &amp; punctuation; tokens, 42!"]
    for i in range(800):
        r = build_page(i, texts[i % len(texts)])
        got_text, got_n = extract_main_content(r["html"])
        assert got_text == r["main_text"], f"seed {i}"
        assert got_n == r["n_blocks"], f"seed {i}"


def test_generator_determinism():
    a = build_page(123, "alpha beta gamma " * 30)
    b = build_page(123, "alpha beta gamma " * 30)
    assert a == b
    c = build_page(124, "alpha beta gamma " * 30)
    assert c["html"] != a["html"]


def test_batch_stage_schema():
    rows = [build_page(i, "words for the article body " * 20)
            for i in range(5)]
    out = main_content(pd.DataFrame(
        {"doc_id": [r["doc_id"] for r in rows],
         "html": [r["html"] for r in rows]}))
    assert list(out.columns) == ["doc_id", "main_text", "n_blocks"]
    assert out["n_blocks"].dtype == "int64"
    assert (out["main_text"] == [r["main_text"] for r in rows]).all()


def test_ray_dataset_end_to_end(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.webextract import (
        extract_main_dataset)
    rows = [build_page(i, "streaming arrow batches " * 15)
            for i in range(40)]
    pages = rd.from_pandas(pd.DataFrame(
        {"doc_id": [r["doc_id"] for r in rows],
         "html": [r["html"] for r in rows]}))
    got = (extract_main_dataset(pages).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (pd.DataFrame({"doc_id": [r["doc_id"] for r in rows],
                         "main_text": [r["main_text"] for r in rows],
                         "n_blocks": pd.Series(
                             [r["n_blocks"] for r in rows], dtype="int64")})
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_curate_web_composed_pipeline(ray_session, tmp_path):
    """Composed crawl-to-clean pipeline vs its stage-composed DuckDB
    oracle on a fresh sf0.001 web corpus, plus partition invariance."""
    import duckdb

    from automatic_reference_extractor_ray.pipelines.webcurate import (
        curate_web_corpus, curate_web_sql)
    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    from automatic_reference_extractor_ray.sources.webgen import (
        write_web_tables)

    d = write_web_tables("/root/testdata/sf0.001",
                         out_root=str(tmp_path))
    pages = read_parquet_clean(f"{d}/pages.parquet")
    got = (curate_web_corpus(pages).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (duckdb.sql(curate_web_sql(f"{d}/golden_main.parquet")).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # the pipeline actually bites: some pages dropped, some kept
    assert 0 < len(got) < 500
    # partition invariance
    got2 = (curate_web_corpus(pages.repartition(7)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_separability_contract_asserts():
    # the generator must refuse to emit a page whose boilerplate could
    # pass the keep rule — drive the assert directly
    from automatic_reference_extractor_ray.sources import webgen
    with pytest.raises(AssertionError):
        webgen._assert_boiler(f"<div>{LONG}</div>")
    with pytest.raises(AssertionError):
        webgen._assert_content("<p>too short</p>")
