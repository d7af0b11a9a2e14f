"""Synthetic web-page corpus for the main-content (boilerplate-strip)
extractor — deterministic HTML pages + construction-time golden.

Each document row becomes one HTML page: real article paragraphs drawn
from the document's own words, wrapped in the boilerplate a crawler
actually sees — nav link lists, a header title, a link-dense cookie
banner, sidebar widgets, script/style payloads, a footer.  The golden
main text is what the GENERATOR placed in the article, computed here
from construction — never by running the extractor
(``ops/webextract.py`` recovers it independently).

Separability contract: every boilerplate block is built to violate the
published keep rule (plain length < MIN_CHARS or link density >
MAX_LINK_DENSITY) and every article paragraph to satisfy it;
``build_page`` ASSERTS both, so a generator drift that breaks the
contract fails at construction instead of producing an unlearnable
corpus.  The rule constants live here and in ``ops/webextract.py``
independently — the extractor does not import this module.
"""

from __future__ import annotations

import html as _html
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WEB_ROOT = "/tmp/arx_web"
MIN_CHARS = 60
MAX_LINK_DENSITY = 0.3

_WORD_RE = re.compile(r"[a-z0-9]+")
_WS_RE = re.compile(r"\s+")

# fallback vocabulary when a document's own text is too short
_FALLBACK = ("stream shuffle bucket arrow batch actor lineage page span "
             "window corpus token index merge sample filter rank score "
             "model graph").split()

_NAV_WORDS = ("Home", "About", "Products", "Blog", "Contact", "Careers",
              "Support", "Docs", "Pricing", "News")
_WIDGET_HEADS = ("Related:", "Trending:", "Popular:", "See also:")


def _rng(doc_id: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64([int(doc_id), 0x3EB]))


def _words_of(text: str) -> list[str]:
    ws = _WORD_RE.findall((text or "").lower())
    return ws if len(ws) >= 20 else ws + list(_FALLBACK)


def _plain_of_fragment(frag: str) -> str:
    """Plain text of an inline-markup fragment (tags stripped, entities
    unescaped, whitespace collapsed) — the construction-side mirror of
    the extractor's normalization, applied only to fragments this
    generator built."""
    return _WS_RE.sub(" ", _html.unescape(re.sub(r"<[^>]+>", "", frag))).strip()


def _link_density(frag: str) -> float:
    linked = sum(len(_plain_of_fragment(m))
                 for m in re.findall(r"(?is)<a\b[^>]*>(.*?)</a>", frag))
    total = len(_plain_of_fragment(frag))
    return linked / total if total else 0.0


def _assert_boiler(frag: str) -> str:
    p = _plain_of_fragment(frag)
    assert (len(p) < MIN_CHARS
            or _link_density(frag) > MAX_LINK_DENSITY), (
        "boilerplate block violates the separability contract: " + p)
    return frag


def _assert_content(frag: str) -> str:
    p = _plain_of_fragment(frag)
    assert len(p) >= MIN_CHARS and _link_density(frag) <= MAX_LINK_DENSITY, (
        "content paragraph violates the separability contract: " + p)
    return frag


def _paragraph(rng: np.random.Generator, words: list[str]) -> tuple[str, str]:
    """One article paragraph → (inner_html, plain_text).  12–30 words,
    padded to MIN_CHARS; may carry an inline link (≤ 2 words, density
    kept under the rule), an <em> phrase, and an '&amp;' entity."""
    n = int(rng.integers(12, 31))
    idx = rng.integers(0, len(words), size=n + 8)
    ws = [words[i] for i in idx[:n]]
    k = 0
    while sum(len(w) for w in ws) + len(ws) - 1 < MIN_CHARS + 10:
        ws.append(words[int(idx[(n + k) % len(idx)])] if k < 8 else "padding")
        k += 1
    ws[0] = ws[0].capitalize()
    parts = list(ws)
    if rng.random() < 0.4:                    # inline entity
        j = int(rng.integers(1, len(parts)))
        parts.insert(j, "&amp;")
    if rng.random() < 0.5:                    # short inline link
        j = int(rng.integers(1, max(2, len(parts) - 2)))
        n_link = 1 + int(rng.random() < 0.5)
        linked = " ".join(parts[j:j + n_link])
        if len(linked) / max(1, len(" ".join(
                p if p != "&amp;" else "&" for p in parts))) <= 0.25:
            parts[j:j + n_link] = [f'<a href="/w/{j}">{linked}</a>']
    if rng.random() < 0.3:                    # emphasis (inline, kept)
        j = int(rng.integers(0, len(parts)))
        if not parts[j].startswith("<"):
            parts[j] = f"<em>{parts[j]}</em>"
    inner = " ".join(parts) + "."
    return inner, _plain_of_fragment(inner)


def build_page(doc_id: int, text: str) -> dict:
    """→ {doc_id, html, main_text, n_blocks} — deterministic in
    ``doc_id`` (layout/boilerplate) and ``text`` (article words)."""
    rng = _rng(doc_id)
    words = _words_of(text)

    title = " ".join(w.capitalize() for w in
                     (words[i] for i in rng.integers(0, len(words), 4)))[:50]
    nav_n = int(rng.integers(3, 7))
    nav_items = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>'
        for w in rng.choice(_NAV_WORDS, size=nav_n, replace=False))
    nav = _assert_boiler(f"<nav><ul>{nav_items}</ul></nav>")
    header = _assert_boiler(f"<header><h1>{title}</h1></header>")
    cookie = _assert_boiler(
        '<div id="cookie">Cookie notice: '
        '<a href="#accept">Accept all cookies</a> '
        '<a href="#manage">Manage preferences</a></div>')
    head_w = _WIDGET_HEADS[int(rng.integers(0, len(_WIDGET_HEADS)))]
    wid_links = " ".join(
        f'<a href="/t/{i}">{words[int(rng.integers(0, len(words)))]} '
        f'{words[int(rng.integers(0, len(words)))]}</a>'
        for i in range(int(rng.integers(2, 5))))
    sidebar = _assert_boiler(
        f'<aside><div class="widget">{head_w} {wid_links}</div></aside>')
    foot_items = "".join(
        f'<li><a href="/f/{i}">{w}</a></li>'
        for i, w in enumerate(rng.choice(_NAV_WORDS, size=3, replace=False)))
    footer = _assert_boiler(
        f"<footer><p>© 2024 Example Corp</p><ul>{foot_items}</ul>"
        "</footer>")

    n_paras = int(rng.integers(2, 7))
    paras, plains = [], []
    for _ in range(n_paras):
        inner, plain = _paragraph(rng, words)
        paras.append(_assert_content(f"<p>{inner}</p>"))
        plains.append(plain)
    article = "<article>" + "\n".join(paras) + "</article>"

    script = ("<script>var t = setInterval(function() { "
              "console.log('analytics beacon', document.title); }, "
              f"{int(rng.integers(1000, 9999))});</script>")
    style = ("<style>body { margin: 0; font-family: sans-serif; } "
             ".widget { float: right; width: 300px; }</style>")

    # sidebar before or after the article — layout varies per page
    mid = ([sidebar, article] if rng.random() < 0.5
           else [article, sidebar])
    page = "\n".join([
        "<!DOCTYPE html>", "<html>",
        f"<head><title>{title}</title>{style}{script}</head>",
        "<body>", "<!-- header chrome -->", nav, header, cookie,
        *mid, footer, "</body>", "</html>"])
    return {"doc_id": int(doc_id), "html": page,
            "main_text": "\n".join(plains), "n_blocks": n_paras}


def _generator_version() -> str:
    import hashlib
    with open(__file__, "rb") as f:
        return hashlib.md5(b"web-v1:" + f.read()).hexdigest()[:10]


def write_web_tables(sf_dir: str, out_root: str = WEB_ROOT) -> str:
    """Idempotently write pages.parquet (the corpus the extractor reads)
    + golden_main.parquet (the construction-time truth) for one sf dir
    → the directory path.  Cache keyed by a content hash of this module
    (the goldens.py staleness lesson)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(out_root, name)
    done = os.path.join(out_dir, "_DONE")
    version = _generator_version()
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == version:
                return out_dir
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = [build_page(i, t) for i, t in
            zip(docs.column("doc_id").to_pylist(),
                docs.column("text").to_pylist())]
    pq.write_table(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "html": pa.array([r["html"] for r in rows], pa.string())}),
        os.path.join(out_dir, "pages.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "main_text": pa.array([r["main_text"] for r in rows], pa.string()),
        "n_blocks": pa.array([r["n_blocks"] for r in rows], pa.int64())}),
        os.path.join(out_dir, "golden_main.parquet"))
    with open(done, "w") as f:
        f.write(version)
    return out_dir
