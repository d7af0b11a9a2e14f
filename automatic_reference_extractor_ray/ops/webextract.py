"""Main-content extraction: HTML boilerplate strip via text-density /
link-density block classification — the north-rule-named capability
("HTML boilerplate strip … DOM heuristics") as a streaming Ray Data
stage.

Method (public prior art: Boilerpipe's shallow-text-features
classifier, Kohlschütter et al. WSDM 2010; jusText's link-density
blocks, Pomikálek 2011 — re-derived here as plain regex kernels, no
parser library):

  1. drop non-content subtrees wholesale: <script>/<style> payloads
     and HTML comments;
  2. segment the page into text blocks at BLOCK-LEVEL tag boundaries
     (p, div, li, h1–h6, td, nav, …) — inline markup (<a>, <em>,
     <strong>, <span>) stays inside its block;
  3. per block, two shallow features: plain-text length (tags
     stripped, entities unescaped, whitespace collapsed) and link
     density (anchor-text chars / total chars);
  4. keep blocks with length ≥ MIN_CHARS and link density ≤
     MAX_LINK_DENSITY — navigation lists, cookie banners, footers and
     sidebar widgets are short or link-dense; article paragraphs are
     long and plain.

The reference system's analogous capability is its DOM selector strip
(/root/reference LOCDB-V3/xmlProcessing.py:179-277, the five
selector families of ``functions/htmlrefs.py``); this operator is the
*generic* boilerplate/content split a web-scale training-data pipeline
runs upstream of that.

Scale shape: stateless ``map_batches`` — regexes are compiled once at
module import (each Ray worker pays it once at deserialization), each
batch is a Python loop over documents with C regex kernels inside
(string parsing, the hOCR-parser precedent), no shuffle, no state.
Verified against the synthetic web corpus's construction-time golden
(``sources/webgen.py``), which asserts the separability contract the
rule constants rely on.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd

MIN_CHARS = 60            # keep rule — mirrored (not imported) in webgen
MAX_LINK_DENSITY = 0.3

_DROP_RE = re.compile(
    r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->")
_BLOCK_RE = re.compile(
    r"(?is)</?(?:p|div|li|ul|ol|h[1-6]|td|th|tr|table|nav|header|footer|"
    r"article|section|aside|main|title|head|body|html|blockquote|figure|"
    r"figcaption|form|br|hr)\b[^>]*>")
_A_RE = re.compile(r"(?is)<a\b[^>]*>(.*?)</a\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _plain(fragment: str) -> str:
    return _WS_RE.sub(" ", _html.unescape(_TAG_RE.sub("", fragment))).strip()


def extract_main_content(page_html: str,
                         min_chars: int = MIN_CHARS,
                         max_link_density: float = MAX_LINK_DENSITY,
                         ) -> tuple[str, int]:
    """One page → (main_text, n_blocks): kept blocks joined by
    newlines, in document order, plus the kept-block count."""
    doc = _DROP_RE.sub(" ", page_html)
    kept: list[str] = []
    for seg in _BLOCK_RE.split(doc):
        if not seg or seg.isspace():
            continue
        text = _plain(seg)
        if len(text) < min_chars:
            continue
        linked = sum(len(_plain(m)) for m in _A_RE.findall(seg))
        if linked / len(text) > max_link_density:
            continue
        kept.append(text)
    return "\n".join(kept), len(kept)


def main_content(batch: pd.DataFrame) -> pd.DataFrame:
    """Batch stage: (doc_id, html) → (doc_id, main_text, n_blocks)."""
    texts, counts = [], []
    for h in batch["html"]:
        t, n = extract_main_content(h)
        texts.append(t)
        counts.append(n)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(),
        "main_text": texts,
        "n_blocks": pd.Series(counts, dtype="int64")})


def extract_main_dataset(pages):
    """Dataset (doc_id, html) → Dataset (doc_id, main_text, n_blocks)."""
    return pages.map_batches(main_content, batch_format="pandas")
