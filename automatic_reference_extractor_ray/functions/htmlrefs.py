"""HTML reference extraction — the five selector families of the
reference's ``prepareHTML`` (M7, LOCDB-V3/xmlProcessing.py:179-277) and
the ``<cite>`` field mapper ``mapHTML`` (M13, :279-397).

Family semantics (intended behavior; two latent py2-bs4 bugs in the
reference — ``el['class'] == "label"`` comparing a list to a string at
:198 and :208 — are implemented as the *intended* class checks, noted
here for the parity audit):

  old    ``<cite>`` elements → text, newlines stripped
  F1     ``dl.references`` direct children, skipping ``.label`` items;
         within an item, child ``.ReferenceLinks`` stops accumulation,
         ``.contribution`` stitches em/strong siblings
  F2     ``div.pll  div.media-body.mls.plxl.reference-contains`` → text;
         ``['…']`` unwrap; ensure trailing dot
  F3     ``div.content  div.CitationContent`` → text minus the first
         ``span`` (the counter); ensure trailing dot
  F4     ``td[valign=top]`` → text minus ``span.ref-google`` /
         ``span.ref-xLink`` texts

Every family applies the ``len(strip) > 5`` filter
(:217,:232,:247,:263).  When ``<cite>`` tags exist the old format is
used *alone* (the reference's if/else at :187-193); otherwise families
F1–F4 all contribute, in that order.
"""

from __future__ import annotations

from .fields import EMPTY_FIELDS
from .minidom import Node, parse_html
from .textkit import collapse_ws

MIN_LEN = 5


def _clean(s: str) -> str:
    return collapse_ws(s.replace("\n", " "))


def extract_html_refs(markup: str) -> list[str]:
    """Return the ordered raw reference strings of an HTML document."""
    root = parse_html(markup)
    cites = root.find_all("cite")
    if cites:
        return [_clean(c.text) for c in cites]

    refs: list[str] = []
    # -- Family 1: dl.references -------------------------------------
    for dl in root.find_all("dl", cls="references"):
        for item in dl.element_children():
            if item.has_class("label"):
                continue
            parts: list[str] = []
            for sub in item.element_children():
                if sub.has_class("ReferenceLinks"):
                    break
                if sub.has_class("contribution"):
                    parts.append(_stitch_contribution(sub))
                else:
                    parts.append(_clean(sub.text))
            s = collapse_ws(" ".join(p for p in parts if p))
            if len(s) > MIN_LEN:
                refs.append(s + ".")
    # -- Family 2: div.pll div.media-body.mls.plxl.reference-contains --
    for pll in root.find_all("div", cls="pll"):
        for d in pll.find_all("div", cls="media-body mls plxl reference-contains"):
            s = _clean(d.text)
            if s.startswith("['") and s.endswith("']"):
                s = s[2:-2]
            s = s.strip()
            if s and not s.endswith("."):
                s += "."
            if len(s.strip()) > MIN_LEN:
                refs.append(s)
    # -- Family 3: div.content div.CitationContent ---------------------
    for content in root.find_all("div", cls="content"):
        for d in content.find_all("div", cls="CitationContent"):
            s = d.text
            counter = d.find("span")
            if counter is not None:
                s = s.replace(counter.text.strip(), "", 1)
            s = _clean(s)
            if s and not s.endswith("."):
                s += "."
            if len(s.strip()) > MIN_LEN:
                refs.append(s)
    # -- Family 4: td[valign=top] --------------------------------------
    for td in root.find_all("td", attr=("valign", "top")):
        s = td.text.replace("\n", " ")
        for noise_cls in ("ref-google", "ref-xLink"):
            for sp in td.find_all("span", cls=noise_cls):
                s = s.replace(sp.text.strip(), "")
        s = _clean(s)
        if len(s) > MIN_LEN:
            refs.append(s)
    return refs


def _stitch_contribution(node: Node) -> str:
    """The ``.contribution`` em/strong stitching of Family 1
    (LOCDB-V3/xmlProcessing.py:206-213): with a ``<strong>`` present,
    either join text-before-em + em text + strong text, or
    text-before-strong + ". " + strong text; else the node's own text."""
    strong = node.find("strong")
    if strong is None:
        return _clean(node.text)
    em = node.find("em")
    # text node immediately before <strong>?
    before_strong = ""
    for c in node.children:
        if isinstance(c, Node) and c is strong:
            break
        if isinstance(c, str):
            before_strong = c
        elif c is not em:
            before_strong = ""
    if em is not None and not before_strong.strip():
        before_em = ""
        for c in node.children:
            if isinstance(c, Node) and c is em:
                break
            if isinstance(c, str):
                before_em = c
        return collapse_ws(f"{before_em.strip()} {em.text.strip()} {strong.text.strip()}")
    return collapse_ws(f"{before_strong.strip()}. {strong.text.strip()}")


def has_cite(markup: str) -> bool:
    return "<cite" in markup


def map_html_cite_fields(markup: str) -> list[dict[str, object]]:
    """The M13 field mapper: per ``<cite>``, fields from ``span.cit-*``
    classes with provenance Mapping/Mapping
    (LOCDB-V3/xmlProcessing.py:279-397).  Returns one dict per cite with
    the BibStructured field set plus ``raw`` (the cite's text — the
    reference's Mapping records carry no rawString; we attach the text
    so span equality has content, divergence documented)."""
    root = parse_html(markup)
    out: list[dict[str, object]] = []
    for cite in root.find_all("cite"):
        f: dict[str, object] = dict(EMPTY_FIELDS)
        f["raw"] = _clean(cite.text)
        authors = []
        for a in cite.find_all("span", cls="cit-auth"):
            inner = a.find("span")
            name = (inner.text if inner is not None else a.text).strip()
            if name:
                authors.append(name)
        f["authors"] = authors
        for cls, key in (("cit-pub-date", "date"), ("cit-publ-loc", "location"),
                         ("cit-publ-name", "publisher"), ("cit-jnl-abbrev", "journal"),
                         ("cit-vol", "volume")):
            hits = root_text_hits(cite, cls)
            if hits:
                f[key] = hits[-1]
        titles = root_text_hits(cite, "cit-article-title") or root_text_hits(cite, "cit-source")
        if titles:
            f["title"] = titles[-1]
        fp = root_text_hits(cite, "cit-fpage")
        lp = root_text_hits(cite, "cit-lpage")
        if fp and lp:
            f["pages"] = f"{fp[-1]}-{lp[-1]}"   # from-to join, xmlProcessing.py:389-395
        out.append(f)
    return out


def root_text_hits(node: Node, cls: str) -> list[str]:
    return [s for s in (sp.text.strip() for sp in node.find_all("span", cls=cls)) if s]
