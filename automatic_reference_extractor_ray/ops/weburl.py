"""URL canonicalization + domain ops — the web-crawl keys.

Every large-scale web pipeline keys on URLs twice: exact dedup on the
CANONICAL url (scheme/host case, default ports, fragments, and
tracking params are presentation noise) and per-DOMAIN bookkeeping
(crawl quotas, boilerplate stats, blocklists) on the registered
domain.  This module provides the canonicalization kernel, the
streaming dataset ops, and a deterministic messy-URL generator whose
clean form is SQL-derivable — the oracle recomputes the truth from
``doc_id`` arithmetic, never by parsing, so the parser is checked by a
genuinely independent path (the ``synthetic_link_edges`` pattern).

Canonical form (documented, deliberately minimal):
- scheme and host lowercase; a leading ``www.`` label drops;
- default ports drop (``:80`` for http, ``:443`` for https);
- the fragment drops;
- tracking params drop (``utm_*``, ``fbclid``, ``gclid``, ``ref``);
- remaining query params sort by name (byte order), joined ``&``;
- an empty path becomes ``/``.

Registered domain = the last label before a PUBLIC SUFFIX plus the
suffix, against an embedded bounded suffix set (the common single- and
two-label suffixes; a full public-suffix list is a data file swap, the
lookup logic is the same longest-match).

Scale shape: all ops are pure streaming ``map_batches`` — string
parsing is per-row by nature (stdlib ``urlsplit``), but nothing ever
leaves the batch except the requested columns; ``domain_counts`` rides
the bounded-bucket aggregate and ``domain_cap`` the per-group hash
cut, both existing primitives.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pandas as pd

# embedded bounded public-suffix subset: two-label suffixes that would
# otherwise mis-split under the "last two labels" rule, plus all
# single-label TLDs implicitly (fallback)
_TWO_LABEL_SUFFIXES = frozenset({
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.nz", "com.sg", "com.tr", "com.ar",
})

_TRACKING_PARAMS = ("fbclid", "gclid", "ref")


def _is_tracking(name: str) -> bool:
    return name.startswith("utm_") or name in _TRACKING_PARAMS


def normalize_url(url: str) -> str:
    """Canonical form of one URL (rules in the module docstring).
    Malformed input degrades gracefully: whatever ``urlsplit`` yields
    is normalized component-wise; an empty string stays empty."""
    if not url:
        return ""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    port = parts.port
    if port is not None and not (
            (scheme == "http" and port == 80)
            or (scheme == "https" and port == 443)):
        host = f"{host}:{port}"
    path = parts.path or "/"
    query = ""
    if parts.query:
        kept = sorted(
            p for p in parts.query.split("&")
            if p and not _is_tracking(p.split("=", 1)[0]))
        query = "&".join(kept)
    out = f"{scheme}://{host}{path}"
    return f"{out}?{query}" if query else out


def url_host(url: str) -> str:
    """Lowercase host with a leading ``www.`` stripped ('' if none)."""
    if not url:
        return ""
    host = (urlsplit(url.strip()).hostname or "").lower()
    return host[4:] if host.startswith("www.") else host


def registered_domain(host: str) -> str:
    """Registrable domain of a host (longest-match against the
    embedded suffix set; bare hosts and IPs pass through)."""
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _TWO_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def normalize_urls(ds, url_col: str = "url", id_col: str = "doc_id"):
    """→ Dataset (id, url_norm, host, domain): pure streaming map."""

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        urls = b[url_col].tolist()
        hosts = [url_host(u) for u in urls]
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "url_norm": [normalize_url(u) for u in urls],
            "host": hosts,
            "domain": [registered_domain(h) for h in hosts]})

    return ds.map_batches(norm, batch_format="pandas")


def domain_counts(ds, url_col: str = "url", id_col: str = "doc_id",
                  num_buckets: int | None = None):
    """Docs per registered domain → Dataset (domain, n_docs): the
    crawl-quota / blocklist bookkeeping aggregate.  Per-batch partials
    collapse before the one bounded-bucket exchange (hot domains are
    exactly the point — a domain's rows pre-combine in every batch
    they appear in)."""
    from .shuffle import bucketed_agg

    def part(b: pd.DataFrame) -> pd.DataFrame:
        doms = [registered_domain(url_host(u)) for u in b[url_col]]
        g = pd.Series(doms, name="domain").value_counts()
        return pd.DataFrame({"domain": g.index, "n_docs": g.to_numpy()})

    parts = ds.map_batches(part, batch_format="pandas")
    return bucketed_agg(parts, "domain", {"n_docs": ("n_docs", "sum")},
                        num_buckets)


def domain_cap(ds, k: int, url_col: str = "url", id_col: str = "doc_id",
               num_buckets: int | None = None):
    """Per-domain quota: keep at most ``k`` docs per registered domain
    (smallest md5-of-id digests win — deterministic, uniform).  Groups
    under the cap keep every row.  → Dataset (domain, id) of the
    keepers (semi-join back for full rows).  Rides
    ``sample_per_group``'s per-batch k-candidate hash-rank cut."""
    from .analytics import sample_per_group

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "domain": [registered_domain(url_host(u))
                       for u in b[url_col]],
            id_col: b[id_col].to_numpy()})

    return sample_per_group(
        ds.map_batches(attach, batch_format="pandas"),
        key="domain", id_col=id_col, k=k, num_buckets=num_buckets)


def url_dedup(ds, url_col: str = "url", id_col: str = "doc_id",
              num_buckets: int | None = None):
    """Exact URL dedup: one keeper per CANONICAL url (min id wins) —
    the crawl-frontier / recrawl-collapse primitive; two presentation
    variants of the same address count as one page.

    → (url_norm, keeper, n_dups).  Scale shape: ``exact_dedup``'s —
    per-batch (min, count) partials per url_norm, one bounded-bucket
    aggregate; a hot URL ships ≤ one partial row per block."""
    from .shuffle import bucketed_agg

    def part(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "url_norm": [normalize_url(u) for u in b[url_col]],
            id_col: b[id_col].to_numpy()})
        return (g.groupby("url_norm", sort=False)[id_col]
                .agg(keeper="min", n_dups="size").reset_index())

    return bucketed_agg(
        ds.map_batches(part, batch_format="pandas"), "url_norm",
        {"keeper": ("keeper", "min"), "n_dups": ("n_dups", "sum")},
        num_buckets)


# ------------------------------------------------ synthetic URL corpus

_TLDS = ("com", "org", "net", "co.uk", "io")


def blocklist_filter(ds, blocked, url_col: str = "url",
                     id_col: str = "doc_id"):
    """Registered-domain blocklist filter (spam / adult / pirated-
    content domain lists every crawl pipeline applies before anything
    else): drop rows whose URL's REGISTERED domain (subdomains
    collapse: ``blog.site7.com`` matches a ``site7.com`` entry) is on
    the list.  → the kept (id_col, domain) rows.

    The blocklist broadcasts into the map as a frozenset — blocklists
    are curated artifacts bounded by human review, not data-scaling
    sets; a data-proportional removal set belongs on the anti-join
    path (``bucketed_join(how='anti')`` / ``salted_lookup_join``)
    instead.  Pure streaming map, corpus passes once."""
    bset = frozenset(blocked)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        doms = [registered_domain(url_host(u)) for u in b[url_col]]
        mask = np.fromiter((d not in bset for d in doms), bool, len(doms))
        out = b.loc[mask, [id_col]].copy()
        out["domain"] = [d for d, m in zip(doms, mask) if m]
        return out

    return ds.map_batches(keep, batch_format="pandas")


def synthetic_urls(docs, id_col: str = "doc_id"):
    """Deterministic messy URL per int64 doc id — SQL-twinned:
    ``synthetic_urls_sql`` derives the CLEAN canonical form from the
    same id arithmetic (the oracle never parses a URL, so the parser
    is checked by an independent path).  Messiness by id:

    - scheme https iff id even;
    - host ``site{id % 97}.{tld[id % 5]}``, prefixed ``blog.`` iff
      id % 13 == 0 (so registered domain != host somewhere), then
      ``www.`` iff id % 3 == 0, UPPERCASED iff id % 7 == 0;
    - explicit default port iff id % 11 == 0;
    - path ``/p/{id}``;
    - query: ``utm_source=feed`` leads iff id % 2 == 0, and params
      ``b={id % 7}&a={id % 13}`` arrive b-first (canonical sorts them
      a-first) iff id % 4 == 0;
    - fragment ``#sec{id % 3}`` iff id % 5 == 0.
    """

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(dtype=np.int64)
        urls = []
        for i in ids:
            i = int(i)
            scheme = "https" if i % 2 == 0 else "http"
            host = f"site{i % 97}.{_TLDS[i % 5]}"
            if i % 13 == 0:
                host = "blog." + host
            if i % 3 == 0:
                host = "www." + host
            if i % 7 == 0:
                host = host.upper()
            port = (":443" if scheme == "https" else ":80") \
                if i % 11 == 0 else ""
            qs = []
            if i % 2 == 0:
                qs.append("utm_source=feed")
            if i % 4 == 0:
                qs.extend([f"b={i % 7}", f"a={i % 13}"])
            query = "?" + "&".join(qs) if qs else ""
            frag = f"#sec{i % 3}" if i % 5 == 0 else ""
            urls.append(f"{scheme}://{host}{port}/p/{i}{query}{frag}")
        return b.assign(url=urls)   # other columns pass through

    return docs.map_batches(gen, batch_format="pandas")


def synthetic_urls_sql(table: str, id_col: str) -> str:
    """DuckDB CTE body: (doc_id, url_norm, host, domain) — the CLEAN
    form derived straight from id arithmetic (no parsing)."""
    tld = (f"CASE {id_col} % 5 "
           + " ".join(f"WHEN {j} THEN '{t}'"
                      for j, t in enumerate(_TLDS))
           + " END")
    return f"""
        SELECT {id_col},
               (CASE WHEN {id_col} % 2 = 0 THEN 'https' ELSE 'http' END)
                 || '://' || h || '/p/' || {id_col}
                 || CASE WHEN {id_col} % 4 = 0
                         THEN '?a=' || ({id_col} % 13)
                              || '&b=' || ({id_col} % 7)
                         ELSE '' END AS url_norm,
               h AS host,
               d AS domain
        FROM (SELECT {id_col},
                     CASE WHEN {id_col} % 13 = 0
                          THEN 'blog.' || d ELSE d END AS h,
                     d
              FROM (SELECT {id_col},
                           'site' || ({id_col} % 97) || '.' || {tld}
                             AS d
                    FROM {table}))"""
