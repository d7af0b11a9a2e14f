"""URL canonicalization + domain ops — kernel cases, the SQL-twin
cross-check (oracle derives truth from id arithmetic, never parsing),
and the per-domain cap."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from automatic_reference_extractor_ray.ops.weburl import (
    domain_cap, domain_counts, normalize_url, normalize_urls,
    registered_domain, synthetic_urls, synthetic_urls_sql, url_host)


def test_normalize_url_kernel():
    # scheme/host case, www strip, default port drop
    assert (normalize_url("HTTPS://WWW.Site1.COM:443/p/1")
            == "https://site1.com/p/1")
    # non-default port survives
    assert (normalize_url("http://a.com:8080/x")
            == "http://a.com:8080/x")
    # tracking params drop, the rest sort by name
    assert (normalize_url("http://a.com/x?utm_source=f&b=2&a=1&gclid=z")
            == "http://a.com/x?a=1&b=2")
    # fragment drops; empty path becomes /
    assert normalize_url("http://a.com#frag") == "http://a.com/"
    # all params tracking -> no query at all
    assert (normalize_url("http://a.com/x?utm_a=1&ref=r")
            == "http://a.com/x")
    assert normalize_url("") == ""


def test_registered_domain_suffixes():
    assert registered_domain("site1.com") == "site1.com"
    assert registered_domain("blog.site1.com") == "site1.com"
    assert registered_domain("a.b.site1.co.uk") == "site1.co.uk"
    assert registered_domain("site1.co.uk") == "site1.co.uk"
    assert registered_domain("localhost") == "localhost"
    assert url_host("https://WWW.Blog.Site1.CO.UK/p") == "blog.site1.co.uk"


def test_normalize_urls_matches_sql_twin(ray_session):
    """The parser output equals the oracle's arithmetic derivation for
    every id shape the generator produces (one full cycle of all the
    moduli would be lcm(2,3,4,5,7,11,13) = 60060; 3000 ids cover every
    individual messiness case many times over)."""
    import ray.data as rd
    ids = pd.DataFrame({"doc_id": np.arange(3000, dtype="int64")})
    got = (normalize_urls(synthetic_urls(
               rd.from_pandas(ids).repartition(5)))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", ids)
    exp = (con.sql(synthetic_urls_sql("documents", "doc_id")).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "url_norm", "host", "domain"]],
        exp[["doc_id", "url_norm", "host", "domain"]])


def test_domain_cap_enforces_quota(ray_session):
    import ray.data as rd
    # 40 docs on one hot domain, 2 on another
    urls = ["http://hot.com/p/%d" % i for i in range(40)] + \
           ["http://cold.org/p/%d" % i for i in (100, 101)]
    df = pd.DataFrame({"doc_id": np.arange(42, dtype="int64"),
                       "url": urls})
    out = (domain_cap(rd.from_pandas(df).repartition(4), k=5)
           .to_pandas())
    by_dom = out.groupby("domain").size()
    assert by_dom["hot.com"] == 5          # capped
    assert by_dom["cold.org"] == 2         # under cap keeps all
    # deterministic: same input shuffled -> same keepers
    df2 = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    out2 = (domain_cap(rd.from_pandas(df2).repartition(7), k=5)
            .to_pandas())
    a = out.sort_values(["domain", "doc_id"]).reset_index(drop=True)
    b = out2.sort_values(["domain", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_url_dedup_collapses_variants(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.weburl import url_dedup
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "url": ["http://A.com/x?utm_s=1",      # variants of one page
                "http://www.a.com/x",
                "HTTP://a.com:80/x#frag",
                "http://a.com/y"]})
    out = (url_dedup(rd.from_pandas(df).repartition(2))
           .to_pandas().set_index("url_norm").sort_index())
    assert out.loc["http://a.com/x", "keeper"] == 0
    assert out.loc["http://a.com/x", "n_dups"] == 3
    assert out.loc["http://a.com/y", "n_dups"] == 1


def test_domain_counts_hot_domain(ray_session):
    import ray.data as rd
    urls = (["http://hot.com/p/%d" % i for i in range(30)]
            + ["https://www.cold.org/q"] * 3)
    df = pd.DataFrame({"doc_id": np.arange(33, dtype="int64"),
                       "url": urls})
    out = (domain_counts(rd.from_pandas(df).repartition(6))
           .to_pandas().set_index("domain")["n_docs"])
    assert out["hot.com"] == 30
    assert out["cold.org"] == 3


def test_blocklist_filter_registered_domain_collapse(ray_session):
    import ray.data as rd
    from automatic_reference_extractor_ray.ops.weburl import (
        _TLDS, blocklist_filter, registered_domain, synthetic_urls,
        url_host)
    ids = pd.DataFrame({"doc_id": np.arange(400, dtype="int64")})
    urls = synthetic_urls(rd.from_pandas(ids)).to_pandas()
    blocked = {f"site{m}.{t}" for m in range(5) for t in _TLDS}
    got = (blocklist_filter(rd.from_pandas(urls), blocked).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    doms = urls["url"].map(lambda u: registered_domain(url_host(u)))
    keep = ~doms.isin(blocked)
    exp = (pd.DataFrame({"doc_id": urls.loc[keep, "doc_id"],
                         "domain": doms[keep]})
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # non-degenerate: something dropped, and a subdomain host of a
    # blocked domain (id%13==0 -> blog. prefix) was dropped too
    assert keep.sum() < len(urls)
    sub = urls["doc_id"] % 13 == 0
    sub &= urls["doc_id"] % 97 < 5
    assert sub.any() and not set(urls.loc[sub, "doc_id"]) & set(got["doc_id"])
