"""Composed web-corpus curation: the end-to-end crawl-to-clean-text
pipeline every web-scale training set runs —

    pages (doc_id, html)
      → main-content extraction (boilerplate strip, ops/webextract)
      → URL dedup (recrawl collapse on the canonical URL, ops/weburl)
      → quality gate (min main-text length, min content blocks)
      → exact content dedup (min doc_id per md5 of the main text)
      → (doc_id, main_text)

Every stage is individually SQL-expressible, so the composed DuckDB
oracle (``curate_web_sql``) mirrors the whole pipeline bit-exact over
the construction-golden web tables — the curate_corpus pattern applied
to the web path.

Scale shape: two bounded-bucket semi joins (URL keepers, content
keepers) are the only exchanges; everything else streams.  HTML bytes
never pass an exchange — main text replaces them in the first map.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..ops.shuffle import bucketed_agg, bucketed_join
from ..ops.weburl import synthetic_urls, url_dedup
from ..ops.webextract import extract_main_dataset

_MAIN_SCHEMA = {"doc_id": "int64", "main_text": "object",
                "n_blocks": "int64"}


def curate_web_corpus(pages, url_slots: int = 250,
                      min_chars: int = 200, min_blocks: int = 2,
                      num_buckets: int | None = None):
    """→ Dataset (doc_id, main_text) of curated pages.  ``url_slots``
    drives the synthetic recrawl map (doc_id % url_slots shares a
    canonical URL); a real deployment passes its own (doc_id, url)
    table into the same stages."""
    main = extract_main_dataset(pages)

    urls = synthetic_urls(
        pages.map_batches(
            lambda b: pd.DataFrame({
                "doc_id": b["doc_id"].astype("int64"),
                "gid": (b["doc_id"] % url_slots).astype("int64")}),
            batch_format="pandas"),
        id_col="gid")
    url_keep = url_dedup(urls).map_batches(
        lambda b: pd.DataFrame({"doc_id": b["keeper"].astype("int64")}),
        batch_format="pandas")
    kept = bucketed_join(
        main, url_keep, on="doc_id",
        left_schema=_MAIN_SCHEMA, right_schema={"doc_id": "int64"},
        num_buckets=num_buckets, how="semi")

    def quality(b: pd.DataFrame) -> pd.DataFrame:
        ln = b["main_text"].str.len()
        return b[(ln >= min_chars) & (b["n_blocks"] >= min_blocks)]

    # q feeds TWO consumers (the content-hash agg and the final semi
    # join); Ray re-executes lazy upstreams per consumer, so without
    # this pin the extract + URL join would run twice (the
    # grouped_pair_join lesson).  Rows are (doc_id, main_text,
    # n_blocks) — the curated-candidate set, spills cleanly.
    q = kept.map_batches(quality, batch_format="pandas").materialize()

    def hash_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(t.encode("utf-8")).hexdigest()
             for t in b["main_text"]]
        g = pd.DataFrame({"h": h, "doc_id": b["doc_id"].to_numpy()})
        return (g.groupby("h", sort=False)["doc_id"].min()
                .reset_index(name="doc_id"))

    content_keep = bucketed_agg(
        q.map_batches(hash_partial, batch_format="pandas"), "h",
        {"doc_id": ("doc_id", "min")}, num_buckets).map_batches(
        lambda b: pd.DataFrame({"doc_id": b["doc_id"].astype("int64")}),
        batch_format="pandas")

    final = bucketed_join(
        q, content_keep, on="doc_id",
        left_schema=_MAIN_SCHEMA, right_schema={"doc_id": "int64"},
        num_buckets=num_buckets, how="semi")
    return final.map_batches(
        lambda b: b[["doc_id", "main_text"]], batch_format="pandas")


def curate_web_sql(golden_main: str, url_slots: int = 250,
                   min_chars: int = 200, min_blocks: int = 2) -> str:
    """Stage-composed DuckDB oracle over the construction-golden main
    table (read_parquet path) + the SQL-twinned URL generator."""
    from ..ops.weburl import synthetic_urls_sql

    gids = (f"(SELECT DISTINCT doc_id % {url_slots} AS gid "
            f"FROM read_parquet('{golden_main}'))")
    urls = synthetic_urls_sql(gids, "gid")
    return f"""
        WITH m AS (SELECT doc_id, main_text, n_blocks
                   FROM read_parquet('{golden_main}')),
        t AS (SELECT doc_id, doc_id % {url_slots} AS gid FROM m),
        u AS (SELECT gid, url_norm FROM ({urls})),
        ukeep AS (SELECT MIN(doc_id) AS doc_id
                  FROM t JOIN u USING (gid) GROUP BY url_norm),
        q AS (SELECT m.* FROM m JOIN ukeep USING (doc_id)
              WHERE LENGTH(main_text) >= {min_chars}
                AND n_blocks >= {min_blocks}),
        ckeep AS (SELECT MIN(doc_id) AS doc_id FROM q
                  GROUP BY md5(main_text))
        SELECT q.doc_id, q.main_text
        FROM q JOIN ckeep USING (doc_id)"""
