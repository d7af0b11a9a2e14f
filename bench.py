"""Benchmark harness.

Default: run the headline extraction pipeline + secondary op pipelines
over $GRAFT_SF_DIR (default /root/testdata/sf0.1) under
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and print ONE JSON line:

  {"metric": "e2e_extract_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs": n, "refs": n, "docs_per_sec": ..., "refs_per_sec": ...}

--scaling: run the headline pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input and report both plus the
scaling efficiency (T8/T32)/(32/8)  — the sandbox stand-in for the
N-vs-4N-node criterion (BASELINE.md).

--scaling --protocol: the idle-host measurement protocol (round-3
VERDICT task 3): a 1-min load-average guard (< $ARX_BENCH_LOAD_GUARD,
default 0.5, bounded wait) runs before EVERY leg, legs alternate in a
FIXED 8,32,8,32,... order for $ARX_BENCH_SAMPLES (default 3) rounds,
and the efficiency is computed from the MEDIAN of each side's legs —
no leg is discarded, every leg and its pre-leg load ships in the JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("ARX_BENCH_REPEAT", "1"))


def warm_page_cache():
    for name in os.listdir(SF_DIR):
        with open(os.path.join(SF_DIR, name), "rb") as f:
            while f.read(1 << 22):
                pass


def run_bench() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import logging
    # the streaming executor warns on every empty pandas block ("new
    # schema: names=[]") — cosmetic, and at bench scale it floods the
    # log.  setLevel on the parent doesn't take (Ray pins explicit
    # levels on the child loggers), so attach targeted filters to the
    # emitting loggers — they drop ONLY the two benign message shapes
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    from automatic_reference_extractor_ray.pipelines.extract import extract_refs
    from automatic_reference_extractor_ray.sources.interleave import (
        read_interleaved_docs_cached)

    warm_page_cache()
    n_docs = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows * REPEAT

    # materialize the synthetic corpus once (parquet cache) — the
    # benchmark measures the ENGINE reading its corpus, not the
    # procedural generator re-expanding spans inside the first stage
    read_interleaved_docs_cached(SF_DIR, repeat=REPEAT).count()

    # ---- headline: end-to-end extraction --------------------------------
    t0 = time.perf_counter()
    refs = extract_refs(
        read_interleaved_docs_cached(SF_DIR, repeat=REPEAT),
        version_ids=read_interleaved_docs_cached(SF_DIR, repeat=REPEAT,
                                                 columns=["doc_id"]))
    n_refs = refs.count()
    headline = time.perf_counter() - t0

    # ---- secondary pipelines -------------------------------------------
    queries: dict[str, float] = {}
    headline_only = os.environ.get("ARX_BENCH_HEADLINE_ONLY") == "1"

    def timed(name, fn):
        t = time.perf_counter()
        fn()
        queries[name] = round(time.perf_counter() - t, 3)

    import ray.data as rd

    from automatic_reference_extractor_ray.ops.ann import brute_force_topk
    from automatic_reference_extractor_ray.ops.dedup import (
        embedding_dup_pairs_lsh, exact_dedup, minhash_lsh_pairs,
        simhash_pairs)
    from automatic_reference_extractor_ray.ops.relational import (
        events_hourly, events_sessions, q1_pricing_summary,
        top_customers_by_revenue)
    from automatic_reference_extractor_ray.ops.textstats import (
        quality_metrics, token_counts)

    def read(t, cols=None):
        from automatic_reference_extractor_ray.sources.readers import (
            read_parquet_clean)
        return read_parquet_clean(f"{SF_DIR}/{t}.parquet", columns=cols)

    if headline_only:
        result = {
            "metric": "e2e_extract_sec", "value": round(headline, 3),
            "unit": "sec", "queries": {}, "sf": SF_DIR, "num_cpus": NUM_CPUS,
            "docs": int(n_docs), "refs": int(n_refs),
            "docs_per_sec": round(n_docs / headline, 2),
            "refs_per_sec": round(n_refs / headline, 2),
        }
        ray.shutdown()
        return result

    timed("q1_pricing", lambda: q1_pricing_summary(
        read("lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                          "l_extendedprice", "l_discount"])).to_pandas())
    timed("top_customers", lambda: top_customers_by_revenue(
        read("orders", ["o_custkey", "o_totalprice"]),
        read("customer", ["c_custkey", "c_name"])))
    timed("events_hourly", lambda: events_hourly(
        read("events", ["event_type", "ts", "value"])).to_pandas())
    timed("events_sessions", lambda: events_sessions(
        read("events", ["user_id", "ts", "event_id"])).count())
    from automatic_reference_extractor_ray.ops.relational import (
        events_asof_orders, events_sliding)
    timed("events_asof", lambda: events_asof_orders(
        read("events", ["user_id", "ts", "event_id"]),
        read("orders", ["o_custkey", "o_orderdate", "o_orderkey"])).count())
    timed("events_sliding", lambda: events_sliding(
        read("events", ["event_type", "ts", "value"])).count())
    from automatic_reference_extractor_ray.ops.textstats import (
        duplicated_passages)
    timed("dup_passages", lambda: duplicated_passages(
        read("documents", ["doc_id", "text"])).count())
    from automatic_reference_extractor_ray.ops.relational import (
        funnel_counts, retention_cohorts, revenue_by_nation)
    timed("events_funnel", lambda: funnel_counts(
        read("events", ["user_id", "ts", "event_type", "event_id"])))
    timed("events_retention", lambda: retention_cohorts(
        read("events", ["user_id", "ts", "event_type"])).count())
    timed("revenue_by_nation", lambda: revenue_by_nation(
        read("orders", ["o_custkey", "o_totalprice"]),
        read("customer", ["c_custkey", "c_nationkey"]),
        read("nation", ["n_nationkey", "n_name"])).count())
    from automatic_reference_extractor_ray.ops.relational import (
        shipping_priority)
    timed("q3_shipping", lambda: len(shipping_priority(
        read("customer", ["c_custkey", "c_mktsegment"]),
        read("orders", ["o_orderkey", "o_custkey", "o_orderdate",
                        "o_orderpriority"]),
        read("lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice",
                          "l_discount"]))))
    from automatic_reference_extractor_ray.ops.relational import (
        large_volume_customers)
    from automatic_reference_extractor_ray.ops.dedup import (
        decontaminate_fuzzy)

    def _decon_fuzzy():
        docs = read("documents", ["doc_id", "text"])
        train = docs.map_batches(lambda b: b[b["doc_id"] % 10 <= 7],
                                 batch_format="pandas")
        evald = docs.map_batches(lambda b: b[b["doc_id"] % 10 >= 8],
                                 batch_format="pandas")
        return decontaminate_fuzzy(train, evald, tau=0.9).count()
    timed("decontaminate_fuzzy", _decon_fuzzy)
    from automatic_reference_extractor_ray.state.lsh_index import (
        build_lsh_index, incremental_minhash_dedup)

    def _lsh_incremental():
        import pandas as _pd
        docs = read("documents", ["doc_id", "text"])
        base = docs.map_batches(lambda b: b[b["doc_id"] % 10 < 7],
                                batch_format="pandas")
        inc = docs.map_batches(lambda b: b[b["doc_id"] % 10 >= 7],
                               batch_format="pandas")
        idx = "/tmp/arx_lsh/bench"
        os.makedirs("/tmp/arx_lsh", exist_ok=True)
        build_lsh_index(base, idx, num_parts=16)
        return len(incremental_minhash_dedup(inc, idx).to_pandas())
    timed("dedup_lsh_incremental", _lsh_incremental)
    from automatic_reference_extractor_ray.ops.relational import (
        promo_revenue_share)
    timed("q14_promo", lambda: len(promo_revenue_share(
        read("lineitem", ["l_partkey", "l_shipdate",
                          "l_extendedprice", "l_discount"]),
        read("part", ["p_partkey", "p_type"]))))
    from automatic_reference_extractor_ray.ops.relational import (
        local_supplier_volume)
    timed("q5_local_supplier", lambda: len(local_supplier_volume(
        read("customer", ["c_custkey", "c_nationkey"]),
        read("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        read("lineitem", ["l_orderkey", "l_suppkey",
                          "l_extendedprice", "l_discount"]),
        read("supplier", ["s_suppkey", "s_nationkey"]),
        read("nation", ["n_nationkey", "n_name", "n_regionkey"]),
        read("region", ["r_regionkey", "r_name"]))))
    timed("q18_volume", lambda: len(large_volume_customers(
        read("customer", ["c_custkey", "c_name"]),
        read("orders", ["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"]),
        read("lineitem", ["l_orderkey", "l_quantity"]))))
    from automatic_reference_extractor_ray.ops.relational import (
        user_window_functions)
    timed("events_window", lambda: user_window_functions(
        read("events", ["user_id", "ts", "event_id", "value"])).count())
    from automatic_reference_extractor_ray.ops.relational import (
        bloom_semi_join)

    def _bloom_semi():
        import pandas as _pd
        events = read("events", ["event_id", "user_id"])
        keys = read("customer", ["c_custkey", "c_acctbal"]).map_batches(
            lambda b: _pd.DataFrame({
                "user_id": b.loc[b["c_acctbal"] > 8000.0,
                                 "c_custkey"].astype("int64")}),
            batch_format="pandas")
        return bloom_semi_join(
            events, keys, on="user_id",
            left_schema={"event_id": "int64", "user_id": "int64"},
            right_schema={"user_id": "int64"}, how="semi").count()
    timed("events_high_balance", _bloom_semi)
    from automatic_reference_extractor_ray.ops.analytics import (
        weighted_sample)
    timed("weighted_sample", lambda: weighted_sample(
        read("documents", ["doc_id", "n_chars"]),
        "doc_id", "n_chars", scale=1000).count())
    timed("token_quality", lambda: read("documents", ["doc_id", "text"])
          .map_batches(quality_metrics, batch_format="pyarrow").count())
    from automatic_reference_extractor_ray.ops.textstats import (
        chunk_documents, scrub_text)
    timed("scrub_text", lambda: read("documents", ["doc_id", "text"])
          .map_batches(scrub_text, batch_format="pyarrow").count())
    timed("chunk_docs", lambda: read("documents", ["doc_id", "text"])
          .map_batches(chunk_documents, batch_format="pandas").count())
    from automatic_reference_extractor_ray.ops.textstats import pack_sequences
    timed("pack_sequences", lambda: pack_sequences(
        read("documents", ["doc_id", "text"])).count())
    from automatic_reference_extractor_ray.ops.analytics import (
        events_range_join_counts, grouped_distinct_count, grouped_quantiles,
        hash_split, topk_tokens)
    timed("distinct_users", lambda: grouped_distinct_count(
        read("events", ["event_type", "user_id"]),
        "event_type", "user_id").count())
    timed("value_quantiles", lambda: grouped_quantiles(
        read("events", ["event_type", "value"]),
        "event_type", "value").count())
    timed("hash_split", lambda: hash_split(
        read("documents", ["doc_id"]), "doc_id").count())
    timed("topk_tokens", lambda: topk_tokens(
        read("documents", ["doc_id", "text"]), k=50))
    from automatic_reference_extractor_ray.ops.analytics import (
        approx_topk_tokens, global_rank, grouped_approx_distinct,
        quantile_clip, topk_tokens_per_group)
    from automatic_reference_extractor_ray.ops.textstats import (
        normalize_text)
    timed("normalize_text", lambda: read("documents", ["doc_id", "text"])
          .map_batches(normalize_text, batch_format="pandas").count())
    timed("approx_topk_tokens", lambda: approx_topk_tokens(
        read("documents", ["doc_id", "text"]), k=50))
    timed("length_clip", lambda: quantile_clip(
        read("documents", ["doc_id", "lang", "n_chars"]),
        key="lang", col="n_chars").count())
    timed("topk_tokens_per_lang", lambda: topk_tokens_per_group(
        read("documents", ["doc_id", "lang", "text"]),
        group_col="lang", k=10).count())
    timed("approx_distinct_grouped", lambda: grouped_approx_distinct(
        read("events", ["event_type", "user_id"]),
        "event_type", "user_id").count())
    timed("doc_rank", lambda: global_rank(
        read("documents", ["doc_id", "n_chars"]),
        value_col="n_chars", id_col="doc_id", descending=True).count())
    timed("events_range_join", lambda: events_range_join_counts(
        read("events", ["event_id", "user_id", "ts"])).count())
    from automatic_reference_extractor_ray.ops.analytics import top_per_group
    from automatic_reference_extractor_ray.ops.textstats import decontaminate
    timed("decontaminate", lambda: decontaminate(
        read("documents", ["doc_id", "text"]), n=4).count())
    from automatic_reference_extractor_ray.ops.textstats import (
        decontaminate_bloom)
    timed("decontaminate_bloom", lambda: decontaminate_bloom(
        read("documents", ["doc_id", "text"]), n=4).count())
    timed("top_per_lang", lambda: top_per_group(
        read("documents", ["doc_id", "lang", "n_chars"]),
        "lang", "n_chars", "doc_id", k=3).count())
    from automatic_reference_extractor_ray.pipelines.curate import (
        curate_corpus)
    timed("curate_corpus", lambda: curate_corpus(
        read("documents", ["doc_id", "text", "lang"])).count())
    from automatic_reference_extractor_ray.ops.analytics import (
        tfidf_top_terms)
    timed("tfidf_terms", lambda: tfidf_top_terms(
        read("documents", ["doc_id", "text"]), k=5).count())
    timed("dedup_exact", lambda: exact_dedup(
        read("documents", ["doc_id", "text"])).count())
    from automatic_reference_extractor_ray.ops.dedup import incremental_dedup

    def _inc_dedup():
        docs = read("documents", ["doc_id", "text"])
        base = docs.map_batches(lambda d: d[(d["doc_id"] % 10) < 7],
                                batch_format="pandas")
        new = docs.map_batches(lambda d: d[(d["doc_id"] % 10) >= 7],
                               batch_format="pandas")
        return incremental_dedup(base, new).count()
    timed("dedup_incremental", _inc_dedup)
    timed("dedup_minhash", lambda: minhash_lsh_pairs(
        read("documents", ["doc_id", "text"])).count())
    timed("dedup_simhash", lambda: simhash_pairs(
        read("documents", ["doc_id", "text"])).count())
    timed("dedup_emb_lsh", lambda: embedding_dup_pairs_lsh(
        read("embeddings", ["vec_id", "embedding"])).count())
    timed("ann_topk", lambda: brute_force_topk(
        read("embeddings", ["vec_id", "embedding"]), [0, 1, 2, 3, 4, 5, 6, 7]).count())
    from automatic_reference_extractor_ray.ops.ann import pq_topk
    timed("ann_pq", lambda: pq_topk(
        read("embeddings", ["vec_id", "embedding"]), [0, 1, 2, 3, 4, 5, 6, 7]).count())
    from automatic_reference_extractor_ray.ops.ann import ivfpq_topk
    timed("ann_ivfpq", lambda: ivfpq_topk(
        read("embeddings", ["vec_id", "embedding"]), [0, 1, 2, 3, 4, 5, 6, 7],
        n_probe=8, m_sub=32).count())
    from automatic_reference_extractor_ray.ops.dedup import semantic_dedup
    timed("semantic_dedup", lambda: semantic_dedup(
        read("embeddings", ["vec_id", "embedding"]), k=8, n_iter=5).count())
    from automatic_reference_extractor_ray.ops.analytics import (
        exact_sample, shuffle_rank)
    from automatic_reference_extractor_ray.ops.textstats import (
        dup_gram_fraction, scrub_dup_lines, scrub_dup_windows)
    timed("scrub_dup_lines", lambda: scrub_dup_lines(
        read("documents", ["doc_id", "text"])).count())
    timed("scrub_dup_windows", lambda: scrub_dup_windows(
        read("documents", ["doc_id", "text"])).count())
    timed("dup_gram_fraction", lambda: dup_gram_fraction(
        read("documents", ["doc_id", "text"])).count())
    timed("exact_sample", lambda: exact_sample(
        read("documents", ["doc_id"]), "doc_id", n=500).count())
    timed("shuffle_rank", lambda: shuffle_rank(
        read("documents", ["doc_id"]), "doc_id").count())
    from automatic_reference_extractor_ray.ops.lm import (
        fit_bigram_lm, lm_score)
    from automatic_reference_extractor_ray.ops.postings import build_postings
    timed("build_postings", lambda: build_postings(
        read("documents", ["doc_id", "text"])).count())
    timed("lm_score", lambda: lm_score(
        read("documents", ["doc_id", "text"]),
        fit_bigram_lm(read("documents", ["doc_id", "text"]))).count())
    from automatic_reference_extractor_ray.ops.postings import bm25_topk
    timed("bm25_search", lambda: len(bm25_topk(
        read("documents", ["doc_id", "text"]),
        ["merge", "spark", "window"], k=10)))
    from automatic_reference_extractor_ray.ops.dsir import dsir_select

    def _dsir():
        from automatic_reference_extractor_ray.ops.shuffle import (
            typed_empty_if_blank)
        raw = read("documents", ["doc_id", "text", "lang"])
        target = raw.map_batches(
            lambda b: typed_empty_if_blank(b[b["lang"] == "zh"]),
            batch_format="pandas")
        return len(dsir_select(raw, target, k=100, n_buckets=4096))
    timed("dsir_select", _dsir)
    from automatic_reference_extractor_ray.ops.analytics import (
        value_histogram)
    timed("events_histogram", lambda: len(value_histogram(
        read("events", ["value"]), "value", 0.0, 500.0, 25)))
    from automatic_reference_extractor_ray.ops.graph import (
        pagerank, quantize_rank, synthetic_link_edges)

    def _pagerank():
        nodes = read("documents", ["doc_id"]).map_batches(
            lambda b: b.rename(columns={"doc_id": "node"}),
            batch_format="pandas")
        n = read("documents", ["doc_id"]).count()
        return len(quantize_rank(pagerank(
            nodes, synthetic_link_edges(nodes, n), n, n_iter=5).to_pandas()))
    timed("pagerank", _pagerank)
    from automatic_reference_extractor_ray.ops.graph import node_degrees

    def _node_degrees():
        nodes = read("documents", ["doc_id"]).map_batches(
            lambda b: b.rename(columns={"doc_id": "node"}),
            batch_format="pandas")
        n = read("documents", ["doc_id"]).count()
        return node_degrees(synthetic_link_edges(nodes, n)).count()
    timed("node_degrees", _node_degrees)
    from automatic_reference_extractor_ray.ops.webextract import (
        extract_main_dataset)
    from automatic_reference_extractor_ray.sources.webgen import (
        write_web_tables)

    def _main_content():
        from automatic_reference_extractor_ray.sources.readers import (
            read_parquet_clean)
        d = write_web_tables(SF_DIR)
        return extract_main_dataset(
            read_parquet_clean(f"{d}/pages.parquet")).count()
    timed("main_content", _main_content)
    from automatic_reference_extractor_ray.pipelines.webcurate import (
        curate_web_corpus)

    def _curate_web():
        from automatic_reference_extractor_ray.sources.readers import (
            read_parquet_clean)
        d = write_web_tables(SF_DIR)
        return curate_web_corpus(
            read_parquet_clean(f"{d}/pages.parquet")).count()
    timed("curate_web", _curate_web)
    from automatic_reference_extractor_ray.ops.classifier import (
        quality_classifier as _qc)

    def _quality_classifier():
        labeled = read("documents", ["doc_id", "text", "lang"]).map_batches(
            lambda b: b.assign(label=(b["lang"] == "en").astype("int64"))
            [["doc_id", "text", "label"]],
            batch_format="pandas")
        return _qc(labeled, "label", fit_sample=2048).count()
    timed("quality_classifier", _quality_classifier)

    def _collocations():
        from automatic_reference_extractor_ray.ops.analytics import (
            collocations)
        return len(collocations(read("documents", ["doc_id", "text"]),
                                k=50, min_count=5))
    timed("collocations", _collocations)

    def _ref_line_classifier():
        from automatic_reference_extractor_ray.config import DEFAULT_CONFIG
        from automatic_reference_extractor_ray.ops.lineclf import (
            ref_line_classifier)
        from automatic_reference_extractor_ray.stages.explode import (
            explode_to_units)
        units = read_interleaved_docs_cached(SF_DIR).map_batches(
            lambda b: explode_to_units(b, DEFAULT_CONFIG),
            batch_format="pyarrow")
        return ref_line_classifier(units, fit_sample=2048).count()
    timed("ref_line_classifier", _ref_line_classifier)
    from automatic_reference_extractor_ray.ops.relational import (
        revenue_rollup)
    from automatic_reference_extractor_ray.ops.analytics import (
        confusion_matrix)
    from automatic_reference_extractor_ray.ops.textstats import (
        lang_guess)

    def _lang_confusion():
        docs = read("documents", ["doc_id", "text", "lang"])
        preds = docs.map_batches(
            lambda b: b.assign(
                lang_guess=lang_guess(b[["doc_id", "text"]])
                ["lang_guess"].to_numpy())[["lang", "lang_guess"]],
            batch_format="pandas")
        return len(confusion_matrix(preds, "lang", "lang_guess"))
    timed("lang_confusion", _lang_confusion)
    from automatic_reference_extractor_ray.ops.textstats import (
        compression_metrics)
    timed("compression_metrics", lambda: read(
        "documents", ["doc_id", "text"]).map_batches(
        compression_metrics, batch_format="pandas").count())
    from automatic_reference_extractor_ray.ops.analytics import (
        stratified_split)
    timed("stratified_split", lambda: stratified_split(
        read("documents", ["doc_id", "lang"]),
        "lang", "doc_id", n_val=10, n_test=15).count())
    from automatic_reference_extractor_ray.ops.dedup import merge_corpora

    def _merge_corpora():
        docs = read("documents", ["doc_id", "text"])
        c0 = docs.map_batches(lambda b: b[b["doc_id"] % 3 == 0],
                              batch_format="pandas")
        c1 = docs.map_batches(lambda b: b[b["doc_id"] % 2 == 0],
                              batch_format="pandas")
        return merge_corpora([c0, c1, docs]).count()
    timed("merge_corpora", _merge_corpora)
    from automatic_reference_extractor_ray.ops.analytics import (
        weighted_sample_exact)
    timed("weighted_sample_exact", lambda: weighted_sample_exact(
        read("documents", ["doc_id", "n_chars"]),
        "doc_id", "n_chars", k=100).count())
    from automatic_reference_extractor_ray.ops.jsonkit import (
        extract_json_field)
    timed("events_json_sum", lambda: extract_json_field(
        read("events", ["event_type", "props"]),
        "props", "k").count())
    from automatic_reference_extractor_ray.ops.relational import (
        events_pivot, user_journeys)
    timed("events_pivot", lambda: len(events_pivot(
        read("events", ["event_type", "ts"]))))
    timed("user_journeys", lambda: user_journeys(
        read("events", ["user_id", "ts", "event_id",
                        "event_type"])).count())
    from automatic_reference_extractor_ray.ops.profile import (
        profile_table)
    timed("profile_events", lambda: len(profile_table(
        read("events", ["event_id", "user_id", "event_type", "value",
                        "props"]))))
    from automatic_reference_extractor_ray.ops.diff import corpus_diff

    def _corpus_diff():
        docs = read("documents", ["doc_id", "text"])
        old = docs.map_batches(
            lambda b: b[b["doc_id"] % 10 <= 7], batch_format="pandas")
        new = docs.map_batches(
            lambda b: b[b["doc_id"] % 10 >= 2].assign(
                text=lambda d: d["text"].where(
                    d["doc_id"] % 5 != 0, d["text"] + " v2")),
            batch_format="pandas")
        return corpus_diff(old, new).count()
    timed("corpus_diff", _corpus_diff)
    from automatic_reference_extractor_ray.ops.weburl import (
        domain_cap, domain_counts, normalize_urls, synthetic_urls)
    timed("url_normalize", lambda: normalize_urls(
        synthetic_urls(read("documents", ["doc_id"]))).count())
    timed("domain_counts", lambda: domain_counts(
        synthetic_urls(read("documents", ["doc_id"]))).count())
    timed("domain_cap", lambda: domain_cap(
        synthetic_urls(read("documents", ["doc_id"])), k=3).count())
    from automatic_reference_extractor_ray.ops.weburl import url_dedup
    timed("url_dedup", lambda: url_dedup(synthetic_urls(
        read("documents", ["doc_id"]).map_batches(
            lambda b: b.assign(gid=b["doc_id"] % 250),
            batch_format="pandas"), id_col="gid")).count())
    from automatic_reference_extractor_ray.ops.analytics import (
        percent_rank)
    timed("doc_percentile", lambda: percent_rank(
        read("documents", ["doc_id", "n_chars"]),
        value_col="n_chars", id_col="doc_id", descending=True).count())
    timed("revenue_rollup", lambda: len(revenue_rollup(
        read("orders", ["o_custkey", "o_orderdate", "o_totalprice"]),
        read("customer", ["c_custkey", "c_nationkey"]),
        read("nation", ["n_nationkey", "n_name"]))))

    result = {
        "metric": "e2e_extract_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": int(n_docs),
        "refs": int(n_refs),
        "docs_per_sec": round(n_docs / headline, 2),
        "refs_per_sec": round(n_refs / headline, 2),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Identical headline job in two fresh processes at num_cpus=8 and
    32 on the same input — the in-sandbox stand-in for the N-vs-4N-node
    criterion.  The corpus is replicated (ARX_BENCH_REPEAT, default 8
    here) so steady-state throughput, not fixed startup (ray.init,
    actor-pool spawn), is what's measured — on a real cluster those
    costs amortize over hours, not seconds.

    ``ARX_BENCH_SAMPLES`` > 1 runs the two legs INTERLEAVED that many
    times and keeps the best of each — host-level noise (shared-tenant
    bursts, CPU-credit throttling) otherwise lands on whichever leg is
    unlucky and corrupts the ratio; best-of-interleaved is the
    standard mitigation.  The start/end load averages ship in the JSON
    so a polluted run is visible."""
    repeat = os.environ.get("ARX_BENCH_REPEAT", "24")
    samples = int(os.environ.get("ARX_BENCH_SAMPLES", "1"))

    def read_steal():
        """(steal ticks, total ticks) from the host's aggregate cpu
        line — hypervisor steal is the one throttle source the load
        average can NOT see, and it's what makes wide legs swing on
        this class of host (measured 9.3% steal during a 32-CPU leg
        that ran 59.8 s vs 39-48 s in a clean window)."""
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            vals = [int(x) for x in parts[1:11]]
            return vals[7], sum(vals)
        except (OSError, ValueError, IndexError):
            return 0, 0

    def run(ncpu: int) -> dict:
        st0, tot0 = read_steal()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   ARX_BENCH_REPEAT=repeat, ARX_BENCH_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        leg = json.loads(out.strip().splitlines()[-1])
        st1, tot1 = read_steal()
        leg["steal_frac"] = (round((st1 - st0) / max(tot1 - tot0, 1), 4)
                            if tot1 > tot0 else None)
        return leg

    lo, hi = 8, 32
    protocol = "--protocol" in sys.argv
    guard = float(os.environ.get("ARX_BENCH_LOAD_GUARD", "0.5"))
    loads: list[float] = []

    def wait_idle() -> float:
        """Protocol load guard: block until the 1-min load average
        drops under the threshold (bounded wait — a busy host is
        reported, not hidden); returns the load seen at leg start."""
        deadline = time.time() + float(
            os.environ.get("ARX_BENCH_GUARD_TIMEOUT_SEC", "600"))
        load = os.getloadavg()[0]
        while load >= guard and time.time() < deadline:
            time.sleep(10)
            load = os.getloadavg()[0]
        loads.append(round(load, 2))
        return load

    load_start = os.getloadavg()[0]
    runs_lo, runs_hi = [], []
    if protocol and samples == 1:
        samples = 3
    for _ in range(samples):
        if protocol:
            wait_idle()
        runs_lo.append(run(lo))
        if protocol:
            wait_idle()
        runs_hi.append(run(hi))
    if protocol:
        import statistics
        med_lo = statistics.median(r["value"] for r in runs_lo)
        med_hi = statistics.median(r["value"] for r in runs_hi)
        eff = (med_lo / med_hi) / (hi / lo)
        return {
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "protocol": "idle-host: load guard < %.2f before each leg, "
                        "fixed 8,32 interleave, median-of-legs, "
                        "no discards" % guard,
            "repeat": int(repeat),
            "samples": samples,
            "legs_8": [r["value"] for r in runs_lo],
            "legs_32": [r["value"] for r in runs_hi],
            "steal_8": [r.get("steal_frac") for r in runs_lo],
            "steal_32": [r.get("steal_frac") for r in runs_hi],
            "loads_at_leg_start": loads,
            "sec_8": med_lo, "sec_32": med_hi,
            "pair_effs": [round((a["value"] / b["value"]) / (hi / lo), 3)
                          for a, b in zip(runs_lo, runs_hi)],
            "docs_per_sec_8": round(
                statistics.median(r["docs_per_sec"] for r in runs_lo), 2),
            "docs_per_sec_32": round(
                statistics.median(r["docs_per_sec"] for r in runs_hi), 2),
            "load_start": round(load_start, 2),
            "load_end": round(os.getloadavg()[0], 2),
            "sf": SF_DIR,
        }
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "repeat": int(repeat),
        "samples": samples,
        # every leg, in run order — throttled legs are visible instead
        # of silently folded into the best-of
        "legs_8": [r["value"] for r in runs_lo],
        "legs_32": [r["value"] for r in runs_hi],
        "steal_8": [r.get("steal_frac") for r in runs_lo],
        "steal_32": [r.get("steal_frac") for r in runs_hi],
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "load_start": round(load_start, 2),
        "load_end": round(os.getloadavg()[0], 2),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
