"""automatic_reference_extractor_ray — a Ray-Data-native rebuild of the
LOC-DB automatic-reference-extractor.

From-scratch engine (NOT a port): the reference system
(/root/reference, LOCDB-V3 generation) is a document-at-a-time Flask/RQ/
multiprocessing pipeline that locates bibliographic-reference regions in
scanned pages / HTML / XML / text documents, segments them into
individual references, tokenizes citation fields, and emits one ordered
record sequence per document.  This package re-expresses every operator
in that system (SURVEY.md §2) as streaming ``ray.data.Dataset``
transforms over zero-copy Arrow batches:

- stateless per-batch maps for routing, markup extraction, segmentation
  and field tokenization (``stages/``),
- actor pools for the stateful OCR/layout stage (``stages/ocr.py``),
- exactly one all-to-all shuffle: the per-document re-stitch
  ``groupby("doc_id")`` (``stages/stitch.py``),
- partitioned, lineage-tracked, resumable output (``state/lineage.py``),
- plus the large-scale training-data operators (dedup families, ANN
  search, text analysis, multimodal plumbing) under ``ops/``.

Layout:
    functions/   pure semantic kernels (no Ray) — unit-test pinned
    sources/     corpus synthesis + media store + readers
    stages/      Ray Data stage functions / actor classes
    pipelines/   end-to-end pipeline composition
    state/       lineage, resume, metrics
    ops/         beyond-reference large-scale data ops
"""

__version__ = "0.1.0"

# Lazy top-level API (PEP 562): the flagship pipeline plus every
# operator a pipeline author composes, importable as
# ``from automatic_reference_extractor_ray import extract_refs, exact_dedup, ...`` without
# paying submodule import cost at package load (Ray actor cold-start
# deserializes this package in every worker process).
_EXPORTS = {
    # flagship + pipelines
    "extract_refs": "pipelines.extract",
    "curate_corpus": "pipelines.curate",
    # dedup family
    "exact_dedup": "ops.dedup",
    "incremental_dedup": "ops.dedup",
    "jaccard_pairs": "ops.dedup",
    "minhash_lsh_pairs": "ops.dedup",
    "simhash_pairs": "ops.dedup",
    "embedding_dup_pairs": "ops.dedup",
    "embedding_dup_pairs_lsh": "ops.dedup",
    "semantic_dedup": "ops.dedup",
    "dedup_components": "ops.dedup",
    "dedup_corpus": "ops.dedup",
    "grouped_pair_join": "ops.dedup",
    # ANN
    "brute_force_topk": "ops.ann",
    "lsh_topk": "ops.ann",
    "ivf_topk": "ops.ann",
    "pq_topk": "ops.ann",
    "pq_fit": "ops.ann",
    "pq_encode": "ops.ann",
    "pq_search": "ops.ann",
    "ivf_fit": "ops.ann",
    "ivfpq_encode": "ops.ann",
    "ivfpq_search": "ops.ann",
    "ivfpq_topk": "ops.ann",
    "rerank_topk": "ops.ann",
    # text analysis / curation
    "token_counts": "ops.textstats",
    "quality_metrics": "ops.textstats",
    "quality_filter": "ops.textstats",
    "lang_guess": "ops.textstats",
    "fingerprint": "ops.textstats",
    "normalize_text": "ops.textstats",
    "scrub_text": "ops.textstats",
    "scrub_dup_lines": "ops.textstats",
    "scrub_dup_windows": "ops.textstats",
    "duplicated_passages": "ops.textstats",
    "dup_gram_fraction": "ops.textstats",
    "decontaminate": "ops.textstats",
    "decontaminate_bloom": "ops.textstats",
    "contamination_report": "ops.textstats",
    "collapse_repeated_lines": "ops.textstats",
    "chunk_documents": "ops.textstats",
    "pack_sequences": "ops.textstats",
    "repetition_metrics": "ops.textstats",
    # corpus index + LM scoring
    "build_postings": "ops.postings",
    "fit_bigram_lm": "ops.lm",
    "lm_score": "ops.lm",
    # subword tokenizer training
    "fit_bpe": "ops.bpe",
    "bpe_tokenize": "ops.bpe",
    "token_spectrum": "ops.analytics",
    "collocations": "ops.analytics",
    # session-6 additions
    "dup_cluster_sizes": "ops.dedup",
    "events_trend": "ops.relational",
    "ref_line_classifier": "ops.lineclf",
    "fit_ref_line_model": "ops.lineclf",
    "score_ref_lines": "ops.lineclf",
    "audio_features": "ops.audio",
    "wav_features": "ops.audio",
    # graph
    "pagerank": "ops.graph",
    "synthetic_link_edges": "ops.graph",
    # main-content extraction (HTML boilerplate strip)
    "extract_main_content": "ops.webextract",
    "extract_main_dataset": "ops.webextract",
    "revenue_rollup": "ops.relational",
    "percent_rank": "ops.analytics",
    "corpus_diff": "ops.diff",
    "profile_table": "ops.profile",
    "extract_json_field": "ops.jsonkit",
    "weighted_sample_exact": "ops.analytics",
    "stratified_split": "ops.analytics",
    "compression_metrics": "ops.textstats",
    "curate_web_corpus": "pipelines.webcurate",
    "confusion_matrix": "ops.analytics",
    "large_volume_customers": "ops.relational",
    "returned_item_report": "ops.relational",
    "parts_supplier_counts": "ops.relational",
    "global_prospects": "ops.relational",
    "local_supplier_volume": "ops.relational",
    "promo_revenue_share": "ops.relational",
    "build_lsh_index": "state.lsh_index",
    "incremental_minhash_dedup": "state.lsh_index",
    "read_docs_jsonl": "sources.readers",
    "read_docs_csv": "sources.readers",
    "write_docs_jsonl": "sources.readers",
    "node_degrees": "ops.graph",
    "events_pivot": "ops.relational",
    "user_journeys": "ops.relational",
    # URL canonicalization + domain bookkeeping
    "normalize_url": "ops.weburl",
    "normalize_urls": "ops.weburl",
    "registered_domain": "ops.weburl",
    "domain_counts": "ops.weburl",
    "domain_cap": "ops.weburl",
    "url_dedup": "ops.weburl",
    "blocklist_filter": "ops.weburl",
    "merge_corpora": "ops.dedup",
    "decontaminate_fuzzy": "ops.dedup",
    # linear quality classifier (bounded-sample fit, corpus scoring)
    "fit_logreg": "ops.classifier",
    "logreg_score": "ops.classifier",
    "quality_classifier": "ops.classifier",
    # analytics / sampling
    "grouped_distinct_count": "ops.analytics",
    "grouped_quantiles": "ops.analytics",
    "value_histogram": "ops.analytics",
    "approx_quantiles": "ops.analytics",
    "approx_distinct": "ops.analytics",
    "grouped_approx_distinct": "ops.analytics",
    "topk_tokens": "ops.analytics",
    "approx_topk_tokens": "ops.analytics",
    "topk_tokens_per_group": "ops.analytics",
    "top_per_group": "ops.analytics",
    "hash_split": "ops.analytics",
    "mixture_sample": "ops.analytics",
    "temperature_sample": "ops.analytics",
    "weighted_sample": "ops.analytics",
    "sample_per_group": "ops.analytics",
    "exact_sample": "ops.analytics",
    "quantile_clip": "ops.analytics",
    "grouped_outliers": "ops.analytics",
    "distribution_match": "ops.analytics",
    "global_rank": "ops.analytics",
    "shuffle_rank": "ops.analytics",
    "kmeans": "ops.analytics",
    "kmeans_fit": "ops.analytics",
    "tfidf_top_terms": "ops.analytics",
    # shuffle primitives
    "bucketed_groupby": "ops.shuffle",
    "bucketed_agg": "ops.shuffle",
    "bucketed_distinct": "ops.shuffle",
    "bucketed_join": "ops.shuffle",
    "salted_lookup_join": "ops.shuffle",
    "coalesce_blocks": "ops.shuffle",
    "auto_num_buckets": "ops.shuffle",
    # stages / state
    "stitch_records": "stages.stitch",
    "latest_version_filter": "stages.dedup_version",
    "run_resumable_extract": "state.lineage",
}

__all__ = sorted(_EXPORTS) + ["__version__"]

# Install the two-message benign Ray Data log filter at package import
# so it reaches WORKER processes too (a worker that unpickles any of
# this package's map functions imports the package first — the only
# hook available here, since worker_process_setup_hook needs the
# absent ray[default] runtime-env agent).  The filter drops exactly
# the two investigated-benign empty-block messages and nothing else
# (see logquiet.py); stdlib-only, no Ray import at package import.
from .logquiet import install_benign_log_filters as _arx_lq  # noqa: E402

_arx_lq()


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}")
    import importlib
    return getattr(importlib.import_module(f".{mod}", __name__), name)


def __dir__():
    return __all__
