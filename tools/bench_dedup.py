"""Dedup-family benchmark at replicated scale (default 20k docs /
20k vectors = 4x sf0.1) so the shuffle dominates and signature /
candidate-generation changes are regression-detectable (VERDICT r2
task 10).

Corpus construction: the sf0.1 ``documents`` table is replicated
``--repeat`` times with per-replica id offsets.  Replica 0 is the
original; replicas r >= 1 append 32 per-doc-unique salt tokens to the
text so neither cross-replica nor salted within-replica pairs pass
tau=0.9 — the TRUE pair set stays exactly replica 0's, while token,
signature and candidate volume scale linearly with repeat (what a
shuffle-dominance bench wants; identical clones would instead grow
the pair set quadratically and measure the verifier, not the
shuffle).  Embeddings replicate with id offsets and vectors reused —
clone pairs are verified like any others.

Usage:  python tools/bench_dedup.py [--repeat 4]
Prints one JSON line: per-op seconds + output row counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def replicated_docs(repeat: int):
    import pandas as pd
    import ray.data as rd

    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    base = read_parquet_clean(f"{SF_DIR}/documents.parquet",
                              columns=["doc_id", "text"])
    n_ids = 10_000_000  # sf0.1 ids are < 5e3; a fixed stride keeps ids stable

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for r in range(repeat):
            part = batch.copy()
            part["doc_id"] = part["doc_id"] + r * n_ids
            if r:
                part["text"] = [
                    (t or "") + " " + " ".join(
                        f"r{r}d{d}x{i}" for i in range(32))
                    for d, t in zip(batch["doc_id"], batch["text"])]
            outs.append(part)
        return pd.concat(outs, ignore_index=True)

    return base.map_batches(expand, batch_format="pandas").materialize()


def replicated_embeddings(repeat: int):
    import pandas as pd
    import ray.data as rd

    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    base = read_parquet_clean(f"{SF_DIR}/embeddings.parquet")
    n_ids = 10_000_000

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for r in range(repeat):
            part = batch.copy()
            part["vec_id"] = part["vec_id"] + r * n_ids
            outs.append(part)
        return pd.concat(outs, ignore_index=True)

    return base.map_batches(expand, batch_format="pandas").materialize()


def main() -> None:
    repeat = 4
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from automatic_reference_extractor_ray.ops.dedup import (
        embedding_dup_pairs_lsh, exact_dedup, jaccard_pairs,
        minhash_lsh_pairs, simhash_pairs)
    from automatic_reference_extractor_ray.ops.textstats import (
        decontaminate_bloom)

    docs = replicated_docs(repeat)
    embs = replicated_embeddings(repeat)
    n_docs = docs.count()
    n_vecs = embs.count()

    out: dict[str, dict] = {}

    def timed(name, fn):
        t = time.perf_counter()
        rows = fn()
        out[name] = {"sec": round(time.perf_counter() - t, 3),
                     "rows": int(rows)}

    timed("dedup_exact", lambda: exact_dedup(docs).count())
    timed("dedup_jaccard", lambda: jaccard_pairs(docs).count())
    timed("dedup_minhash", lambda: minhash_lsh_pairs(docs).count())
    timed("dedup_simhash", lambda: simhash_pairs(docs).count())
    timed("dedup_emb_lsh", lambda: embedding_dup_pairs_lsh(embs).count())
    timed("decontaminate_bloom", lambda: decontaminate_bloom(docs).count())
    from automatic_reference_extractor_ray.ops.textstats import (
        scrub_dup_windows)
    # every replica shares replica 0's full text, so each base doc's
    # entire k-window set is corpus-duplicated — the intended worst
    # case: removal volume scales with repeat
    timed("scrub_dup_windows", lambda: scrub_dup_windows(docs).count())
    from automatic_reference_extractor_ray.ops.lm import (
        fit_bigram_lm, lm_score)
    from automatic_reference_extractor_ray.ops.postings import build_postings
    # the salt tokens are per-doc unique hapaxes: min_df=2 drops every
    # one at the bucket, so index size stays the base vocabulary while
    # partial-row volume scales with repeat (the scale stressor)
    timed("build_postings", lambda: build_postings(
        docs, min_df=2).count())
    timed("lm_score", lambda: lm_score(
        docs, fit_bigram_lm(docs)).count())

    print(json.dumps({"metric": "dedup_family_sec", "unit": "sec",
                      "sf": SF_DIR, "num_cpus": NUM_CPUS,
                      "repeat": repeat, "docs": int(n_docs),
                      "vectors": int(n_vecs), "ops": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
