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


def _decontam_corpus(n_train: int, n_eval: int, planted: int):
    """Low-self-similarity corpus + planted leakage: every doc is 80
    unique-seeded random tokens from a 50k vocabulary (no accidental
    near-dups at tau=0.8); the first ``planted`` train docs are
    one-token-dropped near-clones of eval docs (J ~ 0.99)."""
    import numpy as np
    import pandas as pd

    def words(seed: int, n: int = 80) -> list[str]:
        rng = np.random.Generator(np.random.PCG64(seed))
        return [f"w{int(x)}" for x in rng.integers(0, 50_000, n)]

    ev = pd.DataFrame({
        "doc_id": np.arange(10_000_000, 10_000_000 + n_eval,
                            dtype="int64"),
        "text": [" ".join(words(7_000_000 + i)) for i in range(n_eval)]})
    rows = []
    for i in range(planted):                     # leaks: eval minus 1 token
        rows.append(" ".join(words(7_000_000 + i)[:-1]))
    for i in range(planted, n_train):            # clean: unique seeds
        rows.append(" ".join(words(1_000_000 + i)))
    tr = pd.DataFrame({"doc_id": np.arange(n_train, dtype="int64"),
                       "text": rows})
    return tr, ev


def decontam_prune_case() -> None:
    """VERDICT r4 task 3: show the fuzzy-decontam band-exchange row
    count scales with PLANTED LEAKAGE, not corpus size.  Runs the
    eval band-hash prune at two train sizes with identical planted
    leakage and reports rows entering the band exchange with vs
    without ``band_filter``, plus the verdict identity."""
    import numpy as np
    import pandas as pd

    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from automatic_reference_extractor_ray.ops.dedup import (
        LSH_BANDS, _token_set, batch_band_hashes,
        batch_minhash_signatures, decontaminate_fuzzy)

    cases = []
    n_eval, planted = 200, 50
    for n_train in (5_000, 20_000):
        tr, ev = _decontam_corpus(n_train, n_eval, planted)

        # the prune measurement, replayed from decontaminate_fuzzy's
        # internals: eval band-hash set vs every union row's band rows
        esigs = batch_minhash_signatures([_token_set(t)
                                          for t in ev["text"]])
        ebh = np.unique(batch_band_hashes(esigs).reshape(-1))
        union = pd.concat([tr, ev], ignore_index=True)
        usigs = batch_minhash_signatures([_token_set(t)
                                          for t in union["text"]])
        ubh = batch_band_hashes(usigs).reshape(-1)
        total = int(len(ubh))
        survive = int(np.isin(ubh, ebh).sum())

        t0 = time.perf_counter()
        v = (decontaminate_fuzzy(rd.from_pandas(tr).repartition(8),
                                 rd.from_pandas(ev), tau=0.8)
             .to_pandas().set_index("doc_id")["keep"])
        sec = round(time.perf_counter() - t0, 3)
        dropped = int((v == 0).sum())
        planted_dropped = int((v[np.arange(planted)] == 0).sum())
        cases.append({
            "n_train": n_train, "n_eval": n_eval, "planted": planted,
            "band_rows_total": total,
            "band_rows_after_prune": survive,
            "prune_keep_fraction": round(survive / total, 5),
            "sec": sec, "dropped": dropped,
            "planted_dropped": planted_dropped,
            "clean_dropped": dropped - planted_dropped})
    print(json.dumps({"metric": "fuzzy_decontam_band_prune",
                      "bands": int(LSH_BANDS), "num_cpus": NUM_CPUS,
                      "cases": cases}))
    ray.shutdown()


def main() -> None:
    if "--decontam" in sys.argv:
        decontam_prune_case()
        return
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
