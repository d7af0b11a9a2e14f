"""Deployment entry point for the corpus index artifacts — the ``ray
job submit`` surface that materializes the two broadcast-shaped
curation assets:

    ray job submit --working-dir . -- \
        python jobs/run_index.py --input /data/documents.parquet \
        --out /data/index --k 16 --min-df 2

Writes, atomically (tmp + rename, meta json as a SIBLING — the
run_curate.py convention):

    <out>/postings/shard=*/     hash-sharded (token-keyed) postings
                                parquet from ``ops/postings.py``
                                (token, df, k-smallest-id posting list)
    <out>/lm_model.npz          the stupid-backoff bigram model from
                                ``ops/lm.py:fit_bigram_lm`` (vocab,
                                unigram counts, packed bigram keys and
                                counts, total, alpha) — consumers load
                                it with ``load_lm_model`` below and
                                pass it straight to ``lm_score``
    <out>/pq_codes/shard=*/     (with ``--embeddings``) the PQ uint8
                                code artifact from ``ops/ann.py:
                                pq_encode`` plus ``pq_codebooks.npz``
                                (``load_pq_codebooks`` below) — the
                                encode-once half of the
                                fit/encode/search surface; later query
                                batches run gather-only ``pq_search``
                                against these shards

Both are GLOBAL aggregates (a posting list and a count table span
every partition), so like curation/scrubbing the restart unit is the
whole job, not a partition.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def docs_factory(inp: str):
    if os.path.isdir(inp) and os.path.exists(
            os.path.join(inp, "documents.parquet")):
        inp = os.path.join(inp, "documents.parquet")
    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    return read_parquet_clean(inp, columns=["doc_id", "text"])


def save_lm_model(model: dict, path: str) -> None:
    import numpy as np
    np.savez(path, vocab=model["vocab"], uni=model["uni"],
             bi_keys=model["bi_keys"], bi_counts=model["bi_counts"],
             total=np.int64(model["total"]),
             alpha=np.float64(model["alpha"]))


def load_lm_model(path: str) -> dict:
    import numpy as np
    z = np.load(path, allow_pickle=True)
    return {"vocab": z["vocab"], "uni": z["uni"],
            "bi_keys": z["bi_keys"], "bi_counts": z["bi_counts"],
            "total": int(z["total"]), "alpha": float(z["alpha"])}


def load_pq_codebooks(path: str) -> dict:
    import numpy as np
    z = np.load(path)
    books = [z[f"book_{s}"] for s in range(len(z.files) - 1)]
    return {"bounds": z["bounds"], "books": books}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text) or a "
                         "testdata sf directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=16,
                    help="posting-list cap (k smallest doc ids)")
    ap.add_argument("--min-df", type=int, default=1)
    ap.add_argument("--vocab-size", type=int, default=4096)
    ap.add_argument("--max-bigrams", type=int, default=65536)
    ap.add_argument("--sample-frac", type=float, default=1.0,
                    help="LM fit hash-sample fraction")
    ap.add_argument("--shards", type=int, default=64,
                    help="postings output hash shards (token-keyed)")
    ap.add_argument("--embeddings", default=None,
                    help="optional embeddings parquet (vec_id, "
                         "embedding) or sf dir: also publish the PQ "
                         "code artifact + codebooks")
    ap.add_argument("--pq-m-sub", type=int, default=16)
    ap.add_argument("--pq-n-codes", type=int, default=64)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():                 # driver owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    import pyarrow as pa

    from automatic_reference_extractor_ray.ops.lm import fit_bigram_lm
    from automatic_reference_extractor_ray.ops.postings import build_postings
    from automatic_reference_extractor_ray.state.lineage import partition_of

    t0 = time.perf_counter()
    postings = build_postings(docs_factory(args.input), k=args.k,
                              min_df=args.min_df)
    shards = args.shards

    def add_shard(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_pylist()
        return t.append_column(
            "shard", pa.array([partition_of(tok, shards) for tok in toks],
                              pa.int32()))

    tmp, final = args.out + ".tmp", args.out
    shutil.rmtree(tmp, ignore_errors=True)
    (postings.map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(os.path.join(tmp, "postings"),
                    partition_cols=["shard"]))
    os.makedirs(os.path.join(tmp, "postings"), exist_ok=True)

    model = fit_bigram_lm(docs_factory(args.input),
                          vocab_size=args.vocab_size,
                          max_bigrams=args.max_bigrams,
                          sample_frac=args.sample_frac)
    save_lm_model(model, os.path.join(tmp, "lm_model.npz"))

    n_codes_rows = 0
    if args.embeddings:
        import numpy as np

        from automatic_reference_extractor_ray.ops.ann import (
            pq_encode, pq_fit)
        from automatic_reference_extractor_ray.sources.readers import (
            read_parquet_clean)
        inp = args.embeddings
        if os.path.isdir(inp) and os.path.exists(
                os.path.join(inp, "embeddings.parquet")):
            inp = os.path.join(inp, "embeddings.parquet")
        embs = read_parquet_clean(inp, columns=["vec_id", "embedding"])
        pq = pq_fit(embs, m_sub=args.pq_m_sub, n_codes=args.pq_n_codes)
        np.savez(os.path.join(tmp, "pq_codebooks.npz"),
                 bounds=pq["bounds"], **{f"book_{s}": b
                                         for s, b in enumerate(pq["books"])})
        codes = pq_encode(embs, pq)

        def code_shard(t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_pylist()
            return t.append_column(
                "shard", pa.array([partition_of(str(v), shards)
                                   for v in ids], pa.int32()))

        (codes.map_batches(code_shard, batch_format="pyarrow")
         .write_parquet(os.path.join(tmp, "pq_codes"),
                        partition_cols=["shard"]))
        import pyarrow.dataset as pads
        n_codes_rows = pads.dataset(
            os.path.join(tmp, "pq_codes"), partitioning="hive").count_rows()

    import pyarrow.dataset as pads
    pdir = os.path.join(tmp, "postings")
    ds = (pads.dataset(pdir, partitioning="hive")
          if os.listdir(pdir) else None)
    meta = {
        "input": os.path.abspath(args.input),
        "k": args.k, "min_df": args.min_df, "shards": shards,
        "tokens": int(ds.count_rows()) if ds else 0,
        "lm_vocab": int(len(model["vocab"])),
        "lm_bigrams": int(len(model["bi_keys"])),
        "lm_total_tokens": int(model["total"]),
        "pq_vectors": n_codes_rows if args.embeddings else None,
        "elapsed_sec": round(time.perf_counter() - t0, 3),
    }
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    meta_tmp = final + "_META.json.tmp"
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
    os.replace(meta_tmp, final + "_META.json")
    print(json.dumps(meta))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
