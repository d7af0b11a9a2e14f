"""Deployment entry point for near-duplicate corpus removal — the
``ray job submit`` surface for ``ops/dedup.py:dedup_corpus``:

    ray job submit --working-dir . -- \
        python jobs/run_dedup.py --input /data/documents.parquet \
        --out /data/deduped --method jaccard --tau 0.9

``--method`` picks the pair stage: ``jaccard`` (exact, SQL-checkable),
``shingles`` (MinHash over character k-grams — catches typo'd
near-clones word tokens miss),
``minhash`` (LSH candidates + exact verify — the cheap web-scale
default), ``simhash`` or ``embedding`` isn't offered here because the
documents table carries no vectors; wire ``dedup_corpus(pairs=...)``
directly for that.

Like curation (``run_curate.py``), near-dup removal is a GLOBAL
aggregate (a pair in any partition changes another partition's
survivor), so the restart unit is the whole job; output publishes
atomically (tmp + rename) and hash-shards on doc_id so training
readers consume shards independently.
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
    import ray.data as rd
    if os.path.isdir(inp) and os.path.exists(
            os.path.join(inp, "documents.parquet")):
        inp = os.path.join(inp, "documents.parquet")
    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    return read_parquet_clean(inp, columns=["doc_id", "text"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text) or a testdata "
                         "sf directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--method",
                    choices=("jaccard", "minhash", "shingles"),
                    default="minhash")
    ap.add_argument("--tau", type=float, default=0.9)
    ap.add_argument("--shards", type=int, default=64,
                    help="output hash shards (doc_id-keyed)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():                 # driver owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    import pyarrow as pa

    from automatic_reference_extractor_ray.ops.dedup import (
        dedup_corpus, jaccard_pairs, minhash_lsh_pairs)
    from automatic_reference_extractor_ray.state.lineage import partition_of

    t0 = time.perf_counter()
    docs = docs_factory(args.input)
    n_in = docs.count()
    if args.method == "jaccard":
        pair_fn = jaccard_pairs
    elif args.method == "shingles":
        def pair_fn(docs, tau):
            return minhash_lsh_pairs(docs, tau=tau,
                                     tokenizer="shingles")
    else:
        pair_fn = minhash_lsh_pairs
    kept = dedup_corpus(docs, pairs=pair_fn(docs, tau=args.tau))

    shards = args.shards

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return t.append_column(
            "shard", pa.array([partition_of(str(d), shards) for d in ids],
                              pa.int32()))

    tmp, final = args.out + ".tmp", args.out
    shutil.rmtree(tmp, ignore_errors=True)
    (kept.map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(tmp, partition_cols=["shard"]))
    os.makedirs(tmp, exist_ok=True)              # zero-row corpus

    import pyarrow.dataset as pads
    ds = pads.dataset(tmp, partitioning="hive") if os.listdir(tmp) else None
    n_kept = ds.count_rows() if ds else 0
    meta = {
        "input": os.path.abspath(args.input),
        "method": args.method,
        "tau": args.tau,
        "shards": shards,
        "input_docs": int(n_in),
        "kept_docs": int(n_kept),
        "removed_docs": int(n_in - n_kept),
        "elapsed_sec": round(time.perf_counter() - t0, 3),
    }
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    # meta is a SIBLING of the output dir (not inside it): parquet-dir
    # readers that glob every file would try to parse an in-dir json;
    # written via tmp+replace so a crash never leaves a torn meta
    meta_tmp = final + "_META.json.tmp"
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
    os.replace(meta_tmp, final + "_META.json")
    print(json.dumps(meta))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
