"""Deployment entry point for landing a corpus increment — the daily
flow at 100 TB: dedup a new batch of documents against the persistent
content-hash index of everything already landed, publish the surviving
docs, and fold their hashes back into the index.

    ray job submit --working-dir . -- \
        python jobs/run_land.py --index /data/hash-index \
        --increment /data/new-batch.parquet --out /data/landed/2026-08-17

First run: ``--build-base /data/corpus.parquet`` builds the index from
an existing base corpus.  Subsequent runs only read the index buckets
the increment's own hashes map to (see ``state/hash_index.py``), so
landing cost scales with the increment, not the corpus.  Output is
published atomically (tmp + rename) with a _META.json; the index
append happens only AFTER the data rename, so a crash between the two
re-lands the increment as duplicates-of-nothing rather than losing it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _docs(inp: str):
    import ray.data as rd
    if os.path.isdir(inp) and os.path.exists(
            os.path.join(inp, "documents.parquet")):
        inp = os.path.join(inp, "documents.parquet")
    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    return read_parquet_clean(inp, columns=["doc_id", "text"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="hash index directory")
    ap.add_argument("--increment", required=True,
                    help="new documents parquet (doc_id, text)")
    ap.add_argument("--out", required=True,
                    help="directory for the increment's surviving docs")
    ap.add_argument("--build-base", default=None,
                    help="base corpus parquet: (re)build the index from "
                         "it first instead of requiring one to exist")
    ap.add_argument("--index-parts", type=int, default=64)
    ap.add_argument("--no-append", action="store_true",
                    help="dry-run: verdicts + output, index untouched")
    ap.add_argument("--compact", action="store_true",
                    help="merge the LSH index's small parquet files "
                         "after the append (repeated landings "
                         "fragment the band partitions)")
    ap.add_argument("--method", choices=["exact", "lsh"],
                    default="exact",
                    help="exact: content-hash index (state/hash_index);"
                         " lsh: MinHash-LSH NEAR-dup index "
                         "(state/lsh_index)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():                 # driver owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    from automatic_reference_extractor_ray.state.hash_index import (
        build_hash_index, incremental_dedup_indexed)

    t0 = time.perf_counter()
    if args.build_base:
        if args.method == "lsh":
            from automatic_reference_extractor_ray.state.lsh_index import (
                build_lsh_index)
            build_lsh_index(_docs(args.build_base), args.index,
                            num_parts=args.index_parts)
        else:
            build_hash_index(_docs(args.build_base), args.index,
                             num_parts=args.index_parts)
    elif not os.path.isdir(args.index):
        print(f"error: index {args.index} does not exist "
              f"(use --build-base to create it)", file=sys.stderr)
        return 1

    new = _docs(args.increment)
    if args.method == "lsh":
        from automatic_reference_extractor_ray.state.lsh_index import (
            incremental_minhash_dedup)
        verdicts = incremental_minhash_dedup(
            new, args.index).materialize()
    else:
        verdicts = incremental_dedup_indexed(
            new, args.index).materialize()

    # publish surviving documents (hash verdicts join back to text by
    # doc_id through the bounded-bucket join — no driver-side id set)
    from automatic_reference_extractor_ray.ops.dedup import _doc_key_dtype
    from automatic_reference_extractor_ray.ops.shuffle import bucketed_join
    key_dtype = _doc_key_dtype(new)
    kept_ids = verdicts.map_batches(
        lambda d: d[d["keep"] == 1][["doc_id"]], batch_format="pandas")
    survivors = bucketed_join(
        new, kept_ids, on="doc_id",
        left_schema={"doc_id": key_dtype, "text": "object"},
        right_schema={"doc_id": key_dtype},
        how="semi")

    tmp, final = args.out + ".tmp", args.out
    shutil.rmtree(tmp, ignore_errors=True)
    survivors.write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)              # zero-survivor increment

    n_new = new.count()
    n_kept = int(verdicts.map_batches(
        lambda d: d[["keep"]], batch_format="pandas").sum("keep") or 0)
    meta = {
        "increment": os.path.abspath(args.increment),
        "index": os.path.abspath(args.index),
        "increment_docs": int(n_new),
        "kept_docs": n_kept,
        "append": not args.no_append,
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

    if not args.no_append and args.method == "lsh":
        # fold surviving docs' band rows in AFTER the data publish
        from automatic_reference_extractor_ray.state.lsh_index import (
            append_to_lsh_index, compact_lsh_index)
        append_to_lsh_index(survivors, args.index)
        if args.compact:
            compact_lsh_index(args.index)
    elif not args.no_append:
        # fold survivors into the index AFTER the data publish
        from automatic_reference_extractor_ray.state.hash_index import (
            _bucket_of_hash, _index_meta)
        num_parts = _index_meta(args.index)

        def surviving_hashes(d):
            # return a TYPED Arrow table: a 0-row pandas block with an
            # object column trips Ray's size estimator in the worker
            # ("cannot call `vectorize` on size 0 inputs"), which no
            # driver-side log filter can reach
            import pyarrow as pa
            k = d[d["keep"] == 1][["content_hash"]].copy()
            k["bucket"] = _bucket_of_hash(k["content_hash"], num_parts)
            return pa.table({
                "content_hash": pa.array(k["content_hash"], pa.string()),
                "bucket": pa.array(k["bucket"], pa.int64()),
            })

        verdicts.map_batches(
            surviving_hashes, batch_format="pandas"
        ).write_parquet(args.index, partition_cols=["bucket"])

    print(json.dumps(meta))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
