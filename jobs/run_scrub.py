"""Deployment entry point for corpus text scrubbing — the ``ray job
submit`` surface for the two corpus-wide rewrite ops:

    ray job submit --working-dir . -- \
        python jobs/run_scrub.py --input /data/documents.parquet \
        --out /data/scrubbed --method windows --k 8

``--method lines`` runs the CCNet/RefinedWeb boilerplate-line scrub
(``ops/textstats.py:scrub_dup_lines``; ``--delimiter par`` for the
paragraph variant), ``--method windows`` the ExactSubstr
duplicated-window scrub (``scrub_dup_windows``).  Like curation
(``run_curate.py``) and unlike extraction, scrubbing is NOT resumable
partition-by-partition — the removal verdicts are GLOBAL aggregates (a
duplicate in any partition rewrites another partition's text), so the
unit of restart is the whole job.  The output publishes atomically
(tmp + rename, meta json as a SIBLING of the output dir) and is
hash-sharded on doc_id so downstream readers consume shards
independently.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text) or a "
                         "testdata sf directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--method", choices=["lines", "windows"],
                    default="windows")
    ap.add_argument("--min-docs", type=int, default=2)
    ap.add_argument("--k", type=int, default=8,
                    help="window size in tokens (method=windows)")
    ap.add_argument("--delimiter", choices=["line", "par"], default="line",
                    help="line or paragraph granularity (method=lines)")
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

    from automatic_reference_extractor_ray.ops.textstats import (
        scrub_dup_lines, scrub_dup_windows)
    from automatic_reference_extractor_ray.state.lineage import partition_of

    t0 = time.perf_counter()
    docs = docs_factory(args.input)
    if args.method == "windows":
        out = scrub_dup_windows(docs, k=args.k, min_docs=args.min_docs)
    else:
        out = scrub_dup_lines(
            docs, min_docs=args.min_docs,
            delimiter="\n\n" if args.delimiter == "par" else "\n")

    shards = args.shards

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return t.append_column(
            "shard", pa.array([partition_of(str(d), shards) for d in ids],
                              pa.int32()))

    tmp, final = args.out + ".tmp", args.out
    shutil.rmtree(tmp, ignore_errors=True)
    (out.map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(tmp, partition_cols=["shard"]))
    os.makedirs(tmp, exist_ok=True)              # zero-row corpus

    import pyarrow.dataset as pads
    ds = pads.dataset(tmp, partitioning="hive") if os.listdir(tmp) else None
    n_rows = ds.count_rows() if ds else 0
    n_removed = 0
    if ds and args.method == "windows":
        n_removed = int(ds.to_table(columns=["n_removed"])
                        .column("n_removed").to_pandas().sum())
    meta = {
        "input": os.path.abspath(args.input),
        "method": args.method,
        "min_docs": args.min_docs,
        "k": args.k if args.method == "windows" else None,
        "delimiter": args.delimiter if args.method == "lines" else None,
        "shards": shards,
        "docs": int(n_rows),
        "removed_tokens": n_removed if args.method == "windows" else None,
        "elapsed_sec": round(time.perf_counter() - t0, 3),
    }
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    # meta is a SIBLING of the output dir (see run_curate.py)
    meta_tmp = final + "_META.json.tmp"
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
    os.replace(meta_tmp, final + "_META.json")
    print(json.dumps(meta))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
