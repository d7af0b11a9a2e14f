"""Deployment entry point for DSIR data selection — the ``ray job
submit`` surface for target-domain importance resampling:

    ray job submit --working-dir . -- \
        python jobs/run_select.py --input /data/documents.parquet \
        --target-lang zh --out /data/selected --k 100000

The raw corpus is weighted by hashed-gram log importance ratio against
the target slice (``ops/dsir.py``); the top-``k`` doc ids + weights
publish atomically (tmp + rename, meta json as a SIBLING of the output
dir — readers over the output dir must not trip on it).  Selection is
a GLOBAL verdict (both distributions fold over the whole corpus), so
like curation the unit of restart is the whole job.

The target can be a language slice of the input (``--target-lang``) or
a separate corpus (``--target`` parquet) — the "small clean target,
huge raw pool" DSIR shape.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_docs(inp: str, columns):
    if os.path.isdir(inp) and os.path.exists(
            os.path.join(inp, "documents.parquet")):
        inp = os.path.join(inp, "documents.parquet")
    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    return read_parquet_clean(inp, columns=columns)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="raw documents parquet (doc_id, text[, lang]) "
                         "or a testdata sf directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--n-buckets", type=int, default=8192)
    tgt = ap.add_mutually_exclusive_group(required=True)
    tgt.add_argument("--target", help="separate target corpus parquet")
    tgt.add_argument("--target-lang",
                     help="use this language slice of --input as target")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():                 # driver owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    from automatic_reference_extractor_ray.ops.dsir import dsir_select

    t0 = time.perf_counter()
    if args.target_lang:
        from automatic_reference_extractor_ray.ops.shuffle import (
            typed_empty_if_blank)
        raw = _read_docs(args.input, ["doc_id", "text", "lang"])
        lang = args.target_lang
        # typed empties: a block with no target-lang rows must carry
        # its schema (Ray's pandas size estimator chokes on 0-row
        # object frames)
        target = raw.map_batches(
            lambda b: typed_empty_if_blank(b[b["lang"] == lang]),
            batch_format="pandas")
    else:
        raw = _read_docs(args.input, ["doc_id", "text"])
        target = _read_docs(args.target, ["doc_id", "text"])

    top = dsir_select(raw, target, k=args.k, n_buckets=args.n_buckets)

    tmp, final = args.out + ".tmp", args.out
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    top.to_parquet(os.path.join(tmp, "selected.parquet"), index=False)

    meta = {
        "input": os.path.abspath(args.input),
        "target": os.path.abspath(args.target) if args.target else None,
        "target_lang": args.target_lang,
        "k": args.k,
        "n_buckets": args.n_buckets,
        "selected": int(len(top)),
        "logw_micro_min": int(top["logw_micro"].min()) if len(top) else None,
        "logw_micro_max": int(top["logw_micro"].max()) if len(top) else None,
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
