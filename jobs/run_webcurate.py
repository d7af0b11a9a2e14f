"""Deployment entry point for web-corpus curation — the ``ray job
submit`` surface for ``pipelines/webcurate.py``:

    ray job submit --working-dir . -- \
        python jobs/run_webcurate.py --input /data/pages.parquet \
        --out /data/clean

Input: a pages parquet (doc_id:int64, html:string) — or a testdata sf
directory, in which case the synthetic web corpus is generated from
its documents table first (``sources/webgen.py``).  Like curation,
the URL/content dedup verdicts are GLOBAL (a duplicate in any
partition changes another partition's verdict), so the restart unit
is the whole job; output publishes atomically (tmp + rename, sibling
meta json) hash-sharded on doc_id.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pages(inp: str):
    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    if os.path.isdir(inp):
        from automatic_reference_extractor_ray.sources.webgen import (
            write_web_tables)
        d = write_web_tables(inp)
        inp = os.path.join(d, "pages.parquet")
    return read_parquet_clean(inp)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages parquet (doc_id, html) or a testdata "
                         "sf directory (synthetic web corpus)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-chars", type=int, default=200)
    ap.add_argument("--min-blocks", type=int, default=2)
    ap.add_argument("--url-slots", type=int, default=250)
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():                 # driver owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    from automatic_reference_extractor_ray.pipelines.webcurate import (
        curate_web_corpus)

    t0 = time.perf_counter()
    pages = _pages(args.input)
    n_in = pages.count()
    clean = curate_web_corpus(pages, url_slots=args.url_slots,
                              min_chars=args.min_chars,
                              min_blocks=args.min_blocks)

    import pandas as pd

    def shard(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(shard=pd.util.hash_array(
            b["doc_id"].to_numpy()) % args.shards)

    tmp, final = args.out + ".tmp", args.out
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    (clean.map_batches(shard, batch_format="pandas")
     .write_parquet(tmp, partition_cols=["shard"]))

    from automatic_reference_extractor_ray.sources.readers import (
        read_parquet_clean)
    n_out = read_parquet_clean(tmp).count()
    meta = {
        "input": os.path.abspath(args.input),
        "pages_in": int(n_in),
        "pages_kept": int(n_out),
        "min_chars": args.min_chars,
        "min_blocks": args.min_blocks,
        "url_slots": args.url_slots,
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
