"""Deployment entry point for corpus curation — the ``ray job submit``
surface for ``pipelines/curate.py``:

    ray job submit --working-dir . -- \
        python jobs/run_curate.py --input /data/documents.parquet \
        --out /data/verdicts --train-frac 0.8

Unlike extraction (``run_extract.py``), curation is NOT resumable
partition-by-partition: its decontamination and dedup verdicts are
GLOBAL aggregates (an eval n-gram or a duplicate in any partition
changes another partition's verdict), so the unit of restart is the
whole job.  The output is still published atomically (tmp + rename)
and hash-partitioned on doc_id so downstream training readers can
consume shards independently.
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
    return read_parquet_clean(inp, columns=["doc_id", "text", "lang"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text, lang) or a "
                         "testdata sf directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--train-frac", type=float, default=0.8)
    ap.add_argument("--decontam-n", type=int, default=4)
    ap.add_argument("--shards", type=int, default=64,
                    help="output hash shards (doc_id-keyed)")
    ap.add_argument("--mix-rates", default=None,
                    help='JSON dict of per-lang sampling rates, e.g. '
                         '\'{"en": 0.5}\'')
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():                 # driver owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    import pyarrow as pa

    from automatic_reference_extractor_ray.pipelines.curate import (
        curate_corpus)
    from automatic_reference_extractor_ray.state.lineage import partition_of

    rates = json.loads(args.mix_rates) if args.mix_rates else None
    t0 = time.perf_counter()
    verdicts = curate_corpus(
        docs_factory(args.input), decontam_n=args.decontam_n,
        train_frac=args.train_frac, mix_rates=rates)

    shards = args.shards

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return t.append_column(
            "shard", pa.array([partition_of(str(d), shards) for d in ids],
                              pa.int32()))

    tmp, final = args.out + ".tmp", args.out
    shutil.rmtree(tmp, ignore_errors=True)
    (verdicts.map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(tmp, partition_cols=["shard"]))
    os.makedirs(tmp, exist_ok=True)              # zero-row corpus

    import pyarrow.dataset as pads
    ds = pads.dataset(tmp, partitioning="hive") if os.listdir(tmp) else None
    n_rows = ds.count_rows() if ds else 0
    n_kept = (ds.to_table(columns=["keep"]).column("keep")
              .to_pandas().sum() if ds else 0)
    meta = {
        "input": os.path.abspath(args.input),
        "train_frac": args.train_frac,
        "decontam_n": args.decontam_n,
        "mix_rates": rates,
        "shards": shards,
        "train_docs": int(n_rows),
        "kept_docs": int(n_kept),
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
