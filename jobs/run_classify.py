"""Deployment entry point for the linear quality classifier — the
``ray job submit`` surface for fastText-style fit + corpus scoring:

    ray job submit --working-dir . -- \
        python jobs/run_classify.py --input /data/documents.parquet \
        --label-lang en --out /data/scored

Publishes atomically (tmp + rename; meta json as a SIBLING of the
output dir):

    <out>/scores/shard=*/       (doc_id, score_micro, pred) parquet,
                                hash-sharded by doc_id
    <out>/logreg_model.npz      the fitted weight vector — load with
                                ``load_logreg_model`` below and pass
                                straight to ``logreg_score`` to score
                                any later corpus drop with the SAME
                                model (the fit is bounded-sample, the
                                model is the reusable artifact)

Labels come either from an existing 0/1 column (``--label-col``) or
from a language slice (``--label-lang``: label = lang == X).  The fit
is a bounded deterministic sample (driver-local Adagrad), so the
restart unit is the whole job; scoring itself is a pure streaming map.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_logreg_model(model, path: str) -> None:
    import numpy as np
    np.savez(path, w=model.w, n_buckets=np.int64(model.n_buckets))


def load_logreg_model(path: str):
    import numpy as np

    from automatic_reference_extractor_ray.ops.classifier import (
        LogRegModel)
    z = np.load(path)
    return LogRegModel(w=z["w"], n_buckets=int(z["n_buckets"]))


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
                    help="documents parquet (doc_id, text[, lang]) or "
                         "a testdata sf directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-buckets", type=int, default=4096)
    ap.add_argument("--fit-sample", type=int, default=8192)
    ap.add_argument("--shards", type=int, default=8)
    lab = ap.add_mutually_exclusive_group(required=True)
    lab.add_argument("--label-col", help="existing 0/1 int column")
    lab.add_argument("--label-lang",
                     help="label = (lang == this) over the input")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():                 # driver owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    from automatic_reference_extractor_ray.ops.classifier import (
        fit_logreg, logreg_score)

    t0 = time.perf_counter()
    if args.label_lang:
        lang = args.label_lang
        docs = _read_docs(args.input, ["doc_id", "text", "lang"])
        labeled = docs.map_batches(
            lambda b: b.assign(
                label=(b["lang"] == lang).astype("int64"))
            [["doc_id", "text", "label"]],
            batch_format="pandas")
        label_col = "label"
    else:
        label_col = args.label_col
        labeled = _read_docs(args.input,
                             ["doc_id", "text", args.label_col])

    model = fit_logreg(labeled, label_col, n_buckets=args.n_buckets,
                       fit_sample=args.fit_sample)
    scored = logreg_score(labeled, model)

    tmp, final = args.out + ".tmp", args.out
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "scores"), exist_ok=True)

    import pandas as pd

    def shard(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(shard=pd.util.hash_array(
            b["doc_id"].to_numpy()) % args.shards)

    (scored.map_batches(shard, batch_format="pandas")
     .write_parquet(os.path.join(tmp, "scores"),
                    partition_cols=["shard"]))
    save_logreg_model(model, os.path.join(tmp, "logreg_model.npz"))

    n_pos = scored.map_batches(
        lambda b: pd.DataFrame({"n": [int(b["pred"].sum())]}),
        batch_format="pandas").to_pandas()["n"].sum()
    n = scored.count()
    meta = {
        "input": os.path.abspath(args.input),
        "label_col": args.label_col,
        "label_lang": args.label_lang,
        "n_buckets": args.n_buckets,
        "fit_sample": args.fit_sample,
        "docs": int(n),
        "pred_positive": int(n_pos),
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
