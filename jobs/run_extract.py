"""Deployment entry point — the ``ray job submit`` surface.

    ray job submit --working-dir . -- \
        python jobs/run_extract.py --input /data/docs.lance \
        --out /data/refs --partitions 256

Runs the flagship extraction pipeline resumably: output is partitioned
by hashed base doc_id with per-partition lineage records, so a killed
job rerun with the same arguments skips completed partitions
(state/lineage.py).  On a fixed-size cluster the same command runs
unchanged at N and 4N nodes; ``--partitions`` should be a few times the
total worker count.

Inputs: a Lance URI (``.lance``), a parquet path of the documents
schema, or a testdata sf directory (synthetic corpus expansion).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def docs_factory(inp: str, quarantine: bool = False,
                 quarantine_dir: str | None = None):
    from automatic_reference_extractor_ray.sources import interleave as iv
    from automatic_reference_extractor_ray.stages.validate import (
        validate_documents)
    if inp.endswith(".lance"):
        read = lambda: iv.read_docs_lance(inp)            # noqa: E731
    elif os.path.isdir(inp) and os.path.exists(
            os.path.join(inp, "documents.parquet")):
        read = lambda: iv.read_interleaved_docs(inp)      # noqa: E731
    else:
        read = lambda: iv.read_docs_parquet(inp)          # noqa: E731
    return lambda: validate_documents(read(), quarantine=quarantine,
                                      quarantine_dir=quarantine_dir)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--no-version-dedup", action="store_true")
    ap.add_argument("--quarantine", action="store_true",
                    help="drop invalid input rows instead of failing fast")
    ap.add_argument("--quarantine-dir", default=None,
                    help="with --quarantine: also write dropped rows "
                         "(tagged with _invalid_reason) to this dir as a "
                         "parquet dead-letter side table")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():                     # driver owns the session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    from automatic_reference_extractor_ray.state.lineage import (
        fingerprint_dir, run_resumable_extract)
    fp = fingerprint_dir(args.input) if os.path.isdir(args.input) else ""
    metrics = run_resumable_extract(
        docs_factory(args.input, quarantine=args.quarantine,
                     quarantine_dir=args.quarantine_dir), args.out,
        num_partitions=args.partitions,
        input_fingerprint=fp,
        version_dedup=not args.no_version_dedup)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
