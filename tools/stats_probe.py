"""Per-query execution introspection: run one (or more) ``queries()``
entries and print Ray Data's ``ds.stats()`` for each — stage wall
times, block counts, task counts, and memory — the feedback loop for
"is wall-time dominated by useful compute or by exchange overhead".

Usage:
    python tools/stats_probe.py extract_refs dedup_minhash [--sf DIR]

Queries that return pandas (driver-folded aggregates) report only
elapsed wall time — their distributed work happens inside their own
intermediate datasets, not in the returned object.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(
            os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False, logging_level="ERROR")
    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()

    import ray.data as rd

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name!r}", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        res = qs[name](args.sf)
        if isinstance(res, rd.Dataset):
            res = res.materialize()
            elapsed = time.perf_counter() - t0
            print(f"===== {name}: {res.count()} rows, "
                  f"{elapsed:.2f}s =====")
            print(res.stats())
        else:
            elapsed = time.perf_counter() - t0
            print(f"===== {name}: {len(res)} rows (driver-folded), "
                  f"{elapsed:.2f}s — no dataset stats =====")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
