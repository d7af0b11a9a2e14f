"""The flagship pipeline: interleaved documents → ordered reference
spans (the reference's E1 ``/fileupload/`` lifecycle, SURVEY.md §3).

Dataflow (streaming, lazy until the consuming call):

    docs ──(broadcast semi-join)── latest_version_filter      # G4
         ──map_batches────────── explode_to_units             # S3 fan-out + cost
         ──map_batches(actor)─── ExtractUnits                 # M1–M15, A1–A5, J1–J4
         ──groupby(doc_id)────── stitch_records               # G2/O1 — the one shuffle
"""

from __future__ import annotations

import ray

from ..config import ExtractConfig
from ..stages.dedup_version import latest_version_filter
from ..stages.explode import explode_to_units, rebalance_by_cost
from ..stages.extract import ExtractUnits
from ..stages.stitch import stitch_records


def _pool_size() -> int:
    """Fixed extraction-pool size from the cluster's CPU count.  Ray's
    actor-pool autoscaler ramps up too slowly for a pool that IS the
    pipeline's dominant stage (measured: a (2,8) autoscaling pool stayed
    at 2 actors for a full sf0.1 run); a fixed pool sized to the cluster
    keeps every core busy from the first block."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus - 2)


def extract_refs(docs, cfg: ExtractConfig | None = None,
                 store_spec: str = "synth", *,
                 version_dedup: bool = True,
                 version_ids=None,
                 rebalance: bool = False,
                 concurrency=None):
    """documents Dataset → refs Dataset (REFS_SCHEMA).

    ``version_ids``: optional doc_id-only Dataset for the dedup
    pre-pass (a column-pruned read of the same table) so the light scan
    never materializes span payloads."""
    cfg = cfg or ExtractConfig()
    if concurrency is None:
        concurrency = cfg.ocr_concurrency or _pool_size()
    if version_dedup:
        docs = latest_version_filter(docs, ids=version_ids)
    # batch_size=None → batch = block.  A row-count batch_size here
    # gates task granularity once Ray fuses the chain: with
    # batch_size=1024 the 64 input blocks bundled into 5 tasks and only
    # 5 actors of the pool ever got work (measured: 68 s of stage work
    # at 16.7 s wall on 32 CPUs).  Block-granularity tasks fan out to
    # the whole pool; per-block row counts are set by the reader.
    units = docs.map_batches(lambda b: explode_to_units(b, cfg),
                             batch_format="pyarrow",
                             batch_size=None)
    if rebalance:
        units = rebalance_by_cost(units, cfg.target_block_cost)
    records = units.map_batches(
        ExtractUnits,
        fn_constructor_kwargs=dict(cfg=cfg, store_spec=store_spec),
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=concurrency,
        num_cpus=cfg.ocr_num_cpus,
    )
    return stitch_records(records)
