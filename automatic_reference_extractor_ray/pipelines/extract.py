"""The flagship pipeline: interleaved documents → ordered reference
spans (the reference's E1 ``/fileupload/`` lifecycle, SURVEY.md §3).

Dataflow (streaming, lazy until the consuming call):

    docs ──(broadcast semi-join)── latest_version_filter      # G4
         ──map_batches────────── explode_to_units             # S3 fan-out + cost
         ──map_batches(actor)─── ExtractUnits                 # M1–M15, A1–A5, J1–J4
         ──groupby(doc_id)────── stitch_records               # G2/O1 — the one shuffle
"""

from __future__ import annotations

from ..config import ExtractConfig
from ..stages.dedup_version import latest_version_filter
from ..stages.explode import explode_to_units, rebalance_by_cost
from ..stages.extract import ExtractUnits
from ..stages.stitch import stitch_records


def extract_refs(docs, cfg: ExtractConfig | None = None,
                 store_spec: str = "synth", *,
                 version_dedup: bool = True,
                 rebalance: bool = False,
                 concurrency=None):
    """documents Dataset → refs Dataset (REFS_SCHEMA)."""
    cfg = cfg or ExtractConfig()
    if version_dedup:
        docs = latest_version_filter(docs)
    units = docs.map_batches(lambda b: explode_to_units(b, cfg),
                             batch_format="pyarrow",
                             batch_size=cfg.text_batch_size)
    if rebalance:
        units = rebalance_by_cost(units, cfg.target_block_cost)
    records = units.map_batches(
        ExtractUnits,
        fn_constructor_kwargs=dict(cfg=cfg, store_spec=store_spec),
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=concurrency or cfg.ocr_concurrency,
        num_cpus=cfg.ocr_num_cpus,
    )
    return stitch_records(records)
