"""Doc → span work-unit fan-out (page-explode analogue,
LOCDB-V3/fileProcessor.py:66-92) and skew-cost estimation.

A media-dense document becomes one row per media span, so a 400-page
scan is 400 independently schedulable units instead of one straggler —
the explicit skew handling SURVEY.md §4 calls for.  Cost = text bytes +
``media_cost_bytes`` per media span; the rebalance helper sizes blocks
from it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ExtractConfig


def explode_to_units(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    """map_batches(pyarrow): (doc_id, spans) rows → one row per span."""
    spans = batch.column("spans")
    flat = pc.list_flatten(spans).combine_chunks()      # struct array
    reps = pc.list_value_length(spans).fill_null(0).to_numpy(zero_copy_only=False)
    doc_ids = pa.array(np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), reps))
    kind = flat.field("kind")
    text = flat.field("text")
    media_ref = flat.field("media_ref")
    offset = flat.field("offset")
    text_len = pc.utf8_length(text).cast(pa.int64())
    is_media = pc.equal(kind, "media")
    cost = pc.add(text_len,
                  pc.if_else(is_media, pa.scalar(cfg.media_cost_bytes, pa.int64()),
                             pa.scalar(0, pa.int64())))
    return pa.table({
        "doc_id": doc_ids,
        "src_offset": offset.cast(pa.int32()),
        "kind": kind,
        "text": text,
        "media_ref": media_ref,
        "cost": cost,
    })


def rebalance_by_cost(units, target_block_cost: int):
    """Optional explicit rebalance: repartition so each block carries
    roughly ``target_block_cost`` of estimated work.  Costs one light
    pass (sum aggregate) + a repartition round; use when the input is
    known to be badly skewed (e.g. a shard of 400-page scans next to
    one-liner shards).  The default pipeline relies on fine-grained
    units + small actor batches instead."""
    total = units.sum("cost")
    n_blocks = max(1, int(total / max(1, target_block_cost)))
    return units.repartition(n_blocks)
