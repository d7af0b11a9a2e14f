"""Per-document re-stitch — THE one all-to-all shuffle of the pipeline
(SURVEY.md §4): records extracted independently per span unit are
grouped by ``doc_id`` and ranked into the document's ordered span
sequence by ``(src_offset, seq)`` (G2 + O1 composition; the reference
concatenated per-crop XML at LOCDB-V3/imgProcessing.py:139-206).

Only extracted strings/boxes travel through this shuffle — media bytes
never do (they stay inside the extraction actors).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import REFS_SCHEMA


def _stitch_group(g: pa.Table) -> pa.Table:
    # zero-copy int columns → lexsort; avoid a pandas round-trip (the
    # nested authors list<string> column doesn't survive pandas→Arrow)
    order = np.lexsort((g.column("seq").to_numpy(zero_copy_only=False),
                        g.column("src_offset").to_numpy(zero_copy_only=False)))
    g = g.take(order)
    g = g.append_column(
        "span_idx", pa.array(np.arange(len(g), dtype=np.int32)))
    return g.select(REFS_SCHEMA.names)


def stitch_records(records):
    """records Dataset → final refs Dataset with dense ``span_idx``."""
    return (records.groupby("doc_id")
            .map_groups(_stitch_group, batch_format="pyarrow"))
