"""Per-document re-stitch — THE one all-to-all shuffle of the pipeline
(SURVEY.md §4): records extracted independently per span unit are
grouped by ``doc_id`` and ranked into the document's ordered span
sequence by ``(src_offset, seq)`` (G2 + O1 composition; the reference
concatenated per-crop XML at LOCDB-V3/imgProcessing.py:139-206).

Scale design: document count is unbounded, so the shuffle key is NOT
``doc_id`` (Ray's per-group aggregate degrades past ~10k groups — see
ops/shuffle.py) but a bounded hash bucket of it; every record of a
document lands in one bucket, and the per-bucket function restores
per-document order vectorized.  Only extracted strings/boxes travel
through this shuffle — media bytes never do (they stay inside the
extraction actors).  The whole path is Arrow: the nested ``authors``
list<string> column doesn't survive a pandas round-trip.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import REFS_SCHEMA

BUCKET_COL = "__bucket"


def _add_bucket(t: pa.Table, num_buckets: int) -> pa.Table:
    # pandas' C siphash over the whole column (vs a per-row Python
    # crc32 loop); any deterministic hash works — the bucket id only
    # co-locates a document's records, output is bucket-invariant
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    buckets = (pd.util.hash_array(ids) % num_buckets).astype(np.int64)
    return t.append_column(BUCKET_COL, pa.array(buckets))


def _stitch_bucket(g: pa.Table) -> pa.Table:
    g = g.drop_columns([BUCKET_COL])
    if g.num_rows == 0:
        return g.append_column("span_idx", pa.array([], pa.int32())) \
                .select(REFS_SCHEMA.names)
    # integer doc codes (np.unique orders them; only grouping matters),
    # then one lexsort restores (doc, src_offset, seq) reading order
    codes = np.unique(np.asarray(g.column("doc_id").to_pylist(), dtype=object),
                      return_inverse=True)[1]
    order = np.lexsort((g.column("seq").to_numpy(zero_copy_only=False),
                        g.column("src_offset").to_numpy(zero_copy_only=False),
                        codes))
    g = g.take(order)
    c = codes[order]
    # dense per-document span_idx: row index minus index of the doc's
    # first row in the sorted bucket
    idx = np.arange(len(c), dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    run_len = np.diff(np.r_[starts, len(c)])
    span_idx = (idx - np.repeat(idx[starts], run_len)).astype(np.int32)
    g = g.append_column("span_idx", pa.array(span_idx))
    return g.select(REFS_SCHEMA.names)


def stitch_records(records, num_buckets: int | None = None,
                   coalesce: bool = True):
    """records Dataset → final refs Dataset with dense ``span_idx``.
    ``num_buckets=None`` scales with the cluster (ops.shuffle
    auto_num_buckets) — per-bucket memory is ~records/buckets, so a
    fixed count would OOM map_groups tasks at 1000x the data; output is
    bucket-count invariant (property-tested).

    ``coalesce`` merges the record stream to ~2 blocks/core before the
    groupby (a streaming split/merge, NOT an extra all-to-all): the
    sort-based shuffle's driver/ref overhead grows with the SQUARE of
    the block count, and the upstream extraction stage deliberately
    runs many small tasks (pool utilization), so feeding its hundreds
    of small record blocks straight into the sort serializes the tail
    (measured at 120k docs / 32 CPUs: 34 s → 20 s with coalesce).
    Records are strings+boxes (~1% of input bytes), and on a
    fixed-size cluster cores grow with the data, so records/(2·cores)
    stays a bounded block size.
    """
    from ..ops.shuffle import auto_num_buckets
    nb = num_buckets or auto_num_buckets()
    if coalesce:
        try:
            import ray
            cpus = int(ray.cluster_resources().get("CPU", 0)) or 16
        except Exception:                                  # noqa: BLE001
            cpus = 16
        records = records.repartition(2 * cpus, shuffle=False)
    def add_bucket(t: pa.Table):
        # repartition's splitter pads with ZERO-COLUMN empty blocks
        # when a split slot gets no rows; they carry no schema and
        # would ride the whole sort as "RefBundle with a different
        # schema" executor noise — a generator UDF that yields nothing
        # deletes them from the stream (typed empties pass through)
        if t.num_columns == 0:
            return
        yield _add_bucket(t, nb)

    return (records.map_batches(add_bucket, batch_format="pyarrow")
            .groupby(BUCKET_COL)
            .map_groups(_stitch_bucket, batch_format="pyarrow"))
