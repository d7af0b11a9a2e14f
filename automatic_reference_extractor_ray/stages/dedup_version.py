"""Latest-version-per-document dedup (G4, the exact dedup of the
system; ``findLatest`` LOCDB-V3/fileProcessor.py:223-265).

Scale design: versions are *rare* (a re-uploaded document), so instead
of shuffling every row through ``groupby(base_id)`` we do a two-phase
broadcast semi-join:

  1. light pass over (base_id, version) only: per-batch partial max +
     count → small ``groupby`` over the partials → keep only base_ids
     that actually have >1 distinct version (tiny in practice);
  2. ``ray.put`` that {base_id: max_version} dict once; filter inside
     ``map_batches`` — no full shuffle of document payloads.

The (rare) pathological case — nearly every doc versioned — degrades to
a groupby over (base_id, version) pairs, still never over payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.textkit import split_versioned_doc_id


def _base_ver(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    bases, vers = zip(*(split_versioned_doc_id(d) for d in ids)) if ids else ((), ())
    return pa.table({"base_id": pa.array(bases, pa.string()),
                     "version": pa.array(vers, pa.int64())})


def _partial_max(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one (base_id, max version, n versions) row per
    base_id — shrinks the shuffle input to distinct-keys-per-batch."""
    import pandas as pd
    df = batch.to_pandas()
    g = df.groupby("base_id")["version"].agg(["max", "nunique"]).reset_index()
    g.columns = ["base_id", "max_version", "n_versions"]
    return pa.Table.from_pandas(g, preserve_index=False)


def compute_latest_versions(docs) -> dict[str, int]:
    """→ {base_id: latest_version} for base_ids with >1 version."""
    import pandas as pd
    partials = (docs.select_columns(["doc_id"])
                .map_batches(_base_ver, batch_format="pyarrow")
                .map_batches(_partial_max, batch_format="pyarrow"))
    pdf = partials.to_pandas()
    if pdf.empty:
        return {}
    agg = pdf.groupby("base_id").agg(
        max_version=("max_version", "max"), n=("n_versions", "sum"))
    dup = agg[agg["n"] > 1]
    return dict(zip(dup.index, dup["max_version"].astype(int)))


def latest_version_filter(docs, ids=None):
    """Drop superseded document versions; single-version docs stream
    through untouched.  ``ids``: optional doc_id-only Dataset (a
    column-pruned read of the same table) so the light scan skips
    payload materialization."""
    latest = compute_latest_versions(ids if ids is not None else docs)
    if not latest:
        return docs
    latest_ref = ray.put(latest)

    def keep(batch: pa.Table) -> pa.Table:
        lookup = ray.get(latest_ref)
        ids = batch.column("doc_id").to_pylist()
        mask = np.ones(len(ids), dtype=bool)
        for i, d in enumerate(ids):
            base, ver = split_versioned_doc_id(d)
            if base in lookup and ver != lookup[base]:
                mask[i] = False
        return batch.filter(pa.array(mask))

    return docs.map_batches(keep, batch_format="pyarrow")
