"""Latest-version-per-document dedup (G4, the exact dedup of the
system; ``findLatest`` LOCDB-V3/fileProcessor.py:223-265).

Scale design: versions are *rare* (a re-uploaded document), and the
"multi-version" test needs no global grouping at all — a base_id is
superseded iff ANY ``~k`` (k >= 1) row exists for it, in which case the
max versioned k wins (the plain row is version 0, so "any versioned row"
⟺ ">1 distinct version" whenever a plain row coexists, and when only
``~k`` rows exist the max-wins filter is a no-op on them — outcome
identical to the grouped nunique>1 rule in every case).  So:

  1. light pass over doc_id only: each batch keeps its VERSION-SUFFIXED
     rows, groups per-batch to (base_id, max version) partials — plain
     ids (the overwhelming majority) never leave their blocks, and no
     all-to-all runs at all (the previous bucketed groupby cost ~3-5 s
     of fixed sort-shuffle overhead per run regardless of volume);
  2. the driver stream-folds those partials (``iter_batches``) into
     {base_id: max_version} — state is bounded by the number of
     version-suffixed ids, the same rarity assumption the broadcast
     in step 3 already makes (documented there);
  3. ``ray.put`` that dict once; filter inside ``map_batches`` — no
     shuffle of document payloads.

The (rare) pathological case — nearly every doc versioned — grows the
driver dict to the versioned-id count; the payload stream still never
shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.textkit import split_versioned_doc_id


def _base_ver(batch: pa.Table) -> pa.Table:
    """Vectorized ``split_versioned_doc_id`` over a batch (pandas str
    kernels; the per-row python variant costs ~2s per million ids).
    MUST implement the same digits-only suffix rule as the scalar
    (textkit.split_versioned_doc_id) — a looser parse here (e.g.
    ``to_numeric`` accepting "3.5"/"+3") would count versions the
    per-row filter later refuses, silently dropping documents."""
    import pandas as pd
    s = pd.Series(batch.column("doc_id").to_pandas(), dtype="object")
    if not len(s):
        return pa.table({"base_id": pa.array([], pa.string()),
                         "version": pa.array([], pa.int64())})
    parts = s.str.rpartition("~")
    is_ver = (parts[1] == "~") & parts[2].str.fullmatch(r"[0-9]+")
    plain = ~is_ver
    base = np.where(plain, s, parts[0])
    version = np.where(plain, "0", parts[2])
    return pa.table({"base_id": pa.array(base, pa.string()),
                     "version": pa.array(
                         pd.to_numeric(pd.Series(version)).astype(np.int64),
                         pa.int64())})


def _versioned_max_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (base_id, max version) over this batch's
    VERSION-SUFFIXED rows only — plain ids never leave the block."""
    bv = _base_ver(batch)
    df = bv.to_pandas()
    df = df[df["version"] > 0]
    if not len(df):
        return pa.table({"base_id": pa.array([], pa.string()),
                         "max_version": pa.array([], pa.int64())})
    g = df.groupby("base_id", sort=False)["version"].max()
    return pa.table({"base_id": pa.array(g.index.to_numpy(), pa.string()),
                     "max_version": pa.array(g.to_numpy(), pa.int64())})


def compute_latest_versions(docs) -> dict[str, int]:
    """→ {base_id: max version} for base_ids carrying any ``~k`` row.
    No shuffle: per-block partials stream-fold on the driver; state is
    bounded by the version-suffixed id count (rare — re-uploads)."""
    parts = (docs.select_columns(["doc_id"])
             .map_batches(_versioned_max_partial, batch_format="pyarrow"))
    latest: dict[str, int] = {}
    for b in parts.iter_batches(batch_format="pandas", batch_size=4096):
        for base, ver in zip(b["base_id"], b["max_version"]):
            iv = int(ver)
            if latest.get(base, -1) < iv:
                latest[base] = iv
    return latest


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
