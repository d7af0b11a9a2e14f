"""Latest-version-per-document dedup (G4, the exact dedup of the
system; ``findLatest`` LOCDB-V3/fileProcessor.py:223-265).

Scale design: versions are *rare* (a re-uploaded document), so instead
of shuffling every row through ``groupby(base_id)`` we do a two-phase
broadcast semi-join:

  1. light pass over (base_id, version) only: per-batch distinct
     combiner → DISTRIBUTED aggregate (bounded-bucket shuffle) with the
     ``>1 distinct version`` filter applied inside each bucket — only
     base_ids that are actually multi-versioned (tiny in practice) ever
     reach the driver;
  2. ``ray.put`` that {base_id: max_version} dict once; filter inside
     ``map_batches`` — no full shuffle of document payloads.

The (rare) pathological case — nearly every doc versioned — still only
collects the multi-version keys, never the whole id universe; the
shuffle stays over (base_id, version) pairs, never payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.textkit import split_versioned_doc_id
from ..ops.shuffle import bucketed_groupby


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


def _distinct_bv(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: distinct (base_id, version) rows — shrinks
    the shuffle input to distinct-keys-per-batch."""
    df = batch.to_pandas().drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False)


def _multi_version_max(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per bucket (sees ALL rows of its base_ids): keep only base_ids
    with >1 distinct version, with their max version — the n>1 filter
    runs BEFORE anything returns toward the driver."""
    g = pdf.groupby("base_id")["version"].agg(["max", "nunique"])
    g = g[g["nunique"] > 1]
    return pd.DataFrame({"base_id": g.index,
                         "max_version": g["max"].astype("int64")})


def compute_latest_versions(docs) -> dict[str, int]:
    """→ {base_id: latest_version} for base_ids with >1 version.
    Fully distributed; the collected frame holds multi-version keys
    ONLY (re-uploaded documents — rare), never the id universe."""
    dup = bucketed_groupby(
        (docs.select_columns(["doc_id"])
         .map_batches(_base_ver, batch_format="pyarrow")
         .map_batches(_distinct_bv, batch_format="pyarrow")),
        "base_id", _multi_version_max).to_pandas()
    if dup.empty:
        return {}
    return dict(zip(dup["base_id"], dup["max_version"].astype(int)))


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
