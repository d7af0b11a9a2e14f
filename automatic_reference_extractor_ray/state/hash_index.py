"""Persistent content-hash index for incremental dedup at corpus scale.

``ops/dedup.incremental_dedup`` re-hashes the base corpus on every
increment; at 100 TB the base never changes between increments, so its
normalized-content hashes belong on disk, partitioned by hash prefix:

    <index_dir>/bucket=<b>/*.parquet   distinct content hashes, b =
                                       int(hash[:8], 16) % num_parts
    <index_dir>/_META.json             {"num_parts": P}

Landing an increment then reads ONLY the index buckets its own hashes
map to — a small increment touches a few buckets, never the base
corpus and never the whole index — and ``append=True`` folds the
increment's surviving hashes back in, so the index is self-maintaining
across daily landings.  Writes are atomic (tmp dir + rename), matching
``state/lineage.py``'s convention.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pandas as pd

META = "_META.json"


def _bucket_of_hash(h: pd.Series, num_parts: int) -> np.ndarray:
    """Deterministic bucket from the hex hash's first 8 chars — stable
    across processes (no Python hash())."""
    if not len(h):
        return np.array([], dtype=np.int64)
    return (h.str.slice(0, 8).apply(int, base=16).to_numpy(np.int64)
            % num_parts)


def _hashes_with_bucket(docs, num_parts: int):
    from ..ops.dedup import add_content_hash

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        out = add_content_hash(pdf)
        out["bucket"] = (_bucket_of_hash(out["content_hash"], num_parts)
                         if len(out) else
                         np.array([], dtype=np.int64))
        return out

    return docs.map_batches(f, batch_format="pandas")


def build_hash_index(docs, index_dir: str, num_parts: int = 64,
                     num_buckets: int | None = None) -> None:
    """One pass over the base corpus → distinct hashes on disk.

    The distinct runs through the bounded-bucket shuffle (hash-count
    groups) and the write is hive-partitioned on the index bucket, so
    every stage streams; ``num_parts`` is the read-pruning granularity
    and must grow with the corpus (aim ≈ index_bytes / 64 MB).
    """
    from ..ops.shuffle import bucketed_distinct

    tmp = f"{index_dir}.tmp-{uuid.uuid4().hex[:8]}"
    # distinct over (hash, bucket) — bucket is a pure function of the
    # hash, so the pair-distinct IS the hash-distinct, and the bucket
    # column survives for the partitioned write
    distinct = bucketed_distinct(
        _hashes_with_bucket(docs, num_parts).map_batches(
            lambda d: d[["content_hash", "bucket"]], batch_format="pandas"),
        ["content_hash", "bucket"], num_buckets)
    distinct.write_parquet(tmp, partition_cols=["bucket"])
    with open(os.path.join(tmp, META), "w") as f:
        json.dump({"num_parts": num_parts}, f)
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.rename(tmp, index_dir)


def _index_meta(index_dir: str) -> int:
    with open(os.path.join(index_dir, META)) as f:
        return int(json.load(f)["num_parts"])


def _read_index_buckets(index_dir: str, buckets: set[int]):
    """Dataset of base hashes from ONLY the named bucket partitions
    (absent dirs mean no base hashes there)."""
    import ray.data as rd

    dirs = [os.path.join(index_dir, f"bucket={b}") for b in sorted(buckets)]
    # this ray version reads a LIST of paths as files, not dirs —
    # expand each hive partition dir to its parquet files
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return rd.from_pandas(
            pd.DataFrame({"content_hash": pd.Series([], dtype=object)}))
    return rd.read_parquet(paths, columns=["content_hash"])


def incremental_dedup_indexed(new, index_dir: str,
                              num_buckets: int | None = None,
                              append: bool = False):
    """``ops/dedup.incremental_dedup`` against the on-disk index:
    verdicts are identical (tested), but the base side is a pruned
    index read instead of a corpus re-hash.

    → one verdict row per NEW doc: (doc_id, content_hash, keep);
    with ``append=True`` the surviving (keep=1) hashes are also written
    into the index buckets, so re-landing the same increment yields
    keep=0 everywhere.

    The increment's bucket set is a tiny driver-side aggregate (≤
    num_parts integers) — the one intentionally-small collect here.
    With ``append`` the verdicts are materialized (object-store blocks,
    spillable) so the dedup pipeline isn't re-executed for the write —
    the increment is the small side by definition.
    """
    from ..ops.dedup import incremental_dedup

    num_parts = _index_meta(index_dir)

    needed = set()
    for row in _hashes_with_bucket(new, num_parts).map_batches(
            lambda d: d[["bucket"]].drop_duplicates(),
            batch_format="pandas").take_all():
        needed.add(int(row["bucket"]))

    base = _read_index_buckets(index_dir, needed)
    verdicts = incremental_dedup(base, new, num_buckets,
                                 base_prehashed=True)

    if append:
        def survivors(d: pd.DataFrame) -> pd.DataFrame:
            k = d[d["keep"] == 1][["content_hash"]].copy()
            k["bucket"] = _bucket_of_hash(k["content_hash"], num_parts)
            return k

        verdicts = verdicts.materialize()
        verdicts.map_batches(
            survivors, batch_format="pandas"
        ).write_parquet(index_dir, partition_cols=["bucket"])
    return verdicts
