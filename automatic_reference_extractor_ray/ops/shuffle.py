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
same data movement a hash shuffle performs on a real cluster.

``bucketed_join`` is the equi-join built on the same primitive: both
sides are hash-bucketed on the join key, unioned into one stream (with
an explicit unified schema so blocks stay Arrow-convertible), and each
bucket runs one pandas merge — the standard distributed hash join.  It
exists so candidate-pair verification can join pairs against per-doc
payloads WITHOUT broadcasting a whole-corpus map to the driver.

Bucket sizing: ``num_buckets=None`` derives the count from the cluster
CPU count (2 per core, floor 32) and, when the caller can estimate it,
the input size — per-bucket memory is ~``data_bytes / num_buckets``, so
buckets must grow with the input, not stay fixed.  Outputs are
bucket-count invariant (property-tested), so sizing is purely a
memory/parallelism dial.

Keys must be flat (string/int/float) columns; buckets are assigned with
a deterministic stable hash so results are reproducible across runs and
workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BUCKET_COL = "__bucket"
SIDE_COL = "__side"

# per-bucket payload target when the caller supplies a size estimate:
# one bucket's rows materialize in one map_groups task
TARGET_BUCKET_BYTES = 256 << 20


def auto_num_buckets(size_bytes: int | None = None,
                     min_buckets: int = 32) -> int:
    """Bucket count scaled to the cluster (2/core) and, if estimable,
    the input size (≥ size/256MB so one bucket fits a task heap)."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 32
    except Exception:                                      # noqa: BLE001
        cpus = 32
    nb = max(min_buckets, 2 * cpus)
    if size_bytes:
        nb = max(nb, -(-int(size_bytes) // TARGET_BUCKET_BYTES))
    return nb


def _bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    # pandas' C-vectorized row hash; deterministic across processes
    # (fixed default hash_key, no PYTHONHASHSEED) — a per-row Python
    # hash would dominate wall time on multi-million-row pair tables
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def coalesce_blocks(ds, per_core: int = 2):
    """Streaming split/merge to ~``per_core`` blocks per cluster core
    BEFORE a sort-based groupby: Ray's sort pays driver/ref overhead
    that grows with the square of the input block count, while upstream
    maps deliberately run many small tasks — feeding hundreds of tiny
    blocks straight into a sort serializes its tail (the stitch lesson,
    measured 34→20 s at 120k docs, and the dedup_components round-growth
    bug).  ``repartition(shuffle=False)`` merges adjacent blocks only —
    no exchange."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 16
    except Exception:                                      # noqa: BLE001
        cpus = 16
    return ds.repartition(per_core * cpus, shuffle=False)


def bucketed_groupby(ds, keys: list[str] | str, fn,
                     num_buckets: int | None = None):
    """Exact grouped computation over arbitrarily many keys.

    ``fn(pdf) -> pdf`` receives one complete hash bucket (every row of
    every key assigned to it) and typically does a pandas groupby
    inside.  The Ray-level shuffle sees ``num_buckets`` groups only.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    nb = num_buckets or auto_num_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[BUCKET_COL] = (_bucket_of(df, keys, nb)
                          if len(df) else np.array([], dtype=np.int64))
        return df

    return (coalesce_blocks(ds.map_batches(add_bucket,
                                           batch_format="pandas"))
            .groupby(BUCKET_COL)
            .map_groups(lambda g: fn(g.drop(columns=BUCKET_COL)),
                        batch_format="pandas"))


def bucketed_agg(ds, keys: list[str] | str, aggs: dict[str, tuple[str, str]],
                 num_buckets: int | None = None):
    """Named-aggregation convenience: ``aggs`` as in pandas
    ``DataFrame.agg`` — {out_col: (in_col, how)}."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby(keys, sort=False).agg(
            **{o: pd.NamedAgg(c, h) for o, (c, h) in aggs.items()}
        ).reset_index()

    return bucketed_groupby(ds, keys, agg, num_buckets)


def bucketed_distinct(ds, keys: list[str] | str,
                      num_buckets: int | None = None):
    """Global DISTINCT over the key columns."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return bucketed_groupby(
        ds, keys, lambda pdf: pdf.drop_duplicates(keys)[keys], num_buckets)


def pad_frame(df: pd.DataFrame, schema: dict[str, str]) -> pd.DataFrame:
    """Project ``df`` onto a unified {col: dtype-str} schema: missing
    columns are filled with a dtype-appropriate default (0 / "") so
    every block has identical names AND dtypes — mixed-type object
    columns would break Arrow block conversion mid-shuffle.  The single
    source of truth for this rule (the join and the grouped pair join
    both build their tagged streams with it)."""
    out = pd.DataFrame(index=df.index)
    for col, dtype in schema.items():
        if col in df.columns:
            out[col] = df[col].to_numpy() if dtype != "object" else df[col]
        elif dtype == "object":
            out[col] = ""
        else:
            out[col] = np.zeros(len(df), dtype=dtype)
        if dtype != "object":
            out[col] = out[col].astype(dtype)
    return out


def typed_empty_if_blank(df: pd.DataFrame):
    """0-row outputs leave a bucket fn as TYPED Arrow tables.

    A 0-row pandas block with object columns trips Ray's pandas size
    estimator inside the worker ("cannot call `vectorize` on size 0
    inputs") and ships a schema-less PandasBlockSchema — neither is
    reachable by a driver-side log filter.  An Arrow table with string
    columns for the objects carries its schema and sizes to 0 bytes
    cleanly.  Non-empty frames pass through untouched (no conversion
    cost on the hot path)."""
    if len(df):
        return df
    import pyarrow as pa
    cols = {}
    for c in df.columns:
        if df[c].dtype == object:
            cols[c] = pa.array([], pa.string())
        else:
            cols[c] = pa.array([], pa.from_numpy_dtype(df[c].dtype))
    return pa.table(cols)


def canon_series(s: pd.Series, dtype: str) -> pd.Series:
    """Dtype-canonical view of a key column — equal key VALUES must
    hash equally even when blocks round-trip Arrow/pandas and flip
    between int64 and object."""
    return s.astype(object) if dtype == "object" else s.astype(dtype)


def buckets_for_values(s: pd.Series, dtype: str,
                       num_buckets: int) -> np.ndarray:
    """Bucket assignment for one key column's VALUES under the declared
    dtype (see ``canon_series``)."""
    if not len(s):
        return np.array([], dtype=np.int64)
    return _bucket_of(pd.DataFrame({"k": canon_series(s, dtype)}),
                      ["k"], num_buckets)


def buckets_for_key_cols(df: pd.DataFrame, cols: list[str],
                         schema: dict[str, str],
                         num_buckets: int) -> np.ndarray:
    """``buckets_for_values`` over a COMPOSITE key — the row hash runs
    on the dtype-canonical view of every key column, so both sides of
    a multi-key join land in the same bucket regardless of Arrow/pandas
    dtype round-trips."""
    if not len(df):
        return np.array([], dtype=np.int64)
    kf = pd.DataFrame({c: canon_series(df[c], schema[c]) for c in cols})
    return _bucket_of(kf, cols, num_buckets)


def _pad_to_schema(df: pd.DataFrame, schema: dict[str, str],
                   side: int) -> pd.DataFrame:
    out = pad_frame(df, schema)
    out[SIDE_COL] = np.full(len(df), side, dtype=np.int8)
    return out


def bucketed_join(left, right, on: str,
                  left_schema: dict[str, str], right_schema: dict[str, str],
                  num_buckets: int | None = None, post=None,
                  how: str = "inner"):
    """Distributed equi-join on one key column present in BOTH sides
    under the same name and dtype.  ``how``: ``inner`` (default),
    ``left`` (right columns padded 0/"" for unmatched keys), ``semi``
    (left rows with a match, left columns only) or ``anti`` (left rows
    without a match, left columns only) — the last two are the
    distributed EXISTS / NOT EXISTS a result-reconciliation or
    dimension-filter step needs.

    ``left_schema`` / ``right_schema`` declare each side's full column
    set as {col: dtype-str} (``"int64"``, ``"object"``, ...); non-key
    columns must be DISJOINT between sides so output ownership is
    unambiguous.  Both sides are hash-bucketed on ``on``'s VALUES,
    projected onto the unified schema (padded columns get 0/"" so every
    block keeps identical, Arrow-convertible dtypes), unioned, and each
    bucket runs one pandas merge over the sides' real columns only.

    This is the broadcast-free path for candidate-pair verification:
    pairs ⋈ per-doc payloads moves only payload rows through the
    shuffle — never a driver-side whole-corpus map.

    ``post(merged_pdf) -> pdf`` (optional) runs on each bucket's merge
    result INSIDE the map_groups task — use it to verify/shrink rows
    (e.g. drop heavy payload columns) before they re-enter the object
    store.  It must handle empty input and return a stable schema.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    overlap = (set(left_schema) & set(right_schema)) - {on}
    if overlap:
        raise ValueError(f"non-key columns present on both sides: {overlap}")
    if left_schema[on] != right_schema[on]:
        raise ValueError(
            f"join key dtype mismatch: {left_schema[on]} vs {right_schema[on]}")
    schema = {**left_schema, **{k: v for k, v in right_schema.items()
                                if k != on}}
    lcols = list(left_schema)
    rcols = list(right_schema)
    nb = num_buckets or auto_num_buckets()

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = _pad_to_schema(df, schema, side)
            out[BUCKET_COL] = buckets_for_values(df[on], schema[on], nb)
            return out
        return fn

    lt = left.map_batches(tag(0), batch_format="pandas")
    rt = right.map_batches(tag(1), batch_format="pandas")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g[SIDE_COL] == 0][lcols]
        r = g[g[SIDE_COL] == 1][rcols]
        if how in ("semi", "anti"):
            matched = l[on].isin(set(r[on]))
            merged = l[matched if how == "semi" else ~matched]
            merged = merged.reset_index(drop=True)
        elif how == "left":
            merged = l.merge(r, on=on, how="left")
            # unmatched rows get the schema's 0/"" defaults, keeping
            # every block's dtypes identical (NaN would upcast ints)
            merged = pad_frame(merged.fillna(
                {c: "" if schema[c] == "object" else 0
                 for c in rcols if c != on}), schema)
        else:
            merged = l.merge(r, on=on, how="inner")[list(schema)]
        out = post(merged) if post is not None else merged
        return typed_empty_if_blank(out)

    return (coalesce_blocks(lt.union(rt))
            .groupby(BUCKET_COL)
            .map_groups(merge_bucket, batch_format="pandas"))


def salted_lookup_join(left, right, on: str | list[str], salt_col: str,
                       left_schema: dict[str, str],
                       right_schema: dict[str, str],
                       num_buckets: int | None = None, salts: int = 4,
                       how: str = "inner", post=None):
    """``bucketed_join`` for a HOT-KEY lookup: ``right`` is keyed by
    ``on`` with a small payload per key (a dimension / removal set /
    frequency table), but some keys are hot — a stopword's tf rows, a
    boilerplate line's doc-lines — so hashing the exchange purely on
    the key would concentrate a data-scaling row count in one task.

    Left rows shard on ``(key-bucket, hash(salt_col) % salts)`` and
    every right row replicates to all ``salts`` shards of its key
    bucket, so a key present in half the corpus splits across
    ``salts`` tasks at the cost of ``salts``-fold right-side
    duplication (fine: the right side is one row per DISTINCT key —
    or any duplicate-keyed stream for ``semi``/``anti``, whose
    membership test is duplicate-insensitive).  The shard id folds
    back into ``num_buckets`` Ray-level groups (mod), so the salt
    factor spreads hot keys WITHOUT multiplying the sort-shuffle's
    group count — group sizes stay balanced, only the hot key's rows
    change which groups they land in.  ``how``: ``inner`` (merge
    payload columns), ``semi`` / ``anti`` (filter left rows by
    right-key membership, left columns only).  Per-shard semantics
    equal the unsalted join because a left row meets every replica of
    its key's right row.  ``salts`` is the skew dial: raise it when a
    single key's rows exceed a task heap even at 1/4 spread.

    ``on`` may be a LIST of columns — the composite-key form the
    hashed-gram exchanges use (two int64 halves of a 128-bit gram
    hash): buckets come from the canonical row hash over all key
    columns and the semi/anti membership test runs on the key tuple.
    """
    if how not in ("inner", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    on_cols = [on] if isinstance(on, str) else list(on)
    overlap = (set(left_schema) & set(right_schema)) - set(on_cols)
    if overlap:
        raise ValueError(f"non-key columns present on both sides: {overlap}")
    schema = {**left_schema, **{k: v for k, v in right_schema.items()
                                if k not in on_cols}}
    lcols = list(left_schema)
    rcols = list(right_schema)
    nb = num_buckets or auto_num_buckets()

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = _pad_to_schema(df, schema, 0)
        b0 = buckets_for_key_cols(df, on_cols, left_schema, nb)
        salt = (pd.util.hash_array(df[salt_col].to_numpy()) % salts
                ).astype(np.int64)
        out[BUCKET_COL] = (b0 * salts + salt) % nb
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        rep = df.loc[df.index.repeat(salts)].reset_index(drop=True)
        out = _pad_to_schema(rep, schema, 1)
        b0 = buckets_for_key_cols(rep, on_cols, right_schema, nb)
        out[BUCKET_COL] = (b0 * salts + np.tile(
            np.arange(salts, dtype=np.int64), len(df))) % nb
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[BUCKET_COL])
        l = g[g[SIDE_COL] == 0][lcols]
        r = g[g[SIDE_COL] == 1][rcols]
        if how in ("semi", "anti"):
            if len(on_cols) == 1:
                matched = l[on_cols[0]].isin(set(r[on_cols[0]]))
            else:
                matched = pd.MultiIndex.from_frame(l[on_cols]).isin(
                    pd.MultiIndex.from_frame(r[on_cols].drop_duplicates()))
            merged = l[matched if how == "semi" else ~matched]
            merged = merged.reset_index(drop=True)
        else:
            merged = l.merge(r, on=on_cols, how="inner")[list(schema)]
        out = post(merged) if post is not None else merged
        return typed_empty_if_blank(out)

    return (coalesce_blocks(
                left.map_batches(tag_left, batch_format="pandas")
                .union(right.map_batches(tag_right, batch_format="pandas")))
            .groupby(BUCKET_COL)
            .map_groups(merge_bucket, batch_format="pandas"))
