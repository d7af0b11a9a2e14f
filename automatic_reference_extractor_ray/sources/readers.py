"""``read_parquet_clean`` — ``ray.data.read_parquet`` minus the
``b'pandas'`` schema metadata pandas-written files carry.

Why it exists: ``pyarrow.Schema.__hash__`` raises ``TypeError:
unhashable type: 'dict'`` on a schema holding pandas metadata, so every
Ray Data block concat over such blocks falls off the hashed-schema
dedup fast path and logs ``Failed to hash the schemas (for
deduplication)`` from each worker — per concat, per task.  At corpus
scale that is both log flooding the driver can't filter (worker-side
emit) and a skipped Ray fast path on EVERY batch build.  Passing an
explicit metadata-free ``schema=`` to ``read_parquet`` makes the read
emit clean blocks; downstream tables built with ``pa.table`` are
already metadata-free.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def clean_schema(paths, columns: list[str] | None = None) -> pa.Schema:
    """The file footer's schema, metadata stripped and projected onto
    ``columns`` (read-side projection must match the schema arg)."""
    import pyarrow.dataset as pads
    s = pads.dataset(paths).schema.remove_metadata()
    if columns is not None:
        s = pa.schema([s.field(c) for c in columns])
    return s


def read_parquet_clean(paths, *, columns: list[str] | None = None, **kw):
    """Drop-in for ``ray.data.read_parquet(paths, columns=...)`` whose
    blocks carry a metadata-free (hashable) schema."""
    return rd.read_parquet(paths, columns=columns,
                           schema=clean_schema(paths, columns), **kw)


def read_docs_jsonl(paths, *, columns: list[str] | None = None,
                    dtypes: dict[str, str] | None = None, **kw):
    """Document corpus from JSON Lines — the raw-crawl-dump interchange
    format (one JSON object per line).  ``ray.data.read_json`` handles
    the distributed file split; this wrapper projects to ``columns``
    and pins pandas dtypes (``dtypes`` maps col → dtype-str, e.g.
    ``{"doc_id": "int64"}``) so a file whose first block happens to be
    all-missing in some field can't flip the corpus schema mid-read."""
    import pandas as pd

    ds = rd.read_json(paths, **kw)
    if columns is None and dtypes is None:
        return ds

    def project(b: pd.DataFrame) -> pd.DataFrame:
        if columns is not None:
            b = b[list(columns)]
        for c, t in (dtypes or {}).items():
            if c in b.columns:
                b = b.assign(**{c: b[c].astype(t)})
        return b

    return ds.map_batches(project, batch_format="pandas")


def read_docs_csv(paths, *, columns: list[str] | None = None,
                  dtypes: dict[str, str] | None = None, **kw):
    """Document corpus from CSV — same projection/dtype-pinning
    contract as ``read_docs_jsonl`` over ``ray.data.read_csv``."""
    import pandas as pd

    ds = rd.read_csv(paths, **kw)
    if columns is None and dtypes is None:
        return ds

    def project(b: pd.DataFrame) -> pd.DataFrame:
        if columns is not None:
            b = b[list(columns)]
        for c, t in (dtypes or {}).items():
            if c in b.columns:
                b = b.assign(**{c: b[c].astype(t)})
        return b

    return ds.map_batches(project, batch_format="pandas")


def write_docs_jsonl(ds, path: str, **kw):
    """JSONL sink — the interchange complement of ``read_docs_jsonl``:
    one JSON object per line, one file per block (so a re-read splits
    the same way and a failed writer re-runs only its block).  Thin
    over ``Dataset.write_json``; kept as a named seam so pipelines
    import read/write from one module and the format contract
    (roundtrip equality, pytest-pinned) has a single home."""
    return ds.write_json(path, **kw)
