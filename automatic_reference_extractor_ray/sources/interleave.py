"""Readers: materialize the interleaved documents Dataset.

``read_interleaved_docs`` derives the corpus deterministically from the
driver testdata's ``documents.parquet`` *id column only* (column-pruned
read; TESTDATA.md says use those tables as inputs) — every worker can
expand ids → spans inside ``map_batches`` with no other I/O.  A real
deployment replaces this with ``ray.data.read_lance(uri)`` over the same
schema; ``read_docs_parquet`` reads any parquet already in that shape.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..schema import DOCUMENTS_SCHEMA, SPAN_STRUCT
from .corpus import build_doc


def rows_to_docs_table(rows: list[dict]) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "spans": pa.array([r["spans"] for r in rows], pa.list_(SPAN_STRUCT)),
    })


def doc_keys_for_ids(ids, repeat: int = 1) -> list[str]:
    """Stable doc keys from integer testdata ids; ``repeat`` > 1 scales
    the corpus for benchmarking (replica index is part of the key, so
    every replica is a distinct deterministic document)."""
    keys = []
    for i in ids:
        for r in range(repeat):
            keys.append(f"doc-{int(i):06d}" if r == 0 else f"doc-{int(i):06d}-r{r}")
    return keys


def expand_ids_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    rows: list[dict] = []
    for key in doc_keys_for_ids(batch.column("doc_id").to_pylist(), repeat):
        in_rows, _ = build_doc(key)
        rows.extend(in_rows)
    return rows_to_docs_table(rows)


def read_interleaved_docs(sf_dir: str, repeat: int = 1,
                          override_num_blocks: int | None = None):
    from .readers import read_parquet_clean
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"],
                             **({"override_num_blocks": override_num_blocks}
                                if override_num_blocks else {}))
    return ids.map_batches(lambda b: expand_ids_batch(b, repeat),
                           batch_format="pyarrow", batch_size=64)


def read_interleaved_doc_ids(sf_dir: str, repeat: int = 1):
    """doc_id-only Dataset for the version-dedup pre-pass — the
    column-pruned read of a real deployment (no span/corpus
    materialization; at sf0.1 that pass otherwise regenerates the whole
    synthetic corpus just to look at ids)."""
    from .corpus import doc_ids_for_key

    def expand(batch: pa.Table) -> pa.Table:
        out: list[str] = []
        for key in doc_keys_for_ids(batch.column("doc_id").to_pylist(), repeat):
            out.extend(doc_ids_for_key(key))
        return pa.table({"doc_id": pa.array(out, pa.string())})

    from .readers import read_parquet_clean
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    return ids.map_batches(expand, batch_format="pyarrow", batch_size=512)


def read_docs_parquet(path: str):
    """Read an already-materialized interleaved docs table."""
    return rd.read_parquet(path, schema=DOCUMENTS_SCHEMA)


def read_docs_lance(uri: str, **kw):
    """Deployment reader: the Lance-backed documents table
    (``ray.data.read_lance`` — column projection + versioned table; the
    version-dedup G4 stage is then often unnecessary because Lance
    itself versions rows).  Gated: the ``lance`` wheel is not in the
    test container."""
    try:
        import lance  # noqa: F401
    except ImportError as e:                           # pragma: no cover
        raise ImportError(
            "read_docs_lance requires the 'lance' package; in this test "
            "environment use read_docs_parquet / read_interleaved_docs") from e
    return rd.read_lance(uri, **kw)                     # pragma: no cover


def read_interleaved_docs_cached(sf_dir: str, repeat: int = 1,
                                 cache_root: str = "/tmp/arx_corpus",
                                 columns: list[str] | None = None):
    """Benchmark reader: expand the synthetic corpus ONCE into a
    parquet cache and stream-read it thereafter.

    A deployment READS its corpus (Lance/parquet); regenerating every
    span procedurally inside the first map stage measures the corpus
    GENERATOR, not the engine (profiled: generation cost ≈ the whole
    rest of the pipeline at steady state).  The cache key includes the
    generator version, so corpus-code changes invalidate it; the write
    is atomic (tmp dir + rename), so concurrent bench processes race
    safely."""
    import os
    import shutil

    from .goldens import GOLDEN_VERSION
    name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(cache_root, f"{name}-r{repeat}-v{GOLDEN_VERSION}")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        tmp = f"{out}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        read_interleaved_docs(sf_dir, repeat).write_parquet(tmp)
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write(GOLDEN_VERSION)
        try:
            os.rename(tmp, out)
        except OSError:                       # concurrent writer won
            shutil.rmtree(tmp, ignore_errors=True)
    if columns is not None:                  # pruned read (id pre-pass)
        return rd.read_parquet(out, columns=columns,
                               file_extensions=["parquet"])
    # ~8 tasks per core: the downstream extraction actor pool gets one
    # task per block, and coarse blocks quantize into waves — measured
    # at 32 CPUs / 80 blocks the pool idled 40% on the last ragged
    # wave (2.5 waves of ~5 s tasks), while 8 waves of sub-second
    # tasks keep every actor busy at ANY leg size, which is exactly
    # what the 8-vs-32 scaling comparison needs
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:                                      # noqa: BLE001
        cpus = 8
    return rd.read_parquet(out, schema=DOCUMENTS_SCHEMA,
                           file_extensions=["parquet"],
                           override_num_blocks=8 * cpus)
