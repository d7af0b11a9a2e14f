"""Input validation — the first ``map_batches`` of any ingest (S1's
"extension whitelist" analogue, LOCDB-V3/fileProcessor.py:24-25, as a
schema/content contract instead of filename sniffing).

``validate_documents`` checks each batch against DOCUMENTS_SCHEMA and
the span-content rules.  Two modes:

  fail-fast (default)   raise a precise error naming the first
                        offending row's doc_id and reason;
  quarantine            drop invalid rows from the stream so the
                        pipeline continues on clean rows.  If
                        ``quarantine_dir`` is given, each batch's
                        offenders are ALSO written there as parquet
                        tagged with an ``_invalid_reason`` column — a
                        dead-letter side table each task appends to
                        independently (auditable, no shuffle).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import DOCUMENTS_SCHEMA

VALID_KINDS = ("text", "media")
INVALID_REASON_COL = "_invalid_reason"


def _batch_errors(batch: pa.Table) -> list[tuple[int, str]]:
    """→ [(row_index, reason)] for every invalid row in the batch.
    Malformed structures (null span element, null offset/kind) are row
    errors, never exceptions — quarantine mode must survive them."""
    errs: list[tuple[int, str]] = []
    names = set(batch.schema.names)
    missing = [n for n in DOCUMENTS_SCHEMA.names if n not in names]
    if missing:
        raise ValueError(
            f"documents table is missing column(s) {missing}; "
            f"expected schema {DOCUMENTS_SCHEMA}")
    ids = batch.column("doc_id")
    if ids.null_count:
        for i in np.flatnonzero(~np.asarray(pc.is_valid(ids))):
            errs.append((int(i), "null doc_id"))
    for i, spans in enumerate(batch.column("spans").to_pylist()):
        if spans is None:
            errs.append((i, "null spans list"))
            continue
        if any(s is None for s in spans):
            errs.append((i, "null span element"))
            continue
        offsets = [s["offset"] for s in spans]
        if any(o is None for o in offsets):
            errs.append((i, "null span offset"))
            continue
        if sorted(offsets) != list(range(len(spans))):
            errs.append((i, f"offsets not dense 0..{len(spans) - 1}: {offsets}"))
            continue
        for s in spans:
            if s["kind"] not in VALID_KINDS:
                errs.append((i, f"invalid span kind {s['kind']!r}"))
                break
            if s["kind"] == "media" and not s["media_ref"]:
                errs.append((i, "media span with empty media_ref"))
                break
            if s["kind"] == "text" and s["media_ref"]:
                errs.append((i, "text span carrying a media_ref"))
                break
    return errs


def validate_documents(docs, quarantine: bool = False,
                       quarantine_dir: str | None = None):
    """Fail-fast (default): raise on the first invalid row with its
    doc_id and reason.  ``quarantine=True``: drop invalid rows from the
    stream; with ``quarantine_dir`` set, offenders are appended there as
    a parquet side table tagged with ``_invalid_reason``."""
    if quarantine_dir and not quarantine:
        raise ValueError("quarantine_dir requires quarantine=True")
    if quarantine_dir:
        os.makedirs(quarantine_dir, exist_ok=True)

    def check(batch: pa.Table) -> pa.Table:
        errs = _batch_errors(batch)
        if not errs:
            return batch
        if not quarantine:
            i, reason = errs[0]
            doc = batch.column("doc_id")[i].as_py()
            raise ValueError(
                f"invalid document row (doc_id={doc!r}): {reason}")
        # first reason wins when a row trips several rules (null doc_id
        # AND bad spans) — one tag per quarantined row
        reason_by_row: dict[int, str] = {}
        for i, r in errs:
            reason_by_row.setdefault(i, r)
        mask = np.ones(batch.num_rows, dtype=bool)
        mask[list(reason_by_row)] = False
        if quarantine_dir:
            import hashlib

            import pyarrow.parquet as pq
            bad = batch.filter(pa.array(~mask))
            bad = bad.append_column(
                INVALID_REASON_COL,
                pa.array([reason_by_row[i] for i in sorted(reason_by_row)],
                         pa.string()))
            # content-addressed file name: this map_batches is LAZY and
            # Ray may re-execute it (second consumer, task retry) — a
            # random name would append duplicate offender rows; the
            # deterministic name makes re-execution overwrite instead
            digest = hashlib.md5("\x1f".join(
                f"{bad.column('doc_id')[i].as_py()}|{reason_by_row[k]}"
                for i, k in enumerate(sorted(reason_by_row))
            ).encode("utf-8")).hexdigest()
            pq.write_table(bad, os.path.join(
                quarantine_dir, f"bad-{digest}.parquet"))
        return batch.filter(pa.array(mask))

    return docs.map_batches(check, batch_format="pyarrow")


def read_quarantined(quarantine_dir: str) -> pa.Table:
    """The accumulated dead-letter side table (empty table if none)."""
    import pyarrow.parquet as pq
    files = sorted(
        os.path.join(quarantine_dir, f)
        for f in os.listdir(quarantine_dir) if f.endswith(".parquet")
    ) if os.path.isdir(quarantine_dir) else []
    if not files:
        return DOCUMENTS_SCHEMA.empty_table().append_column(
            INVALID_REASON_COL, pa.array([], pa.string()))
    return pa.concat_tables([pq.read_table(f) for f in files])
