"""Input validation — the first ``map_batches`` of any ingest (S1's
"extension whitelist" analogue, LOCDB-V3/fileProcessor.py:24-25, as a
schema/content contract instead of filename sniffing).

``validate_documents`` checks each batch against DOCUMENTS_SCHEMA and
the span-content rules and either raises a precise error (fail-fast
default, pointing at the first offending row) or — in quarantine mode —
splits offenders out so the pipeline continues on clean rows and the
bad ones land in an auditable side table, consistent with the
poison-row policy in stages/extract.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import DOCUMENTS_SCHEMA

VALID_KINDS = ("text", "media")


def _batch_errors(batch: pa.Table) -> list[tuple[int, str]]:
    """→ [(row_index, reason)] for every invalid row in the batch."""
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
        offsets = [s["offset"] for s in spans]
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


def validate_documents(docs, quarantine: bool = False):
    """Fail-fast (default): raise on the first invalid row with its
    doc_id and reason.  ``quarantine=True``: drop invalid rows from the
    stream and tag them in an ``_invalid_reason`` column instead — use
    ``ds.filter`` on it downstream to route the side table."""

    def check(batch: pa.Table) -> pa.Table:
        errs = _batch_errors(batch)
        if not errs:
            return batch
        if not quarantine:
            i, reason = errs[0]
            doc = batch.column("doc_id")[i].as_py()
            raise ValueError(
                f"invalid document row (doc_id={doc!r}): {reason}")
        mask = np.ones(batch.num_rows, dtype=bool)
        for i, _ in errs:
            mask[i] = False
        return batch.filter(pa.array(mask))

    return docs.map_batches(check, batch_format="pyarrow")
