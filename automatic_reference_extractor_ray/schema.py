"""Fixed Arrow schemas (the reference's implicit XML/tmp-file formats
become declared schemas, SURVEY.md §1.2)."""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

# input: interleaved text+media documents (BASELINE.md input shape)
DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

# intermediate: one work unit per span
UNITS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("src_offset", pa.int32()),
    ("kind", pa.string()),          # 'text' | 'media'
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("cost", pa.int64()),           # skew cost estimate (bytes-equivalent)
])

FIELD_COLUMNS = [
    ("authors", pa.list_(pa.string())),
    ("title", pa.string()),
    ("journal", pa.string()),
    ("date", pa.string()),
    ("publisher", pa.string()),
    ("location", pa.string()),
    ("volume", pa.string()),
    ("issue", pa.string()),
    ("pages", pa.string()),
]

# per-unit extraction records (pre-stitch; ``seq`` orders within a unit)
RECORDS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("src_offset", pa.int32()),
    ("seq", pa.int32()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("detector", pa.string()),
    ("namer", pa.string()),
    ("x1", pa.int32()), ("y1", pa.int32()),
    ("x2", pa.int32()), ("y2", pa.int32()),
    ("column", pa.int32()),
] + FIELD_COLUMNS)

# final output: per-document ordered reference spans (span_idx = rank)
REFS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("detector", pa.string()),
    ("namer", pa.string()),
    ("x1", pa.int32()), ("y1", pa.int32()),
    ("x2", pa.int32()), ("y2", pa.int32()),
    ("column", pa.int32()),
    ("src_offset", pa.int32()),
] + FIELD_COLUMNS)

RECORD_FIELD_KEYS = [name for name, _ in FIELD_COLUMNS]
