"""The persisted OCR ``lines`` intermediate + interactive lookup (E3).

The reference keeps per-column ``all-text-boxes`` temp files alive so
``/segmentReference/`` can re-run a spatial join against a user-drawn
box later (LOCDB-V3/imgProcessing.py:987-1083, app.py:241-271).  The
rebuild's analogue is a first-class queryable table:

    lines(media_ref, line_no, text, x1, y1, x2, y2)

produced by the warm-OCR actor stage (one hOCR parse per page, boxes in
absolute page coordinates — the reference's per-column x-offset
arithmetic, including its cumulative-offset bug at
imgProcessing.py:994-999, is an artifact of cropped files and
documented as intentionally not reproduced).

``segment_lookup`` is then the J8 join: user box → IoU > 0 lines →
box union (G1) → joined/ hyphenation-repaired text → field parse — a
point lookup over the table, no pipeline re-run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.boxes import iou, union_box
from ..functions.fields import parse_fields
from ..functions.textkit import collapse_ws, join_lines_repaired
from ..sources.media_store import make_store

LINES_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("line_no", pa.int32()),
    ("text", pa.string()),
    ("x1", pa.int32()), ("y1", pa.int32()),
    ("x2", pa.int32()), ("y2", pa.int32()),
])


class OcrLines:
    """Actor-pool stage: (media_ref) rows → one row per OCR line.
    Payload resolved inside the actor; bytes never enter blocks."""

    def __init__(self, store_spec: str = "synth"):
        from ..functions.hocr import parse_hocr
        self.parse = parse_hocr
        self.store = make_store(store_spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in LINES_SCHEMA.names}
        for ref in batch.column("media_ref").to_pylist():
            obs = self.parse(self.store.fetch(ref).decode("utf-8"))
            for i, (text, box) in enumerate(zip(obs.lines, obs.line_boxes)):
                cols["media_ref"].append(ref)
                cols["line_no"].append(i)
                cols["text"].append(text)
                cols["x1"].append(int(box[0])); cols["y1"].append(int(box[1]))
                cols["x2"].append(int(box[2])); cols["y2"].append(int(box[3]))
        return pa.table({n: pa.array(cols[n], LINES_SCHEMA.field(n).type)
                         for n in LINES_SCHEMA.names})


def ocr_lines(media_refs_ds, store_spec: str = "synth",
              concurrency=(1, 8), batch_size: int = 32):
    """media_ref Dataset → lines Dataset (LINES_SCHEMA)."""
    return media_refs_ds.map_batches(
        OcrLines, fn_constructor_kwargs=dict(store_spec=store_spec),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def write_lines_table(media_refs_ds, out_dir: str, **kw) -> None:
    """Persist the queryable intermediate (the E3 enabler)."""
    ocr_lines(media_refs_ds, **kw).write_parquet(out_dir)


def page_lookup_all(lines_ds):
    """Batch form of the J8 lookup for the driver gate: for EVERY page,
    a deterministic user box (the union of its first two lines) is
    looked up — IoU > 0 lines, box union, repaired+collapsed text —
    inside the bounded-bucket shuffle, one output row per page.
    Exercises the lookup machinery distributed (no per-page driver
    round-trips) and is SQL-oracle-checkable."""
    import pandas as pd

    from ..ops.shuffle import bucketed_groupby

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ref, g in pdf.groupby("media_ref", sort=False):
            g = g.sort_values("line_no")
            boxes = g[["x1", "y1", "x2", "y2"]].to_numpy(np.int64)
            head = boxes[:2]
            ub = np.array([head[:, 0].min(), head[:, 1].min(),
                           head[:, 2].max(), head[:, 3].max()])
            # strict-overlap (iou > 0): intersection area must be positive
            ix = np.minimum(boxes[:, 2], ub[2]) - np.maximum(boxes[:, 0], ub[0])
            iy = np.minimum(boxes[:, 3], ub[3]) - np.maximum(boxes[:, 1], ub[1])
            hit = (ix > 0) & (iy > 0)
            texts = g["text"].to_numpy()
            merged = union_box(boxes[hit])
            raw = collapse_ws(join_lines_repaired(list(texts[hit])))
            rows.append((ref, raw, *(int(v) for v in merged)))
        return pd.DataFrame(rows, columns=["media_ref", "raw_string",
                                           "x1", "y1", "x2", "y2"])

    return bucketed_groupby(lines_ds, "media_ref", per_bucket)


def segment_lookup(lines_tbl: pa.Table, media_ref: str,
                   user_box: tuple[int, int, int, int]) -> dict | None:
    """J8 point lookup: IoU > 0 lines of one page vs the user box →
    union box + joined text + parsed fields (imgProcessing.py:1022-1075,
    any overlap counts: ``if bb_intersection(...) > 0``).

    ``lines_tbl`` is the (pre-filtered or full) lines table — callers
    with a Dataset should ``ds.filter`` on media_ref first so only one
    page's rows reach the driver."""
    import pyarrow.compute as pc
    page = lines_tbl.filter(pc.equal(lines_tbl["media_ref"], media_ref))
    if page.num_rows == 0:
        return None
    page = page.sort_by([("line_no", "ascending")])
    boxes = np.stack([page.column(c).to_numpy() for c in ("x1", "y1", "x2", "y2")],
                     axis=1).astype(np.int64)
    ub = np.asarray(user_box, np.int64)
    hits = [i for i in range(boxes.shape[0]) if iou(ub, boxes[i]) > 0]
    if not hits:
        return None
    merged = union_box(boxes[hits])
    texts = page.column("text").to_pylist()
    raw = collapse_ws(join_lines_repaired([texts[i] for i in hits]))
    rec = {"raw_string": raw,
           "coordinates": tuple(int(v) for v in merged),
           "detector": "Image", "namer": "Grobid"}
    rec.update(parse_fields(raw))
    return rec
