"""The extraction stage: an actor-pool ``map_batches`` class.

One actor processes mixed work units (text spans and media spans) so the
pipeline needs a single pass over the input — no dataset branching (Ray
re-executes shared upstreams) and no payload materialization:

- text units run the stateless kernels (routing + M7/M8/M13 extractors,
  localizer/segmenter, field tokenizer);
- media units resolve ``media_ref`` → payload bytes through the media
  store *inside the actor* (object-store GET; bytes never enter Dataset
  blocks or shuffles), run the OCR engine (hOCR parse) and the per-page
  kernel (J1–J4, M14, M15, O1/O2).

State constructed once per actor in ``__init__`` (media store client,
compiled regexes via module import) — the reference reloaded its
Detectron models per image via subprocess (cold-start lamented at
LOCDB-V3/tools/infer_simple-custom.py:169-173); the actor pool is the
architectural fix.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import ExtractConfig
from ..functions.dockit import extract_text_unit
from ..functions.fields import parse_fields
from ..functions.hocr import parse_hocr
from ..functions.pagekit import process_page
from ..schema import RECORDS_SCHEMA, RECORD_FIELD_KEYS
from ..sources.media_store import make_store


class ExtractUnits:
    def __init__(self, cfg: ExtractConfig | None = None, store_spec: str = "synth"):
        self.cfg = cfg or ExtractConfig()
        self.store = make_store(store_spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in RECORDS_SCHEMA.names}
        doc_ids = batch.column("doc_id").to_pylist()
        offsets = batch.column("src_offset").to_pylist()
        kinds = batch.column("kind").to_pylist()
        texts = batch.column("text").to_pylist()
        refs = batch.column("media_ref").to_pylist()

        def emit(doc_id, off, seq, raw, media_ref, detector, namer,
                 box, column, fields):
            cols["doc_id"].append(doc_id)
            cols["src_offset"].append(off)
            cols["seq"].append(seq)
            cols["kind"].append("text")
            cols["text"].append(raw)
            cols["media_ref"].append(media_ref)
            cols["detector"].append(detector)
            cols["namer"].append(namer)
            cols["x1"].append(box[0]); cols["y1"].append(box[1])
            cols["x2"].append(box[2]); cols["y2"].append(box[3])
            cols["column"].append(column)
            for k in RECORD_FIELD_KEYS:
                v = fields.get(k, [] if k == "authors" else "")
                cols[k].append([str(a) for a in v] if k == "authors" else str(v))

        for doc_id, off, kind, text, media_ref in zip(
                doc_ids, offsets, kinds, texts, refs):
            # poison-row containment (SURVEY.md §4): a malformed unit
            # becomes ONE explicit kind='error' record instead of an
            # exception that kills the whole block — the reference's
            # bare-except swallow (imgProcessing.py:157-171) made
            # observable and filterable (refs.filter(kind != 'error'))
            try:
                if kind == "media":
                    payload = self.store.fetch(media_ref)
                    obs = parse_hocr(payload.decode("utf-8"))
                    for seq, r in enumerate(process_page(obs, self.cfg)):
                        emit(doc_id, off, seq, r["raw"], media_ref,
                             r["detector"], r["namer"], r["box"], r["column"],
                             parse_fields(r["raw"]))
                else:
                    for seq, r in enumerate(
                            extract_text_unit(text, self.cfg.min_ref_len)):
                        emit(doc_id, off, seq, r["text"], "", r["detector"],
                             r["namer"], (r["x1"], r["y1"], r["x2"], r["y2"]),
                             r["column"],
                             {k: r[k] for k in RECORD_FIELD_KEYS})
            except Exception as e:                     # noqa: BLE001
                rec = dict.fromkeys(RECORD_FIELD_KEYS, "")
                rec["authors"] = []
                emit(doc_id, off, 0, f"{type(e).__name__}: {e}"[:500],
                     media_ref, "Error", type(e).__name__, (0, 0, 0, 0),
                     0, rec)
                cols["kind"][-1] = "error"

        return pa.table(
            {n: pa.array(cols[n], type=RECORDS_SCHEMA.field(n).type)
             for n in RECORDS_SCHEMA.names})
