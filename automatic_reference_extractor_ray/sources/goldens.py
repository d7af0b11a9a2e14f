"""Golden/oracle table materialization (driver-side, pyarrow only).

Used by pytest (equality against the pipeline output) and by the
DuckDB oracle SQL in ``__ray_entry__`` (written under /tmp so the
oracle queries can ``read_parquet`` them).  Golden rows come from the
corpus generator's analytic computation — never from the pipeline.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import REFS_SCHEMA, SPAN_STRUCT
from .corpus import build_doc
from .interleave import doc_keys_for_ids

ORACLE_ROOT = "/tmp/arx_oracle"

def _generator_version() -> str:
    """Content hash of every module the synthetic corpus derives from.

    Was a hand-bumped constant; round 4 found a citation-template change
    that shipped WITHOUT the bump, leaving stale /tmp corpus caches that
    silently disagreed with freshly generated goldens (bench read 3,890
    refs where the gate's regenerated oracle said 3,892).  Deriving the
    version from the generator sources makes that class of staleness
    structurally impossible."""
    import hashlib
    d = os.path.dirname(__file__)
    fdir = os.path.join(os.path.dirname(d), "functions")
    h = hashlib.md5(b"golden-v4:")
    for name in ("corpus.py", "citegen.py", "pagegen.py", "goldens.py",
                 "interleave.py", "media_store.py"):
        with open(os.path.join(d, name), "rb") as f:
            h.update(f.read())
    # the analytic golden derivation also calls INTO the semantic
    # kernels (parse_fields, segment near-dup helpers, line joining,
    # box IoU) — a kernel change changes goldens, so it must change
    # the version too (found in round 4: a marker-regex fix in
    # segment.py altered image-doc goldens with no sources/ diff)
    for name in ("fields.py", "segment.py", "textkit.py", "editdist.py",
                 "boxes.py"):
        with open(os.path.join(fdir, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


GOLDEN_VERSION = _generator_version()


def golden_rows(doc_keys: list[str]) -> list[dict]:
    rows: list[dict] = []
    for key in doc_keys:
        _, golden = build_doc(key)
        rows.extend(golden)
    return rows


def golden_table(doc_keys: list[str]) -> pa.Table:
    rows = golden_rows(doc_keys)
    return pa.table({
        n: pa.array([r[n] for r in rows], REFS_SCHEMA.field(n).type)
        for n in REFS_SCHEMA.names})


def corpus_spans_table(doc_keys: list[str]) -> pa.Table:
    """The constructed interleaved corpus, flattened to one row per
    span — the oracle-side view of the *input* (route counts, version
    semantics, span stats are plain SQL over this)."""
    cols = {"doc_id": [], "offset": [], "kind": [], "text": [], "media_ref": []}
    for key in doc_keys:
        in_rows, _ = build_doc(key)
        for row in in_rows:
            for s in row["spans"]:
                cols["doc_id"].append(row["doc_id"])
                cols["offset"].append(s["offset"])
                cols["kind"].append(s["kind"])
                cols["text"].append(s["text"])
                cols["media_ref"].append(s["media_ref"])
    return pa.table({"doc_id": pa.array(cols["doc_id"], pa.string()),
                     "offset": pa.array(cols["offset"], pa.int32()),
                     "kind": pa.array(cols["kind"], pa.string()),
                     "text": pa.array(cols["text"], pa.string()),
                     "media_ref": pa.array(cols["media_ref"], pa.string())})


def media_tables(doc_keys: list[str]) -> tuple[pa.Table, pa.Table,
                                               pa.Table, pa.Table]:
    """(media_payloads, media_meta, media_lines, media_boxes): payload
    text (hOCR is utf-8, stored as string so DuckDB md5() applies),
    analytic per-page line counts, the analytic per-page OCR-line
    table, and every page box (kind 0=ocr-line, 1=det, 2=col, in
    observation order) for the QA-overlay oracle — all from the
    generator's layout knowledge, never from parsing."""
    from ..sources.media_store import SynthMediaStore
    from .corpus import parse_media_ref
    from .pagegen import page_plan
    store = SynthMediaStore()
    refs, payloads, n_lines = [], [], []
    frefs, fnos, fmd5s = [], [], []
    lrefs, lnos, ltexts, lboxes = [], [], [], []
    brefs, bkinds, bords, bboxes = [], [], [], []
    seen = set()
    for key in doc_keys:
        in_rows, _ = build_doc(key)
        for row in in_rows:
            for s in row["spans"]:
                r = s["media_ref"]
                if s["kind"] != "media" or r in seen:
                    continue
                seen.add(r)
                refs.append(r)
                raw = store.fetch(r)
                payloads.append(raw.decode("utf-8"))
                # frame truth over the raw BYTES (FrameSample's
                # byte-stride rule) — frames can split UTF-8
                # codepoints, so no SQL over the string payload can
                # reproduce these; precomputed like media_lines
                import hashlib as _hl
                step = max(1, len(raw) // 4)
                for fno in range(4):
                    frefs.append(r)
                    fnos.append(fno)
                    fmd5s.append(_hl.md5(
                        raw[fno * step:(fno + 1) * step]).hexdigest())
                cls, seed, page, nr = parse_media_ref(r)
                plan = page_plan(seed, page, cls, nr if nr > 0 else None)
                n_lines.append(len(plan.lines))
                for i, (text, box) in enumerate(plan.lines):
                    lrefs.append(r); lnos.append(i); ltexts.append(text)
                    lboxes.append(box)
                for kind, items in ((0, [b for _, b in plan.lines]),
                                    (1, [b for b, _ in plan.dets]),
                                    (2, [b for b, _ in plan.cols])):
                    for i, box in enumerate(items):
                        brefs.append(r); bkinds.append(kind)
                        bords.append(i); bboxes.append(box)
    payload_t = pa.table({"media_ref": pa.array(refs, pa.string()),
                          "payload": pa.array(payloads, pa.string())})
    meta_t = pa.table({"media_ref": pa.array(refs, pa.string()),
                       "n_lines": pa.array(n_lines, pa.int64())})
    lines_t = pa.table({
        "media_ref": pa.array(lrefs, pa.string()),
        "line_no": pa.array(lnos, pa.int32()),
        "text": pa.array(ltexts, pa.string()),
        "x1": pa.array([b[0] for b in lboxes], pa.int32()),
        "y1": pa.array([b[1] for b in lboxes], pa.int32()),
        "x2": pa.array([b[2] for b in lboxes], pa.int32()),
        "y2": pa.array([b[3] for b in lboxes], pa.int32()),
    })
    boxes_t = pa.table({
        "media_ref": pa.array(brefs, pa.string()),
        "kind": pa.array(bkinds, pa.int32()),
        "ord": pa.array(bords, pa.int32()),
        "x1": pa.array([int(b[0]) for b in bboxes], pa.int32()),
        "y1": pa.array([int(b[1]) for b in bboxes], pa.int32()),
        "x2": pa.array([int(b[2]) for b in bboxes], pa.int32()),
        "y2": pa.array([int(b[3]) for b in bboxes], pa.int32()),
    })
    frames_t = pa.table({
        "media_ref": pa.array(frefs, pa.string()),
        "frame_no": pa.array(fnos, pa.int32()),
        "frame_md5": pa.array(fmd5s, pa.string()),
    })
    return payload_t, meta_t, lines_t, boxes_t, frames_t


def sf_doc_keys(sf_dir: str, repeat: int = 1) -> list[str]:
    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return doc_keys_for_ids(ids.column("doc_id").to_pylist(), repeat)


def write_oracle_tables(sf_dir: str, out_root: str = ORACLE_ROOT) -> str:
    """Idempotently write golden + corpus-span parquet for one sf dir →
    the directory path.  Cheap (hundreds of docs) and deterministic."""
    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(out_root, name)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == GOLDEN_VERSION:
                return out_dir
        import shutil
        shutil.rmtree(out_dir)               # stale generator version
    os.makedirs(out_dir, exist_ok=True)
    keys = sf_doc_keys(sf_dir)
    pq.write_table(golden_table(keys), os.path.join(out_dir, "golden_refs.parquet"))
    pq.write_table(corpus_spans_table(keys), os.path.join(out_dir, "corpus_spans.parquet"))
    payload_t, meta_t, lines_t, boxes_t, frames_t = media_tables(keys)
    pq.write_table(payload_t, os.path.join(out_dir, "media_payloads.parquet"))
    pq.write_table(meta_t, os.path.join(out_dir, "media_meta.parquet"))
    pq.write_table(lines_t, os.path.join(out_dir, "media_lines.parquet"))
    pq.write_table(boxes_t, os.path.join(out_dir, "media_boxes.parquet"))
    pq.write_table(frames_t, os.path.join(out_dir, "media_frames.parquet"))
    with open(done, "w") as f:
        f.write(GOLDEN_VERSION)
    return out_dir
