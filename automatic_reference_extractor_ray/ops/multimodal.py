"""Multimodal column plumbing: media payloads as opaque binary with
typed metadata, processed by actor-pool stages.

The test container has no image/audio codecs, so the *decode* steps
default to deterministic byte-level stand-ins (``FakeDecoder``,
byte-cap resize, byte-stride frames); the REAL paths exist behind
import/binary gates — ``RealImageDecoder`` (Pillow),
``MediaResize(codec="pil")`` and ``ocr_image_to_hocr`` (tesseract) —
and activate where the codecs are installed.  The Ray-side plumbing is
identical either way and fully tested: actor signature, small batch
sizes for wide binary rows, schema of the feature output, and the rule
that payload bytes are fetched inside the actor and never shuffled.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..sources.media_store import make_store


class RealImageDecoder:
    """PIL-backed decoder (the reference's imgProcessing entry: real
    scans, LOCDB-V3/imgProcessing.py:24-28,453-455).  Import-gated: the
    test container has no codecs, so construction raises a precise
    ImportError there and the interface test skips; with Pillow
    installed the same feature dict gains width/height/mode."""

    def __init__(self):
        try:
            from PIL import Image
        except ImportError as e:                       # pragma: no cover
            raise ImportError(
                "RealImageDecoder needs Pillow (pip install pillow); "
                "use decoder='fake' in codec-less environments") from e
        self._image_mod = Image

    def decode(self, payload: bytes) -> dict:          # pragma: no cover
        import io
        with self._image_mod.open(io.BytesIO(payload)) as im:
            return {
                "n_bytes": len(payload),
                "payload_md5": hashlib.md5(payload).hexdigest(),
                "width": im.width, "height": im.height, "mode": im.mode,
            }


class FakeDecoder:
    """Deterministic stand-in: byte-level 'features'."""

    def decode(self, payload: bytes) -> dict:
        return {
            "n_bytes": len(payload),
            "payload_md5": hashlib.md5(payload).hexdigest(),
        }


def tesseract_available() -> bool:
    import shutil as _sh
    return _sh.which("tesseract") is not None


def ocr_image_to_hocr(payload: bytes) -> str:
    """Real OCR engine seam: image bytes → hOCR markup via the
    tesseract CLI (the reference shells out the same way,
    LOCDB-V3/imgProcessing.py:453-455) — feed the result to
    ``functions.hocr.parse_hocr`` for the standard PageObservation.
    Binary-gated: raises RuntimeError where tesseract isn't installed
    (this container); the synthetic store covers tests."""
    if not tesseract_available():                      # pragma: no cover
        raise RuntimeError(
            "tesseract binary not found; use store_spec='synth' or "
            "install tesseract-ocr for real scans")
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:          # pragma: no cover
        src = f"{td}/page"
        with open(src, "wb") as f:
            f.write(payload)
        subprocess.run(["tesseract", src, f"{td}/out", "hocr"],
                       check=True, capture_output=True)
        with open(f"{td}/out.hocr", encoding="utf-8") as f:
            return f.read()


class MediaFeaturize:
    """Actor-pool stage: (media_ref) rows → feature rows.  Payload is
    resolved via the media store inside the actor (object-store GET);
    use a small ``batch_size`` — each row fans in a full payload."""

    def __init__(self, store_spec: str = "synth", decoder: str = "fake"):
        self.store = make_store(store_spec)
        self.decoder = FakeDecoder() if decoder == "fake" else RealImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        feats = [self.decoder.decode(self.store.fetch(r)) for r in refs]
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
            "payload_md5": pa.array([f["payload_md5"] for f in feats], pa.string()),
        })


class OcrLineCounter:
    """Actor-pool stage: (media_ref) rows → (media_ref, n_lines) via the
    warm OCR engine (hOCR parse, M3) — the A3 stage's observable count
    surface, oracle-checked against the generator's analytic layout."""

    def __init__(self, store_spec: str = "synth"):
        from ..functions.hocr import parse_hocr
        self.parse = parse_hocr
        self.store = make_store(store_spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        counts = [len(self.parse(self.store.fetch(r).decode("utf-8")).lines)
                  for r in refs]
        return pa.table({"media_ref": pa.array(refs, pa.string()),
                         "n_lines": pa.array(counts, pa.int64())})


class MediaResize:
    """Actor-pool stage: bounded-size transform (the reference's M2
    ``convert -resize 3500x3500`` analogue).  The codec transform is
    stubbed deterministically (payload truncation to ``max_bytes`` with
    an honest ``resized`` flag); a real implementation swaps
    ``_transform`` for a PIL/libvips call — schema, actor signature and
    small-batch sizing are the contract."""

    def __init__(self, store_spec: str = "synth", max_bytes: int = 1 << 20,
                 codec: str = "bytes", max_dim: int = 3500):
        self.store = make_store(store_spec)
        self.max_bytes = max_bytes
        self.max_dim = max_dim                  # convert -resize 3500x3500
        if codec == "pil":                      # import-gated real path
            from PIL import Image               # pragma: no cover
            self._image_mod = Image             # pragma: no cover
        elif codec != "bytes":
            raise ValueError(f"unknown codec {codec!r}")
        self.codec = codec

    def _transform(self, payload: bytes) -> bytes:
        if self.codec == "pil":                 # pragma: no cover
            import io
            with self._image_mod.open(io.BytesIO(payload)) as im:
                if max(im.size) <= self.max_dim:
                    return payload
                im.thumbnail((self.max_dim, self.max_dim))
                buf = io.BytesIO()
                im.save(buf, format=im.format or "PNG")
                return buf.getvalue()
        return payload[: self.max_bytes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        out_n, resized = [], []
        for r in refs:
            p = self.store.fetch(r)
            t = self._transform(p)
            out_n.append(len(t))
            resized.append(len(t) != len(p))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "n_bytes_out": pa.array(out_n, pa.int64()),
            "resized": pa.array(resized, pa.bool_()),
        })


class FrameSample:
    """Actor-pool stage: video-style frame sampling — one media row
    fans out to ``n_frames`` child rows ``(media_ref, frame_no,
    frame_md5)``.  Decode is stubbed (deterministic byte-stride slices
    stand in for decoded frames); the fan-out shape, child-row keying
    and small batches are the real plumbing."""

    def __init__(self, store_spec: str = "synth", n_frames: int = 4):
        self.store = make_store(store_spec)
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, frames, digests = [], [], []
        for r in batch.column("media_ref").to_pylist():
            p = self.store.fetch(r)
            step = max(1, len(p) // self.n_frames)
            for f in range(self.n_frames):
                chunk = p[f * step:(f + 1) * step]
                refs.append(r)
                frames.append(f)
                digests.append(hashlib.md5(chunk).hexdigest())
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_no": pa.array(frames, pa.int32()),
            "frame_md5": pa.array(digests, pa.string()),
        })


class TextEmbedder:
    """Actor-pool stage: batched 'model' inference — text rows →
    ``dim``-float embeddings.  The model is a deterministic feature
    hasher (token hash → bucket, L2-normalized), loaded once per actor;
    swap for a real encoder with the same signature.  Batched matrix
    construction, not per-row calls, is the pattern under test."""

    def __init__(self, dim: int = 64):
        import re as _re

        import numpy as _np
        self.dim = dim
        self.token_re = _re.compile(r"[a-z0-9]+")
        self.np = _np

    def __call__(self, batch: pa.Table) -> pa.Table:
        np = self.np
        texts = batch.column("text").to_pylist()
        mat = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            for tok in self.token_re.findall(t.lower()):
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                    "little")
                mat[i, h % self.dim] += 1.0 if (h >> 62) & 1 else -1.0
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1.0, norms)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        })


def media_resize(media_refs_ds, store_spec: str = "synth",
                 concurrency=(1, 4), batch_size: int = 16, **kw):
    return media_refs_ds.map_batches(
        MediaResize, fn_constructor_kwargs=dict(store_spec=store_spec, **kw),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def frame_sample(media_refs_ds, store_spec: str = "synth",
                 concurrency=(1, 4), batch_size: int = 8, **kw):
    return media_refs_ds.map_batches(
        FrameSample, fn_constructor_kwargs=dict(store_spec=store_spec, **kw),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def embed_texts(docs_ds, dim: int = 64, concurrency=(1, 8),
                batch_size: int = 256):
    return docs_ds.map_batches(
        TextEmbedder, fn_constructor_kwargs=dict(dim=dim),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def ocr_line_counts(media_refs_ds, store_spec: str = "synth",
                    concurrency=(1, 4), batch_size: int = 16):
    return media_refs_ds.map_batches(
        OcrLineCounter, fn_constructor_kwargs=dict(store_spec=store_spec),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def media_features(media_refs_ds, store_spec: str = "synth",
                   concurrency=(1, 4), batch_size: int = 16):
    """media_ref Dataset → (media_ref, n_bytes, payload_md5)."""
    return media_refs_ds.map_batches(
        MediaFeaturize,
        fn_constructor_kwargs=dict(store_spec=store_spec),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class PageOverlay:
    """Actor-pool stage: (media_ref) → (media_ref, svg_md5) QA overlay
    (functions/overlay.py; the reference's box-painting QA images,
    LOCDB-V3/imgProcessing.py:1127-1247, as codec-free SVG).  Payload
    fetched and parsed inside the actor; only the fingerprint leaves."""

    def __init__(self, store_spec: str = "synth"):
        from ..functions.hocr import parse_hocr
        from ..functions.overlay import page_overlay_svg
        self.parse = parse_hocr
        self.render = page_overlay_svg
        self.store = make_store(store_spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        digests = [hashlib.md5(
            self.render(self.parse(self.store.fetch(r).decode("utf-8")))
            .encode("utf-8")).hexdigest() for r in refs]
        return pa.table({"media_ref": pa.array(refs, pa.string()),
                         "svg_md5": pa.array(digests, pa.string())})


def page_overlays(media_refs_ds, store_spec: str = "synth",
                  concurrency=(1, 4), batch_size: int = 16):
    return media_refs_ds.map_batches(
        PageOverlay, fn_constructor_kwargs=dict(store_spec=store_spec),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
