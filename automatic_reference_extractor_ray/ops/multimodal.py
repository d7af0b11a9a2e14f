"""Multimodal column plumbing: media payloads as opaque binary with
typed metadata, processed by actor-pool stages.

The container has no image/audio codecs, so the *decode* step is
stubbed (``RealImageDecoder`` raises NotImplementedError; the
deterministic ``FakeDecoder`` extracts byte-level features) — but the
Ray-side plumbing is real and tested: actor signature, small batch
sizes for wide binary rows, schema of the feature output, and the rule
that payload bytes are fetched inside the actor and never shuffled.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..sources.media_store import make_store


class RealImageDecoder:
    """Placeholder for a real codec-backed decoder (PIL/ffmpeg).  Not
    available in this environment — the interface is the contract."""

    def decode(self, payload: bytes) -> dict:
        raise NotImplementedError("image/audio codecs not available; "
                                  "plug a real decoder here")


class FakeDecoder:
    """Deterministic stand-in: byte-level 'features'."""

    def decode(self, payload: bytes) -> dict:
        return {
            "n_bytes": len(payload),
            "payload_md5": hashlib.md5(payload).hexdigest(),
        }


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
