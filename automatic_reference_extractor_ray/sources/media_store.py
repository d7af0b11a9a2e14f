"""Media store: resolve ``media_ref`` → page payload bytes.

At 100 TB scale media payloads must NOT travel through shuffles or sit
inside Dataset blocks (SURVEY.md §4 "keep media bytes lazy").  A media
span carries only its ``media_ref`` string; the OCR actor resolves the
ref to bytes *inside* the actor pool — a key-value fetch against object
storage (Lance blob / S3-style), never a join.

Two implementations:

  SynthMediaStore  ``synth://cls/seedhex/page/nrefs`` → deterministic
                   hOCR payload regenerated procedurally (pagegen).
                   Used by tests and bench; zero storage.
  DirMediaStore    ``<root>/<ref>`` files on disk — the shape a real
                   deployment uses; covered by a unit test.
"""

from __future__ import annotations

import os

from ..functions.hocr import build_hocr
from .corpus import parse_media_ref
from .pagegen import page_plan


class MediaStore:
    def fetch(self, media_ref: str) -> bytes:
        raise NotImplementedError


class SynthMediaStore(MediaStore):
    def fetch(self, media_ref: str) -> bytes:
        cls, seed, page, nr = parse_media_ref(media_ref)
        # with_records=False: the payload needs layout only — golden
        # record derivation is oracle-side work the store must not pay
        # on every actor fetch (measured ~35% of extraction wall time)
        plan = page_plan(seed, page, cls, nr if nr > 0 else None,
                         with_records=False)
        return build_hocr(plan.lines, plan.dets, plan.cols).encode("utf-8")


class DirMediaStore(MediaStore):
    def __init__(self, root: str):
        self.root = root

    def fetch(self, media_ref: str) -> bytes:
        safe = media_ref.replace("://", "__").replace("/", "_")
        with open(os.path.join(self.root, safe), "rb") as f:
            return f.read()

    def put(self, media_ref: str, payload: bytes) -> None:
        os.makedirs(self.root, exist_ok=True)
        safe = media_ref.replace("://", "__").replace("/", "_")
        with open(os.path.join(self.root, safe), "wb") as f:
            f.write(payload)


def make_store(spec: str) -> MediaStore:
    """``"synth"`` or ``"dir:<root>"`` — a plain-string spec so stage
    actors can construct their store in ``__init__`` without shipping
    unpicklable state."""
    if spec == "synth":
        return SynthMediaStore()
    if spec.startswith("dir:"):
        return DirMediaStore(spec[4:])
    raise ValueError(f"unknown media store spec {spec!r}")
