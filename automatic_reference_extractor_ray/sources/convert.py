"""Document → text conversion seam — the reference's ``prepareText``
(production-version/textProcessing.py:80-115): an extension whitelist
routes raw uploads to a converter (pdf → docears-pdf-inspector,
doc/docx/odt → ``libreoffice --headless --convert-to txt``, txt →
passthrough) before the text pipeline runs.

In this engine conversion is an actor-pool ingest stage over raw
payload rows; the external converters are BINARY-GATED (the test
container ships neither LibreOffice nor a PDF extractor), so:

  txt                 passthrough (utf-8 decode), always available
  pdf                 ``pdftotext`` (poppler — the pdf-inspector
                      analogue; LibreOffice's Writer txt filter cannot
                      convert PDFs) when the binary exists, a precise
                      RuntimeError otherwise
  doc/docx/odt        ``soffice --headless --convert-to txt:Text`` via
                      subprocess when the binary exists, a precise
                      RuntimeError otherwise
  anything else       ValueError — the whitelist
                      (LOCDB-V3/fileProcessor.py:24-25)

The M10 ``title|`` first-line repair runs downstream on the text route
(functions/dockit.py), matching the reference's post-conversion fix.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pyarrow as pa

ALLOWED_EXTENSIONS = ("txt", "pdf", "doc", "docx", "odt")
_OFFICE_BINARIES = ("soffice", "libreoffice")
_PDF_BINARY = "pdftotext"


def converter_available() -> bool:
    return any(shutil.which(b) for b in _OFFICE_BINARIES)


def pdf_converter_available() -> bool:
    return shutil.which(_PDF_BINARY) is not None


def convert_payload_to_text(payload: bytes, ext: str) -> str:
    """One document's raw bytes → extracted text."""
    ext = ext.lower().lstrip(".")
    if ext not in ALLOWED_EXTENSIONS:
        raise ValueError(
            f"extension {ext!r} not in whitelist {ALLOWED_EXTENSIONS} "
            "(fileProcessor.py:24-25)")
    if ext == "txt":
        return payload.decode("utf-8", errors="replace")
    if ext == "pdf":
        # LibreOffice imports PDFs into Draw, which has no text filter
        # — PDFs need a dedicated extractor, like the reference's
        # docears-pdf-inspector (textProcessing.py:88-92)
        if not pdf_converter_available():
            raise RuntimeError(
                "converting .pdf needs pdftotext (poppler-utils) on "
                "PATH; this environment has no PDF extractor — ingest "
                "pre-extracted text spans instead")
        with tempfile.TemporaryDirectory() as td:      # pragma: no cover
            src = os.path.join(td, "doc.pdf")
            with open(src, "wb") as f:
                f.write(payload)
            subprocess.run([_PDF_BINARY, src, os.path.join(td, "doc.txt")],
                           check=True, capture_output=True)
            with open(os.path.join(td, "doc.txt"), encoding="utf-8",
                      errors="replace") as f:
                return f.read()
    binary = next((b for b in _OFFICE_BINARIES if shutil.which(b)), None)
    if binary is None:
        raise RuntimeError(
            f"converting .{ext} needs LibreOffice (soffice) on PATH; "
            "this environment has no office converters — ingest "
            "pre-extracted text spans instead")
    with tempfile.TemporaryDirectory() as td:          # pragma: no cover
        src = os.path.join(td, f"doc.{ext}")
        with open(src, "wb") as f:
            f.write(payload)
        subprocess.run(
            [binary, "--headless", "--convert-to", "txt:Text",
             "--outdir", td, src],
            check=True, capture_output=True)
        with open(os.path.join(td, "doc.txt"), encoding="utf-8",
                  errors="replace") as f:
            return f.read()


class ConvertDocs:
    """Actor-pool ingest stage: (doc_id, payload binary, ext) rows →
    interleaved-documents rows with one text span.  Conversion state
    (binary discovery) happens once per actor; payload bytes never
    leave the actor as anything but extracted text."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schema import SPAN_STRUCT
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        exts = batch.column("ext").to_pylist()
        spans = []
        for p, e in zip(payloads, exts):
            text = convert_payload_to_text(p, e)
            spans.append([{"kind": "text", "text": text,
                           "media_ref": "", "offset": 0}])
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
        })


def convert_docs(raw_ds, concurrency=(1, 8), batch_size: int = 16):
    """raw (doc_id, payload, ext) Dataset → documents-schema Dataset."""
    return raw_ds.map_batches(ConvertDocs, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency)
