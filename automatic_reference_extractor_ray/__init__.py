"""automatic_reference_extractor_ray — a Ray-Data-native rebuild of the
LOC-DB automatic-reference-extractor.

From-scratch engine (NOT a port): the reference system
(/root/reference, LOCDB-V3 generation) is a document-at-a-time Flask/RQ/
multiprocessing pipeline that locates bibliographic-reference regions in
scanned pages / HTML / XML / text documents, segments them into
individual references, tokenizes citation fields, and emits one ordered
record sequence per document.  This package re-expresses every operator
in that system (SURVEY.md §2) as streaming ``ray.data.Dataset``
transforms over zero-copy Arrow batches:

- stateless per-batch maps for routing, markup extraction, segmentation
  and field tokenization (``stages/``),
- actor pools for the stateful OCR/layout stage (``stages/ocr.py``),
- exactly one all-to-all shuffle: the per-document re-stitch
  ``groupby("doc_id")`` (``stages/stitch.py``),
- partitioned, lineage-tracked, resumable output (``state/lineage.py``),
- plus the large-scale training-data operators (dedup families, ANN
  search, text analysis, multimodal plumbing) under ``ops/``.

Layout:
    functions/   pure semantic kernels (no Ray) — unit-test pinned
    sources/     corpus synthesis + media store + readers
    stages/      Ray Data stage functions / actor classes
    pipelines/   end-to-end pipeline composition
    state/       lineage, resume, metrics
    ops/         beyond-reference large-scale data ops
"""

__version__ = "0.1.0"
