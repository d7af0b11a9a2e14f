"""Result-view surfaces (E2): found/missing join + per-document XML.

``result_view`` is the reference's ``createResultView`` semantics
(LOCDB-V3/fileProcessor.py:154-211): the requested document ids are
split into FilesFound / FilesNotFound by whether extraction produced
output.  Implemented as a broadcast-free distributed semi/anti join:
requested ids and output ids are tagged, unioned, and resolved per key
inside the bounded-bucket shuffle — no id set ever materializes on the
driver, so it holds at any document count.

``doc_xml`` renders each document's ordered records into the
reference's output XML shape (S4, LOCDB-V3/imgProcessing.py:196-212)
inside the same bucketed shuffle.
"""

from __future__ import annotations

import pandas as pd

from ..functions.xmlout import render_doc_xml
from ..ops.shuffle import bucketed_groupby


def result_view(requested_ids, refs):
    """(doc_id-only Dataset, refs Dataset) → (doc_id, status) with
    status ∈ {'found', 'missing'} for every requested id."""
    req = requested_ids.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["doc_id"], "src": 0}),
        batch_format="pandas")
    out = refs.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["doc_id"], "src": 1}),
        batch_format="pandas")

    def resolve(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("doc_id", sort=False)["src"].agg(["min", "max"])
        g = g[g["min"] == 0]                   # only requested ids
        return pd.DataFrame({
            "doc_id": g.index,
            "status": (g["max"] == 1).map({True: "found", False: "missing"}),
        }).reset_index(drop=True)

    return bucketed_groupby(req.union(out), "doc_id", resolve)


def doc_xml(refs, fname_of=None):
    """refs Dataset → (doc_id, n_refs, xml) — one reference-output XML
    document per doc_id, records in span_idx order."""

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, g in pdf.groupby("doc_id", sort=False):
            g = g.sort_values("span_idx")
            xml = render_doc_xml(doc_id if fname_of is None else fname_of(doc_id),
                                 g.to_dict("records"))
            rows.append((doc_id, len(g), xml))
        return pd.DataFrame(rows, columns=["doc_id", "n_refs", "xml"])

    # pandas path is safe here: the nested authors column is converted
    # to a flat string before the shuffle so it survives the
    # round-trip.  \x1f-TERMINATED (one separator per author): an
    # empty list flattens to "" while the org-author quirk's [""]
    # flattens to "\x1f" — the two must stay distinct so the empty
    # <author></author> element still renders (see xmlout).
    def flatten_authors(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["authors"] = pdf["authors"].map(
            lambda a: a if isinstance(a, str)
            else "\x1f".join(a) + "\x1f" if len(a) else "")
        return pdf

    prepped = refs.map_batches(flatten_authors, batch_format="pandas")
    return bucketed_groupby(prepped, "doc_id", render)
