"""Relational view of every extracted link (paragraph, cell, figure).

The reference stores links on ``Paragraph.links``, ``Cell.links`` and
``Figure.links`` (models/link.py:21-74) and resolves paragraph/cell targets
via the explorer (process.py:397-536).  This stage flattens them:

    (doc_id, source_uid, source_kind, row, col,
     idx_start, idx_stop, anchor, target)

``row``/``col`` are 0 for non-cell sources; ``target`` is "" for figure
links (the reference never resolves them).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.document import extract_document_full


def links_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    from .parse import decode_sidecar_rows

    rows = decode_sidecar_rows(batch)
    out = {
        "doc_id": [], "source_uid": [], "source_kind": [], "row": [],
        "col": [], "idx_start": [], "idx_stop": [], "anchor": [], "target": [],
    }

    def emit(doc_id, uid, kind, row, col, link):
        out["doc_id"].append(doc_id)
        out["source_uid"].append(uid)
        out["source_kind"].append(kind)
        out["row"].append(row)
        out["col"].append(col)
        out["idx_start"].append(link["idx_start"])
        out["idx_stop"].append(link["idx_stop"])
        out["anchor"].append(link["anchor"])
        out["target"].append(link.get("target", ""))

    for doc in rows:
        _, elements = extract_document_full(doc, cfg)
        for el in elements:
            for link in el.get("links", []):
                emit(doc["doc_id"], el["uid"], el["etype"], 0, 0, link)
            if el["etype"] == "table":
                for cell in el.get("cells", []):
                    for link in cell.get("links", []):
                        emit(
                            doc["doc_id"], el["uid"], "cell",
                            cell["row"], cell["col"], link,
                        )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "source_uid": pa.array(out["source_uid"], pa.string()),
            "source_kind": pa.array(out["source_kind"], pa.string()),
            "row": pa.array(out["row"], pa.int32()),
            "col": pa.array(out["col"], pa.int32()),
            "idx_start": pa.array(out["idx_start"], pa.int32()),
            "idx_stop": pa.array(out["idx_stop"], pa.int32()),
            "anchor": pa.array(out["anchor"], pa.string()),
            "target": pa.array(out["target"], pa.string()),
        }
    )


def links_table(ds, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return ds.map_batches(
        links_batch, fn_kwargs={"cfg": cfg}, batch_format="pyarrow", batch_size=64
    )
