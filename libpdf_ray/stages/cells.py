"""Cell-level relational view of extracted tables.

The reference addresses table content cell-by-cell (``Cell(row, col, …)``,
/root/reference/libpdf/models/table.py:108-160; tests assert texts by
(row, col), tests/test_tables.py:10-27).  The span projection flattens a
table to one span; this stage exposes the full cell model as a flat table:

    (doc_id, table_uid, row, col, text, x0, y0, x1, y1)
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.document import extract_document_full


def cells_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    from .parse import decode_sidecar_rows

    rows = decode_sidecar_rows(batch)
    out = {
        "doc_id": [], "page": [], "table_uid": [], "table_idx": [], "row": [],
        "col": [], "text": [], "x0": [], "y0": [], "x1": [], "y1": [],
    }
    for doc in rows:
        _, elements = extract_document_full(doc, cfg)
        # table_idx: 1-based reading-order ordinal per document (the uid is
        # chapter-scoped, the ordinal is the stable doc-level key the
        # generator-as-oracle expected_cells column uses)
        table_no = 0
        for el in elements:
            if el["etype"] != "table":
                continue
            table_no += 1
            for cell in el.get("cells", []):
                out["doc_id"].append(doc["doc_id"])
                out["page"].append(el["page"])
                out["table_uid"].append(el["uid"])
                out["table_idx"].append(table_no)
                out["row"].append(cell["row"])
                out["col"].append(cell["col"])
                out["text"].append(cell["text"])
                out["x0"].append(cell["x0"])
                out["y0"].append(cell["y0"])
                out["x1"].append(cell["x1"])
                out["y1"].append(cell["y1"])
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "page": pa.array(out["page"], pa.int32()),
            "table_uid": pa.array(out["table_uid"], pa.string()),
            "table_idx": pa.array(out["table_idx"], pa.int32()),
            "row": pa.array(out["row"], pa.int32()),
            "col": pa.array(out["col"], pa.int32()),
            "text": pa.array(out["text"], pa.string()),
            "x0": pa.array(out["x0"], pa.float64()),
            "y0": pa.array(out["y0"], pa.float64()),
            "x1": pa.array(out["x1"], pa.float64()),
            "y1": pa.array(out["y1"], pa.float64()),
        }
    )


def cells_table(ds, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return ds.map_batches(
        cells_batch, fn_kwargs={"cfg": cfg}, batch_format="pyarrow", batch_size=64
    )
