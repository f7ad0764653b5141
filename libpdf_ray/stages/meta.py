"""Metadata stages: file-meta and page tables from the sidecar corpus.

The Ray analogs of the reference's S4/S5 operators
(/root/reference/libpdf/extract.py:489-590): per-document metadata lands in
flat relational tables instead of ``File``/``FileMeta``/``Page`` objects.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.meta import parse_pdf_datetime, string_to_identifier


def file_meta_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, meta struct, pages) → one metadata row per document.

    ``creation_date_raw`` (a PDF ``D:`` string column, when present) is
    parsed with the reference's lenient grammar; the sidecar's native
    timestamp is passed through otherwise."""
    if "pdf_bytes" in batch.column_names:
        # real-PDF rows: meta/pages come out of the byte decoder
        from .decoder import decode_sidecar_rows

        rows = decode_sidecar_rows(batch)
    else:
        rows = batch.select(
            [c for c in ("doc_id", "meta", "pages") if c in batch.column_names]
        ).to_pylist()
    out = {
        "doc_id": [],
        "file_identifier": [],
        "author": [],
        "title": [],
        "subject": [],
        "creator": [],
        "producer": [],
        "keywords": [],
        "creation_date": [],
        "modified_date": [],
        "trapped": [],
        "n_pages": [],
    }
    for row in rows:
        meta = row.get("meta") or {}
        raw = meta.get("creation_date_raw")
        created = parse_pdf_datetime(raw) if raw else meta.get("creation_date")
        raw_mod = meta.get("modified_date_raw")
        modified = parse_pdf_datetime(raw_mod) if raw_mod else meta.get("modified_date")
        out["doc_id"].append(row["doc_id"])
        out["file_identifier"].append(string_to_identifier(str(row["doc_id"])))
        out["author"].append(meta.get("author"))
        out["title"].append(meta.get("title"))
        out["subject"].append(meta.get("subject"))
        out["creator"].append(meta.get("creator"))
        out["producer"].append(meta.get("producer"))
        out["keywords"].append(meta.get("keywords"))
        out["creation_date"].append(created)
        out["modified_date"].append(modified)
        out["trapped"].append(meta.get("trapped"))
        out["n_pages"].append(len(row.get("pages") or []))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "file_identifier": pa.array(out["file_identifier"], pa.string()),
            "author": pa.array(out["author"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "subject": pa.array(out["subject"], pa.string()),
            "creator": pa.array(out["creator"], pa.string()),
            "producer": pa.array(out["producer"], pa.string()),
            "keywords": pa.array(out["keywords"], pa.string()),
            "creation_date": pa.array(out["creation_date"], pa.timestamp("s")),
            "modified_date": pa.array(out["modified_date"], pa.timestamp("s")),
            "trapped": pa.array(out["trapped"], pa.bool_()),
            "n_pages": pa.array(out["n_pages"], pa.int32()),
        }
    )


def pages_batch(batch: pa.Table) -> pa.Table:
    """Explode the per-doc pages list into a (doc_id, number, width, height)
    table — the Page-model analog (models/page.py:27-79)."""
    if "pdf_bytes" in batch.column_names:
        from .decoder import decode_sidecar_rows

        rows = decode_sidecar_rows(batch)
        doc_ids = [r["doc_id"] for r in rows]
        pages_col = [r.get("pages") for r in rows]
    else:
        doc_ids = batch.column("doc_id").to_pylist()
        pages_col = batch.column("pages").to_pylist()
    out_doc, out_num, out_w, out_h = [], [], [], []
    for doc_id, pages in zip(doc_ids, pages_col):
        for p in pages or []:
            out_doc.append(doc_id)
            out_num.append(int(p["number"]))
            out_w.append(float(p["width"]))
            out_h.append(float(p["height"]))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.string()),
            "number": pa.array(out_num, pa.int32()),
            "width": pa.array(out_w, pa.float64()),
            "height": pa.array(out_h, pa.float64()),
        }
    )


def file_meta_table(ds):
    return ds.map_batches(file_meta_batch, batch_format="pyarrow")


def pages_table(ds):
    return ds.map_batches(pages_batch, batch_format="pyarrow")
