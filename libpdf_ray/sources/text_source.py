"""Plain-text document source → the canonical span shape.

The engine's corpus contract is ``(doc_id, spans)`` (BASELINE.json
input_hint).  Real deployments feed it from the PDF-sidecar parser; this
source feeds it from plain-text tables like the driver's ``documents``
parquet — the "HTML boilerplate strip / main-content" end of the north rule:
segment text into paragraph spans, attach quality/token metadata.
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import SPANS_TYPE


def segment_text(text: str, words_per_span: int = 50) -> list:
    """Deterministic paragraph segmentation: split on blank lines when
    present, else fixed word windows."""
    if "\n\n" in text:
        parts = [p.strip() for p in text.split("\n\n") if p.strip()]
    else:
        words = text.split()
        parts = [
            " ".join(words[i : i + words_per_span])
            for i in range(0, len(words), words_per_span)
        ]
    return parts


def text_to_spans(batch: pa.Table, words_per_span: int = 50) -> pa.Table:
    """(doc_id, text, ...) rows → (doc_id, spans, n_spans) in span shape."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    spans_col = []
    for text in texts:
        parts = segment_text(text or "", words_per_span)
        spans_col.append(
            [
                {"kind": "paragraph", "text": p, "media_ref": "", "offset": i}
                for i, p in enumerate(parts)
            ]
        )
    return pa.table(
        {
            "doc_id": pa.array([str(d) for d in doc_ids], pa.string()),
            "spans": pa.array(spans_col, SPANS_TYPE),
            "n_spans": pa.array([len(s) for s in spans_col], pa.int32()),
        }
    )


def read_text_documents(path: str, **kwargs):
    """documents parquet → span-shaped Dataset."""
    import ray.data as rd

    ds = rd.read_parquet(path, columns=["doc_id", "text"], **kwargs)
    return ds.map_batches(text_to_spans, batch_format="pyarrow")
