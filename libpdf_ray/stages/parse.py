"""The DocumentParser stage: sidecar rows → span rows, as a Ray Data batch op.

This is the engine's hot stage — the analog of the reference's whole
single-threaded ``extract()`` loop (``/root/reference/libpdf/extract.py:60-222``),
re-expressed as ``Dataset.map_batches`` over Arrow batches.  One input row is
one document, so every reference semantic stays intra-row and the stage is
embarrassingly parallel across documents (SURVEY §4.3).

``DocumentParser`` is a callable CLASS: passed to ``map_batches(...,
concurrency=N)`` it becomes an actor pool whose ``__init__`` holds the
per-worker warm state (frozen config, compiled regexes — the engine analog of
the reference's parser/interpreter reuse at libpdf/textbox.py:960-961).
Compiled regex state lives at kernel-module import time, so stateless-task
mode is equally correct; the actor form exists for the north-star "warm
parser" deployment shape and for pinning ``num_cpus``.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.document import extract_document
from ..schema import SPANS_TYPE
# the decode machinery lives behind the DocumentDecoder seam (the parse
# boundary where a real PDF-byte decoder would bind — see stages/decoder.py);
# decode_sidecar_rows is re-exported here for the view stages
from .decoder import DocumentDecoder, SidecarDecoder, decode_sidecar_rows

__all__ = [
    "DocumentDecoder",
    "SidecarDecoder",
    "decode_sidecar_rows",
    "parse_batch",
    "DocumentParser",
    "explode_spans",
]


def parse_batch(batch: pa.Table, cfg: PipelineConfig,
                decoder: DocumentDecoder | None = None) -> pa.Table:
    """Arrow batch of raw document rows → Arrow batch of (doc_id, spans,
    n_spans, est_pages) rows.  The per-doc kernel consumes deeply nested
    structs — the *document* is the vectorization unit, matching a per-PDF
    parser — but the word-level payload (the bulk of the bytes) is decoded
    flat, not via ``to_pylist`` (see ``stages/decoder.py``).

    ``decoder`` is the parse-boundary seam (:class:`DocumentDecoder`):
    defaults to the synthetic :class:`SidecarDecoder`; a PDF-byte decoder
    drops in here without touching anything downstream."""
    rows = (decoder or _DEFAULT_DECODER).decode(batch)
    doc_ids = []
    spans_col = []
    n_spans = []
    est_pages = []
    errors = []
    for row in rows:
        # poison-document discipline (SURVEY §4.2): a malformed document
        # becomes an error row, never a dead task — at 10^12 docs a single
        # raising row must not kill the batch or poison retries
        try:
            if row.get("_decode_error"):
                # decoder-level poison (e.g. encrypted/corrupt PDF bytes):
                # carry the decode failure, don't run the kernel
                raise RuntimeError(row["_decode_error"])
            spans = extract_document(row, cfg)
            errors.append("")
        except Exception as exc:  # noqa: BLE001 - deliberate catch-all
            spans = []
            errors.append(f"{type(exc).__name__}: {exc}")
        doc_ids.append(row["doc_id"])
        spans_col.append(spans)
        n_spans.append(len(spans))
        est_pages.append(int(row.get("est_pages") or len(row.get("pages") or [])))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans_col, SPANS_TYPE),
            "n_spans": pa.array(n_spans, pa.int32()),
            "est_pages": pa.array(est_pages, pa.int32()),
            "error": pa.array(errors, pa.string()),
        }
    )


#: module-level default so parse_batch calls don't rebuild a decoder per
#: batch (the decoder is stateless; actor-pool users hold their own)
_DEFAULT_DECODER = SidecarDecoder()


class DocumentParser:
    """Actor-pool form of :func:`parse_batch` (warm per-worker state)."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 decoder: DocumentDecoder | None = None):
        # once per actor: freeze config + decoder; kernel regexes are
        # compiled at import time and shared by every batch this worker
        # processes
        self.cfg = cfg or PipelineConfig()
        self.decoder = decoder or SidecarDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return parse_batch(batch, self.cfg, decoder=self.decoder)


def explode_spans(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) rows → one row per span, zero-copy where possible.

    Uses Arrow list-flatten + parent indices instead of Python loops; this is
    the bridge from the nested corpus shape to relational span analytics
    (``groupby("kind")`` metrics etc.)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    # repeat doc_id by each row's span count (vectorized np.repeat — a
    # Python loop here was round-1's explode cost)
    import numpy as np

    counts = (
        pa.compute.list_value_length(spans)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    doc_ids = batch.column("doc_id").take(
        pa.array(np.repeat(np.arange(len(counts), dtype=np.int64), counts))
    )
    return pa.table(
        {
            "doc_id": doc_ids,
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )
