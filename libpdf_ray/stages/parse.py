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


def _decode_colors(nc_arr):
    """list<double> color column → object ndarray of NORMALIZED values
    (``None`` or a tuple of python floats — exactly ``_norm_color``'s
    codomain, on which ``_norm_color`` is idempotent).  Normalizing once
    at decode time replaces a per-word ``_norm_color`` call per line pass
    downstream."""
    import numpy as np

    lens = (
        pa.compute.list_value_length(nc_arr)
        .fill_null(-1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    vals = nc_arr.flatten().to_numpy(zero_copy_only=False)
    out = np.empty(len(lens), dtype=object)
    off = 0
    for i, ln in enumerate(lens.tolist()):
        if ln <= 0:  # null (-1) and empty (0) both normalize to None
            continue
        out[i] = tuple(vals[off : off + ln].tolist())
        off += ln
    # advance offsets past empty-but-present lists (ln == 0 adds nothing)
    return out


def _decode_word_runs(list_arr):
    """list<WORD_STRUCT> column (flattened textboxes) → (cum_lengths,
    word-table dict of flat arrays).  Nulls count as length 0, matching
    ``flatten()``'s null-skipping compaction.  Variable-width fields
    (text / fontname / ncolor) decode into OBJECT ndarrays so the
    per-textbox ``slice_tab`` cuts are zero-copy views, not list copies."""
    import numpy as np

    lengths = (
        pa.compute.list_value_length(list_arr)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    cum = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=cum[1:])
    flat = list_arr.flatten()
    n = len(flat)
    text = np.empty(n, dtype=object)
    text[:] = flat.field("text").to_pylist()
    fonts = np.empty(n, dtype=object)
    fonts[:] = flat.field("fontname").to_pylist()
    wt = {
        "text": text,
        "x0": flat.field("x0").to_numpy(zero_copy_only=False),
        "y0": flat.field("y0").to_numpy(zero_copy_only=False),
        "x1": flat.field("x1").to_numpy(zero_copy_only=False),
        "y1": flat.field("y1").to_numpy(zero_copy_only=False),
        "ncolor": _decode_colors(flat.field("ncolor")),
        "fontname": fonts,
    }
    return cum, wt


def _decode_textboxes(col) -> list:
    """Textboxes column → per-doc lists of textbox dicts whose word/char
    payloads stay as FLAT ARRAY SLICES (``wordtab``/``chartab``), not
    per-word Python dicts.

    ``Table.to_pylist`` spends ~40% of parse-task time building one dict
    per word (measured: 1.48 s vs 0.16 s for this flat decode on a 64-doc
    mixed batch); the assembly kernel consumes the arrays directly and
    word dicts materialize lazily only where needed (table-cell crops)."""
    import numpy as np

    ca = col.combine_chunks()
    tb_lengths = (
        pa.compute.list_value_length(ca)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    tb_cum = np.zeros(len(tb_lengths) + 1, dtype=np.int64)
    np.cumsum(tb_lengths, out=tb_cum[1:])
    flat = ca.flatten()
    page = flat.field("page").to_numpy(zero_copy_only=False)
    bx0 = flat.field("x0").to_numpy(zero_copy_only=False)
    by0 = flat.field("y0").to_numpy(zero_copy_only=False)
    bx1 = flat.field("x1").to_numpy(zero_copy_only=False)
    by1 = flat.field("y1").to_numpy(zero_copy_only=False)
    try:
        ungrouped = flat.field("ungrouped").to_pylist()
    except KeyError:
        ungrouped = [None] * len(page)
    w_cum, w_tab = _decode_word_runs(flat.field("words"))
    c_cum, c_tab = _decode_word_runs(flat.field("chars"))

    def slice_tab(tab, a, b):
        if b == a:
            return None
        return {k: v[a:b] for k, v in tab.items()}

    docs = []
    for d in range(len(tb_lengths)):
        tbs = []
        for j in range(tb_cum[d], tb_cum[d + 1]):
            tbs.append(
                {
                    "page": int(page[j]),
                    "x0": float(bx0[j]),
                    "y0": float(by0[j]),
                    "x1": float(bx1[j]),
                    "y1": float(by1[j]),
                    "ungrouped": bool(ungrouped[j]) if ungrouped[j] else False,
                    "wordtab": slice_tab(w_tab, w_cum[j], w_cum[j + 1]),
                    "chartab": slice_tab(c_tab, c_cum[j], c_cum[j + 1]),
                }
            )
        docs.append(tbs)
    return docs


def decode_sidecar_rows(batch: pa.Table) -> list:
    """Batch → per-doc dicts, with the textboxes column fast-decoded.

    Corpora whose textboxes column deviates from the canonical schema
    (e.g. schema-inferred ingests where an all-null ``chars`` field lost
    its struct type) fall back to plain ``to_pylist`` — slower, never
    wrong."""
    if "textboxes" in batch.column_names:
        try:
            tb_docs = _decode_textboxes(batch.column("textboxes"))
        except (KeyError, pa.lib.ArrowException, AttributeError):
            return batch.to_pylist()
    cols = {
        c: batch.column(c).to_pylist()
        for c in batch.column_names
        if c != "textboxes"
    }
    rows = [
        {c: cols[c][i] for c in cols} for i in range(batch.num_rows)
    ]
    if "textboxes" in batch.column_names:
        for row, tbs in zip(rows, tb_docs):
            row["textboxes"] = tbs
    return rows


def parse_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Arrow batch of sidecar rows → Arrow batch of (doc_id, spans, n_spans,
    est_pages) rows.  The per-doc kernel consumes deeply nested structs —
    the *document* is the vectorization unit, matching a per-PDF parser —
    but the word-level payload (the bulk of the bytes) is decoded flat, not
    via ``to_pylist`` (see :func:`_decode_textboxes`)."""
    rows = decode_sidecar_rows(batch)
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


class DocumentParser:
    """Actor-pool form of :func:`parse_batch` (warm per-worker state)."""

    def __init__(self, cfg: PipelineConfig | None = None):
        # once per actor: freeze config; kernel regexes are compiled at
        # import time and shared by every batch this worker processes
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return parse_batch(batch, self.cfg)


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
