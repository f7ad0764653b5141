"""Skew-aware REAL-PDF extraction: heavy manuals split by page range.

The north rule's input mix is 1-page flyers next to 5000-page manuals;
as single rows the manuals serialize one worker for minutes.  This is
the real-PDF twin of ``pipelines/split.py`` (which splits sidecar rows):

1. **probe** — one cheap pass per file: xref + page-tree walk only
   (:func:`pdf_page_count`), no content interpretation.  Emits
   ``(path, n_pages)`` — the explicit repartition-by-estimated-page-count
   signal of the north star.
2. **route** — files under ``heavy_pages`` flow through the ordinary
   per-document byte decode (one task each, batched).  Heavy files
   explode into ``(path, range)`` sub-rows.
3. **range decode** — each sub-row RE-READS its file from storage and
   interprets ONLY its pages (``decode_pdf_document(page_subset=…)``),
   then runs the page-local extraction phase
   (:func:`kernels.document.prepare_pages`).  Re-reading trades cheap
   sequential storage reads for NOT shipping the whole file through the
   object store once per range (a 5000-page manual in 100 ranges would
   otherwise cross the store 100×).
4. **finish** — ONE ``groupby(doc_id)`` reassembles each manual's ranges
   with the light document tail (:func:`finish_document` via
   ``pipelines.split._finish_group``), emitting the same span rows as
   the monolithic path.

Catalog context (outline / names / pages) is re-derived per range from
the file itself — pure functions of the bytes, so every range computes
the identical tree (the same property the sidecar split relies on).
"""

from __future__ import annotations

import pickle

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.document import prepare_pages, selected_pages
from ..schema import SPANS_TYPE


def _probe_batch(batch: pa.Table) -> pa.Table:
    import os

    from ..stages.pdf_decoder import pdf_page_count

    paths = batch.column("path").to_pylist()
    counts = []
    for p in paths:
        try:
            with open(p, "rb") as fh:
                counts.append(pdf_page_count(fh.read()))
        except Exception:  # noqa: BLE001 - poison file → count 0, light path
            counts.append(0)
    return pa.table(
        {
            "path": pa.array(paths, pa.string()),
            "doc_id": pa.array(
                [os.path.splitext(os.path.basename(p))[0] for p in paths],
                pa.string(),
            ),
            "n_pages": pa.array(counts, pa.int32()),
        }
    )


def _light_parse(batch: pa.Table, cfg: PipelineConfig,
                 heavy_pages: int) -> pa.Table:
    """Ordinary per-doc byte decode for the light rows (reads bytes in
    the task — no driver materialization, no object-store hop for the
    raw file).  The light/heavy ROUTE happens inside the batch UDF, not
    as a row filter: a row filter leaves probe-schema empty blocks that
    skipped map UDFs carry into the union, where the schema mismatch
    kills downstream exchanges (the round-4 normalize_blocks lesson) —
    this stage always emits the parse schema, possibly with 0 rows."""
    import pyarrow.compute as pc

    from ..stages.parse import parse_batch
    from ..stages.pdf_decoder import PdfByteDecoder

    batch = batch.filter(pc.less(batch.column("n_pages"), heavy_pages))
    payloads = []
    for p in batch.column("path").to_pylist():
        with open(p, "rb") as fh:
            payloads.append(fh.read())
    raw = pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pdf_bytes": pa.array(payloads, pa.binary()),
        }
    )
    return parse_batch(raw, cfg, decoder=PdfByteDecoder())


_RANGE_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("doc_id", pa.string()),
        ("split_id", pa.int32()),
        ("n_splits", pa.int32()),
        ("range", pa.list_(pa.int32())),
    ]
)


def _range_rows(batch: pa.Table, split_pages: int, heavy_pages: int):
    """Heavy probe rows → one sub-row per page range.  The heavy filter
    lives HERE (see _light_parse note); a batch with no heavy rows emits
    one 0-row table with the RANGE schema so no probe-schema block ever
    reaches the shuffle."""
    emitted = False
    for ri in range(batch.num_rows):
        n = int(batch.column("n_pages")[ri].as_py())
        if n < heavy_pages:
            continue
        emitted = True
        path = batch.column("path")[ri].as_py()
        doc_id = batch.column("doc_id")[ri].as_py()
        ranges = [
            list(range(lo, min(lo + split_pages, n + 1)))
            for lo in range(1, n + 1, split_pages)
        ] or [[]]
        for split_id, rng in enumerate(ranges):
            yield pa.table(
                {
                    "path": pa.array([path], pa.string()),
                    "doc_id": pa.array([doc_id], pa.string()),
                    "split_id": pa.array([split_id], pa.int32()),
                    "n_splits": pa.array([len(ranges)], pa.int32()),
                    "range": pa.array([rng], pa.list_(pa.int32())),
                }
            )
    if not emitted:
        yield _RANGE_SCHEMA.empty_table()


def _prepare_range(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    from ..stages.pdf_decoder import decode_pdf_document

    out_doc, out_split, out_total, out_fin, out_prep = [], [], [], [], []
    for row in batch.to_pylist():
        rng = set(int(p) for p in row["range"])
        with open(row["path"], "rb") as fh:
            doc = decode_pdf_document(row["doc_id"], fh.read(),
                                      page_subset=rng)
        pages = selected_pages(doc, cfg)
        subset = sorted(p for p in pages if p in rng)
        prepared = prepare_pages(
            doc, pages, cfg, page_subset=subset, defer_smart_crop=True
        )
        finish_doc = {
            k: doc.get(k)
            for k in ("doc_id", "pages", "outline_nodes", "outline_root",
                      "names_nodes")
        }
        out_doc.append(row["doc_id"])
        out_split.append(row["split_id"])
        out_total.append(row["n_splits"])
        out_fin.append(pickle.dumps(finish_doc))
        out_prep.append(pickle.dumps(prepared))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.string()),
            "split_id": pa.array(out_split, pa.int32()),
            "n_splits": pa.array(out_total, pa.int32()),
            "finish_doc": pa.array(out_fin, pa.binary()),
            "prepared": pa.array(out_prep, pa.binary()),
        }
    )


def extract_spans_pdf_split(
    paths,
    cfg: PipelineConfig | None = None,
    heavy_pages: int = 200,
    split_pages: int = 50,
    num_partitions: int = 8,
):
    """Skew-aware span extraction over a corpus of real PDF files.

    Returns the usual ``(doc_id, spans, n_spans, est_pages, error)``
    Dataset — light docs via the ordinary byte decode, heavy docs via
    page-range parallelism + one doc-keyed reassembly shuffle."""
    import glob as _glob
    import os as _os

    import pandas as pd
    import ray.data

    from .split import _finish_group

    cfg = cfg or PipelineConfig()
    if isinstance(paths, str):
        if _os.path.isdir(paths):
            files = sorted(
                _glob.glob(_os.path.join(paths, "*.pdf"))
                + _glob.glob(_os.path.join(paths, "*.PDF"))
            )
        else:
            files = [paths]
    else:
        files = list(paths)
    # materialize: the probe is consumed by BOTH branches plus the range
    # count below — one xref probe per file instead of three, and the
    # materialized rows are tiny scalars (path, doc_id, n_pages)
    probe = ray.data.from_items(
        [{"path": p} for p in files],
        override_num_blocks=max(1, len(files) // 16),
    ).map_batches(_probe_batch, batch_format="pyarrow").materialize()

    light = probe.map_batches(
        _light_parse, fn_kwargs={"cfg": cfg, "heavy_pages": heavy_pages},
        batch_format="pyarrow", batch_size=16,
    )

    # exact range-row count: bounds the spread repartition so that NO
    # post-repartition block is empty.  Empty blocks here are the
    # intermittent ArrowInvalid in the reassembly groupby: _range_rows'
    # 0-row fallback tables and any over-partitioned split are
    # RANGE-schema blocks, map UDFs are skipped on empties, and a
    # range-schema empty surviving into the hash shuffle mixes schemas
    # inside an aggregator (reproduced ~1/6 full-suite runs).  All
    # pre-repartition blocks share the range schema, so the repartition
    # concats the fallbacks away — and with target ≤ n_ranges every
    # rebuilt block carries ≥ 1 row, so _prepare_range runs on ALL of
    # them and only prepared-schema blocks reach the shuffle.
    def _count_ranges(batch: pa.Table) -> pa.Table:
        n = 0
        for ri in range(batch.num_rows):
            pages = int(batch.column("n_pages")[ri].as_py())
            if pages >= heavy_pages:
                n += -(-pages // split_pages)
        return pa.table({"n": pa.array([n], pa.int64())})

    n_ranges = int(
        probe.map_batches(_count_ranges, batch_format="pyarrow").sum("n")
        or 0
    )
    if n_ranges == 0:
        return light

    heavy = (
        probe.map_batches(
            _range_rows,
            fn_kwargs={"split_pages": split_pages,
                       "heavy_pages": heavy_pages},
            batch_format="pyarrow", batch_size=4,
        )
        # spread sub-rows so one manual's ranges run on many workers —
        # capped at the row count (see n_ranges note above)
        .repartition(max(1, min(num_partitions * 4, n_ranges)))
        .map_batches(
            _prepare_range, fn_kwargs={"cfg": cfg},
            batch_format="pyarrow", batch_size=1,
        )
        .groupby("doc_id", num_partitions=num_partitions)
        .map_groups(
            _finish_group, fn_kwargs={"cfg": cfg}, batch_format="pandas"
        )
    )

    def heavy_to_schema(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].tolist(), pa.string()),
                "spans": pa.array(df["spans"].tolist(), SPANS_TYPE),
                "n_spans": pa.array(
                    df["n_spans"].astype("int32").tolist(), pa.int32()
                ),
                "est_pages": pa.array(
                    df["est_pages"].astype("int32").tolist(), pa.int32()
                ),
                "error": pa.array([""] * len(df), pa.string()),
            }
        )

    return light.union(heavy.map_batches(heavy_to_schema, batch_format="pandas"))
