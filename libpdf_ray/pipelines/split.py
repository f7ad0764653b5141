"""Intra-document page-split parallelism for huge documents.

The skew tail of the north rule is the 5000-page manual: as one row it
serializes on a single worker for minutes.  This pipeline splits such
documents into page-range sub-rows, runs the page-local extraction phase
(:func:`kernels.document.prepare_pages` — textboxes, regions, fuzzy chapter
matching, paragraphs: ~95% of the compute) in parallel across the ranges,
and reassembles with ONE ``groupby(doc_id)`` running the light document
tail (:func:`finish_document`) — exactly the v2 shape planned in SURVEY
§4.3.

Exchange format: each sub-row carries its prepared element lists as a
pickled payload (internal hop only; elements are small text+bbox dicts, the
raw layout never moves again).  Light documents (< ``split_pages``) bypass
the split and go through the ordinary per-doc parse.

Caveats (documented):

- with ``smart_page_crop`` the figure/rect/table crops run in the finish
  phase, after tables and paragraph candidates were computed — observably
  identical unless repeating page furniture is itself a
  figure/rect/table overlapping other regions (the reference crops those
  lists before table extraction).
- measured single-node economics: the split path adds fixed costs (an
  extra scan, the sub-row repartition, the doc_id shuffle, ~7 extra
  operators of streaming-executor budget).  On a single synthetic manual
  (~2 ms/page kernels) it does not beat the monolithic parse; it pays off
  when per-page cost is real-parser-sized (~100 ms/page ⇒ break-even at a
  few dozen pages) or when a manual's serial parse would otherwise be the
  straggler tail of a large corpus job.  Use ``heavy_pages`` to route only
  documents above the straggler threshold.
"""

from __future__ import annotations

import pickle

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.document import finish_document, prepare_pages, selected_pages
from ..schema import SPANS_TYPE
from .extract import PARSE_COLUMNS, extract_spans_fused, list_fragments


#: sidecar columns the finish phase needs besides the prepared payload
_FINISH_COLUMNS = ("doc_id", "pages", "outline_nodes", "outline_root", "names_nodes")


def _prepare_split_batch(batch: pa.Table, cfg: PipelineConfig, split_pages: int) -> pa.Table:
    """Sub-doc rows → (doc_id, split_id, n_splits, finish_doc, prepared)."""
    rows = batch.to_pylist()
    out_doc, out_split, out_total, out_fin, out_prep = [], [], [], [], []
    for row in rows:
        doc_table = pickle.loads(row["doc_pickle"])
        doc = doc_table.to_pylist()[0]  # Arrow→python here, in parallel
        pages = selected_pages(doc, cfg)  # full page map (n_pages, heights)
        prepared = prepare_pages(
            doc, pages, cfg, page_subset=row["range"], defer_smart_crop=True
        )
        out_doc.append(doc["doc_id"])
        out_split.append(row["split_id"])
        out_total.append(row["n_splits"])
        out_fin.append(
            pickle.dumps({k: doc.get(k) for k in _FINISH_COLUMNS})
            if row["split_id"] == 0
            else b""
        )
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


_PAGE_LOCAL_COLUMNS = ("textboxes", "figures", "rects", "segments", "raw_annots")
_DOC_LEVEL_COLUMNS = ("doc_id", "est_pages", "pages", "outline_nodes", "outline_root", "names_nodes")


def _slice_row_table(row: pa.Table, rng: list) -> pa.Table:
    """1-row Arrow doc → 1-row Arrow sub-doc with page-local list columns
    filtered to ``rng`` — pure C++ kernels (flatten + is_in + filter), no
    Python-object conversion.  The expensive Arrow→python step then runs in
    the PARALLEL prepare tasks, not serially here."""
    import pyarrow.compute as pc

    arrays: dict = {}
    for col in _DOC_LEVEL_COLUMNS:
        if col in row.column_names:
            arrays[col] = row.column(col)
    for col in _PAGE_LOCAL_COLUMNS:
        if col not in row.column_names:
            continue
        ca = row.column(col).combine_chunks()
        values = ca.flatten()
        if len(values) == 0:
            arrays[col] = ca
            continue
        page_field = values.field("page")
        mask = pc.is_in(
            page_field, value_set=pa.array(rng).cast(page_field.type)
        )
        filt = values.filter(mask)
        arrays[col] = pa.ListArray.from_arrays(
            pa.array([0, len(filt)], pa.int32()), filt
        )
    return pa.table(arrays)


def _explode_heavy(batch: pa.Table, cfg: PipelineConfig, split_pages: int,
                   heavy_pages: int = 0):
    """One heavy doc row → one sub-row per page range, page-local payload
    sliced per range with Arrow kernels and shipped as pickled Arrow
    tables (pickle of a pa.Table uses IPC — no python-object hop).

    The heavy-doc row filter happens HERE, not as a scan predicate: a
    pushed-down scan filter emits zero-column empty blocks that map UDFs
    never see, and the downstream hash shuffle dies sorting them.  A task
    whose batch has no heavy docs yields NOTHING (Ray strips schemas from
    0-row generator outputs; the repartition before the shuffle coalesces
    the resulting schema-less empties)."""
    pages_col = batch.column("pages") if "pages" in batch.column_names else None
    for ri in range(batch.num_rows):
        row = batch.slice(ri, 1)
        est = row.column("est_pages")[0].as_py() if "est_pages" in row.column_names else None
        if est is None and pages_col is not None:
            est = len(pages_col[ri])
        if int(est or 0) < heavy_pages:
            continue
        doc_meta = {"doc_id": row.column("doc_id")[0].as_py(),
                    "pages": row.column("pages")[0].as_py()}
        pages = selected_pages(doc_meta, cfg)
        page_numbers = sorted(pages)
        ranges = [
            page_numbers[i : i + split_pages]
            for i in range(0, len(page_numbers), split_pages)
        ] or [[]]
        for split_id, rng in enumerate(ranges):
            yield pa.table(
                {
                    "doc_pickle": pa.array(
                        [pickle.dumps(_slice_row_table(row, list(rng)))],
                        pa.binary(),
                    ),
                    "split_id": pa.array([split_id], pa.int32()),
                    "n_splits": pa.array([len(ranges)], pa.int32()),
                    "range": pa.array([list(rng)], pa.list_(pa.int32())),
                }
            )


def _finish_group(group, cfg: PipelineConfig):
    import pandas as pd

    group = group.sort_values("split_id")
    doc_meta = pickle.loads(group.iloc[0]["finish_doc"])
    prepared_list = [pickle.loads(b) for b in group["prepared"]]
    pages = selected_pages(doc_meta, cfg)
    spans, _ = finish_document(doc_meta, pages, prepared_list, cfg, crop_deferred=True)
    return pd.DataFrame(
        {
            "doc_id": [doc_meta["doc_id"]],
            "spans": [spans],
            "n_spans": [len(spans)],
            "est_pages": [len(doc_meta.get("pages") or [])],
        }
    )


def extract_spans_split(
    paths,
    cfg: PipelineConfig | None = None,
    split_pages: int = 50,
    heavy_pages: int = 200,
    num_partitions: int = 8,
    prepare_parallelism: int = 32,
):
    """Full skew-aware extraction: light docs through the ordinary parse,
    heavy docs page-split → parallel prepare → groupby(doc_id) finish.

    Returns a Dataset of (doc_id, spans, n_spans) unioned across both
    branches (plus est_pages/error columns on the light branch).

    Both branches use the FUSED fragment read (read_row_group inside the
    task): the light branch via ``extract_spans_fused`` with an in-task
    ``est_pages < heavy_pages`` row filter, the heavy branch via a fused
    read+explode — raw word-struct blocks never enter the object store on
    either path (previously the heavy scan shipped every raw block to the
    explode stage)."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq
    import ray.data

    cfg = cfg or PipelineConfig()

    light_out = extract_spans_fused(
        paths, cfg,
        row_filter=lambda t: pc.less(t.column("est_pages"), heavy_pages),
    ).map_batches(
        lambda df: df[["doc_id", "spans", "n_spans"]], batch_format="pandas"
    )

    def read_and_explode(batch: pa.Table):
        for item in batch.to_pylist():
            pf = _pq.ParquetFile(item["path"])
            avail = set(pf.schema_arrow.names)
            t = pf.read_row_group(
                int(item["rg"]),
                columns=[c for c in PARSE_COLUMNS if c in avail],
            )
            yield from _explode_heavy(t, cfg, split_pages, heavy_pages)

    items = list_fragments(paths)
    sub_rows = ray.data.from_items(
        items, override_num_blocks=max(1, len(items))
    ).map_batches(read_and_explode, batch_format="pyarrow", batch_size=1)
    # the repartition breaks operator FUSION (explode->prepare would
    # otherwise run as ONE task per input block, serializing all ranges of
    # a manual on one worker) and spreads sub-rows one-per-block; the
    # exchange is tiny (sliced Arrow payloads)
    sub_rows = sub_rows.repartition(prepare_parallelism)
    prepared = sub_rows.map_batches(
        _prepare_split_batch,
        fn_kwargs={"cfg": cfg, "split_pages": split_pages},
        batch_format="pyarrow",
        batch_size=1,
    )
    heavy_out = prepared.groupby("doc_id", num_partitions=num_partitions).map_groups(
        _finish_group, fn_kwargs={"cfg": cfg}, batch_format="pandas"
    )

    def to_arrow(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].tolist(), pa.string()),
                "spans": pa.array(df["spans"].tolist(), SPANS_TYPE),
                "n_spans": pa.array(
                    [int(v) for v in df["n_spans"]], pa.int32()
                ),
            }
        )

    return light_out.map_batches(to_arrow, batch_format="pandas").union(
        heavy_out.map_batches(to_arrow, batch_format="pandas")
    )
