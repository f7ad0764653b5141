"""Arrow schemas for the engine's tables.

The canonical corpus shape follows ``BASELINE.json`` ``input_hint``::

    documents (doc_id: string,
               spans: list<struct<kind, text, media_ref: string, offset: int32>>)

The raw-document *sidecar* table is the pipeline input: the synthetic
interleaved document source that mimics what the reference reads out of a PDF
(pages, layout textboxes, outline catalog, rects, line-grid tables, figures,
link annotations — see SURVEY.md §1.3 and FIXTURES.md §2).  One row per
document, so a document never spans two blocks and all reference semantics
stay intra-row (the reference is strictly intra-document, SURVEY §2.4).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_TYPE = pa.list_(SPAN_STRUCT)

SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),
    ]
)

_LINE_STRUCT = pa.struct(
    [
        ("text", pa.string()),
        ("ncolor", pa.list_(pa.float64())),
        ("fontname", pa.string()),
    ]
)

RAW_DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("family", pa.string()),
        ("est_pages", pa.int32()),
        (
            "meta",
            pa.struct(
                [
                    ("author", pa.string()),
                    ("title", pa.string()),
                    ("creator", pa.string()),
                    ("producer", pa.string()),
                    ("creation_date", pa.timestamp("s")),
                ]
            ),
        ),
        (
            "pages",
            pa.list_(
                pa.struct(
                    [
                        ("number", pa.int32()),
                        ("width", pa.float64()),
                        ("height", pa.float64()),
                    ]
                )
            ),
        ),
        (
            "textboxes",
            pa.list_(
                pa.struct(
                    [
                        ("page", pa.int32()),
                        ("x0", pa.float64()),
                        ("y0", pa.float64()),
                        ("x1", pa.float64()),
                        ("y1", pa.float64()),
                        ("lines", pa.list_(_LINE_STRUCT)),
                    ]
                )
            ),
        ),
        (
            "outline",
            pa.list_(
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("title", pa.string()),
                        ("page", pa.int32()),
                        ("x0", pa.float64()),
                        ("y1", pa.float64()),
                    ]
                )
            ),
        ),
        (
            "rects",
            pa.list_(
                pa.struct(
                    [
                        ("page", pa.int32()),
                        ("x0", pa.float64()),
                        ("y0", pa.float64()),
                        ("x1", pa.float64()),
                        ("y1", pa.float64()),
                        ("non_stroking_color", pa.list_(pa.float64())),
                    ]
                )
            ),
        ),
        (
            "table_grids",
            pa.list_(
                pa.struct(
                    [
                        ("page", pa.int32()),
                        ("row_edges", pa.list_(pa.float64())),
                        ("col_edges", pa.list_(pa.float64())),
                        ("cell_texts", pa.list_(pa.string())),
                    ]
                )
            ),
        ),
        (
            "figures",
            pa.list_(
                pa.struct(
                    [
                        ("page", pa.int32()),
                        ("x0", pa.float64()),
                        ("y0", pa.float64()),
                        ("x1", pa.float64()),
                        ("y1", pa.float64()),
                    ]
                )
            ),
        ),
        (
            "annotations",
            pa.list_(
                pa.struct(
                    [
                        ("page", pa.int32()),
                        ("x0", pa.float64()),
                        ("y0", pa.float64()),
                        ("x1", pa.float64()),
                        ("y1", pa.float64()),
                        ("dest_page", pa.int32()),
                        ("dest_x", pa.float64()),
                        ("dest_y", pa.float64()),
                        ("dest_name", pa.string()),
                    ]
                )
            ),
        ),
        (
            "named_dests",
            pa.list_(
                pa.struct(
                    [
                        ("name", pa.string()),
                        ("page", pa.int32()),
                        ("x", pa.float64()),
                        ("y", pa.float64()),
                    ]
                )
            ),
        ),
        ("expected_spans", SPANS_TYPE),
    ]
)
