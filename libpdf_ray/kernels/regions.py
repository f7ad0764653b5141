"""Figure / table / rect region kernels.

Faithful functional re-derivations of:

- ``check_and_filter_figures``   /root/reference/libpdf/extract.py:757-867
- figure per-page assembly       /root/reference/libpdf/extract.py:593-659
- table-in-figure suppression    /root/reference/libpdf/tables.py:207-234
- rect text capture              /root/reference/libpdf/extract.py:662-731

All inputs are plain dicts from the Arrow sidecar row; outputs are element
dicts consumed by ``kernels.document``.  The figure filter preserves the
reference's exact pair-loop mutation order (combinations snapshot + guarded
removal + original width/height used for the size comparison even after
coordinate clamping), because that order decides which of two overlapping
figures survives.
"""

from __future__ import annotations

import itertools


def filter_figures(page_figures: list, min_width: float, min_height: float) -> list:
    """check_and_filter_figures (extract.py:757-867) on one page's figures.

    ``page_figures``: dicts with x0,y0,x1,y1.  Returns the surviving figures
    (dicts with clamped coords) in original order.
    """
    survivors = []
    for fig in page_figures:
        w = float(fig["x1"]) - float(fig["x0"])
        h = float(fig["y1"]) - float(fig["y0"])
        if h > min_height and w > min_width:
            # width/height are frozen pre-clamp, as pdfplumber's figure dicts
            # carry them (the reference compares these, not recomputed dims)
            survivors.append(
                {
                    "x0": float(fig["x0"]),
                    "y0": float(fig["y0"]),
                    "x1": float(fig["x1"]),
                    "y1": float(fig["y1"]),
                    "width": w,
                    "height": h,
                }
            )

    for fig in survivors:
        for k in ("x0", "y0", "x1", "y1"):
            if fig[k] < 0:
                fig[k] = 0.0

    # complete containment: keep the outer figure (ordered pairs, snapshot)
    for fig0, fig1 in itertools.combinations(list(survivors), 2):
        if (
            fig0["x0"] <= fig1["x0"]
            and fig0["y0"] <= fig1["y0"]
            and fig0["x1"] >= fig1["x1"]
            and fig0["y1"] >= fig1["y1"]
        ):
            if fig1 in survivors:
                survivors.remove(fig1)

    # partial overlap: keep the larger figure
    for fig0, fig1 in itertools.combinations(list(survivors), 2):
        disjoint = (
            fig0["x0"] > fig1["x1"]
            or fig0["x1"] < fig1["x0"]
            or fig0["y0"] > fig1["y1"]
            or fig0["y1"] < fig1["y0"]
        )
        contained = (
            fig0["x0"] <= fig1["x0"]
            and fig0["y0"] <= fig1["y0"]
            and fig0["x1"] >= fig1["x1"]
            and fig0["y1"] >= fig1["y1"]
        )
        if not disjoint and not contained:
            if fig0["width"] * fig0["height"] <= fig1["width"] * fig1["height"]:
                if fig0 in survivors:
                    survivors.remove(fig0)
            elif fig1 in survivors:
                survivors.remove(fig1)
    return survivors


def boxes_completely_inside(textboxes: list, bbox: tuple, margin: float = 0.0) -> list:
    """Textboxes completely inside ``bbox`` ± margin, in input (layout) order
    (lt_page_crop with contain_completely=True, libpdf/utils.py:376-431)."""
    x0, y0, x1, y1 = bbox
    return [
        tb
        for tb in textboxes
        if tb["x0"] >= x0 - margin
        and tb["y0"] >= y0 - margin
        and tb["x1"] <= x1 + margin
        and tb["y1"] <= y1 + margin
    ]


def table_inside_any_figure(
    table_bbox: tuple, figure_bboxes: list, tolerance: float = 5.0
) -> bool:
    """Anti-join of tables against figures (libpdf/tables.py:207-234): a
    table completely inside a figure bbox ± tolerance is suppressed."""
    tx0, ty0, tx1, ty1 = table_bbox
    for fx0, fy0, fx1, fy1 in figure_bboxes:
        if (
            tx0 >= fx0 - tolerance
            and ty0 >= fy0 - tolerance
            and tx1 <= fx1 + tolerance
            and ty1 <= fy1 + tolerance
        ):
            return True
    return False


def grid_to_table(grid: dict) -> dict:
    """Line-grid struct → table element core.

    ``grid``: {page, row_edges (top→bottom y's, len R+1), col_edges
    (left→right x's, len C+1), cell_texts (row-major, '' = merged/empty)}.
    Mirrors the lines-strategy reconstruction of libpdf/tables.py:49-204:
    cells are row/col addressed, bbox is the outer grid rectangle.
    """
    row_edges = [float(v) for v in grid["row_edges"]]
    col_edges = [float(v) for v in grid["col_edges"]]
    n_rows = len(row_edges) - 1
    n_cols = len(col_edges) - 1
    texts = list(grid["cell_texts"])
    cells = []
    for r in range(n_rows):
        for c in range(n_cols):
            text = texts[r * n_cols + c] if r * n_cols + c < len(texts) else ""
            if text == "":
                continue  # merged / empty cell → no Cell (tables.py:168-171)
            cells.append(
                {
                    "row": r + 1,
                    "col": c + 1,
                    "text": text,
                    "x0": col_edges[c],
                    "y0": min(row_edges[r + 1], row_edges[r]),
                    "x1": col_edges[c + 1],
                    "y1": max(row_edges[r + 1], row_edges[r]),
                }
            )
    bbox = (
        min(col_edges),
        min(row_edges),
        max(col_edges),
        max(row_edges),
    )
    rows_texts = [
        [texts[r * n_cols + c] if r * n_cols + c < len(texts) else "" for c in range(n_cols)]
        for r in range(n_rows)
    ]
    return {
        "bbox": bbox,
        "page": int(grid["page"]),
        "cells": cells,
        "n_rows": n_rows,
        "n_cols": n_cols,
        "text": "\n".join("\t".join(row) for row in rows_texts),
    }
