"""Style views: word/line/box ncolor+fontname and rect fill colors.

The reference models per-char color/font with lift-to-parent rules
(/root/reference/libpdf/models/horizontal_box.py:6-211, asserted by
tests/test_word_colors.py:7-143) and exposes rect ``non_stroking_color``
(models/rect.py:17-54, tests/test_rects.py:118-233).  Round 1 dropped both
on the floor; these stages expose them as flat relational tables:

- :func:`text_styles_table` — one row per WORD with its own style plus the
  line-level and box-level lifted attributes (None columns where children
  are mixed), straight from the engine's layout assembly.
- :func:`rect_styles_table` — one row per rect with its fill color and
  captured text.

Colors land as nullable ``(r, g, b)`` doubles so the tables stay joinable
and Arrow-clean (no nested list landmines in downstream pandas shuffles).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.textmodel import hbox_from_lines, line_word_dicts


def _rgb(color):
    if color is None:
        return (None, None, None)
    c = tuple(float(v) for v in color)
    return (c + (None, None, None))[:3]


def styles_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    from .parse import decode_sidecar_rows
    from ..kernels.document import selected_pages
    from ..kernels.textmodel import (
        assemble_lines_from_arrays,
        assemble_textbox_lines,
        tab_slice,
    )

    rows = decode_sidecar_rows(batch)
    cols: dict = {
        k: []
        for k in (
            "doc_id", "page", "box_idx", "line_idx", "word_idx", "word_text",
            "word_ncolor_r", "word_ncolor_g", "word_ncolor_b", "word_fontname",
            "line_ncolor_r", "line_ncolor_g", "line_ncolor_b", "line_fontname",
            "box_ncolor_r", "box_ncolor_g", "box_ncolor_b", "box_fontname",
        )
    }
    for doc in rows:
        pages = selected_pages(doc, cfg)
        if not pages:
            continue
        # the style model is read off ALL assembled textboxes (same layout
        # kernel the span path runs), independent of element classification
        for box_idx, tb in enumerate(doc.get("textboxes") or []):
            if int(tb["page"]) not in pages:
                continue
            if tb.get("wordtab") is not None or tb.get("chartab") is not None:
                is_chars = tb.get("chartab") is not None
                lines = assemble_lines_from_arrays(
                    tab_slice(tb["chartab"] if is_chars else tb["wordtab"]),
                    is_chars,
                    cfg.line_y_tolerance,
                    cfg.word_margin,
                )
            else:
                lines = assemble_textbox_lines(
                    tb, cfg.line_y_tolerance, cfg.word_margin
                )
            hbox = hbox_from_lines(lines)
            br, bg, bb = _rgb(hbox["ncolor"])
            for line_idx, ln in enumerate(lines):
                lr, lg, lb = _rgb(ln["ncolor"])
                for word_idx, w in enumerate(line_word_dicts(ln)):
                    wr, wg, wb = _rgb(w["ncolor"])
                    cols["doc_id"].append(doc["doc_id"])
                    cols["page"].append(int(tb["page"]))
                    cols["box_idx"].append(box_idx)
                    cols["line_idx"].append(line_idx)
                    cols["word_idx"].append(word_idx)
                    cols["word_text"].append(w["text"])
                    cols["word_ncolor_r"].append(wr)
                    cols["word_ncolor_g"].append(wg)
                    cols["word_ncolor_b"].append(wb)
                    cols["word_fontname"].append(w["fontname"])
                    cols["line_ncolor_r"].append(lr)
                    cols["line_ncolor_g"].append(lg)
                    cols["line_ncolor_b"].append(lb)
                    cols["line_fontname"].append(ln["fontname"])
                    cols["box_ncolor_r"].append(br)
                    cols["box_ncolor_g"].append(bg)
                    cols["box_ncolor_b"].append(bb)
                    cols["box_fontname"].append(hbox["fontname"])
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "page": pa.array(cols["page"], pa.int32()),
            "box_idx": pa.array(cols["box_idx"], pa.int32()),
            "line_idx": pa.array(cols["line_idx"], pa.int32()),
            "word_idx": pa.array(cols["word_idx"], pa.int32()),
            "word_text": pa.array(cols["word_text"], pa.string()),
            "word_ncolor_r": pa.array(cols["word_ncolor_r"], pa.float64()),
            "word_ncolor_g": pa.array(cols["word_ncolor_g"], pa.float64()),
            "word_ncolor_b": pa.array(cols["word_ncolor_b"], pa.float64()),
            "word_fontname": pa.array(cols["word_fontname"], pa.string()),
            "line_ncolor_r": pa.array(cols["line_ncolor_r"], pa.float64()),
            "line_ncolor_g": pa.array(cols["line_ncolor_g"], pa.float64()),
            "line_ncolor_b": pa.array(cols["line_ncolor_b"], pa.float64()),
            "line_fontname": pa.array(cols["line_fontname"], pa.string()),
            "box_ncolor_r": pa.array(cols["box_ncolor_r"], pa.float64()),
            "box_ncolor_g": pa.array(cols["box_ncolor_g"], pa.float64()),
            "box_ncolor_b": pa.array(cols["box_ncolor_b"], pa.float64()),
            "box_fontname": pa.array(cols["box_fontname"], pa.string()),
        }
    )


def rect_styles_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    import dataclasses

    from ..kernels.document import extract_document_full

    # rects-only slice: the view carries no uid and no cross-element state,
    # so every other extraction stage (figures/tables/paragraph rendering,
    # outline chapter matching — the difflib path — and link resolution)
    # is toggled off; rect geometry/color/cropped-text output is identical
    # (rects interact with no other element kind in the reference,
    # libpdf/extract.py:662-731)
    cfg = dataclasses.replace(
        cfg,
        no_chapters=True,
        no_paragraphs=True,
        no_tables=True,
        no_figures=True,
        no_annotations=True,
    )
    rows = batch.to_pylist()
    cols: dict = {
        k: []
        for k in (
            "doc_id", "page", "x0", "y0", "x1", "y1",
            "ncolor_r", "ncolor_g", "ncolor_b", "text",
        )
    }
    for doc in rows:
        _, elements = extract_document_full(doc, cfg)
        for el in elements:
            if el["etype"] != "rect":
                continue
            r, g, b = _rgb(el.get("ncolor"))
            cols["doc_id"].append(doc["doc_id"])
            cols["page"].append(el["page"])
            cols["x0"].append(el["x0"])
            cols["y0"].append(el["y0"])
            cols["x1"].append(el["x1"])
            cols["y1"].append(el["y1"])
            cols["ncolor_r"].append(r)
            cols["ncolor_g"].append(g)
            cols["ncolor_b"].append(b)
            cols["text"].append(el.get("text", ""))
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "page": pa.array(cols["page"], pa.int32()),
            "x0": pa.array(cols["x0"], pa.float64()),
            "y0": pa.array(cols["y0"], pa.float64()),
            "x1": pa.array(cols["x1"], pa.float64()),
            "y1": pa.array(cols["y1"], pa.float64()),
            "ncolor_r": pa.array(cols["ncolor_r"], pa.float64()),
            "ncolor_g": pa.array(cols["ncolor_g"], pa.float64()),
            "ncolor_b": pa.array(cols["ncolor_b"], pa.float64()),
            "text": pa.array(cols["text"], pa.string()),
        }
    )


def text_styles_table(ds, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return ds.map_batches(
        styles_batch, fn_kwargs={"cfg": cfg}, batch_format="pyarrow",
        batch_size=64,
    )


def rect_styles_table(ds, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    return ds.map_batches(
        rect_styles_batch, fn_kwargs={"cfg": cfg}, batch_format="pyarrow",
        batch_size=64,
    )
