"""Link-annotation kernels: anchor char spans and target resolution.

Re-derives the semantics of:

- ``extract_linked_chars`` / ``annos_scanner`` / char-in-anno marking
  /root/reference/libpdf/textbox.py:603-795 (char-level intersection of a
  textbox with annotation rects, with ANNO_X/Y_TOLERANCE)
- ``render_link`` + named-destination lookup
  /root/reference/libpdf/textbox.py:798-844
- ``libpdf_target_explorer`` / ``find_target_id``
  /root/reference/libpdf/process.py:397-536 (resolve (page, x, y) to the
  first containing element's hierarchical uid, else ``page.<n>/<x>:<y>``)

Char geometry: the synthetic interleaved source renders every textbox on a
fixed-pitch grid — char ``j`` of line ``i`` occupies
``[x0 + j*CHAR_W, x0 + (j+1)*CHAR_W] × [y1-(i+1)*LINE_H, y1-i*LINE_H]``.
This is the sidecar's documented char model (the analog of pdfminer's
per-char bboxes that a real PDF source would supply); both the generator and
this kernel derive from it, so char indices are exact.
"""

from __future__ import annotations

from .bbox import contains_coord

CHAR_W = 6.0
LINE_H = 12.0


def line_char_offsets(lines: list) -> list:
    """Start offset of each line within the '\\n'-joined box text."""
    offsets = []
    pos = 0
    for line in lines:
        offsets.append(pos)
        pos += len(line) + 1  # +1 for the '\n'
    return offsets


def extract_links_for_textbox(
    textbox: dict,
    annotations: list,
    anno_x_tolerance: float = 3.0,
    anno_y_tolerance: float = 3.0,
) -> list:
    """Intersect one textbox with the page's annotation rects.

    ``textbox``: {x0,y0,x1,y1,text} with text = '\\n'-joined lines.
    ``annotations``: page-local dicts {x0,y0,x1,y1,dest_page,dest_x,dest_y,
    dest_name}.  Returns links sorted by idx_start:
    ``{"idx_start", "idx_stop", "anchor", "dest": {...}}`` with Python slice
    convention for the span (libpdf/models/link.py:21-74).

    A char belongs to an annotation when its center falls inside the rect
    expanded by the x/y tolerances (the observable effect of the
    first/last-char marking in libpdf/textbox.py:737-795).
    """
    lines = textbox["text"].split("\n")
    offsets = line_char_offsets(lines)
    links = []
    for anno in annotations:
        ax0 = float(anno["x0"]) - anno_x_tolerance
        ax1 = float(anno["x1"]) + anno_x_tolerance
        ay0 = float(anno["y0"]) - anno_y_tolerance
        ay1 = float(anno["y1"]) + anno_y_tolerance
        # quick reject: no overlap with the textbox at all
        if (
            ax1 <= textbox["x0"]
            or ax0 >= textbox["x1"]
            or ay1 <= textbox["y0"]
            or ay0 >= textbox["y1"]
        ):
            continue
        start = None
        stop = None
        for i, line in enumerate(lines):
            cy = textbox["y1"] - (i + 0.5) * LINE_H
            if not (ay0 <= cy <= ay1):
                continue
            for j in range(len(line)):
                cx = textbox["x0"] + (j + 0.5) * CHAR_W
                if ax0 <= cx <= ax1:
                    idx = offsets[i] + j
                    if start is None:
                        start = idx
                    stop = idx + 1
        if start is not None:
            text = textbox["text"]
            links.append(
                {
                    "idx_start": start,
                    "idx_stop": stop,
                    "anchor": text[start:stop],
                    "dest": {
                        "page": int(anno.get("dest_page") or 0),
                        "x": float(anno.get("dest_x") or 0.0),
                        "y": float(anno.get("dest_y") or 0.0),
                        "name": anno.get("dest_name") or "",
                    },
                }
            )
    links.sort(key=lambda lk: lk["idx_start"])
    return links


def resolve_named_dest(dest: dict, named_dests: dict) -> dict:
    """``anno.des_name → catalog['dests'][name]`` (libpdf/textbox.py:817-830).

    ``named_dests``: {name: (page, x, y)}.  Unknown names keep the explicit
    coordinates."""
    name = dest.get("name") or ""
    if name and name in named_dests:
        page, x, y = named_dests[name]
        return {"page": int(page), "x": float(x), "y": float(y), "name": name}
    return dest


def find_target_uid(
    dest: dict,
    elements_in_doc_order: list,
    tolerance: float = 65.0,
) -> str:
    """find_target_id (process.py:489-536): first element on the destination
    page whose bbox contains the coordinate (leftward/upward tolerance) wins;
    fallback is the raw page coordinate string."""
    page = dest["page"]
    x, y = dest["x"], dest["y"]
    if not page:
        return "Out Of extracted pages scope"
    for el in elements_in_doc_order:
        if el["page"] != page:
            continue
        if contains_coord(
            (el["x0"], el["y0"], el["x1"], el["y1"]), page, page, x, y, tolerance
        ):
            return el["uid"]
    return f"page.{page}/{x}:{y}"
