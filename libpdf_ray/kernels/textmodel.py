"""The 4-level text model: HorizontalBox → HorizontalLine → Word → Char.

Round 2: the layout assembly is a REAL engine kernel — the sidecar supplies
unordered per-word (or per-char) boxes and the engine performs:

- **line grouping by vertical center** with the reference's y tolerance
  (``assemble_to_lt_textlines``, /root/reference/libpdf/utils.py:606-631:
  a char joins the current line when |y-center − last y-center| <
  ``y_tolerance``; the reference passes ``LA_PARAMS['line_overlap']`` = 0.5
  *points* here — a quirk preserved deliberately);
- **word assembly by gap** (pdfminer ``LTTextLineHorizontal`` semantics the
  reference relies on via ``word_margin``: a space is inserted when the gap
  to the previous glyph exceeds ``word_margin ×`` the glyph's width);
- **text joins** (they define span-text equality, SURVEY §2.8): chars join
  with ``''`` → word (horizontal_box.py:199-202), words with ``' '`` → line
  (147-150), lines with ``'\\n'`` → box (95-98);
- **attribute lifting**: ``ncolor`` / ``fontname`` lift to the parent level
  only when uniform across all children (horizontal_box.py:85-92,137-144,
  190-196) — mixed word styles inside one line are now representable and
  exercised (reference tests/test_word_colors.py:7-143).
"""

from __future__ import annotations


def _uniform(values):
    """Return the single distinct value, or None when mixed / empty."""
    it = iter(values)
    try:
        first = next(it)
    except StopIteration:
        return None
    for v in it:
        if v != first:
            return None
    return first


def _norm_color(ncolor):
    if ncolor is None:
        return None
    t = tuple(float(c) for c in ncolor)
    return t if t else None


def _cluster_into_lines(items: list, y_tolerance: float) -> list:
    """Group glyph runs (words or chars) into lines by vertical center.

    ``items`` arrive in arbitrary order (the sidecar shuffles them); they are
    first brought into layout order (top→bottom, left→right), then folded
    with the reference's running-last-center rule (utils.py:614-629).
    Each returned line is sorted by x0."""
    if not items:
        return []
    ordered = sorted(
        items, key=lambda it: (-(it["y0"] + it["y1"]) / 2.0, it["x0"])
    )
    lines = [[ordered[0]]]
    last_yc = (ordered[0]["y0"] + ordered[0]["y1"]) / 2.0
    for it in ordered[1:]:
        yc = (it["y0"] + it["y1"]) / 2.0
        if abs(yc - last_yc) < y_tolerance:
            lines[-1].append(it)
        else:
            lines.append([it])
        last_yc = yc
    for line in lines:
        line.sort(key=lambda it: it["x0"])
    return lines


def _chars_to_words(line_chars: list, word_margin: float) -> list:
    """Chars of ONE line (x-sorted) → word dicts.  pdfminer word semantics:
    a word break occurs when the gap to the previous char exceeds
    ``word_margin ×`` the next char's width; explicit space chars also
    break (and are not part of any word)."""
    words = []
    cur: list = []

    def flush():
        if cur:
            words.append(_make_word(cur))
            cur.clear()

    prev = None
    for ch in line_chars:
        if ch["text"].strip() == "":
            flush()
            prev = ch
            continue
        if prev is not None and cur:
            gap = ch["x0"] - prev["x1"]
            if gap > word_margin * (ch["x1"] - ch["x0"]):
                flush()
        cur.append(ch)
        prev = ch
    flush()
    return words


def _make_word(chars: list) -> dict:
    return {
        "text": "".join(c["text"] for c in chars),
        "x0": min(c["x0"] for c in chars),
        "y0": min(c["y0"] for c in chars),
        "x1": max(c["x1"] for c in chars),
        "y1": max(c["y1"] for c in chars),
        "ncolor": _uniform(_norm_color(c.get("ncolor")) for c in chars),
        "fontname": _uniform(c.get("fontname") or None for c in chars),
    }


def _line_from_words(words: list) -> dict:
    """x-sorted word dicts → line dict with lifted attributes (+ bbox when
    the words carry geometry — needed by textbox grouping)."""
    line = {
        "text": " ".join(w["text"] for w in words),
        "ncolor": _uniform(w["ncolor"] for w in words),
        "fontname": _uniform(w["fontname"] for w in words),
        "words": words,
    }
    if words and "x0" in words[0]:
        line["x0"] = min(w["x0"] for w in words)
        line["y0"] = min(w["y0"] for w in words)
        line["x1"] = max(w["x1"] for w in words)
        line["y1"] = max(w["y1"] for w in words)
    return line


def is_pseudo_anno(run: dict) -> bool:
    """pdfminer layout analysis injects pseudo ``anno`` whitespace glyphs
    with NO geometry into the char stream; the reference deletes them
    before any processing (``delete_page_ann``, libpdf/extract.py:446-486:
    ``object_type == "anno" and text in [" ", "\\n"]``).  Our sidecar
    encodes "no coordinates" as NaN boxes — real space chars always carry
    a real box, so the predicate is exact."""
    if run.get("text") not in (" ", "\n"):
        return False
    x0 = run.get("x0")
    return x0 is None or x0 != x0  # NaN test without importing math


def delete_pseudo_annos(chars: list) -> list:
    """Drop layout-analysis pseudo-anno glyphs from a char run list
    (engine analog of ``delete_page_ann``, libpdf/extract.py:446-486)."""
    return [c for c in chars if not is_pseudo_anno(c)]


def assemble_textbox_lines(
    textbox: dict,
    y_tolerance: float = 0.5,
    word_margin: float = 0.1,
) -> list:
    """Raw sidecar textbox → assembled line dicts (the engine's layout
    analysis step).

    Accepts, in priority order: ``chars`` (rawest — char→word→line), then
    ``words`` (word→line), then pre-assembled ``lines`` (legacy corpora /
    unit tests).  Pseudo-anno whitespace glyphs are deleted from char
    streams first (libpdf/extract.py:446-486).  Returns ``[{"text",
    "ncolor", "fontname", "words"}, …]`` top-to-bottom."""
    chars = textbox.get("chars")
    if chars:
        chars = delete_pseudo_annos(chars)
        line_groups = _cluster_into_lines(list(chars), y_tolerance)
        return [
            _line_from_words(_chars_to_words(g, word_margin)) for g in line_groups
        ]
    words = textbox.get("words")
    if words:
        norm = [
            {
                "text": w["text"],
                "x0": float(w["x0"]),
                "y0": float(w["y0"]),
                "x1": float(w["x1"]),
                "y1": float(w["y1"]),
                "ncolor": _norm_color(w.get("ncolor")),
                "fontname": w.get("fontname") or None,
            }
            for w in words
        ]
        return [_line_from_words(g) for g in _cluster_into_lines(norm, y_tolerance)]
    return [
        _legacy_line(line) for line in (textbox.get("lines") or [])
    ]


def _legacy_line(line: dict) -> dict:
    """Round-1 per-line struct → line dict (words inherit the line style)."""
    ncolor = _norm_color(line.get("ncolor"))
    fontname = line.get("fontname") or None
    words = [
        {"text": w, "ncolor": ncolor, "fontname": fontname}
        for w in line["text"].split(" ")
        if w != ""
    ]
    return {
        "text": " ".join(w["text"] for w in words),
        "ncolor": _uniform(w["ncolor"] for w in words),
        "fontname": _uniform(w["fontname"] for w in words),
        "words": words,
    }


def assemble_lines_from_arrays(
    wt: dict,
    is_chars: bool,
    y_tolerance: float = 0.5,
    word_margin: float = 0.1,
) -> list:
    """Array-form layout assembly — the hot-path twin of
    :func:`assemble_textbox_lines`.

    ``wt`` is a word table: ``{"text": list[str], "x0"/"y0"/"x1"/"y1":
    np.ndarray, "ncolor": list, "fontname": list}`` (decoded zero-copy-ish
    from the Arrow batch, see stages.parse).  Produces the same line dicts,
    but per-word dicts are NOT materialized for the word path — ``words``
    is built lazily by :func:`line_word_dicts` (only table-bearing pages
    need word boxes).  Identical grouping semantics: sort by (−y-center,
    x0), break lines on |Δ y-center| ≥ tolerance."""
    import numpy as np

    n = len(wt["text"])
    if n == 0:
        return []
    if is_chars:
        # delete pseudo-anno whitespace glyphs (no geometry ⇒ NaN box;
        # libpdf/extract.py:446-486) BEFORE the geometric sort — NaN
        # y-centers would poison the lexsort.  Text check only runs on
        # the (rare) NaN rows.
        nan_idx = np.nonzero(np.isnan(wt["x0"]))[0]
        if len(nan_idx):
            keep = np.ones(n, dtype=bool)
            for i in nan_idx.tolist():
                if wt["text"][i] in (" ", "\n"):
                    keep[i] = False
            if not keep.all():
                ki = np.nonzero(keep)[0]
                wt = {
                    "text": [wt["text"][i] for i in ki],
                    "ncolor": [wt["ncolor"][i] for i in ki],
                    "fontname": [wt["fontname"][i] for i in ki],
                    "x0": wt["x0"][ki],
                    "y0": wt["y0"][ki],
                    "x1": wt["x1"][ki],
                    "y1": wt["y1"][ki],
                }
                n = len(wt["text"])
                if n == 0:
                    return []
    yc = (wt["y0"] + wt["y1"]) / 2.0
    order = np.lexsort((wt["x0"], -yc))
    yc_o = yc[order]
    breaks = np.nonzero(np.abs(np.diff(yc_o)) >= y_tolerance)[0] + 1
    bounds = [0, *breaks.tolist(), n]
    texts = wt["text"]
    ncolors = wt["ncolor"]
    fonts = wt["fontname"]
    lines = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        idx = order[a:b]
        # within a line, order is strictly by x0 (grouping tolerance may
        # have admitted slightly different y-centers)
        idx = idx[np.argsort(wt["x0"][idx], kind="stable")]
        if is_chars:
            chars = [
                {
                    "text": texts[i],
                    "x0": float(wt["x0"][i]),
                    "y0": float(wt["y0"][i]),
                    "x1": float(wt["x1"][i]),
                    "y1": float(wt["y1"][i]),
                    "ncolor": ncolors[i],
                    "fontname": fonts[i],
                }
                for i in idx
            ]
            lines.append(_line_from_words(_chars_to_words(chars, word_margin)))
            continue
        line_texts = [texts[i] for i in idx]
        ncolor = _uniform(_norm_color(ncolors[i]) for i in idx)
        fontname = _uniform(fonts[i] or None for i in idx)
        lines.append(
            {
                "text": " ".join(line_texts),
                "ncolor": ncolor,
                "fontname": fontname,
                "x0": float(wt["x0"][idx].min()),
                "y0": float(wt["y0"][idx].min()),
                "x1": float(wt["x1"][idx].max()),
                "y1": float(wt["y1"][idx].max()),
                "_wt": wt,
                "_idx": idx,
            }
        )
    return lines


def assemble_word_boxes_batched(tabs: list, y_tolerance: float = 0.5) -> list:
    """Batched word→line assembly for MANY word-backed textboxes of one
    document — output-identical to running the words path of
    :func:`assemble_lines_from_arrays` per box, but the geometric sorts run
    as ONE numpy pass over the document's concatenated word table instead
    of ~15 small-array kernel calls per box (per-box dispatch overhead was
    ~40% of parse-task time on 100-page manuals).

    ``tabs``: per-box word tables (``None``/empty allowed).  Returns one
    assembled line list per input tab.

    Ordering semantics, kept bit-identical to the per-box twin: the
    grouping sort is ``lexsort((x0, −y_center, box))`` (stable), lines
    break on box change or ``|Δ y-center| ≥ y_tolerance``, and within each
    line rows re-sort stably by x0 — expressed here as a second global
    ``lexsort((x0, line_id))``.
    """
    import numpy as np

    nb = len(tabs)
    counts = np.fromiter(
        (len(t["text"]) if t else 0 for t in tabs), dtype=np.int64, count=nb
    )
    out: list = [[] for _ in range(nb)]
    total = int(counts.sum())
    if total == 0:
        return out

    live = [t for t in tabs if t and len(t["text"])]
    x0 = np.concatenate([t["x0"] for t in live])
    y0 = np.concatenate([t["y0"] for t in live])
    x1 = np.concatenate([t["x1"] for t in live])
    y1 = np.concatenate([t["y1"] for t in live])
    if all(isinstance(t["text"], np.ndarray) for t in live):
        # parse-stage decode hands object ndarrays: C-speed concatenation
        texts = np.concatenate([t["text"] for t in live])
        ncolors = np.concatenate([t["ncolor"] for t in live])
        fonts = np.concatenate([t["fontname"] for t in live])
    else:
        texts, ncolors, fonts = [], [], []
        for t in live:
            texts.extend(t["text"])
            ncolors.extend(t["ncolor"])
            fonts.extend(t["fontname"])
    box_id = np.repeat(np.arange(nb, dtype=np.int64), counts)

    yc = (y0 + y1) / 2.0
    ord1 = np.lexsort((x0, -yc, box_id))
    b1 = box_id[ord1]
    yc1 = yc[ord1]
    newline = np.empty(total, dtype=bool)
    newline[0] = True
    newline[1:] = (b1[1:] != b1[:-1]) | (
        np.abs(np.diff(yc1)) >= y_tolerance
    )
    line_id = np.cumsum(newline) - 1
    ord2 = np.lexsort((x0[ord1], line_id))
    fin = ord1[ord2]  # final row order: by line, then x0, stable

    line_starts = np.nonzero(newline)[0]  # line_id[ord2] stays sorted
    gx0 = x0[fin]
    lx0 = np.minimum.reduceat(gx0, line_starts)
    ly0 = np.minimum.reduceat(y0[fin], line_starts)
    lx1 = np.maximum.reduceat(x1[fin], line_starts)
    ly1 = np.maximum.reduceat(y1[fin], line_starts)
    lbox = box_id[fin[line_starts]]
    line_ends = np.r_[line_starts[1:], total]

    wt_all = {
        "text": texts, "ncolor": ncolors, "fontname": fonts,
        "x0": x0, "y0": y0, "x1": x1, "y1": y1,
    }
    # unstyled documents (no word carries a color/font anywhere) skip the
    # per-line uniform-or-None lift — it is None by construction
    any_color = any(c is not None for c in ncolors)
    any_font = any(f for f in fonts)
    for li in range(len(line_starts)):
        idx = fin[line_starts[li]:line_ends[li]]
        out[int(lbox[li])].append(
            {
                "text": " ".join(texts[i] for i in idx),
                "ncolor": _uniform(_norm_color(ncolors[i]) for i in idx)
                if any_color
                else None,
                "fontname": _uniform(fonts[i] or None for i in idx)
                if any_font
                else None,
                "x0": float(lx0[li]),
                "y0": float(ly0[li]),
                "x1": float(lx1[li]),
                "y1": float(ly1[li]),
                "_wt": wt_all,
                "_idx": idx,
            }
        )
    return out


def line_word_dicts(line: dict) -> list:
    """Word dicts of an assembled line, materializing lazily for
    array-backed lines (the ``_wt``/``_idx`` form)."""
    if "words" in line:
        return line["words"]
    wt, idx = line["_wt"], line["_idx"]
    words = [
        {
            "text": wt["text"][i],
            "x0": float(wt["x0"][i]),
            "y0": float(wt["y0"][i]),
            "x1": float(wt["x1"][i]),
            "y1": float(wt["y1"][i]),
            "ncolor": _norm_color(wt["ncolor"][i]),
            "fontname": wt["fontname"][i] or None,
        }
        for i in idx
    ]
    line["words"] = words
    return words


def textbox_word_dicts(textbox: dict) -> list:
    """All word dicts of an assembled textbox (crop inputs for table
    cells), lazy for array-backed lines."""
    return [w for ln in textbox["lines"] for w in line_word_dicts(ln)]


def group_lines_into_boxes(lines: list, line_margin: float = 0.4) -> list:
    """Cluster assembled lines into textboxes — pdfminer's
    ``group_textlines`` semantics over an UNGROUPED page region: a line
    joins the current box when the vertical gap to the previous line is
    smaller than ``line_margin ×`` the line height (LA_PARAMS
    line_margin=0.4, /root/reference/libpdf/parameters.py:220-228; the
    layout-analysis step the reference delegates to pdfminer,
    libpdf/textbox.py:934-977).

    ``lines`` must carry bboxes (assembled from word/char geometry) and be
    in top-to-bottom order.  Returns textbox dicts
    ``{"x0","y0","x1","y1","lines"}``."""
    boxes = []
    cur: list = []
    prev = None
    for ln in lines:
        if prev is not None:
            gap = prev["y0"] - ln["y1"]
            height = max(ln["y1"] - ln["y0"], prev["y1"] - prev["y0"])
            if gap >= line_margin * height:
                boxes.append(cur)
                cur = []
        cur.append(ln)
        prev = ln
    if cur:
        boxes.append(cur)
    return [
        {
            "x0": min(ln["x0"] for ln in box),
            "y0": min(ln["y0"] for ln in box),
            "x1": max(ln["x1"] for ln in box),
            "y1": max(ln["y1"] for ln in box),
            "lines": box,
        }
        for box in boxes
    ]


def hbox_from_lines(lines: list) -> dict:
    """Assembled line dicts → the full HorizontalBox model with box-level
    attribute lifting (horizontal_box.py:85-98)."""
    return {
        "text": "\n".join(ln["text"] for ln in lines),
        "ncolor": _uniform(ln["ncolor"] for ln in lines),
        "fontname": _uniform(ln["fontname"] for ln in lines),
        "lines": lines,
    }


def assemble_hbox(lines: list) -> dict:
    """Legacy adapter: per-line raw structs → HorizontalBox model (kept for
    round-1 corpora and unit tests; new code path is
    :func:`assemble_textbox_lines` + :func:`hbox_from_lines`)."""
    return hbox_from_lines([_legacy_line(line) for line in lines])


def textbox_text(textbox: dict) -> str:
    """Span text of a textbox whose ``lines`` are already assembled:
    '\\n'-joined line texts with the trailing newline stripped
    (``libpdf/textbox.py:128-133`` removes the final LTAnno newline before
    paragraph rendering)."""
    return "\n".join(ln["text"] for ln in textbox["lines"]).rstrip("\n")


def is_whitespace_only(text: str) -> bool:
    """Noise-box test of ``libpdf/textbox.py:129`` (``^\\s*$``)."""
    return text.strip() == ""
