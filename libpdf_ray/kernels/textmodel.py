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


def _cluster_into_lines(items: list, y_tolerance: float,
                        line_overlap: float = 0.0) -> list:
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
    last = ordered[0]
    last_yc = (last["y0"] + last["y1"]) / 2.0
    for it in ordered[1:]:
        yc = (it["y0"] + it["y1"]) / 2.0
        # two rules, matching the pdfminer stack the reference runs on:
        # the running-center rule (textbox_crop, utils.py:614-629) ALWAYS,
        # plus — only when the caller passes ``line_overlap`` (the CHAR-
        # soup page-level path) — pdfminer's relative-overlap rule
        # (LAParams line_overlap=0.5): mixed-metric fonts on one baseline
        # (serif + mono inline code, super/subscripts) have different
        # glyph-box centers but still overlap most of their heights.
        # Word/line inputs keep the absolute rule alone — the reference
        # passes line_overlap=0.5 POINTS as textbox_crop's y_tolerance,
        # a quirk pinned by tests (centers 0.6 pt apart must split).
        same = abs(yc - last_yc) < y_tolerance
        if not same and line_overlap > 0.0:
            overlap = min(last["y1"], it["y1"]) - max(last["y0"], it["y0"])
            min_h = min(last["y1"] - last["y0"], it["y1"] - it["y0"])
            same = overlap > line_overlap * min_h > 0
        if same:
            lines[-1].append(it)
        else:
            lines.append([it])
        last = it
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


def _stream_lines(chars: list, line_overlap: float, char_margin: float) -> list:
    """pdfminer ``group_objects`` line building over chars in STREAM
    order: a glyph extends the current line iff it vertically overlaps
    the previous glyph by more than ``line_overlap ×`` the smaller height
    AND sits within ``char_margin ×`` the wider glyph horizontally.

    Stream locality is what keeps COLUMNS apart when the gutter is
    narrower than ``char_margin × width`` (the writer emits one column's
    text block before the other's, so cross-column glyphs are never
    stream-adjacent) — exactly how pdfminer separates two-column pages.
    Returns x-sorted line groups in first-glyph order."""
    lines: list = []
    cur: list = []
    last = None
    for ch in chars:
        if last is not None:
            ov = min(last["y1"], ch["y1"]) - max(last["y0"], ch["y0"])
            min_h = min(last["y1"] - last["y0"], ch["y1"] - ch["y0"])
            if ch["x0"] >= last["x1"]:
                hdist = ch["x0"] - last["x1"]
            elif last["x0"] >= ch["x1"]:
                hdist = last["x0"] - ch["x1"]
            else:
                hdist = 0.0
            w = max(last["x1"] - last["x0"], ch["x1"] - ch["x0"])
            if not (ov > line_overlap * min_h and hdist < char_margin * w):
                lines.append(cur)
                cur = []
        cur.append(ch)
        last = ch
    if cur:
        lines.append(cur)
    for ln in lines:
        ln.sort(key=lambda c: c["x0"])
    return lines


def _split_by_char_margin(line_chars: list, char_margin: float) -> list:
    """Split one x-sorted glyph row at gaps wider than ``char_margin ×``
    the wider neighboring glyph (pdfminer ``hdistance < char_margin *
    max(w0, w1)`` line-membership rule, LAParams char_margin — the
    reference configures 6.0).  Side-by-side COLUMNS share a y-row but
    sit across a gutter far wider than any intra-line gap; without this
    split a two-column page fuses into garbled full-width lines."""
    if len(line_chars) < 2:
        return [line_chars]
    out = [[line_chars[0]]]
    prev = line_chars[0]
    for ch in line_chars[1:]:
        gap = ch["x0"] - prev["x1"]
        w = max(prev["x1"] - prev["x0"], ch["x1"] - ch["x0"])
        if gap >= char_margin * w and gap > 0:
            out.append([])
        out[-1].append(ch)
        prev = ch
    return out


def assemble_textbox_lines(
    textbox: dict,
    y_tolerance: float = 0.5,
    word_margin: float = 0.1,
    char_margin: float = 0.0,
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
        if char_margin > 0.0 and textbox.get("stream_ordered"):
            # real-PDF soup: glyph STREAM order is meaningful — build
            # lines the way pdfminer does (columns stay separate even
            # across a gutter narrower than char_margin × width), then
            # order the finished lines top-to-bottom for grouping
            line_groups = _stream_lines(chars, 0.5, char_margin)
            line_groups.sort(
                key=lambda g: (
                    -(min(c["y0"] for c in g) + max(c["y1"] for c in g)) / 2.0,
                    g[0]["x0"],
                )
            )
        else:
            line_groups = _cluster_into_lines(list(chars), y_tolerance,
                                              line_overlap=0.5)
            if char_margin > 0.0:
                line_groups = [
                    part
                    for g in line_groups
                    for part in _split_by_char_margin(g, char_margin)
                ]
        lines = [
            _line_from_words(_chars_to_words(g, word_margin)) for g in line_groups
        ]
        # a run of ONLY whitespace glyphs yields a word-less line with no
        # geometry (real-PDF char soups produce these; the sidecar never
        # does) — it carries no text and must not reach textbox grouping
        return [ln for ln in lines if ln["words"]]
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


def _words_from_char_arrays(
    wt: dict, idx, word_margin: float, ws_all, hc_all, hf_all
) -> list:
    """Vectorized chars→words for ONE x-sorted line: ``idx`` indexes the
    char table ``wt``.  Output-identical to ``_chars_to_words`` +
    ``_make_word`` over per-char dicts (pinned by the chars-mode fixture
    families), but word boundaries and bboxes come from numpy array ops —
    the per-char dict listcomp and per-word genexpr folds were ~80% of the
    chars assembly time (round-4 profile).

    ``ws_all``/``hc_all``/``hf_all`` are BOX-level per-row masks
    (whitespace / has-color / has-font), computed once per textbox by the
    caller so per-line work is pure indexing; style folds run only for
    words that actually carry a styled char.

    Break semantics preserved exactly: a word break occurs at a whitespace
    char (which joins no word), or when the gap to the PREVIOUS char (even
    a whitespace one) exceeds ``word_margin ×`` the next char's width."""
    import numpy as np

    n = len(idx)
    if n == 0:
        return []
    ws = ws_all[idx]
    x0l = wt["x0"][idx]
    x1l = wt["x1"][idx]
    brk = np.zeros(n, dtype=bool)
    if n > 1:
        brk[1:] = (x0l[1:] - x1l[:-1]) > word_margin * (x1l[1:] - x0l[1:])
    prev_ws = np.empty(n, dtype=bool)
    prev_ws[0] = True
    prev_ws[1:] = ws[:-1]
    kept = np.flatnonzero(~ws)
    if len(kept) == 0:
        return []
    new_word = (prev_ws | brk)[kept]
    new_word[0] = True
    starts = np.flatnonzero(new_word)
    ends = np.empty(len(starts), dtype=np.int64)
    ends[:-1] = starts[1:]
    ends[-1] = len(kept)
    gi = idx[kept]  # char-table indices, per kept char
    wx0 = np.minimum.reduceat(x0l[kept], starts)
    wy0 = np.minimum.reduceat(wt["y0"][idx][kept], starts)
    wx1 = np.maximum.reduceat(x1l[kept], starts)
    wy1 = np.maximum.reduceat(wt["y1"][idx][kept], starts)
    word_hc = np.bitwise_or.reduceat(hc_all[gi], starts)
    word_hf = np.bitwise_or.reduceat(hf_all[gi], starts)
    texts = wt["text"]
    ncolors = wt["ncolor"]
    fonts = wt["fontname"]
    words = []
    for k in range(len(starts)):
        gsl = gi[starts[k]:ends[k]]
        words.append(
            {
                "text": "".join(texts[i] for i in gsl),
                "x0": float(wx0[k]),
                "y0": float(wy0[k]),
                "x1": float(wx1[k]),
                "y1": float(wy1[k]),
                "ncolor": _uniform(_norm_color(ncolors[i]) for i in gsl)
                if word_hc[k]
                else None,
                "fontname": _uniform(fonts[i] or None for i in gsl)
                if word_hf[k]
                else None,
            }
        )
    return words


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

                def _take(col):
                    if isinstance(col, np.ndarray):
                        return col[ki]
                    return [col[i] for i in ki]

                wt = {k: _take(v) for k, v in wt.items()}
                n = len(wt["text"])
                if n == 0:
                    return []
    if is_chars:
        # box-level masks, computed once (per-line fromiter was a measured
        # regression on short lines): whitespace rows + style presence.
        # The decoder pre-slices "_has_color"/"_has_font"; dict-form tabs
        # (unit tests, legacy corpora) compute them here.
        texts0 = wt["text"]
        ws_all = np.fromiter(
            ((s or "").strip() == "" for s in texts0),
            dtype=bool,
            count=n,
        )
        hc_all = wt.get("_has_color")
        if hc_all is None:
            hc_all = np.fromiter(
                (c is not None for c in wt["ncolor"]), dtype=bool, count=n
            )
        hf_all = wt.get("_has_font")
        if hf_all is None:
            hf_all = np.fromiter(
                (bool(f) for f in wt["fontname"]), dtype=bool, count=n
            )
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
            lines.append(
                _line_from_words(
                    _words_from_char_arrays(
                        wt, idx, word_margin, ws_all, hc_all, hf_all
                    )
                )
            )
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


def tab_slice(tab):
    """Materialize a word-table view.

    The decoder hands textboxes LIGHT views ``(shared_table, lo, hi)`` into
    the batch-level flat word table (building one slice dict per textbox
    was 15% of parse-task time — measured round 4); this materializes the
    dict-of-slices form for the code paths that want per-box arrays
    (chars assembly, styles view, legacy dict tabs pass through)."""
    if tab is None or isinstance(tab, dict):
        return tab
    shared, lo, hi = tab
    # the decoder's per-row "_has_color"/"_has_font" masks slice like any
    # other aligned column and keep the style-skip fast path alive
    return {k: v[lo:hi] for k, v in shared.items()}


def assemble_word_boxes_shared(
    shared: dict, bounds: list, y_tolerance: float = 0.5
) -> list:
    """Shared-table twin of :func:`assemble_word_boxes_batched`: the boxes
    are (lo, hi) ranges into ONE flat word table, so there is no per-box
    slicing and no re-concatenation — the gather indices are built with one
    segmented arange, and the variable-width columns (text/ncolor/fontname)
    are never copied at all (lines index the shared arrays directly).

    Output-identical to slicing each box and running the batched twin
    (pinned by ``tests/test_kernels.py``); measured round 4: the
    slice→concat round-trip was ~25% of single-core parse time."""
    import numpy as np

    nb = len(bounds)
    counts = np.fromiter((hi - lo for lo, hi in bounds), dtype=np.int64, count=nb)
    out: list = [[] for _ in range(nb)]
    total = int(counts.sum())
    if total == 0:
        return out

    starts = np.fromiter((lo for lo, _ in bounds), dtype=np.int64, count=nb)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    # segmented arange: global row index of every (box, k) pair
    idxg = np.arange(total, dtype=np.int64) - np.repeat(offs, counts) + np.repeat(
        starts, counts
    )
    box_id = np.repeat(np.arange(nb, dtype=np.int64), counts)

    x0 = shared["x0"][idxg]
    y0 = shared["y0"][idxg]
    x1 = shared["x1"][idxg]
    y1 = shared["y1"][idxg]
    texts = shared["text"]
    ncolors = shared["ncolor"]
    fonts = shared["fontname"]

    yc = (y0 + y1) / 2.0
    ord1 = np.lexsort((x0, -yc, box_id))
    b1 = box_id[ord1]
    yc1 = yc[ord1]
    newline = np.empty(total, dtype=bool)
    newline[0] = True
    newline[1:] = (b1[1:] != b1[:-1]) | (np.abs(np.diff(yc1)) >= y_tolerance)
    line_id = np.cumsum(newline) - 1
    ord2 = np.lexsort((x0[ord1], line_id))
    fin = ord1[ord2]  # final LOCAL row order: by line, then x0, stable

    line_starts = np.nonzero(newline)[0]  # line_id[ord2] stays sorted
    lx0 = np.minimum.reduceat(x0[fin], line_starts)
    ly0 = np.minimum.reduceat(y0[fin], line_starts)
    lx1 = np.maximum.reduceat(x1[fin], line_starts)
    ly1 = np.maximum.reduceat(y1[fin], line_starts)
    lbox = box_id[fin[line_starts]]
    line_ends = np.r_[line_starts[1:], total]
    fin_g = idxg[fin]  # GLOBAL indices — lines address the shared table

    # per-LINE style presence via one reduceat over the decoder's per-row
    # flags: only lines that actually carry a styled row pay the
    # uniform-or-None fold (a no-style line lifts to None by construction)
    if "_has_color" in shared:
        line_has_color = np.bitwise_or.reduceat(
            shared["_has_color"][fin_g], line_starts
        )
        line_has_font = np.bitwise_or.reduceat(
            shared["_has_font"][fin_g], line_starts
        )
    else:
        ones = np.ones(len(line_starts), dtype=bool)
        line_has_color = line_has_font = ones
    for li in range(len(line_starts)):
        idx = fin_g[line_starts[li]:line_ends[li]]
        out[int(lbox[li])].append(
            {
                "text": " ".join(texts[idx].tolist()),
                "ncolor": _uniform(_norm_color(ncolors[i]) for i in idx)
                if line_has_color[li]
                else None,
                "fontname": _uniform(fonts[i] or None for i in idx)
                if line_has_font[li]
                else None,
                "x0": float(lx0[li]),
                "y0": float(ly0[li]),
                "x1": float(lx1[li]),
                "y1": float(ly1[li]),
                "_wt": shared,
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


def group_lines_into_boxes_la(lines: list, line_margin: float = 0.4,
                              align_tolerance: float = 2.0) -> list:
    """Layout-analysis textbox grouping for an UNGROUPED page region with
    possible COLUMNS: pdfminer ``find_neighbors`` semantics — a line
    joins a box only when the vertical gap fits AND the line is
    left-aligned, right-aligned, or x-overlapping with it.  Unlike the
    sequential :func:`group_lines_into_boxes`, several boxes stay OPEN at
    once, so two columns' alternating lines each find their own column's
    box instead of breaking the other's.

    ``lines`` top-to-bottom (ties left-to-right); returns textbox dicts
    in first-line order."""
    boxes: list = []  # each: {"x0","y0","x1","y1","lines",...}
    for ln in lines:
        if "y1" not in ln:
            continue
        height = ln["y1"] - ln["y0"]
        best = None
        best_overlap = -1.0
        for box in boxes:
            last = box["lines"][-1]
            gap = last["y0"] - ln["y1"]
            ref_h = max(height, last["y1"] - last["y0"])
            if gap >= line_margin * ref_h or gap < -0.6 * ref_h:
                continue
            x_overlap = min(box["x1"], ln["x1"]) - max(box["x0"], ln["x0"])
            aligned = (
                abs(ln["x0"] - box["x0"]) <= align_tolerance
                or abs(ln["x1"] - box["x1"]) <= align_tolerance
            )
            if x_overlap > 0 or aligned:
                if x_overlap > best_overlap:
                    best = box
                    best_overlap = x_overlap
        if best is None:
            boxes.append(
                {
                    "x0": ln["x0"], "y0": ln["y0"],
                    "x1": ln["x1"], "y1": ln["y1"],
                    "lines": [ln],
                }
            )
        else:
            best["lines"].append(ln)
            best["x0"] = min(best["x0"], ln["x0"])
            best["y0"] = min(best["y0"], ln["y0"])
            best["x1"] = max(best["x1"], ln["x1"])
            best["y1"] = max(best["y1"], ln["y1"])
    return boxes


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
