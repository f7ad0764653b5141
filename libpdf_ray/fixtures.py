"""Deterministic synthetic corpus generator (generator-as-oracle, seed=42).

The reference's tests run 14 checked-in PDFs with inline golden assertions
(``/root/reference/tests/conftest.py:16-37``); the reference itself is not
executable here (missing patched-pdfminer wheel).  So the engine's fixtures
are synthetic *interleaved documents* built from fixed structural skeletons
with seeded random texts/geometry: the builder records BOTH the raw layout
sidecar (pipeline input) and the expected span sequence (derived from the
construction intent, NOT by running the pipeline) — span-sequence equality
per doc_id is then a real end-to-end check of the extraction semantics.

Layout model: US-Letter pages (612×792 pt), body flow cursor from y=620 down
to y=165 (outside the 20% smart-crop bands, parameters.py:144-152), fixed
char grid CHAR_W=6 / LINE_H=12 (see kernels/links.py).  All coordinates are
integer-valued floats so formatting round-trips are exact.

Families mirror the reference corpus (FIXTURES.md §3): plain, outlined,
chapternum, splitchapter, emptyoutline, figures, tables, rects,
headerfooter, linked, colors, skew.
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import RAW_DOC_SCHEMA

PAGE_W, PAGE_H = 612.0, 792.0
TOP_Y, MIN_Y = 620.0, 165.0
MARGIN_X = 72.0
CHAR_W, LINE_H = 6.0, 12.0

# body vocabulary (lorem-ish) — deliberately disjoint from title words so
# fuzzy chapter matching never crosses 0.6 similarity by accident
WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore et dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip ex ea commodo consequat "
    "duis aute irure in reprehenderit voluptate velit esse cillum fugiat nulla "
    "pariatur excepteur sint occaecat cupidatat non proident sunt culpa qui "
    "officia deserunt mollit anim id est laborum"
).split()

TITLE_WORDS = (
    "Alpha Beta Gamma Delta Epsilon Zeta Theta Lambda Sigma Omega Kappa Tau "
    "Upsilon Omicron Rho Phi Psi"
).split()

DEFAULT_FAMILIES = (
    "plain",
    "outlined",
    "chapternum",
    "splitchapter",
    "emptyoutline",
    "figures",
    "tables",
    "rects",
    "headerfooter",
    "linked",
    "colors",
    "skew",
)


def _words(rng, n: int, vocab=WORDS) -> str:
    return " ".join(vocab[int(i)] for i in rng.integers(0, len(vocab), n))


def _body_line(rng) -> str:
    # ≥ 20 chars keeps difflib similarity against short headings well < 0.6
    line = _words(rng, 4 + int(rng.integers(0, 3)))
    while len(line) < 20:
        line += " " + WORDS[int(rng.integers(0, len(WORDS)))]
    return line


def _title(rng, n: int = 2) -> str:
    return _words(rng, n, TITLE_WORDS)


def _titles(rng, count: int, n: int = 2) -> list:
    """Distinct titles (duplicate headings would make fuzzy-match ties
    fixture-dependent instead of semantics-dependent)."""
    seen: list = []
    while len(seen) < count:
        t = _title(rng, n)
        if t not in seen:
            seen.append(t)
    return seen


class FlowBuilder:
    """Places content top-down in a page flow, recording raw layout and
    expected spans in one pass (placement order == reading order by
    construction: vertical slots never overlap, so the engine's
    (page, height−y0) merge sort reproduces it)."""

    def __init__(self, doc_id: str, rng):
        self.doc_id = doc_id
        self.rng = rng
        self.page_no = 1
        self.cursor = TOP_Y
        self.pages = [{"number": 1, "width": PAGE_W, "height": PAGE_H}]
        self.textboxes: list = []
        self.outline: list = []
        self.rects: list = []
        self.table_grids: list = []
        self.figures: list = []
        self.annotations: list = []
        self.named_dests: list = []
        self.expected: list = []
        self._outline_counter = 0
        self._fig_counter: dict = {}

    # --- flow management ---
    def new_page(self):
        self.page_no += 1
        self.pages.append({"number": self.page_no, "width": PAGE_W, "height": PAGE_H})
        self.cursor = TOP_Y

    def _gap(self) -> float:
        return float(10 + int(self.rng.integers(0, 16)))

    def reserve(self, height: float) -> tuple:
        """Consume a vertical slot; returns (page_no, y1, y0)."""
        if self.cursor - height < MIN_Y:
            self.new_page()
        y1 = self.cursor
        y0 = y1 - height
        self.cursor = y0 - self._gap()
        return self.page_no, y1, y0

    # --- primitives ---
    def span(self, kind: str, text: str, media_ref: str = ""):
        self.expected.append({"kind": kind, "text": text, "media_ref": media_ref})

    def raw_textbox(
        self, page_no, x0, y1, lines, ncolor=None, fontname=None
    ) -> dict:
        width = max(len(ln) for ln in lines) * CHAR_W
        height = len(lines) * LINE_H
        tb = {
            "page": page_no,
            "x0": float(x0),
            "y0": float(y1 - height),
            "x1": float(x0 + width),
            "y1": float(y1),
            "lines": [
                {"text": ln, "ncolor": ncolor, "fontname": fontname} for ln in lines
            ],
        }
        self.textboxes.append(tb)
        return tb

    def add_par(self, lines=None, emit=True, ncolor=None, fontname=None, x_jitter=True):
        """Place a paragraph textbox in the flow."""
        if lines is None:
            lines = [_body_line(self.rng) for _ in range(1 + int(self.rng.integers(0, 3)))]
        x0 = MARGIN_X + (float(int(self.rng.integers(0, 4)) * 5) if x_jitter else 0.0)
        page_no, y1, _y0 = self.reserve(len(lines) * LINE_H)
        tb = self.raw_textbox(page_no, x0, y1, lines, ncolor, fontname)
        if emit:
            self.span("paragraph", "\n".join(lines))
        return tb

    def add_outline_entry(self, path, title, page_no, x0, y1):
        self.outline.append(
            {
                "path": path,
                "title": title,
                "page": page_no,
                "x0": float(x0),
                "y1": float(y1),
            }
        )

    def add_heading(self, path: str, display: str, span_text: str | None = None):
        """Numbered heading: outline title == rendered textbox text, so the
        fuzzy match wins on content similarity == 1."""
        page_no, y1, _ = self.reserve(LINE_H)
        self.raw_textbox(page_no, MARGIN_X, y1, [display])
        self.add_outline_entry(path, display, page_no, MARGIN_X, y1)
        self.span("chapter", span_text if span_text is not None else display)
        return page_no, y1

    def next_figure_ref(self, page_no: int) -> str:
        k = self._fig_counter.get(page_no, 0) + 1
        self._fig_counter[page_no] = k
        return f"media/{self.doc_id}/page_{page_no}_figure.{k}.png"

    # --- assembly ---
    def build_row(self, family: str) -> dict:
        rng = self.rng
        day = int(rng.integers(0, 3650))
        meta = {
            "author": f"author-{int(rng.integers(0, 100)):02d}",
            "title": _title(rng, 3),
            "creator": "graft-fixture-writer",
            "producer": "libpdf-ray-synth",
            "creation_date": datetime.datetime(2015, 1, 1)
            + datetime.timedelta(days=day),
        }
        return {
            "doc_id": self.doc_id,
            "family": family,
            "est_pages": len(self.pages),
            "meta": meta,
            "pages": self.pages,
            "textboxes": self.textboxes,
            "outline": self.outline,
            "rects": self.rects,
            "table_grids": self.table_grids,
            "figures": self.figures,
            "annotations": self.annotations,
            "named_dests": self.named_dests,
            "expected_spans": [
                {**sp, "offset": i} for i, sp in enumerate(self.expected)
            ],
        }


# ---------------------------------------------------------------------------
# family builders
# ---------------------------------------------------------------------------


def _fam_plain(b: FlowBuilder, rng):
    for _ in range(4 + int(rng.integers(0, 5))):
        b.add_par()


def _fam_outlined(b: FlowBuilder, rng):
    titles = _titles(rng, 6)
    b.add_par()  # pre-outline paragraph → stays above the outline
    b.add_heading("1", f"1 {titles[0]}")
    b.add_par()
    b.add_heading("1.1", f"1.1 {titles[1]}")
    b.add_par()
    b.add_par()
    b.new_page()
    b.add_heading("1.2", f"1.2 {titles[2]}")
    b.add_par()
    b.add_heading("2", f"2 {titles[3]}")
    b.add_par()
    # virtual chapter: outline title carries no number → virt.<level>; it is
    # the 3rd top-level outline entry, so the number is virt.3
    page_no, y1, _ = b.reserve(LINE_H)
    b.raw_textbox(page_no, MARGIN_X, y1, [titles[4]])
    b.add_outline_entry("3", titles[4], page_no, MARGIN_X, y1)
    b.span("chapter", f"virt.3 {titles[4]}")
    b.add_par()


def _fam_chapternum(b: FlowBuilder, rng):
    # exercises the chapter-number regex (catalog.py:208-209) incl. roman
    # numerals, trailing dots, single letters, and the virt fallback
    numbers = ["3.5.4", "9.", "iv", "A", "2.a.IV"]
    for i, num in enumerate(numbers):
        t = _title(rng)
        b.add_heading(str(i + 1), f"{num} {t}")
        b.add_par()
    t = _title(rng)
    page_no, y1, _ = b.reserve(LINE_H)
    b.raw_textbox(page_no, MARGIN_X, y1, [t])
    b.add_outline_entry("6", t, page_no, MARGIN_X, y1)
    b.span("chapter", f"virt.6 {t}")
    b.add_par()


def _fam_splitchapter(b: FlowBuilder, rng):
    # heading split into separate number and title textboxes by layout
    # analysis (similarity_referee two-winner branch, textbox.py:489-504)
    t1, t2 = _titles(rng, 2)
    page_no, y1, _ = b.reserve(LINE_H)
    b.raw_textbox(page_no, MARGIN_X, y1, ["2.3"])
    b.raw_textbox(page_no, MARGIN_X + 40, y1, [t1])
    b.add_outline_entry("1", f"2.3 {t1}", page_no, MARGIN_X, y1)
    b.span("chapter", f"2.3 {t1}")
    b.add_par()
    # virtual chapter adopting a standalone number textbox on its left
    # (textbox.py:440-462 + number adoption at textbox.py:204-213)
    page_no, y1, _ = b.reserve(LINE_H)
    b.raw_textbox(page_no, MARGIN_X, y1, ["B.1"])
    b.raw_textbox(page_no, MARGIN_X + 40, y1, [t2])
    b.add_outline_entry("2", t2, page_no, MARGIN_X, y1)
    b.span("chapter", f"B.1 {t2}")
    b.add_par()


def _fam_emptyoutline(b: FlowBuilder, rng):
    # issue-67-example.pdf analog: outline exists but is empty → no chapters
    for _ in range(3 + int(rng.integers(0, 3))):
        b.add_par()


def _fam_figures(b: FlowBuilder, rng):
    b.add_par()
    # normal figure
    page_no, y1, y0 = b.reserve(80)
    b.figures.append({"page": page_no, "x0": 72.0, "y0": y0, "x1": 372.0, "y1": y1})
    b.span("figure", "", b.next_figure_ref(page_no))
    # tiny figure (10×10 < FIGURE_MIN_*) → dropped
    page_no, y1, y0 = b.reserve(12)
    b.figures.append({"page": page_no, "x0": 72.0, "y0": y1 - 10, "x1": 82.0, "y1": y1})
    b.add_par()
    # containment pair: outer kept, inner dropped
    page_no, y1, y0 = b.reserve(100)
    b.figures.append({"page": page_no, "x0": 72.0, "y0": y0, "x1": 472.0, "y1": y1})
    b.figures.append(
        {"page": page_no, "x0": 100.0, "y0": y0 + 20, "x1": 200.0, "y1": y0 + 60}
    )
    b.span("figure", "", b.next_figure_ref(page_no))
    # overlap pair: smaller dropped
    page_no, y1, y0 = b.reserve(90)
    b.figures.append({"page": page_no, "x0": 72.0, "y0": y0, "x1": 300.0, "y1": y1})
    b.figures.append(
        {"page": page_no, "x0": 250.0, "y0": y0 + 10, "x1": 380.0, "y1": y1 - 10}
    )
    b.span("figure", "", b.next_figure_ref(page_no))
    # figure with a caption textbox inside → captured as figure text and
    # removed from paragraph candidates
    caption = _body_line(rng)
    page_no, y1, y0 = b.reserve(60)
    b.figures.append({"page": page_no, "x0": 72.0, "y0": y0, "x1": 450.0, "y1": y1})
    b.raw_textbox(page_no, 100.0, y0 + 22, [caption])
    b.span("figure", caption, b.next_figure_ref(page_no))
    # pr-138-example analog: negative x0 clamped to 0
    b.new_page()
    page_no, y1, y0 = b.reserve(80)
    b.figures.append({"page": page_no, "x0": -20.0, "y0": y0, "x1": 150.0, "y1": y1})
    b.span("figure", "", b.next_figure_ref(page_no))
    b.add_par()


def _fam_tables(b: FlowBuilder, rng):
    b.add_par()
    # 3×3 grid
    cells = [_words(rng, 1) for _ in range(9)]
    page_no, y1, y0 = b.reserve(90)
    b.table_grids.append(
        {
            "page": page_no,
            "row_edges": [y1, y1 - 30, y1 - 60, y1 - 90],
            "col_edges": [72.0, 172.0, 272.0, 372.0],
            "cell_texts": cells,
        }
    )
    rows = [cells[0:3], cells[3:6], cells[6:9]]
    b.span("table", "\n".join("\t".join(r) for r in rows))
    # a textbox inside the table region is swallowed (textbox.py:863-902)
    b.raw_textbox(page_no, 80.0, y1 - 6, [_words(rng, 2)])
    b.add_par()
    # 2×2 grid with a merged (empty) cell
    cells2 = [_words(rng, 1), "", _words(rng, 1), _words(rng, 1)]
    page_no, y1, y0 = b.reserve(60)
    b.table_grids.append(
        {
            "page": page_no,
            "row_edges": [y1, y1 - 30, y1 - 60],
            "col_edges": [72.0, 200.0, 328.0],
            "cell_texts": cells2,
        }
    )
    b.span("table", "\n".join(["\t".join(cells2[0:2]), "\t".join(cells2[2:4])]))
    # table completely inside a figure → suppressed (tables.py:207-234)
    page_no, y1, y0 = b.reserve(100)
    b.figures.append({"page": page_no, "x0": 72.0, "y0": y0, "x1": 472.0, "y1": y1})
    b.table_grids.append(
        {
            "page": page_no,
            "row_edges": [y1 - 10, y1 - 40, y1 - 70],
            "col_edges": [100.0, 220.0, 340.0],
            "cell_texts": [_words(rng, 1)] * 4,
        }
    )
    b.span("figure", "", b.next_figure_ref(page_no))
    b.add_par()


def _fam_rects(b: FlowBuilder, rng):
    b.add_par()
    # rect with text inside: the textbox stays a paragraph too (the
    # reference removes textboxes only for tables/figures, textbox.py:869)
    code = [_body_line(rng), _body_line(rng)]
    page_no, y1, y0 = b.reserve(float(len(code)) * LINE_H + 16)
    tb = b.raw_textbox(page_no, 80.0, y1 - 8, code)
    b.rects.append(
        {
            "page": page_no,
            "x0": 72.0,
            "y0": y0,
            "x1": tb["x1"] + 8.0,
            "y1": y1,
            "non_stroking_color": [0.9, 0.9, 0.5],
        }
    )
    b.span("paragraph", "\n".join(code))
    b.span("rect", "\n".join(code))
    b.add_par()
    # empty rect (admonition bar with no text)
    page_no, y1, y0 = b.reserve(30)
    b.rects.append(
        {
            "page": page_no,
            "x0": 72.0,
            "y0": y0,
            "x1": 300.0,
            "y1": y1,
            "non_stroking_color": [1.0, 0.5, 0.5],
        }
    )
    b.span("rect", "")
    b.add_par()


def _fam_headerfooter(b: FlowBuilder, rng):
    # repeating page furniture on 5 pages; expected spans assume the
    # flagship smart_page_crop=True config (extract.py:225-351)
    header = f"Confidential {_title(rng, 1)}"
    n_pages = 5
    for p in range(1, n_pages + 1):
        if p > 1:
            b.new_page()
        b.raw_textbox(p, MARGIN_X, 770.0, [header])
        for _ in range(3):
            b.add_par()
        b.raw_textbox(p, MARGIN_X, 52.0, [f"Page {p}"])


def _fam_linked(b: FlowBuilder, rng):
    t1, t2 = _titles(rng, 2)
    b.add_heading("1", f"1 {t1}")
    # paragraph A: explicit-destination link over its second word
    line_a = _body_line(rng)
    tb_a = b.add_par([line_a])
    words_a = line_a.split(" ")
    s = len(words_a[0]) + 1
    e = s + len(words_a[1])
    # paragraph B: named-destination link over its first word
    line_b = _body_line(rng)
    tb_b = b.add_par([line_b])
    e_b = len(line_b.split(" ")[0])
    # paragraph C: link into empty space → raw page-coordinate fallback
    line_c = _body_line(rng)
    tb_c = b.add_par([line_c])
    b.new_page()
    _, h2_y1 = b.add_heading("2", f"2 {t2}")
    h2_page = b.page_no
    b.add_par()

    def anno(tb, cs, ce, **dest):
        b.annotations.append(
            {
                "page": tb["page"],
                "x0": tb["x0"] + cs * CHAR_W + 1,
                "y0": tb["y1"] - LINE_H,
                "x1": tb["x0"] + ce * CHAR_W - 1,
                "y1": tb["y1"],
                "dest_page": dest.get("page", 0),
                "dest_x": dest.get("x", 0.0),
                "dest_y": dest.get("y", 0.0),
                "dest_name": dest.get("name", ""),
            }
        )

    anno(tb_a, s, e, page=h2_page, x=MARGIN_X, y=h2_y1)
    anno(tb_b, 0, e_b, name="sec2")
    anno(tb_c, 0, 5, page=h2_page, x=560.0, y=400.0)
    b.named_dests.append(
        {"name": "sec2", "page": h2_page, "x": MARGIN_X, "y": h2_y1}
    )
    # expected spans: link spans follow their paragraph (engine convention);
    # builder recorded [ch1, A, B, C, ch2, par] → insert links by index
    def link_span(anchor, target):
        return {"kind": "link", "text": f"{anchor}->{target}", "media_ref": ""}

    b.expected = [
        b.expected[0],  # ch1
        b.expected[1],  # A
        link_span(line_a[s:e], "chapter.2"),
        b.expected[2],  # B
        link_span(line_b[0:e_b], "chapter.2"),
        b.expected[3],  # C
        link_span(line_c[0:5], f"page.{h2_page}/560.0:400.0"),
        b.expected[4],  # ch2
        b.expected[5],  # trailing paragraph
    ]


def _fam_twocolumn(b: FlowBuilder, rng):
    """two_colums_sampe.pdf analog: the reference has NO column detection —
    reading order is strictly (page, height − y0) (process.py:202-207), so
    side-by-side columns interleave by y.  The expected spans encode that
    quirk deliberately."""
    left_x, right_x = MARGIN_X, 330.0
    placed = []  # (y0, lines)
    cursor_l, cursor_r = TOP_Y, TOP_Y - float(int(rng.integers(5, 20)))
    for _ in range(3):
        lines = [_body_line(b.rng)]
        b.raw_textbox(1, left_x, cursor_l, lines)
        placed.append((cursor_l - LINE_H, lines))
        cursor_l -= LINE_H + b._gap()
        lines = [_body_line(b.rng)]
        b.raw_textbox(1, right_x, cursor_r, lines)
        placed.append((cursor_r - LINE_H, lines))
        cursor_r -= LINE_H + b._gap()
    for _y0, lines in sorted(placed, key=lambda p: -p[0]):
        b.span("paragraph", "\n".join(lines))


def _fam_tablelinks(b: FlowBuilder, rng):
    """Links inside table cells and figure captions (tables.py:178-186,
    extract.py:638-641): cell links resolve to chapter uids, figure links
    stay unresolved.  Span sequence is unchanged by cell/figure links
    (only paragraph links emit spans); the links_table view carries them."""
    t1 = _title(rng)
    b.add_heading("1", f"1 {t1}")
    b.add_par()
    # 2×2 grid; cell (1,2) carries a link over its first word, to chapter 1
    ch1_y1 = b.outline[0]["y1"]
    cells = [_words(rng, 1), _words(rng, 2), _words(rng, 1), ""]
    page_no, y1, y0 = b.reserve(60)
    b.table_grids.append(
        {
            "page": page_no,
            "row_edges": [y1, y1 - 30, y1 - 60],
            "col_edges": [72.0, 200.0, 328.0],
            "cell_texts": cells,
        }
    )
    b.span("table", "\n".join(["\t".join(cells[0:2]), "\t".join(cells[2:4])]))
    # annotation over the first word of cell (1,2): cell text renders from
    # the cell's top-left corner in the synthetic char model
    first_word = cells[1].split(" ")[0]
    b.annotations.append(
        {
            "page": page_no,
            "x0": 200.0 + 1,
            "y0": y1 - LINE_H,
            "x1": 200.0 + len(first_word) * CHAR_W - 1,
            "y1": y1,
            "dest_page": 1,
            "dest_x": MARGIN_X,
            "dest_y": ch1_y1,
            "dest_name": "",
        }
    )
    # figure with caption carrying an (unresolved) link over chars 0..4
    caption = _body_line(rng)
    page_no, y1, y0 = b.reserve(60)
    b.figures.append({"page": page_no, "x0": 72.0, "y0": y0, "x1": 450.0, "y1": y1})
    tb = b.raw_textbox(page_no, 100.0, y0 + 22, [caption])
    b.annotations.append(
        {
            "page": page_no,
            "x0": tb["x0"] + 1,
            "y0": tb["y1"] - LINE_H,
            "x1": tb["x0"] + 4 * CHAR_W - 1,
            "y1": tb["y1"],
            "dest_page": 1,
            "dest_x": MARGIN_X,
            "dest_y": ch1_y1,
            "dest_name": "",
        }
    )
    b.span("figure", caption, b.next_figure_ref(page_no))
    b.add_par()


def _fam_colors(b: FlowBuilder, rng):
    # ncolor / fontname lifting (horizontal_box.py:85-92,137-144,190-196);
    # spans are unaffected — tests assert the hbox model directly
    b.add_par(ncolor=[1.0, 0.0, 0.0], fontname="Courier")
    lines = [_body_line(rng), _body_line(rng)]
    page_no, y1, _ = b.reserve(len(lines) * LINE_H)
    tb = {
        "page": page_no,
        "x0": MARGIN_X,
        "y0": float(y1 - len(lines) * LINE_H),
        "x1": MARGIN_X + max(len(ln) for ln in lines) * CHAR_W,
        "y1": float(y1),
        "lines": [
            {"text": lines[0], "ncolor": [0.0, 0.0, 1.0], "fontname": "Helvetica"},
            {"text": lines[1], "ncolor": [0.0, 1.0, 0.0], "fontname": "Helvetica"},
        ],
    }
    b.textboxes.append(tb)
    b.span("paragraph", "\n".join(lines))
    b.add_par()


def _fam_skew(b: FlowBuilder, rng, n_pages: int = 40):
    # the skew tail of the north rule: a long outlined manual (chapters on
    # every page — the realistic shape; fuzzy chapter matching is the
    # dominant per-page extraction cost) next to 1-page flyers
    for p in range(1, n_pages + 1):
        if p > 1:
            b.new_page()
        for k in (1, 2):
            num = f"{p}.{k}"
            b.add_heading(f"{2 * (p - 1) + k}", f"{num} {_title(rng)}")
            for _ in range(3):
                b.add_par()


FAMILY_BUILDERS = {
    "plain": _fam_plain,
    "outlined": _fam_outlined,
    "chapternum": _fam_chapternum,
    "splitchapter": _fam_splitchapter,
    "emptyoutline": _fam_emptyoutline,
    "figures": _fam_figures,
    "tables": _fam_tables,
    "rects": _fam_rects,
    "headerfooter": _fam_headerfooter,
    "linked": _fam_linked,
    "colors": _fam_colors,
    "skew": _fam_skew,
    "twocolumn": _fam_twocolumn,
    "tablelinks": _fam_tablelinks,
}


def build_document(doc_index: int, family: str, seed: int = 42, skew_pages: int = 40) -> dict:
    rng = np.random.default_rng([seed, doc_index])
    doc_id = f"doc-{doc_index:06d}"
    b = FlowBuilder(doc_id, rng)
    if family == "skew":
        _fam_skew(b, rng, n_pages=skew_pages)
    else:
        FAMILY_BUILDERS[family](b, rng)
    return b.build_row(family)


def make_corpus_rows(
    n_docs: int,
    seed: int = 42,
    families=DEFAULT_FAMILIES,
    skew_pages: int = 40,
) -> list:
    return [
        build_document(i, families[i % len(families)], seed, skew_pages)
        for i in range(n_docs)
    ]


def corpus_table(n_docs: int, seed: int = 42, families=DEFAULT_FAMILIES, skew_pages: int = 40) -> pa.Table:
    rows = make_corpus_rows(n_docs, seed, families, skew_pages)
    return pa.Table.from_pylist(rows, schema=RAW_DOC_SCHEMA)


def write_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    shards: int = 8,
    families=DEFAULT_FAMILIES,
    skew_pages: int = 40,
) -> str:
    """Write the corpus as ``shards`` parquet files (the resume/partition
    unit of the pipeline).  Idempotent for a given (n_docs, seed, shards)."""
    os.makedirs(out_dir, exist_ok=True)
    import hashlib

    fam_tag = hashlib.md5(",".join(families).encode()).hexdigest()[:8]
    marker = os.path.join(
        out_dir, f"_done_n{n_docs}_s{seed}_p{shards}_k{skew_pages}_f{fam_tag}"
    )
    if os.path.exists(marker):
        return out_dir
    per = (n_docs + shards - 1) // shards
    for shard in range(shards):
        lo, hi = shard * per, min((shard + 1) * per, n_docs)
        if lo >= hi:
            break
        rows = [
            build_document(i, families[i % len(families)], seed, skew_pages)
            for i in range(lo, hi)
        ]
        table = pa.Table.from_pylist(rows, schema=RAW_DOC_SCHEMA)
        pq.write_table(table, os.path.join(out_dir, f"part-{shard:04d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
