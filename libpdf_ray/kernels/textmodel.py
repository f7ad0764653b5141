"""The 4-level text model: HorizontalBox → HorizontalLine → Word → Char.

Re-implements the *observable* semantics of
``/root/reference/libpdf/models/horizontal_box.py:6-211`` and the char-stream
assembly of ``libpdf/utils.py:467-544`` as plain dict/tuple kernels:

- text joins (they define span-text equality, SURVEY §2.8):
  chars join with ``''`` → word text (horizontal_box.py:199-202),
  words join with ``' '`` → line text (horizontal_box.py:147-150),
  lines join with ``'\\n'`` → box text (horizontal_box.py:95-98).
- attribute lifting: ``ncolor`` / ``fontname`` are lifted to the parent level
  only when uniform across all children (horizontal_box.py:85-92,137-144,
  190-196); otherwise the parent attribute is None.

The Ray sidecar table stores lines as ``struct<text, ncolor, fontname>``
(per-line granularity); chars inherit the line's style, which keeps the
lifting rules exercisable end to end.
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


def assemble_hbox(lines: list) -> dict:
    """Build the nested box model from raw line structs.

    ``lines`` is a list of ``{"text": str, "ncolor": [r,g,b] | None,
    "fontname": str | None}``.  Returns::

        {"text": str, "ncolor": tuple|None, "fontname": str|None,
         "lines": [{"text", "ncolor", "fontname",
                    "words": [{"text", "ncolor", "fontname"}]}]}

    Word split is on single spaces, matching the space/newline grouping of
    ``libpdf/utils.py:467-544`` (assemble_to_textlines).
    """
    out_lines = []
    for line in lines:
        ncolor = _norm_color(line.get("ncolor"))
        fontname = line.get("fontname") or None
        words = [
            {"text": w, "ncolor": ncolor, "fontname": fontname}
            for w in line["text"].split(" ")
            if w != ""
        ]
        out_lines.append(
            {
                "text": " ".join(w["text"] for w in words),
                "ncolor": _uniform(w["ncolor"] for w in words),
                "fontname": _uniform(w["fontname"] for w in words),
                "words": words,
            }
        )
    return {
        "text": "\n".join(ln["text"] for ln in out_lines),
        "ncolor": _uniform(ln["ncolor"] for ln in out_lines),
        "fontname": _uniform(ln["fontname"] for ln in out_lines),
        "lines": out_lines,
    }


def textbox_text(textbox: dict) -> str:
    """Span text of a raw sidecar textbox: '\\n'-joined line texts with the
    trailing newline stripped (``libpdf/textbox.py:128-133`` removes the
    final LTAnno newline before paragraph rendering)."""
    return "\n".join(ln["text"] for ln in textbox["lines"]).rstrip("\n")


def is_whitespace_only(text: str) -> bool:
    """Noise-box test of ``libpdf/textbox.py:129`` (``^\\s*$``)."""
    return text.strip() == ""
