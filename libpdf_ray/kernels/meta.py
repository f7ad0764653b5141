"""File/page metadata kernels.

- :func:`parse_page_range` — the CLI page selection grammar "3-5,7"
  (/root/reference/libpdf/core.py:536-553 calculate_pages).
- :func:`parse_pdf_datetime` — PDF Info-dict ``D:YYYYMMDDHHmmSS±HH'mm'``
  timestamps with the reference's lenient handling
  (/root/reference/libpdf/extract.py:505-542: naive fallback on partial
  dates, timezone offset applied when present, ``Z`` → UTC).
- :func:`string_to_identifier` — file-name sanitization
  (/root/reference/libpdf/utils.py:109-138).
"""

from __future__ import annotations

import datetime
import re


def parse_page_range(spec: str) -> set:
    """'3-5,7' → {3, 4, 5, 7}; empty spec → empty set (= all pages)."""
    pages: set = set()
    if not spec:
        return pages
    for chunk in spec.split(","):
        chunk = chunk.strip()
        if not chunk:
            continue
        if "-" in chunk:
            lo, hi = chunk.split("-", 1)
            pages.update(range(int(lo), int(hi) + 1))
        else:
            pages.add(int(chunk))
    return pages


_PDF_DATE = re.compile(
    r"^D:(?P<Y>\d{4})(?P<m>\d{2})?(?P<d>\d{2})?"
    r"(?P<H>\d{2})?(?P<M>\d{2})?(?P<S>\d{2})?"
    r"(?P<tz>[Zz+\-].*)?$"
)


def parse_pdf_datetime(value: str):
    """``D:``-prefixed PDF timestamp → datetime (None when unparseable)."""
    if not value:
        return None
    m = _PDF_DATE.match(value.strip())
    if not m:
        return None
    g = m.groupdict()
    try:
        dt = datetime.datetime(
            int(g["Y"]),
            int(g["m"] or 1),
            int(g["d"] or 1),
            int(g["H"] or 0),
            int(g["M"] or 0),
            int(g["S"] or 0),
        )
    except ValueError:
        return None
    tz = (g["tz"] or "").replace("'", "")
    if tz and tz[0] in "zZ":
        return dt.replace(tzinfo=datetime.timezone.utc)
    if tz and tz[0] in "+-":
        try:
            sign = 1 if tz[0] == "+" else -1
            hours = int(tz[1:3])
            mins = int(tz[3:5]) if len(tz) >= 5 else 0
            offset = datetime.timedelta(hours=hours, minutes=mins) * sign
            return dt.replace(tzinfo=datetime.timezone(offset))
        except ValueError:
            return dt
    return dt


def decode_title(raw: bytes) -> str:
    """Outline-title byte decoding (/root/reference/libpdf/utils.py:72-84):
    charset-guess (chardet when importable; BOM/UTF-16 heuristic otherwise)
    with backslashreplace fallback — titles must never raise."""
    if isinstance(raw, str):
        return raw
    try:
        import chardet  # not in this container; gate behind import-try

        guess = chardet.detect(raw).get("encoding") or "utf-8"
    except ImportError:
        if raw[:2] in (b"\xfe\xff", b"\xff\xfe"):
            guess = "utf-16"
        else:
            guess = "utf-8"
    try:
        return raw.decode(guess)
    except (UnicodeDecodeError, LookupError):
        return raw.decode("utf-8", "backslashreplace")


_IDENT_BAD = re.compile(r"[^0-9a-zA-Z_]")


def string_to_identifier(name: str) -> str:
    """Sanitize a file name into an identifier: non-alphanumerics → '_',
    leading digit gets a '_' prefix (utils.py:109-138 semantics)."""
    ident = _IDENT_BAD.sub("_", name)
    if ident and ident[0].isdigit():
        ident = "_" + ident
    return ident
