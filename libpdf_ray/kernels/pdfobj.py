"""Pure-stdlib PDF object model: lexer, filters, xref, page tree.

This is the byte-level half of the engine's real-PDF decoder
(``stages/pdf_decoder.py``).  The reference binds this layer to
pdfminer/pdfplumber (``/root/reference/libpdf/extract.py:96``); neither
wheel exists in this environment, so the decoder is re-derived from the
PDF 1.7 spec (ISO 32000-1) over stdlib ``zlib``/``struct`` only:

- object lexer: numbers, names (``#xx``), literal + hex strings, arrays,
  dicts, streams, indirect refs, booleans, null;
- stream filters: FlateDecode (+ PNG/TIFF predictors), LZWDecode,
  ASCIIHexDecode, ASCII85Decode, RunLengthDecode — image-only codecs
  (DCT/JPX/CCITT/JBIG2) pass through undecoded, flagged;
- cross-reference loading: classic ``xref`` tables AND PDF-1.5 xref
  streams (``/W``/``/Index``), ``/Prev`` + ``/XRefStm`` chains, and
  compressed objects inside ``/Type /ObjStm`` object streams;
- a brute-force ``N G obj`` rescan fallback for files with broken xref
  offsets (real-corpus resilience — a poison doc must yield an error row,
  not a dead Ray task, so parse errors raise :class:`PdfError` which the
  parse stage's catch-all converts to an error span row);
- page-tree walk with attribute inheritance (Resources / MediaBox /
  Rotate / CropBox).

Everything here is per-document and allocation-light: one ``bytes`` in,
plain Python objects out.  The Ray side never sees these objects — the
decoder (``stages/pdf_decoder.py``) turns them into the engine's internal
document dict (``stages/decoder.py`` contract) inside ``map_batches``.
"""

from __future__ import annotations

import re
import zlib


class PdfError(Exception):
    """Unrecoverable parse failure for one document (poison-row signal)."""


class Name(str):
    """A PDF name object (``/Foo``) — distinct from byte strings."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"/{str.__str__(self)}"


class Ref(tuple):
    """Indirect reference ``num gen R``."""

    __slots__ = ()

    def __new__(cls, num: int, gen: int = 0):
        return tuple.__new__(cls, (int(num), int(gen)))

    @property
    def num(self) -> int:
        return self[0]

    @property
    def gen(self) -> int:
        return self[1]

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self[0]} {self[1]} R"


class Keyword(bytes):
    """A bare keyword / content-stream operator — distinct from string
    objects (both are ``bytes`` underneath; ``Tj`` operands must never be
    mistaken for the ``Tj`` operator)."""

    __slots__ = ()


NULL = object()  # PDF null singleton (distinct from "key absent")

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_REGULAR = bytes(
    b for b in range(256) if b not in _WS and b not in _DELIM
)
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OBJ_HEAD_RE = re.compile(rb"(\d{1,10})\s+(\d{1,5})\s+obj\b")


def _is_ws(b: int) -> bool:
    return b in (0, 9, 10, 12, 13, 32)


def _is_regular(b: int) -> bool:
    return not _is_ws(b) and b not in b"()<>[]{}/%"


class Lexer:
    """Positional object parser over one immutable buffer.

    ``resolve`` (when given) is used only to chase an indirect ``/Length``
    while scanning a stream body; content-stream tokenization passes
    ``None`` and never sees indirect refs.
    """

    __slots__ = ("data", "pos", "resolve")

    def __init__(self, data: bytes, pos: int = 0, resolve=None):
        self.data = data
        self.pos = pos
        self.resolve = resolve

    # -- low level ---------------------------------------------------

    def skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        p = self.pos
        while p < n:
            b = data[p]
            if _is_ws(b):
                p += 1
            elif b == 0x25:  # % comment to EOL
                while p < n and data[p] not in (10, 13):
                    p += 1
            else:
                break
        self.pos = p

    def _keyword(self) -> bytes:
        data, n = self.data, len(self.data)
        p = self.pos
        start = p
        while p < n and _is_regular(data[p]):
            p += 1
        self.pos = p
        return data[start:p]

    # -- objects -----------------------------------------------------

    def parse(self, in_content: bool = False):
        """Parse ONE object (or, in content mode, an operator keyword
        returned as ``bytes``).  Raises :class:`PdfError` at EOF."""
        self.skip_ws()
        data, n = self.data, len(self.data)
        p = self.pos
        if p >= n:
            raise PdfError("unexpected end of data")
        b = data[p]
        if b == 0x2F:  # /Name
            return self._parse_name()
        if b == 0x28:  # ( literal string
            return self._parse_literal_string()
        if b == 0x3C:  # < hex string or << dict
            if p + 1 < n and data[p + 1] == 0x3C:
                return self._parse_dict_or_stream(in_content)
            return self._parse_hex_string()
        if b == 0x5B:  # [ array
            self.pos = p + 1
            out = []
            while True:
                self.skip_ws()
                if self.pos >= n:
                    raise PdfError("unterminated array")
                if data[self.pos] == 0x5D:
                    self.pos += 1
                    return out
                out.append(self.parse(in_content))
        if b == 0x5D:
            raise PdfError("stray ']'")
        if b in b"+-." or 0x30 <= b <= 0x39:
            return self._parse_number(in_content)
        kw = self._keyword()
        if kw == b"true":
            return True
        if kw == b"false":
            return False
        if kw == b"null":
            return NULL
        if in_content:
            if not kw:  # delimiter that is no object start (e.g. '{')
                self.pos += 1
                return Keyword(data[p:p + 1])
            return Keyword(kw)  # operator
        if not kw:
            raise PdfError(f"unparsable byte {data[p]:#x} at {p}")
        return Keyword(kw)  # caller decides (obj/endobj handled above us)

    def _parse_name(self) -> Name:
        data, n = self.data, len(self.data)
        p = self.pos + 1
        out = bytearray()
        while p < n and _is_regular(data[p]):
            b = data[p]
            if b == 0x23 and p + 2 < n:  # #xx escape
                try:
                    out.append(int(data[p + 1:p + 3], 16))
                    p += 3
                    continue
                except ValueError:
                    pass
            out.append(b)
            p += 1
        self.pos = p
        return Name(out.decode("latin-1"))

    def _parse_number(self, in_content: bool):
        m = _NUM_RE.match(self.data, self.pos)
        if not m:  # lone +/-/. — treat as operator-ish keyword
            kw = self._keyword()
            if not kw:
                self.pos += 1
                return Keyword(self.data[self.pos - 1:self.pos])
            return Keyword(kw)
        self.pos = m.end()
        tok = m.group()
        if b"." in tok:
            return float(tok)
        value = int(tok)
        if in_content:
            return value
        # lookahead for "gen R" (indirect reference)
        save = self.pos
        self.skip_ws()
        m2 = _NUM_RE.match(self.data, self.pos)
        if m2 and b"." not in m2.group():
            p2 = m2.end()
            q = p2
            data, n = self.data, len(self.data)
            while q < n and _is_ws(data[q]):
                q += 1
            if q < n and data[q] == 0x52 and (
                q + 1 >= n or not _is_regular(data[q + 1])
            ):
                self.pos = q + 1
                return Ref(value, int(m2.group()))
        self.pos = save
        return value

    def _parse_literal_string(self) -> bytes:
        data, n = self.data, len(self.data)
        p = self.pos + 1
        out = bytearray()
        depth = 1
        while p < n:
            b = data[p]
            if b == 0x5C and p + 1 < n:  # backslash escape
                c = data[p + 1]
                p += 2
                if c == 0x6E:
                    out.append(10)
                elif c == 0x72:
                    out.append(13)
                elif c == 0x74:
                    out.append(9)
                elif c == 0x62:
                    out.append(8)
                elif c == 0x66:
                    out.append(12)
                elif c in b"()\\":
                    out.append(c)
                elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
                    val = c - 0x30
                    for _ in range(2):
                        if p < n and 0x30 <= data[p] <= 0x37:
                            val = val * 8 + (data[p] - 0x30)
                            p += 1
                        else:
                            break
                    out.append(val & 0xFF)
                elif c in (10, 13):  # line continuation
                    if c == 13 and p < n and data[p] == 10:
                        p += 1
                else:
                    out.append(c)
                continue
            if b == 0x28:
                depth += 1
            elif b == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = p + 1
                    return bytes(out)
            out.append(b)
            p += 1
        raise PdfError("unterminated literal string")

    def _parse_hex_string(self) -> bytes:
        data, n = self.data, len(self.data)
        p = self.pos + 1
        digits = bytearray()
        while p < n and data[p] != 0x3E:
            b = data[p]
            if (0x30 <= b <= 0x39) or (0x41 <= b <= 0x46) or (0x61 <= b <= 0x66):
                digits.append(b)
            p += 1
        self.pos = min(p + 1, n)
        if len(digits) % 2:
            digits.append(0x30)
        return bytes.fromhex(digits.decode("ascii"))

    def _parse_dict_or_stream(self, in_content: bool):
        data, n = self.data, len(self.data)
        self.pos += 2
        d: dict = {}
        while True:
            self.skip_ws()
            if self.pos + 1 < n and data[self.pos] == 0x3E and data[self.pos + 1] == 0x3E:
                self.pos += 2
                break
            key = self.parse(in_content)
            if not isinstance(key, Name):
                raise PdfError(f"dict key is not a name: {key!r}")
            d[str(key)] = self.parse(in_content)
        # stream?
        save = self.pos
        self.skip_ws()
        if data[self.pos:self.pos + 6] == b"stream":
            p = self.pos + 6
            if data[p:p + 2] == b"\r\n":
                p += 2
            elif p < n and data[p] in (10, 13):
                p += 1
            length = d.get("Length")
            if isinstance(length, Ref) and self.resolve is not None:
                length = self.resolve(length)
            body = None
            if isinstance(length, int) and 0 <= length <= n - p:
                body = data[p:p + length]
                q = p + length
                # verify: endstream should follow (possibly after EOL)
                tail = data[q:q + 20].lstrip(b"\r\n \t")
                if not tail.startswith(b"endstream"):
                    body = None
            if body is None:  # broken /Length — scan for endstream
                idx = data.find(b"endstream", p)
                if idx < 0:
                    raise PdfError("unterminated stream")
                body = data[p:idx].rstrip(b"\r\n")
                q = idx
            end = data.find(b"endstream", q)
            self.pos = (end + 9) if end >= 0 else n
            return Stream(d, bytes(body))
        self.pos = save
        return d


# -- filters ---------------------------------------------------------


def _flate(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error:
        pass
    # raw deflate / truncated stream tolerance
    for wbits in (-15, 47):
        try:
            d = zlib.decompressobj(wbits)
            out = d.decompress(data)
            return out + d.flush()
        except zlib.error:
            continue
    # salvage whatever prefix decodes
    d = zlib.decompressobj()
    out = bytearray()
    try:
        for i in range(0, len(data), 512):
            out += d.decompress(data[i:i + 512])
    except zlib.error:
        if out:
            return bytes(out)
        raise PdfError("FlateDecode failed")
    return bytes(out)


def _lzw(data: bytes) -> bytes:
    """LZWDecode (TIFF-style, early-change=1 default)."""
    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    bits, acc, width = 0, 0, 9
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            bits -= width
            code = (acc >> bits) & ((1 << width) - 1)
            if code == 256:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _ascii_hex(data: bytes) -> bytes:
    digits = bytearray(b for b in data.split(b">")[0] if not _is_ws(b))
    if len(digits) % 2:
        digits.append(0x30)
    return bytes.fromhex(digits.decode("ascii"))


def _ascii85(data: bytes) -> bytes:
    body = data.split(b"~>")[0]
    if body.startswith(b"<~"):
        body = body[2:]
    out = bytearray()
    group: list = []
    for b in body:
        if _is_ws(b):
            continue
        if b == 0x7A and not group:  # 'z' → four zero bytes
            out += b"\x00\x00\x00\x00"
            continue
        group.append(b - 33)
        if len(group) == 5:
            val = 0
            for g in group:
                val = val * 85 + g
            out += val.to_bytes(4, "big")
            group = []
    if group:
        pad = 5 - len(group)
        val = 0
        for g in group + [84] * pad:
            val = val * 85 + g
        out += val.to_bytes(4, "big")[:4 - pad]
    return bytes(out)


def _runlength(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 128:
            break
        if length < 128:
            out += data[i + 1:i + 2 + length]
            i += 2 + length
        else:
            out += data[i + 1:i + 2] * (257 - length)
            i += 2
    return bytes(out)


def apply_predictor(data: bytes, params: dict) -> bytes:
    """PNG (10-15) and TIFF (2) predictors — used by xref streams and
    Flate-compressed image/sample data."""
    predictor = int(params.get("Predictor") or 1)
    if predictor <= 1:
        return data
    colors = int(params.get("Colors") or 1)
    bpc = int(params.get("BitsPerComponent") or 8)
    columns = int(params.get("Columns") or 1)
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (colors * bpc * columns + 7) // 8
    if predictor == 2:  # TIFF horizontal differencing (8-bit only here)
        out = bytearray(data)
        for r in range(0, len(out), rowlen):
            for i in range(bpp, rowlen):
                if r + i < len(out):
                    out[r + i] = (out[r + i] + out[r + i - bpp]) & 0xFF
        return bytes(out)
    # PNG predictors: each row prefixed with a filter-type byte
    out = bytearray()
    prev = bytearray(rowlen)
    i, n = 0, len(data)
    while i + 1 <= n:
        ft = data[i]
        row = bytearray(data[i + 1:i + 1 + rowlen])
        row += bytes(rowlen - len(row))
        i += 1 + rowlen
        if ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                pa = abs(b - c)
                pb = abs(a - c)
                pc = abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


_IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode",
                  "CCF", "JBIG2Decode"}
_FILTERS = {
    "FlateDecode": _flate, "Fl": _flate,
    "LZWDecode": _lzw, "LZW": _lzw,
    "ASCIIHexDecode": _ascii_hex, "AHx": _ascii_hex,
    "ASCII85Decode": _ascii85, "A85": _ascii85,
    "RunLengthDecode": _runlength, "RL": _runlength,
}


class Stream:
    """A PDF stream: dict + raw body; :meth:`decoded` applies filters."""

    __slots__ = ("dict", "raw", "_decoded")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw
        self._decoded: bytes | None = None

    @property
    def image_codec(self) -> str | None:
        filters = self.dict.get("Filter")
        for f in filters if isinstance(filters, list) else [filters]:
            if isinstance(f, Name) and str(f) in _IMAGE_FILTERS:
                return str(f)
        return None

    def decoded(self, resolve=lambda o: o) -> bytes:
        if self._decoded is not None:
            return self._decoded
        data = self.raw
        filters = resolve(self.dict.get("Filter"))
        params = resolve(self.dict.get("DecodeParms") or self.dict.get("DP"))
        if filters is None or filters is NULL:
            filters = []
        elif not isinstance(filters, list):
            filters = [filters]
        if not isinstance(params, list):
            params = [params] * len(filters)
        for f, pr in zip(filters, params):
            f = resolve(f)
            name = str(f) if isinstance(f, Name) else ""
            if name in _IMAGE_FILTERS:
                break  # keep compressed pixels — caller sees image_codec
            fn = _FILTERS.get(name)
            if fn is None:
                raise PdfError(f"unsupported filter {name!r}")
            data = fn(data)
            pr = resolve(pr)
            if isinstance(pr, dict) and pr.get("Predictor"):
                data = apply_predictor(
                    data, {k: resolve(v) for k, v in pr.items()}
                )
        self._decoded = data
        return data


# -- document --------------------------------------------------------


class PdfFile:
    """One parsed PDF: xref-driven lazy object store + page-tree walk."""

    def __init__(self, data: bytes):
        self.data = data
        # obj num → ("o", byte_offset) | ("c", container_stm_num, index)
        self.xref: dict = {}
        self.trailer: dict = {}
        self._cache: dict = {}
        self._objstm_cache: dict = {}
        self._handler = None
        self._encrypt_num = -1
        self._load_xref()
        if "Root" not in self.trailer:
            self._rescan()
            root = self._find_root_by_scan()
            if root is None:
                raise PdfError("no /Root catalog found")
            self.trailer["Root"] = root
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is not None:
            self._encrypt_num = enc_ref.num if isinstance(enc_ref, Ref) else -1
            enc = self.resolve(enc_ref)
            if isinstance(enc, dict):
                from .pdfcrypt import SecurityHandler

                ids = self.trailer.get("ID")
                doc_id = (
                    ids[0] if isinstance(ids, list) and ids
                    and isinstance(ids[0], (bytes, bytearray)) else b""
                )
                # raises PdfError for handlers/passwords we can't open —
                # the decoder's poison-row discipline takes it from there
                self._handler = SecurityHandler(enc, bytes(doc_id), self.resolve)

    # -- xref loading ------------------------------------------------

    def _load_xref(self) -> None:
        data = self.data
        idx = data.rfind(b"startxref")
        offsets: list = []
        if idx >= 0:
            m = _NUM_RE.search(data, idx + 9)
            if m:
                offsets.append(int(m.group()))
        seen: set = set()
        while offsets:
            off = offsets.pop(0)
            if off in seen or not (0 <= off < len(data)):
                continue
            seen.add(off)
            try:
                prevs = self._load_xref_section(off)
            except PdfError:
                self._rescan()
                return
            offsets.extend(p for p in prevs if p not in seen)
        if not self.xref:
            self._rescan()

    def _load_xref_section(self, off: int) -> list:
        data = self.data
        lex = Lexer(data, off)
        lex.skip_ws()
        prevs: list = []
        if data[lex.pos:lex.pos + 4] == b"xref":
            lex.pos += 4
            while True:
                lex.skip_ws()
                if data[lex.pos:lex.pos + 7] == b"trailer":
                    lex.pos += 7
                    trailer = lex.parse()
                    if not isinstance(trailer, dict):
                        raise PdfError("bad trailer")
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
                    if "XRefStm" in trailer:
                        prevs.append(int(trailer["XRefStm"]))
                    if "Prev" in trailer:
                        prevs.append(int(trailer["Prev"]))
                    return prevs
                m = _NUM_RE.match(data, lex.pos)
                if not m:
                    raise PdfError("bad xref subsection")
                start = int(m.group())
                lex.pos = m.end()
                lex.skip_ws()
                m = _NUM_RE.match(data, lex.pos)
                if not m:
                    raise PdfError("bad xref subsection count")
                count = int(m.group())
                lex.pos = m.end()
                entry_re = re.compile(rb"\s*(\d{10})\s+(\d{5})\s+([nf])")
                for i in range(count):
                    em = entry_re.match(data, lex.pos)
                    if not em:
                        raise PdfError("bad xref entry")
                    if em.group(3) == b"n":
                        self.xref.setdefault(
                            start + i, ("o", int(em.group(1)))
                        )
                    lex.pos = em.end()
            # unreachable (loop exits via the trailer return)
        # xref stream: "N G obj <<...>> stream"
        lex2 = Lexer(data, off, resolve=self.resolve)
        m = _OBJ_HEAD_RE.match(data, lex2.pos)
        if not m:
            raise PdfError(f"no xref at offset {off}")
        lex2.pos = m.end()
        obj = lex2.parse()
        if not isinstance(obj, Stream):
            raise PdfError("xref object is not a stream")
        self._load_xref_stream(obj)
        for k, v in obj.dict.items():
            if k not in ("Length", "Filter", "DecodeParms", "W", "Index",
                        "Type", "Prev"):
                self.trailer.setdefault(k, v)
        if "Prev" in obj.dict:
            prevs.append(int(obj.dict["Prev"]))
        return prevs

    def _load_xref_stream(self, stm: Stream) -> None:
        body = stm.decoded(self.resolve)
        w = [int(self.resolve(x)) for x in self.resolve(stm.dict["W"])]
        size = int(self.resolve(stm.dict.get("Size") or 0))
        index = self.resolve(stm.dict.get("Index")) or [0, size]
        index = [int(self.resolve(x)) for x in index]
        rowlen = sum(w)
        pos = 0
        for k in range(0, len(index), 2):
            start, count = index[k], index[k + 1]
            for i in range(count):
                row = body[pos:pos + rowlen]
                pos += rowlen
                if len(row) < rowlen:
                    return
                fields = []
                o = 0
                for width in w:
                    fields.append(
                        int.from_bytes(row[o:o + width], "big") if width else None
                    )
                    o += width
                ftype = fields[0] if w[0] else 1
                num = start + i
                if num in self.xref:
                    continue
                if ftype == 1:
                    self.xref[num] = ("o", fields[1])
                elif ftype == 2:
                    self.xref[num] = ("c", fields[1], fields[2] or 0)

    def _rescan(self) -> None:
        """Brute-force recovery: scan for every ``N G obj`` header."""
        for m in _OBJ_HEAD_RE.finditer(self.data):
            # require line-start-ish context to avoid matching inside streams
            s = m.start()
            if s > 0 and _is_regular(self.data[s - 1]):
                continue
            self.xref[int(m.group(1))] = ("o", s)
        t = self.data.rfind(b"trailer")
        if t >= 0:
            try:
                lex = Lexer(self.data, t + 7, resolve=self.resolve)
                trailer = lex.parse()
                if isinstance(trailer, dict):
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
            except PdfError:
                pass

    def _find_root_by_scan(self):
        for num in sorted(self.xref):
            try:
                obj = self.get(num)
            except PdfError:
                continue
            d = obj.dict if isinstance(obj, Stream) else obj
            if isinstance(d, dict) and str(d.get("Type") or "") == "Catalog":
                return Ref(num, 0)
        return None

    # -- object access -----------------------------------------------

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, Ref):
            obj = self.get(obj.num)
            seen += 1
            if seen > 32:
                raise PdfError("reference cycle")
        return obj

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        entry = self.xref.get(num)
        if entry is None:
            self._cache[num] = NULL
            return NULL
        if entry[0] == "o":
            obj, gen = self._parse_at(num, entry[1])
            if self._handler is not None and num != self._encrypt_num:
                from .pdfcrypt import decrypt_object

                obj = decrypt_object(obj, self._handler, num, gen)
        else:
            # objects inside an object stream are covered by the
            # container stream's decryption — never re-decrypted
            obj = self._from_objstm(entry[1], entry[2], num)
        self._cache[num] = obj
        return obj

    def _parse_at(self, num: int, off: int):
        data = self.data
        m = _OBJ_HEAD_RE.match(data, off)
        if not m or int(m.group(1)) != num:
            # offset off-by-some: search nearby, then whole-file rescan
            lo = max(0, off - 64)
            m = None
            for cand in _OBJ_HEAD_RE.finditer(data, lo, min(len(data), off + 512)):
                if int(cand.group(1)) == num:
                    m = cand
                    break
            if m is None:
                raise PdfError(f"object {num} not at xref offset")
        lex = Lexer(data, m.end(), resolve=self.resolve)
        return lex.parse(), int(m.group(2))

    def _from_objstm(self, container: int, idx: int, want: int):
        parsed = self._objstm_cache.get(container)
        if parsed is None:
            stm = self.get(container)
            if not isinstance(stm, Stream):
                raise PdfError(f"object stream {container} missing")
            body = stm.decoded(self.resolve)
            n = int(self.resolve(stm.dict.get("N") or 0))
            first = int(self.resolve(stm.dict.get("First") or 0))
            head = Lexer(body, 0)
            pairs = []
            for _ in range(n):
                onum = head.parse(in_content=True)
                ooff = head.parse(in_content=True)
                pairs.append((int(onum), int(ooff)))
            parsed = {}
            for onum, ooff in pairs:
                try:
                    parsed[onum] = Lexer(body, first + ooff).parse()
                except PdfError:
                    parsed[onum] = NULL
            self._objstm_cache[container] = parsed
        if want in parsed:
            return parsed[want]
        # index-based fallback
        keys = list(parsed)
        if 0 <= idx < len(keys):
            return parsed[keys[idx]]
        return NULL

    # -- high level --------------------------------------------------

    @property
    def catalog(self) -> dict:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("catalog missing")
        return root

    @property
    def info(self) -> dict:
        info = self.resolve(self.trailer.get("Info"))
        return info if isinstance(info, dict) else {}

    def pages(self) -> list:
        """Page-tree walk with Resources/MediaBox/CropBox/Rotate
        inheritance.  Returns ``[{number, obj_id, dict, resources,
        mediabox, rotate}]`` in document order."""
        rootref = self.catalog.get("Pages")
        out: list = []
        inherit_keys = ("Resources", "MediaBox", "CropBox", "Rotate")

        def walk(ref, inherited: dict, seen: frozenset) -> None:
            num = ref.num if isinstance(ref, Ref) else -1
            if num in seen:
                return
            node = self.resolve(ref)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for k in inherit_keys:
                if k in node:
                    inh[k] = node[k]
            ntype = str(node.get("Type") or "")
            if ntype == "Pages" or (ntype != "Page" and "Kids" in node):
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, inh, seen | {num})
            else:
                mediabox = self.resolve(inh.get("MediaBox")) or [0, 0, 612, 792]
                out.append(
                    {
                        "number": len(out) + 1,
                        "obj_id": num,
                        "dict": node,
                        "resources": self.resolve(inh.get("Resources")) or {},
                        "mediabox": [float(self.resolve(v)) for v in mediabox],
                        "rotate": int(self.resolve(inh.get("Rotate")) or 0) % 360,
                    }
                )

        walk(rootref, {}, frozenset())
        if not out:
            # malformed page tree: collect /Type /Page objects directly
            for num in sorted(self.xref):
                try:
                    node = self.get(num)
                except PdfError:
                    continue
                if isinstance(node, dict) and str(node.get("Type") or "") == "Page":
                    mediabox = self.resolve(node.get("MediaBox")) or [0, 0, 612, 792]
                    out.append(
                        {
                            "number": len(out) + 1,
                            "obj_id": num,
                            "dict": node,
                            "resources": self.resolve(node.get("Resources")) or {},
                            "mediabox": [float(self.resolve(v)) for v in mediabox],
                            "rotate": int(self.resolve(node.get("Rotate")) or 0) % 360,
                        }
                    )
        return out

    def content_bytes(self, page: dict) -> bytes:
        """Concatenated, decoded content streams of one page."""
        contents = self.resolve(page["dict"].get("Contents"))
        if contents is None or contents is NULL:
            return b""
        if isinstance(contents, Stream):
            return contents.decoded(self.resolve)
        parts = []
        for ref in contents if isinstance(contents, list) else [contents]:
            stm = self.resolve(ref)
            if isinstance(stm, Stream):
                parts.append(stm.decoded(self.resolve))
        return b"\n".join(parts)


def text_string(raw) -> str:
    """PDF text-string bytes → str (UTF-16BE BOM / UTF-8 BOM / PDFDocEncoding
    ≈ latin-1), mirroring the reference's decode_title semantics
    (libpdf/utils.py)."""
    if isinstance(raw, Name):
        return str(raw)
    if isinstance(raw, str):
        return raw
    if not isinstance(raw, (bytes, bytearray)):
        return ""
    b = bytes(raw)
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", "replace")
    if b.startswith(b"\xff\xfe"):
        return b[2:].decode("utf-16-le", "replace")
    if b.startswith(b"\xef\xbb\xbf"):
        return b[3:].decode("utf-8", "replace")
    return b.decode("latin-1", "replace")


# -- fast content-stream lexer ---------------------------------------

_ARR_END = object()
_DICT_END = object()
_CONTENT_TOKEN_RE = re.compile(
    rb"[\x00\t\n\x0c\r ]*(?:"
    rb"(?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+))"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<do><<)|(?P<dc>>>)"
    rb"|(?P<hex><[^<>]*>)"
    rb"|(?P<ao>\[)|(?P<ac>\])"
    rb"|(?P<lp>\()"
    rb"|(?P<kw>[^\x00\t\n\x0c\r ()<>\[\]{}/%]+)"
    rb"|(?P<cm>%[^\r\n]*)"
    rb"|(?P<other>.)"
    rb")",
    re.S,
)
_NAME_HEX_RE = re.compile(rb"#([0-9A-Fa-f]{2})")

# Token intern caches (process-lifetime; the operator/name vocabulary of
# PDF content streams is tiny and repeats per glyph run).
_KW_CACHE: dict = {}
_NAME_CACHE: dict = {}

# every byte that is NOT a hex digit — one translate() strips garbage from
# hex strings (CID text is hex-string dense; a per-byte genexpr was hot)
_NON_HEX_BYTES = bytes(
    b for b in range(256)
    if not ((0x30 <= b <= 0x39) or (0x41 <= b <= 0x46) or (0x61 <= b <= 0x66))
)


def _scan_literal(data: bytes, pos: int):
    """Literal-string scanner shared with the generic lexer (same escape
    semantics); returns (bytes, end_pos)."""
    lex = Lexer(data, pos - 1)
    out = lex._parse_literal_string()
    return out, lex.pos


class ContentLexer:
    """Regex-driven tokenizer for CONTENT streams (and CMaps): one master
    pattern folds whitespace skipping + token classification into a
    single match per token — ~2-3× the generic byte-at-a-time
    :class:`Lexer` on operator-dense page content (profiled hot).  No
    indirect refs or stream bodies exist in content streams, so the
    grammar here is complete."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def parse(self, in_content: bool = True):  # signature-compatible
        # Group indices follow the pattern's declaration order:
        # 1=num 2=name 3=do 4=dc 5=hex 6=ao 7=ac 8=lp 9=kw 10=cm 11=other.
        # Integer dispatch + interned Keyword/Name tokens: operators and
        # resource names repeat thousands of times per page, so per-token
        # allocation is pure overhead (profiled hot).
        data = self.data
        while True:
            m = _CONTENT_TOKEN_RE.match(data, self.pos)
            if m is None:
                raise PdfError("unexpected end of data")
            end = m.end()
            if end == self.pos:
                raise PdfError("unexpected end of data")
            self.pos = end
            g = m.lastindex
            if g == 1:  # num
                tok = m.group(1)
                return float(tok) if b"." in tok else int(tok)
            if g == 9:  # kw
                kw = m.group(9)
                tok = _KW_CACHE.get(kw)
                if tok is None:
                    if kw == b"true":
                        return True
                    if kw == b"false":
                        return False
                    if kw == b"null":
                        return NULL
                    if len(_KW_CACHE) > 4096:  # pathological-input guard
                        _KW_CACHE.clear()
                    tok = _KW_CACHE[kw] = Keyword(kw)
                return tok
            if g == 2:  # name
                raw = m.group(2)
                tok = _NAME_CACHE.get(raw)
                if tok is None:
                    body = raw[1:]
                    if b"#" in body:
                        body = _NAME_HEX_RE.sub(
                            lambda mm: bytes([int(mm.group(1), 16)]), body
                        )
                    if len(_NAME_CACHE) > 65536:  # pathological-input guard
                        _NAME_CACHE.clear()
                    tok = _NAME_CACHE[raw] = Name(body.decode("latin-1"))
                return tok
            if g == 5:  # hex string
                digits = m.group(5)[1:-1].translate(None, _NON_HEX_BYTES)
                if len(digits) % 2:
                    digits += b"0"
                return bytes.fromhex(digits.decode("ascii"))
            if g == 8:  # lp
                s, self.pos = _scan_literal(data, self.pos)
                return s
            if g == 6:  # ao
                out = []
                while True:
                    o = self.parse()
                    if o is _ARR_END:
                        return out
                    if o is _DICT_END:
                        continue  # malformed; skip
                    out.append(o)
            if g == 7:  # ac
                return _ARR_END
            if g == 3:  # do
                d = {}
                while True:
                    k = self.parse()
                    if k is _DICT_END:
                        return d
                    if k is _ARR_END or not isinstance(k, Name):
                        continue  # malformed key; resync
                    d[str(k)] = self.parse()
            if g == 4:  # dc
                return _DICT_END
            if g == 10:  # comment
                continue
            # g == 11 "other": stray delimiter byte → operator-ish token
            return Keyword(m.group(11))
