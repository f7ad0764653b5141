"""Stdlib PNG codec + RGBA raster canvas — the raster half of K2/K3.

The reference exports 300-dpi PNG figure crops
(``/root/reference/libpdf/extract.py:734-754`` via pdfplumber
``to_image``) and 150-dpi visual-debug page renders
(``libpdf/utils.py:752-838`` via Pillow).  Neither Pillow nor any raster
codec wheel exists in this container — but a PNG is just zlib-compressed
filtered scanlines inside CRC'd chunks, all stdlib:

- :func:`encode_png` — 8-bit RGB/RGBA, filter 0, one IDAT;
- :func:`decode_png` — full filter support (0-4), color types 0/2/6,
  8-bit depth: enough to verify round-trips in tests and to decode any
  PNG this engine writes (the ``media_features`` oracle decodes real
  bytes instead of hashing a fake);
- :class:`Canvas` — numpy RGBA page buffer at a chosen dpi with
  alpha-blended fills, rect outlines, 1-px lines and a built-in 5×7
  bitmap font for label text (no font files in the container; the glyph
  set covers printable ASCII, unknowns render as hollow boxes).

All hot loops are numpy slice fills — a 300-dpi A4 page is a ~8 MP
buffer, well inside a worker's per-task budget, and each figure/page
renders independently inside ``map_batches``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """HxWx3 (RGB) or HxWx4 (RGBA) uint8 array → PNG bytes."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_png expects HxWx3|4 uint8")
    h, w, ch = arr.shape
    color_type = 6 if ch == 4 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline, one big IDAT
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → HxWxC uint8 (C = 1, 3 or 4).  8-bit, non-interlaced."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    color_type = bit_depth = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (int(row[i]) + int(row[i - ch])) & 0xFF
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average
            for i in range(stride):
                left = int(row[i - ch]) if i >= ch else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pr) & 0xFF
        out[y] = row
        prev = row
    return out.reshape(h, w, ch)


# -- 5×7 bitmap font (column bytes, LSB = top row) --------------------

_F = {
    "0": (0x3E, 0x51, 0x49, 0x45, 0x3E), "1": (0x00, 0x42, 0x7F, 0x40, 0x00),
    "2": (0x42, 0x61, 0x51, 0x49, 0x46), "3": (0x21, 0x41, 0x45, 0x4B, 0x31),
    "4": (0x18, 0x14, 0x12, 0x7F, 0x10), "5": (0x27, 0x45, 0x45, 0x45, 0x39),
    "6": (0x3C, 0x4A, 0x49, 0x49, 0x30), "7": (0x01, 0x71, 0x09, 0x05, 0x03),
    "8": (0x36, 0x49, 0x49, 0x49, 0x36), "9": (0x06, 0x49, 0x49, 0x29, 0x1E),
    "A": (0x7E, 0x11, 0x11, 0x11, 0x7E), "B": (0x7F, 0x49, 0x49, 0x49, 0x36),
    "C": (0x3E, 0x41, 0x41, 0x41, 0x22), "D": (0x7F, 0x41, 0x41, 0x22, 0x1C),
    "E": (0x7F, 0x49, 0x49, 0x49, 0x41), "F": (0x7F, 0x09, 0x09, 0x09, 0x01),
    "G": (0x3E, 0x41, 0x49, 0x49, 0x7A), "H": (0x7F, 0x08, 0x08, 0x08, 0x7F),
    "I": (0x00, 0x41, 0x7F, 0x41, 0x00), "J": (0x20, 0x40, 0x41, 0x3F, 0x01),
    "K": (0x7F, 0x08, 0x14, 0x22, 0x41), "L": (0x7F, 0x40, 0x40, 0x40, 0x40),
    "M": (0x7F, 0x02, 0x0C, 0x02, 0x7F), "N": (0x7F, 0x04, 0x08, 0x10, 0x7F),
    "O": (0x3E, 0x41, 0x41, 0x41, 0x3E), "P": (0x7F, 0x09, 0x09, 0x09, 0x06),
    "Q": (0x3E, 0x41, 0x51, 0x21, 0x5E), "R": (0x7F, 0x09, 0x19, 0x29, 0x46),
    "S": (0x46, 0x49, 0x49, 0x49, 0x31), "T": (0x01, 0x01, 0x7F, 0x01, 0x01),
    "U": (0x3F, 0x40, 0x40, 0x40, 0x3F), "V": (0x1F, 0x20, 0x40, 0x20, 0x1F),
    "W": (0x3F, 0x40, 0x38, 0x40, 0x3F), "X": (0x63, 0x14, 0x08, 0x14, 0x63),
    "Y": (0x07, 0x08, 0x70, 0x08, 0x07), "Z": (0x61, 0x51, 0x49, 0x45, 0x43),
    " ": (0x00, 0x00, 0x00, 0x00, 0x00), ".": (0x00, 0x60, 0x60, 0x00, 0x00),
    ",": (0x00, 0x50, 0x30, 0x00, 0x00), ":": (0x00, 0x36, 0x36, 0x00, 0x00),
    ";": (0x00, 0x56, 0x36, 0x00, 0x00), "!": (0x00, 0x00, 0x5F, 0x00, 0x00),
    "?": (0x02, 0x01, 0x51, 0x09, 0x06), "-": (0x08, 0x08, 0x08, 0x08, 0x08),
    "+": (0x08, 0x08, 0x3E, 0x08, 0x08), "=": (0x14, 0x14, 0x14, 0x14, 0x14),
    "/": (0x20, 0x10, 0x08, 0x04, 0x02), "\\": (0x02, 0x04, 0x08, 0x10, 0x20),
    "(": (0x00, 0x1C, 0x22, 0x41, 0x00), ")": (0x00, 0x41, 0x22, 0x1C, 0x00),
    "[": (0x00, 0x7F, 0x41, 0x41, 0x00), "]": (0x00, 0x41, 0x41, 0x7F, 0x00),
    "%": (0x23, 0x13, 0x08, 0x64, 0x62), "*": (0x14, 0x08, 0x3E, 0x08, 0x14),
    "'": (0x00, 0x05, 0x03, 0x00, 0x00), '"': (0x00, 0x07, 0x00, 0x07, 0x00),
    "_": (0x40, 0x40, 0x40, 0x40, 0x40), "#": (0x14, 0x7F, 0x14, 0x7F, 0x14),
    "&": (0x36, 0x49, 0x55, 0x22, 0x50), "@": (0x32, 0x49, 0x79, 0x41, 0x3E),
    "<": (0x08, 0x14, 0x22, 0x41, 0x00), ">": (0x00, 0x41, 0x22, 0x14, 0x08),
}
_UNKNOWN = (0x7F, 0x41, 0x41, 0x41, 0x7F)  # hollow box


def _glyph(ch: str):
    g = _F.get(ch)
    if g is None:
        g = _F.get(ch.upper())  # lowercase renders as small caps
    return g if g is not None else _UNKNOWN


_GLYPH_CACHE: dict = {}


def glyph_mask(ch: str) -> np.ndarray:
    """7×5 bool array for one character."""
    m = _GLYPH_CACHE.get(ch)
    if m is None:
        cols = _glyph(ch)
        m = np.zeros((7, 5), dtype=bool)
        for x, col in enumerate(cols):
            for y in range(7):
                if col >> y & 1:
                    m[y, x] = True
        _GLYPH_CACHE[ch] = m
    return m


class Canvas:
    """RGBA raster of one page region, y-flipped to image space.

    Coordinates are PDF points with origin bottom-left (the engine's
    convention everywhere); ``dpi`` scales to pixels.  All draw methods
    alpha-blend, so the reference's translucent debug overlays
    (rgba fills, utils.py:791-818) render faithfully."""

    def __init__(self, width_pt: float, height_pt: float, dpi: int = 150,
                 background=(255, 255, 255, 255)):
        self.scale = dpi / 72.0
        self.w = max(1, int(round(width_pt * self.scale)))
        self.h = max(1, int(round(height_pt * self.scale)))
        self.height_pt = height_pt
        self.buf = np.empty((self.h, self.w, 4), dtype=np.uint8)
        self.buf[:] = np.asarray(background, dtype=np.uint8)

    # -- coordinate mapping ------------------------------------------

    def _px_box(self, x0, y0, x1, y1):
        """PDF-point rect → (row0, row1, col0, col1) pixel box, clipped."""
        c0 = int(np.floor(x0 * self.scale))
        c1 = int(np.ceil(x1 * self.scale))
        r0 = int(np.floor((self.height_pt - y1) * self.scale))
        r1 = int(np.ceil((self.height_pt - y0) * self.scale))
        return (
            max(0, min(r0, self.h)), max(0, min(max(r1, r0 + 1), self.h)),
            max(0, min(c0, self.w)), max(0, min(max(c1, c0 + 1), self.w)),
        )

    def _blend(self, r0, r1, c0, c1, rgba):
        if r1 <= r0 or c1 <= c0:
            return
        r, g, b, a = rgba
        if a >= 255:
            self.buf[r0:r1, c0:c1, 0] = r
            self.buf[r0:r1, c0:c1, 1] = g
            self.buf[r0:r1, c0:c1, 2] = b
            self.buf[r0:r1, c0:c1, 3] = 255
            return
        dst = self.buf[r0:r1, c0:c1, :3].astype(np.uint16)
        src = np.asarray([r, g, b], dtype=np.uint16)
        self.buf[r0:r1, c0:c1, :3] = (
            (src * a + dst * (255 - a)) // 255
        ).astype(np.uint8)
        self.buf[r0:r1, c0:c1, 3] = np.maximum(self.buf[r0:r1, c0:c1, 3], a)

    # -- draw ops ----------------------------------------------------

    def fill_rect(self, x0, y0, x1, y1, rgba) -> None:
        self._blend(*self._px_box(x0, y0, x1, y1), rgba)

    def stroke_rect(self, x0, y0, x1, y1, rgba, width_pt: float = 0.75) -> None:
        wpx = max(1, int(round(width_pt * self.scale)))
        r0, r1, c0, c1 = self._px_box(x0, y0, x1, y1)
        self._blend(r0, min(r0 + wpx, r1), c0, c1, rgba)       # top
        self._blend(max(r1 - wpx, r0), r1, c0, c1, rgba)       # bottom
        self._blend(r0, r1, c0, min(c0 + wpx, c1), rgba)       # left
        self._blend(r0, r1, max(c1 - wpx, c0), c1, rgba)       # right

    def line(self, x0, y0, x1, y1, rgba, width_pt: float = 0.75) -> None:
        """Axis-aligned fast path; everything else rasterizes by steps."""
        wpx = max(1, int(round(width_pt * self.scale)))
        if abs(y1 - y0) < 1e-9 or abs(x1 - x0) < 1e-9:
            lo_x, hi_x = sorted((x0, x1))
            lo_y, hi_y = sorted((y0, y1))
            r0, r1, c0, c1 = self._px_box(lo_x, lo_y, hi_x, hi_y)
            if abs(y1 - y0) < 1e-9:
                r1 = min(max(r1, r0 + wpx), self.h)
            else:
                c1 = min(max(c1, c0 + wpx), self.w)
            self._blend(r0, r1, c0, c1, rgba)
            return
        steps = int(max(abs(x1 - x0), abs(y1 - y0)) * self.scale) + 1
        xs = np.linspace(x0, x1, steps)
        ys = np.linspace(y0, y1, steps)
        cols = np.clip((xs * self.scale).astype(np.int64), 0, self.w - 1)
        rows = np.clip(
            ((self.height_pt - ys) * self.scale).astype(np.int64), 0, self.h - 1
        )
        self.buf[rows, cols, :3] = np.asarray(rgba[:3], dtype=np.uint8)
        self.buf[rows, cols, 3] = 255

    def text(self, s: str, x, y, size_pt: float, rgba) -> None:
        """Render ``s`` with the 5×7 font, baseline-ish at (x, y) pt
        (y = glyph box bottom).  Integer pixel scaling keeps glyphs
        crisp at any dpi."""
        if not s:
            return
        px = max(1, int(round(size_pt * self.scale / 8.0)))  # pixel size
        adv = 6 * px
        r_bot = int(round((self.height_pt - y) * self.scale))
        r0 = r_bot - 7 * px
        c = int(round(x * self.scale))
        color = np.asarray(rgba[:3], dtype=np.uint8)
        for ch in s:
            mask = glyph_mask(ch)
            big = np.repeat(np.repeat(mask, px, axis=0), px, axis=1)
            rr0, cc0 = r0, c
            rr1, cc1 = r0 + big.shape[0], c + big.shape[1]
            # clip
            mr0, mc0 = max(0, -rr0), max(0, -cc0)
            rr0, cc0 = max(0, rr0), max(0, cc0)
            rr1, cc1 = min(self.h, rr1), min(self.w, cc1)
            if rr1 > rr0 and cc1 > cc0:
                sub = big[mr0:mr0 + rr1 - rr0, mc0:mc0 + cc1 - cc0]
                region = self.buf[rr0:rr1, cc0:cc1]
                region[sub, 0] = color[0]
                region[sub, 1] = color[1]
                region[sub, 2] = color[2]
                region[sub, 3] = 255
            c += adv

    def png_bytes(self, compress_level: int = 6) -> bytes:
        return encode_png(self.buf, compress_level)
