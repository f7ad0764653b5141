"""Standard security handler (empty-password decryption) for the PDF
reader — pure stdlib.

Covers the encryption revisions real corpora carry:

- R2/R3/R4 key derivation (Algorithm 2, MD5) with RC4 (CFM ``V2``) and
  AES-128-CBC (CFM ``AESV2``) crypt filters;
- R6 / AES-256 (Algorithm 2.A, SHA-256/384/512 hardened hash) with
  AES-256-CBC (CFM ``AESV3``);
- per-object keys (Algorithm 1) and the ``sAlT`` AES salt;
- only the EMPTY user password (the overwhelming real-world case for
  "protected" documents — like pdfminer, a non-empty password would be a
  caller-supplied argument; the engine's poison-row discipline covers
  password-protected files we cannot open).

AES is implemented from FIPS-197 (decryption-only, CBC) because no
cipher library is available in this environment; at ~10 MB/s per task it
is fast enough for the rare encrypted document and never touches the
hot path.  Reference behavior: pdfminer's ``PDFStandardSecurityHandler``
(public API) — re-derived from ISO 32000-1 §7.6, not copied.
"""

from __future__ import annotations

import hashlib
import struct

from .pdfobj import Name, PdfError, Stream

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# -- AES (FIPS-197), decryption only ---------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL = [[0] * 256 for _ in range(16)]
for _c in (9, 11, 13, 14):
    for _a in range(256):
        v, a2, c2 = 0, _a, _c
        while c2:
            if c2 & 1:
                v ^= a2
            a2 = _xtime(a2)
            c2 >>= 1
        _MUL[_c][_a] = v


def _expand_key(key: bytes) -> list:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    rounds = []
    for r in range(nr + 1):
        rk = []
        for c in range(4):
            rk.extend(w[4 * r + c])
        rounds.append(rk)
    return rounds


def _aes_decrypt_block(rks: list, block: bytes) -> bytes:
    nr = len(rks) - 1
    s = [block[i] ^ rks[nr][i] for i in range(16)]
    inv = _INV_SBOX
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        s = [
            inv[s[0]], inv[s[13]], inv[s[10]], inv[s[7]],
            inv[s[4]], inv[s[1]], inv[s[14]], inv[s[11]],
            inv[s[8]], inv[s[5]], inv[s[2]], inv[s[15]],
            inv[s[12]], inv[s[9]], inv[s[6]], inv[s[3]],
        ]
        rk = rks[rnd]
        s = [s[i] ^ rk[i] for i in range(16)]
        # InvMixColumns
        t = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
            t[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
            t[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
            t[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s = t
    s = [
        inv[s[0]], inv[s[13]], inv[s[10]], inv[s[7]],
        inv[s[4]], inv[s[1]], inv[s[14]], inv[s[11]],
        inv[s[8]], inv[s[5]], inv[s[2]], inv[s[15]],
        inv[s[12]], inv[s[9]], inv[s[6]], inv[s[3]],
    ]
    rk = rks[0]
    return bytes(s[i] ^ rk[i] for i in range(16))


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AES layout: 16-byte IV prefix, CBC, PKCS#5 padding."""
    if len(data) < 32:
        return b""
    rks = _expand_key(key)
    iv = data[:16]
    body = data[16:16 + ((len(data) - 16) // 16) * 16]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        block = body[i:i + 16]
        plain = _aes_decrypt_block(rks, block)
        out += bytes(p ^ v for p, v in zip(plain, prev))
        prev = block
    pad = out[-1] if out else 0
    if 1 <= pad <= 16:
        out = out[:-pad]
    return bytes(out)


def _aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block AES ENCRYPTION (needed only by the R6 hardened hash)."""
    rks = _expand_key(key)
    nr = len(rks) - 1
    s = [block[i] ^ rks[0][i] for i in range(16)]
    sb = _SBOX
    for rnd in range(1, nr):
        s = [
            sb[s[0]], sb[s[5]], sb[s[10]], sb[s[15]],
            sb[s[4]], sb[s[9]], sb[s[14]], sb[s[3]],
            sb[s[8]], sb[s[13]], sb[s[2]], sb[s[7]],
            sb[s[12]], sb[s[1]], sb[s[6]], sb[s[11]],
        ]
        t = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = _xtime(a0) ^ (_xtime(a1) ^ a1) ^ a2 ^ a3
            t[c + 1] = a0 ^ _xtime(a1) ^ (_xtime(a2) ^ a2) ^ a3
            t[c + 2] = a0 ^ a1 ^ _xtime(a2) ^ (_xtime(a3) ^ a3)
            t[c + 3] = (_xtime(a0) ^ a0) ^ a1 ^ a2 ^ _xtime(a3)
        rk = rks[rnd]
        s = [t[i] ^ rk[i] for i in range(16)]
    s = [
        sb[s[0]], sb[s[5]], sb[s[10]], sb[s[15]],
        sb[s[4]], sb[s[9]], sb[s[14]], sb[s[3]],
        sb[s[8]], sb[s[13]], sb[s[2]], sb[s[7]],
        sb[s[12]], sb[s[1]], sb[s[6]], sb[s[11]],
    ]
    rk = rks[nr]
    return bytes(s[i] ^ rk[i] for i in range(16))


def _aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _aes_ecb_encrypt_block(key, block)
        out += prev
    return bytes(out)


def _hash_r6(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class SecurityHandler:
    """Standard security handler, empty user password."""

    def __init__(self, enc: dict, doc_id: bytes, resolve):
        filt = str(resolve(enc.get("Filter")) or "")
        if filt != "Standard":
            raise PdfError(f"unsupported security handler {filt!r}")
        self.v = int(resolve(enc.get("V")) or 0)
        self.r = int(resolve(enc.get("R")) or 2)
        self.length = int(resolve(enc.get("Length")) or 40)
        o = resolve(enc.get("O")) or b""
        u = resolve(enc.get("U")) or b""
        self.p = int(resolve(enc.get("P")) or -1)
        self.encrypt_metadata = resolve(enc.get("EncryptMetadata"))
        self.encrypt_metadata = (
            True if self.encrypt_metadata in (None,) else bool(self.encrypt_metadata)
        )
        self.cfm = "V2" if self.v < 4 else ""
        if self.v >= 4:
            cf = resolve(enc.get("CF")) or {}
            stmf = str(resolve(enc.get("StmF")) or "Identity")
            cfdict = resolve(cf.get(stmf)) if stmf != "Identity" else None
            if isinstance(cfdict, dict):
                self.cfm = str(resolve(cfdict.get("CFM")) or "V2")
                cflen = resolve(cfdict.get("Length"))
                if isinstance(cflen, (int, float)):
                    # /CF Length is in BYTES (16) while top-level is bits
                    self.length = int(cflen) * (8 if cflen <= 40 else 1)
            else:
                self.cfm = "Identity"
        if self.r >= 5:
            ue = resolve(enc.get("UE")) or b""
            self.key = self._auth_r6(bytes(o), bytes(u), bytes(ue))
            self.cfm = self.cfm or "AESV3"
        else:
            self.key = self._derive_key_legacy(bytes(o), bytes(doc_id or b""))

    def _derive_key_legacy(self, o: bytes, doc_id: bytes) -> bytes:
        """Algorithm 2 with the empty (padded) user password."""
        n = max(5, self.length // 8)
        h = hashlib.md5()
        h.update(_PAD)
        h.update((o + _PAD)[:32])
        h.update(struct.pack("<i", self.p))
        h.update(doc_id)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    def _auth_r6(self, o: bytes, u: bytes, ue: bytes) -> bytes:
        """Algorithm 2.A: empty user password against /U, unwrap /UE."""
        vsalt, ksalt = u[32:40], u[40:48]
        if _hash_r6(b"", vsalt, b"") == u[:32]:
            ik = _hash_r6(b"", ksalt, b"")
            out = bytearray()
            prev = bytes(16)
            rks = _expand_key(ik)
            for i in range(0, 32, 16):
                block = _aes_decrypt_block(rks, ue[i:i + 16])
                out += bytes(p ^ v for p, v in zip(block, prev))
                prev = ue[i:i + 16]
            return bytes(out)
        raise PdfError("empty user password rejected (R6)")

    def object_key(self, num: int, gen: int) -> bytes:
        if self.r >= 5:
            return self.key  # AES-256 uses the file key directly
        ext = self.key + struct.pack("<i", num)[:3] + struct.pack("<i", gen)[:2]
        if self.cfm == "AESV2":
            ext += b"sAlT"
        return hashlib.md5(ext).digest()[: min(len(self.key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if not data or self.cfm == "Identity":
            return data
        key = self.object_key(num, gen)
        if self.cfm in ("AESV2", "AESV3"):
            return aes_cbc_decrypt(key, data)
        return rc4(key, data)


def decrypt_object(obj, handler: SecurityHandler, num: int, gen: int):
    """Recursively decrypt every byte-string (and stream body) in one
    indirect object.  Names/numbers stay as-is per spec."""
    if isinstance(obj, (bytes, bytearray)) and not isinstance(obj, Name):
        return handler.decrypt(bytes(obj), num, gen)
    if isinstance(obj, list):
        return [decrypt_object(v, handler, num, gen) for v in obj]
    if isinstance(obj, Stream):
        d = {k: decrypt_object(v, handler, num, gen) for k, v in obj.dict.items()}
        stype = str(d.get("Type") or "")
        if stype == "XRef":
            return obj  # xref streams are never encrypted
        raw = handler.decrypt(obj.raw, num, gen)
        return Stream(d, raw)
    if isinstance(obj, dict):
        return {k: decrypt_object(v, handler, num, gen) for k, v in obj.items()}
    return obj
