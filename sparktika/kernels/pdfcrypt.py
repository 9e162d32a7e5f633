"""PDF standard security handler (PDF 32000-1 §7.6) — from scratch.

Covers the encryption modes a wild-corpus crawl actually hits (Tika 1.20
parity: PDFBox transparently decrypts any standard-handler PDF whose USER
password is empty — the overwhelmingly common owner-password-only case,
e.g. print-to-PDF tools; ref dispatch main/TikaForkMain.java:299-332):

- R2 (V1, RC4-40) and R3/R4 (V2/V4, RC4 up to 128-bit): Algorithm 2 key
  derivation (MD5 chain), per-object keys (Algorithm 1), Algorithms 4/5
  user-password validation.
- V4 crypt filters (/CF /StdCF): /V2 (RC4) and /AESV2 (AES-128-CBC,
  16-byte IV prefix, per-object key salted with b"sAlT").
- V5/R5+R6 (/AESV3, AES-256): Algorithm 2.B hardened hash (SHA-256/384/
  512 + AES-CBC rounds), Algorithm 11 validation, file key unwrapped from
  /UE with AES-256-CBC (zero IV, no padding).

A non-empty (real) user password, a non-Standard security handler, or an
unknown /CFM raise EncryptedError — the dispatcher maps that to an honest
`unsupported` status row, never garbage text.

AES is implemented from first principles so no lookup table is written
from memory: the S-box is DERIVED at import (GF(2^8) multiplicative
inverse mod 0x11B + the affine transform with constant 0x63, FIPS-197
§5.1.1) and pinned against the FIPS-197 / SP 800-38A public known-answer
vectors in tests/test_pdf_crypt.py. RC4 is the standard KSA/PRGA.
"""

from __future__ import annotations

import hashlib
import struct

from .errors import EncryptedError, KernelError

__all__ = ["EncryptedError", "StdCrypt", "PAD", "rc4", "aes_cbc_encrypt",
           "aes_cbc_decrypt", "derive_key_classic", "compute_O",
           "compute_U", "hash_r6"]


# §7.6.3.3 Algorithm 2 padding string (public constant from the spec).
PAD = bytes((
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
))


# --------------------------------------------------------------------------
# RC4 (KSA + PRGA)
# --------------------------------------------------------------------------

def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------------
# AES (FIPS-197), S-box derived — not transcribed
# --------------------------------------------------------------------------

def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_sbox() -> tuple[bytes, bytes]:
    inv = [0] * 256
    for x in range(1, 256):
        if inv[x]:
            continue
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x], inv[y] = y, x
                break
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        s = 0
        for i in range(8):
            bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                   ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))
                   ^ (0x63 >> i)) & 1
            s |= bit << i
        sbox[x] = s
    invbox = bytearray(256)
    for x in range(256):
        invbox[sbox[x]] = x
    return bytes(sbox), bytes(invbox)


_SBOX, _INV_SBOX = _build_sbox()
# gmul tables for MixColumns / InvMixColumns coefficients
_M2 = bytes(_gf_mul(x, 2) for x in range(256))
_M3 = bytes(_gf_mul(x, 3) for x in range(256))
_M9 = bytes(_gf_mul(x, 9) for x in range(256))
_M11 = bytes(_gf_mul(x, 11) for x in range(256))
_M13 = bytes(_gf_mul(x, 13) for x in range(256))
_M14 = bytes(_gf_mul(x, 14) for x in range(256))

# T-tables (SubBytes + ShiftRows + MixColumns fused per input byte),
# DERIVED from the derived S-box — the fast path the R6 hardened hash
# needs (it CBC-encrypts ~12k blocks per password check). Column word
# layout: (row0<<24 | row1<<16 | row2<<8 | row3).
_T0 = [(_M2[s] << 24) | (s << 16) | (s << 8) | _M3[s]
       for s in (_SBOX[x] for x in range(256))]
_T1 = [(_M3[s] << 24) | (_M2[s] << 16) | (s << 8) | s
       for s in (_SBOX[x] for x in range(256))]
_T2 = [(s << 24) | (_M3[s] << 16) | (_M2[s] << 8) | s
       for s in (_SBOX[x] for x in range(256))]
_T3 = [(s << 24) | (s << 16) | (_M3[s] << 8) | _M2[s]
       for s in (_SBOX[x] for x in range(256))]
_IT0 = [(_M14[u] << 24) | (_M9[u] << 16) | (_M13[u] << 8) | _M11[u]
        for u in (_INV_SBOX[x] for x in range(256))]
_IT1 = [(_M11[u] << 24) | (_M14[u] << 16) | (_M9[u] << 8) | _M13[u]
        for u in (_INV_SBOX[x] for x in range(256))]
_IT2 = [(_M13[u] << 24) | (_M11[u] << 16) | (_M14[u] << 8) | _M9[u]
        for u in (_INV_SBOX[x] for x in range(256))]
_IT3 = [(_M9[u] << 24) | (_M13[u] << 16) | (_M11[u] << 8) | _M14[u]
        for u in (_INV_SBOX[x] for x in range(256))]


def _imc_word(w: int) -> int:
    a0, a1, a2, a3 = (w >> 24) & 255, (w >> 16) & 255, (w >> 8) & 255, w & 255
    return ((_M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]) << 24
            | (_M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]) << 16
            | (_M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]) << 8
            | (_M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]))


class _AesKey:
    """Expanded key schedule: enc round words + (lazily) the equivalent-
    inverse-cipher dec round words (InvMixColumns folded into the keys)."""

    __slots__ = ("enc", "_dec")

    def __init__(self, key: bytes):
        nk = len(key) // 4
        nr = nk + 6
        words = [int.from_bytes(key[4 * i: 4 * i + 4], "big")
                 for i in range(nk)]
        rcon = 1
        for i in range(nk, 4 * (nr + 1)):
            t = words[i - 1]
            if i % nk == 0:
                t = ((_SBOX[(t >> 16) & 255] ^ rcon) << 24
                     | _SBOX[(t >> 8) & 255] << 16
                     | _SBOX[t & 255] << 8 | _SBOX[(t >> 24) & 255])
                rcon = _gf_mul(rcon, 2)
            elif nk > 6 and i % nk == 4:
                t = (_SBOX[(t >> 24) & 255] << 24 | _SBOX[(t >> 16) & 255] << 16
                     | _SBOX[(t >> 8) & 255] << 8 | _SBOX[t & 255])
            words.append(words[i - nk] ^ t)
        self.enc = [words[4 * r: 4 * r + 4] for r in range(nr + 1)]
        self._dec = None

    @property
    def dec(self) -> list[list[int]]:
        if self._dec is None:
            nr = len(self.enc) - 1
            d = [self.enc[nr]]
            for r in range(1, nr):
                d.append([_imc_word(w) for w in self.enc[nr - r]])
            d.append(self.enc[0])
            self._dec = d
        return self._dec


_KEY_CACHE: dict[bytes, _AesKey] = {}


def _expand_key(key: bytes) -> _AesKey:
    k = _KEY_CACHE.get(key)
    if k is None:
        if len(_KEY_CACHE) > 64:
            _KEY_CACHE.clear()
        k = _KEY_CACHE[key] = _AesKey(key)
    return k


def _encrypt_block(k: _AesKey, block: bytes) -> bytes:
    ew = k.enc
    nr = len(ew) - 1
    rk = ew[0]
    w0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    w1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    w2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    w3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    for r in range(1, nr):
        rk = ew[r]
        t0 = (_T0[(w0 >> 24) & 255] ^ _T1[(w1 >> 16) & 255]
              ^ _T2[(w2 >> 8) & 255] ^ _T3[w3 & 255] ^ rk[0])
        t1 = (_T0[(w1 >> 24) & 255] ^ _T1[(w2 >> 16) & 255]
              ^ _T2[(w3 >> 8) & 255] ^ _T3[w0 & 255] ^ rk[1])
        t2 = (_T0[(w2 >> 24) & 255] ^ _T1[(w3 >> 16) & 255]
              ^ _T2[(w0 >> 8) & 255] ^ _T3[w1 & 255] ^ rk[2])
        t3 = (_T0[(w3 >> 24) & 255] ^ _T1[(w0 >> 16) & 255]
              ^ _T2[(w1 >> 8) & 255] ^ _T3[w2 & 255] ^ rk[3])
        w0, w1, w2, w3 = t0, t1, t2, t3
    rk = ew[nr]
    S = _SBOX
    o0 = (S[(w0 >> 24) & 255] << 24 | S[(w1 >> 16) & 255] << 16
          | S[(w2 >> 8) & 255] << 8 | S[w3 & 255]) ^ rk[0]
    o1 = (S[(w1 >> 24) & 255] << 24 | S[(w2 >> 16) & 255] << 16
          | S[(w3 >> 8) & 255] << 8 | S[w0 & 255]) ^ rk[1]
    o2 = (S[(w2 >> 24) & 255] << 24 | S[(w3 >> 16) & 255] << 16
          | S[(w0 >> 8) & 255] << 8 | S[w1 & 255]) ^ rk[2]
    o3 = (S[(w3 >> 24) & 255] << 24 | S[(w0 >> 16) & 255] << 16
          | S[(w1 >> 8) & 255] << 8 | S[w2 & 255]) ^ rk[3]
    return (o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
            + o2.to_bytes(4, "big") + o3.to_bytes(4, "big"))


def _decrypt_block(k: _AesKey, block: bytes) -> bytes:
    dw = k.dec
    nr = len(dw) - 1
    rk = dw[0]
    w0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    w1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    w2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    w3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    for r in range(1, nr):
        rk = dw[r]
        t0 = (_IT0[(w0 >> 24) & 255] ^ _IT1[(w3 >> 16) & 255]
              ^ _IT2[(w2 >> 8) & 255] ^ _IT3[w1 & 255] ^ rk[0])
        t1 = (_IT0[(w1 >> 24) & 255] ^ _IT1[(w0 >> 16) & 255]
              ^ _IT2[(w3 >> 8) & 255] ^ _IT3[w2 & 255] ^ rk[1])
        t2 = (_IT0[(w2 >> 24) & 255] ^ _IT1[(w1 >> 16) & 255]
              ^ _IT2[(w0 >> 8) & 255] ^ _IT3[w3 & 255] ^ rk[2])
        t3 = (_IT0[(w3 >> 24) & 255] ^ _IT1[(w2 >> 16) & 255]
              ^ _IT2[(w1 >> 8) & 255] ^ _IT3[w0 & 255] ^ rk[3])
        w0, w1, w2, w3 = t0, t1, t2, t3
    rk = dw[nr]
    S = _INV_SBOX
    o0 = (S[(w0 >> 24) & 255] << 24 | S[(w3 >> 16) & 255] << 16
          | S[(w2 >> 8) & 255] << 8 | S[w1 & 255]) ^ rk[0]
    o1 = (S[(w1 >> 24) & 255] << 24 | S[(w0 >> 16) & 255] << 16
          | S[(w3 >> 8) & 255] << 8 | S[w2 & 255]) ^ rk[1]
    o2 = (S[(w2 >> 24) & 255] << 24 | S[(w1 >> 16) & 255] << 16
          | S[(w0 >> 8) & 255] << 8 | S[w3 & 255]) ^ rk[2]
    o3 = (S[(w3 >> 24) & 255] << 24 | S[(w2 >> 16) & 255] << 16
          | S[(w1 >> 8) & 255] << 8 | S[w0 & 255]) ^ rk[3]
    return (o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
            + o2.to_bytes(4, "big") + o3.to_bytes(4, "big"))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt, NO padding (caller pads). Used by Algorithm 2.B and
    by the synth encrypted-corpus builder."""
    if len(data) % 16:
        raise KernelError("aes_cbc_encrypt: data not block-aligned")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i: i + 16], prev))
        prev = _encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt, NO padding strip (caller strips)."""
    if len(data) % 16 or not data:
        raise KernelError("AES data not block-aligned")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i: i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, blk), prev))
        prev = blk
    return bytes(out)


def _strip_pkcs5(data: bytes) -> bytes:
    if not data:
        return data
    n = data[-1]
    if 1 <= n <= 16 and n <= len(data) and data[-n:] == bytes([n]) * n:
        return data[:-n]
    raise KernelError("bad AES padding (wrong key or corrupt stream)")


def _pad_pkcs5(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


# --------------------------------------------------------------------------
# Key derivation — classic (R2-R4)
# --------------------------------------------------------------------------

def derive_key_classic(password: bytes, O: bytes, P: int, id0: bytes,
                       R: int, nbytes: int,
                       encrypt_metadata: bool = True) -> bytes:
    """§7.6.3.3 Algorithm 2."""
    h = hashlib.md5()
    h.update((password + PAD)[:32])
    h.update(O[:32])
    h.update(struct.pack("<I", P & 0xFFFFFFFF))
    h.update(id0)
    if R >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if R >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    return key[:nbytes]


def compute_O(owner_pw: bytes, user_pw: bytes, R: int, nbytes: int) -> bytes:
    """§7.6.3.4 Algorithm 3 (builder side)."""
    pw = owner_pw or user_pw  # empty owner pw falls back to user pw (spec)
    key = hashlib.md5((pw + PAD)[:32]).digest()
    if R >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:nbytes]
    O = rc4(key, (user_pw + PAD)[:32])
    if R >= 3:
        for i in range(1, 20):
            O = rc4(bytes(b ^ i for b in key), O)
    return O


def compute_U(key: bytes, R: int, id0: bytes) -> bytes:
    """§7.6.3.4 Algorithms 4 (R2) / 5 (R>=3)."""
    if R == 2:
        return rc4(key, PAD)
    u = hashlib.md5(PAD + id0).digest()
    u = rc4(key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


# --------------------------------------------------------------------------
# Key derivation — AES-256 (R5 / R6)
# --------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=256)
def hash_r6(password: bytes, salt: bytes, udata: bytes, R: int) -> bytes:
    """§7.6.4.3.4 Algorithm 2.B (R6); R5 is the single-SHA-256 legacy.

    Memoized: the hardened loop CBC-encrypts ~9k AES blocks (~250 ms in
    pure Python), and within one corpus/worker the (password, salt)
    pairs repeat — a wild corpus hits the same doc twice rarely, but the
    cache is also what makes the R6 synth corpus affordable."""
    K = hashlib.sha256(password + salt + udata).digest()
    if R == 5:
        return K
    i = 0
    while True:
        K1 = (password + K + udata) * 64
        E = aes_cbc_encrypt(K[:16], K[16:32], K1)
        mod = sum(E[:16]) % 3
        K = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](E).digest()
        i += 1
        if i >= 64 and E[-1] <= i - 32:
            return K[:32]


# --------------------------------------------------------------------------
# The handler
# --------------------------------------------------------------------------

def _as_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1", "replace")
    return b""


class StdCrypt:
    """Authenticated standard-security-handler state for one document.

    Raises EncryptedError when the document needs a real user password or
    uses an unsupported handler/CFM; otherwise exposes decrypt() for
    strings and streams.
    """

    def __init__(self, enc: dict, id0: bytes, password: bytes = b""):
        filt = enc.get("Filter")
        if filt not in ("Standard", None):
            raise EncryptedError(
                "unsupported-security-handler",
                f"security handler /{filt} is not the standard handler")
        self.V = int(enc.get("V") or 0)
        self.R = int(enc.get("R") or (2 if self.V == 1 else 3))
        self.O = _as_bytes(enc.get("O"))
        self.U = _as_bytes(enc.get("U"))
        P = enc.get("P")
        self.P = int(P) if isinstance(P, (int, float)) else 0
        self.encrypt_metadata = enc.get("EncryptMetadata", True) is not False
        length_bits = int(enc.get("Length") or 40)
        self.stm_cfm = self.str_cfm = "V2"  # pre-V4 default: RC4
        if self.V in (4, 5):
            cf = enc.get("CF") or {}
            stdcf = cf.get("StdCF") if isinstance(cf, dict) else None
            cfm = (stdcf or {}).get("CFM") if isinstance(stdcf, dict) else None
            cfm = cfm or "Identity"
            if isinstance(stdcf, dict) and stdcf.get("Length"):
                # CF /Length is in BYTES (spec ambiguity: accept bits too)
                cl = int(stdcf["Length"])
                length_bits = cl * 8 if cl <= 40 else cl
            stmf = enc.get("StmF") or "Identity"
            strf = enc.get("StrF") or "Identity"
            for f in (stmf, strf):
                # only the two spec-named selectors are implemented; a
                # custom named crypt filter must REFUSE — mapping it to
                # Identity would emit raw ciphertext as text (§7.6.5)
                if f not in ("StdCF", "Identity"):
                    raise EncryptedError("unsupported-cfm",
                                         f"unsupported crypt filter ref /{f}")
            self.stm_cfm = cfm if stmf == "StdCF" else "Identity"
            self.str_cfm = cfm if strf == "StdCF" else "Identity"
            for m in (self.stm_cfm, self.str_cfm):
                if m not in ("V2", "AESV2", "AESV3", "Identity"):
                    raise EncryptedError("unsupported-cfm",
                                         f"unsupported crypt filter /{m}")
        if self.V == 5 or self.R >= 5:
            self._auth_v5(enc, password)
        elif self.V in (1, 2, 4):
            n = 5 if self.V == 1 else max(5, min(16, length_bits // 8))
            self.key = derive_key_classic(password, self.O, self.P, id0,
                                          self.R, n, self.encrypt_metadata)
            u_check = compute_U(self.key, self.R, id0)
            ok = (u_check[:32] == self.U[:32] if self.R == 2
                  else u_check[:16] == self.U[:16])
            if not ok:
                raise EncryptedError(
                    "password-required",
                    "standard security handler: user password required")
        else:
            raise EncryptedError("unsupported-version",
                                 f"encryption /V {self.V} unsupported")

    def _auth_v5(self, enc: dict, password: bytes) -> None:
        U, R = self.U, self.R
        if len(U) < 48:
            raise EncryptedError("password-required", "malformed /U entry")
        pw = password[:127]
        vsalt, ksalt = U[32:40], U[40:48]
        if hash_r6(pw, vsalt, b"", R) != U[:32]:
            raise EncryptedError(
                "password-required",
                "standard security handler: user password required")
        ik = hash_r6(pw, ksalt, b"", R)
        UE = _as_bytes(enc.get("UE"))
        if len(UE) != 32:
            raise EncryptedError("password-required", "malformed /UE entry")
        self.key = aes_cbc_decrypt(ik, b"\x00" * 16, UE)

    # -- per-object ---------------------------------------------------------

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.V == 5 or self.R >= 5:
            return self.key
        ext = struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
        h = hashlib.md5(self.key + ext + (b"sAlT" if aes else b"")).digest()
        return h[: min(len(self.key) + 5, 16)]

    def _apply(self, cfm: str, data: bytes, num: int, gen: int) -> bytes:
        if cfm == "Identity" or not data:
            return data
        if cfm == "V2":
            return rc4(self._object_key(num, gen, aes=False), data)
        # AESV2 / AESV3: 16-byte IV prefix + CBC + PKCS#5
        key = self._object_key(num, gen, aes=True)
        if len(data) < 32 or len(data) % 16:
            raise KernelError("AES payload not block-aligned")
        return _strip_pkcs5(aes_cbc_decrypt(key, data[:16], data[16:]))

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_cfm, data, num, gen)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.str_cfm, data, num, gen)

    def decrypt_value(self, v, num: int, gen: int):
        """Recursively decrypt every string leaf of a parsed object value
        (strings outside streams are individually encrypted, §7.6.2)."""
        if isinstance(v, bytes):
            try:
                return self.decrypt_string(v, num, gen)
            except KernelError:
                return v  # malformed string: keep raw rather than fail doc
        if isinstance(v, list):
            return [self.decrypt_value(x, num, gen) for x in v]
        if isinstance(v, dict):
            return {k: self.decrypt_value(x, num, gen) for k, x in v.items()}
        return v
