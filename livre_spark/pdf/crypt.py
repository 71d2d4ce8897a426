"""Standard security handler decryption (beyond-reference extension).

The reference rejects encrypted documents outright (no ``/Encrypt``
handling anywhere; the ``Crypt`` stream filter is in its rejection list,
filtering.rs:50-53).  A meaningful fraction of crawl PDFs is encrypted
with an EMPTY user password - readable by any viewer - so this module
implements the RC4 standard security handler (PDF 32000-1 7.6.3,
algorithms 2/4/5/7): /V 1-2, /R 2-3, 40-128-bit keys.  AES (/V 4-5) and
non-empty passwords raise a contained ``CutError`` and the document
lands in the error column, exactly like the reference's rejection.

Scope: stream payloads are decrypted (that is the text-extraction path);
strings inside document dictionaries are left as stored - no extraction
surface reads them.  XRef streams and the /Encrypt dictionary itself are
never encrypted per spec and are parsed before the handler exists.
"""

from __future__ import annotations

import hashlib
import struct

from . import objects as ob
from .errors import CutError, ParseError

# Algorithm 2 padding string (PDF 32000-1 Table 7.6.3.3)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (symmetric - also used by the genpdf fixture writer)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def compute_file_key(o: bytes, p: int, id0: bytes, r: int,
                     length_bits: int = 40,
                     password: bytes = b"",
                     encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: password -> file encryption key."""
    n = 5 if r == 2 else max(5, min(16, length_bits // 8))
    padded = (password + PAD)[:32]
    h = hashlib.md5()
    h.update(padded)
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U verification string."""
    if r == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    enc = rc4(key, digest)
    for i in range(1, 20):
        step_key = bytes(b ^ i for b in key)
        enc = rc4(step_key, enc)
    return enc + b"\x00" * 16  # arbitrary 16-byte pad per spec


def object_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: per-object RC4 key."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    return h.digest()[: min(len(file_key) + 5, 16)]


# --- pure-Python AES-128 (FIPS-197) for /V 4 /AESV2 --------------------------
#
# The S-box is generated, not transcribed (typo-proof); the whole cipher
# is pinned by the FIPS-197 Appendix B vector in tests/test_filters.py.


def _gen_sbox() -> tuple[list[int], list[int]]:
    sbox = [0] * 256
    p = q = 1
    while True:
        # p := p * 3 in GF(2^8)
        p = (p ^ (p << 1) ^ (0x1B if p & 0x80 else 0)) & 0xFF
        # q := q / 3 (multiply by inverse of 3)
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        q &= 0xFF
        if q & 0x80:
            q ^= 0x09
        rot = lambda x, n: ((x << n) | (x >> (8 - n))) & 0xFF
        sbox[p] = (q ^ rot(q, 1) ^ rot(q, 2) ^ rot(q, 3) ^ rot(q, 4)
                   ^ 0x63)
        if p == 1:
            break
    sbox[0] = 0x63
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    return sbox, inv


_SBOX, _INV_SBOX = _gen_sbox()


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key_128(key: bytes) -> list[list[int]]:
    """11 round keys of 16 bytes each."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    rcon = 1
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _xtime(rcon)
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[r * 4 : r * 4 + 4], []) for r in range(11)]


def _aes_encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    # the 16-byte block IS the column-major state: byte i = (row i%4, col i//4)
    s = [b ^ k for b, k in zip(block, rk[0])]
    for rnd in range(1, 11):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major byte order: byte i sits at
        # (row, col) = (i % 4, i // 4); row r rotates left by r
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd < 10:
            t = []
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                t += [
                    _xtime(col[0]) ^ _xtime(col[1]) ^ col[1] ^ col[2] ^ col[3],
                    col[0] ^ _xtime(col[1]) ^ _xtime(col[2]) ^ col[2] ^ col[3],
                    col[0] ^ col[1] ^ _xtime(col[2]) ^ _xtime(col[3]) ^ col[3],
                    _xtime(col[0]) ^ col[0] ^ col[1] ^ col[2] ^ _xtime(col[3]),
                ]
            s = t
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    return bytes(s)


def _aes_decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[10])]
    for rnd in range(9, -1, -1):
        # InvShiftRows: row r rotates right by r
        s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        if rnd > 0:
            t = []
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                t += [
                    _gmul(col[0], 14) ^ _gmul(col[1], 11)
                    ^ _gmul(col[2], 13) ^ _gmul(col[3], 9),
                    _gmul(col[0], 9) ^ _gmul(col[1], 14)
                    ^ _gmul(col[2], 11) ^ _gmul(col[3], 13),
                    _gmul(col[0], 13) ^ _gmul(col[1], 9)
                    ^ _gmul(col[2], 14) ^ _gmul(col[3], 11),
                    _gmul(col[0], 11) ^ _gmul(col[1], 13)
                    ^ _gmul(col[2], 9) ^ _gmul(col[3], 14),
                ]
            s = t
    return bytes(s)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 stream layout: 16-byte IV prefix + CBC ciphertext with
    PKCS#5 padding (PDF 32000-1 7.6.2)."""
    if len(data) < 32 or len(data) % 16 != 0:
        raise CutError("EncryptedDocument", None, "bad AES payload length")
    rk = _expand_key_128(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        block = data[i : i + 16]
        plain = _aes_decrypt_block(rk, block)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = block
    pad = out[-1]
    if not (1 <= pad <= 16) or out[-pad:] != bytes([pad]) * pad:
        raise CutError("EncryptedDocument", None, "bad AES padding")
    return bytes(out[:-pad])


def aes128_cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Fixture-writer counterpart (deterministic IV supplied by caller)."""
    pad = 16 - (len(plain) % 16)
    plain = plain + bytes([pad]) * pad
    rk = _expand_key_128(key)
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(plain), 16):
        block = bytes(a ^ b for a, b in zip(plain[i : i + 16], prev))
        prev = _aes_encrypt_block(rk, block)
        out += prev
    return bytes(out)


def object_key_aes(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1 AES variant: the extra 'sAlT' word."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


class StandardDecryptor:
    """Empty-user-password decryptor for one document (RC4 or AESV2)."""

    def __init__(self, file_key: bytes, aes: bool = False):
        self.file_key = file_key
        self.aes = aes

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        if self.aes:
            return aes128_cbc_decrypt(
                object_key_aes(self.file_key, num, gen), data)
        return rc4(object_key(self.file_key, num, gen), data)


def _parse_encrypt_dict(buf: bytes, pos: int, xrefs: dict) -> ob.RawDict:
    """The trailer's /Encrypt value: usually an indirect ref, occasionally
    inline.  Parsed WITHOUT the decrypt hooks (never encrypted per spec)."""
    try:
        ref, _ = ob.parse_reference(buf, pos)
    except ParseError:
        raw, _ = ob.parse_raw_dict(buf, pos)
        return raw
    loc = xrefs.get(ref.id)
    if loc is None or loc[0] != "plain":
        raise CutError("EncryptedDocument", None, "encrypt dict unresolvable")
    _, raw, _ = ob.parse_indirect(
        buf, loc[1], lambda b, p: ob.parse_raw_dict(b, p))
    return raw


def build_decryptor(buf: bytes, encrypt_pos: int, xrefs: dict,
                    file_id) -> StandardDecryptor:
    """Construct the decryptor for an /Encrypt-bearing trailer, verifying
    the EMPTY user password; anything unsupported is a contained cut."""
    raw = _parse_encrypt_dict(buf, encrypt_pos, xrefs)
    filt = raw.pop_and_parse(b"Filter", ob.parse_name)
    if filt is None or bytes(filt) != b"Standard":
        raise CutError("EncryptedDocument", None,
                       f"security handler {bytes(filt or b'?')!r}")
    v = raw.pop_and_parse(b"V", ob.parse_unsigned) or 0
    r = raw.pop_and_parse(b"R", ob.parse_unsigned) or 0
    aes = False
    if v == 4 and r == 4:
        # crypt-filter container: /CF <</StdCF <</CFM /AESV2|/V2 ...>>>>
        # with /StmF /StdCF.  AES-256 (/V 5 /R 6) stays unsupported.
        cf = raw.pop_and_parse(b"CF", ob.parse_dict_object) or {}
        stmf = raw.pop_and_parse(b"StmF", ob.parse_name)
        if stmf is not None and bytes(stmf) != b"StdCF":
            raise CutError("EncryptedDocument", None,
                           f"StmF {bytes(stmf)!r}")
        stdcf = cf.get(b"StdCF") if isinstance(cf, dict) else None
        cfm = stdcf.get(b"CFM") if isinstance(stdcf, dict) else None
        cfm = bytes(cfm) if cfm is not None else b"?"
        if cfm == b"AESV2":
            aes = True
        elif cfm != b"V2":  # V2 = RC4 inside the V4 container
            raise CutError("EncryptedDocument", None, f"CFM {cfm!r}")
    elif v not in (1, 2) or r not in (2, 3):
        raise CutError("EncryptedDocument", None, f"V={v} R={r}")
    length = raw.pop_and_parse(b"Length", ob.parse_unsigned) or 40
    o = raw.pop_and_parse(b"O", ob.parse_string)
    u = raw.pop_and_parse(b"U", ob.parse_string)
    p = raw.pop_and_parse(b"P", ob.parse_signed)
    if o is None or u is None or p is None:
        raise CutError("EncryptedDocument", None, "missing O/U/P")
    enc_meta = raw.pop_and_parse(b"EncryptMetadata", ob.parse_bool)
    id0 = file_id[0] if file_id else b""
    key = compute_file_key(bytes(o), p, id0, r, length,
                           encrypt_metadata=enc_meta is not False)
    expected_u = compute_u(key, id0, r)
    got_u = bytes(u)
    match = (got_u[:16] == expected_u[:16] if r >= 3
             else got_u[:32] == expected_u[:32])
    if not match:
        raise CutError("EncryptedDocument", None,
                       "non-empty user password")
    return StandardDecryptor(key, aes=aes)
