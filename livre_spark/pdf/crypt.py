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
                     password: bytes = b"") -> bytes:
    """Algorithm 2: password -> file encryption key."""
    n = 5 if r == 2 else max(5, min(16, length_bits // 8))
    padded = (password + PAD)[:32]
    h = hashlib.md5()
    h.update(padded)
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
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


class StandardDecryptor:
    """Empty-user-password RC4 decryptor for one document."""

    def __init__(self, file_key: bytes):
        self.file_key = file_key

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
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
    if v not in (1, 2) or r not in (2, 3):
        raise CutError("EncryptedDocument", None, f"V={v} R={r} (AES?)")
    length = raw.pop_and_parse(b"Length", ob.parse_unsigned) or 40
    o = raw.pop_and_parse(b"O", ob.parse_string)
    u = raw.pop_and_parse(b"U", ob.parse_string)
    p = raw.pop_and_parse(b"P", ob.parse_signed)
    if o is None or u is None or p is None:
        raise CutError("EncryptedDocument", None, "missing O/U/P")
    id0 = file_id[0] if file_id else b""
    key = compute_file_key(bytes(o), p, id0, r, length)
    expected_u = compute_u(key, id0, r)
    got_u = bytes(u)
    match = (got_u[:16] == expected_u[:16] if r >= 3
             else got_u[:32] == expected_u[:32])
    if not match:
        raise CutError("EncryptedDocument", None,
                       "non-empty user password")
    return StandardDecryptor(key)
