"""Stream filters (reference: /root/reference/src/filtering.rs).

Only ``FlateDecode`` (zlib inflate) is supported; the nine other spec
filters are recognized-but-rejected (filtering.rs:49-53), and any other
name is an error too (filtering.rs:54).  Filter chains apply in order
(filtering.rs:80-91).
"""

from __future__ import annotations

import zlib

from .errors import CutError, ParseError

SUPPORTED = frozenset({b"FlateDecode"})

# Explicitly unsupported filters fail hard (filtering.rs:50-53).
UNSUPPORTED = frozenset({
    b"ASCII85Decode", b"ASCIIHexDecode", b"LZWDecode", b"RunLengthDecode",
    b"CCITTFaxDecode", b"JBIG2Decode", b"DCTDecode", b"JPXDecode", b"Crypt",
})


def check_filter_name(name: bytes) -> bytes:
    if name in SUPPORTED:
        return name
    if name in UNSUPPORTED:
        raise CutError("UnsupportedFilter", None, name.decode("latin-1"))
    raise ParseError("UnknownFilter", None, name.decode("latin-1"))


def decode_chain(filters: list[bytes], content: bytes) -> bytes:
    """Apply each decoder in order (filtering.rs:80-91)."""
    out = content
    for name in filters:
        if name == b"FlateDecode":
            try:
                out = zlib.decompress(out)
            except zlib.error as exc:
                raise ParseError("FlateDecodeError", None, str(exc)) from exc
        else:
            check_filter_name(name)  # raises
    return out
