"""Opt-in inline-image stripping (BI/ID/EI) - extension beyond the
reference.

Inline images embed raw binary between the ``ID`` and ``EI`` operators of
a content stream.  The reference's operand/operator tokenizer (and ours,
byte-identically) fails on the binary payload, containing the page as an
error with partial text - the single most common cause of text loss on
image-heavy crawl pages.  ``extract_text(..., strip_inline=True)``
removes ``BI .. ID .. EI`` spans BEFORE tokenization; the default stays
reference-byte-identical (no parity test runs with the flag).

Tolerant by design: the scan accepts the first ``EI`` token that is
delimited by PDF whitespace on both sides (the spec's recommended
heuristic; a binary payload containing a delimited ``EI`` would
false-positive in ANY reader using it), and an unterminated image
consumes the rest of the stream.
"""

from __future__ import annotations

import re

_WS = rb"\x00\t\n\x0c\r "
_BI_RE = re.compile(rb"(?:^|(?<=[" + _WS + rb"]))BI(?=[" + _WS + rb"])")
_ID_RE = re.compile(rb"(?:^|(?<=[" + _WS + rb"]))ID[" + _WS + rb"]")
_EI_RE = re.compile(rb"[" + _WS + rb"]EI(?=[" + _WS + rb"]|$)")


def strip_inline_images(content: bytes) -> bytes:
    """Remove every ``BI .. ID <binary> .. EI`` span, replacing it with a
    single space so surrounding tokens stay delimited."""
    out = bytearray()
    pos = 0
    while True:
        m = _BI_RE.search(content, pos)
        if m is None:
            out += content[pos:]
            return bytes(out)
        out += content[pos : m.start()]
        out += b" "
        mid = _ID_RE.search(content, m.end())
        if mid is None:  # BI without ID: drop through end (tolerant)
            return bytes(out)
        mei = _EI_RE.search(content, mid.end())
        if mei is None:  # unterminated image: rest of stream is payload
            return bytes(out)
        pos = mei.end()
