"""Cross-reference table / trailer parsing.

Reference semantics (all file:line into /root/reference):

- ``startxref`` discovery: scan the *last 1024 bytes* backwards for the
  final ``startxref`` (structure/trailer_block/startxref.rs:22-41).
- plain xref tables: fixed-width ``nnnnnnnnnn ggggg n/f`` entries,
  free entries dropped (trailer_block/plain.rs:19-102).
- xref *streams*: ``/W [f1 f2 f3]`` base-256 binary entries, types
  0 (free) / 1 (plain) / 2 (compressed) / other ignored, ``/Index``
  defaulting to ``[0 Size]`` (trailer_block/stream.rs:40-214).
  Quirk preserved: when ``W[0] == 0`` the entry type defaults to type 0,
  i.e. *every* entry in that stream is skipped (stream.rs:141-143).
- trailer dict: Size (required), Prev (optional), Root (required),
  ID (optional) (trailer_block/trailer.rs:12-46).

Locations are ``("plain", byte_offset)`` or ``("compressed", stream_id,
index)`` mirroring RefLocation (trailer_block/ref_location.rs:14-18).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from . import lex, objects as ob
from .errors import ParseError

SEARCH_WINDOW = 1024


def find_startxref(buf: bytes) -> int:
    """Last ``startxref`` offset within the final 1KiB (startxref.rs:22-41)."""
    window_start = max(0, len(buf) - SEARCH_WINDOW)
    idx = buf.rfind(b"startxref", window_start)
    if idx < 0:
        raise ParseError("NoStartXref")
    pos = idx + len(b"startxref")
    pos = lex.skip_ws1(buf, pos)
    value, _ = ob.parse_unsigned(buf, pos)
    return value


@dataclass
class Trailer:
    size: int
    prev: int | None
    root: ob.Ref
    file_id: tuple[bytes, bytes] | None
    # byte offset of the /Encrypt value span (beyond-reference extension:
    # the reference never reads /Encrypt; pdf/crypt.py resolves it)
    encrypt_pos: int | None = None
    # byte offset of the /Info value span (beyond-reference extension:
    # Document.info() resolves it, decrypting strings when encrypted)
    info_pos: int | None = None


def trailer_from_raw_dict(raw: ob.RawDict) -> Trailer:
    """FromRawDict for Trailer (trailer.rs:12-46); pops its keys."""
    size = raw.require(b"Size", ob.parse_unsigned)
    prev = raw.pop_and_parse(b"Prev", ob.parse_unsigned)
    root = raw.require(b"Root", ob.parse_reference)
    file_id = raw.pop_and_parse(b"ID", ob.parse_file_id)
    enc_span = raw.pop(b"Encrypt")
    info_span = raw.pop(b"Info")
    return Trailer(size=size, prev=prev, root=root, file_id=file_id,
                   encrypt_pos=enc_span[0] if enc_span else None,
                   info_pos=info_span[0] if info_span else None)


# --- plain tables (plain.rs) -------------------------------------------------

# 10-digit offset SP 5-digit gen SP n/f then 2-char EOL: " \n" | " \r" | "\r\n"
_ENTRY = re.compile(rb"([0-9]{10}) ([0-9]{5}) ([nf])( \n| \r|\r\n)")


def _parse_xref_subsection(buf: bytes, pos: int):
    first, pos = ob.parse_unsigned(buf, pos)
    pos = lex.tag(buf, pos, b" ")
    count, pos = ob.parse_unsigned(buf, pos)
    pos = lex.line_ending(buf, pos)
    out = []
    for i in range(count):
        m = _ENTRY.match(buf, pos)
        if m is None:
            raise ParseError("BadXrefEntry", pos)
        offset, gen, flag = int(m.group(1)), int(m.group(2)), m.group(3)
        if flag == b"n":
            out.append(((first + i, gen), ("plain", offset)))
        pos = m.end()
    return out, pos


def parse_plain_xref(buf: bytes, pos: int):
    """``xref`` + subsections (plain.rs:87-101)."""
    pos = lex.tag(buf, pos, b"xref")
    pos = lex.skip_ws1(buf, pos)
    entries = []
    while True:
        try:
            sub, new_pos = _parse_xref_subsection(buf, pos)
        except ParseError:
            break
        entries.extend(sub)
        pos = lex.skip_ws(buf, new_pos)
    return entries, pos


def parse_plain_block(buf: bytes, pos: int):
    """plain xref + ``trailer`` + dict (plain.rs:104-114)."""
    entries, pos = parse_plain_xref(buf, pos)
    pos = lex.skip_ws(buf, pos)
    pos = lex.tag(buf, pos, b"trailer")
    pos = lex.skip_ws1(buf, pos)
    raw, pos = ob.parse_raw_dict(buf, pos)
    return entries, trailer_from_raw_dict(raw), pos


# --- xref streams (stream.rs) ------------------------------------------------


def _base256(data: bytes) -> int:
    return int.from_bytes(data, "big") if data else 0


def parse_xref_stream_entries(content: bytes, w: tuple[int, int, int],
                              index: list[tuple[int, int]]):
    """Decode the binary entry records (stream.rs:58-214)."""
    f1, f2, f3 = w
    if f2 == 0:
        raise ParseError("BadFieldSize", None, "W[1] must be nonzero")
    entries = []
    pos = 0
    rec = f1 + 0  # type field width
    for start, n in index:
        for i in range(n):
            if f1 == 0:
                etype = 0  # quirk: W[0]==0 -> type 0 -> all entries skipped
            else:
                chunk = content[pos : pos + f1]
                if len(chunk) < f1:
                    raise ParseError("XrefStreamTruncated", pos)
                etype = chunk[-1]  # f1 "should only ever span one byte"
                pos += f1
            field2 = content[pos : pos + f2]
            if len(field2) < f2:
                raise ParseError("XrefStreamTruncated", pos)
            pos += f2
            field3 = content[pos : pos + f3]
            if len(field3) < f3:
                raise ParseError("XrefStreamTruncated", pos)
            pos += f3
            if etype == 1:
                entries.append(((start + i, 0), ("plain", _base256(field2))))
            elif etype == 2:
                entries.append(((start + i, 0),
                                ("compressed", _base256(field2), _base256(field3))))
            # type 0 and unknown types: dropped
    return entries


def parse_stream_block(buf: bytes, pos: int):
    """xref stream: indirect Stream whose dict IS the trailer (stream.rs:216-226)."""

    def stream_parser(b, p):
        raw, p2 = ob.parse_raw_dict(b, p)
        content, p2 = ob.parse_stream_from_dict(b, p2, raw)
        return (raw, content), p2

    _, (raw, content), pos = ob.parse_indirect(buf, pos, stream_parser)

    index_span = raw.pop(b"Index")
    w = raw.require(b"W", lambda b, p: ob.parse_vec(b, p, ob.parse_unsigned))
    if len(w) != 3:
        raise ParseError("BadFieldSize", None, f"W has {len(w)} fields")
    trailer = trailer_from_raw_dict(raw)

    if index_span is not None:
        flat, _ = ob.parse_vec(buf, index_span[0], ob.parse_unsigned)
        if len(flat) % 2 != 0:
            raise ParseError("BadIndex")
        index = [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]
    else:
        index = [(0, trailer.size)]

    entries = parse_xref_stream_entries(content, tuple(w), index)
    return entries, trailer, pos


def parse_block(buf: bytes, pos: int):
    """alt(plain, stream) (trailer_block/block.rs:51-55)."""
    try:
        return parse_plain_block(buf, pos)
    except ParseError:
        return parse_stream_block(buf, pos)


def collect_xrefs(buf: bytes):
    """Walk the ``/Prev`` chain and flatten all xref entries (document.rs:92-130).

    Returns ``(xrefs: dict[(obj, gen) -> location], root_ref, trailer)``.
    Quirk preserved: entries are collected newest-block-first into a dict
    built with last-insert-wins, so an (unusual) duplicate id in an *older*
    block overwrites the newer one - matching the reference's
    ``Vec -> HashMap`` collect.
    """
    start = find_startxref(buf)
    if start >= len(buf):
        raise ParseError("BadStartXref", start)
    entries, trailer, _ = parse_block(buf, start)
    all_entries = list(entries)
    root = trailer.root
    prev = trailer.prev
    seen_offsets = {start}
    while prev is not None:
        if prev in seen_offsets or prev >= len(buf):
            raise ParseError("BadPrevChain", prev)
        seen_offsets.add(prev)
        entries, t, _ = parse_block(buf, prev)
        all_entries.extend(entries)
        prev = t.prev
    return dict(all_entries), root, trailer
