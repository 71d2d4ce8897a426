"""Opt-in /ToUnicode CMap decoding - an extension beyond the reference.

The reference deliberately has no font/CMap awareness (README.md:24-26
lists it on the v0.6.0 roadmap) and its string decode is the
Latin-1/UTF-16BE heuristic (strings/mod.rs:59-97), which renders Type0 /
Identity-H show strings (glyph codes like ``<002F>``) as ``\\x00/``
gibberish.  This module implements the PDF 32000-1 9.10.3 ToUnicode CMap
(``begincodespacerange`` / ``beginbfchar`` / ``beginbfrange``) so
``extract_text(buf, cmap=True)`` can map glyph codes to real Unicode.
The DEFAULT mode stays byte-identical to the reference - the pipeline's
correctness contract - and every reference-parity test runs without the
flag.

Parsing is tolerant by design (web-crawl CMaps are messy): unparseable
sections are skipped, unmapped codes decode to U+FFFD, and any failure
leaves the font without a CMap (falling back to the heuristic decode).
"""

from __future__ import annotations

import re

_HEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_CODESPACE_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.S)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
# one bfrange item: <lo> <hi> then either <dst> or [<d0> <d1> ...]
_RANGE_ITEM_RE = re.compile(
    rb"<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*"
    rb"(?:<([0-9A-Fa-f\s]*)>|\[((?:\s*<[0-9A-Fa-f\s]*>)*)\s*\])", re.S)


def _hexbytes(token: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", token)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _utf16be(data: bytes) -> str:
    return data.decode("utf-16-be", errors="replace")


class ToUnicodeCMap:
    """Compiled ToUnicode mapping: glyph-code bytes -> Unicode text."""

    def __init__(self, code_lengths: list[int],
                 codespaces: dict[int, list[tuple[int, int]]],
                 single: dict[tuple[int, int], str],
                 ranges: list[tuple[int, int, int, bytes, list | None]]):
        # code_lengths sorted ascending; ranges entries are
        # (length, lo, hi, dst_base_bytes, dst_array_or_None)
        self.code_lengths = code_lengths
        self.codespaces = codespaces
        self.single = single
        self.ranges = ranges

    def _lookup(self, length: int, value: int) -> str | None:
        hit = self.single.get((length, value))
        if hit is not None:
            return hit
        for rlen, lo, hi, base, arr in self.ranges:
            if rlen == length and lo <= value <= hi:
                if arr is not None:
                    return arr[value - lo] if value - lo < len(arr) else None
                # add the offset to the dst interpreted as a big-endian
                # integer, re-encode at the same width (the convention
                # every mainstream reader uses for 9.10.3 ranges)
                iv = int.from_bytes(base, "big") + (value - lo)
                try:
                    return _utf16be(iv.to_bytes(max(len(base), 2), "big"))
                except OverflowError:
                    return None
        return None

    def decode(self, raw: bytes) -> str:
        out: list[str] = []
        pos = 0
        n = len(raw)
        lengths = self.code_lengths
        while pos < n:
            picked = None
            for length in lengths:
                if pos + length > n:
                    continue
                value = int.from_bytes(raw[pos:pos + length], "big")
                spaces = self.codespaces.get(length)
                in_space = spaces is None or any(
                    lo <= value <= hi for lo, hi in spaces)
                if in_space:
                    picked = (length, value)
                    break
            if picked is None:
                # outside every codespace: consume the shortest unit
                length = lengths[0] if lengths else 1
                length = min(length, n - pos)
                picked = (length, int.from_bytes(raw[pos:pos + length], "big"))
            length, value = picked
            mapped = self._lookup(length, value)
            out.append(mapped if mapped is not None else "�")
            pos += length
        return "".join(out)


# --- simple-font /Encoding maps ----------------------------------------------
#
# Second decode tier for the opt-in ``cmap=True`` path: fonts WITHOUT a
# /ToUnicode stream but WITH /Encoding /WinAnsiEncoding (= cp1252),
# /MacRomanEncoding, or an encoding dict with /Differences get a 256-entry
# byte->char table.  /Differences names resolve through a compact Adobe
# Glyph List core (ASCII + common typographic/Latin names); unknown names
# decode to U+FFFD - tolerant by design, like the rest of this module.


def _agl_core() -> dict[str, str]:
    m = {}
    for i in range(26):
        m[chr(ord("A") + i)] = chr(ord("A") + i)
        m[chr(ord("a") + i)] = chr(ord("a") + i)
    for d, name in enumerate(["zero", "one", "two", "three", "four",
                              "five", "six", "seven", "eight", "nine"]):
        m[name] = str(d)
    m.update({
        "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
        "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
        "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
        "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
        "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
        "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
        "backslash": "\\", "bracketright": "]", "asciicircum": "^",
        "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
        "braceright": "}", "asciitilde": "~",
        "quoteleft": "‘", "quoteright": "’",
        "quotedblleft": "“", "quotedblright": "”",
        "quotesinglbase": "‚", "quotedblbase": "„",
        "endash": "–", "emdash": "—", "bullet": "•",
        "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
        "fi": "ﬁ", "fl": "ﬂ", "guillemotleft": "«",
        "guillemotright": "»", "perthousand": "‰",
        "trademark": "™", "Euro": "€", "minus": "−",
        "multiply": "×", "divide": "÷", "degree": "°",
        "copyright": "©", "registered": "®", "section": "§",
        "paragraph": "¶", "cent": "¢", "sterling": "£",
        "yen": "¥", "florin": "ƒ", "germandbls": "ß",
        "eacute": "é", "egrave": "è", "agrave": "à",
        "ccedilla": "ç", "ntilde": "ñ", "adieresis": "ä",
        "odieresis": "ö", "udieresis": "ü",
        "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    })
    return m


_AGL_CORE = _agl_core()

_BASE_CODECS = {
    b"WinAnsiEncoding": "cp1252",
    b"MacRomanEncoding": "mac_roman",
    # StandardEncoding approximated by Latin-1 (tolerant path; the high
    # range differs but the ASCII core - the bulk of real text - matches)
    b"StandardEncoding": "latin-1",
}


class SimpleEncodingMap:
    """256-entry byte->char decode table (duck-typed like ToUnicodeCMap)."""

    def __init__(self, table: list[str]):
        self.table = table

    def decode(self, raw: bytes) -> str:
        t = self.table
        return "".join(t[b] for b in raw)


def encoding_map(base: bytes | None,
                 differences: list | None = None) -> SimpleEncodingMap:
    codec = _BASE_CODECS.get(bytes(base) if base else None, "latin-1")
    table = []
    for i in range(256):
        try:
            table.append(bytes([i]).decode(codec))
        except UnicodeDecodeError:
            table.append("�")
    if differences:
        code = 0
        for item in differences:
            if isinstance(item, bool):
                continue
            if isinstance(item, int):
                code = item
            elif isinstance(item, (bytes, bytearray)):
                if 0 <= code < 256:
                    table[code] = _AGL_CORE.get(
                        bytes(item).decode("latin-1"), "�")
                code += 1
    return SimpleEncodingMap(table)


def parse_tounicode(data: bytes) -> ToUnicodeCMap:
    """Parse a decoded ToUnicode CMap stream body."""
    codespaces: dict[int, list[tuple[int, int]]] = {}
    for block in _CODESPACE_RE.findall(data):
        toks = _HEX_RE.findall(block)
        for lo_t, hi_t in zip(toks[0::2], toks[1::2]):
            lo_b, hi_b = _hexbytes(lo_t), _hexbytes(hi_t)
            length = max(len(lo_b), 1)
            codespaces.setdefault(length, []).append(
                (int.from_bytes(lo_b, "big"), int.from_bytes(hi_b, "big")))

    single: dict[tuple[int, int], str] = {}
    for block in _BFCHAR_RE.findall(data):
        toks = _HEX_RE.findall(block)
        for src_t, dst_t in zip(toks[0::2], toks[1::2]):
            src = _hexbytes(src_t)
            single[(max(len(src), 1), int.from_bytes(src, "big"))] = \
                _utf16be(_hexbytes(dst_t))

    ranges: list[tuple[int, int, int, bytes, list | None]] = []
    for block in _BFRANGE_RE.findall(data):
        for m in _RANGE_ITEM_RE.finditer(block):
            lo_b, hi_b = _hexbytes(m.group(1)), _hexbytes(m.group(2))
            length = max(len(lo_b), 1)
            lo = int.from_bytes(lo_b, "big")
            hi = int.from_bytes(hi_b, "big")
            if m.group(3) is not None:
                ranges.append((length, lo, hi, _hexbytes(m.group(3)), None))
            else:
                arr = [_utf16be(_hexbytes(t))
                       for t in _HEX_RE.findall(m.group(4))]
                ranges.append((length, lo, hi, b"", arr))

    lengths = sorted(codespaces)
    if not lengths:
        lengths = sorted({k[0] for k in single}
                         | {r[0] for r in ranges}) or [2]
    return ToUnicodeCMap(lengths, codespaces, single, ranges)
