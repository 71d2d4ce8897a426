"""Low-level lexical kernels over ``bytes``.

All functions take ``(buf, pos)`` and return ``(value, new_pos)`` (or just
``new_pos``), raising :class:`ParseError` on failure.  The semantics mirror
the reference parser combinators:

- whitespace set = winnow ``multispace``: ``b" \\t\\r\\n"`` (NOT the full PDF
  whitespace set - the reference never treats NUL/FF as whitespace).
- PDF delimiter set for token boundaries:
  /root/reference/src/extraction/utilities/delimiter.rs:83.
- balanced-delimiter scanning with optional backslash escape:
  delimiter.rs:25-80 (escape byte skips exactly one following byte).
- comments are ``%`` .. line-ending:
  /root/reference/src/extraction/special/comments.rs:13-52.
"""

from __future__ import annotations

import re

from .errors import ParseError

WS = b" \t\r\n"
WS_SET = frozenset(WS)
# All PDF delimiters (delimiter.rs:83).
DELIMS = b"()<>[]{}/% \t\r\n"
DELIM_SET = frozenset(DELIMS)


def skip_ws(buf: bytes, pos: int) -> int:
    """``multispace0``: consume zero or more whitespace bytes."""
    n = len(buf)
    while pos < n and buf[pos] in WS_SET:
        pos += 1
    return pos


def skip_ws1(buf: bytes, pos: int) -> int:
    """``multispace1``: at least one whitespace byte required."""
    new = skip_ws(buf, pos)
    if new == pos:
        raise ParseError("ExpectedWhitespace", pos)
    return new


def tag(buf: bytes, pos: int, token: bytes) -> int:
    """Match a literal byte token."""
    if buf[pos : pos + len(token)] != token:
        raise ParseError("ExpectedTag", pos, token.decode("latin-1"))
    return pos + len(token)


def line_ending(buf: bytes, pos: int) -> int:
    """winnow ``line_ending``: ``\\n`` or ``\\r\\n`` (a lone ``\\r`` fails)."""
    if buf[pos : pos + 1] == b"\n":
        return pos + 1
    if buf[pos : pos + 2] == b"\r\n":
        return pos + 2
    raise ParseError("ExpectedLineEnding", pos)


def take_till_delimiter(buf: bytes, pos: int, min_len: int = 1,
                        max_len: int | None = None) -> tuple[bytes, int]:
    """Take bytes until the next PDF delimiter (delimiter.rs:83-91).

    ``max_len`` caps the token length (used by the operator tokenizer,
    which takes 1..=3 bytes: operators/mod.rs:140).
    """
    n = len(buf)
    end = pos
    limit = n if max_len is None else min(n, pos + max_len)
    while end < limit and buf[end] not in DELIM_SET:
        end += 1
    if end - pos < min_len:
        raise ParseError("ExpectedToken", pos)
    return buf[pos:end], end


# Pre-compiled "interesting byte" scanners for balanced-delimiter search.
_SCAN_RE: dict[tuple[int, int, int | None], re.Pattern] = {}


def _scanner(opening: int, closing: int, escape: int | None) -> re.Pattern:
    key = (opening, closing, escape)
    pat = _SCAN_RE.get(key)
    if pat is None:
        chars = bytes([opening, closing] + ([escape] if escape is not None else []))
        pat = re.compile(b"[" + re.escape(chars) + b"]")
        _SCAN_RE[key] = pat
    return pat


def scan_balanced(buf: bytes, pos: int, opening: int, closing: int,
                  escape: int | None = None) -> tuple[int, int, int]:
    """Balanced-delimiter scan (delimiter.rs:41-80).

    ``buf[pos]`` must be the opening byte.  Returns
    ``(inner_start, inner_end, new_pos)`` where ``new_pos`` points past the
    closing byte.  ``escape`` (if given) causes the *next* byte to be
    skipped, exactly like the reference's ``skip`` flag - the escaped byte
    itself is never counted, even if it is another escape byte.
    """
    if pos >= len(buf) or buf[pos] != opening:
        raise ParseError("ExpectedOpeningDelimiter", pos)
    inner_start = pos + 1
    counter = 1
    i = inner_start
    scan = _scanner(opening, closing, escape)
    n = len(buf)
    while i < n:
        m = scan.search(buf, i)
        if m is None:
            break
        j = m.start()
        b = buf[j]
        if escape is not None and b == escape:
            i = j + 2  # skip the escape byte AND the escaped byte
            continue
        if b == closing:
            counter -= 1
            if counter == 0:
                return inner_start, j, j + 1
        else:  # opening
            counter += 1
        i = j + 1
    raise ParseError("UnbalancedDelimiters", pos)


def recognize_parens(buf: bytes, pos: int) -> tuple[int, int, int]:
    """``Parentheses``: ``(`` .. ``)`` with ``\\`` escape (delimiter.rs:127)."""
    return scan_balanced(buf, pos, 0x28, 0x29, 0x5C)


def recognize_brackets(buf: bytes, pos: int) -> tuple[int, int, int]:
    """``Brackets``: ``[`` .. ``]``, no escape (delimiter.rs:126)."""
    return scan_balanced(buf, pos, 0x5B, 0x5D, None)


def recognize_angles(buf: bytes, pos: int) -> tuple[int, int, int]:
    """``Angles``: ``<`` .. ``>``, no escape (delimiter.rs:128)."""
    return scan_balanced(buf, pos, 0x3C, 0x3E, None)


def recognize_double_angles(buf: bytes, pos: int) -> tuple[int, int, int]:
    """``DoubleAngles``: ``<`` + balanced ``<...>`` + ``>`` (delimiter.rs:133-138).

    Returns (inner_start, inner_end, new_pos) for the *inner* content, i.e.
    the bytes between ``<<`` and ``>>``.
    """
    if buf[pos : pos + 1] != b"<":
        raise ParseError("ExpectedTag", pos, "<<")
    inner_start, inner_end, after = recognize_angles(buf, pos + 1)
    after = tag(buf, after, b">")
    return inner_start, inner_end, after


def comment_recognize(buf: bytes, pos: int) -> int:
    """``Comment::recognize``: ``%`` + till-line-ending + line-ending."""
    pos = tag(buf, pos, b"%")
    n = len(buf)
    i = pos
    while i < n and buf[i] not in (0x0A, 0x0D):
        i += 1
    return line_ending(buf, i)


def multicomment0(buf: bytes, pos: int) -> int:
    """Zero or more comments / whitespace runs (comments.rs:37-44)."""
    while True:
        new = skip_ws(buf, pos)
        if new == pos:
            try:
                new = comment_recognize(buf, pos)
            except ParseError:
                return pos
        pos = new


def multicomment1(buf: bytes, pos: int) -> int:
    """At least one comment / whitespace run (comments.rs:47-52)."""
    new = multicomment0(buf, pos)
    if new == pos:
        raise ParseError("ExpectedCommentOrWhitespace", pos)
    return new
