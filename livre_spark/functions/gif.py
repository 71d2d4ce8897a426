"""Pure-Python GIF87a/GIF89a decode (+ deterministic encoder twin).

Closes the last common crawl image format the multimodal path contained
as NotImplementedError.  The LZW here is the GIF variant - LSB-first
bit packing with a growing code width, clear/EOI codes - which differs
from the MSB-first TIFF-style LZW already in pdf/filters.py (PDF
LZWDecode); the two deliberately do not share code.

Scope: static decode of the FIRST image frame (animated GIFs yield
frame 1), global and local color tables, interlaced row order,
extension blocks skipped (transparency index ignored - the palette
color is used; features read colors, not alpha).  Malformed input
raises ``GifError``, contained into the error column by the feature
UDF like every other per-row failure.
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    """Malformed GIF payload - contained into the error column."""


# interlace pass order: (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-variant LZW: LSB-first, width grows after the table fills."""
    if not (2 <= min_code_size <= 11):
        raise GifError(f"LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}

    table = reset_table()
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise GifError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = reset_table()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GifError("bad first LZW code")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise GifError("LZW code out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif(buf: bytes) -> tuple[int, int, bytes]:
    """First frame -> (width, height, RGB samples)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad GIF signature")
    if len(buf) < 13:
        raise GifError("truncated screen descriptor")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = buf[pos : pos + n]
        if len(gct) != n:
            raise GifError("truncated global color table")
        pos += n
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(buf):
                    raise GifError("truncated extension")
                size = buf[pos]
                pos += 1 + size
                if size == 0:
                    break
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(buf):
            raise GifError("truncated image descriptor")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        if w == 0 or h == 0:
            raise GifError("bad frame dimensions")
        ct = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            ct = buf[pos : pos + n]
            if len(ct) != n:
                raise GifError("truncated local color table")
            pos += n
        if not ct:
            raise GifError("frame without color table")
        interlaced = bool(ipacked & 0x40)
        if pos >= len(buf):
            raise GifError("missing LZW code size")
        min_code = buf[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(buf):
                raise GifError("truncated image data")
            size = buf[pos]
            pos += 1
            if size == 0:
                break
            chunks.append(buf[pos : pos + size])
            if len(chunks[-1]) != size:
                raise GifError("truncated sub-block")
            pos += size
        idx = _lzw_decode_gif(b"".join(chunks), min_code, w * h)
        if len(idx) < w * h:
            raise GifError("pixel underrun")
        idx = idx[: w * h]
        if interlaced:
            rows = bytearray(w * h)
            src = 0
            for first, step in _INTERLACE:
                for y in range(first, h, step):
                    rows[y * w : (y + 1) * w] = idx[src : src + w]
                    src += w
            idx = rows
        n_colors = len(ct) // 3
        out = bytearray(w * h * 3)
        for i, ci in enumerate(idx):
            if ci >= n_colors:
                raise GifError("color index out of range")
            out[3 * i : 3 * i + 3] = ct[3 * ci : 3 * ci + 3]
        return w, h, bytes(out)
    raise GifError("no image frame")


# --- deterministic encoder twin ----------------------------------------------

def _lzw_encode_gif(indices: bytes, min_code_size: int) -> bytes:
    """The code width the DECODER uses to read code #t depends on its
    own table size after code #t-1 - and the decoder's table runs one
    add BEHIND the encoder's (it adds on the NEXT code's first char).
    Rather than reproduce that off-by-one in arithmetic, the encoder
    simulates the decoder's (table size, width, prev?) state explicitly
    and emits every code at the width that simulation dictates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    # simulated decoder state
    width = min_code_size + 1
    dec_next = eoi + 1
    dec_has_prev = False

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def emit_data(code: int) -> None:
        """Emit a data code, then advance the simulated decoder."""
        nonlocal dec_next, dec_has_prev, width
        emit(code)
        if dec_has_prev and dec_next < 4096:
            dec_next += 1
            if dec_next == (1 << width) and width < 12:
                width += 1
        dec_has_prev = True

    def emit_clear() -> None:
        nonlocal dec_next, dec_has_prev, width
        emit(clear)
        width = min_code_size + 1
        dec_next = eoi + 1
        dec_has_prev = False

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit_clear()
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit_data(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            emit_clear()
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        run = bytes([b])
    if run:
        emit_data(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width: int, height: int, indices: bytes, palette: bytes,
               interlace: bool = False, animated_tail: bool = False) -> bytes:
    """GIF89a from palette indices; ``palette`` is 3*n RGB bytes with n a
    power of two >= 2.  ``animated_tail`` appends a second (garbage-free)
    frame so first-frame-only decode is exercised."""
    n_colors = len(palette) // 3
    if n_colors < 2 or n_colors & (n_colors - 1) or len(palette) % 3:
        raise ValueError("palette must be 3*2^k bytes")
    if len(indices) != width * height or max(indices, default=0) >= n_colors:
        raise ValueError("bad index buffer")
    depth = max(1, (n_colors - 1).bit_length())
    min_code = max(2, depth)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += palette
    if interlace:
        reordered = bytearray()
        for first, step in _INTERLACE:
            for y in range(first, height, step):
                reordered += indices[y * width : (y + 1) * width]
        indices = bytes(reordered)

    def frame(idx: bytes) -> bytes:
        f = bytearray()
        f += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height,
                                   0x40 if interlace else 0)
        f += bytes([min_code])
        data = _lzw_encode_gif(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            f += bytes([len(chunk)]) + chunk
        f += b"\x00"
        return bytes(f)

    out += frame(indices)
    if animated_tail:
        # graphics-control extension + an all-zero second frame
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += frame(bytes(len(indices)))
    out += b"\x3b"
    return bytes(out)
