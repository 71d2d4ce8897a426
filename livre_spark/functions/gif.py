"""Pure-Python GIF87a/GIF89a decode (+ deterministic encoder twin).

Closes the last common crawl image format the multimodal path contained
as NotImplementedError.  The LZW here is the GIF variant - LSB-first
bit packing with a growing code width, clear/EOI codes - which differs
from the MSB-first TIFF-style LZW already in pdf/filters.py (PDF
LZWDecode); the two deliberately do not share code.

Scope: ``decode_gif`` yields the first frame; ``decode_gif_frames``
composites EVERY frame onto the logical-screen canvas (frame offsets +
graphics-control transparency honored; disposal approximated by
overwrite) - the frame-sample primitive the video modality uses.
Global and local color tables, interlaced row order.  Malformed input
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


def _screen(buf: bytes):
    """Header + logical screen descriptor -> (sw, sh, gct, pos)."""
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
    return sw, sh, gct, pos


def _iter_frames(buf: bytes, gct: bytes, pos: int):
    """Yield raw frames: (left, top, w, h, transparent_idx, rgb, mask).

    ``rgb`` is the frame raster expanded through its color table;
    ``mask`` is a per-pixel 0/1 bytes object (0 = transparent) or None
    when the frame has no transparency."""
    transparent = None
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(buf):
                raise GifError("truncated extension")
            label = buf[pos]
            pos += 1
            first = True
            while True:
                if pos >= len(buf):
                    raise GifError("truncated extension")
                size = buf[pos]
                if (first and label == 0xF9 and size >= 4
                        and pos + 4 < len(buf)):
                    # graphics control: transparency flag + index
                    flags = buf[pos + 1]
                    transparent = (buf[pos + 4] if flags & 0x01
                                   else None)
                first = False
                pos += 1 + size
                if size == 0:
                    break
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(buf):
            raise GifError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos)
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
            src_row = 0
            for first_row, step in _INTERLACE:
                for y in range(first_row, h, step):
                    rows[y * w : (y + 1) * w] = idx[src_row : src_row + w]
                    src_row += w
            idx = rows
        import numpy as np

        n_colors = len(ct) // 3
        ia = np.frombuffer(bytes(idx), dtype=np.uint8)
        if int(ia.max(initial=0)) >= n_colors:
            raise GifError("color index out of range")
        pal = np.frombuffer(ct[: n_colors * 3],
                            dtype=np.uint8).reshape(-1, 3)
        out = pal[ia].tobytes()
        mask = None
        if transparent is not None:
            mask = (ia != transparent).astype(np.uint8).tobytes()
        yield left, top, w, h, out, mask
        transparent = None  # graphics control applies to ONE frame


def decode_gif(buf: bytes) -> tuple[int, int, bytes]:
    """First frame -> (width, height, RGB samples)."""
    sw, sh, gct, pos = _screen(buf)
    for _left, _top, w, h, rgb, _mask in _iter_frames(buf, gct, pos):
        return w, h, rgb
    raise GifError("no image frame")


def decode_gif_frames(buf: bytes,
                      max_frames: int | None = None
                      ) -> tuple[int, int, list[bytes]]:
    """Animated GIF -> (screen_w, screen_h, composited RGB frames).

    Each frame is drawn onto the running canvas at its (left, top),
    transparent pixels leaving the previous content visible - the
    overwrite interpretation of disposal (methods 2/3, background/
    previous restore, are approximated by overwrite; fine for feature
    extraction, documented).  ``max_frames`` bounds work on hostile
    inputs (a 10k-frame GIF bomb costs one frame's work per frame
    regardless, so the cap is the only defense)."""
    sw, sh, gct, pos = _screen(buf)
    if sw == 0 or sh == 0:
        raise GifError("bad screen dimensions")
    import numpy as np

    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[bytes] = []
    for left, top, w, h, rgb, mask in _iter_frames(buf, gct, pos):
        ch = min(h, sh - top) if top < sh else 0
        cw = min(w, sw - left) if left < sw else 0
        if ch > 0 and cw > 0:
            fr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
            dst = canvas[top : top + ch, left : left + cw]
            if mask is None:
                dst[...] = fr[:ch, :cw]
            else:
                m = np.frombuffer(mask, dtype=np.uint8).reshape(h, w)
                np.copyto(dst, fr[:ch, :cw],
                          where=m[:ch, :cw, None].astype(bool))
        frames.append(canvas.tobytes())
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise GifError("no image frame")
    return sw, sh, frames


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


def encode_gif_animated(sw: int, sh: int, palette: bytes,
                        frames: list) -> bytes:
    """Multi-frame GIF89a: ``frames`` is a list of (left, top, w, h,
    indices, transparent_index_or_None); each frame gets a graphics-
    control extension when transparency is set."""
    n_colors = len(palette) // 3
    if n_colors < 2 or n_colors & (n_colors - 1) or len(palette) % 3:
        raise ValueError("palette must be 3*2^k bytes")
    depth = max(1, (n_colors - 1).bit_length())
    min_code = max(2, depth)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (depth - 1), 0, 0)
    out += palette
    for left, top, w, h, indices, transparent in frames:
        if len(indices) != w * h or max(indices, default=0) >= n_colors:
            raise ValueError("bad frame index buffer")
        if transparent is not None:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out += bytes([min_code])
        data = _lzw_encode_gif(bytes(indices), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
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
