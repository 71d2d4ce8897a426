"""Deterministic synthetic image writers (PNG / PPM / BMP) for golden
fixtures - the image-side analogue of pdf/genpdf.py.

Everything is pure stdlib (zlib CRC + deflate); same inputs, same bytes,
so decode goldens hold across runs.  ``filter_type`` selects the PNG
row predictor (0 None, 1 Sub, 2 Up, 4 Paeth) via the shared
``pdf.filters.png_predict_encode`` so the decoder's unfilter path is
exercised end-to-end.
"""

from __future__ import annotations

import struct
import zlib

from ..pdf.filters import png_predict_encode

PNG_SIG = b"\x89PNG\r\n\x1a\n"

CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/pixel


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


# Adam7 pass geometry (mirrors multimodal._ADAM7): x0, y0, dx, dy
ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 2, filter_type: int = 0,
               palette: bytes | None = None, depth: int = 8,
               interlace: int = 0) -> bytes:
    """PNG from raw sample bytes (row-major, no padding, big-endian for
    16-bit depth); ``interlace=1`` emits Adam7 - each pass filtered as
    an independent sub-image, per spec."""
    ch = CHANNELS[color_type]
    ps = ch * (depth // 8)  # bytes per pixel
    assert len(pixels) == width * height * ps, "pixel buffer size mismatch"
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                       interlace)
    if interlace == 0:
        filtered = png_predict_encode(pixels, columns=width, colors=ch,
                                      bpc=depth, filter_type=filter_type)
    else:
        parts = []
        for x0, y0, dx, dy in ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = b"".join(
                pixels[(y * width + x) * ps : (y * width + x + 1) * ps]
                for y in range(y0, height, dy)
                for x in range(x0, width, dx))
            parts.append(png_predict_encode(sub, columns=pw, colors=ch,
                                            bpc=depth,
                                            filter_type=filter_type))
        filtered = b"".join(parts)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        assert palette is not None
        out += _chunk(b"PLTE", palette)
    # split IDAT in two to exercise multi-chunk concatenation
    comp = zlib.compress(filtered)
    half = len(comp) // 2
    out += _chunk(b"IDAT", comp[:half]) + _chunk(b"IDAT", comp[half:])
    return out + _chunk(b"IEND", b"")


def encode_ppm(width: int, height: int, pixels: bytes,
               gray: bool = False) -> bytes:
    """Binary PPM (P6) / PGM (P5), maxval 255, with a header comment."""
    magic = b"P5" if gray else b"P6"
    ch = 1 if gray else 3
    assert len(pixels) == width * height * ch
    return (magic + b"\n# golden fixture\n"
            + f"{width} {height}\n255\n".encode() + pixels)


def encode_bmp(width: int, height: int, pixels_rgb: bytes) -> bytes:
    """24-bit uncompressed BITMAPINFOHEADER BMP, bottom-up rows padded
    to 4 bytes; ``pixels_rgb`` is top-down row-major RGB."""
    assert len(pixels_rgb) == width * height * 3
    row_pad = (-width * 3) % 4
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = pixels_rgb[r * width * 3 : (r + 1) * width * 3]
        # BMP stores BGR
        for c in range(width):
            px = row[c * 3 : c * 3 + 3]
            body += bytes([px[2], px[1], px[0]])
        body += b"\x00" * row_pad
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    header = (b"BM" + struct.pack("<IHHI", file_size, 0, 0, pixel_off)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                            0, len(body), 2835, 2835, 0, 0))
    return header + bytes(body)
