"""Deterministic synthetic media writers (PNG / PPM / BMP / WAV) for
golden fixtures - the media-side analogue of pdf/genpdf.py.

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
    if depth < 8:
        # sub-byte gray/palette: ``pixels`` holds one raw value per
        # pixel; pack MSB-first per row before filtering
        assert ch == 1 and len(pixels) == width * height

        def _pack(values: bytes, row_w: int) -> bytes:
            out = bytearray()
            for r in range(0, len(values), row_w):
                row = values[r : r + row_w]
                acc = nbits = 0
                for v in row:
                    acc = (acc << depth) | (v & ((1 << depth) - 1))
                    nbits += depth
                    if nbits == 8:
                        out.append(acc)
                        acc = nbits = 0
                if nbits:
                    out.append(acc << (8 - nbits))
            return bytes(out)
    else:
        ps = ch * (depth // 8)  # bytes per pixel
        assert len(pixels) == width * height * ps, \
            "pixel buffer size mismatch"
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                       interlace)
    if interlace == 0:
        raw = _pack(pixels, width) if depth < 8 else pixels
        filtered = png_predict_encode(raw, columns=width, colors=ch,
                                      bpc=depth, filter_type=filter_type)
    else:
        parts = []
        for x0, y0, dx, dy in ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            if depth < 8:
                sub = _pack(bytes(
                    pixels[y * width + x]
                    for y in range(y0, height, dy)
                    for x in range(x0, width, dx)), pw)
            else:
                sub = b"".join(
                    pixels[(y * width + x) * ps
                           : (y * width + x + 1) * ps]
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


def encode_wav(rate: int, channels: int, samples16: list[int]) -> bytes:
    """RIFF/WAVE PCM 16-bit LE golden writer (interleaved samples)."""
    data = b"".join(struct.pack("<h", s) for s in samples16)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits: repeat packets for runs >= 3, literals otherwise."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def encode_tiff(width: int, height: int, pixels: bytes, spp: int = 3,
                compression: str = "none", predictor: int = 1,
                endian: str = "<", rows_per_strip: int | None = None,
                bits: int = 8,
                tile: tuple[int, int] | None = None,
                fill_order: int = 1,
                planar: bool = False,
                _base: int = 8, _next_ifd: int = 0,
                _body_only: bool = False) -> bytes:
    """Strip or tiled TIFF golden writer (8/16-bit gray/RGB/RGBA;
    none/lzw/packbits; optional horizontal-differencing predictor -
    8-bit only, matching the decoder's honest boundary).  16-bit
    ``pixels`` are native-``endian`` two-byte samples.  ``tile=(tw,
    th)`` writes tags 322-325 instead of the strip layout, edge tiles
    zero-padded to full size per the TIFF 6.0 spec.  ``planar`` writes
    PlanarConfiguration=2: ``pixels`` stay interleaved at the API, the
    writer splits them into per-component planes with the strip list
    plane-major (all of plane 0's strips first), per TIFF 6.0."""
    from ..pdf.filters import lzw_encode

    fax = compression in ("ccitt-mh", "ccitt-g3", "ccitt-g3-2d",
                          "ccitt-g4")
    if planar:
        assert tile is None and not fax, "planar is strip-layout only"
    if fax:
        # bilevel fax: ``pixels`` are packed 1-bpp rows (MSB first,
        # byte-padded, 1 = white), spp forced to 1
        spp, bits = 1, 1
        assert tile is None, "tiled fax TIFF not supported"
        assert predictor == 1
        assert len(pixels) == ((width + 7) >> 3) * height
    else:
        assert len(pixels) == width * height * spp * (bits // 8)
    e = endian
    if rows_per_strip is None:
        rows_per_strip = max(1, (height + 1) // 2)  # >= 2 strips usually
    sb = bits // 8
    row_bytes = width * spp * sb

    def _diff_rows(data: bytes, rb: int) -> bytes:
        enc = bytearray(data)
        for r in range(0, len(enc), rb):
            for i in range(rb - 1, spp - 1, -1):
                enc[r + i] = (enc[r + i] - enc[r + i - spp]) & 0xFF
        return bytes(enc)

    def _compress(data: bytes) -> bytes:
        if compression == "lzw":
            return lzw_encode(data)
        if compression == "packbits":
            return packbits_encode(data)
        if compression != "none":
            raise ValueError(compression)
        return data

    strips = []
    if tile is not None:
        tw, th = tile
        tile_rb = tw * spp * sb
        for ty in range(0, height, th):
            for tx in range(0, width, tw):
                block = bytearray()
                seg = min(tx + tw, width) * spp * sb - tx * spp * sb
                for r in range(th):
                    y = ty + r
                    row = (pixels[y * row_bytes + tx * spp * sb :
                                  y * row_bytes + tx * spp * sb + seg]
                           if y < height else b"")
                    block += row + b"\x00" * (tile_rb - len(row))
                data = bytes(block)
                if predictor == 2:
                    data = _diff_rows(data, tile_rb)
                strips.append(_compress(data))
    elif fax:
        import numpy as np

        from ..pdf.ccitt import encode_ccitt

        stride = (width + 7) >> 3
        fax_k = {"ccitt-mh": 0, "ccitt-g3": 0, "ccitt-g3-2d": 4,
                 "ccitt-g4": -1}[compression]
        for y0 in range(0, height, rows_per_strip):
            n = min(rows_per_strip, height - y0)
            rows = pixels[y0 * stride : (y0 + n) * stride]
            coded = encode_ccitt(
                rows, width, n, k=fax_k,
                # TIFF 6.0: MH rows each begin on a byte boundary;
                # G3 writes EOL-prefixed lines; G4 is bare 2-D
                byte_align=(compression == "ccitt-mh"),
                end_of_line=(compression == "ccitt-g3"),
                end_of_block=False)
            if fill_order == 2:  # fax-device bit order (tag 266)
                coded = np.packbits(np.unpackbits(
                    np.frombuffer(coded, dtype=np.uint8)
                    .reshape(-1, 1), axis=1,
                    bitorder="little")).tobytes()
            strips.append(coded)
    elif planar:
        import numpy as np

        arr = (np.frombuffer(pixels, np.uint8)
               .reshape(height, width, spp, sb))
        plane_rb = width * sb
        for s in range(spp):
            plane = arr[:, :, s, :].tobytes()
            for y0 in range(0, height, rows_per_strip):
                rows = plane[y0 * plane_rb :
                             (y0 + min(rows_per_strip,
                                       height - y0)) * plane_rb]
                if predictor == 2:
                    enc = bytearray(rows)
                    for r in range(0, len(enc), plane_rb):
                        for i in range(plane_rb - 1, 0, -1):
                            enc[r + i] = (enc[r + i]
                                          - enc[r + i - 1]) & 0xFF
                    rows = bytes(enc)
                strips.append(_compress(rows))
    else:
        for y0 in range(0, height, rows_per_strip):
            rows = pixels[y0 * row_bytes :
                          (y0 + min(rows_per_strip,
                                    height - y0)) * row_bytes]
            if predictor == 2:
                rows = _diff_rows(rows, row_bytes)
            strips.append(_compress(rows))
    comp_code = {"none": 1, "lzw": 5, "packbits": 32773,
                 "ccitt-mh": 2, "ccitt-g3": 3, "ccitt-g3-2d": 3,
                 "ccitt-g4": 4}[compression]

    entries = []  # (tag, type, count, value_bytes)
    def short(v): return struct.pack(e + "H", v)
    def long_(v): return struct.pack(e + "I", v)
    entries.append((256, 4, 1, long_(width)))
    entries.append((257, 4, 1, long_(height)))
    entries.append((258, 3, spp, b"".join(short(bits)
                                           for _ in range(spp))))
    entries.append((259, 3, 1, short(comp_code)))
    entries.append((262, 3, 1, short(0 if fax
                                     else (1 if spp == 1 else 2))))
    entries.append((277, 3, 1, short(spp)))
    if planar:
        entries.append((284, 3, 1, short(2)))
    if comp_code == 3:
        entries.append((292, 4, 1, long_(
            1 if compression == "ccitt-g3-2d" else 0)))
    elif comp_code == 4:
        entries.append((293, 4, 1, long_(0)))
    if fax and fill_order == 2:
        entries.append((266, 3, 1, short(2)))
    if tile is not None:
        entries.append((322, 4, 1, long_(tile[0])))
        entries.append((323, 4, 1, long_(tile[1])))
        entries.append((324, 4, len(strips), None))
        entries.append((325, 4, len(strips), None))
    else:
        # 273/279 filled after layout
        entries.append((273, 4, len(strips), None))
        entries.append((278, 4, 1, long_(rows_per_strip)))
        entries.append((279, 4, len(strips), None))
    if predictor == 2:
        entries.append((317, 3, 1, short(predictor)))
    entries.sort(key=lambda t: t[0])  # IFD entries must be tag-ordered

    header = (b"II*\x00" if e == "<" else b"MM\x00*") + struct.pack(
        e + "I", 8)
    ifd_size = 2 + 12 * len(entries) + 4
    ext = bytearray()
    ext_base = _base + ifd_size
    placed = []
    for tag, typ, count, val in entries:
        placed.append([tag, typ, count, val, None])
    # first pass: compute external area for known values
    for p in placed:
        if p[3] is not None and len(p[3]) > 4:
            p[4] = ext_base + len(ext)
            ext += p[3]
    # strip offset/count arrays (external when > 1 strip)
    off_arr_pos = ext_base + len(ext)
    ext += b"\x00" * (4 * len(strips))
    cnt_arr_pos = ext_base + len(ext)
    ext += b"\x00" * (4 * len(strips))
    data_base = ext_base + len(ext)
    offs = []
    pos = data_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    struct.pack_into(e + "I" * len(strips), ext,
                     off_arr_pos - ext_base, *offs)
    struct.pack_into(e + "I" * len(strips), ext, cnt_arr_pos - ext_base,
                     *[len(s) for s in strips])
    ifd = bytearray(struct.pack(e + "H", len(placed)))
    for tag, typ, count, val, voff in placed:
        ifd += struct.pack(e + "HHI", tag, typ, count)
        if tag in (273, 324):
            if len(strips) == 1:
                ifd += long_(offs[0])
            else:
                ifd += long_(off_arr_pos)
        elif tag in (279, 325):
            if len(strips) == 1:
                ifd += long_(len(strips[0]))
            else:
                ifd += long_(cnt_arr_pos)
        elif val is not None and len(val) > 4:
            ifd += long_(voff)
        else:
            ifd += (val or b"") + b"\x00" * (4 - len(val or b""))
    ifd += long_(_next_ifd)  # next IFD in the chain (0 = last)
    body = bytes(ifd) + bytes(ext) + b"".join(strips)
    return body if _body_only else header + body


def encode_tiff_multi(pages: list[dict]) -> bytes:
    """Multi-page TIFF golden writer: one IFD per page chained via the
    next-IFD pointer (the scanned/fax-document norm).  ``pages`` holds
    :func:`encode_tiff` keyword dicts; all pages share one endianness."""
    if not pages:
        raise ValueError("no pages")
    e = pages[0].get("endian", "<")
    assert all(pg.get("endian", "<") == e for pg in pages)
    # first pass: body sizes are independent of base/next offsets
    sizes = [len(encode_tiff(**pg, _body_only=True)) for pg in pages]
    bases = [8]
    for sz in sizes[:-1]:
        bases.append(bases[-1] + sz)
    header = (b"II*\x00" if e == "<" else b"MM\x00*") + struct.pack(
        e + "I", 8)
    bodies = []
    for i, pg in enumerate(pages):
        nxt = bases[i] + sizes[i] if i + 1 < len(pages) else 0
        bodies.append(encode_tiff(**pg, _base=bases[i], _next_ifd=nxt,
                                  _body_only=True))
    return header + b"".join(bodies)
