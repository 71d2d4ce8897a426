"""CCITT Group 3 / Group 4 fax decoding (/CCITTFaxDecode).

Beyond-reference extension: the reference rejects the filter outright
(filtering.rs:50-53 lists CCITTFaxDecode among the unsupported image
codecs), but scanned PDFs - the single biggest slice of real crawl
PDFs - carry their page rasters as G4 (T.6 2-D MMR) or G3 (T.4)
bilevel images, so ``page_images`` decodes them here.

Both directions are implemented from the public ITU-T T.4/T.6 specs:

- :func:`decode_ccitt` - PDF parameter semantics (ISO 32000-1 7.4.6):
  ``K < 0`` pure 2-D (G4), ``K = 0`` 1-D MH (G3), ``K > 0`` mixed
  1-D/2-D with per-line tag bits; ``/EncodedByteAlign``, ``/BlackIs1``,
  ``/Rows``/``/Columns`` honored.  Output is packed 1-bpp rows, MSB
  first, each row padded to a byte boundary - exactly the sample
  format a /Filter-less image XObject would carry, so ``page_images``
  reports ``kind="raster"``.
- :func:`encode_ccitt` - the deterministic twin used to build test
  goldens and genpdf fixtures (the repo-wide codec-pinning pattern:
  every decoder ships with an encoder whose output it must invert).

The run-length Huffman tables are transcribed from T.4 (terminating +
make-up codes per colour, shared extended make-ups to 2560); the module
self-checks them for prefix-freeness at import - a transcription typo
that breaks decodability fails loudly, not with garbage pixels.
"""

from __future__ import annotations

from .errors import ParseError

# ---------------------------------------------------------------------------
# T.4 run-length code tables: {run_length: bit-string}
# ---------------------------------------------------------------------------

WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
    # make-up codes
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    # make-up codes
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended make-ups (1792-2560) are colour-independent
EXT_CODES = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

EOL = "000000000001"

# 2-D mode codes
_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}


def _build_decode_table(*tables: dict) -> dict:
    """(bit-string -> run) lookup, verified prefix-free."""
    inv: dict[str, int] = {}
    for t in tables:
        for run, code in t.items():
            if code in inv:
                raise AssertionError(f"duplicate code {code}")
            inv[code] = run
    codes = sorted(inv)
    for i, c in enumerate(codes):
        for other in codes[i + 1:]:
            if other.startswith(c):
                raise AssertionError(f"{c} is a prefix of {other}")
            if not other.startswith(c[:1]):
                break
    return inv


# full prefix check once at import: O(n^2) over ~100 codes, and the
# EOL must extend no run code
_WHITE_DECODE = _build_decode_table(WHITE_CODES, EXT_CODES)
_BLACK_DECODE = _build_decode_table(BLACK_CODES, EXT_CODES)
_MAX_CODE_LEN = 13
assert not any(EOL.startswith(c) for c in _WHITE_DECODE)
assert not any(EOL.startswith(c) for c in _BLACK_DECODE)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def peek(self, n: int) -> str:
        out = []
        for i in range(self.pos, min(self.pos + n, len(self.data) * 8)):
            out.append("1" if self.data[i >> 3] & (0x80 >> (i & 7)) else "0")
        return "".join(out)

    def peek_int(self, n: int) -> int:
        """Next ``n`` (<= 20) bits MSB-first as an int, zero-padded past
        the end of data - the fast path for code-table lookups."""
        byte0 = self.pos >> 3
        chunk = self.data[byte0 : byte0 + 4]
        if len(chunk) < 4:
            chunk = chunk + b"\x00" * (4 - len(chunk))
        word = int.from_bytes(chunk, "big")
        return (word >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >= len(self.data) * 8


def _build_lut(decode_table: dict) -> list:
    """Flat 2^13-entry window lookup: 13-bit prefix -> (run, code_len).
    One indexed load replaces the per-length prefix probing."""
    lut: list = [None] * (1 << _MAX_CODE_LEN)
    for code, run in decode_table.items():
        ln = len(code)
        base = int(code, 2) << (_MAX_CODE_LEN - ln)
        for suffix in range(1 << (_MAX_CODE_LEN - ln)):
            lut[base | suffix] = (run, ln)
    return lut


_WHITE_LUT = _build_lut(_WHITE_DECODE)
_BLACK_LUT = _build_lut(_BLACK_DECODE)


def _read_run(br: _BitReader, white: bool) -> int:
    """One complete run: zero or more make-ups + one terminating code."""
    lut = _WHITE_LUT if white else _BLACK_LUT
    nbits = len(br.data) * 8
    total = 0
    while True:
        if br.pos >= nbits:
            raise ParseError("CCITTBadCode", br.pos, "run hits end of data")
        hit = lut[br.peek_int(_MAX_CODE_LEN)]
        if hit is None:
            raise ParseError("CCITTBadCode", br.pos,
                             f"no {'white' if white else 'black'} code at "
                             f"bit {br.pos}")
        run, ln = hit
        br.skip(ln)
        total += run
        if run < 64:  # terminating code ends the run
            return total


def _try_eol(br: _BitReader) -> bool:
    """Consume fill zeros + EOL if present at the cursor.

    T.4 permits ARBITRARY zero fill before an EOL (minimum scan-line
    time padding), so the scan for the terminating 1 bit is unbounded:
    11+ zeros followed by a 1 can only be fill + EOL (no run/mode code
    has that many leading zeros)."""
    pos = br.pos
    data = br.data
    nbits = len(data) * 8
    one = -1
    i = pos
    # skip zero bits to the next set bit (byte-hopping over 0x00 runs)
    while i < nbits:
        if (i & 7) == 0:
            while i < nbits and data[i >> 3] == 0:
                i += 8
            if i >= nbits:
                break
        if data[i >> 3] & (0x80 >> (i & 7)):
            one = i
            break
        i += 1
    if one >= 0 and one - pos >= 11:
        br.pos = one + 1
        return True
    return False


def _find_b(ref: list[int], a0: int, color: int,
            hint: int = 0) -> tuple[int, int, int]:
    """(b1, b2, i): first changing element on the reference line right
    of a0 with colour opposite to a0's colour, the next one after it,
    and its index (pass back as ``hint`` - a0 moves left by at most 2
    between calls, so the hinted scan is amortized O(1) per row instead
    of O(transitions) per call).

    ``ref`` holds the reference row's transition positions (position i
    means the pixel AT i differs from the pixel at i-1; colour left of
    position 0 is white), terminated by two sentinels at ``columns``.
    Opposite-of-a0 means: if a0's colour is white, b1 is a white->black
    transition = EVEN index in ``ref``."""
    parity = 0 if color == 0 else 1
    i = hint + ((parity - hint) & 1)  # smallest index >= hint w/ parity
    while i - 2 >= parity and (i - 2 >= len(ref) or ref[i - 2] > a0):
        i -= 2
    while i < len(ref) and ref[i] <= a0:
        i += 2
    b1 = ref[i] if i < len(ref) else ref[-1]
    b2 = ref[i + 1] if i + 1 < len(ref) else ref[-1]
    return b1, b2, i


def _decode_2d_row(br: _BitReader, ref: list[int],
                   columns: int) -> list[int]:
    """One 2-D coded row against reference transitions -> transitions."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 = white
    hint = 0
    nbits = len(br.data) * 8
    while a0 < columns:
        b1, b2, hint = _find_b(ref, a0, color, hint)
        if br.pos >= nbits:
            raise ParseError("CCITTTruncated", br.pos)
        w = br.peek_int(7)  # zero-padded past end; checked above
        if w & 0b1000000:  # V0 = '1'
            br.skip(1)
            a1 = b1
        elif w >> 4 == 0b011:
            br.skip(3)
            a1 = b1 + 1
        elif w >> 4 == 0b010:
            br.skip(3)
            a1 = b1 - 1
        elif w >> 4 == 0b001:  # horizontal
            br.skip(3)
            start = max(a0, 0)
            r1 = _read_run(br, color == 0)
            r2 = _read_run(br, color != 0)
            a1 = start + r1
            a2 = a1 + r2
            cur.append(min(a1, columns))
            cur.append(min(a2, columns))
            a0 = a2
            continue
        elif w >> 3 == 0b0001:  # pass
            br.skip(4)
            a0 = b2
            continue
        elif w >> 1 == 0b000011:
            br.skip(6)
            a1 = b1 + 2
        elif w >> 1 == 0b000010:
            br.skip(6)
            a1 = b1 - 2
        elif w == 0b0000011:
            br.skip(7)
            a1 = b1 + 3
        elif w == 0b0000010:
            br.skip(7)
            a1 = b1 - 3
        else:
            raise ParseError("CCITTBadMode", br.pos, bin(w))
        cur.append(min(max(a1, 0), columns))
        a0 = a1
        color ^= 1
    return cur


def _decode_1d_row(br: _BitReader, columns: int) -> list[int]:
    """One MH-coded row (runs from white) -> transition positions."""
    cur: list[int] = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(br, white)
        pos += run
        cur.append(min(pos, columns))
        white = not white
    return cur


def _transitions_to_packed(trans: list[int], columns: int,
                           black_is_1: bool) -> bytes:
    """Transition positions -> one packed 1-bpp row (MSB first).

    PDF default (/BlackIs1 false): BLACK pixels are 0 bits, so a blank
    white row is all 1s.  Vectorized: toggle marks at each transition,
    prefix-xor to colours, packbits - no per-pixel Python."""
    import numpy as np

    toggles = np.zeros(columns + 1, dtype=np.uint8)
    for t in trans:
        if 0 <= t < columns:
            toggles[t] ^= 1
        elif t >= columns:
            break
    is_black = np.bitwise_xor.accumulate(toggles[:columns])
    bits = (is_black if black_is_1 else is_black ^ 1)
    stride = (columns + 7) >> 3
    return np.packbits(bits)[:stride].tobytes()


def decode_ccitt(data: bytes, columns: int = 1728, rows: int = 0,
                 k: int = 0, byte_align: bool = False,
                 black_is_1: bool = False,
                 max_pixels: int = 1 << 26) -> bytes:
    """Decode a /CCITTFaxDecode payload to packed 1-bpp rows.

    ``k`` follows the PDF /K parameter: ``< 0`` G4 (T.6 pure 2-D),
    ``0`` G3 1-D, ``> 0`` G3 mixed with per-line tag bits after each
    EOL.  ``rows=0`` decodes until the data (or an EOFB/RTC) runs out.
    EOLs are tolerated wherever they may legally appear regardless of
    /EndOfLine (writers disagree; the bit pattern is unambiguous since
    no run code is a prefix of EOL).

    ``max_pixels`` (default 64M ~ 8K x 8K, far above any real fax) is
    the decompression-bomb guard: /Columns and /Rows are
    attacker-controlled in crawl PDFs/TIFFs, and a kilobyte of make-up
    codes can otherwise demand multi-GB row allocations."""
    if columns <= 0:
        raise ParseError("CCITTBadColumns", None, str(columns))
    if columns > max_pixels or rows * columns > max_pixels:
        raise ParseError("CCITTTooLarge", None,
                         f"{columns}x{rows} exceeds max_pixels")
    max_rows = max_pixels // columns
    br = _BitReader(data)
    ref = [columns, columns]
    out = bytearray()
    n = 0
    while rows <= 0 or n < rows:
        if n >= max_rows:  # unknown-rows bomb guard
            raise ParseError("CCITTTooLarge", br.pos,
                             f"{n} rows x {columns} exceeds max_pixels")
        if byte_align and k <= 0:
            br.align()
        saw_eol = _try_eol(br)
        if k > 0:
            # mixed mode: a tag bit after each EOL picks 1-D vs 2-D;
            # a missing EOL (nonstandard) implies a 1-D line
            if byte_align and not saw_eol:
                br.align()
                saw_eol = _try_eol(br)
            two_d = False
            if saw_eol:
                if _try_eol(br):  # RTC: EOL+EOL ends the block
                    break
                tag = br.peek(1)
                if not tag:
                    break
                br.skip(1)
                two_d = tag == "0"
                # RTC in mixed mode is 6x(EOL+1): an EOL right after
                # the tag bit can only be the return-to-control mark
                # (row data has at most ~7 leading zeros)
                if _try_eol(br):
                    break
        else:
            if saw_eol and _try_eol(br):  # EOFB / RTC
                break
            two_d = k < 0
        if br.exhausted():
            break
        # all-zero padding tail (no EOL): stop rather than misparse
        if "1" not in br.peek(_MAX_CODE_LEN) and not br.peek(64).count("1"):
            break
        trans = (_decode_2d_row(br, ref, columns) if two_d
                 else _decode_1d_row(br, columns))
        out += _transitions_to_packed(trans, columns, black_is_1)
        ref = trans + [columns, columns]
        n += 1
        if rows > 0 and n == rows:
            break
    if rows > 0 and n < rows:
        raise ParseError("CCITTShortData", br.pos, f"{n}/{rows} rows")
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder twin (test-golden / fixture builder)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list[str] = []
        self.n = 0

    def write(self, code: str) -> None:
        self.bits.append(code)
        self.n += len(code)

    def align(self) -> None:
        pad = (-self.n) % 8
        if pad:
            self.write("0" * pad)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * ((-len(s)) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _write_run(bw: _BitWriter, run: int, white: bool) -> None:
    table = WHITE_CODES if white else BLACK_CODES
    while run >= 64:
        if run >= 1792:
            make = min(2560, (run >> 6) << 6)
            code = EXT_CODES.get(make)
            if code is None:
                make = max(m for m in EXT_CODES if m <= run)
                code = EXT_CODES[make]
        else:
            make = (run >> 6) << 6
            code = table[make]
        bw.write(code)
        run -= make
    bw.write(table[run])


def _row_transitions(row: bytes, columns: int, black_is_1: bool) -> list[int]:
    import numpy as np

    bits = np.unpackbits(np.frombuffer(row, dtype=np.uint8))[:columns]
    is_white = bits == (0 if black_is_1 else 1)
    # changes vs the previous pixel, with an imaginary white pixel at -1
    prev = np.concatenate(([True], is_white[:-1]))
    return np.nonzero(is_white != prev)[0].tolist()


def _encode_2d_row(bw: _BitWriter, cur: list[int], ref: list[int],
                   columns: int) -> None:
    a0 = -1
    color = 0
    ci = 0
    hint = 0
    while a0 < columns:
        b1, b2, hint = _find_b(ref, a0, color, hint)
        a1 = cur[ci] if ci < len(cur) else columns
        a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
        if b2 < a1:
            bw.write(_MODE_PASS)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.write(_MODE_V[a1 - b1])
            a0 = a1
            color ^= 1
            ci += 1
        else:
            bw.write(_MODE_HORIZ)
            start = max(a0, 0)
            _write_run(bw, a1 - start, color == 0)
            _write_run(bw, a2 - a1, color != 0)
            a0 = a2
            ci += 2


def encode_ccitt(samples: bytes, columns: int, rows: int, k: int = -1,
                 byte_align: bool = False, black_is_1: bool = False,
                 end_of_block: bool = True,
                 end_of_line: bool = False) -> bytes:
    """Encode packed 1-bpp rows (PDF bit convention, rows byte-padded)
    with the parameters :func:`decode_ccitt` accepts.  G4 appends an
    EOFB, G3 an RTC, when ``end_of_block`` (the PDF default)."""
    stride = (columns + 7) >> 3
    if len(samples) < stride * rows:
        raise ValueError("samples shorter than columns*rows")
    bw = _BitWriter()
    ref = [columns, columns]
    for r in range(rows):
        row = samples[r * stride:(r + 1) * stride]
        trans = _row_transitions(row, columns, black_is_1)
        if k < 0:
            if byte_align:
                bw.align()
            _encode_2d_row(bw, trans, ref, columns)
            ref = trans + [columns, columns]
        elif k == 0:
            if end_of_line:
                bw.write(EOL)
            if byte_align:
                bw.align()
            _encode_1d_runs(bw, trans, columns)
        else:
            # mixed: EOL + tag per line; alternate 1-D (first) then 2-D
            if byte_align:
                bw.align()
            bw.write(EOL)
            two_d = r % (k if k > 1 else 1) != 0 and k > 1
            bw.write("0" if two_d else "1")
            if two_d:
                _encode_2d_row(bw, trans, ref, columns)
            else:
                _encode_1d_runs(bw, trans, columns)
            ref = trans + [columns, columns]
    if end_of_block:
        if k < 0:
            bw.write(EOL + EOL)  # EOFB
        elif k == 0:
            for _ in range(6):  # RTC
                bw.write(EOL)
        else:
            for _ in range(6):
                bw.write(EOL + "1")
    return bw.tobytes()


def _encode_1d_runs(bw: _BitWriter, trans: list[int], columns: int) -> None:
    pos = 0
    white = True
    for t in trans + [columns]:
        _write_run(bw, t - pos, white)
        pos = t
        white = not white
        if pos >= columns:
            break
    # a row whose last transition lands exactly on columns still needs
    # its implicit zero-length final run? No: runs partition the row;
    # the loop above emits through the final boundary.
