"""Pure-Python baseline JPEG (ITU-T T.81) codec for the multimodal path.

The reference rejects ``DCTDecode`` outright (src/filtering.rs:50-53 -
image codecs are out of its text-extraction scope), and this container
has no codec library - but JPEG is the most common image format in
crawls, so ``decode_jpeg`` implements baseline sequential DCT for real:
marker parse (DQT/DHT/SOF0/DRI/SOS), canonical Huffman entropy decode
with byte unstuffing and restart markers, dequantize + dezigzag,
float64 IDCT (orthonormal DCT-II basis, exact to rounding), nearest
upsampling of subsampled chroma, and BT.601 YCbCr->RGB.  Grayscale and
3-component scans with any baseline sampling grid (4:4:4, 4:2:2, 4:2:0)
are covered; progressive (SOF2), arithmetic coding and 12-bit precision
raise ``NotImplementedError`` - ``jpeg_dimensions`` still recovers
width/height from ANY SOFn header so those rows keep their metadata.

``encode_jpeg`` is the deterministic fixture twin (genimg-style): same
pipeline forward, canonical single-length Huffman tables built so the
all-ones codeword stays unused.  Constant-color images round-trip
EXACTLY (DC-only blocks, quantizer 1); gradients round-trip within
quantization tolerance - both pinned in tests/test_multimodal_decode.py.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed JPEG payload - contained into the error column."""


# --- shared tables -----------------------------------------------------------

def _zigzag() -> list[int]:
    """Natural-order index for each zigzag position (generated, not
    transcribed)."""
    order = sorted(((r + c, (c, r) if (r + c) % 2 else (r, c))
                    for r in range(8) for c in range(8)))
    return [r * 8 + c for _, (r, c) in order]


ZIGZAG = _zigzag()  # zigzag position -> natural index

_COS = np.array([[np.cos((2 * n + 1) * k * np.pi / 16) for n in range(8)]
                 for k in range(8)])
_DCT = _COS * np.sqrt(2 / 8)
_DCT[0] = np.sqrt(1 / 8)  # orthonormal DCT-II basis rows


def idct2(block: np.ndarray) -> np.ndarray:
    return _DCT.T @ block @ _DCT


def dct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _ycbcr_from_rgb(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def _rgb_from_ycbcr(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)


# --- Huffman -----------------------------------------------------------------

class _HuffTable:
    """Canonical JPEG Huffman table from the DHT (bits, symbols) form."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if k >= len(symbols):
                    raise JpegError("DHT symbol underrun")
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        self.max_len = max((ln for ln, _ in self.lookup), default=0)


class _BitReader:
    """Entropy-segment bit reader: FF00 unstuffing, RSTn awareness."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise JpegError("entropy segment truncated")
        byte = b[self.pos]
        if byte == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise JpegError("hit restart marker mid-symbol")
            else:
                # EOI or another marker: the stream ran dry; pad with 1s
                # like every decoder (trailing EOB may be elided)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        out = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return out

    def huff(self, table: _HuffTable) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker at a byte boundary; reset bit state."""
        self.acc = 0
        self.n = 0
        b = self.buf
        if (self.pos + 1 < len(b) and b[self.pos] == 0xFF
                and 0xD0 <= b[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise JpegError("expected restart marker")


def _extend(value: int, size: int) -> int:
    """T.81 EXTEND: map the ``size``-bit amplitude to its signed value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# --- marker-level parse ------------------------------------------------------

_SOF_ALL = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _segments(buf: bytes):
    """Yield (marker, payload, payload_pos); stops at SOS or EOI."""
    if buf[:2] != b"\xff\xd8":
        raise JpegError("bad SOI")
    pos = 2
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise JpegError(f"marker desync at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            return
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        payload = buf[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise JpegError("truncated segment")
        yield marker, payload, pos + 4
        pos += 2 + length
        if marker == 0xDA:  # SOS: entropy data follows, caller takes over
            return
    raise JpegError("ran off the end before SOS/EOI")


def jpeg_dimensions(buf: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the first SOFn header - works
    for progressive/arithmetic files the full decoder rejects."""
    for marker, payload, _ in _segments(buf):
        if marker in _SOF_ALL:
            if len(payload) < 6:
                raise JpegError("short SOF")
            _prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            return w, h, nc
    raise JpegError("no SOF marker")


# --- decoder -----------------------------------------------------------------

def decode_jpeg(buf: bytes) -> tuple[int, int, bytes]:
    """Baseline JPEG -> (width, height, interleaved 8-bit samples);
    1 component stays grayscale, 3 components convert YCbCr->RGB."""
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    scan = None
    for marker, payload, ppos in _segments(buf):
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(payload[i : i + 64],
                                         dtype=np.uint8).astype(np.int32)
                    i += 64
                elif pq == 1:
                    vals = np.frombuffer(payload[i : i + 128],
                                         dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    raise JpegError(f"DQT precision {pq}")
                if len(vals) != 64:
                    raise JpegError("short DQT")
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = vals
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0x0F
                counts = list(payload[i + 1 : i + 17])
                total = sum(counts)
                syms = payload[i + 17 : i + 17 + total]
                if len(syms) != total:
                    raise JpegError("short DHT")
                htables[(tc, th)] = _HuffTable(counts, syms)
                i += 17 + total
        elif marker in _SOF_ALL:
            if marker == 0xC2:
                raise NotImplementedError("progressive JPEG")
            if marker != 0xC0 and marker != 0xC1:
                raise NotImplementedError(f"JPEG SOF{marker - 0xC0}")
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG {nc}-component")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", payload, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            if frame is None:
                raise JpegError("SOS before SOF")
            if ns != len(frame["comps"]):
                raise NotImplementedError("multi-scan JPEG")
            sel = {}
            for s in range(ns):
                cs, tdta = payload[1 + 2 * s], payload[2 + 2 * s]
                sel[cs] = (tdta >> 4, tdta & 0x0F)
            scan = (sel, ppos + len(payload))
    if frame is None or scan is None:
        raise JpegError("missing SOF/SOS")
    sel, data_pos = scan
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise JpegError("bad dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise JpegError("bad sampling factors")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        if c["id"] not in sel:
            raise JpegError("scan/frame component mismatch")
        td, ta = sel[c["id"]]
        c["dc"] = htables.get((0, td))
        c["ac"] = htables.get((1, ta))
        c["q"] = qtables.get(c["tq"])
        if c["dc"] is None or c["ac"] is None or c["q"] is None:
            raise JpegError("missing DHT/DQT table")
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    reader = _BitReader(buf, data_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int32)
                        size = reader.huff(c["dc"])
                        if size > 11:
                            raise JpegError("DC size out of range")
                        pred[ci] += _extend(reader.bits(size), size)
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(c["ac"])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC index overflow")
                            coeffs[ZIGZAG[k]] = _extend(reader.bits(s), s)
                            k += 1
                        block = idct2((coeffs.reshape(8, 8)
                                       * c["q"]).astype(np.float64)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    stacked = np.stack(out_planes, axis=-1)
    if len(comps) == 3:
        stacked = _rgb_from_ycbcr(stacked)
    samples = np.clip(np.rint(stacked), 0, 255).astype(np.uint8)
    return w, h, samples.tobytes()


# --- encoder (deterministic fixture twin) ------------------------------------

def _canonical_single_length(symbols: list[int]) -> tuple[list[int], bytes]:
    """All symbols at one length L with 2^L > n, so the all-ones code is
    never assigned (T.81 writers avoid it; keeps padding unambiguous)."""
    n = len(symbols)
    length = max(2, (n + 1).bit_length())
    counts = [0] * 16
    counts[length - 1] = n
    return counts, bytes(symbols)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, k: int) -> None:
        self.acc = (self.acc << k) | (value & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.bits((1 << pad) - 1, pad)


def _size_of(v: int) -> int:
    return abs(v).bit_length()


def encode_jpeg(width: int, height: int, pixels: bytes, *,
                gray: bool = False, subsampling: str = "444",
                quant: int = 1, restart_interval: int = 0) -> bytes:
    """Deterministic baseline JPEG from 8-bit samples (RGB or gray).

    ``quant`` fills both quantizer tables uniformly: 1 keeps DCT
    coefficients to rounding precision (constant-color images become
    exact), larger values exercise real quantization loss."""
    nc = 1 if gray else 3
    if len(pixels) != width * height * nc:
        raise ValueError("pixel buffer size mismatch")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, nc).astype(np.float64)
    if gray:
        planes = [arr[..., 0]]
        samp = [(1, 1)]
    else:
        ycc = _ycbcr_from_rgb(arr)
        if subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "422":
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsampling {subsampling}")
        planes = [ycc[..., 0]]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        for ci in (1, 2):
            p = ycc[..., ci]
            fy, fx = vmax // samp[ci][1], hmax // samp[ci][0]
            if fy > 1 or fx > 1:
                py = ((height + fy - 1) // fy) * fy
                px = ((width + fx - 1) // fx) * fx
                padded = np.pad(p, ((0, py - height), (0, px - width)),
                                mode="edge")
                p = padded.reshape(py // fy, fy, px // fx, fx).mean((1, 3))
            planes.append(p)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    q = np.full((8, 8), quant, dtype=np.int32)
    # pad every plane to its MCU-aligned size (edge replicate)
    padded = []
    for (hs, vs), p in zip(samp, planes):
        ty, tx = mcuy * vs * 8, mcux * hs * 8
        padded.append(np.pad(p, ((0, ty - p.shape[0]), (0, tx - p.shape[1])),
                             mode="edge"))
    # quantized coefficient blocks per component, MCU-interleaved order
    dc_syms: list[list[int]] = [[] for _ in samp]
    mcus: list[list[tuple[int, np.ndarray]]] = []
    pred = [0] * len(samp)
    for my in range(mcuy):
        for mx in range(mcux):
            mcu = []
            for ci, ((hs, vs), p) in enumerate(zip(samp, padded)):
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coeffs = np.rint(dct2(block) / q).astype(np.int32)
                        mcu.append((ci, coeffs))
            mcus.append(mcu)
    # one shared DC and one shared AC table over the actual symbol sets
    ac_set: set[int] = set()
    dc_set: set[int] = set()
    sim_pred = [0] * len(samp)
    count = 0
    for mcu in mcus:
        if restart_interval and count and count % restart_interval == 0:
            sim_pred = [0] * len(samp)
        for ci, coeffs in mcu:
            flat = coeffs.reshape(64)
            dc_set.add(_size_of(int(flat[0]) - sim_pred[ci]))
            sim_pred[ci] = int(flat[0])
            zz = [int(flat[i]) for i in ZIGZAG]
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_set.add(0xF0)
                    run -= 16
                ac_set.add((run << 4) | _size_of(zz[k]))
                run = 0
            if run:
                ac_set.add(0x00)  # EOB
        count += 1
    if not ac_set:
        ac_set.add(0x00)
    dc_counts, dc_symbols = _canonical_single_length(sorted(dc_set))
    ac_counts, ac_symbols = _canonical_single_length(sorted(ac_set))
    dc_table = _HuffTable(dc_counts, dc_symbols)
    ac_table = _HuffTable(ac_counts, ac_symbols)
    dc_code = {sym: (ln, code) for (ln, code), sym in dc_table.lookup.items()}
    ac_code = {sym: (ln, code) for (ln, code), sym in ac_table.lookup.items()}

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(payload) + 2) + payload)

    zz_q = np.empty(64, dtype=np.int32)
    zz_q[:] = q.reshape(64)[ZIGZAG]
    seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_q))
    sof = bytearray(struct.pack(">BHHB", 8, height, width, nc))
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    seg(0xC0, bytes(sof))
    seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_symbols)
    seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_symbols)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    writer = _BitWriter()
    pred = [0] * len(samp)
    count = 0
    rst = 0
    for mcu in mcus:
        if restart_interval and count and count % restart_interval == 0:
            writer.flush()
            out.extend(writer.out)
            writer = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + rst]))
            rst = (rst + 1) & 7
            pred = [0] * len(samp)
        for ci, coeffs in mcu:
            flat = coeffs.reshape(64)
            diff = int(flat[0]) - pred[ci]
            pred[ci] = int(flat[0])
            size = _size_of(diff)
            ln, code = dc_code[size]
            writer.bits(code, ln)
            if size:
                amp = diff if diff > 0 else diff + (1 << size) - 1
                writer.bits(amp, size)
            zz = [int(flat[i]) for i in ZIGZAG]
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_code[0xF0]
                    writer.bits(code, ln)
                    run -= 16
                size = _size_of(zz[k])
                ln, code = ac_code[(run << 4) | size]
                writer.bits(code, ln)
                v = zz[k]
                amp = v if v > 0 else v + (1 << size) - 1
                writer.bits(amp, size)
                run = 0
            if run:
                ln, code = ac_code[0x00]
                writer.bits(code, ln)
        count += 1
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
