"""Lossy WebP (VP8 key frame) decoder - RFC 6386, pure Python/numpy.

The majority of crawl WebP is lossy VP8 (the reference rejects ALL WebP,
/root/reference/src/filtering.rs:50 - this module is beyond-reference
surface).  Everything a still-image key frame needs is here: the
boolean arithmetic decoder (RFC 6386 7), frame/segment/filter/quant
headers (9), keyframe intra-mode parsing with the tree-coded B modes
(11), token decoding over the four plane types with band/context
conditioning (13), dequantization (14.1), the 4x4 inverse DCT and the
Walsh-Hadamard transform for the Y2 block (14.3-14.4), all intra
predictors (16x16, chroma 8x8, and the ten 4x4 B modes, 12.2-12.3),
and the in-loop deblocking filter, both normal and simple profiles
(15).  Inter-frame features (motion vectors, golden/altref) do not
occur in still WebP and raise Vp8Error.

Probability/dequant constants live in ``_vp8_tables`` (normative RFC
6386 values).  Correctness gate: tests/test_vp8.py decodes REAL
libwebp-encoded bitstreams and compares Y/U/V planes byte-exact
against libwebp's own decoder (ctypes, tests only - the decoder here
is dependency-free), plus the repo's encoder-twin goldens
(``encode_vp8``) and containment fuzz.

Output is (width, height, rgb_bytes) via the repo's standard BT.601
full-range conversion (shared with functions/jpeg.py) with nearest
chroma upsampling - documented conversion, deterministic across
platforms.
"""

from __future__ import annotations

import struct

import numpy as np

from ._vp8_tables import (
    AC_QLOOKUP, COEFF_UPDATE_PROBS, DC_QLOOKUP, DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
)


class Vp8Error(ValueError):
    pass


# --- mode enums (RFC 6386 order) -------------------------------------------
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED, B_RD_PRED,
 B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (-B_DC_PRED, 2, -B_TM_PRED, 4, -B_VE_PRED, 6, 8, 12,
              -B_HE_PRED, 10, -B_RD_PRED, -B_VR_PRED, -B_LD_PRED, 14,
              -B_VL_PRED, 16, -B_HD_PRED, -B_HU_PRED)
SEGMENT_TREE = (2, 4, -0, -1, -2, -3)
# 16x16 mode -> equivalent B mode for B-mode context at MB borders
MODE_TO_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                 H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
# DCT value categories: (base value, extra-bit probabilities)
CAT_PROBS = (
    (5, (159,)),
    (7, (165, 145)),
    (11, (173, 148, 140)),
    (19, (176, 155, 140, 135)),
    (35, (180, 157, 141, 134, 130)),
    (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
)


class BoolDecoder:
    """RFC 6386 section 7 boolean arithmetic decoder."""

    __slots__ = ("data", "pos", "value", "range", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.value = (data[0] << 8 | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0)
        self.pos = 2
        self.range = 255
        self.bits = 0

    def read_bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read_bool(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _idct4x4(b):
    t = [0] * 16
    for i in range(4):
        ip0, ip4, ip8, ip12 = b[i], b[i + 4], b[i + 8], b[i + 12]
        a1 = ip0 + ip8
        b1 = ip0 - ip8
        c1 = ((ip4 * 35468) >> 16) - (ip12 + ((ip12 * 20091) >> 16))
        d1 = (ip4 + ((ip4 * 20091) >> 16)) + ((ip12 * 35468) >> 16)
        t[i] = a1 + d1
        t[i + 12] = a1 - d1
        t[i + 4] = b1 + c1
        t[i + 8] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        ip0, ip1, ip2, ip3 = t[r], t[r + 1], t[r + 2], t[r + 3]
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        c1 = ((ip1 * 35468) >> 16) - (ip3 + ((ip3 * 20091) >> 16))
        d1 = (ip1 + ((ip1 * 20091) >> 16)) + ((ip3 * 35468) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(b):
    t = [0] * 16
    for i in range(4):
        a1 = b[i] + b[12 + i]
        b1 = b[4 + i] + b[8 + i]
        c1 = b[4 + i] - b[8 + i]
        d1 = b[i] - b[12 + i]
        t[i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


def _decode_block(bd: BoolDecoder, probs, first: int, ctx: int,
                  dq_dc: int, dq_ac: int):
    """Token-decode one 4x4 block -> (coeffs[16] raster order, nonzero).

    ``probs``: the [band][ctx][11] table for this plane type; ``ctx``
    the above+left nonzero context (0..2); ``first`` 0 or 1 (Y blocks
    of i16 MBs skip the DC position - it lives in Y2)."""
    coeffs = [0] * 16
    n = first
    nonzero = False
    skip_eob = False
    while n < 16:
        p = probs[COEFF_BANDS[n]][ctx]
        if not skip_eob and not bd.read_bool(p[0]):
            break
        if not bd.read_bool(p[1]):          # ZERO
            ctx = 0
            skip_eob = True
            n += 1
            continue
        skip_eob = False
        if not bd.read_bool(p[2]):          # ONE
            v = 1
            ctx = 1
        else:
            ctx = 2
            if not bd.read_bool(p[3]):      # 2 / 3 / 4
                if not bd.read_bool(p[4]):
                    v = 2
                else:
                    v = 3 + bd.read_bool(p[5])
            elif not bd.read_bool(p[6]):    # cat1 / cat2
                base, cps = CAT_PROBS[0 if not bd.read_bool(p[7]) else 1]
                extra = 0
                for cp in cps:
                    extra = (extra << 1) | bd.read_bool(cp)
                v = base + extra
            elif not bd.read_bool(p[8]):    # cat3 / cat4
                base, cps = CAT_PROBS[2 if not bd.read_bool(p[9]) else 3]
                extra = 0
                for cp in cps:
                    extra = (extra << 1) | bd.read_bool(cp)
                v = base + extra
            else:                           # cat5 / cat6
                base, cps = CAT_PROBS[4 if not bd.read_bool(p[10]) else 5]
                extra = 0
                for cp in cps:
                    extra = (extra << 1) | bd.read_bool(cp)
                v = base + extra
        if bd.read_bool(128):
            v = -v
        coeffs[ZIGZAG[n]] = v * (dq_dc if n == 0 else dq_ac)
        nonzero = True
        n += 1
    return coeffs, nonzero


# --- intra predictors -------------------------------------------------------

def _pred_dc(above, left, have_a, have_l, size):
    if have_a and have_l:
        dc = (int(above.sum()) + int(left.sum()) + size) >> (
            5 if size == 16 else 4)
    elif have_a:
        dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    elif have_l:
        dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return np.full((size, size), dc, dtype=np.int32)


def _pred_tm(above, left, tl, size):
    a = above.astype(np.int32)[None, :]
    l_ = left.astype(np.int32)[:, None]
    return np.clip(l_ + a - int(tl), 0, 255)


def _pred_mb(mode, above, left, tl, have_a, have_l, size):
    if mode == DC_PRED:
        return _pred_dc(above, left, have_a, have_l, size)
    if mode == V_PRED:
        return np.repeat(above.astype(np.int32)[None, :], size, axis=0)
    if mode == H_PRED:
        return np.repeat(left.astype(np.int32)[:, None], size, axis=1)
    return _pred_tm(above, left, tl, size)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_b(mode, a, l_, tl, tr):
    """4x4 B-mode predictor (RFC 6386 12.3).  ``a``/``l_`` are the 4
    above/left pixels, ``tl`` the above-left, ``tr`` the 4
    above-right; all ints."""
    p = [[0] * 4 for _ in range(4)]
    A0, A1, A2, A3 = a
    L0, L1, L2, L3 = l_
    T0, T1, T2, T3 = tr
    X = tl
    if mode == B_DC_PRED:
        dc = (A0 + A1 + A2 + A3 + L0 + L1 + L2 + L3 + 4) >> 3
        return [[dc] * 4 for _ in range(4)]
    if mode == B_TM_PRED:
        for r in range(4):
            lr = (L0, L1, L2, L3)[r]
            for c in range(4):
                v = lr + (A0, A1, A2, A3)[c] - X
                p[r][c] = 0 if v < 0 else (255 if v > 255 else v)
        return p
    if mode == B_VE_PRED:
        row = [_avg3(X, A0, A1), _avg3(A0, A1, A2), _avg3(A1, A2, A3),
               _avg3(A2, A3, T0)]
        return [row[:] for _ in range(4)]
    if mode == B_HE_PRED:
        col = [_avg3(X, L0, L1), _avg3(L0, L1, L2), _avg3(L1, L2, L3),
               _avg3(L2, L3, L3)]
        return [[col[r]] * 4 for r in range(4)]
    if mode == B_LD_PRED:
        e = (A0, A1, A2, A3, T0, T1, T2, T3)
        for r in range(4):
            for c in range(4):
                i = r + c
                p[r][c] = (_avg3(e[i], e[i + 1], e[i + 2]) if i < 6
                           else _avg3(e[6], e[7], e[7]))
        return p
    if mode == B_RD_PRED:
        e = (L3, L2, L1, L0, X, A0, A1, A2, A3)
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                p[r][c] = _avg3(e[i - 1], e[i], e[i + 1])
        return p
    if mode == B_VR_PRED:
        p[0] = [_avg2(X, A0), _avg2(A0, A1), _avg2(A1, A2), _avg2(A2, A3)]
        p[1] = [_avg3(L0, X, A0), _avg3(X, A0, A1), _avg3(A0, A1, A2),
                _avg3(A1, A2, A3)]
        p[2] = [_avg3(X, L0, L1)] + p[0][:3]
        p[3] = [_avg3(L0, L1, L2)] + p[1][:3]
        return p
    if mode == B_VL_PRED:
        p[0] = [_avg2(A0, A1), _avg2(A1, A2), _avg2(A2, A3), _avg2(A3, T0)]
        p[1] = [_avg3(A0, A1, A2), _avg3(A1, A2, A3), _avg3(A2, A3, T0),
                _avg3(A3, T0, T1)]
        p[2] = p[0][1:] + [_avg3(T0, T1, T2)]
        p[3] = p[1][1:] + [_avg3(T1, T2, T3)]
        return p
    if mode == B_HD_PRED:
        p[0] = [_avg2(X, L0), _avg3(A0, X, L0), _avg3(A1, A0, X),
                _avg3(A2, A1, A0)]
        p[1] = [_avg2(L0, L1), _avg3(X, L0, L1)] + p[0][:2]
        p[2] = [_avg2(L1, L2), _avg3(L0, L1, L2)] + p[1][:2]
        p[3] = [_avg2(L2, L3), _avg3(L1, L2, L3)] + p[2][:2]
        return p
    # B_HU_PRED
    p[0] = [_avg2(L0, L1), _avg3(L0, L1, L2), _avg2(L1, L2),
            _avg3(L1, L2, L3)]
    p[1] = [p[0][2], p[0][3], _avg2(L2, L3), _avg3(L2, L3, L3)]
    p[2] = [p[1][2], p[1][3], L3, L3]
    p[3] = [L3] * 4
    return p


# --- header parsing ---------------------------------------------------------

class _FrameHeader:
    pass


def _parse_header(payload: bytes, max_pixels: int):
    h = _FrameHeader()
    if len(payload) < 10:
        raise Vp8Error("VP8 payload too short")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise Vp8Error("not a key frame (still WebP is always intra)")
    h.version = (tag >> 1) & 7
    h.part1_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("bad VP8 keyframe start code")
    w16, h16 = struct.unpack_from("<HH", payload, 6)
    h.width = w16 & 0x3FFF
    h.height = h16 & 0x3FFF
    if h.width < 1 or h.height < 1:
        raise Vp8Error("bad VP8 dimensions")
    if h.width * h.height > max_pixels:
        raise Vp8Error(
            f"image {h.width}x{h.height} exceeds max_pixels bound")
    if 10 + h.part1_size > len(payload):
        raise Vp8Error("truncated first partition")
    bd = BoolDecoder(payload[10 : 10 + h.part1_size])
    h.color_space = bd.read_bool(128)
    h.clamping = bd.read_bool(128)
    if h.color_space != 0:
        raise Vp8Error("reserved color space")

    # segmentation (RFC 6386 9.3)
    h.seg_enabled = bd.read_bool(128)
    h.seg_update_map = 0
    h.seg_abs = 0
    h.seg_q = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_probs = [255, 255, 255]
    if h.seg_enabled:
        h.seg_update_map = bd.read_bool(128)
        update_data = bd.read_bool(128)
        if update_data:
            h.seg_abs = bd.read_bool(128)
            for i in range(4):
                if bd.read_bool(128):
                    h.seg_q[i] = bd.read_signed(7)
            for i in range(4):
                if bd.read_bool(128):
                    h.seg_lf[i] = bd.read_signed(6)
        if h.seg_update_map:
            for i in range(3):
                if bd.read_bool(128):
                    h.seg_probs[i] = bd.read_literal(8)

    # loop filter (9.4)
    h.filter_simple = bd.read_bool(128)
    h.filter_level = bd.read_literal(6)
    h.sharpness = bd.read_literal(3)
    h.lf_delta_enabled = bd.read_bool(128)
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.read_bool(128):  # update
            for i in range(4):
                if bd.read_bool(128):
                    h.ref_lf_delta[i] = bd.read_signed(6)
            for i in range(4):
                if bd.read_bool(128):
                    h.mode_lf_delta[i] = bd.read_signed(6)

    # token partitions (9.5)
    h.n_parts = 1 << bd.read_literal(2)

    # quantizers (9.6)
    h.y_ac_qi = bd.read_literal(7)
    h.y_dc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.y2_dc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.y2_ac_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.uv_dc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    h.uv_ac_delta = bd.read_signed(4) if bd.read_bool(128) else 0

    h.refresh_entropy = bd.read_bool(128)

    # coefficient probability updates (13.4)
    h.coeff_probs = [[[list(DEFAULT_COEFF_PROBS[t][b][c])
                       for c in range(3)] for b in range(8)]
                     for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                up = COEFF_UPDATE_PROBS[t][b][c]
                row = h.coeff_probs[t][b][c]
                for k in range(11):
                    if bd.read_bool(up[k]):
                        row[k] = bd.read_literal(8)

    h.mb_no_skip = bd.read_bool(128)
    h.prob_skip = bd.read_literal(8) if h.mb_no_skip else 0
    return h, bd


def _dequant_factors(h):
    """Per-segment (y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac)."""
    out = []
    for seg in range(4):
        if h.seg_enabled:
            q = h.seg_q[seg] if h.seg_abs else h.y_ac_qi + h.seg_q[seg]
        else:
            q = h.y_ac_qi
        q = _clamp_q(q)
        y1dc = DC_QLOOKUP[_clamp_q(q + h.y_dc_delta)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + h.y2_dc_delta)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + h.y2_ac_delta)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + h.uv_dc_delta)]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_q(q + h.uv_ac_delta)]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


# --- loop filter ------------------------------------------------------------

def _lf_params(level: int, sharpness: int, keyframe: bool = True):
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev = 0
    if level >= 40:
        hev = 2
    elif level >= 15:
        hev = 1
    mb_limit = ((level + 2) * 2) + interior
    sub_limit = (level * 2) + interior
    return interior, hev, mb_limit, sub_limit


def _sclip(x):
    return np.clip(x, -128, 127)


def _filter_edge_normal(seg, mb_edge, limit, interior, hev_t):
    """Normal loop filter on one edge.  ``seg``: int32 array (n, 8)
    holding p3 p2 p1 p0 q0 q1 q2 q3 per filtered position; edits in
    place."""
    p3, p2, p1, p0 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    q0, q1, q2, q3 = seg[:, 4], seg[:, 5], seg[:, 6], seg[:, 7]
    mask = ((np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= limit)
            & (np.abs(p3 - p2) <= interior) & (np.abs(p2 - p1) <= interior)
            & (np.abs(p1 - p0) <= interior) & (np.abs(q1 - q0) <= interior)
            & (np.abs(q2 - q1) <= interior) & (np.abs(q3 - q2) <= interior))
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    # signed domain
    sp1, sp0 = p1 - 128, p0 - 128
    sq0, sq1 = q0 - 128, q1 - 128
    w_hev = _sclip(_sclip(sp1 - sq1) + 3 * (sq0 - sp0))
    w_no = _sclip(3 * (sq0 - sp0))
    if mb_edge:
        # non-hev: 27/18/9 taps on p2..q2
        sp2, sq2 = p2 - 128, q2 - 128
        a27 = _sclip((27 * w_hev + 63) >> 7)
        a18 = _sclip((18 * w_hev + 63) >> 7)
        a9 = _sclip((9 * w_hev + 63) >> 7)
        f1 = _sclip(w_hev + 4) >> 3
        f2 = _sclip(w_hev + 3) >> 3
        use = mask & hev
        q0[use] = (_sclip(sq0 - f1) + 128)[use]
        p0[use] = (_sclip(sp0 + f2) + 128)[use]
        use = mask & ~hev
        q0[use] = (_sclip(sq0 - a27) + 128)[use]
        p0[use] = (_sclip(sp0 + a27) + 128)[use]
        q1[use] = (_sclip(sq1 - a18) + 128)[use]
        p1[use] = (_sclip(sp1 + a18) + 128)[use]
        q2[use] = (_sclip(sq2 - a9) + 128)[use]
        p2[use] = (_sclip(sp2 + a9) + 128)[use]
    else:
        w = np.where(hev, w_hev, w_no)
        f1 = _sclip(w + 4) >> 3
        f2 = _sclip(w + 3) >> 3
        nq0 = _sclip(sq0 - f1) + 128
        np0 = _sclip(sp0 + f2) + 128
        a = (f1 + 1) >> 1
        nq1 = _sclip(sq1 - a) + 128
        np1 = _sclip(sp1 + a) + 128
        q0[mask] = nq0[mask]
        p0[mask] = np0[mask]
        use = mask & ~hev
        q1[use] = nq1[use]
        p1[use] = np1[use]


def _filter_edge_simple(seg, limit):
    p1, p0 = seg[:, 2], seg[:, 3]
    q0, q1 = seg[:, 4], seg[:, 5]
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= limit
    sp1, sp0 = p1 - 128, p0 - 128
    sq0, sq1 = q0 - 128, q1 - 128
    w = _sclip(_sclip(sp1 - sq1) + 3 * (sq0 - sp0))
    f1 = _sclip(w + 4) >> 3
    f2 = _sclip(w + 3) >> 3
    q0[mask] = (_sclip(sq0 - f1) + 128)[mask]
    p0[mask] = (_sclip(sp0 + f2) + 128)[mask]


def _apply_edge(plane, x, y, n, vertical, fn):
    """Extract the 8-pixel-deep segment crossing the edge at (x, y) and
    write back after filtering.  ``vertical``: True = vertical edge
    (filter horizontally across columns x-4..x+3, rows y..y+n)."""
    if vertical:
        seg = plane[y : y + n, x - 4 : x + 4].astype(np.int32)
        fn(seg)
        plane[y : y + n, x - 4 : x + 4] = seg.astype(np.uint8)
    else:
        seg = plane[y - 4 : y + 4, x : x + n].T.astype(np.int32).copy()
        fn(seg)
        plane[y - 4 : y + 4, x : x + n] = seg.T.astype(np.uint8)


def _loop_filter(h, planes, mb_info, mb_w, mb_h):
    """In-loop deblocking (RFC 6386 15), after full-frame recon."""
    Y, U, V = planes
    for mby in range(mb_h):
        for mbx in range(mb_w):
            level, is_b, has_coeffs = mb_info[mby][mbx]
            if level == 0:
                continue
            interior, hev_t, mb_lim, sub_lim = _lf_params(
                level, h.sharpness)
            inner = is_b or has_coeffs
            if h.filter_simple:
                def mb_e(seg):
                    _filter_edge_simple(seg, mb_lim)

                def sub_e(seg):
                    _filter_edge_simple(seg, sub_lim)
                if mbx > 0:
                    _apply_edge(Y, mbx * 16, mby * 16, 16, True, mb_e)
                if inner:
                    for c in (4, 8, 12):
                        _apply_edge(Y, mbx * 16 + c, mby * 16, 16, True,
                                    sub_e)
                if mby > 0:
                    _apply_edge(Y, mbx * 16, mby * 16, 16, False, mb_e)
                if inner:
                    for r in (4, 8, 12):
                        _apply_edge(Y, mbx * 16, mby * 16 + r, 16, False,
                                    sub_e)
                continue

            def mb_e(seg):
                _filter_edge_normal(seg, True, mb_lim, interior, hev_t)

            def sub_e(seg):
                _filter_edge_normal(seg, False, sub_lim, interior, hev_t)
            if mbx > 0:
                _apply_edge(Y, mbx * 16, mby * 16, 16, True, mb_e)
                _apply_edge(U, mbx * 8, mby * 8, 8, True, mb_e)
                _apply_edge(V, mbx * 8, mby * 8, 8, True, mb_e)
            if inner:
                for c in (4, 8, 12):
                    _apply_edge(Y, mbx * 16 + c, mby * 16, 16, True, sub_e)
                _apply_edge(U, mbx * 8 + 4, mby * 8, 8, True, sub_e)
                _apply_edge(V, mbx * 8 + 4, mby * 8, 8, True, sub_e)
            if mby > 0:
                _apply_edge(Y, mbx * 16, mby * 16, 16, False, mb_e)
                _apply_edge(U, mbx * 8, mby * 8, 8, False, mb_e)
                _apply_edge(V, mbx * 8, mby * 8, 8, False, mb_e)
            if inner:
                for r in (4, 8, 12):
                    _apply_edge(Y, mbx * 16, mby * 16 + r, 16, False,
                                sub_e)
                _apply_edge(U, mbx * 8, mby * 8 + 4, 8, False, sub_e)
                _apply_edge(V, mbx * 8, mby * 8 + 4, 8, False, sub_e)


# --- main decode ------------------------------------------------------------

def decode_vp8(payload: bytes, max_pixels: int = 1 << 20,
               loop_filter: bool = True):
    """VP8 key-frame payload -> (width, height, Y, U, V numpy planes,
    cropped to the frame size; U/V are half-resolution).

    ``max_pixels`` (default 1M ~ 1024x1024) is BOTH the memory bomb
    guard and a CPU bound: the decode is pure Python at ~4s per 300k
    pixels, so a hostile 4MP header would burn ~a minute of executor
    CPU per row - the guard turns that into a contained Vp8Error while
    ``image_dimensions`` still recovers the metadata.  Raise it for
    trusted inputs."""
    h, bd = _parse_header(payload, max_pixels)
    mb_w = (h.width + 15) >> 4
    mb_h = (h.height + 15) >> 4

    # token partitions
    part_base = 10 + h.part1_size
    sizes = []
    pos = part_base
    for _ in range(h.n_parts - 1):
        if pos + 3 > len(payload):
            raise Vp8Error("truncated partition size table")
        sizes.append(payload[pos] | (payload[pos + 1] << 8)
                     | (payload[pos + 2] << 16))
        pos += 3
    parts = []
    for s in sizes:
        if pos + s > len(payload):
            raise Vp8Error("truncated token partition")
        parts.append(BoolDecoder(payload[pos : pos + s]))
        pos += s
    if pos > len(payload):
        raise Vp8Error("truncated token partition")
    parts.append(BoolDecoder(payload[pos:]))

    dq = _dequant_factors(h)

    # --- pass 1: per-MB mode records (all in partition 1) ---
    n_mbs = mb_w * mb_h
    seg_ids = [0] * n_mbs
    skips = [False] * n_mbs
    ymodes = [0] * n_mbs
    uvmodes = [0] * n_mbs
    bmodes = [None] * n_mbs  # 16 per MB when ymode == B_PRED
    above_bm = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for mby in range(mb_h):
        left_bm = [B_DC_PRED] * 4
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            if h.seg_update_map:
                seg_ids[i] = bd.read_tree(SEGMENT_TREE, h.seg_probs)
            if h.mb_no_skip:
                skips[i] = bool(bd.read_bool(h.prob_skip))
            ym = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[i] = ym
            if ym == B_PRED:
                bm = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    above = (bm[sb - 4] if r > 0 else above_bm[mbx][c])
                    left = (bm[sb - 1] if c > 0 else left_bm[r])
                    bm[sb] = bd.read_tree(
                        BMODE_TREE, KF_BMODE_PROBS[above][left])
                bmodes[i] = bm
                above_bm[mbx] = bm[12:16]
                left_bm = [bm[3], bm[7], bm[11], bm[15]]
            else:
                eq = MODE_TO_BMODE[ym]
                above_bm[mbx] = [eq] * 4
                left_bm = [eq] * 4
            uvmodes[i] = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

    # --- pass 2: residuals + reconstruction ---
    Y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)

    # nonzero contexts
    a_y = [[0] * 4 for _ in range(mb_w)]
    a_u = [[0] * 2 for _ in range(mb_w)]
    a_v = [[0] * 2 for _ in range(mb_w)]
    a_y2 = [0] * mb_w
    mb_info = [[None] * mb_w for _ in range(mb_h)]

    for mby in range(mb_h):
        td = parts[mby % h.n_parts]
        l_y = [0] * 4
        l_u = [0] * 2
        l_v = [0] * 2
        l_y2 = 0
        for mbx in range(mb_w):
            i = mby * mb_w + mbx
            ym = ymodes[i]
            is_b = ym == B_PRED
            has_y2 = not is_b
            seg = seg_ids[i]
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq[seg]
            blocks_y = [None] * 16
            y2_out = None
            mb_nonzero = False

            if skips[i]:
                l_y = [0] * 4
                a_y[mbx] = [0] * 4
                l_u = [0] * 2
                a_u[mbx] = [0] * 2
                l_v = [0] * 2
                a_v[mbx] = [0] * 2
                if has_y2:
                    l_y2 = 0
                    a_y2[mbx] = 0
            else:
                if has_y2:
                    ctx = a_y2[mbx] + l_y2
                    coeffs, nz = _decode_block(
                        td, h.coeff_probs[1], 0, ctx, y2dc, y2ac)
                    a_y2[mbx] = l_y2 = int(nz)
                    mb_nonzero |= nz
                    y2_out = _iwht4x4(coeffs)
                ptype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                nz_grid = [[0] * 4 for _ in range(4)]
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    anz = nz_grid[r - 1][c] if r > 0 else a_y[mbx][c]
                    lnz = nz_grid[r][c - 1] if c > 0 else l_y[r]
                    coeffs, nz = _decode_block(
                        td, h.coeff_probs[ptype], first, anz + lnz,
                        y1dc, y1ac)
                    if has_y2:
                        coeffs[0] = y2_out[sb]
                    blocks_y[sb] = coeffs
                    nz_grid[r][c] = int(nz)
                    mb_nonzero |= nz
                a_y[mbx] = nz_grid[3][:]
                l_y = [nz_grid[r][3] for r in range(4)]
                for plane_i, (a_c, l_c) in ((0, (a_u, l_u)),
                                            (1, (a_v, l_v))):
                    grid = [[0] * 2 for _ in range(2)]
                    blocks = [None] * 4
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        anz = grid[r - 1][c] if r > 0 else a_c[mbx][c]
                        lnz = grid[r][c - 1] if c > 0 else l_c[r]
                        coeffs, nz = _decode_block(
                            td, h.coeff_probs[2], 0, anz + lnz,
                            uvdc, uvac)
                        blocks[sb] = coeffs
                        grid[r][c] = int(nz)
                        mb_nonzero |= nz
                    a_c[mbx] = [grid[1][0], grid[1][1]]
                    if plane_i == 0:
                        l_u = [grid[0][1], grid[1][1]]
                        blocks_u = blocks
                    else:
                        l_v = [grid[0][1], grid[1][1]]
                        blocks_v = blocks
            if skips[i]:
                blocks_u = [None] * 4
                blocks_v = [None] * 4

            # --- reconstruction ---
            x0, y0 = mbx * 16, mby * 16
            have_a = mby > 0
            have_l = mbx > 0
            if is_b:
                tr_row = (Y[y0 - 1, x0 + 16 : x0 + 20].astype(np.int32)
                          if have_a and mbx < mb_w - 1 else None)
                if have_a and tr_row is None:
                    tr_row = np.full(4, int(Y[y0 - 1, mb_w * 16 - 1]),
                                     dtype=np.int32)
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    bx, by = x0 + c * 4, y0 + r * 4
                    a = (Y[by - 1, bx : bx + 4].astype(np.int32)
                         if by > 0 else np.full(4, 127, np.int32))
                    l_ = (Y[by : by + 4, bx - 1].astype(np.int32)
                          if bx > 0 else np.full(4, 129, np.int32))
                    if by > 0 and bx > 0:
                        tl = int(Y[by - 1, bx - 1])
                    elif by == 0:  # frame top (incl. corner)
                        tl = 127
                    else:          # frame left edge
                        tl = 129
                    if c < 3:
                        tr = (Y[by - 1, bx + 4 : bx + 8].astype(np.int32)
                              if by > 0 else np.full(4, 127, np.int32))
                    else:
                        if not have_a:
                            tr = np.full(4, 127, np.int32)
                        else:
                            tr = tr_row
                    pred = _pred_b(bmodes[i][sb], [int(v) for v in a],
                                   [int(v) for v in l_], tl,
                                   [int(v) for v in tr])
                    blk = blocks_y[sb]
                    if blk is not None and any(blk):
                        res = _idct4x4(blk)
                        out = [[0] * 4 for _ in range(4)]
                        for rr in range(4):
                            for cc in range(4):
                                v = pred[rr][cc] + res[4 * rr + cc]
                                out[rr][cc] = (0 if v < 0 else
                                               (255 if v > 255 else v))
                        Y[by : by + 4, bx : bx + 4] = np.array(
                            out, dtype=np.uint8)
                    else:
                        Y[by : by + 4, bx : bx + 4] = np.array(
                            pred, dtype=np.uint8)
            else:
                above = (Y[y0 - 1, x0 : x0 + 16] if have_a
                         else np.full(16, 127, np.uint8))
                left = (Y[y0 : y0 + 16, x0 - 1] if have_l
                        else np.full(16, 129, np.uint8))
                # border corner: the top fill (127) covers the corner
                # byte on the top row; left-column MBs see 129
                tl = (int(Y[y0 - 1, x0 - 1]) if have_a and have_l
                      else (129 if have_a else 127))
                pred = _pred_mb(ym, above, left, tl, have_a, have_l, 16)
                _add_residuals(Y, x0, y0, pred, blocks_y, 4)
            # chroma
            for plane, blocks, mode in ((U, blocks_u, uvmodes[i]),
                                        (V, blocks_v, uvmodes[i])):
                cx, cy = mbx * 8, mby * 8
                above = (plane[cy - 1, cx : cx + 8] if have_a
                         else np.full(8, 127, np.uint8))
                left = (plane[cy : cy + 8, cx - 1] if have_l
                        else np.full(8, 129, np.uint8))
                tl = (int(plane[cy - 1, cx - 1]) if have_a and have_l
                      else (129 if have_a else 127))
                pred = _pred_mb(mode, above, left, tl, have_a, have_l, 8)
                _add_residuals(plane, cx, cy, pred, blocks, 2)

            # loop-filter level for this MB
            if h.seg_enabled:
                lvl = (h.seg_lf[seg] if h.seg_abs
                       else h.filter_level + h.seg_lf[seg])
            else:
                lvl = h.filter_level
            if h.lf_delta_enabled:
                lvl += h.ref_lf_delta[0]
                if is_b:
                    lvl += h.mode_lf_delta[0]
            lvl = 0 if lvl < 0 else (63 if lvl > 63 else lvl)
            mb_info[mby][mbx] = (lvl, is_b, mb_nonzero)

    # gate on the PER-MB levels, not the frame header level: absolute
    # segment filter levels can be nonzero while filter_level is 0
    if loop_filter and any(info[0] > 0 for row in mb_info
                           for info in row):
        _loop_filter(h, (Y, U, V), mb_info, mb_w, mb_h)

    uv_w = (h.width + 1) >> 1
    uv_h = (h.height + 1) >> 1
    return (h.width, h.height, Y[: h.height, : h.width],
            U[:uv_h, :uv_w], V[:uv_h, :uv_w])


def _add_residuals(plane, x0, y0, pred, blocks, n):
    """Add per-4x4 IDCT residuals onto an (n*4, n*4) prediction and
    store clamped into the plane."""
    out = np.asarray(pred, dtype=np.int32)
    for sb in range(n * n):
        r, c = divmod(sb, n)
        blk = blocks[sb] if blocks else None
        if blk is not None and any(blk):
            res = np.array(_idct4x4(blk), dtype=np.int32).reshape(4, 4)
            out[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4] += res
    np.clip(out, 0, 255, out=out)
    plane[y0 : y0 + n * 4, x0 : x0 + n * 4] = out.astype(np.uint8)


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> bytes:
    """BT.601 full-range YUV420 -> interleaved RGB bytes (the repo's
    documented conversion, shared semantics with functions/jpeg.py);
    chroma upsampled by sample replication (deterministic, no fancy
    filter)."""
    h, w = y.shape
    u_full = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    v_full = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yy = y.astype(np.float64)
    cb = u_full.astype(np.float64) - 128.0
    cr = v_full.astype(np.float64) - 128.0
    r = yy + 1.402 * cr
    g = yy - 0.344136 * cb - 0.714136 * cr
    b = yy + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


def decode_webp_lossy(buf: bytes, max_pixels: int = 1 << 20):
    """WebP container with a VP8 (lossy) chunk -> (w, h, RGB bytes) -
    or RGBA when an ALPH chunk rides alongside (alpha is LOSSLESS in
    WebP: raw or headerless-VP8L coded, optionally filtered)."""
    payload = _find_vp8_chunk(buf)
    w, h, y, u, v = decode_vp8(payload, max_pixels=max_pixels)
    rgb = yuv420_to_rgb(y, u, v)
    alph = _find_alph_chunk(buf)
    if alph is None:
        return w, h, rgb
    alpha = _decode_alpha(alph, w, h)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., :3] = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    rgba[..., 3] = alpha
    return w, h, rgba.tobytes()


def _find_vp8_chunk(buf: bytes) -> bytes:
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise Vp8Error("not a WebP container")
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"VP8 ":
            return body
        if cid == b"ANMF" and len(body) > 16:
            inner = body[16:]
            ipos = 0
            while ipos + 8 <= len(inner):
                icid = inner[ipos : ipos + 4]
                isize = struct.unpack_from("<I", inner, ipos + 4)[0]
                if icid == b"VP8 ":
                    return inner[ipos + 8 : ipos + 8 + isize]
                ipos += 8 + isize + (isize & 1)
        pos += 8 + size + (size & 1)
    raise Vp8Error("no VP8 chunk")


# ---------------------------------------------------------------------------
# encoder twin
# ---------------------------------------------------------------------------

class BoolEncoder:
    """RFC 6386 boolean arithmetic encoder (the decoder's exact twin -
    pinned by a random-sequence roundtrip test)."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.count = -24
        self.out = bytearray()

    def write_bool(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        rng = self.range
        low = self.low
        if bit:
            low += split
            rng -= split
        else:
            rng = split
        shift = 0
        while rng < 128:   # renormalize
            rng <<= 1
            shift += 1
        count = self.count + shift
        if count >= 0:
            offset = shift - count
            if (low << (offset - 1)) & 0x80000000:
                # carry into already-emitted bytes
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                if i >= 0:
                    self.out[i] += 1
            self.out.append((low >> (24 - offset)) & 0xFF)
            low = (low << offset) & 0xFFFFFF
            shift = count
            count -= 8
        self.low = (low << shift) & 0xFFFFFFFF
        self.range = rng
        self.count = count

    def write_literal(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bool(128, (v >> i) & 1)

    def write_tree(self, tree, probs, value: int) -> None:
        path = self._tree_path(tree, value, 0)
        i = 0
        for bit in path:
            self.write_bool(probs[i >> 1], bit)
            i = tree[i + bit]

    @staticmethod
    def _tree_path(tree, value, i):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == -value and nxt <= 0:
                return [bit]
            if nxt > 0:
                sub = BoolEncoder._tree_path(tree, value, nxt)
                if sub is not None:
                    return [bit] + sub
        return None

    def finish(self) -> bytes:
        for _ in range(32):
            self.write_bool(128, 0)
        return bytes(self.out)


def _fwd_matrices():
    """Forward DCT/WHT as the float inverse of the integer inverse
    transforms (scaled x8), so encode->decode is self-consistent by
    construction."""
    def fidct(c):
        t = [0.0] * 16
        for i in range(4):
            ip0, ip4, ip8, ip12 = c[i], c[i + 4], c[i + 8], c[i + 12]
            a1 = ip0 + ip8
            b1 = ip0 - ip8
            c1 = ip4 * 35468 / 65536 - (ip12 + ip12 * 20091 / 65536)
            d1 = (ip4 + ip4 * 20091 / 65536) + ip12 * 35468 / 65536
            t[i] = a1 + d1
            t[i + 12] = a1 - d1
            t[i + 4] = b1 + c1
            t[i + 8] = b1 - c1
        out = [0.0] * 16
        for i in range(4):
            r = 4 * i
            ip0, ip1, ip2, ip3 = t[r], t[r + 1], t[r + 2], t[r + 3]
            a1 = ip0 + ip2
            b1 = ip0 - ip2
            c1 = ip1 * 35468 / 65536 - (ip3 + ip3 * 20091 / 65536)
            d1 = (ip1 + ip1 * 20091 / 65536) + ip3 * 35468 / 65536
            out[r] = a1 + d1
            out[r + 3] = a1 - d1
            out[r + 1] = b1 + c1
            out[r + 2] = b1 - c1
        return out

    def fiwht(c):
        t = [0.0] * 16
        for i in range(4):
            a1 = c[i] + c[12 + i]
            b1 = c[4 + i] + c[8 + i]
            c1 = c[4 + i] - c[8 + i]
            d1 = c[i] - c[12 + i]
            t[i] = a1 + b1
            t[4 + i] = c1 + d1
            t[8 + i] = a1 - b1
            t[12 + i] = d1 - c1
        out = [0.0] * 16
        for i in range(4):
            r = 4 * i
            a1 = t[r] + t[r + 3]
            b1 = t[r + 1] + t[r + 2]
            c1 = t[r + 1] - t[r + 2]
            d1 = t[r] - t[r + 3]
            out[r] = a1 + b1
            out[r + 1] = c1 + d1
            out[r + 2] = a1 - b1
            out[r + 3] = d1 - c1
        return out

    m_idct = np.array([fidct([1.0 if j == i else 0.0 for j in range(16)])
                       for i in range(16)]).T
    m_iwht = np.array([fiwht([1.0 if j == i else 0.0 for j in range(16)])
                       for i in range(16)]).T
    return np.linalg.inv(m_idct) * 8.0, np.linalg.inv(m_iwht) * 8.0


_FDCT_M, _FWHT_M = _fwd_matrices()


def _quantize(coeffs, dq_dc, dq_ac):
    """Truncate-toward-zero quantization -> integer qcoeffs (capped to
    the cat6 token range)."""
    q = [0] * 16
    for i in range(16):
        dq = dq_dc if i == 0 else dq_ac
        v = int(coeffs[i] / dq)  # trunc toward zero
        q[i] = max(-2047, min(2047, v))
    return q


def _write_coeffs(be, table, start_ctx, qcoeffs, first):
    """Token-encode one quantized block (exact mirror of
    ``_decode_block``'s read order).  ``table`` = probs[band][ctx][11]
    for the plane type, ``start_ctx`` the above+left nonzero context.
    Returns the nonzero flag."""
    zz = [qcoeffs[ZIGZAG[i]] for i in range(16)]
    last = -1
    for i in range(first, 16):
        if zz[i]:
            last = i
    cur = start_ctx
    prev_was_zero = False
    i = first
    while i < 16:
        p = table[COEFF_BANDS[i]][cur]
        if last < i:
            if not prev_was_zero:
                be.write_bool(p[0], 0)          # EOB
            break
        if not prev_was_zero:
            be.write_bool(p[0], 1)
        v = zz[i]
        av = abs(v)
        if av == 0:
            be.write_bool(p[1], 0)
            cur = 0
            prev_was_zero = True
            i += 1
            continue
        be.write_bool(p[1], 1)
        prev_was_zero = False
        if av == 1:
            be.write_bool(p[2], 0)
            cur = 1
        else:
            be.write_bool(p[2], 1)
            cur = 2
            if av <= 4:
                be.write_bool(p[3], 0)
                if av == 2:
                    be.write_bool(p[4], 0)
                else:
                    be.write_bool(p[4], 1)
                    be.write_bool(p[5], av - 3)
            else:
                be.write_bool(p[3], 1)
                for ci in range(6):
                    base, cps = CAT_PROBS[ci]
                    if av <= base + (1 << len(cps)) - 1 or ci == 5:
                        break
                if ci < 2:
                    be.write_bool(p[6], 0)
                    be.write_bool(p[7], ci & 1)
                elif ci < 4:
                    be.write_bool(p[6], 1)
                    be.write_bool(p[8], 0)
                    be.write_bool(p[9], ci & 1)
                else:
                    be.write_bool(p[6], 1)
                    be.write_bool(p[8], 1)
                    be.write_bool(p[10], ci & 1)
                base, cps = CAT_PROBS[ci]
                extra = av - base
                nb = len(cps)
                for k in range(nb):
                    be.write_bool(cps[k], (extra >> (nb - 1 - k)) & 1)
        be.write_bool(128, 1 if v < 0 else 0)
        i += 1
    return last >= first


def encode_vp8(width: int, height: int, rgb: bytes,
               qi: int = 12, n_parts: int = 1) -> bytes:
    """Deterministic lossy-WebP writer - ``decode_webp_lossy``'s twin
    (the repo-wide golden pattern).

    Intra-16x16 key frame: per-MB best-SAD luma mode (DC/V/H/TM over
    reconstructed borders), chroma DC, quantizer index ``qi``, loop
    filter level 0, ``n_parts`` token partitions (1/2/4/8 - MB row r
    writes to partition r % n_parts, per RFC 6386 9.5), default
    probabilities.  The
    encoder runs the decoder's own reconstruction (same predictors,
    same integer IDCT/IWHT), so its output is exactly what
    ``decode_vp8`` will produce - tests compare decode against the
    planes returned alongside the container.

    Returns (webp_bytes, (Y, U, V) reconstructed planes cropped)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length mismatch")
    if n_parts not in (1, 2, 4, 8):
        raise ValueError("n_parts must be 1/2/4/8")
    arr = np.frombuffer(rgb, np.uint8).reshape(height, width, 3)
    # BT.601 full-range RGB -> YUV (inverse of yuv420_to_rgb)
    r = arr[..., 0].astype(np.float64)
    g = arr[..., 1].astype(np.float64)
    b = arr[..., 2].astype(np.float64)
    yf = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 + (b - yf) / 1.772
    cr = 128.0 + (r - yf) / 1.402
    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4

    Ysrc = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    Ysrc[:height, :width] = np.clip(np.round(yf), 0, 255).astype(np.uint8)
    # edge-replicate into the padding so edge MBs predict sanely
    Ysrc[height:, :width] = Ysrc[height - 1 : height, :width]
    Ysrc[:, width:] = Ysrc[:, width - 1 : width]
    uvh, uvw = (height + 1) >> 1, (width + 1) >> 1
    cbp = np.clip(np.round(cb), 0, 255).astype(np.uint8)
    crp = np.clip(np.round(cr), 0, 255).astype(np.uint8)
    # 2x2 box downsample (pad odd dims by edge replication)
    cbe = np.pad(cbp, ((0, height & 1), (0, width & 1)), mode="edge")
    cre = np.pad(crp, ((0, height & 1), (0, width & 1)), mode="edge")
    Usrc = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    Vsrc = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    Usrc[:uvh, :uvw] = ((cbe[0::2, 0::2].astype(int)
                         + cbe[0::2, 1::2] + cbe[1::2, 0::2]
                         + cbe[1::2, 1::2] + 2) // 4).astype(np.uint8)
    Vsrc[:uvh, :uvw] = ((cre[0::2, 0::2].astype(int)
                         + cre[0::2, 1::2] + cre[1::2, 0::2]
                         + cre[1::2, 1::2] + 2) // 4).astype(np.uint8)
    Usrc[uvh:, :uvw] = Usrc[uvh - 1 : uvh, :uvw]
    Usrc[:, uvw:] = Usrc[:, uvw - 1 : uvw]
    Vsrc[uvh:, :uvw] = Vsrc[uvh - 1 : uvh, :uvw]
    Vsrc[:, uvw:] = Vsrc[:, uvw - 1 : uvw]

    qi = _clamp_q(qi)
    y1dc = DC_QLOOKUP[qi]
    y1ac = AC_QLOOKUP[qi]
    y2dc = DC_QLOOKUP[qi] * 2
    y2ac = max(8, AC_QLOOKUP[qi] * 155 // 100)
    uvdc = min(132, DC_QLOOKUP[qi])
    uvac = AC_QLOOKUP[qi]

    # recon planes (decoder-identical)
    Y = np.zeros_like(Ysrc)
    U = np.zeros_like(Usrc)
    V_ = np.zeros_like(Vsrc)

    coeff_probs = DEFAULT_COEFF_PROBS
    # partition 1 is ONE continuous arithmetic stream: header bits
    # first, then every MB's mode record
    be1 = BoolEncoder()
    be1.write_bool(128, 0)  # color space
    be1.write_bool(128, 0)  # clamping
    be1.write_bool(128, 0)  # segmentation disabled
    be1.write_bool(128, 0)  # filter type: normal
    be1.write_literal(6, 0)  # loop filter level 0
    be1.write_literal(3, 0)  # sharpness
    be1.write_bool(128, 0)  # lf deltas off
    be1.write_literal(2, n_parts.bit_length() - 1)  # log2 partitions
    be1.write_literal(7, qi)
    for _ in range(5):
        be1.write_bool(128, 0)  # no quant deltas
    be1.write_bool(128, 1)  # refresh entropy
    for t in range(4):
        for b_ in range(8):
            for c in range(3):
                for k in range(11):
                    be1.write_bool(COEFF_UPDATE_PROBS[t][b_][c][k], 0)
    be1.write_bool(128, 0)  # mb_no_skip off (all MBs code tokens)
    be_toks = [BoolEncoder() for _ in range(n_parts)]

    # nonzero contexts (mirror of decode)
    a_y = [[0] * 4 for _ in range(mb_w)]
    a_u = [[0] * 2 for _ in range(mb_w)]
    a_v = [[0] * 2 for _ in range(mb_w)]
    a_y2 = [0] * mb_w

    def fdct(res):
        return [int(x) for x in
                np.round(_FDCT_M @ np.asarray(res, float).ravel())]

    def fwht(dcs):
        return [int(x) for x in
                np.round(_FWHT_M @ np.asarray(dcs, float).ravel())]

    for mby in range(mb_h):
        be_tok = be_toks[mby % n_parts]
        l_y = [0] * 4
        l_u = [0] * 2
        l_v = [0] * 2
        l_y2 = 0
        for mbx in range(mb_w):
            x0, y0 = mbx * 16, mby * 16
            have_a = mby > 0
            have_l = mbx > 0
            above = (Y[y0 - 1, x0 : x0 + 16] if have_a
                     else np.full(16, 127, np.uint8))
            left = (Y[y0 : y0 + 16, x0 - 1] if have_l
                    else np.full(16, 129, np.uint8))
            tl = (int(Y[y0 - 1, x0 - 1]) if have_a and have_l
                  else (129 if have_a else 127))
            src = Ysrc[y0 : y0 + 16, x0 : x0 + 16].astype(np.int32)
            best, best_sad, best_pred = 0, None, None
            for mode in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pr = _pred_mb(mode, above, left, tl, have_a, have_l, 16)
                sad = int(np.abs(src - pr).sum())
                if best_sad is None or sad < best_sad:
                    best, best_sad, best_pred = mode, sad, pr
            ym = best
            pred = best_pred
            # forward transform all 16 Y blocks
            qblocks = []
            dcs = []
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                res = (src[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                       - pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4])
                coeffs = fdct(res)
                dcs.append(coeffs[0])
                q = _quantize(coeffs, y1dc, y1ac)
                q[0] = 0  # DC rides in Y2
                qblocks.append(q)
            qy2 = _quantize(fwht(dcs), y2dc, y2ac)

            # write this MB's mode record into partition 1
            be1.write_tree(KF_YMODE_TREE, KF_YMODE_PROBS, ym)
            be1.write_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, DC_PRED)

            # tokens: Y2, 16 Y, 4 U, 4 V (order = decoder)
            ctx = a_y2[mbx] + l_y2
            nz = _write_coeffs(be_tok, coeff_probs[1], ctx, qy2, 0)
            a_y2[mbx] = l_y2 = int(nz)
            y2_deq = [qy2[k] * (y2dc if k == 0 else y2ac)
                      for k in range(16)]
            y_dcs = _iwht4x4(y2_deq)
            nz_grid = [[0] * 4 for _ in range(4)]
            deq_blocks = []
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                anz = nz_grid[r - 1][c] if r > 0 else a_y[mbx][c]
                lnz = nz_grid[r][c - 1] if c > 0 else l_y[r]
                nz = _write_coeffs(be_tok, coeff_probs[0], anz + lnz,
                                   qblocks[sb], 1)
                nz_grid[r][c] = int(nz)
                deq = [qblocks[sb][k] * (y1dc if k == 0 else y1ac)
                       for k in range(16)]
                deq[0] = y_dcs[sb]
                deq_blocks.append(deq)
            a_y[mbx] = nz_grid[3][:]
            l_y = [nz_grid[r][3] for r in range(4)]
            _add_residuals(Y, x0, y0, pred, deq_blocks, 4)

            # chroma (DC mode)
            for plane_i, (srcp, recp, a_c) in enumerate(
                    ((Usrc, U, a_u), (Vsrc, V_, a_v))):
                cx, cy = mbx * 8, mby * 8
                ca = (recp[cy - 1, cx : cx + 8] if have_a
                      else np.full(8, 127, np.uint8))
                cl = (recp[cy : cy + 8, cx - 1] if have_l
                      else np.full(8, 129, np.uint8))
                ctl = (int(recp[cy - 1, cx - 1]) if have_a and have_l
                       else (129 if have_a else 127))
                cpred = _pred_mb(DC_PRED, ca, cl, ctl, have_a, have_l, 8)
                csrc = srcp[cy : cy + 8, cx : cx + 8].astype(np.int32)
                grid = [[0] * 2 for _ in range(2)]
                deqs = []
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    res = (csrc[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                           - cpred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4])
                    q = _quantize(fdct(res), uvdc, uvac)
                    anz = grid[r - 1][c] if r > 0 else a_c[mbx][c]
                    lnz = (grid[r][c - 1] if c > 0
                           else (l_u[r] if plane_i == 0 else l_v[r]))
                    nz = _write_coeffs(be_tok, coeff_probs[2],
                                       anz + lnz, q, 0)
                    grid[r][c] = int(nz)
                    deqs.append([q[k] * (uvdc if k == 0 else uvac)
                                 for k in range(16)])
                a_c[mbx] = [grid[1][0], grid[1][1]]
                if plane_i == 0:
                    l_u = [grid[0][1], grid[1][1]]
                else:
                    l_v = [grid[0][1], grid[1][1]]
                _add_residuals(recp, cx, cy, cpred, deqs, 2)

    part1 = be1.finish()
    token_parts = [be.finish() for be in be_toks]
    sizes = b"".join(len(tp).to_bytes(3, "little")
                     for tp in token_parts[:-1])
    tokens = sizes + b"".join(token_parts)

    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    frame = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    frame += b"\x9d\x01\x2a"
    frame += struct.pack("<HH", width, height)
    frame += part1 + tokens
    if len(frame) & 1:
        padded = frame + b"\x00"
    else:
        padded = frame
    container = (b"RIFF" + struct.pack("<I", 4 + 8 + len(padded))
                 + b"WEBP" + b"VP8 " + struct.pack("<I", len(frame))
                 + padded)
    uv_w2, uv_h2 = (width + 1) >> 1, (height + 1) >> 1
    return container, (Y[:height, :width], U[:uv_h2, :uv_w2],
                       V_[:uv_h2, :uv_w2])


# ---------------------------------------------------------------------------
# ALPH chunk: the alpha plane of lossy WebP (container spec section
# "Alpha").  Alpha is stored LOSSLESSLY next to the lossy VP8 frame -
# raw bytes or a headerless VP8L stream (alpha in the green channel),
# optionally per-pixel filtered (none/horizontal/vertical/gradient).
# ---------------------------------------------------------------------------

def _decode_alpha(payload: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk payload -> (h, w) uint8 alpha plane."""
    from .webp import (
        WebpError, _add_pixels, _BitReader, _div_round_up,
        _inverse_color_transform, _inverse_palette, _inverse_predictor,
        _inverse_subtract_green, _palette_xbits, _read_entropy_coded,
    )

    if not payload:
        raise Vp8Error("empty ALPH chunk")
    b0 = payload[0]
    compression = b0 & 3
    filt = (b0 >> 2) & 3
    # preprocessing bits ((b0 >> 4) & 3) are an encoder-side hint
    if compression == 0:
        if len(payload) - 1 < w * h:
            raise Vp8Error("truncated raw alpha plane")
        alpha = np.frombuffer(payload[1 : 1 + w * h],
                              np.uint8).reshape(h, w).astype(np.int32)
    elif compression == 1:
        # headerless VP8L stream, alpha rides the green channel
        try:
            br = _BitReader(payload[1:])
            transforms = []
            seen = set()
            cur_w = w
            while br.read_bit():
                t = br.read(2)
                if t in seen:
                    raise WebpError("duplicate transform")
                seen.add(t)
                if t in (0, 1):
                    size_bits = br.read(3) + 2
                    bw = _div_round_up(cur_w, 1 << size_bits)
                    bh = _div_round_up(h, 1 << size_bits)
                    sub = _read_entropy_coded(br, bw, bh, False)
                    transforms.append((t, size_bits, sub, cur_w))
                elif t == 2:
                    transforms.append((2,))
                else:
                    n = br.read(8) + 1
                    pal = _read_entropy_coded(br, n, 1, False)
                    for i in range(1, n):
                        pal[i] = _add_pixels(pal[i], pal[i - 1])
                    transforms.append((3, cur_w, pal))
                    cur_w = _div_round_up(cur_w, 1 << _palette_xbits(n))
            px = _read_entropy_coded(br, cur_w, h, True)
            if len(px) != cur_w * h:
                raise WebpError("alpha pixel count mismatch")
            for tf in reversed(transforms):
                if tf[0] == 3:
                    _, orig_w, pal = tf
                    px = _inverse_palette(px, orig_w, h, pal)
                    cur_w = orig_w
                elif tf[0] == 2:
                    _inverse_subtract_green(px)
                elif tf[0] == 1:
                    _inverse_color_transform(px, cur_w, h, tf[1], tf[2])
                else:
                    _inverse_predictor(px, cur_w, h, tf[1], tf[2])
        except WebpError as exc:
            raise Vp8Error(f"alpha VP8L stream: {exc}") from exc
        alpha = (np.array(px, dtype=np.uint32).reshape(h, w) >> 8) \
            .astype(np.int32) & 0xFF
    else:
        raise Vp8Error(f"reserved alpha compression {compression}")

    if filt == 1:            # horizontal: left (first col: above)
        for y in range(h):
            if y:
                alpha[y, 0] = (alpha[y, 0] + alpha[y - 1, 0]) & 0xFF
            alpha[y] = np.cumsum(alpha[y]) & 0xFF
    elif filt == 2:          # vertical: above (first row: left)
        alpha[0] = np.cumsum(alpha[0]) & 0xFF
        for y in range(1, h):
            alpha[y] = (alpha[y] + alpha[y - 1]) & 0xFF
    elif filt == 3:          # gradient: clip(left + above - above-left)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = int(alpha[0, x - 1])
                elif x == 0:
                    pred = int(alpha[y - 1, 0])
                else:
                    g = (int(alpha[y, x - 1]) + int(alpha[y - 1, x])
                         - int(alpha[y - 1, x - 1]))
                    pred = 0 if g < 0 else (255 if g > 255 else g)
                alpha[y, x] = (alpha[y, x] + pred) & 0xFF
    elif filt != 0:
        raise Vp8Error(f"bad alpha filter {filt}")
    return alpha.astype(np.uint8)


def _find_alph_chunk(buf: bytes) -> bytes | None:
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"ALPH":
            return buf[pos + 8 : pos + 8 + size]
        if cid == b"VP8 ":          # ALPH precedes VP8 in the container
            return None
        if cid == b"ANMF" and size > 16:
            inner = buf[pos + 8 + 16 : pos + 8 + size]
            ipos = 0
            while ipos + 8 <= len(inner):
                icid = inner[ipos : ipos + 4]
                isize = struct.unpack_from("<I", inner, ipos + 4)[0]
                if icid == b"ALPH":
                    return inner[ipos + 8 : ipos + 8 + isize]
                if icid == b"VP8 ":
                    return None
                ipos += 8 + isize + (isize & 1)
        pos += 8 + size + (size & 1)
    return None
