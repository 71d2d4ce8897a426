"""VP8 (lossy WebP) decoder: libwebp plane-exact validation, encoder
twin roundtrips, containment fuzz, bomb guards.

The strongest gate here decodes REAL libwebp-encoded bitstreams and
compares Y/U/V planes byte-exact against libwebp's own decoder
(ctypes over the system libwebp.so - tests only; the product decoder
in livre_spark/functions/vp8.py is dependency-free).  Where libwebp is
absent those tests skip and the pure-Python encoder twin (itself
validated against libwebp where present) carries the roundtrips."""

import ctypes
import ctypes.util

import numpy as np
import pytest

from livre_spark.functions.vp8 import (
    BoolDecoder, BoolEncoder, Vp8Error, _find_vp8_chunk, decode_vp8,
    decode_webp_lossy, encode_vp8,
)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so",
                 ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None,
                                   reason="system libwebp not present")


def _ref_encode(rgb: bytes, w: int, h: int, quality: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(rgb, w, h, w * 3, quality, ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return data


def _ref_decode_yuv(webp: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = _LIB.WebPDecodeYUV(webp, len(webp), ctypes.byref(w),
                            ctypes.byref(h), ctypes.byref(u),
                            ctypes.byref(v), ctypes.byref(stride),
                            ctypes.byref(uv_stride))
    assert yp
    W, H = w.value, h.value
    uw, uh = (W + 1) // 2, (H + 1) // 2
    Y = np.ctypeslib.as_array(yp, shape=(H, stride.value))[:, :W].copy()
    U = np.ctypeslib.as_array(u, shape=(uh, uv_stride.value))[:, :uw].copy()
    V = np.ctypeslib.as_array(v, shape=(uh, uv_stride.value))[:, :uw].copy()
    _LIB.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return W, H, Y, U, V


def _gradient(w, h, seed):
    rng = np.random.default_rng(seed)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    img = np.stack([(x * 3 + y * 5 + seed) % 256,
                    (x * 7 ^ y * 2) % 256,
                    (x + y * 11 + 64) % 256], axis=-1).astype(np.uint8)
    noise = rng.integers(0, 40, size=img.shape, dtype=np.uint8)
    return ((img.astype(int) + noise) % 256).astype(np.uint8)


def _photo(w, h, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256,
                        size=((h + 7) // 8, (w + 7) // 8, 3))
    img = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    return np.clip(img + rng.normal(0, 6, img.shape), 0, 255) \
        .astype(np.uint8)


@needs_libwebp
@pytest.mark.parametrize("w,h,q,gen", [
    (16, 16, 50.0, _gradient),       # single MB
    (48, 48, 75.0, _gradient),       # B_PRED heavy, segmentation
    (48, 48, 10.0, _photo),          # i16/skip heavy, high quant
    (64, 40, 10.0, _photo),          # TM at top row, flat MBs
    (17, 13, 50.0, _photo),          # non-MB-multiple crop
    (33, 49, 95.0, _gradient),       # odd dims, low quant
])
def test_decode_matches_libwebp_plane_exact(w, h, q, gen):
    """Real libwebp-encoded bitstream -> my decode == libwebp's decode,
    byte-exact on all three planes (loop filter included) - validates
    the whole pipeline INCLUDING the RFC 6386 constant tables."""
    img = gen(w, h, seed=w + h + int(q))
    webp = _ref_encode(img.tobytes(), w, h, q)
    W, H, Yr, Ur, Vr = _ref_decode_yuv(webp)
    Wm, Hm, Ym, Um, Vm = decode_vp8(_find_vp8_chunk(webp))
    assert (Wm, Hm) == (W, H) == (w, h)
    assert np.array_equal(Ym, Yr)
    assert np.array_equal(Um, Ur)
    assert np.array_equal(Vm, Vr)


@needs_libwebp
@pytest.mark.parametrize("qi", [0, 40, 127])
def test_encoder_twin_bitstreams_decode_in_libwebp(qi):
    """The pure-Python encoder's bitstreams are CONFORMANT: libwebp
    decodes them to exactly the encoder's own reconstruction."""
    img = _photo(33, 49, seed=qi)
    webp, (Ye, Ue, Ve) = encode_vp8(33, 49, img.tobytes(), qi=qi)
    W, H, Yr, Ur, Vr = _ref_decode_yuv(bytes(webp))
    assert (W, H) == (33, 49)
    assert np.array_equal(Ye, Yr)
    assert np.array_equal(Ue, Ur)
    assert np.array_equal(Ve, Vr)


@pytest.mark.parametrize("w,h,qi", [(16, 16, 12), (32, 16, 4),
                                    (17, 13, 40), (40, 56, 100)])
def test_encode_decode_roundtrip_exact(w, h, qi):
    """encode_vp8 -> decode_vp8 reproduces the encoder's reconstruction
    exactly (no libwebp needed)."""
    rng = np.random.default_rng(w * h + qi)
    img = ((rng.integers(0, 256, size=(h, w, 3)) // 3) + 80) \
        .astype(np.uint8)
    webp, (Ye, Ue, Ve) = encode_vp8(w, h, img.tobytes(), qi=qi)
    W, H, Yd, Ud, Vd = decode_vp8(_find_vp8_chunk(webp))
    assert (W, H) == (w, h)
    assert np.array_equal(Ye, Yd)
    assert np.array_equal(Ue, Ud)
    assert np.array_equal(Ve, Vd)


def test_gray_constant_roundtrip_is_lossless():
    """Constant-gray images roundtrip PIXEL-EXACT through the lossy
    path (u=v=128 residual-free; DC-only luma reconstructs exactly) -
    the property the vp8_real_decode oracle row leans on."""
    for c in (0, 1, 77, 128, 200, 255):
        rgb = bytes([c, c, c]) * 256
        webp, _ = encode_vp8(16, 16, rgb, qi=c % 9)
        w, h, out = decode_webp_lossy(bytes(webp))
        assert (w, h) == (16, 16)
        assert out == rgb


def test_bool_coder_roundtrip():
    import random
    rng = random.Random(99)
    for _ in range(50):
        seq = [(rng.randrange(1, 255), rng.randrange(2))
               for _ in range(rng.randrange(1, 500))]
        be = BoolEncoder()
        for p, b in seq:
            be.write_bool(p, b)
        bd = BoolDecoder(be.finish())
        assert [bd.read_bool(p) for p, _ in seq] == [b for _, b in seq]


def test_dimension_bomb_guard():
    # hostile header declaring 16383x16383 (~268 MP) must be rejected
    # before any allocation
    hdr = bytes([0x00, 0x00, 0x00]) + b"\x9d\x01\x2a" + \
        (0x3FFF).to_bytes(2, "little") + (0x3FFF).to_bytes(2, "little")
    with pytest.raises(Vp8Error, match="max_pixels"):
        decode_vp8(hdr + b"\x00" * 32)


def test_containment_fuzz():
    """Random byte corruption of a valid stream never escapes the
    (Vp8Error, NotImplementedError) containment family."""
    import random
    img = _photo(32, 32, seed=3)
    webp, _ = encode_vp8(32, 32, img.tobytes(), qi=30)
    webp = bytes(webp)
    rng = random.Random(11)
    for _ in range(60):
        b = bytearray(webp)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        try:
            decode_webp_lossy(bytes(b))
        except (Vp8Error, NotImplementedError, ValueError):
            pass  # contained


def test_not_a_key_frame_rejected():
    with pytest.raises(Vp8Error, match="key frame"):
        decode_vp8(bytes([0x01, 0x00, 0x00]) + b"\x9d\x01\x2a"
                   + b"\x10\x00\x10\x00" + b"\x00" * 16)


def test_decode_image_routes_lossy_webp():
    """multimodal.decode_image reaches the VP8 decoder through the
    container walk and featurizes for real."""
    from livre_spark.functions.multimodal import decode_image
    c = 0xA7
    rgb = bytes([c, c, c]) * 256
    webp, _ = encode_vp8(16, 16, rgb, qi=2)
    w, h, feats = decode_image(bytes(webp))
    assert (w, h) == (16, 16)
    assert feats[c >> 4] == pytest.approx(1.0)


def _lib_decode_rgba(webp: bytes):
    _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(webp, len(webp), ctypes.byref(w),
                            ctypes.byref(h))
    assert p
    arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    _LIB.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return w.value, h.value, arr


@needs_libwebp
def test_alpha_plane_matches_libwebp():
    """Lossy WebP with alpha (VP8X + ALPH + VP8 from WebPEncodeRGBA):
    the ALPH plane is LOSSLESS, so my decoded alpha must equal
    libwebp's byte-exact."""
    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    rng = np.random.default_rng(5)
    for (w, h, q) in [(32, 32, 75.0), (48, 40, 30.0), (17, 13, 90.0)]:
        rgba = _photo(w, h, seed=int(q))
        a = ((np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 3)
             % 256).astype(np.uint8)
        a[rng.integers(0, h, 10), rng.integers(0, w, 10)] = 0
        img = np.dstack([rgba, a]).astype(np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = _LIB.WebPEncodeRGBA(img.tobytes(), w, h, w * 4, q,
                                ctypes.byref(out))
        assert n > 0
        webp = ctypes.string_at(out, n)
        _LIB.WebPFree(out)
        W, H, ref = _lib_decode_rgba(webp)
        gw, gh, px = decode_webp_lossy(webp)
        assert (gw, gh) == (W, H) == (w, h)
        mine = np.frombuffer(px, np.uint8).reshape(h, w, 4)
        assert np.array_equal(mine[..., 3], ref[..., 3])


def _alph_container(w, h, qi, alph_payload):
    webp, _ = encode_vp8(w, h, bytes([100, 100, 100]) * (w * h), qi=qi)
    webp = bytes(webp)
    # splice an ALPH chunk before the VP8 chunk
    vp8_at = webp.index(b"VP8 ")
    chunk = b"ALPH" + len(alph_payload).to_bytes(4, "little") \
        + alph_payload + (b"\x00" if len(alph_payload) & 1 else b"")
    out = webp[:vp8_at] + chunk + webp[vp8_at:]
    riff_len = len(out) - 8
    return out[:4] + riff_len.to_bytes(4, "little") + out[8:]


@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_alpha_raw_filters_roundtrip(filt):
    """Raw ALPH with each per-pixel filter: the test applies the
    FORWARD filter, the decoder must invert it exactly."""
    w, h = 16, 16
    alpha = ((np.arange(h)[:, None] * 11 + np.arange(w)[None, :] * 5
              + 13) % 256).astype(np.int32)
    delta = alpha.copy()
    for y in range(h - 1, -1, -1):
        for x in range(w - 1, -1, -1):
            if x == 0 and y == 0:
                pred = 0
            elif filt == 1:
                pred = int(alpha[y, x - 1]) if x else int(alpha[y - 1, 0])
            elif filt == 2:
                pred = int(alpha[y - 1, x]) if y else int(alpha[0, x - 1])
            elif filt == 3:
                if y == 0:
                    pred = int(alpha[0, x - 1])
                elif x == 0:
                    pred = int(alpha[y - 1, 0])
                else:
                    g = (int(alpha[y, x - 1]) + int(alpha[y - 1, x])
                         - int(alpha[y - 1, x - 1]))
                    pred = min(255, max(0, g))
            else:
                pred = 0
            delta[y, x] = (alpha[y, x] - pred) & 0xFF
    payload = bytes([filt << 2]) + delta.astype(np.uint8).tobytes()
    webp = _alph_container(w, h, 2, payload)
    gw, gh, px = decode_webp_lossy(webp)
    mine = np.frombuffer(px, np.uint8).reshape(h, w, 4)
    assert np.array_equal(mine[..., 3], alpha.astype(np.uint8))


def test_alpha_containment():
    from livre_spark.functions.vp8 import _decode_alpha
    with pytest.raises(Vp8Error):
        _decode_alpha(b"", 8, 8)
    with pytest.raises(Vp8Error):
        _decode_alpha(b"\x00" + b"\x01" * 10, 8, 8)  # truncated raw
    with pytest.raises(Vp8Error):
        _decode_alpha(b"\x02" + b"\x00" * 64, 8, 8)  # reserved method
    with pytest.raises(Vp8Error):
        _decode_alpha(b"\x01\xff\xff", 8, 8)  # garbage VP8L stream


@pytest.mark.parametrize("n_parts", [2, 4, 8])
def test_multi_partition_token_streams(n_parts):
    """nparts>1 (MB row r % nparts partition routing + the 3-byte size
    table): decode matches the encoder recon, and libwebp (when
    present) agrees byte-exact."""
    rng = np.random.default_rng(n_parts)
    img = ((rng.integers(0, 256, size=(72, 48, 3)) // 3) + 70) \
        .astype(np.uint8)
    webp, (Ye, Ue, Ve) = encode_vp8(48, 72, img.tobytes(), qi=20,
                                    n_parts=n_parts)
    W, H, Yd, Ud, Vd = decode_vp8(_find_vp8_chunk(webp))
    assert (W, H) == (48, 72)
    assert np.array_equal(Ye, Yd)
    assert np.array_equal(Ue, Ud)
    assert np.array_equal(Ve, Vd)
    if _LIB is not None:
        Wr, Hr, Yr, Ur, Vr = _ref_decode_yuv(bytes(webp))
        assert np.array_equal(Ye, Yr)
        assert np.array_equal(Ue, Ur)
        assert np.array_equal(Ve, Vr)


@needs_libwebp
@pytest.mark.parametrize("w,h,alpha,kind", [
    (13, 9, False, "rand"), (32, 32, False, "photo"),
    (64, 40, False, "grad"), (13, 9, True, "rand"),
    (48, 48, True, "photo"), (33, 77, False, "pal"),
])
def test_vp8l_decode_matches_real_libwebp_lossless(w, h, alpha, kind):
    """REAL libwebp lossless files (predictor/cross-color/palette
    transform mixes chosen by libwebp's own encoder) decode
    pixel-exact in functions/webp.py - the independent-implementation
    gate for the round-5 VP8L codec, which until now was validated by
    its own encoder twin only."""
    from livre_spark.functions.webp import decode_webp_lossless

    for fn in ("WebPEncodeLosslessRGB", "WebPEncodeLosslessRGBA"):
        f = getattr(_LIB, fn)
        f.restype = ctypes.c_size_t
        f.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                      ctypes.c_int,
                      ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    ch = 4 if alpha else 3
    rng = np.random.default_rng(w * h + alpha)
    if kind == "rand":
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    elif kind == "pal":
        img = (rng.integers(0, 7, size=(h, w, 1))
               * np.array([[[37, 11, 91]]])).astype(np.uint8)
        if alpha:
            img = np.dstack([img, np.full((h, w), 255, np.uint8)])
    elif kind == "grad":
        x = np.arange(w)[None, :] + np.zeros((h, 1), int)
        y = np.arange(h)[:, None] + np.zeros((1, w), int)
        planes = [(x * 3 + y * 5) % 256, (x * 7) % 256, (y * 11) % 256]
        if alpha:
            planes.append((x + y) % 256)
        img = np.stack(planes, axis=-1).astype(np.uint8)
    else:
        base = rng.integers(0, 256, size=((h + 7) // 8, (w + 7) // 8, ch))
        img = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = _LIB.WebPEncodeLosslessRGBA if alpha else _LIB.WebPEncodeLosslessRGB
    n = fn(img.tobytes(), w, h, w * ch, ctypes.byref(out))
    assert n > 0
    webp = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    gw, gh, samples = decode_webp_lossless(webp)
    got = np.frombuffer(samples, np.uint8)
    exp_ch = got.size // (w * h)
    assert (gw, gh) == (w, h)
    assert np.array_equal(got.reshape(gh, gw, exp_ch),
                          img[..., :exp_ch])
