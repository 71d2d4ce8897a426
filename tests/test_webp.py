"""WebP lossless (VP8L) codec: encoder-twin roundtrips over every
decode surface (all 14 predictors, cross-color, subtract-green,
palette bundling at every index width, meta-prefix groups, color
cache, LZ77 refs), a hand-built max_symbol stream, the VP8X container
path, and containment fuzz."""

import random
import struct

import pytest

from livre_spark.functions.webp import (
    WebpError, _BitWriter, decode_vp8l, decode_webp_lossless,
    encode_webp_lossless,
)


def _img(rng, w, h, ch=3):
    return bytes(rng.randrange(256) if rng.random() < 0.6 else 77
                 for _ in range(w * h * ch))


def test_literal_roundtrips_all_options():
    rng = random.Random(5)
    for (w, h) in [(1, 1), (5, 4), (16, 11), (33, 7)]:
        for ch in (3, 4):
            for sg in (False, True):
                for lz in (False, True):
                    for cb in (0, 4):
                        px = _img(rng, w, h, ch)
                        buf = encode_webp_lossless(
                            w, h, px, channels=ch, subtract_green=sg,
                            use_lz77=lz, cache_bits=cb)
                        gw, gh, out = decode_webp_lossless(buf)
                        assert (gw, gh) == (w, h) and out == px, \
                            (w, h, ch, sg, lz, cb)


@pytest.mark.parametrize("mode", list(range(14)))
def test_all_predictor_modes(mode):
    rng = random.Random(100 + mode)
    for (w, h) in [(1, 1), (7, 5), (16, 9)]:
        px = _img(rng, w, h)
        buf = encode_webp_lossless(w, h, px, predictor_mode=mode)
        gw, gh, out = decode_webp_lossless(buf)
        assert (gw, gh) == (w, h) and out == px, (mode, w, h)


@pytest.mark.parametrize("cte", [(0, 0, 0), (10, 250, 3),
                                 (127, 128, 255), (33, 77, 200)])
def test_cross_color_transform(cte):
    rng = random.Random(7)
    px = _img(rng, 9, 6)
    _, _, out = decode_webp_lossless(
        encode_webp_lossless(9, 6, px, cross_color=cte))
    assert out == px


def test_transform_stack_rgba():
    rng = random.Random(8)
    px = _img(rng, 11, 8, 4)
    _, _, out = decode_webp_lossless(encode_webp_lossless(
        11, 8, px, channels=4, predictor_mode=7, cross_color=(5, 6, 7),
        subtract_green=True))
    assert out == px


@pytest.mark.parametrize("ncolors", [1, 2, 3, 4, 9, 16, 17, 200])
def test_palette_all_bundle_widths(ncolors):
    """Color indexing: every pixel-bundling width (8/4/2/1 px per
    byte) and the delta-coded palette."""
    rng = random.Random(ncolors)
    pal = [bytes((rng.randrange(256), rng.randrange(256),
                  rng.randrange(256))) for _ in range(ncolors)]
    for (w, h) in [(1, 1), (7, 5), (16, 9), (9, 1)]:
        px = b"".join(pal[rng.randrange(ncolors)] for _ in range(w * h))
        gw, gh, out = decode_webp_lossless(
            encode_webp_lossless(w, h, px, palette=True))
        assert (gw, gh) == (w, h) and out == px


@pytest.mark.parametrize("mb", [2, 3])
def test_meta_prefix_groups(mb):
    rng = random.Random(mb)
    for (w, h) in [(16, 12), (5, 5), (3, 3)]:
        px = _img(rng, w, h)
        _, _, out = decode_webp_lossless(
            encode_webp_lossless(w, h, px, meta_bits=mb))
        assert out == px, (mb, w, h)


def test_max_symbol_capped_code_lengths():
    """Hand-built stream using the max_symbol cap: only 2 coded
    code-length symbols, the rest implicitly zero - 1x2 image of green
    values 0 and 1 (other channels single-symbol codes)."""
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(0, 14)     # width 1
    bw.write(1, 14)     # height 2
    bw.write(0, 1)      # no alpha
    bw.write(0, 3)      # version
    bw.write(0, 1)      # no transforms
    bw.write(0, 1)      # no cache
    bw.write(0, 1)      # no meta
    # green code, code-length coded: lengths[0]=1, lengths[1]=1
    bw.write(0, 1)      # not simple
    bw.write(0, 4)      # 4 code-length-code lengths, order 17,18,0,1
    bw.write(0, 3)      # len(17) = 0
    bw.write(0, 3)      # len(18) = 0
    bw.write(1, 3)      # len(0) = 1
    bw.write(1, 3)      # len(1) = 1
    bw.write(1, 1)      # max_symbol cap present
    bw.write(0, 3)      # length_nbits = 2
    bw.write(0, 2)      # max_symbol = 2
    # two code-length symbols '1','1' (canonical: 0->code 0, 1->code 1)
    bw.write_code(1, 1)
    bw.write_code(1, 1)
    for _ in range(3):  # red/blue/alpha: simple single-symbol codes
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit symbol
        bw.write(0x55, 8)
    bw.write(1, 1)      # distance: simple single symbol 0
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # pixels: green 0 then green 1 (codes 0 and 1, 1 bit each)
    bw.write_code(0, 1)
    bw.write_code(1, 1)
    w, h, has_alpha, px = decode_vp8l(bw.tobytes())
    assert (w, h, has_alpha) == (1, 2, False)
    assert px == [0x55550055, 0x55550155]


def test_vp8x_container_routing():
    """A VP8L frame inside a VP8X extended container decodes."""
    rng = random.Random(3)
    px = _img(rng, 6, 4)
    plain = encode_webp_lossless(6, 4, px)
    vp8l_chunk = plain[12:]  # chunks after the RIFF/WEBP header
    vp8x_payload = (b"\x00\x00\x00\x00"
                    + (5).to_bytes(3, "little")
                    + (3).to_bytes(3, "little"))
    vp8x = b"VP8X" + struct.pack("<I", len(vp8x_payload)) + vp8x_payload
    body = vp8x + vp8l_chunk
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    gw, gh, out = decode_webp_lossless(buf)
    assert (gw, gh) == (6, 4) and out == px


def test_lossy_vp8_is_codec_boundary():
    body = b"VP8 " + struct.pack("<I", 10) + b"\x00" * 10
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    with pytest.raises(NotImplementedError):
        decode_webp_lossless(buf)


def test_containment_truncation_and_flips():
    rng = random.Random(17)
    px = _img(rng, 9, 7)
    buf = encode_webp_lossless(9, 7, px, use_lz77=True, cache_bits=3)
    for cut in (13, 20, len(buf) - 3):
        with pytest.raises((WebpError, NotImplementedError)):
            decode_webp_lossless(buf[:cut])
    for _ in range(200):
        b = bytearray(buf)
        b[rng.randrange(12, len(b))] ^= rng.randrange(1, 256)
        try:
            gw, gh, out = decode_webp_lossless(bytes(b))
            assert gw >= 1 and gh >= 1
        except (WebpError, NotImplementedError):
            pass


def test_skewed_histogram_respects_length_cap():
    """Predictor residuals of a smooth gradient + rare outliers produce
    a histogram whose optimal Huffman tree exceeds 15 bits; the writer
    must degrade to capped lengths, and the stream must roundtrip."""
    rng = random.Random(2)
    w, h = 64, 64
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(((x * 4 + rng.randrange(2)) & 0xFF,
                         (y * 4) & 0xFF,
                         (x + y + (rng.randrange(200)
                                   if rng.random() < 0.002 else 0))
                         & 0xFF))
    px = bytes(px)
    buf = encode_webp_lossless(w, h, px, predictor_mode=7,
                               subtract_green=True)
    gw, gh, out = decode_webp_lossless(buf)
    assert (gw, gh) == (w, h) and out == px


def test_animated_webp_first_lossless_frame():
    """VP8X + ANIM + ANMF container: the first frame's VP8L decodes."""
    rng = random.Random(4)
    px = _img(rng, 5, 3)
    plain = encode_webp_lossless(5, 3, px)
    vp8l_chunk = plain[12:]
    frame_params = bytes(16)  # offsets/dims/duration - opaque here
    anmf_payload = frame_params + vp8l_chunk
    anmf = b"ANMF" + struct.pack("<I", len(anmf_payload)) + anmf_payload
    if len(anmf_payload) & 1:
        anmf += b"\x00"
    anim = b"ANIM" + struct.pack("<I", 6) + bytes(6)
    vp8x_payload = (b"\x02\x00\x00\x00"  # animation flag
                    + (4).to_bytes(3, "little")
                    + (2).to_bytes(3, "little"))
    vp8x = b"VP8X" + struct.pack("<I", len(vp8x_payload)) + vp8x_payload
    body = vp8x + anim + anmf
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    gw, gh, out = decode_webp_lossless(buf)
    assert (gw, gh) == (5, 3) and out == px
