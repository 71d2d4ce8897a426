"""GIF codec cross-validation against the SYSTEM giflib (ctypes over
the public v5 ABI, tests/gif_ref_harness.py - tests only).

Both directions: real giflib-encoded files (sequential + interlaced)
decode pixel-exact here, and this repo's encoder twin produces files
giflib slurps back to identical indices - the independent-
implementation gate (see the JPEG zigzag lesson) for the LSB-first
LZW and interlace conventions."""

import os
import tempfile

import numpy as np
import pytest

from livre_spark.functions.gif import decode_gif, encode_gif

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import gif_ref_harness as ref

pytestmark = pytest.mark.skipif(ref.lib is None,
                                reason="system giflib not present")

_PAL = [((i * 5) & 255, (i * 11) & 255, (255 - i) & 255)
        for i in range(256)]


@pytest.mark.parametrize("w,h,interlace", [
    (13, 9, False), (13, 9, True), (40, 33, False), (40, 33, True),
    (8, 8, False), (64, 7, True),
])
def test_decode_matches_giflib(w, h, interlace):
    rng = np.random.default_rng(w * h + interlace)
    idx = rng.integers(0, 256, size=h * w, dtype=np.uint8).tobytes()
    path = tempfile.mktemp(suffix=".gif")
    try:
        ref.ref_encode(path, w, h, _PAL, idx, interlace=interlace)
        buf = open(path, "rb").read()
    finally:
        if os.path.exists(path):
            os.unlink(path)
    gw, gh, samples = decode_gif(buf)
    assert (gw, gh) == (w, h)
    exp = bytearray()
    for v in idx:
        exp += bytes(_PAL[v])
    assert samples == bytes(exp)


@pytest.mark.parametrize("w,h", [(13, 9), (32, 20), (7, 61)])
def test_twin_files_slurp_identically_in_giflib(w, h):
    rng = np.random.default_rng(w + h)
    idx = rng.integers(0, 256, size=h * w, dtype=np.uint8).tobytes()
    pal = b"".join(bytes(p) for p in _PAL)
    buf = encode_gif(w, h, idx, pal)
    path = tempfile.mktemp(suffix=".gif")
    try:
        open(path, "wb").write(buf)
        sw, sh, frames = ref.ref_decode(path)
    finally:
        os.unlink(path)
    assert (sw, sh) == (w, h)
    assert frames[0][5] == idx
