"""PNG decoder cross-validation against the SYSTEM libpng.

Real libpng-written files across every bit depth (1/2/4/8/16), color
type (gray, RGB, palette, gray+alpha, RGBA) and both interlace modes,
compared pixel-exact - the independent-implementation gate that caught
the JPEG zigzag convention bug applied to the PNG surface.  Skips when
gcc or libpng dev files are absent (the twin goldens in
test_multimodal_decode.py still run)."""

import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from livre_spark.functions.multimodal import _decode_png

_PAL = [((i * 3) & 255, (255 - i) & 255, (i * 7) & 255)
        for i in range(256)]


def _build_helper():
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        return None
    exe = tempfile.NamedTemporaryFile(prefix="pngref", delete=False).name
    r = subprocess.run(
        [gcc, "-O2", "-o", exe, "tests/png_ref_helper.c", "-lpng"],
        capture_output=True)
    return exe if r.returncode == 0 else None


_HELPER = _build_helper()
needs_libpng = pytest.mark.skipif(
    _HELPER is None, reason="gcc or libpng dev files not present")


@needs_libpng
@pytest.mark.parametrize("interlace", [0, 1])
@pytest.mark.parametrize("ct,depth", [
    (0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
    (2, 8), (2, 16),
    (3, 1), (3, 2), (3, 4), (3, 8),
    (4, 8), (4, 16),
    (6, 8), (6, 16),
])
def test_decode_matches_libpng_pixel_exact(ct, depth, interlace):
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    w, h = 13, 9
    rng = np.random.default_rng(ct * 100 + depth + interlace)
    maxv = (1 << min(depth, 8)) - 1
    src = rng.integers(0, maxv + 1, size=(h, w, ch), dtype=np.uint8)
    png = subprocess.run(
        [_HELPER, "encode", str(w), str(h), str(ct), str(depth),
         str(interlace)],
        input=src.tobytes(), capture_output=True)
    assert png.returncode == 0, png.stderr
    gw, gh, samples = _decode_png(png.stdout)
    assert (gw, gh) == (w, h)
    if ct == 3:          # palette expands to RGB
        exp = np.array([[_PAL[v] for v in row[:, 0]] for row in src],
                       dtype=np.uint8)
    elif ct == 0 and depth < 8:   # sub-byte gray scales to 8-bit
        exp = (src * (255 // maxv)).astype(np.uint8)
    else:                # 16-bit reduces to the high byte (= src here)
        exp = src
    got = np.frombuffer(samples, np.uint8).reshape(gh, gw, exp.shape[2])
    assert np.array_equal(got, exp)
