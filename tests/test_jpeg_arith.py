"""Arithmetic-coded JPEG (T.81 QM-coder) + real-file zigzag gates.

The decisive fixtures come from the SYSTEM libjpeg, driven through a
small C helper (tests/jpeg_arith_helper.c) compiled at test time -
real arithmetic and Huffman bitstreams from an independent
implementation, compared COEFFICIENT-exact (jpeg_read_coefficients vs
this repo's entropy decode).  Where gcc/libjpeg are absent those
tests skip and the twin-only roundtrips still run."""

import shutil
import struct
import subprocess
import tempfile

import numpy as np
import pytest

from livre_spark.functions.jpeg import (
    ZIGZAG, JpegError, decode_jpeg, encode_jpeg, encode_jpeg_arith,
    encode_jpeg_progressive,
)


def _build_helper():
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        return None
    exe = tempfile.NamedTemporaryFile(prefix="jpegarith", delete=False).name
    r = subprocess.run(
        [gcc, "-O2", "-o", exe, "tests/jpeg_arith_helper.c", "-ljpeg"],
        capture_output=True)
    return exe if r.returncode == 0 else None


_HELPER = _build_helper()
needs_libjpeg = pytest.mark.skipif(
    _HELPER is None, reason="gcc or libjpeg dev files not present")


def _ref_encode(img, quality, progressive, arith=True):
    h, w, nc = img.shape
    r = subprocess.run(
        [_HELPER, "encode", str(w), str(h), str(nc), str(quality),
         str(int(progressive)), str(int(arith))],
        input=img.tobytes(), capture_output=True)
    assert r.returncode == 0, r.stderr
    return r.stdout


def _ref_coefs(jpg):
    out = subprocess.run([_HELPER, "coefs"], input=jpg,
                         capture_output=True).stdout
    comps, pos = [], 0
    while pos < len(out):
        nl = out.index(b"\n", pos)
        _, bw, bh = out[pos:nl].split()
        bw, bh = int(bw), int(bh)
        n = bw * bh * 64 * 4
        comps.append(np.frombuffer(out[nl + 1 : nl + 1 + n], "<i4")
                     .reshape(bh, bw, 64))
        pos = nl + 1 + n
    return comps


def _my_coefs(jpg):
    import livre_spark.functions.jpeg as J
    frames = []
    o1, o2 = J._decode_scan, J._decode_scan_arith

    def s1(buf, scan, frame, *a):
        frames.append(frame)
        return o1(buf, scan, frame, *a)

    def s2(buf, scan, frame, *a):
        frames.append(frame)
        return o2(buf, scan, frame, *a)

    J._decode_scan, J._decode_scan_arith = s1, s2
    try:
        decode_jpeg(jpg)
    finally:
        J._decode_scan, J._decode_scan_arith = o1, o2
    return [c["coef"] for c in frames[-1]["comps"]]


def _coef_equal(mine, ref):
    return all(np.array_equal(m[: r.shape[0], : r.shape[1]], r)
               for m, r in zip(mine, ref))


def test_zigzag_is_the_t81_sequence():
    """Pinned against the published T.81 scan order - the round-5
    generator walked the even anti-diagonals in the wrong direction,
    invisible to the self-consistent twins but wrong on every real
    third-party file."""
    assert list(ZIGZAG) == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19,
        26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42,
        49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59,
        52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


@needs_libjpeg
@pytest.mark.parametrize("w,h,nc,q,prog", [
    (32, 24, 3, 80, 0), (40, 33, 1, 50, 0), (48, 48, 3, 85, 1),
    (64, 40, 3, 35, 1),
])
def test_real_huffman_files_coefficient_exact(w, h, nc, q, prog):
    """Baseline and progressive HUFFMAN files produced by libjpeg
    decode coefficient-exact - the independent-implementation gate the
    zigzag bug slipped past."""
    rng = np.random.default_rng(w + h + q)
    img = rng.integers(0, 256, size=(h, w, nc), dtype=np.uint8)
    jpg = _ref_encode(img, q, prog, arith=False)
    assert _coef_equal(_my_coefs(jpg), _ref_coefs(jpg))


@needs_libjpeg
@pytest.mark.parametrize("w,h,nc,q,prog", [
    (32, 24, 3, 80, 0), (16, 16, 1, 95, 0), (40, 33, 3, 30, 0),
    (8, 8, 1, 70, 0), (48, 48, 3, 85, 1), (40, 33, 1, 50, 1),
    (64, 48, 3, 40, 1),
])
def test_real_arithmetic_files_coefficient_exact(w, h, nc, q, prog):
    """SOF9/SOF10 arithmetic bitstreams from libjpeg decode
    coefficient-exact: QM state machine, DC/AC decision models, DAC
    conditioning, progressive first/refinement passes."""
    rng = np.random.default_rng(w * h + q)
    img = rng.integers(0, 256, size=(h, w, nc), dtype=np.uint8)
    jpg = _ref_encode(img, q, prog, arith=True)
    assert _coef_equal(_my_coefs(jpg), _ref_coefs(jpg))


@needs_libjpeg
def test_twin_arith_bitstreams_accepted_by_libjpeg():
    """Reverse circle: encode_jpeg_arith's output is CONFORMANT -
    libjpeg's coefficient dump equals my own coefficients."""
    rng = np.random.default_rng(9)
    for (w, h, gray, sub) in [(17, 24, False, "444"),
                              (32, 24, False, "420"),
                              (16, 16, True, "444")]:
        nc = 1 if gray else 3
        px = rng.integers(0, 256, size=(h, w, nc), dtype=np.uint8)
        jpg = encode_jpeg_arith(w, h, px.tobytes(), gray=gray,
                                subsampling=sub)
        assert _coef_equal(_my_coefs(jpg), _ref_coefs(jpg))


@pytest.mark.parametrize("sub", ["444", "420", "422"])
def test_arith_twin_matches_huffman_twin(sub):
    """Same coefficient plan, different entropy layer: the arithmetic
    twin and the Huffman twin must decode BYTE-IDENTICALLY (no libjpeg
    needed)."""
    rng = np.random.default_rng(3)
    w, h = 24, 17
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
    a = decode_jpeg(encode_jpeg_arith(w, h, px, subsampling=sub))
    b = decode_jpeg(encode_jpeg(w, h, px, subsampling=sub))
    assert a == b


def test_arith_containment():
    """Corrupted arithmetic streams stay inside the JpegError /
    NotImplementedError family (row containment contract)."""
    import random
    rng = random.Random(4)
    px = bytes(range(64)) * 3
    jpg = encode_jpeg_arith(8, 8, px[: 8 * 8 * 3])
    for _ in range(80):
        b = bytearray(jpg)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        try:
            decode_jpeg(bytes(b))
        except (JpegError, NotImplementedError, ValueError):
            pass

    # hostile DAC values are rejected loudly
    bad = bytearray(jpg)
    at = bytes(bad).index(b"\xff\xcc") + 4
    bad[at + 3] = 0  # AC Kx = 0, outside the legal 1..63
    ok = False
    try:
        decode_jpeg(bytes(bad))
    except (JpegError, ValueError):
        ok = True
    assert ok


def test_progressive_twin_still_matches_after_zigzag_fix():
    """The Huffman twins stay self-consistent with the corrected
    table (progressive == baseline byte-identical)."""
    rng = np.random.default_rng(8)
    w, h = 24, 17
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
    a = decode_jpeg(encode_jpeg_progressive(w, h, px))
    b = decode_jpeg(encode_jpeg(w, h, px))
    assert a == b


@needs_libjpeg
@pytest.mark.parametrize("w,h,nc,prog,rst", [
    (64, 48, 3, 0, 2), (64, 48, 3, 0, 1), (48, 48, 3, 1, 3),
    (40, 33, 1, 0, 2),
])
def test_arith_restart_markers_coefficient_exact(w, h, nc, prog, rst):
    """RSTn inside arithmetic scans: statistics, contexts, predictors
    and the QM registers all reinitialize at each marker (sequential
    AND progressive)."""
    rng = np.random.default_rng(w + rst)
    img = rng.integers(0, 256, size=(h, w, nc), dtype=np.uint8)
    r = subprocess.run(
        [_HELPER, "encode", str(w), str(h), str(nc), "70",
         str(prog), "1", str(rst)],
        input=img.tobytes(), capture_output=True)
    assert r.returncode == 0
    jpg = r.stdout
    n_rst = sum(1 for i in range(len(jpg) - 1)
                if jpg[i] == 0xFF and 0xD0 <= jpg[i + 1] <= 0xD7)
    assert n_rst > 0
    assert _coef_equal(_my_coefs(jpg), _ref_coefs(jpg))
