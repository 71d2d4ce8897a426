"""CCITT G3/G4 fax codec: table pins, hand-computed byte vectors,
encoder-twin roundtrips, and the end-to-end scanned-PDF path
(page_images -> kind="raster") including encrypted documents.

The reference rejects /CCITTFaxDecode (filtering.rs:50-53); everything
here is beyond-reference, pinned by the repo's encoder-twin pattern."""

import random

import numpy as np
import pytest

from livre_spark.pdf.ccitt import (
    BLACK_CODES, EXT_CODES, WHITE_CODES, decode_ccitt, encode_ccitt,
)
from livre_spark.pdf.errors import ParseError
from livre_spark.pdf.genpdf import build_pdf


def test_t4_table_spot_pins():
    """Pin a handful of T.4 codes straight from the published tables -
    a transcription swap in these is the class of error roundtrips
    can't catch."""
    assert WHITE_CODES[0] == "00110101"
    assert WHITE_CODES[1] == "000111"
    assert WHITE_CODES[63] == "00110100"
    assert WHITE_CODES[64] == "11011"
    assert WHITE_CODES[1728] == "010011011"
    assert BLACK_CODES[0] == "0000110111"
    assert BLACK_CODES[1] == "010"
    assert BLACK_CODES[2] == "11"
    assert BLACK_CODES[3] == "10"
    assert BLACK_CODES[63] == "000001100111"
    assert BLACK_CODES[64] == "0000001111"
    assert EXT_CODES[1792] == "00000001000"
    assert EXT_CODES[2560] == "000000011111"
    # 64 terminating + 27 make-up codes per colour, 13 shared extended
    assert len(WHITE_CODES) == len(BLACK_CODES) == 91
    assert len(EXT_CODES) == 13


def test_hand_vectors_g4():
    """Byte-exact G4 vectors computed by hand from T.6:
    all-white 8x1 is a single V0 bit; w2 b2 w4 is H + M(2w) + M(2b)
    + V0 = 001 0111 11 1."""
    assert encode_ccitt(b"\xff", 8, 1, k=-1, end_of_block=False) == b"\x80"
    assert decode_ccitt(b"\x80", columns=8, rows=1, k=-1) == b"\xff"
    assert encode_ccitt(b"\xcf", 8, 1, k=-1,
                        end_of_block=False) == bytes.fromhex("2fc0")
    assert decode_ccitt(bytes.fromhex("2fc0"), columns=8, rows=1,
                        k=-1) == b"\xcf"


def test_hand_vector_1d_standard_line():
    """A 1728-pixel all-white line codes as make-up 1728 + terminating
    0: 010011011 00110101 (T.4's own worked example)."""
    enc = encode_ccitt(b"\xff" * 216, 1728, 1, k=0, end_of_block=False)
    want = int("01001101100110101" + "0" * 7, 2).to_bytes(3, "big")
    assert enc == want
    assert decode_ccitt(enc, columns=1728, rows=1, k=0) == b"\xff" * 216


def _fax_like(rng, w, h):
    """Row-correlated random bilevel image (fax statistics-ish)."""
    stride = (w + 7) >> 3
    img = bytearray()
    prev = [rng.randrange(2) for _ in range(w)]
    for _ in range(h):
        rowpx = [p if rng.random() < 0.8 else 1 - p for p in prev]
        prev = rowpx
        row = bytearray(stride)
        for i, p in enumerate(rowpx):
            if p:
                row[i >> 3] |= 0x80 >> (i & 7)
        img += row
    return bytes(img)


@pytest.mark.parametrize("k", [-1, 0, 1, 4])
def test_roundtrip_all_modes(k):
    rng = random.Random(11 + k)
    for w, h in [(1, 1), (8, 3), (23, 9), (64, 17), (200, 31)]:
        img = _fax_like(rng, w, h)
        for ba in (False, True):
            for b1 in (False, True):
                enc = encode_ccitt(img, w, h, k=k, byte_align=ba,
                                   black_is_1=b1)
                assert decode_ccitt(enc, columns=w, rows=h, k=k,
                                    byte_align=ba, black_is_1=b1) == img
        # unknown row count: decode must stop at the EOFB/RTC
        enc = encode_ccitt(img, w, h, k=k)
        assert decode_ccitt(enc, columns=w, rows=0, k=k) == img


@pytest.mark.parametrize("run", [63, 64, 65, 1728, 1729, 1792, 2560, 3000])
def test_makeup_runs_both_colors(run):
    """Runs that exercise make-up and extended make-up codes."""
    w = run + 5
    stride = (w + 7) >> 3
    row = bytearray(stride)
    for i in range(run, w):
        row[i >> 3] |= 0x80 >> (i & 7)
    black_head = bytes(row)
    white_head = bytearray(b ^ 0xFF for b in row)
    for i in range(w, stride * 8):
        white_head[i >> 3] &= ~(0x80 >> (i & 7)) & 0xFF
    for img in (black_head, bytes(white_head)):
        for k in (-1, 0):
            enc = encode_ccitt(img, w, 1, k=k)
            assert decode_ccitt(enc, columns=w, rows=1, k=k) == img


def test_decode_containment_on_garbage():
    """Hostile bits raise ParseError (or return short), never crash."""
    rng = random.Random(99)
    for _ in range(300):
        data = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(1, 40)))
        for k in (-1, 0, 2):
            try:
                out = decode_ccitt(data, columns=17, rows=0, k=k)
                assert len(out) % 3 == 0  # stride 3 per row
            except ParseError:
                pass


def test_short_data_raises_when_rows_pinned():
    enc = encode_ccitt(b"\xff\xff", 16, 1, k=-1)
    with pytest.raises(ParseError):
        decode_ccitt(enc, columns=16, rows=5, k=-1)


def _expected_features_1bpp(img, w, h):
    from livre_spark.functions.multimodal import FEATURE_DIM

    stride = (w + 7) >> 3
    bits = np.unpackbits(np.frombuffer(img, dtype=np.uint8)
                         .reshape(h, stride), axis=1)[:, :w]
    samples = (bits * 255).astype(np.uint8).tobytes()
    hist = np.bincount(np.frombuffer(samples, dtype=np.uint8) >> 4,
                       minlength=FEATURE_DIM).astype(np.float64)
    return [float(x) for x in (hist / hist.sum()).astype(np.float32)]


@pytest.mark.parametrize("scheme,k,ba,b1", [
    (None, -1, False, False),
    (None, 0, False, True),
    (None, 4, True, False),
    ("rc4-128", -1, False, False),
    ("aes-256", -1, True, True),
])
def test_scanned_pdf_extracts_raster(scheme, k, ba, b1):
    """End-to-end: a CCITT image XObject (the scanned-PDF shape)
    decodes through page_images to kind='raster' with correct features,
    including through the per-object decrypt path."""
    from livre_spark.functions.pdfimages import extract_pdf_images

    rng = random.Random(5)
    w, h = 41, 13
    img = _fax_like(rng, w, h)
    payload = encode_ccitt(img, w, h, k=k, byte_align=ba, black_is_1=b1)
    parms = {"K": k, "Columns": w, "Rows": h}
    if ba:
        parms["EncodedByteAlign"] = True
    if b1:
        parms["BlackIs1"] = True
    pdf = build_pdf([b"BT (scan) Tj ET"], encrypt=scheme,
                    images=[{"name": "Scan0", "width": w, "height": h,
                             "ccitt": payload, "parms": parms}])
    (row,) = extract_pdf_images(pdf)
    assert row["kind"] == "raster", row
    assert row["error"] is None, row
    assert (row["width"], row["height"]) == (w, h)
    assert row["features"] == _expected_features_1bpp(img, w, h)


def test_scanned_pdf_rows_defaults_to_height():
    """/Rows absent -> the image /Height bounds the decode."""
    from livre_spark.functions.pdfimages import extract_pdf_images

    rng = random.Random(6)
    w, h = 30, 7
    img = _fax_like(rng, w, h)
    payload = encode_ccitt(img, w, h, k=-1)
    pdf = build_pdf([b"BT (s) Tj ET"],
                    images=[{"name": "S", "width": w, "height": h,
                             "ccitt": payload,
                             "parms": {"K": -1, "Columns": w}}])
    (row,) = extract_pdf_images(pdf)
    assert row["kind"] == "raster" and row["error"] is None
    assert row["features"] == _expected_features_1bpp(img, w, h)


def test_undecodable_ccitt_stays_codec_tagged():
    """Containment: a truncated fax payload keeps the raw bytes under
    kind='codec:CCITTFaxDecode' instead of failing the walk."""
    from livre_spark.functions.pdfimages import extract_pdf_images

    pdf = build_pdf([b"BT (s) Tj ET"],
                    images=[{"name": "Bad", "width": 64, "height": 9,
                             "ccitt": b"\x07",
                             "parms": {"K": -1, "Columns": 64,
                                       "Rows": 9}}])
    (row,) = extract_pdf_images(pdf)
    assert row["kind"] == "codec:CCITTFaxDecode"
    assert row["features"] is None and row["error"] is not None


def test_decompression_bomb_guard():
    """Attacker-controlled /Columns//Rows cannot demand multi-GB rows:
    oversized declarations raise before allocation, including the
    unknown-rows loop."""
    with pytest.raises(ParseError, match="TooLarge"):
        decode_ccitt(b"\x80" * 100, columns=1 << 30, rows=1, k=0)
    with pytest.raises(ParseError, match="TooLarge"):
        decode_ccitt(b"\x80" * 100, columns=1 << 13, rows=1 << 14, k=-1)
    # rows=0: many tiny rows must hit the cap, not spin to data end
    img = b"\xff"
    enc = encode_ccitt(img, 8, 1, k=0, end_of_block=False) * 500
    with pytest.raises(ParseError, match="TooLarge"):
        decode_ccitt(enc, columns=8, rows=0, k=0, max_pixels=80)


def test_long_fill_before_eol():
    """T.4 allows arbitrary zero fill before EOL (minimum scan-line
    time padding); >52 fill bits must still parse."""
    from livre_spark.pdf.ccitt import EOL, _BitWriter

    img = b"\xcf"
    bw = _BitWriter()
    for fill in (0, 13, 53, 200):
        bw.write("0" * fill + EOL)
        # row w2 b2 w4, 1-D: white2 black2 white4
        bw.write("0111" + "11" + "1011")
    data = bw.tobytes()
    out = decode_ccitt(data, columns=8, rows=4, k=0)
    assert out == img * 4
