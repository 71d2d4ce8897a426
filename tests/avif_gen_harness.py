"""Generate a REAL AVIF file with the system libavif (ctypes over the
public 0.11 ABI) - run in a SUBPROCESS by the tests so an ABI mismatch
crashes the child, not the suite.  Usage: python avif_gen_harness.py
<w> <h> <out_path>; exit 0 on success."""
import sys

import ctypes

lib = ctypes.CDLL("libavif.so.15")

class avifRWData(ctypes.Structure):
    _fields_ = [("data", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t)]

lib.avifImageCreate.restype = ctypes.c_void_p
lib.avifImageCreate.argtypes = [ctypes.c_uint32, ctypes.c_uint32,
                                ctypes.c_uint32, ctypes.c_int]
lib.avifImageAllocatePlanes.argtypes = [ctypes.c_void_p, ctypes.c_int]
lib.avifEncoderCreate.restype = ctypes.c_void_p
lib.avifEncoderWrite.restype = ctypes.c_int
lib.avifEncoderWrite.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.POINTER(avifRWData)]

AVIF_PIXEL_FORMAT_YUV420 = 3  # guess; 0 none,1 444,2 422,3 420,4 400
W, H = int(sys.argv[1]), int(sys.argv[2])
img = lib.avifImageCreate(W, H, 8, AVIF_PIXEL_FORMAT_YUV420)

rc = lib.avifImageAllocatePlanes(img, 1)  # AVIF_PLANES_YUV = (1<<0)

# read yuvPlanes pointers at offset 24 (width0 height4 depth8 fmt12 range16 pos20 pad -> 24)

ptrs = ctypes.cast(img + 24, ctypes.POINTER(ctypes.c_void_p))

rows = ctypes.cast(img + 48, ctypes.POINTER(ctypes.c_uint32))

# fill Y/U/V constant
for pi, (sz, val) in enumerate([(H*rows[0], 120), (((H+1)//2)*rows[1], 128), (((H+1)//2)*rows[2], 128)]):
    if ptrs[pi]:
        ctypes.memset(ptrs[pi], val, sz)
enc = lib.avifEncoderCreate()
out = avifRWData()
rc = lib.avifEncoderWrite(enc, img, ctypes.byref(out))

if rc != 0 or not out.size:
    sys.exit(1)
data = ctypes.string_at(out.data, out.size)
open(sys.argv[3], "wb").write(data)
