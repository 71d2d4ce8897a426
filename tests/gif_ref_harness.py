"""giflib (v7 ABI) via ctypes - test-only cross-validation harness.

The struct layouts are the public giflib 5.x ABI (GifFileType,
SavedImage, ColorMapObject); ``lib`` is None when the system library
is absent and the dependent tests skip."""
import ctypes

GifWord = ctypes.c_int


class GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int),
                ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.POINTER(GifColorType))]


class GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", GifWord), ("Top", GifWord),
                ("Width", GifWord), ("Height", GifWord),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(ColorMapObject))]


class ExtensionBlock(ctypes.Structure):
    _fields_ = [("ByteCount", ctypes.c_int),
                ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
                ("Function", ctypes.c_int)]


class SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock))]


class GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", GifWord), ("SHeight", GifWord),
                ("SColorResolution", GifWord),
                ("SBackGroundColor", GifWord),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", GifImageDesc),
                ("SavedImages", ctypes.POINTER(SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock)),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


try:
    lib = ctypes.CDLL("libgif.so.7")
except OSError:
    lib = None

if lib is not None:
    lib.DGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
    lib.DGifCloseFile.argtypes = [ctypes.POINTER(GifFileType),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.EGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.EGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.c_bool,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.GifMakeMapObject.restype = ctypes.POINTER(ColorMapObject)
    lib.GifMakeMapObject.argtypes = [ctypes.c_int,
                                     ctypes.POINTER(GifColorType)]
    lib.EGifPutScreenDesc.argtypes = [ctypes.POINTER(GifFileType), ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                      ctypes.POINTER(ColorMapObject)]
    lib.EGifPutImageDesc.argtypes = [ctypes.POINTER(GifFileType), ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_bool,
                                     ctypes.POINTER(ColorMapObject)]
    lib.EGifPutLine.argtypes = [ctypes.POINTER(GifFileType),
                                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.EGifCloseFile.argtypes = [ctypes.POINTER(GifFileType),
                                  ctypes.POINTER(ctypes.c_int)]


def ref_decode(path):
    """-> (sw, sh, frames); frame = (left, top, w, h, interlace,
    indices, local_palette_or_None, global_palette)."""
    err = ctypes.c_int(0)
    g = lib.DGifOpenFileName(path.encode(), ctypes.byref(err))
    if not g:
        raise RuntimeError(f"DGifOpen err {err.value}")
    if lib.DGifSlurp(g) != 1:
        e = g.contents.Error
        lib.DGifCloseFile(g, ctypes.byref(err))
        raise RuntimeError(f"DGifSlurp err {e}")
    c = g.contents
    def pal(cm):
        if not cm:
            return None
        n = cm.contents.ColorCount
        cols = cm.contents.Colors
        return [(cols[i].Red, cols[i].Green, cols[i].Blue)
                for i in range(n)]
    gpal = pal(c.SColorMap)
    frames = []
    for i in range(c.ImageCount):
        si = c.SavedImages[i]
        d = si.ImageDesc
        n = d.Width * d.Height
        idx = bytes(ctypes.cast(si.RasterBits,
                                ctypes.POINTER(ctypes.c_ubyte * n)).contents)
        frames.append((d.Left, d.Top, d.Width, d.Height,
                       bool(d.Interlace), idx, pal(d.ColorMap), gpal))
    out = (c.SWidth, c.SHeight, frames)
    lib.DGifCloseFile(g, ctypes.byref(err))
    return out


def ref_encode(path, w, h, palette, indices, interlace=False):
    """Write a real giflib-encoded single-frame GIF."""
    err = ctypes.c_int(0)
    cols = (GifColorType * len(palette))()
    for i, (r, gg, b) in enumerate(palette):
        cols[i] = GifColorType(r, gg, b)
    cm = lib.GifMakeMapObject(len(palette), cols)
    g = lib.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
    if not g:
        raise RuntimeError(f"EGifOpen err {err.value}")
    assert lib.EGifPutScreenDesc(g, w, h, 8, 0, cm) == 1
    assert lib.EGifPutImageDesc(g, 0, 0, w, h, interlace, None) == 1
    buf = (ctypes.c_ubyte * w)()
    if interlace:
        order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                 + [*range(2, h, 4)] + [*range(1, h, 2)])
    else:
        order = range(h)
    for y in order:
        for x in range(w):
            buf[x] = indices[y * w + x]
        assert lib.EGifPutLine(g, buf, w) == 1
    assert lib.EGifCloseFile(g, ctypes.byref(err)) == 1
