"""ctypes harness over the system giflib (libgif.so.7) — the canonical
reference GIF decoder — used by tests/test_mediacodec.py to prove
encode_gif emits standards-conformant streams (variable-width LZW late
change, 4096-table clears, interlace layout), not merely self-consistent
ones.  Import-guarded: tests skip when libgif is absent.

NOTE: giflib 5's DGifSlurp DE-INTERLACES into RasterBits (dgif_lib.c's
InterlacedOffset/Jumps loop), so RasterBits is display order for both
interlaced and sequential files.
"""
from __future__ import annotations

import ctypes
import ctypes.util


class GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int), ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.POINTER(GifColorType))]


class GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", ctypes.c_int), ("Top", ctypes.c_int),
                ("Width", ctypes.c_int), ("Height", ctypes.c_int),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(ColorMapObject))]


class SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p)]


class GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", ctypes.c_int), ("SHeight", ctypes.c_int),
                ("SColorResolution", ctypes.c_int),
                ("SBackGroundColor", ctypes.c_int),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", GifImageDesc),
                ("SavedImages", ctypes.POINTER(SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


def _load():
    name = ctypes.util.find_library("gif") or "libgif.so.7"
    lib = ctypes.CDLL(name)
    lib.DGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.DGifOpenFileName.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
    lib.GifMakeMapObject.restype = ctypes.POINTER(ColorMapObject)
    lib.GifMakeMapObject.argtypes = [ctypes.c_int,
                                     ctypes.POINTER(GifColorType)]
    lib.EGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.EGifOpenFileName.argtypes = [ctypes.c_char_p, ctypes.c_bool,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.EGifPutScreenDesc.argtypes = [ctypes.POINTER(GifFileType),
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.POINTER(ColorMapObject)]
    lib.EGifPutImageDesc.argtypes = [ctypes.POINTER(GifFileType),
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_bool,
                                     ctypes.POINTER(ColorMapObject)]
    lib.EGifPutLine.argtypes = [ctypes.POINTER(GifFileType),
                                ctypes.POINTER(ctypes.c_ubyte),
                                ctypes.c_int]
    lib.EGifCloseFile.argtypes = [ctypes.POINTER(GifFileType),
                                  ctypes.POINTER(ctypes.c_int)]
    return lib


try:
    _LIB = _load()
    AVAILABLE = True
except OSError:  # pragma: no cover - environment without giflib
    _LIB = None
    AVAILABLE = False


def giflib_decode_gray(path: str) -> tuple[int, int, list[int]]:
    """Decode a single-image grayscale-palette GIF with the system giflib,
    returning (width, height, display-order gray raster)."""
    err = ctypes.c_int(0)
    g = _LIB.DGifOpenFileName(path.encode(), ctypes.byref(err))
    if not g:
        raise ValueError(f"giflib open failed: error {err.value}")
    if _LIB.DGifSlurp(g) != 1:
        raise ValueError(f"giflib slurp failed: error {g.contents.Error}")
    gc = g.contents
    if gc.ImageCount != 1:
        raise ValueError(f"expected 1 image, got {gc.ImageCount}")
    im = gc.SavedImages[0]
    w, h = im.ImageDesc.Width, im.ImageDesc.Height
    cmap = im.ImageDesc.ColorMap or gc.SColorMap
    cols = cmap.contents.Colors
    gray = []
    for i in range(w * h):
        col = cols[im.RasterBits[i]]
        if not (col.Red == col.Green == col.Blue):
            raise ValueError("non-gray palette entry")
        gray.append(col.Red)
    return w, h, gray


def giflib_encode_gray(path: str, gray: list[int], width: int,
                       height: int) -> None:
    """Encode a grayscale raster to a GIF with the system giflib — a
    genuinely foreign stream for decode_gif conformance (sequential rows;
    giflib's own LZW encoder with its clear/width conventions)."""
    colors = (GifColorType * 256)(*[GifColorType(i, i, i)
                                    for i in range(256)])
    cmap = _LIB.GifMakeMapObject(256, colors)
    if not cmap:
        raise ValueError("GifMakeMapObject failed")
    err = ctypes.c_int(0)
    g = _LIB.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
    if not g:
        raise ValueError(f"giflib encode-open failed: error {err.value}")
    if _LIB.EGifPutScreenDesc(g, width, height, 8, 0, cmap) != 1:
        raise ValueError(f"EGifPutScreenDesc: error {g.contents.Error}")
    if _LIB.EGifPutImageDesc(g, 0, 0, width, height, False, None) != 1:
        raise ValueError(f"EGifPutImageDesc: error {g.contents.Error}")
    for r in range(height):
        row = (ctypes.c_ubyte * width)(*gray[r * width:(r + 1) * width])
        if _LIB.EGifPutLine(g, row, width) != 1:
            raise ValueError(f"EGifPutLine: error {g.contents.Error}")
    if _LIB.EGifCloseFile(g, ctypes.byref(err)) != 1:
        raise ValueError(f"EGifCloseFile: error {err.value}")


def giflib_decode_gray_frames(path: str) -> tuple[int, int,
                                                  list[list[int]]]:
    """Decode EVERY image of a grayscale-palette GIF with the system
    giflib -> (width, height, frames in display order). DGifSlurp
    de-interlaces per image, so RasterBits is display order for each
    frame regardless of its interlace flag."""
    err = ctypes.c_int(0)
    g = _LIB.DGifOpenFileName(path.encode(), ctypes.byref(err))
    if not g:
        raise ValueError(f"giflib open failed: error {err.value}")
    if _LIB.DGifSlurp(g) != 1:
        raise ValueError(f"giflib slurp failed: error {g.contents.Error}")
    gc = g.contents
    frames = []
    w = h = None
    for i in range(gc.ImageCount):
        im = gc.SavedImages[i]
        w, h = im.ImageDesc.Width, im.ImageDesc.Height
        cmap = im.ImageDesc.ColorMap or gc.SColorMap
        cols = cmap.contents.Colors
        gray = []
        for j in range(w * h):
            col = cols[im.RasterBits[j]]
            if not (col.Red == col.Green == col.Blue):
                raise ValueError("non-gray palette entry")
            gray.append(col.Red)
        frames.append(gray)
    return w, h, frames


def giflib_encode_gray_frames(path: str, frames: list[list[int]],
                              width: int, height: int) -> None:
    """Encode several full-screen grayscale frames with the system giflib
    (one EGifPutImageDesc per frame) — a genuinely foreign multi-image
    stream for decode_gif_anim conformance."""
    colors = (GifColorType * 256)(*[GifColorType(i, i, i)
                                    for i in range(256)])
    cmap = _LIB.GifMakeMapObject(256, colors)
    if not cmap:
        raise ValueError("GifMakeMapObject failed")
    err = ctypes.c_int(0)
    g = _LIB.EGifOpenFileName(path.encode(), False, ctypes.byref(err))
    if not g:
        raise ValueError(f"giflib encode-open failed: error {err.value}")
    if _LIB.EGifPutScreenDesc(g, width, height, 8, 0, cmap) != 1:
        raise ValueError(f"EGifPutScreenDesc: error {g.contents.Error}")
    for gray in frames:
        if _LIB.EGifPutImageDesc(g, 0, 0, width, height, False,
                                 None) != 1:
            raise ValueError(f"EGifPutImageDesc: error {g.contents.Error}")
        for r in range(height):
            row = (ctypes.c_ubyte * width)(
                *gray[r * width:(r + 1) * width])
            if _LIB.EGifPutLine(g, row, width) != 1:
                raise ValueError(f"EGifPutLine: error {g.contents.Error}")
    if _LIB.EGifCloseFile(g, ctypes.byref(err)) != 1:
        raise ValueError(f"EGifCloseFile: error {err.value}")
