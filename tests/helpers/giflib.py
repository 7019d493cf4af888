"""ctypes surface of the system giflib (DGifSlurp reader) — test
oracle for GIF fixtures: struct layouts are the public giflib 5.x ABI
(gif_lib.h)."""

from __future__ import annotations

import ctypes

GifWord = ctypes.c_int


class GifColorType(ctypes.Structure):
    _fields_ = [
        ("Red", ctypes.c_ubyte),
        ("Green", ctypes.c_ubyte),
        ("Blue", ctypes.c_ubyte),
    ]


class ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_bool),
        ("Colors", ctypes.POINTER(GifColorType)),
    ]


class GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", GifWord),
        ("Top", GifWord),
        ("Width", GifWord),
        ("Height", GifWord),
        ("Interlace", ctypes.c_bool),
        ("ColorMap", ctypes.POINTER(ColorMapObject)),
    ]


class SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", GifImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
    ]


class GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", GifWord),
        ("SHeight", GifWord),
        ("SColorResolution", GifWord),
        ("SBackGroundColor", GifWord),
        ("AspectByte", ctypes.c_ubyte),
        ("SColorMap", ctypes.POINTER(ColorMapObject)),
        ("ImageCount", ctypes.c_int),
        ("Image", GifImageDesc),
        ("SavedImages", ctypes.POINTER(SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.c_void_p),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


class GraphicsControlBlock(ctypes.Structure):
    _fields_ = [
        ("DisposalMode", ctypes.c_int),
        ("UserInputFlag", ctypes.c_bool),
        ("DelayTime", ctypes.c_int),
        ("TransparentColor", ctypes.c_int),
    ]


def load():
    try:
        lib = ctypes.CDLL("libgif.so.7")
    except OSError:
        return None
    lib.DGifOpenFileName.restype = ctypes.POINTER(GifFileType)
    lib.DGifOpenFileName.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
    lib.DGifSavedExtensionToGCB.argtypes = [
        ctypes.POINTER(GifFileType),
        ctypes.c_int,
        ctypes.POINTER(GraphicsControlBlock),
    ]
    return lib


def slurp(lib, data: bytes):
    """Parse GIF bytes with giflib; returns a list of per-frame dicts
    (rect, delay_cs, disposal, transparent, rgb raster)."""
    import os
    import tempfile

    import numpy as np

    tmp = tempfile.NamedTemporaryFile(suffix=".gif", delete=False)
    tmp.write(data)
    tmp.close()
    try:
        err = ctypes.c_int()
        f = lib.DGifOpenFileName(tmp.name.encode(), ctypes.byref(err))
        if not f:
            raise ValueError(f"giflib open error {err.value}")
        if lib.DGifSlurp(f) != 1:
            raise ValueError(f"giflib slurp error {f.contents.Error}")
        g = f.contents
        out = {
            "screen": (g.SWidth, g.SHeight),
            "bg_index": g.SBackGroundColor,
            "frames": [],
        }
        for i in range(g.ImageCount):
            si = g.SavedImages[i]
            d = si.ImageDesc
            gcb = GraphicsControlBlock()
            has_gcb = lib.DGifSavedExtensionToGCB(f, i, ctypes.byref(gcb))
            raster = np.ctypeslib.as_array(
                si.RasterBits, shape=(d.Width * d.Height,)
            ).copy()
            cmap = (d.ColorMap or g.SColorMap).contents
            colors = (
                np.ctypeslib.as_array(
                    ctypes.cast(cmap.Colors, ctypes.POINTER(ctypes.c_ubyte)),
                    shape=(cmap.ColorCount * 3,),
                )
                .reshape(-1, 3)
                .copy()
            )
            out["frames"].append(
                {
                    "rect": (d.Left, d.Top, d.Width, d.Height),
                    "delay_cs": gcb.DelayTime if has_gcb else 0,
                    "disposal": gcb.DisposalMode if has_gcb else 0,
                    "transparent": (
                        gcb.TransparentColor if has_gcb else -1
                    ),
                    "indices": raster.reshape(d.Height, d.Width),
                    "rgb": colors[raster].reshape(d.Height, d.Width, 3),
                }
            )
        return out
    finally:
        os.unlink(tmp.name)
