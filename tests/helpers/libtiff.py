"""ctypes surface of the system libtiff — two-way oracle for the TIFF
codec tests: read our files with the C reference, and write reference
files for our decoder."""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np


def load():
    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    # TIFFSetField/TIFFGetField are varargs: leave argtypes unset
    return lib


def read_rgb(lib, data: bytes, w: int, h: int) -> np.ndarray | None:
    """Decode TIFF bytes with libtiff (top-left oriented RGBA read);
    None when libtiff rejects them."""
    tmp = tempfile.NamedTemporaryFile(suffix=".tif", delete=False)
    tmp.write(data)
    tmp.close()
    try:
        tif = lib.TIFFOpen(tmp.name.encode(), b"r")
        if not tif:
            return None
        T = ctypes.c_void_p(tif)
        buf = (ctypes.c_uint32 * (w * h))()
        ok = lib.TIFFReadRGBAImageOriented(T, w, h, buf, 1, 0)
        lib.TIFFClose(T)
        if ok != 1:
            return None
        return (
            np.frombuffer(bytes(buf), np.uint8)
            .reshape(h, w, 4)[..., :3]
            .copy()
        )
    finally:
        os.unlink(tmp.name)


def write_rgb(
    lib,
    img: np.ndarray,
    compression: int,
    predictor: int = 1,
    rows_per_strip: int = 8,
    bits: int = 8,
) -> bytes:
    """Encode an RGB array (uint8 or uint16 per ``bits``) with
    libtiff's own writer."""
    h, w = img.shape[:2]
    tmp = tempfile.mktemp(suffix=".tif")
    tif = lib.TIFFOpen(tmp.encode(), b"w")
    assert tif, "libtiff writer failed to open"
    T = ctypes.c_void_p(tif)
    lib.TIFFSetField(T, 256, ctypes.c_uint32(w))
    lib.TIFFSetField(T, 257, ctypes.c_uint32(h))
    lib.TIFFSetField(T, 258, ctypes.c_uint16(bits))
    lib.TIFFSetField(T, 259, ctypes.c_uint16(compression))
    lib.TIFFSetField(T, 262, ctypes.c_uint16(2))
    lib.TIFFSetField(T, 277, ctypes.c_uint16(3))
    lib.TIFFSetField(T, 278, ctypes.c_uint32(rows_per_strip))
    lib.TIFFSetField(T, 284, ctypes.c_uint16(1))
    if predictor == 2:
        lib.TIFFSetField(T, 317, ctypes.c_uint16(2))
    try:
        for y in range(h):
            row = np.ascontiguousarray(img[y]).tobytes()
            assert (
                lib.TIFFWriteScanline(
                    T, row, ctypes.c_uint32(y), ctypes.c_uint16(0)
                )
                == 1
            ), f"scanline {y}"
        lib.TIFFClose(T)
        with open(tmp, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(tmp)


def write_rgb_tiled(
    lib,
    img: np.ndarray,
    compression: int,
    predictor: int = 1,
    tile: tuple[int, int] = (32, 16),
) -> bytes:
    """Encode an RGB array as a TILED TIFF with libtiff's writer."""
    h, w = img.shape[:2]
    tw, th = tile
    tmp = tempfile.mktemp(suffix=".tif")
    tif = lib.TIFFOpen(tmp.encode(), b"w")
    assert tif, "libtiff writer failed to open"
    T = ctypes.c_void_p(tif)
    lib.TIFFSetField(T, 256, ctypes.c_uint32(w))
    lib.TIFFSetField(T, 257, ctypes.c_uint32(h))
    lib.TIFFSetField(T, 258, ctypes.c_uint16(8))
    lib.TIFFSetField(T, 259, ctypes.c_uint16(compression))
    lib.TIFFSetField(T, 262, ctypes.c_uint16(2))
    lib.TIFFSetField(T, 277, ctypes.c_uint16(3))
    lib.TIFFSetField(T, 284, ctypes.c_uint16(1))
    lib.TIFFSetField(T, 322, ctypes.c_uint32(tw))
    lib.TIFFSetField(T, 323, ctypes.c_uint32(th))
    if predictor == 2:
        lib.TIFFSetField(T, 317, ctypes.c_uint16(2))
    try:
        across, down = -(-w // tw), -(-h // th)
        for ty in range(down):
            for tx in range(across):
                buf = np.zeros((th, tw, 3), np.uint8)
                sub = img[ty * th : ty * th + th, tx * tw : tx * tw + tw]
                buf[: sub.shape[0], : sub.shape[1]] = sub
                r = lib.TIFFWriteEncodedTile(
                    T,
                    ctypes.c_uint32(ty * across + tx),
                    np.ascontiguousarray(buf).tobytes(),
                    ctypes.c_ssize_t(th * tw * 3),
                )
                assert r > 0, "tile write failed"
        lib.TIFFClose(T)
        with open(tmp, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(tmp)


def write_rgb_planar(
    lib,
    img: np.ndarray,
    compression: int,
    predictor: int = 1,
    rows_per_strip: int = 7,
) -> bytes:
    """Encode an RGB array as PlanarConfig=2 (separate planes)."""
    h, w = img.shape[:2]
    tmp = tempfile.mktemp(suffix=".tif")
    tif = lib.TIFFOpen(tmp.encode(), b"w")
    assert tif, "libtiff writer failed to open"
    T = ctypes.c_void_p(tif)
    lib.TIFFSetField(T, 256, ctypes.c_uint32(w))
    lib.TIFFSetField(T, 257, ctypes.c_uint32(h))
    lib.TIFFSetField(T, 258, ctypes.c_uint16(8))
    lib.TIFFSetField(T, 259, ctypes.c_uint16(compression))
    lib.TIFFSetField(T, 262, ctypes.c_uint16(2))
    lib.TIFFSetField(T, 277, ctypes.c_uint16(3))
    lib.TIFFSetField(T, 278, ctypes.c_uint32(rows_per_strip))
    lib.TIFFSetField(T, 284, ctypes.c_uint16(2))
    if predictor == 2:
        lib.TIFFSetField(T, 317, ctypes.c_uint16(2))
    try:
        for c in range(3):
            for y in range(h):
                row = np.ascontiguousarray(img[y, :, c]).tobytes()
                assert (
                    lib.TIFFWriteScanline(
                        T, row, ctypes.c_uint32(y), ctypes.c_uint16(c)
                    )
                    == 1
                ), f"plane {c} scanline {y}"
        lib.TIFFClose(T)
        with open(tmp, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(tmp)
