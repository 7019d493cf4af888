"""Dependency-free baseline TIFF codec (TIFF 6.0, uncompressed).

Covers the flavor ML corpora actually contain as TIFF: uncompressed
(Compression=1), chunky (PlanarConfig=1), strip-organized, 8 bits per
sample, grayscale (Photometric 0/1, including WhiteIsZero inversion)
or RGB(A) — both byte orders (II little / MM big endian). Everything
else — LZW/PackBits/JPEG-in-TIFF compression, tiles, planar layout,
16-bit — raises ``ValueError`` so :func:`.multimodal.decode_image`
falls back to its stub, same contract as the sibling codecs.

Encoder: minimal single-strip little-endian RGB for round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_ifd_value(buf: bytes, bo: str, vtype: int, count: int, raw: bytes):
    """Decode an IFD entry's value list (inline or via offset)."""
    size = _TYPE_SIZE.get(vtype)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        if off + total > len(buf):
            raise ValueError("TIFF value offset out of range")
        data = buf[off : off + total]
    if vtype == 3:
        return list(struct.unpack(bo + "H" * count, data))
    if vtype == 4:
        return list(struct.unpack(bo + "I" * count, data))
    if vtype == 1:
        return list(data)
    return None


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode an uncompressed baseline TIFF into HxWx3 uint8 RGB."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset out of range")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(payload):
            raise ValueError("truncated TIFF IFD")
        tag, vtype, count = struct.unpack_from(bo + "HHI", payload, base)
        val = _read_ifd_value(
            payload, bo, vtype, count, payload[base + 8 : base + 12]
        )
        if val is not None:
            tags[tag] = val

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    planar = one(284, 1)
    bits = tags.get(258, [8])
    if compression != 1:
        raise ValueError(f"unsupported TIFF compression {compression}")
    if planar != 1:
        raise ValueError("planar TIFF is not supported")
    if any(b != 8 for b in bits):
        raise ValueError("only 8-bit TIFF samples are supported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF is not supported")
    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if photometric == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    if w <= 0 or h <= 0:
        raise ValueError("empty TIFF image")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing or inconsistent")
    rps = one(278, h)
    if rps <= 0:
        raise ValueError("bad TIFF RowsPerStrip")
    if len(offsets) != -(-h // rps):
        raise ValueError("TIFF strip count inconsistent with RowsPerStrip")
    data = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        # a writer that pads strips would otherwise silently shift every
        # subsequent pixel row (ADVICE r07) — require each strip to hold
        # exactly its rows, like the other unsupported-layout checks
        rows_in_strip = min(rps, h - i * rps)
        if cnt != rows_in_strip * w * spp:
            raise ValueError(
                f"TIFF strip {i} holds {cnt} bytes, expected "
                f"{rows_in_strip * w * spp} (padded/packed strips are "
                "not supported)"
            )
        if off + cnt > len(payload):
            raise ValueError("TIFF strip out of range")
        data += payload[off : off + cnt]
    px = np.frombuffer(bytes(data), np.uint8).reshape(h, w, spp)
    if photometric == 2:
        return np.ascontiguousarray(px[:, :, :3])  # drop alpha/extras
    g = px[:, :, 0]
    if photometric == 0:  # WhiteIsZero
        g = 255 - g
    return np.repeat(g[:, :, None], 3, axis=2)


def encode_tiff(pixels: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 RGB as a single-strip little-endian TIFF."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected an HxWx3 RGB array")
    h, w, _ = pixels.shape
    data = np.ascontiguousarray(pixels, np.uint8).tobytes()
    # layout: header(8) + pixel data + IFD
    strip_off = 8
    ifd_off = strip_off + len(data)
    entries = [
        (256, 4, 1, w),           # ImageWidth
        (257, 4, 1, h),           # ImageLength
        (258, 3, 3, None),        # BitsPerSample -> offset
        (259, 3, 1, 1),           # Compression: none
        (262, 3, 1, 2),           # Photometric: RGB
        (273, 4, 1, strip_off),   # StripOffsets
        (277, 3, 1, 3),           # SamplesPerPixel
        (278, 4, 1, h),           # RowsPerStrip
        (279, 4, 1, len(data)),   # StripByteCounts
        (284, 3, 1, 1),           # PlanarConfig: chunky
    ]
    bits_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += data
    out += struct.pack("<H", len(entries))
    for tag, vtype, count, value in entries:
        if tag == 258:
            out += struct.pack("<HHII", tag, vtype, count, bits_off)
        elif vtype == 3:
            out += struct.pack("<HHIHH", tag, vtype, count, value, 0)
        else:
            out += struct.pack("<HHII", tag, vtype, count, value)
    out += struct.pack("<I", 0)  # no next IFD
    out += struct.pack("<HHH", 8, 8, 8)  # BitsPerSample values
    return bytes(out)
