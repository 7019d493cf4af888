"""Pure-Python PNG codec (RFC 2083 / ISO 15948) over stdlib ``zlib``.

PNG needs no external library at all: chunk framing, DEFLATE (stdlib
zlib), and the five scanline filters. This module is the baseline codec
behind :func:`.multimodal.decode_image`, same contract as the sibling
:mod:`.jpeg` module — decode to HxWx3 uint8 RGB.

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), both non-interlaced and Adam7-interlaced
(each of the seven passes is its own filtered sub-image; filters reset
per pass). Alpha is dropped (the RGB contract downstream has no alpha
lane; compositing policy belongs to the consumer). Rejected with
``ValueError``: other bit depths — the caller treats that as "not
decodable here".

Filters None/Sub/Up are vectorized (Sub is a per-byte-lane prefix sum);
Average/Paeth fall back to a per-byte loop — correct first, and encoders
that emit them are rare in machine-generated corpora. The encoder always
writes filter 0, so encode->decode roundtrips are byte-lossless, which
the multimodal tests rely on.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x_start, y_start, x_step, y_step) per spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the five scanline filters over an (h, w*ch) sub-image
    whose serialized form is h rows of 1 filter byte + w*ch data bytes
    (a whole image, or one Adam7 pass — filters reset per pass)."""
    stride = w * ch
    rows = np.frombuffer(raw, np.uint8, (stride + 1) * h).reshape(
        h, stride + 1
    )
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)
    prev = np.zeros(stride, np.int64)
    out = np.empty((h, stride), np.uint8)
    for y in range(h):
        f = filters[y]
        row = data[y]
        if f == 0:
            pass
        elif f == 1:  # Sub: prefix sum within each byte lane (stride ch)
            for lane in range(ch):
                row[lane::ch] = np.cumsum(row[lane::ch]) % 256
        elif f == 2:  # Up
            row = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential per byte
            row = row.copy()
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                if f == 3:
                    row[i] = (row[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                    row[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = row
        prev = row.astype(np.int64)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode PNG bytes to an HxWx3 uint8 RGB array (alpha dropped).

    Raises ``ValueError`` for non-PNG input or unsupported variants.
    """
    if len(payload) < 8 or payload[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + CRC
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG is supported (depth {depth})")
    if color not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if w <= 0 or h <= 0 or not idat:
        raise ValueError("empty PNG image")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from None
    ch = _CHANNELS[color]
    if interlace == 0:
        stride = w * ch
        if len(raw) != (stride + 1) * h:
            raise ValueError("IDAT size does not match dimensions")
        px = _unfilter(raw, h, w, ch).reshape(h, w, ch)
    else:
        px = np.empty((h, w, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            need = (pw * ch + 1) * ph
            if len(raw) < off + need:
                raise ValueError("IDAT size does not match Adam7 passes")
            sub = _unfilter(raw[off : off + need], ph, pw, ch)
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
            off += need
        if off != len(raw):
            raise ValueError("trailing bytes after the final Adam7 pass")
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx]
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])  # RGB / RGBA minus alpha


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a filter-0 truecolor PNG.

    Byte-lossless under :func:`decode_png` — the multimodal fixture and
    resize re-encode path."""
    h, w, _ = pixels.shape
    body = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (
        _SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(body, 6))
        + chunk(b"IEND", b"")
    )
