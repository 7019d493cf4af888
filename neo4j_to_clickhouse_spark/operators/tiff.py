"""Dependency-free baseline TIFF codec (TIFF 6.0).

Covers the flavors ML corpora actually contain as TIFF: chunky
(PlanarConfig=1), strip-organized, 8 bits per sample, grayscale
(Photometric 0/1, including WhiteIsZero inversion) or RGB(A) — both
byte orders (II little / MM big endian) — under the four strip
compressions real writers emit: none (1), LZW (5, TIFF §13 MSB-first
early-change codes), Deflate (8 / legacy 32946, zlib) and PackBits
(32773, §9 RLE), plus horizontal-differencing Predictor=2 (§14),
16-bit samples (high-byte projection), the TILED layout (§15, edge
tiles cropped), and separate-plane strips (PlanarConfig=2).
Everything else — JPEG-in-TIFF, planar tiles — raises ``ValueError``
so :func:`.multimodal.decode_image` falls back to its stub, same
contract as the sibling codecs. Cross-validated against the
system libtiff in ``tests`` (gated like the libwebp/giflib suites).

Encoder: little-endian RGB with selectable compression/predictor and
strip size for round-trip + oracle tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits stream")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


_LZW_CLEAR, _LZW_EOI = 256, 257


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF §13 LZW: MSB-first variable-width codes with the
    early-change convention (width bumps one code earlier than GIF)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # tolerate missing EOI
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1  # keep the accumulator bounded
        if code == _LZW_CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # early change, decoder side (libtiff-verified): width bumps
        # when the NEXT code could be 2^w - 1 — one entry earlier than
        # the naive LZW point, matching the encoder's one-entry lead
        if len(table) + 1 == (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1  # keep the accumulator bounded

    width = 9
    next_code = 258
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    emit(_LZW_CLEAR, width)
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # early change, encoder side (libtiff-verified): codes emitted
        # before the bump are <= next_code - 1, so they still fit the
        # old width; the first code POSSIBLY equal to 2^w - 1 goes out
        # at the new width
        if next_code == (1 << width):
            if width < 12:
                width += 1
            else:
                emit(_LZW_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _undo_predictor(rows: np.ndarray) -> np.ndarray:
    """Invert horizontal differencing: per-channel cumsum along each
    row, mod 256 (rows, w, spp)."""
    return np.cumsum(rows.astype(np.int64), axis=1).astype(np.uint8)


_DECOMPRESS = {
    1: lambda d, n: d,  # strict: padded strips must fail the size check
    5: _tiff_lzw_decode,
    8: lambda d, n: zlib.decompress(d),
    32946: lambda d, n: zlib.decompress(d),
    32773: _packbits_decode,
}

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
    """Decode a baseline TIFF (none/LZW/Deflate/PackBits strips,
    optional Predictor=2) into HxWx3 uint8 RGB."""
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
    predictor = one(317, 1)
    bits = tags.get(258, [8])
    if compression not in _DECOMPRESS:
        raise ValueError(f"unsupported TIFF compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if predictor == 2 and compression not in (5, 8, 32946):
        # TIFF 6.0 SS14 defines Predictor for LZW (and by extension
        # Deflate); libtiff rejects it elsewhere
        raise ValueError("Predictor=2 requires LZW/Deflate compression")
    if planar not in (1, 2):
        raise ValueError(f"unsupported TIFF planar config {planar}")
    if all(b == 8 for b in bits):
        depth = 8
    elif all(b == 16 for b in bits):
        depth = 16
    else:
        raise ValueError("only 8- or 16-bit TIFF samples are supported")
    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if photometric == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    if w <= 0 or h <= 0:
        raise ValueError("empty TIFF image")

    def decode_chunk(off, cnt, rows, cols, label, nsamp=None):
        """One strip or tile: decompress, size-check, un-predict.
        ``nsamp`` overrides samples-per-chunk (1 for planar planes)."""
        nsamp = spp if nsamp is None else nsamp
        expected = rows * cols * nsamp * (depth // 8)
        if off + cnt > len(payload):
            raise ValueError(f"TIFF {label} out of range")
        try:
            raw = _DECOMPRESS[compression](
                payload[off : off + cnt], expected
            )
        except zlib.error as e:
            raise ValueError(f"corrupt TIFF deflate {label}: {e}") from None
        # a writer that pads strips would otherwise silently shift every
        # subsequent pixel row (ADVICE r07) — require each chunk to
        # decode to exactly its rows
        if len(raw) != expected:
            raise ValueError(
                f"TIFF {label} decodes to {len(raw)} bytes, expected "
                f"{expected} (padded/packed strips are not supported)"
            )
        if predictor == 2:
            # differencing is per SAMPLE, so 16-bit inverts on u2 values
            if depth == 16:
                vals = np.frombuffer(raw, bo + "u2").reshape(
                    rows, cols, nsamp
                )
                raw = (
                    np.cumsum(vals.astype(np.int64), axis=1)
                    .astype(bo + "u2")
                    .tobytes()
                )
            else:
                raw = _undo_predictor(
                    np.frombuffer(raw, np.uint8).reshape(rows, cols, nsamp)
                ).tobytes()
        dt = np.uint8 if depth == 8 else bo + "u2"
        return np.frombuffer(raw, dt).reshape(rows, cols, nsamp)

    if planar == 2 and (322 in tags or 323 in tags):
        raise ValueError("planar tiled TIFF is not supported")
    if 322 in tags or 323 in tags:
        # tiled layout (§15): fixed tw x th tiles, edge tiles padded to
        # full size and cropped at assembly
        tw, th = one(322), one(323)
        offsets = tags.get(324)
        counts = tags.get(325)
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError("bad TIFF tile dimensions")
        across = -(-w // tw)
        down = -(-h // th)
        if not offsets or not counts or len(offsets) != across * down:
            raise ValueError("TIFF tile tables missing or inconsistent")
        dt = np.uint8 if depth == 8 else bo + "u2"
        full = np.zeros((h, w, spp), dtype=np.dtype(dt))
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            tile = decode_chunk(off, cnt, th, tw, f"tile {i}")
            y0 = (i // across) * th
            x0 = (i % across) * tw
            full[y0 : y0 + th, x0 : x0 + tw] = tile[
                : h - y0, : w - x0
            ]
        px = full
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF strip tables missing or inconsistent")
        rps = one(278, h)
        if rps <= 0:
            raise ValueError("bad TIFF RowsPerStrip")
        if planar == 1 and len(offsets) != -(-h // rps):
            raise ValueError(
                "TIFF strip count inconsistent with RowsPerStrip"
            )
        if planar == 2:
            # PlanarConfig 2 (SS: separate planes): all of channel 0's
            # strips, then channel 1's, ... — reassemble by stacking
            spp_strips = -(-h // rps)
            if len(offsets) != spp_strips * spp:
                raise ValueError(
                    "planar TIFF strip count inconsistent with planes"
                )
            planes = []
            for c in range(spp):
                parts = bytearray()
                for i in range(spp_strips):
                    j = c * spp_strips + i
                    rows_in_strip = min(rps, h - i * rps)
                    parts += decode_chunk(
                        offsets[j], counts[j], rows_in_strip, w,
                        f"plane {c} strip {i}", nsamp=1,
                    ).tobytes()
                dt = np.uint8 if depth == 8 else bo + "u2"
                planes.append(
                    np.frombuffer(bytes(parts), dt).reshape(h, w)
                )
            px = np.stack(planes, axis=2)
        else:
            data = bytearray()
            for i, (off, cnt) in enumerate(zip(offsets, counts)):
                rows_in_strip = min(rps, h - i * rps)
                data += decode_chunk(
                    off, cnt, rows_in_strip, w, f"strip {i}"
                ).tobytes()
            dt = np.uint8 if depth == 8 else bo + "u2"
            px = np.frombuffer(bytes(data), dt).reshape(h, w, spp)
    if depth == 16:
        # high byte is the 8-bit projection (libtiff's RGBA read agrees)
        px = (px >> 8).astype(np.uint8)
    if photometric == 2:
        return np.ascontiguousarray(px[:, :, :3])  # drop alpha/extras
    g = px[:, :, 0]
    if photometric == 0:  # WhiteIsZero
        g = 255 - g
    return np.repeat(g[:, :, None], 3, axis=2)


_COMPRESS_TAG = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def encode_tiff(
    pixels: np.ndarray,
    compression: str = "none",
    predictor: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Encode HxWx3 uint8 RGB as a little-endian TIFF with the chosen
    strip compression (``none``/``lzw``/``deflate``/``packbits``),
    optional horizontal-differencing predictor, and strip height."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected an HxWx3 RGB array")
    if compression not in _COMPRESS_TAG:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    if predictor == 2 and compression not in ("lzw", "deflate"):
        raise ValueError("Predictor=2 requires LZW/Deflate compression")
    h, w, _ = pixels.shape
    rps = rows_per_strip or h
    px = np.ascontiguousarray(pixels, np.uint8)
    if predictor == 2:
        diffed = px.astype(np.int64)
        diffed[:, 1:, :] -= px[:, :-1, :].astype(np.int64)
        px = (diffed & 0xFF).astype(np.uint8)
    pack = {
        "none": lambda d: d,
        "lzw": _tiff_lzw_encode,
        "deflate": lambda d: zlib.compress(d, 6),
        "packbits": _packbits_encode,
    }[compression]
    strips = [
        pack(px[y0 : y0 + rps].tobytes()) for y0 in range(0, h, rps)
    ]
    # layout: header(8) + strip data + IFD + offset arrays
    strip_offs = []
    pos = 8
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    ifd_off = pos
    n = len(strips)
    entries = [
        (256, 4, 1, w),                          # ImageWidth
        (257, 4, 1, h),                          # ImageLength
        (258, 3, 3, "bits"),                     # BitsPerSample
        (259, 3, 1, _COMPRESS_TAG[compression]),  # Compression
        (262, 3, 1, 2),                          # Photometric: RGB
        (273, 4, n, "offs"),                     # StripOffsets
        (277, 3, 1, 3),                          # SamplesPerPixel
        (278, 4, 1, rps),                        # RowsPerStrip
        (279, 4, n, "cnts"),                     # StripByteCounts
        (284, 3, 1, 1),                          # PlanarConfig: chunky
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))           # Predictor
    after_ifd = ifd_off + 2 + 12 * len(entries) + 4
    bits_off = after_ifd
    offs_off = bits_off + 6
    cnts_off = offs_off + 4 * n
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    for s in strips:
        out += s
    out += struct.pack("<H", len(entries))
    for tag, vtype, count, value in entries:
        if value == "bits":
            out += struct.pack("<HHII", tag, vtype, count, bits_off)
        elif value == "offs":
            v = strip_offs[0] if n == 1 else offs_off
            out += struct.pack("<HHII", tag, vtype, count, v)
        elif value == "cnts":
            v = len(strips[0]) if n == 1 else cnts_off
            out += struct.pack("<HHII", tag, vtype, count, v)
        elif vtype == 3:
            out += struct.pack("<HHIHH", tag, vtype, count, value, 0)
        else:
            out += struct.pack("<HHII", tag, vtype, count, value)
    out += struct.pack("<I", 0)  # no next IFD
    out += struct.pack("<HHH", 8, 8, 8)  # BitsPerSample values
    if n > 1:
        out += b"".join(struct.pack("<I", o) for o in strip_offs)
        out += b"".join(struct.pack("<I", len(s)) for s in strips)
    return bytes(out)
