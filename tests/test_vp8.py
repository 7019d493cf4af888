"""Lossy-WebP (VP8 keyframe) decoder tests — RFC 6386.

Three verification layers, mirroring the VP8L protocol
(`tests/test_vp8l.py`):

- SYSTEM-LIBWEBP ORACLE (skipped cleanly when the library is absent):
  libwebp-ENCODED streams across content classes, sizes (incl.
  non-multiple-of-16), and qualities must decode to bit-identical
  Y/U/V planes vs ``WebPDecodeYUV`` — the full real-encoder surface
  (segmentation, per-segment quantizers, coefficient-probability
  updates, normal loop filter, skip MBs).
- CRAFTED-STREAM EQUIVALENCE (libwebp-gated): hand-built keyframes
  (`tests/helpers/vp8_streams.py`) drive paths the encoder rarely
  emits — every 4x4 submode in every (above,left) context slot, the
  simple filter profile, chosen filter levels/sharpness, exact token
  patterns, skip MBs — decoded by both implementations, YUV
  bit-compared. The full 10x10 context-pair probe is what caught the
  libwebp-vs-RFC submode enumeration mismatch in the extracted
  KF_BMODE_PROB table.
- SELF-CONTAINED: table re-extraction from the system binary, crafted
  round-trips through our own decoder, container routing, error paths
  — no libwebp needed for these beyond the extraction check's gate.
"""

from __future__ import annotations

import ctypes
import os
import struct
import sys

import numpy as np
import pytest

from neo4j_to_clickhouse_spark.operators import vp8
from neo4j_to_clickhouse_spark.operators.vp8 import (
    decode_vp8_frame,
    decode_webp_lossy,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
from vp8_streams import build_stream, empty_mb, wrap_webp  # noqa: E402


def _load_libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


_LIBWEBP = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIBWEBP is None, reason="system libwebp not available"
)


def _encode_lossy(rgb: np.ndarray, quality: float = 75.0) -> bytes:
    h, w, _ = rgb.shape
    rgba = np.dstack([rgb, np.full((h, w), 255, np.uint8)])
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIBWEBP.WebPEncodeRGBA(
        rgba.tobytes(), w, h, w * 4, quality, ctypes.byref(out)
    )
    assert n > 0
    return bytes(bytearray(out[i] for i in range(n)))


def _libwebp_yuv(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = _LIBWEBP.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not yp:
        raise ValueError("libwebp rejected the stream")
    ww, hh, s, us = w.value, h.value, stride.value, uv_stride.value
    cw, chh = (ww + 1) // 2, (hh + 1) // 2
    y = np.frombuffer(
        bytes(bytearray(yp[i] for i in range(s * hh))), np.uint8
    ).reshape(hh, s)[:, :ww].copy()
    u = np.frombuffer(
        bytes(bytearray(up[i] for i in range(us * chh))), np.uint8
    ).reshape(chh, us)[:, :cw].copy()
    v = np.frombuffer(
        bytes(bytearray(vp[i] for i in range(us * chh))), np.uint8
    ).reshape(chh, us)[:, :cw].copy()
    return y, u, v


def _vp8_payload(container: bytes) -> bytes:
    off = 12
    while off + 8 <= len(container):
        tag = container[off : off + 4]
        size = struct.unpack_from("<I", container, off + 4)[0]
        if tag == b"VP8 ":
            return container[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _content_images():
    rng = np.random.default_rng(3)
    xx, yy = np.meshgrid(np.arange(80), np.arange(64))
    yield "gradient", np.dstack(
        [(xx * 3).astype(np.uint8), (yy * 4).astype(np.uint8),
         ((xx + yy) * 2).astype(np.uint8)]
    )
    yield "noise", rng.integers(0, 256, (48, 56, 3), dtype=np.uint8)
    img = np.zeros((64, 80, 3), np.uint8)
    img[16:48, 20:60] = [200, 30, 90]
    img[30:34, :, :] = 255
    yield "edges", img
    yield "flat_odd", np.full((33, 47, 3), 77, np.uint8)
    yield "tiny_odd", rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)


# --- system-encoder oracle ---------------------------------------------------


@needs_libwebp
@pytest.mark.parametrize("quality", [10, 50, 75, 90, 100])
def test_encoder_oracle_yuv_exact(quality):
    """libwebp-encoded streams decode to bit-identical YUV planes: the
    real encoder exercises segmentation, per-segment quantizers, prob
    updates, skip MBs, and the normal loop filter at every quality."""
    for name, rgb in _content_images():
        data = _encode_lossy(rgb, float(quality))
        y0, u0, v0 = _libwebp_yuv(data)
        y1, u1, v1 = decode_vp8_frame(_vp8_payload(data))
        assert np.array_equal(y0, y1), (name, quality, "Y")
        assert np.array_equal(u0, u1), (name, quality, "U")
        assert np.array_equal(v0, v1), (name, quality, "V")


@needs_libwebp
def test_encoder_oracle_larger_image():
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (20, 25, 3), dtype=np.uint8)
    rgb = base.repeat(8, axis=0).repeat(8, axis=1)  # 160x200 smooth blocks
    data = _encode_lossy(rgb, 60.0)
    y0, u0, v0 = _libwebp_yuv(data)
    y1, u1, v1 = decode_vp8_frame(_vp8_payload(data))
    assert np.array_equal(y0, y1)
    assert np.array_equal(u0, u1)
    assert np.array_equal(v0, v1)


# --- crafted-stream equivalence against libwebp ------------------------------


def _both_decode(stream: bytes):
    y0, u0, v0 = _libwebp_yuv(wrap_webp(stream))
    y1, u1, v1 = decode_vp8_frame(stream)
    return (y0, u0, v0), (y1, u1, v1)


def _assert_same(stream: bytes, label):
    (y0, u0, v0), (y1, u1, v1) = _both_decode(stream)
    assert np.array_equal(y0, y1), (label, "Y")
    assert np.array_equal(u0, u1), (label, "U")
    assert np.array_equal(v0, v1), (label, "V")


@needs_libwebp
def test_crafted_bmode_context_pairs():
    """Every (above,left) submode context row of KF_BMODE_PROB: a wrong
    row desyncs the mode parse and the comparison fails. This probe
    found (and now pins) the libwebp-vs-RFC submode enumeration
    permutation applied to the extracted table."""
    for a in range(10):
        for l in range(10):
            mb = empty_mb()
            mb["submodes"] = [0] * 16
            mb["submodes"][1] = a  # above of position 5
            mb["submodes"][4] = l  # left of position 5
            mb["submodes"][5] = 1  # coded with probs[a][l]
            _assert_same(build_stream(mbs=[mb]), (a, l))


@needs_libwebp
def test_crafted_all_submodes_all_positions():
    for mode in range(10):
        mb = empty_mb()
        mb["submodes"] = [mode] * 16
        mb["y"] = [{0: (i % 5) - 2 or 1, 1 + (i % 3): 1} for i in range(16)]
        _assert_same(build_stream(width=48, height=32, mbs=[
            mb if i % 2 == 0 else empty_mb() for i in range(6)
        ]), mode)


@needs_libwebp
def test_crafted_y2_and_16x16_modes():
    for ymode in (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED):
        mb = empty_mb()
        mb["ymode"] = ymode
        mb["submodes"] = None
        mb["y2"] = {0: 5, 1: -2, 5: 1}
        mb["y"] = [{1: 1, 2: -1} if i % 3 == 0 else {} for i in range(16)]
        mb["u"] = [{0: 2}, {}, {1: -1}, {}]
        mb["v"] = [{}, {0: -3}, {}, {}]
        _assert_same(build_stream(width=32, height=32,
                                  mbs=[mb, empty_mb(), empty_mb(), mb]),
                     ymode)


@needs_libwebp
@pytest.mark.parametrize("ftype,level,sharp", [
    (0, 10, 0), (0, 25, 3), (0, 40, 7), (0, 63, 0), (1, 20, 0), (1, 63, 4),
])
def test_crafted_loop_filter_profiles(ftype, level, sharp):
    rng = np.random.default_rng(level * 8 + sharp + ftype)
    mbs = []
    for _ in range(6):
        mb = empty_mb()
        mb["submodes"] = [int(rng.integers(0, 10)) for _ in range(16)]
        mb["y"] = [
            {int(rng.integers(0, 8)): int(rng.integers(-5, 6)) or 2}
            for _ in range(16)
        ]
        mbs.append(mb)
    _assert_same(
        build_stream(width=48, height=32, q_index=30, filter_level=level,
                     filter_type=ftype, sharpness=sharp, mbs=mbs),
        (ftype, level, sharp),
    )


@needs_libwebp
@pytest.mark.parametrize("ftype,level", [
    (0, 20), (0, 40), (0, 63), (1, 20), (1, 63),
])
def test_crafted_bpred_zero_coeff_interior_filter(ftype, level):
    """RFC 6386 §15.1 / libwebp: a B_PRED (i4x4) MB must filter its
    interior subblock edges even when all its coefficients are zero
    (or the MB is skip-flagged). Crafted: a zero-token B_PRED MB and
    a skip-flagged B_PRED MB, each adjacent to a high-energy textured
    MB so prediction leaks block discontinuities into the quiet MBs —
    interior filtering there is NOT a no-op. Regression for the
    `inner = not skip_lf` bug (diverged up to 21/255 from libwebp)."""
    rng = np.random.default_rng(1000 + ftype * 64 + level)

    def textured_mb():
        mb = empty_mb()
        mb["submodes"] = [int(rng.integers(0, 10)) for _ in range(16)]
        mb["y"] = [
            {int(rng.integers(0, 6)): int(rng.integers(-7, 8)) or 5}
            for _ in range(16)
        ]
        mb["u"] = [{0: int(rng.integers(-5, 6)) or 3} for _ in range(4)]
        mb["v"] = [{1: int(rng.integers(-5, 6)) or -3} for _ in range(4)]
        return mb

    def quiet_bpred(skip):
        mb = empty_mb()  # B_PRED, varied submodes, zero coefficients
        mb["submodes"] = [int(rng.integers(0, 10)) for _ in range(16)]
        if skip:
            mb["skip"] = True
        return mb

    # 3x2 MB grid: textured / zero-coeff B_PRED / textured,
    #              textured / skip-flagged B_PRED / textured
    mbs = [textured_mb(), quiet_bpred(False), textured_mb(),
           textured_mb(), quiet_bpred(True), textured_mb()]
    _assert_same(
        build_stream(width=48, height=32, q_index=60, filter_level=level,
                     filter_type=ftype, sharpness=0, mbs=mbs),
        ("bpred-zero-coeff", ftype, level),
    )


@needs_libwebp
def test_crafted_skip_mbs():
    mbs = []
    for i in range(4):
        mb = empty_mb()
        if i % 2 == 0:
            mb["skip"] = True
        else:
            mb["y"] = [{0: 3} for _ in range(16)]
        mbs.append(mb)
    _assert_same(build_stream(width=32, height=32, filter_level=20, mbs=mbs),
                 "skip")
    # skip with Y2 (16x16 mode): y2 context must reset; B_PRED skip
    # leaves the y2 context untouched
    mbs = []
    for i in range(4):
        mb = empty_mb()
        if i == 1:
            mb["ymode"] = vp8.DC_PRED
            mb["submodes"] = None
            mb["skip"] = True
        elif i == 2:
            mb["ymode"] = vp8.TM_PRED
            mb["submodes"] = None
            mb["y2"] = {0: 4}
        mbs.append(mb)
    _assert_same(build_stream(width=32, height=32, mbs=mbs), "skip-y2")


@needs_libwebp
def test_crafted_randomized_streams():
    """Randomized IR sweep: modes, tokens, filter, dims — 25 streams,
    every one decoded identically by libwebp and this decoder."""
    rng = np.random.default_rng(42)

    def rand_mb():
        if rng.random() < 0.5:
            m = empty_mb()
            m["submodes"] = [int(rng.integers(0, 10)) for _ in range(16)]
        else:
            m = empty_mb()
            m["ymode"] = int(rng.integers(0, 4))
            m["submodes"] = None
        m["uvmode"] = int(rng.integers(0, 4))

        def toks():
            d = {}
            for _ in range(int(rng.integers(0, 4))):
                d[int(rng.integers(0, 16))] = int(rng.integers(-6, 7)) or 1
            return d

        m["y2"] = toks() if m["ymode"] != vp8.B_PRED else {}
        m["y"] = [toks() for _ in range(16)]
        m["u"] = [toks() for _ in range(4)]
        m["v"] = [toks() for _ in range(4)]
        return m

    for _ in range(25):
        w = int(rng.choice([16, 32, 48]))
        h = int(rng.choice([16, 32]))
        n = ((w + 15) // 16) * ((h + 15) // 16)
        stream = build_stream(
            width=w, height=h,
            q_index=int(rng.integers(10, 90)),
            filter_level=int(rng.choice([0, 0, 10, 25, 40, 63])),
            filter_type=int(rng.choice([0, 0, 1])),
            sharpness=int(rng.choice([0, 0, 3, 7])),
            mbs=[rand_mb() for _ in range(n)],
        )
        _assert_same(stream, "random")


# --- table extraction pin ----------------------------------------------------


@needs_libwebp
def test_tables_match_system_library():
    """Re-run the .rodata extraction against the installed libwebp and
    compare with the checked-in constants (incl. the RFC-order submode
    permutation). A library upgrade that changed any table fails here
    rather than silently desyncing decodes."""
    import ctypes.util

    path = None
    for cand in ("/usr/lib/x86_64-linux-gnu/libwebp.so.7",):
        real = os.path.realpath(cand)
        if os.path.exists(real):
            path = real
            break
    if path is None:
        found = ctypes.util.find_library("webp")
        path = found and os.path.realpath(found)
    if path is None or not os.path.exists(path):
        pytest.skip("libwebp binary not found on disk")
    data = open(path, "rb").read()
    from neo4j_to_clickhouse_spark.operators.vp8_tables import (
        AC_QLOOKUP,
        COEFF_UPDATE_PROBS,
        DC_QLOOKUP,
        DEFAULT_COEFF_PROBS,
        KF_BMODE_PROB,
    )

    # AC table: monotone uint16[128] starting 4..8, ending 284
    start = struct.pack("<5H", 4, 5, 6, 7, 8)
    p = data.find(start)
    found_ac = None
    while p >= 0:
        vals = struct.unpack_from("<128H", data, p)
        if all(vals[i] <= vals[i + 1] for i in range(127)) and vals[-1] == 284:
            found_ac = vals
            break
        p = data.find(start, p + 1)
    assert found_ac == tuple(AC_QLOOKUP)

    # DC table: uint8[128] ending 138..157
    tail = bytes([138, 140, 143, 145, 148, 151, 154, 157])
    p = data.find(tail)
    assert p >= 0
    assert tuple(data[p + 8 - 128 : p + 8]) == tuple(DC_QLOOKUP)

    # update probs: [0][0] all-255 then the documented [0][1] rows
    pat = bytes([255] * 33) + bytes([176, 246])
    p = data.find(pat)
    assert p >= 0
    flat_u = bytes(
        x for t in COEFF_UPDATE_PROBS for b in t for c in b for x in c
    )
    assert data[p : p + 1056] == flat_u

    # default coeff probs: 33x128 (unused band 0) then the spec rows
    anchor = bytes([128] * 33) + bytes(
        [253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128]
    )
    p = data.find(anchor)
    assert p >= 0
    flat_d = bytes(
        x for t in DEFAULT_COEFF_PROBS for b in t for c in b for x in c
    )
    assert data[p : p + 1056] == flat_d

    # kf bmode probs: located via the spec's [0][0] row; stored table is
    # the libwebp layout permuted into RFC submode order on both axes
    p = data.find(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]))
    assert p >= 0
    raw = data[p : p + 900]
    perm = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
    expect = []
    for a in range(10):
        for l in range(10):
            src = (perm[a] * 10 + perm[l]) * 9
            expect.extend(raw[src : src + 9])
    flat_b = [x for a in KF_BMODE_PROB for l in a for x in l]
    assert flat_b == expect


# --- self-contained behaviour ------------------------------------------------


def test_crafted_flat_stream_decodes_flat():
    y, u, v = decode_vp8_frame(build_stream(width=32, height=32))
    # all-B_DC, no tokens: first block predicts from 127/129 borders
    assert y.shape == (32, 32)
    assert u.shape == v.shape == (16, 16)
    assert len(np.unique(y)) <= 3  # propagated DC values settle quickly


def test_crafted_single_dc_coefficient():
    mb = empty_mb()
    mb["y"] = [dict() for _ in range(16)]
    mb["y"][0] = {0: 4}  # DC token 4 at q_index 40
    y, _, _ = decode_vp8_frame(build_stream(q_index=40, mbs=[mb]))
    from neo4j_to_clickhouse_spark.operators.vp8_tables import DC_QLOOKUP

    dc = 4 * DC_QLOOKUP[40]
    # block 0 = 128 (border DC pred) + idct(dc-only) = 128 + ((dc+4)>>3)
    assert int(y[0, 0]) == min(255, 128 + ((dc + 4) >> 3))


def test_rejects_interframe_and_garbage():
    with pytest.raises(ValueError):
        decode_vp8_frame(b"\x01\x00\x00\x9d\x01\x2a" + b"\x00" * 16)  # interframe bit
    with pytest.raises(ValueError):
        decode_vp8_frame(b"\x00\x00\x00XXX" + b"\x00" * 16)  # bad start code
    with pytest.raises(ValueError):
        decode_vp8_frame(b"\x00")
    with pytest.raises(ValueError):
        decode_webp_lossy(b"RIFF\x04\x00\x00\x00WEBP")  # no VP8 chunk
    # first-partition size overrunning the payload
    stream = bytearray(build_stream())
    stream[0] |= 0xE0
    stream[1] = 0xFF
    stream[2] = 0xFF
    with pytest.raises(ValueError):
        decode_vp8_frame(bytes(stream))


def test_decode_webp_lossy_rgb_and_multimodal_route():
    stream = build_stream(width=32, height=16)
    rgb = decode_webp_lossy(wrap_webp(stream))
    assert rgb.shape == (16, 32, 3)
    assert rgb.dtype == np.uint8
    # container-level routing: vp8l.decode_webp hands VP8 chunks here
    from neo4j_to_clickhouse_spark.operators.vp8l import decode_webp

    rgb2 = decode_webp(wrap_webp(stream))
    assert np.array_equal(rgb, rgb2)
    # and the multimodal sniffer treats lossy webp as a real decode
    from neo4j_to_clickhouse_spark.operators.multimodal import decode_image

    decoded = decode_image(wrap_webp(stream))
    assert decoded is not None
    fmt, arr = decoded
    assert fmt == "webp"
    assert arr.shape == (16, 32, 3)


@needs_libwebp
def test_encoder_oracle_rgb_close_to_libwebp():
    """The documented BT.601 RGB conversion stays within a small bound
    of libwebp's fancy-upsampled RGB on smooth content (the YUV planes
    are bit-exact; RGB differs only by upsampler choice)."""
    _LIBWEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIBWEBP.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    rgb = np.dstack([(xx * 2 + 40).astype(np.uint8),
                     (yy * 3 + 20).astype(np.uint8),
                     np.full((48, 64), 90, np.uint8)])
    data = _encode_lossy(rgb, 90.0)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = _LIBWEBP.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    ref = np.frombuffer(
        bytes(bytearray(ptr[i] for i in range(w.value * h.value * 4))), np.uint8
    ).reshape(h.value, w.value, 4)[..., :3].astype(int)
    mine = decode_webp_lossy(data).astype(int)
    assert np.abs(ref - mine).max() <= 12  # upsampler + matrix rounding


# --- lossy alpha (ALPH chunk) ------------------------------------------------


def _wrap_vp8x(vp8_data: bytes, alph_body: bytes, w: int, h: int) -> bytes:
    """VP8X container: flags with the alpha bit, then ALPH + VP8."""
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x10, 0, 0, 0]) + \
        struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
    alph = b"ALPH" + struct.pack("<I", len(alph_body)) + alph_body
    if len(alph_body) & 1:
        alph += b"\x00"
    vp8c = b"VP8 " + struct.pack("<I", len(vp8_data)) + vp8_data
    if len(vp8_data) & 1:
        vp8c += b"\x00"
    payload = b"WEBP" + vp8x + alph + vp8c
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _forward_alpha_filter(plane: np.ndarray, method: int) -> bytes:
    """Encoder side of the ALPH filters, for crafting raw-compression
    chunks: residual = (value - predicted-from-original) mod 256."""
    h, w = plane.shape
    out = np.zeros((h, w), np.int32)
    p = plane.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0
            elif y == 0:
                pred = p[0, x - 1]
            elif x == 0:
                pred = p[y - 1, 0]
            elif method == 1:
                pred = p[y, x - 1]
            elif method == 2:
                pred = p[y - 1, x]
            else:
                pred = min(255, max(0, int(p[y, x - 1]) + int(p[y - 1, x]) - int(p[y - 1, x - 1])))
            out[y, x] = (p[y, x] - pred) & 0xFF
    return bytes([method << 2]) + out.astype(np.uint8).tobytes()


@needs_libwebp
@pytest.mark.parametrize("method", [0, 1, 2, 3])
def test_crafted_alpha_raw_filters(method):
    """Raw-compression ALPH chunks under every filter method decode to
    the exact alpha plane, and bit-identically to libwebp's RGBA."""
    from neo4j_to_clickhouse_spark.operators.vp8l import decode_webp_rgba

    rng = np.random.default_rng(method)
    w, h = 32, 16
    plane = rng.integers(0, 256, (h, w), dtype=np.uint8)
    body = _forward_alpha_filter(plane, method) if method else bytes([0]) + plane.tobytes()
    container = _wrap_vp8x(build_stream(width=w, height=h), body, w, h)
    mine = decode_webp_rgba(container)
    assert np.array_equal(mine[..., 3], plane)
    # libwebp agreement on the same crafted container
    _LIBWEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIBWEBP.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    ww = ctypes.c_int()
    hh = ctypes.c_int()
    ptr = _LIBWEBP.WebPDecodeRGBA(container, len(container), ctypes.byref(ww), ctypes.byref(hh))
    assert ptr, "libwebp rejected the crafted VP8X container"
    ref = np.frombuffer(
        bytes(bytearray(ptr[i] for i in range(ww.value * hh.value * 4))), np.uint8
    ).reshape(hh.value, ww.value, 4)
    assert np.array_equal(ref[..., 3], mine[..., 3])


@needs_libwebp
def test_encoder_oracle_alpha_exact():
    """libwebp-encoded lossy+alpha files: the ALPH chunk (VP8L-backend
    compressed, encoder-chosen filtering) decodes to the bit-exact
    alpha plane libwebp reconstructs."""
    from neo4j_to_clickhouse_spark.operators.vp8l import decode_webp_rgba

    _LIBWEBP.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIBWEBP.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    rng = np.random.default_rng(5)
    for trial in range(4):
        h, w = int(rng.integers(17, 49)), int(rng.integers(17, 65))
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        alpha = np.zeros((h, w), np.uint8)
        alpha[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = int(rng.integers(1, 255))
        alpha[:, : w // 8 + 1] = 255
        rgba = np.dstack([rgb, alpha])
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = _LIBWEBP.WebPEncodeRGBA(
            rgba.tobytes(), w, h, w * 4, 80.0, ctypes.byref(out)
        )
        data = bytes(bytearray(out[i] for i in range(n)))
        assert data[12:16] == b"VP8X", "expected an extended container"
        ww = ctypes.c_int()
        hh = ctypes.c_int()
        ptr = _LIBWEBP.WebPDecodeRGBA(data, len(data), ctypes.byref(ww), ctypes.byref(hh))
        ref = np.frombuffer(
            bytes(bytearray(ptr[i] for i in range(ww.value * hh.value * 4))), np.uint8
        ).reshape(hh.value, ww.value, 4)
        mine = decode_webp_rgba(data)
        assert np.array_equal(ref[..., 3], mine[..., 3]), trial


def test_decode_webp_rgba_vp8l_and_opaque():
    """RGBA entry: VP8L containers keep their inline alpha; plain lossy
    containers come back fully opaque."""
    from neo4j_to_clickhouse_spark.operators.vp8l import (
        decode_webp_rgba,
        encode_webp,
    )

    rgb = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    rgba = decode_webp_rgba(encode_webp(rgb))
    assert rgba.shape == (16, 16, 4)
    assert np.array_equal(rgba[..., :3], rgb)
    assert (rgba[..., 3] == 255).all()
    lossy = decode_webp_rgba(wrap_webp(build_stream(width=32, height=16)))
    assert lossy.shape == (16, 32, 4)
    assert (lossy[..., 3] == 255).all()
