"""Hand-crafted VP8 keyframe builder (RFC 6386 §8.1 bool encoder).

Builds complete keyframes from an explicit IR — header parameters plus
per-MB modes/skip and per-block token values — so tests can exercise
decoder paths the libwebp encoder rarely or never emits (every 4x4
submode in every context slot, chosen filter levels/sharpness, the
simple filter profile, skip macroblocks, exact coefficient patterns)
and so the decode comparison against the system libwebp pins the
decoder at the BITSTREAM level: a crafted stream is decoded by both
implementations and the YUV planes must match bit-for-bit. This is
how the libwebp/RFC submode-enumeration mismatch in the extracted
`KF_BMODE_PROB` table was found and is now regression-pinned
(`vp8_tables.py` note).

The builder mirrors the decoder's tree/probability model on purpose:
if the two models ever disagree with the REAL one, libwebp decodes
different modes from a crafted stream and the comparison fails — the
probes are sensitive to every context row.
"""

from __future__ import annotations

import struct

from neo4j_to_clickhouse_spark.operators import vp8
from neo4j_to_clickhouse_spark.operators.vp8_tables import (
    COEFF_UPDATE_PROBS,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROB,
)

_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_CAT_BASE = (5, 7, 11, 19, 35, 67)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)


class BoolEncoder:
    """RFC 6386 §8.1 boolean arithmetic encoder."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def bit(self, prob: int, value: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if value:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit(128, (v >> i) & 1)

    def tree(self, tree: tuple, probs, leaf: int) -> None:
        for node_i, b in self._find(tree, 0, leaf, []):
            self.bit(probs[node_i >> 1], b)

    def _find(self, tree, i, leaf, path):
        for b in (0, 1):
            t = tree[i + b]
            if t < 0:
                if -1 - t == leaf:
                    return path + [(i, b)]
            else:
                r = self._find(tree, t, leaf, path + [(i, b)])
                if r:
                    return r
        return None

    def flush(self) -> bytes:
        for _ in range(32):
            self.bit_count -= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


def _write_block(t: BoolEncoder, ptype: int, first: int, ctx: int, toks) -> int:
    """Write one 4x4 block's tokens; toks maps scan position -> token
    value (pre-dequant). Returns the nonzero flag for context chaining."""
    n = first
    ctx_now = ctx
    positions = sorted(k for k in toks if toks[k] != 0)
    any_nz = 1 if positions else 0
    prev_zero = False
    while True:
        p = DEFAULT_COEFF_PROBS[ptype][_BANDS[n]][ctx_now]
        if not positions:
            if not prev_zero:
                t.bit(p[0], 0)  # EOB (illegal after a zero; builder never
                # leaves trailing zeros, so prev_zero is False here)
            return any_nz
        if not prev_zero:
            t.bit(p[0], 1)
        nxt = positions[0]
        if n < nxt:
            t.bit(p[1], 0)
            n += 1
            ctx_now = 0
            prev_zero = True
            continue
        positions.pop(0)
        v = toks[nxt]
        a = abs(v)
        t.bit(p[1], 1)
        if a == 1:
            t.bit(p[2], 0)
            nctx = 1
        elif a == 2:
            t.bit(p[2], 1)
            t.bit(p[3], 0)
            t.bit(p[4], 0)
            nctx = 2
        elif a in (3, 4):
            t.bit(p[2], 1)
            t.bit(p[3], 0)
            t.bit(p[4], 1)
            t.bit(p[5], a - 3)
            nctx = 2
        else:
            cat = max(i for i, b in enumerate(_CAT_BASE) if a >= b)
            t.bit(p[2], 1)
            t.bit(p[3], 1)
            if cat == 0:
                t.bit(p[6], 0)
                t.bit(p[7], 0)
            elif cat == 1:
                t.bit(p[6], 0)
                t.bit(p[7], 1)
            elif cat == 2:
                t.bit(p[6], 1)
                t.bit(p[8], 0)
                t.bit(p[9], 0)
            elif cat == 3:
                t.bit(p[6], 1)
                t.bit(p[8], 0)
                t.bit(p[9], 1)
            elif cat == 4:
                t.bit(p[6], 1)
                t.bit(p[8], 1)
                t.bit(p[10], 0)
            else:
                t.bit(p[6], 1)
                t.bit(p[8], 1)
                t.bit(p[10], 1)
            extra = a - _CAT_BASE[cat]
            cps = _CAT_PROBS[cat]
            for i, cp in enumerate(cps):
                t.bit(cp, (extra >> (len(cps) - 1 - i)) & 1)
            nctx = 2
        t.bit(128, 1 if v < 0 else 0)
        n += 1
        ctx_now = nctx
        prev_zero = False
        if n == 16:
            return any_nz


def empty_mb() -> dict:
    return dict(
        ymode=vp8.B_PRED, submodes=[0] * 16, uvmode=0, skip=False,
        y2={}, y=[dict() for _ in range(16)],
        u=[dict() for _ in range(4)], v=[dict() for _ in range(4)],
    )


def build_stream(
    width: int = 16,
    height: int = 16,
    q_index: int = 40,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
    mbs: list[dict] | None = None,
) -> bytes:
    """Assemble a keyframe. ``mbs`` is a raster list of dicts with keys
    ymode, submodes (16, when B_PRED), uvmode, skip, and token maps
    y2 / y[16] / u[4] / v[4] ({scan position: token value})."""
    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    if mbs is None:
        mbs = [empty_mb() for _ in range(mb_w * mb_h)]
    e = BoolEncoder()
    e.bit(128, 0)  # color space
    e.bit(128, 0)  # clamping
    e.bit(128, 0)  # segmentation off
    e.bit(128, filter_type)
    e.literal(filter_level, 6)
    e.literal(sharpness, 3)
    e.bit(128, 0)  # lf deltas off
    e.literal(0, 2)  # one token partition
    e.literal(q_index, 7)
    for _ in range(5):
        e.bit(128, 0)  # quantizer deltas absent
    e.bit(128, 0)  # refresh_entropy_probs
    for t_ in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    e.bit(COEFF_UPDATE_PROBS[t_][b][c][p], 0)
    has_skip = any(m.get("skip") for m in mbs)
    e.bit(128, 1 if has_skip else 0)
    if has_skip:
        e.literal(200, 8)  # prob_skip_false
    above_modes = [[vp8.B_DC] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_modes = [vp8.B_DC] * 4
        for mx in range(mb_w):
            m = mbs[my * mb_w + mx]
            if has_skip:
                e.bit(200, 1 if m.get("skip") else 0)
            e.tree(vp8._KF_YMODE_TREE, vp8._KF_YMODE_PROB, m["ymode"])
            if m["ymode"] == vp8.B_PRED:
                sub = m["submodes"]
                for r in range(4):
                    for c in range(4):
                        a = above_modes[mx][c] if r == 0 else sub[(r - 1) * 4 + c]
                        l = left_modes[r] if c == 0 else sub[r * 4 + c - 1]
                        e.tree(vp8._BMODE_TREE, KF_BMODE_PROB[a][l], sub[r * 4 + c])
                above_modes[mx] = sub[12:16]
                left_modes = [sub[3], sub[7], sub[11], sub[15]]
            else:
                imp = vp8._MB_TO_BMODE[m["ymode"]]
                above_modes[mx] = [imp] * 4
                left_modes = [imp] * 4
            e.tree(vp8._UV_MODE_TREE, vp8._KF_UV_PROB, m["uvmode"])
    part0 = e.flush()

    t = BoolEncoder()
    ab_y = [[0] * 4 for _ in range(mb_w)]
    ab_u = [[0] * 2 for _ in range(mb_w)]
    ab_v = [[0] * 2 for _ in range(mb_w)]
    ab_y2 = [0] * mb_w
    for my in range(mb_h):
        l_y = [0] * 4
        l_u = [0] * 2
        l_v = [0] * 2
        l_y2 = 0
        for mx in range(mb_w):
            m = mbs[my * mb_w + mx]
            has_y2 = m["ymode"] != vp8.B_PRED
            if m.get("skip"):
                l_y[:] = [0] * 4
                ab_y[mx][:] = [0] * 4
                l_u[:] = [0] * 2
                ab_u[mx][:] = [0] * 2
                l_v[:] = [0] * 2
                ab_v[mx][:] = [0] * 2
                if has_y2:
                    l_y2 = ab_y2[mx] = 0
                continue
            if has_y2:
                nz = _write_block(t, 1, 0, l_y2 + ab_y2[mx], m.get("y2", {}))
                l_y2 = ab_y2[mx] = nz
                ytype, yfirst = 0, 1
            else:
                ytype, yfirst = 3, 0
            for i in range(16):
                r, c = i >> 2, i & 3
                nz = _write_block(
                    t, ytype, yfirst, l_y[r] + ab_y[mx][c], m["y"][i]
                )
                l_y[r] = ab_y[mx][c] = nz
            for coef, lc, ac_ in ((m["u"], l_u, ab_u[mx]), (m["v"], l_v, ab_v[mx])):
                for i in range(4):
                    r, c = i >> 1, i & 1
                    nz = _write_block(t, 2, 0, lc[r] + ac_[c], coef[i])
                    lc[r] = ac_[c] = nz
    part1 = t.flush()

    first_size = len(part0)
    tag = (0) | (0 << 1) | (1 << 4) | (first_size << 5)
    hdr = (
        bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width, height)
    )
    return hdr + part0 + part1


def wrap_webp(vp8_data: bytes) -> bytes:
    chunk = (
        b"VP8 "
        + struct.pack("<I", len(vp8_data))
        + vp8_data
        + (b"\x00" if len(vp8_data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
