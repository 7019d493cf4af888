"""Arithmetic-coded JPEG entropy decoding (ITU-T T.81 Annexes D/F).

Closes the "JPEG arithmetic" entry of the reference pipeline's
opaque-media boundary: SOF9 (sequential) and SOF10 (progressive)
streams now decode through the same pure-Python pipeline as the
Huffman paths in :mod:`.jpeg`, which routes scans here when the frame
uses arithmetic coding.

Components:

- the QM-coder probability state machine (T.81 Table D.3). The 114-row
  constant (113 adaptive states + the fixed ~0.5 bin the JPEG decoder
  addresses as state 113) was EXTRACTED from the system libjpeg's
  exported ``jpeg_aritab`` symbol rather than transcribed from the spec
  text, with the byte layout pinned against the known states 0/1;
  ``tests/test_jpeg_arith.py`` re-verifies the constant against the
  library whenever it is present.
- the arithmetic decoder register machine (T.81 F.2.4.2/F.2.4.3 with
  the deferred-renormalization software conventions): byte stuffing
  (0xFF 0x00), fill-byte swallowing, and the feed-zeros-after-marker
  convention that lets the code register drain past the end of a scan.
- the DC/AC statistical models (T.81 F.1.4.4): DC difference
  conditioning contexts with the DAC L/U thresholds, AC end-of-block /
  run decision trees with the Kx high-magnitude split, the shared
  magnitude-category and bit-pattern trees, and the non-adaptive sign
  bin — for all four scan shapes (sequential, DC first/refine, AC
  first/refine).

Statistics bins are (state index | MPS << 7) bytes exactly as in the
spec's flowcharts; every scan (and every restart interval) starts from
zeroed statistics. Outputs land in the shared zig-zag coefficient
store of :mod:`.jpeg`, so assembly/IDCT are the same code path as
progressive Huffman and the oracle tests can compare quantized
coefficients integer-exact against libjpeg.
"""

from __future__ import annotations

# (Qe, NEXT_LPS | SWITCH << 7, NEXT_MPS) per state; entry 113 is the
# fixed 50/50 bin (self-loop, no switch).
_ARITH_STATES = (
    (0x5A1D, 0x81, 1), (0x2586, 0x0E, 2), (0x1114, 0x10, 3), (0x080B, 0x12, 4),
    (0x03D8, 0x14, 5), (0x01DA, 0x17, 6), (0x00E5, 0x19, 7), (0x006F, 0x1C, 8),
    (0x0036, 0x1E, 9), (0x001A, 0x21, 10), (0x000D, 0x23, 11), (0x0006, 0x09, 12),
    (0x0003, 0x0A, 13), (0x0001, 0x0C, 13), (0x5A7F, 0x8F, 15), (0x3F25, 0x24, 16),
    (0x2CF2, 0x26, 17), (0x207C, 0x27, 18), (0x17B9, 0x28, 19), (0x1182, 0x2A, 20),
    (0x0CEF, 0x2B, 21), (0x09A1, 0x2D, 22), (0x072F, 0x2E, 23), (0x055C, 0x30, 24),
    (0x0406, 0x31, 25), (0x0303, 0x33, 26), (0x0240, 0x34, 27), (0x01B1, 0x36, 28),
    (0x0144, 0x38, 29), (0x00F5, 0x39, 30), (0x00B7, 0x3B, 31), (0x008A, 0x3C, 32),
    (0x0068, 0x3E, 33), (0x004E, 0x3F, 34), (0x003B, 0x20, 35), (0x002C, 0x21, 9),
    (0x5AE1, 0xA5, 37), (0x484C, 0x40, 38), (0x3A0D, 0x41, 39), (0x2EF1, 0x43, 40),
    (0x261F, 0x44, 41), (0x1F33, 0x45, 42), (0x19A8, 0x46, 43), (0x1518, 0x48, 44),
    (0x1177, 0x49, 45), (0x0E74, 0x4A, 46), (0x0BFB, 0x4B, 47), (0x09F8, 0x4D, 48),
    (0x0861, 0x4E, 49), (0x0706, 0x4F, 50), (0x05CD, 0x30, 51), (0x04DE, 0x32, 52),
    (0x040F, 0x32, 53), (0x0363, 0x33, 54), (0x02D4, 0x34, 55), (0x025C, 0x35, 56),
    (0x01F8, 0x36, 57), (0x01A4, 0x37, 58), (0x0160, 0x38, 59), (0x0125, 0x39, 60),
    (0x00F6, 0x3A, 61), (0x00CB, 0x3B, 62), (0x00AB, 0x3D, 63), (0x008F, 0x3D, 32),
    (0x5B12, 0xC1, 65), (0x4D04, 0x50, 66), (0x412C, 0x51, 67), (0x37D8, 0x52, 68),
    (0x2FE8, 0x53, 69), (0x293C, 0x54, 70), (0x2379, 0x56, 71), (0x1EDF, 0x57, 72),
    (0x1AA9, 0x57, 73), (0x174E, 0x48, 74), (0x1424, 0x48, 75), (0x119C, 0x4A, 76),
    (0x0F6B, 0x4A, 77), (0x0D51, 0x4B, 78), (0x0BB6, 0x4D, 79), (0x0A40, 0x4D, 48),
    (0x5832, 0xD0, 81), (0x4D1C, 0x58, 82), (0x438E, 0x59, 83), (0x3BDD, 0x5A, 84),
    (0x34EE, 0x5B, 85), (0x2EAE, 0x5C, 86), (0x299A, 0x5D, 87), (0x2516, 0x56, 71),
    (0x5570, 0xD8, 89), (0x4CA9, 0x5F, 90), (0x44D9, 0x60, 91), (0x3E22, 0x61, 92),
    (0x3824, 0x63, 93), (0x32B4, 0x63, 94), (0x2E17, 0x5D, 86), (0x56A8, 0xDF, 96),
    (0x4F46, 0x65, 97), (0x47E5, 0x66, 98), (0x41CF, 0x67, 99), (0x3C3D, 0x68, 100),
    (0x375E, 0x63, 93), (0x5231, 0x69, 102), (0x4C0F, 0x6A, 103), (0x4639, 0x6B, 104),
    (0x415E, 0x67, 99), (0x5627, 0xE9, 106), (0x50E7, 0x6C, 107), (0x4B85, 0x6D, 103),
    (0x5597, 0x6E, 109), (0x504F, 0x6F, 107), (0x5A10, 0xEE, 111), (0x5522, 0x70, 109),
    (0x59EB, 0xF0, 111), (0x5A1D, 0x71, 113),
)


class ArithDecoder:
    """QM arithmetic decoder over one entropy-coded scan segment.

    Bytes are consumed lazily; hitting a marker (or the end of input)
    switches to the spec's feed-zero-bytes convention so in-flight
    register bits drain cleanly. ``end_pos()`` then reports where the
    outer marker loop should resume.
    """

    def __init__(self, data: bytes, pos: int):
        self._d = data
        self._pos = pos
        self.marker: int | None = None
        self._marker_pos: int | None = None
        self._reset_registers()

    def _reset_registers(self) -> None:
        # c=0, a=0, ct=-16 forces the first decode to load two bytes
        self._c = 0
        self._a = 0
        self._ct = -16

    def _byte(self) -> int:
        if self.marker is not None:
            return 0
        d, p = self._d, self._pos
        if p >= len(d):
            self.marker = 0xD9  # treat EOF as EOI for draining
            self._marker_pos = len(d)
            return 0
        b = d[p]
        if b != 0xFF:
            self._pos = p + 1
            return b
        q = p + 1
        while q < len(d) and d[q] == 0xFF:  # fill bytes
            q += 1
        if q < len(d) and d[q] == 0x00:  # stuffed 0xFF data byte
            self._pos = q + 1
            return 0xFF
        self.marker = d[q] if q < len(d) else 0xD9
        self._marker_pos = p
        return 0

    def decode(self, stats: bytearray, idx: int) -> int:
        # deferred renormalization + byte feed (F.2.4.3)
        a = self._a
        while a < 0x8000:
            self._ct -= 1
            if self._ct < 0:
                self._c = (self._c << 8) | self._byte()
                self._ct += 8
                if self._ct < 0:
                    self._ct += 1
                    if self._ct == 0:
                        a = 0x8000  # two initial bytes loaded
            a <<= 1
        sv = stats[idx]
        qe, nl, nm = _ARITH_STATES[sv & 0x7F]
        a -= qe
        boundary = a << self._ct
        if self._c < boundary:  # MPS sub-interval
            if a < 0x8000:  # renormalization pending: exchange check
                if a < qe:  # conditional exchange: actually the LPS
                    decision = (sv >> 7) ^ 1
                    stats[idx] = (sv & 0x80) ^ nl  # switch via bit 7
                else:
                    decision = sv >> 7
                    stats[idx] = (sv & 0x80) | nm
            else:
                decision = sv >> 7
        else:  # LPS sub-interval
            self._c -= boundary
            if a < qe:  # conditional exchange: actually the MPS
                decision = sv >> 7
                stats[idx] = (sv & 0x80) | nm
            else:
                decision = (sv >> 7) ^ 1
                stats[idx] = (sv & 0x80) ^ nl
            a = qe
        self._a = a
        return decision

    def restart(self, expected: int) -> None:
        """Consume the RSTn marker and reset the register machine
        (statistics are reset by the caller)."""
        if self.marker is None:
            # decoder buffered ahead of the marker: skip to it
            d = self._d
            p = self._pos
            while p + 1 < len(d) and not (
                d[p] == 0xFF and d[p + 1] != 0x00
            ):
                p += 1
            q = p + 1
            while q < len(d) and d[q] == 0xFF:
                q += 1
            self.marker = d[q] if q < len(d) else 0xD9
            self._marker_pos = p
            self._pos = q + 1
        if self.marker != 0xD0 + expected:
            raise ValueError(
                f"expected RST{expected} in arithmetic scan, found "
                f"marker 0x{self.marker:02X}"
            )
        assert self._marker_pos is not None
        self._pos = self._marker_pos
        while self._pos < len(self._d) and self._d[self._pos] == 0xFF:
            self._pos += 1
        self._pos += 1  # past the marker code byte
        self.marker = None
        self._marker_pos = None
        self._reset_registers()

    def end_pos(self) -> int:
        """Stream position of the next marker's first 0xFF byte."""
        if self._marker_pos is not None:
            return self._marker_pos
        d = self._d
        p = self._pos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        return p



# --- statistical models (T.81 F.1.4.4) ---------------------------------------

_DC_STAT_BINS = 64
_AC_STAT_BINS = 256


def _dc_decode(dec, st, ctx, cond):
    """Decode one DC difference (Figures F.19/F.21-F.24). Returns
    (diff, next_context). ``cond`` is the DAC (L, U) pair."""
    low, up = cond
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    i = ctx + 2 + sign
    m = dec.decode(st, i)
    if m:
        i = 20  # Table F.4: X1
        while dec.decode(st, i):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            i += 1
    # F.1.4.4.1.2: conditioning category for the NEXT block's context
    if m < (1 << low) >> 1:
        nxt = 0
    elif m > (1 << up) >> 1:
        nxt = 12 + (sign << 2)
    else:
        nxt = 4 + (sign << 2)
    v = m
    i += 14  # shared magnitude-bit bin
    m >>= 1
    while m:
        if dec.decode(st, i):
            v |= m
        m >>= 1
    v += 1
    return (-v if sign else v), nxt


def _ac_decode_band(dec, st, fixed, block, k, k_end, kx, al):
    """Decode AC coefficients k..k_end into the zig-zag block (first
    pass: sequential scans with al=0, progressive AC-first with al>0)."""
    while k <= k_end:
        i = 3 * (k - 1)
        if dec.decode(st, i):
            break  # end of block
        while dec.decode(st, i + 1) == 0:
            i += 3
            k += 1
            if k > k_end:
                raise ValueError("arithmetic AC run past band end")
        sign = dec.decode(fixed, 0)
        i += 2
        m = dec.decode(st, i)
        if m:
            if dec.decode(st, i):
                m <<= 1
                i = 189 if k <= kx else 217  # Table F.4: X2/X3 areas
                while dec.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic AC magnitude overflow"
                        )
                    i += 1
        v = m
        i += 14
        m >>= 1
        while m:
            if dec.decode(st, i):
                v |= m
            m >>= 1
        v += 1
        block[k] = (-v if sign else v) << al
        k += 1


def _ac_refine_band(dec, st, fixed, block, ss, se, al):
    """Successive-approximation AC refinement (the arithmetic analogue
    of the Huffman AC-refine scan), over the zig-zag block."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and block[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        i = 3 * (k - 1)
        if k > kex:
            if dec.decode(st, i):
                break
        while True:
            cur = int(block[k])
            if cur:
                if dec.decode(st, i + 2):
                    block[k] = cur + (m1 if cur < 0 else p1)
                break
            if dec.decode(st, i + 1):
                block[k] = m1 if dec.decode(fixed, 0) else p1
                break
            i += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refine run past band")
        k += 1


def decode_scan(
    d: bytes,
    pos: int,
    frame,
    scan: dict,
    ri: int,
    coefs: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    sequential: bool,
    dc_cond: dict,
    ac_cond: dict,
) -> int:
    """Decode one arithmetic-coded scan (sequential or any of the four
    progressive shapes) into the shared zig-zag coefficient store.
    Mirrors :func:`..jpeg._decode_prog_scan`'s MCU geometry, including
    the T.81 A.2 single-component routing. Returns the stream position
    of the next marker."""
    height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    if not sequential:
        if ss == 0 and se != 0:
            raise ValueError("DC progressive scan must have Se = 0")
        if ss != 0:
            if len(scan) != 1:
                raise ValueError(
                    "AC progressive scans must be non-interleaved"
                )
            if not 1 <= ss <= se <= 63:
                raise ValueError("bad spectral selection band")
    dc_stats = {td: bytearray(_DC_STAT_BINS) for td, _ta in scan.values()}
    ac_stats = {ta: bytearray(_AC_STAT_BINS) for _td, ta in scan.values()}
    fixed = bytearray([113])
    dc_ctx = dict.fromkeys(scan, 0)
    last_dc = dict.fromkeys(scan, 0)
    dec = ArithDecoder(d, pos)
    rst = 0

    def reset_condition():
        for b in dc_stats.values():
            b[:] = bytes(len(b))
        for b in ac_stats.values():
            b[:] = bytes(len(b))
        for cid in scan:
            dc_ctx[cid] = 0
            last_dc[cid] = 0

    def block(cid, by, bx):
        cv = coefs[cid][by, bx]
        td, ta = scan[cid]
        if sequential:
            diff, dc_ctx[cid] = _dc_decode(
                dec, dc_stats[td], dc_ctx[cid], dc_cond[td]
            )
            last_dc[cid] += diff
            cv[0] = last_dc[cid]
            _ac_decode_band(
                dec, ac_stats[ta], fixed, cv, 1, 63, ac_cond[ta], 0
            )
        elif ss == 0 and ah == 0:  # DC first
            diff, dc_ctx[cid] = _dc_decode(
                dec, dc_stats[td], dc_ctx[cid], dc_cond[td]
            )
            last_dc[cid] += diff
            cv[0] = last_dc[cid] << al
        elif ss == 0:  # DC refine: one fixed-probability bit per block
            if dec.decode(fixed, 0):
                cv[0] = int(cv[0]) | (1 << al)
        elif ah == 0:  # AC first
            _ac_decode_band(
                dec, ac_stats[ta], fixed, cv, ss, se, ac_cond[ta], al
            )
        else:  # AC refine
            _ac_refine_band(dec, ac_stats[ta], fixed, cv, ss, se, al)

    interleaved = (sequential or ss == 0) and len(scan) > 1
    if interleaved:
        for m in range(mcux * mcuy):
            if ri and m and m % ri == 0:
                dec.restart(rst)
                rst = (rst + 1) & 7
                reset_condition()
            my, mx = divmod(m, mcux)
            for cid, ch, cv_, _tq in comps:
                for by in range(cv_):
                    for bx in range(ch):
                        block(cid, my * cv_ + by, mx * ch + bx)
    else:  # single component, block raster (T.81 A.2)
        (cid,) = scan
        _, ch, cv_, _tq = by_id[cid]
        w_i = -(-width * ch // hmax)
        h_i = -(-height * cv_ // vmax)
        bw_, bh_ = -(-w_i // 8), -(-h_i // 8)
        for m in range(bw_ * bh_):
            if ri and m and m % ri == 0:
                dec.restart(rst)
                rst = (rst + 1) & 7
                reset_condition()
            by, bx = divmod(m, bw_)
            block(cid, by, bx)
    if dec.marker is not None and 0xD0 <= dec.marker <= 0xD7:
        raise ValueError("unconsumed restart marker in arithmetic scan")
    if dec.marker is not None and dec.end_pos() >= len(d):
        # zero-feeding past a REAL marker is the spec's drain convention,
        # but running off the end of the input means the file was cut
        # mid-scan (no EOI can follow) — fail loudly, don't return the
        # zero-extrapolated image.
        raise ValueError("truncated arithmetic-coded scan")
    return dec.end_pos()
