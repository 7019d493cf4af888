"""Arithmetic-coded JPEG (SOF9/SOF10) decoder tests.

Validation is against the SYSTEM libjpeg through a small C oracle
(``tests/helpers/jpeg_arith_oracle.c``, compiled on demand; all tests
skip cleanly when gcc or the jpeglib headers are absent):

- the oracle ENCODES real arithmetic streams (cinfo.arith_code=TRUE)
  across sequential/progressive x gray/4:4:4/4:2:0 x quality x restart
  intervals, and dumps the quantized coefficients it decodes back;
- the pure-Python decoder must reproduce those coefficients
  INTEGER-EXACT (no IDCT/upsampling tolerance laundering — any
  arithmetic-decode slip cascades and fails hard);
- the QM-coder state table constant is re-verified against the
  library's exported ``jpeg_aritab`` symbol (it was extracted from
  there, byte layout pinned by the spec's known states 0/1).
"""

from __future__ import annotations

import ctypes
import shutil
import struct
import subprocess

import numpy as np
import pytest

from neo4j_to_clickhouse_spark.operators.jpeg import ZIGZAG, decode_jpeg
from neo4j_to_clickhouse_spark.operators.jpeg_arith import _ARITH_STATES

_ORACLE_SRC = "tests/helpers/jpeg_arith_oracle.c"


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("no C compiler for the libjpeg oracle")
    exe = tmp_path_factory.mktemp("jpeg_oracle") / "oracle"
    build = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), _ORACLE_SRC, "-ljpeg"],
        capture_output=True,
    )
    if build.returncode != 0:
        pytest.skip(f"libjpeg oracle build failed: {build.stderr[:200]!r}")
    return str(exe)


def _encode(oracle, img, quality, progressive, subsample, restart=0):
    h, w, nc = img.shape
    out = subprocess.run(
        [
            oracle, "encode", str(w), str(h), str(nc), str(quality),
            str(progressive), str(subsample), str(restart),
        ],
        input=img.tobytes(),
        capture_output=True,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout[:2] == b"\xff\xd8"
    return out.stdout


def _coefs(oracle, jpg):
    out = subprocess.run([oracle, "coefs"], input=jpg, capture_output=True)
    assert out.returncode == 0, out.stderr
    data = out.stdout
    comps = []
    while data:
        hdr, _, data = data.partition(b"\n")
        f = hdr.split()
        rows, cols = int(f[2]), int(f[3])
        nbytes = rows * cols * 64 * 2
        comps.append(
            np.frombuffer(data[:nbytes], "<i2").reshape(rows, cols, 64)
        )
        data = data[nbytes:]
    return comps


def _decode_px(oracle, jpg):
    out = subprocess.run([oracle, "decode"], input=jpg, capture_output=True)
    assert out.returncode == 0, out.stderr
    hdr, _, rest = out.stdout.partition(b"\n")
    w, h, nc = map(int, hdr.split())
    return np.frombuffer(rest[: w * h * nc], np.uint8).reshape(h, w, nc)


def _images():
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:48, 0:37]
    grad = np.dstack(
        [(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256]
    ).astype(np.uint8)
    return {
        # name: (image, quality, progressive, subsample, restart)
        "gray_seq": (rng.integers(0, 256, (16, 16, 1), np.uint8), 85, 0, 0, 0),
        "rgb444_seq": (rng.integers(0, 256, (24, 17, 3), np.uint8), 90, 0, 0, 0),
        "rgb420_seq": (rng.integers(0, 256, (33, 26, 3), np.uint8), 75, 0, 1, 0),
        "grad420_seq_q50": (grad, 50, 0, 1, 0),
        "rgb444_seq_q10": (rng.integers(0, 256, (20, 20, 3), np.uint8), 10, 0, 0, 0),
        "rgb444_seq_q100": (rng.integers(0, 256, (18, 21, 3), np.uint8), 100, 0, 0, 0),
        "rgb420_seq_rst2": (rng.integers(0, 256, (40, 40, 3), np.uint8), 80, 0, 1, 2),
        "gray_seq_rst1": (rng.integers(0, 256, (32, 24, 1), np.uint8), 85, 0, 0, 1),
        "rgb444_prog": (rng.integers(0, 256, (24, 19, 3), np.uint8), 85, 1, 0, 0),
        "grad420_prog": (grad, 70, 1, 1, 0),
        "gray_prog": (rng.integers(0, 256, (26, 30, 1), np.uint8), 60, 1, 0, 0),
        "rgb420_prog_rst3": (rng.integers(0, 256, (48, 32, 3), np.uint8), 80, 1, 1, 3),
    }


@pytest.mark.parametrize("name", sorted(_images()))
def test_coefficients_match_libjpeg_exactly(oracle, name):
    img, q, prog, sub, rst = _images()[name]
    jpg = _encode(oracle, img, q, prog, sub, rst)
    # confirm the stream really is arithmetic-coded (SOF9 or SOF10)
    markers = {
        jpg[i + 1]
        for i in range(len(jpg) - 1)
        if jpg[i] == 0xFF and jpg[i + 1] not in (0x00, 0xFF)
    }
    assert markers & {0xC9, 0xCA}, "oracle did not emit an arithmetic SOF"
    ref = _coefs(oracle, jpg)
    sink = {}
    decode_jpeg(jpg, _coef_sink=sink)
    cids = sorted(sink["coefs"])
    assert len(cids) == len(ref)
    for idx, cid in enumerate(cids):
        zz = sink["coefs"][cid]
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz  # store is zig-zag; libjpeg dumps natural
        rows, cols = ref[idx].shape[:2]
        assert (nat[:rows, :cols] == ref[idx]).all(), f"component {idx}"


@pytest.mark.parametrize("name", ["gray_seq", "rgb444_seq", "rgb444_prog"])
def test_pixels_close_to_libjpeg(oracle, name):
    """Full pipeline (entropy + dequant + IDCT) vs libjpeg pixels.
    Unsubsampled only: 4:2:0 differs legitimately in chroma upsampling
    (libjpeg's fancy upsampler), which the coefficient test sidesteps."""
    img, q, prog, sub, rst = _images()[name]
    assert sub == 0
    jpg = _encode(oracle, img, q, prog, sub, rst)
    mine = decode_jpeg(jpg)
    ref = _decode_px(oracle, jpg)
    if ref.shape[2] == 1:
        ref = np.repeat(ref, 3, axis=2)
    assert mine.shape == ref.shape
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 3


def test_state_table_matches_library():
    try:
        lib = ctypes.CDLL("libjpeg.so.62")
        raw = ctypes.string_at(
            ctypes.addressof((ctypes.c_char * 912).in_dll(lib, "jpeg_aritab")),
            912,
        )
    except OSError:
        pytest.skip("system libjpeg not available")
    vals = struct.unpack("<114q", raw)
    expect = tuple(
        ((v >> 16) & 0xFFFF, v & 0xFF, (v >> 8) & 0xFF) for v in vals
    )
    assert _ARITH_STATES == expect


def test_truncated_arith_stream_raises(oracle):
    img, q, prog, sub, rst = _images()["rgb444_seq"]
    jpg = _encode(oracle, img, q, prog, sub, rst)
    # cut inside the entropy segment: the decoder drains with zero feed
    # and must fail loudly (incomplete component coverage), not loop
    with pytest.raises(ValueError):
        decode_jpeg(jpg[: len(jpg) // 2])


def test_decode_image_handles_arithmetic_jpeg(oracle):
    """The multimodal sniffing path decodes SOF9 payloads when Pillow
    is absent (and maps decode problems to the stub, never crashing)."""
    from neo4j_to_clickhouse_spark.operators import multimodal

    img, q, prog, sub, rst = _images()["gray_seq"]
    jpg = _encode(oracle, img, q, prog, sub, rst)
    decoded = multimodal.decode_image(jpg)
    try:
        import PIL  # noqa: F401 — Pillow fast path may reject/accept
    except ImportError:
        assert decoded is not None
        fmt, pixels = decoded
        assert fmt == "jpeg"
        assert pixels.shape == (16, 16, 3)
