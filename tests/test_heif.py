"""libheif decode-path tests (AVIF/HEIC pixel decode, ctypes).

Gated on the system library like the libwebp/vp8 suites. Two jobs:

- certify the OUR-side plumbing (ctypes wrapper, decode_image routing,
  probe/feature/resize integration, no-library degradation), and
- validate the pure-Python ISOBMFF container parser against REAL
  encoder output (libheif/aom/x265), not only hand-built box trees.
"""

from __future__ import annotations

import numpy as np
import pytest

from neo4j_to_clickhouse_spark.operators import heif
from neo4j_to_clickhouse_spark.operators import multimodal as M
from neo4j_to_clickhouse_spark.operators.isobmff import (
    is_avif,
    is_heif_still,
    is_mp4,
    probe_avif,
)

needs_libheif = pytest.mark.skipif(
    not heif.available(), reason="system libheif not available"
)


def _test_rgb(h=40, w=64):
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2] = [200, 40, 90]
    rgb[h // 2 :, :] = [10, 220, 130]
    rgb[:4, :4] = [255, 255, 0]
    return rgb


@needs_libheif
@pytest.mark.parametrize("codec,fmt", [("av1", "avif"), ("hevc", "heic")])
def test_roundtrip_near_lossless(codec, fmt):
    """Lossless-mode encode -> our ctypes decode: pixel values within
    the RGB<->YCbCr integer-rounding bound (+-2), dims exact."""
    rgb = _test_rgb()
    data = heif.encode_heif(rgb, codec=codec, lossless=True)
    out = heif.decode_heif(data)
    assert out.shape == rgb.shape
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 2
    # decode_image routes by ftyp brand and reports the right format
    decoded = M.decode_image(data)
    assert decoded is not None
    got_fmt, arr = decoded
    assert got_fmt == fmt
    assert np.array_equal(arr, out)


@needs_libheif
def test_container_parser_meets_real_avif_encoder():
    """probe_avif (pure-Python ISOBMFF walk) on genuine libheif/aom
    output: dims, codec, depth, alpha-absence all as encoded — the
    parser works on real-world files, not only the house fixtures."""
    rgb = _test_rgb(33, 47)  # odd dims survive the item tree
    data = heif.encode_heif(rgb, codec="av1", lossless=True)
    assert is_avif(data) and is_heif_still(data) and not is_mp4(data)
    info = probe_avif(data)
    assert info is not None
    assert (info["width"], info["height"]) == (47, 33)
    assert info["codec"] == "av01"
    assert info["bit_depth"] == 8
    assert info["has_alpha"] is False
    assert info["animated"] is False
    # and agrees with libheif's own handle-level probe
    hp = heif.probe_heif(data)
    assert (hp["width"], hp["height"]) == (47, 33)
    assert hp["has_alpha"] is False


@needs_libheif
def test_container_parser_meets_real_heic_encoder():
    rgb = _test_rgb(32, 48)
    data = heif.encode_heif(rgb, codec="hevc", lossless=True)
    assert is_heif_still(data) and not is_avif(data) and not is_mp4(data)
    info = probe_avif(data)
    assert info is not None
    assert (info["width"], info["height"]) == (48, 32)
    # libheif tiles HEVC stills behind a `grid` derived item whose own
    # ispe carries the full dims; bare hvc1/hev1 primaries also occur
    assert info["codec"] in ("hvc1", "hev1", "grid")


@needs_libheif
def test_alpha_roundtrip_and_container_flag():
    rgb = _test_rgb()
    alpha = np.zeros((40, 64), np.uint8)
    alpha[10:30, 16:48] = 255  # binary mask survives lossy-ish alpha
    rgba = np.dstack([rgb, alpha])
    data = heif.encode_heif(rgba, codec="av1", lossless=True)
    out = heif.decode_heif(data, rgba=True)
    assert out.shape == (40, 64, 4)
    assert int(np.abs(out[..., 3].astype(int) - alpha).max()) <= 2
    # the pure container walk sees the aux alpha item
    info = probe_avif(data)
    assert info is not None and info["has_alpha"] is True
    assert heif.probe_heif(data)["has_alpha"] is True


@needs_libheif
def test_decode_rejects_garbage_and_truncation():
    rgb = _test_rgb()
    data = heif.encode_heif(rgb, codec="av1")
    with pytest.raises(ValueError):
        heif.decode_heif(data[: len(data) // 2])
    with pytest.raises(ValueError):
        heif.decode_heif(b"ftyp garbage" * 4)
    # decode_image maps those to the stub fallback, never crashes
    for cut in range(0, len(data), 7):
        M.decode_image(data[:cut])  # must not raise
    assert M.decode_image(data[: len(data) // 2]) is None


def test_no_library_degrades_to_container_probe(monkeypatch):
    """With libheif absent the decode path reports unavailable and
    decode_image returns None for AVIF (stub fallback), while the
    pure-Python container probe still serves metadata."""
    from neo4j_to_clickhouse_spark.operators.isobmff import encode_avif

    monkeypatch.setattr(heif, "_LIB", None)
    assert not heif.available()
    data = encode_avif(640, 360)
    assert M.decode_image(data) is None
    assert heif.probe_heif(data) is None
    with pytest.raises(RuntimeError):
        heif.decode_heif(data)
    info = probe_avif(data)
    assert (info["width"], info["height"]) == (640, 360)


@needs_libheif
def test_probe_assets_fills_real_avif_and_heic_dims(spark):
    avif = heif.encode_heif(_test_rgb(24, 56), codec="av1")
    heic = heif.encode_heif(_test_rgb(40, 32), codec="hevc")
    df = spark.createDataFrame(
        [("a", bytearray(avif)), ("h", bytearray(heic))],
        "asset_id string, payload binary",
    )
    assets = M.ingest_binary_assets(df, "asset_id", "payload", "image")
    rows = {r.asset_id: r for r in M.probe_assets(assets).collect()}
    assert (rows["a"].width, rows["a"].height) == (56, 24)
    assert (rows["h"].width, rows["h"].height) == (32, 40)
    assert rows["a"].duration_ms is None


@needs_libheif
def test_extract_features_decodes_real_avif(spark):
    """decode_stub='raise' proves the AVIF went through the REAL decode
    (the stub path would raise); features are pixel-derived."""
    flat = np.full((16, 16, 3), 128, np.uint8)
    data = heif.encode_heif(flat, codec="av1", lossless=True)
    df = spark.createDataFrame(
        [("a", bytearray(data))], "asset_id string, payload binary"
    )
    assets = M.ingest_binary_assets(df, "asset_id", "payload", "image")
    row = M.extract_features(assets, dim=8, decode_stub="raise").collect()[0]
    # channel means of a flat 128 image: ~0.5 after /256 (+-rounding)
    assert all(abs(v - 0.5) < 0.02 for v in row.feature[:3])


@needs_libheif
def test_resize_real_avif_reencodes_ppm(spark):
    data = heif.encode_heif(_test_rgb(), codec="av1")
    df = spark.createDataFrame(
        [("a", bytearray(data))], "asset_id string, payload binary"
    )
    out = M.resize_images(df, 20, 10, decode_stub="raise").collect()[0]
    assert (out.width, out.height) == (20, 10)
    payload = bytes(out.payload)
    assert payload[:2] == b"P6"  # lossless container re-encode
    fmt, arr = M.decode_image(payload)
    assert fmt == "ppm" and arr.shape == (10, 20, 3)
