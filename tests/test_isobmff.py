"""ISOBMFF (ISO/IEC 14496-12) container parser tests — AVIF + MP4.

House codec-test pattern (cf. ``test_vp8l.py`` / ``test_text_multimodal.py``):
hand-built box trees with exact closed-form ground truth, version/flags
variants (v0/v1 FullBoxes, ipma essential-wide entries, co64, uniform
stsz, 64-bit ``largesize``), a byte-by-byte truncation sweep that must
never escape the documented error contract, malformed-input rejection,
and the Spark wiring: ``probe_assets`` fills AVIF dims / MP4 duration
and ``sample_frames`` emits the container's REAL codec-sample bytes.
"""

from __future__ import annotations

import struct

import pytest

from neo4j_to_clickhouse_spark.operators import multimodal as M
from neo4j_to_clickhouse_spark.operators.isobmff import (
    box,
    encode_avif,
    encode_mp4,
    find_box,
    fullbox,
    is_avif,
    is_isobmff,
    is_mp4,
    iter_boxes,
    mp4_extract_samples,
    mp4_sample_index,
    probe_avif,
    probe_mp4,
)


def _mp4_fixture(**kw):
    """9 samples of distinct sizes/bytes, keyframes every 3rd sample."""
    samples = [bytes([i + 1]) * (10 + 7 * i) for i in range(9)]
    deltas = [100, 100, 100, 200, 200, 200, 150, 150, 150]
    kw.setdefault("keyframes", [1, 4, 7])
    kw.setdefault("width", 320)
    kw.setdefault("height", 180)
    return samples, deltas, encode_mp4(samples, deltas, **kw)


# --- box grammar --------------------------------------------------------------


def test_iter_boxes_largesize_and_size_zero():
    inner = box(b"aaaa", b"x" * 5)
    big = box(b"bbbb", b"y" * 9, largesize=True)
    # size == 0: "to end of enclosing box"
    tail = struct.pack(">I4s", 0, b"cccc") + b"z" * 3
    buf = inner + big + tail
    got = list(iter_boxes(buf))
    assert [t for t, _, _ in got] == [b"aaaa", b"bbbb", b"cccc"]
    t, p0, p1 = got[1]
    assert buf[p0:p1] == b"y" * 9  # 16-byte header skipped
    t, p0, p1 = got[2]
    assert buf[p0:p1] == b"z" * 3  # runs to end of buffer


def test_iter_boxes_corrupt_sizes_terminate():
    # size smaller than its own header
    assert list(iter_boxes(struct.pack(">I4s", 4, b"free"))) == []
    # size overrunning the buffer
    assert list(iter_boxes(struct.pack(">I4s", 100, b"free") + b"x")) == []
    # truncated largesize
    assert list(iter_boxes(struct.pack(">I4s", 1, b"free"))) == []


def test_find_box_descends_and_skips_meta_fullbox_header():
    tree = box(
        b"moov", box(b"trak", box(b"mdia", box(b"hdlr", b"HH")))
    )
    span = find_box(tree, (b"moov", b"trak", b"mdia", b"hdlr"))
    assert span is not None and tree[span[0] : span[1]] == b"HH"
    # meta is a FullBox container: the 4-byte version/flags prefix is
    # skipped before walking children
    meta = fullbox(b"meta", 0, 0, box(b"pitm", b"PP"))
    span = find_box(meta, (b"meta", b"pitm"))
    assert span is not None and meta[span[0] : span[1]] == b"PP"


# --- AVIF probe ---------------------------------------------------------------


def test_avif_probe_basic():
    data = encode_avif(640, 360)
    assert is_isobmff(data) and is_avif(data) and not is_mp4(data)
    info = probe_avif(data)
    assert info == {
        "width": 640,
        "height": 360,
        "bit_depth": 8,
        "has_alpha": False,
        "codec": "av01",
        "animated": False,
    }


@pytest.mark.parametrize("depth", [8, 10, 12])
def test_avif_probe_bit_depths(depth):
    info = probe_avif(encode_avif(64, 48, depth=depth))
    assert info["bit_depth"] == depth


def test_avif_probe_alpha_and_animation():
    info = probe_avif(encode_avif(100, 50, alpha=True))
    assert info["has_alpha"] is True
    assert probe_avif(encode_avif(100, 50))["has_alpha"] is False
    assert probe_avif(encode_avif(100, 50, animated=True))["animated"]


@pytest.mark.parametrize(
    "infe_version,ipma_version,ipma_wide",
    [(2, 0, False), (2, 0, True), (2, 1, False), (3, 0, False), (3, 1, True)],
)
def test_avif_probe_fullbox_version_variants(
    infe_version, ipma_version, ipma_wide
):
    data = encode_avif(
        33,
        77,
        depth=10,
        alpha=True,
        infe_version=infe_version,
        ipma_version=ipma_version,
        ipma_wide=ipma_wide,
    )
    info = probe_avif(data)
    assert (info["width"], info["height"]) == (33, 77)
    assert info["bit_depth"] == 10
    assert info["has_alpha"] is True


def test_avif_rejects_non_avif():
    assert probe_avif(b"") is None
    assert probe_avif(b"\x00" * 40) is None
    assert not is_avif(encode_mp4([b"x" * 4], [100], None))
    # valid ftyp but no meta box
    data = box(b"ftyp", b"avif" + b"\x00" * 4 + b"avif" + b"mif1")
    assert probe_avif(data) is None


def test_avif_truncation_sweep():
    """Every prefix either probes to None or to internally consistent
    values — never an uncaught exception (the probe contract)."""
    data = encode_avif(640, 360, depth=10, alpha=True)
    for cut in range(len(data)):
        info = probe_avif(data[:cut])
        assert info is None or (
            info["width"] == 640 and info["height"] == 360
        )


# --- MP4 probe ----------------------------------------------------------------


@pytest.mark.parametrize("v1_headers", [False, True])
def test_mp4_probe_tracks(v1_headers):
    samples, deltas, data = _mp4_fixture(v1_headers=v1_headers)
    assert is_mp4(data) and not is_avif(data)
    info = probe_mp4(data)
    assert info["duration_ms"] == sum(deltas)  # timescale 1000
    assert info["n_tracks"] == 1
    trk = info["tracks"][0]
    assert trk["handler"] == "vide"
    assert trk["codec"] == "av01"
    assert (trk["width"], trk["height"]) == (320, 180)
    assert trk["n_samples"] == 9
    assert trk["n_keyframes"] == 3
    assert trk["duration_ms"] == sum(deltas)


def test_mp4_probe_no_stss_means_all_sync():
    _, _, data = _mp4_fixture(keyframes=None)
    assert probe_mp4(data)["tracks"][0]["n_keyframes"] == 9
    index = mp4_sample_index(data)
    assert all(k for _, _, k, _ in index)


# --- MP4 sample index ---------------------------------------------------------


@pytest.mark.parametrize("spc,use_co64", [(1, False), (2, False), (4, True)])
def test_mp4_sample_index_roundtrip(spc, use_co64):
    """The flattened index must map every sample back to its exact
    planted bytes across chunking layouts and stco/co64."""
    samples, deltas, data = _mp4_fixture(
        samples_per_chunk=spc, use_co64=use_co64
    )
    index = mp4_sample_index(data)
    assert len(index) == len(samples)
    pts = 0
    for i, (off, size, key, pts_ms) in enumerate(index):
        assert data[off : off + size] == samples[i]
        assert key == (i % 3 == 0)  # stss [1, 4, 7]
        assert pts_ms == pts
        pts += deltas[i]


def test_mp4_sample_index_uniform_stsz():
    samples = [bytes([i]) * 32 for i in range(5)]
    data = encode_mp4(samples, [40] * 5, keyframes=[1])
    index = mp4_sample_index(data)
    assert [s for _, s, _, _ in index] == [32] * 5
    for i, (off, size, _, _) in enumerate(index):
        assert data[off : off + size] == samples[i]


def test_mp4_sample_index_missing_tables_raise():
    with pytest.raises(ValueError):
        mp4_sample_index(b"not mp4 at all")
    # a moov with a video track but an empty stbl (fragmented-MP4 shape)
    stbl = box(b"stbl", b"")
    hdlr = fullbox(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 13)
    mdhd = fullbox(
        b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0) + b"\x00" * 4
    )
    trak = box(b"trak", box(b"mdia", mdhd + hdlr + box(b"minf", stbl)))
    mvhd = fullbox(
        b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0) + b"\x00" * 80
    )
    data = (
        box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom" + b"mp41")
        + box(b"moov", mvhd + trak)
    )
    assert is_mp4(data)
    with pytest.raises(ValueError):
        mp4_sample_index(data)
    # audio-only movie: no matching track
    _, _, video = _mp4_fixture()
    with pytest.raises(ValueError):
        mp4_sample_index(video, track_id=99)


def test_mp4_truncation_sweep():
    """Prefixes must either fail the sniff, raise ValueError, or yield
    samples whose byte ranges still lie inside the prefix."""
    samples, _, data = _mp4_fixture()
    for cut in range(len(data)):
        prefix = data[:cut]
        if not is_mp4(prefix):
            continue
        try:
            index = mp4_sample_index(prefix)
        except ValueError:
            continue
        for off, size, _, _ in index:
            # offsets come from stco; sizes from stsz — the index may
            # point past a truncated mdat, but must never misalign
            # within available bytes
            if off + size <= cut:
                i = [s[0] for s in samples].index(prefix[off])
                assert prefix[off : off + size] == samples[i]


# --- MP4 frame extraction -----------------------------------------------------


def test_mp4_extract_samples_nearest_and_keyframe_snap():
    samples, deltas, data = _mp4_fixture()
    # pts: 0,100,200,300,500,700,900,1050,1200 — keyframes at idx 0,3,6;
    # ticks 0/400/800/1200 select the last sample with pts <= tick
    got = mp4_extract_samples(data, every_ms=400)
    assert [(i, p) for i, p, _ in got] == [
        (0, 0),
        (3, 300),
        (5, 700),
        (8, 1200),
    ]
    for i, _, payload in got:
        assert payload == samples[i]
    snapped = mp4_extract_samples(data, every_ms=400, keyframes_only=True)
    assert [(i, p) for i, p, _ in snapped] == [
        (0, 0),
        (3, 300),
        (3, 300),
        (6, 900),
    ]
    for i, _, payload in snapped:
        assert payload == samples[i]


# --- iloc / item payload --------------------------------------------------------


def _iloc_v0(items):
    """items: {id: [(off, len)]} — offset_size 4, length_size 4."""
    body = bytes([0x44, 0x00]) + struct.pack(">H", len(items))
    for item_id, extents in sorted(items.items()):
        body += struct.pack(">HHH", item_id, 0, len(extents))
        for off, ln in extents:
            body += struct.pack(">II", off, ln)
    return fullbox(b"iloc", 0, 0, body)


def test_item_payload_file_offsets_and_extents():
    mdat_payload = b"AAAABBBBBCCCC"
    iloc_ph = _iloc_v0({1: [(0, 4), (9, 4)], 2: [(4, 5)]})
    meta = fullbox(b"meta", 0, 0, iloc_ph)
    base = len(meta) + 8
    meta = fullbox(
        b"meta",
        0,
        0,
        _iloc_v0({1: [(base, 4), (base + 9, 4)], 2: [(base + 4, 5)]}),
    )
    data = meta + box(b"mdat", mdat_payload)
    from neo4j_to_clickhouse_spark.operators.isobmff import item_payload

    assert item_payload(data, 1) == b"AAAACCCC"  # extents concatenate
    assert item_payload(data, 2) == b"BBBBB"
    assert item_payload(data, 9) is None
    # out-of-bounds extent -> None, not a slice of garbage
    bad = fullbox(b"meta", 0, 0, _iloc_v0({1: [(10_000, 4)]}))
    assert item_payload(bad + box(b"mdat", b"x"), 1) is None


def test_item_payload_idat_construction_method():
    # v1 iloc, construction_method 1: offsets into the idat payload
    body = bytes([0x44, 0x00]) + struct.pack(">H", 1)
    body += struct.pack(">HHHH", 1, 1, 0, 1)  # id, method 1, dref, 1 ext
    body += struct.pack(">II", 3, 5)
    meta = fullbox(
        b"meta", 0, 0, fullbox(b"iloc", 1, 0, body) + box(b"idat", b"xyzHELLOqq")
    )
    from neo4j_to_clickhouse_spark.operators.isobmff import item_payload

    assert item_payload(meta, 1) == b"HELLO"


def test_wrap_av1_item_as_avif_shape():
    """The rewrap must be a well-formed single-item AVIF whose iloc
    points exactly at the sample bytes (self-validated by our own
    parser; the libheif decode equivalence lives in test_heif.py)."""
    from neo4j_to_clickhouse_spark.operators.isobmff import (
        item_payload,
        primary_item_id,
        wrap_av1_item_as_avif,
    )

    sample = bytes(range(64))
    avif = wrap_av1_item_as_avif(sample, b"\x81\x00\x0c\x00", 320, 180)
    assert is_avif(avif)
    info = probe_avif(avif)
    assert (info["width"], info["height"]) == (320, 180)
    assert info["codec"] == "av01"
    pid = primary_item_id(avif)
    assert pid == 1
    assert item_payload(avif, pid) == sample


def test_mp4_video_config_roundtrip():
    from neo4j_to_clickhouse_spark.operators.isobmff import mp4_video_config

    av1c = b"\x81\x00\x0c\x00"
    seb = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", 96, 64)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 0x0018, -1)
        + box(b"av1C", av1c)
    )
    data = encode_mp4(
        [b"S" * 10], [100], keyframes=[1], codec=b"av01",
        sample_entry_body=seb, width=96, height=64,
    )
    cfg = mp4_video_config(data)
    assert cfg == {
        "codec": "av01",
        "width": 96,
        "height": 64,
        "config_type": "av1C",
        "config": av1c,
    }
    # the opaque default entry yields no config but never crashes
    _, _, plain = _mp4_fixture()
    cfg2 = mp4_video_config(plain)
    assert cfg2 is not None and cfg2["config"] is None


# --- Spark wiring (multimodal consumers) ---------------------------------------


def test_probe_assets_fills_avif_and_mp4_metadata(spark):
    avif = encode_avif(640, 360, depth=10, alpha=True)
    _, deltas, mp4 = _mp4_fixture()
    df = spark.createDataFrame(
        [("img-avif", bytearray(avif)), ("vid-mp4", bytearray(mp4))],
        "asset_id string, payload binary",
    )
    assets = M.ingest_binary_assets(df, "asset_id", "payload", "image")
    rows = {r.asset_id: r for r in M.probe_assets(assets).collect()}
    assert (rows["img-avif"].width, rows["img-avif"].height) == (640, 360)
    assert rows["img-avif"].duration_ms is None
    assert rows["vid-mp4"].duration_ms == sum(deltas)
    assert (rows["vid-mp4"].width, rows["vid-mp4"].height) == (320, 180)


def test_sample_frames_emits_real_mp4_codec_samples(spark):
    samples, _, mp4 = _mp4_fixture()
    df = spark.createDataFrame(
        [("vid", bytearray(mp4))], "asset_id string, payload binary"
    )
    assets = M.ingest_binary_assets(df, "asset_id", "payload", "video")
    rows = M.sample_frames(assets, every_ms=400, decode_stub="raise").collect()
    # keyframe-snapped: the emitted payloads ARE the planted codec samples
    assert [(r.frame_idx, r.frame_ms) for r in rows] == [
        (0, 0),
        (3, 300),
        (3, 300),
        (6, 900),
    ]
    for r in rows:
        assert bytes(r.payload) == samples[r.frame_idx]
