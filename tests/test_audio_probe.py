"""MP3/FLAC header probes (VERDICT r10 item 5): closed-form fixtures —
the encoders build byte-exact containers from integer parameters and the
probes must recover those integers exactly. No external audio library
exists in this environment (no mutagen/lame/flac/mpg123, re-probed), so
the closed forms ARE the oracle; the registry additionally folds both
formats into the multimodal_probe_stats DuckDB oracle.
"""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neo4j_to_clickhouse_spark.operators.audio_probe import (
    _frame_params,
    encode_flac,
    encode_mp3,
    is_flac,
    is_mp3,
    probe_flac,
    probe_mp3,
)

# ---------------------------------------------------------------- FLAC


def test_flac_streaminfo_roundtrip():
    p = encode_flac(160000, 16000, channels=2, bits_per_sample=24)
    assert is_flac(p)
    info = probe_flac(p)
    assert info == {
        "duration_ms": 10000,
        "sample_rate": 16000,
        "channels": 2,
        "bits_per_sample": 24,
        "total_samples": 160000,
    }


def test_flac_unknown_length_gives_no_duration():
    info = probe_flac(encode_flac(0, 44100))
    assert info["duration_ms"] is None
    assert info["total_samples"] == 0


def test_flac_max_fields_pack_without_overflow():
    # 20-bit rate, 8 channels, 32 bps, 36-bit total samples — the
    # extreme legal values exercise every bit boundary in the packing
    total = (1 << 36) - 1
    info = probe_flac(
        encode_flac(total, (1 << 20) - 1, channels=8, bits_per_sample=32)
    )
    assert info["total_samples"] == total
    assert info["sample_rate"] == (1 << 20) - 1
    assert info["channels"] == 8
    assert info["bits_per_sample"] == 32


def test_flac_streaminfo_after_other_blocks():
    # tolerate a (spec-violating) leading PADDING block
    p = encode_flac(16000, 16000)
    streaminfo_block = p[4 : 4 + 4 + 34]
    # strip is-last from streaminfo, prepend padding (type 1, not last)
    si = bytes([streaminfo_block[0] & 0x7F]) + streaminfo_block[1:]
    pad = bytes([0x01]) + struct.pack(">I", 8)[1:] + b"\x00" * 8
    reordered = b"fLaC" + pad + bytes([si[0] | 0x80]) + si[1:]
    assert probe_flac(reordered)["duration_ms"] == 1000


def test_flac_truncation_sweep_never_raises():
    p = encode_flac(48000, 48000)
    for cut in range(len(p)):
        probe_flac(p[:cut])  # must not raise; None or partial is fine


def test_flac_zero_rate_rejected():
    body = bytearray(encode_flac(100, 16000))
    # zero the 20 rate bits (top 20 bits of the u64 at body offset 18)
    u64 = int.from_bytes(body[18:26], "big") & ((1 << 44) - 1)
    body[18:26] = u64.to_bytes(8, "big")
    assert probe_flac(bytes(body)) is None


# ----------------------------------------------------------------- MP3


def test_mp3_cbr_walk():
    # 40 frames MPEG1 L3 @44100: duration = 40*1152*1000//44100
    p = encode_mp3(40)
    assert is_mp3(p)
    info = probe_mp3(p)
    assert info["method"] == "walk"
    assert info["n_frames"] == 40
    assert info["sample_rate"] == 44100
    assert info["channels"] == 1
    assert info["duration_ms"] == 40 * 1152 * 1000 // 44100


def test_mp3_xing_header_takes_precedence():
    p = encode_mp3(500, vbr_header="xing")
    info = probe_mp3(p)
    assert info["method"] == "xing"
    # Xing count is authoritative even though only 501 physical frames
    assert info["n_frames"] == 500
    assert info["duration_ms"] == 500 * 1152 * 1000 // 44100


def test_mp3_xing_without_frames_flag_skips_tag_frame():
    # ADVICE r11: Xing/Info magic with FRAMES flag unset falls back to
    # the walk, which must NOT count the metadata tag frame itself.
    p = encode_mp3(40, vbr_header="xing_noframes")
    info = probe_mp3(p)
    assert info["method"] == "walk"
    assert info["n_frames"] == 40
    assert info["duration_ms"] == 40 * 1152 * 1000 // 44100


def test_mp3_vbri_header():
    p = encode_mp3(7, vbr_header="vbri")
    info = probe_mp3(p)
    assert info["method"] == "vbri"
    assert info["n_frames"] == 7


def test_mp3_id3v2_skip():
    plain = probe_mp3(encode_mp3(12))
    tagged = probe_mp3(encode_mp3(12, id3v2_bytes=321))
    assert tagged == plain


def test_mp3_stereo_xing_offset():
    # stereo MPEG1 side info is 32 bytes — the Xing tag moves
    p = encode_mp3(9, channels=2, vbr_header="xing")
    info = probe_mp3(p)
    assert info["method"] == "xing"
    assert info["channels"] == 2


def test_mp3_id3v1_trailer_tolerated():
    p = encode_mp3(5) + b"TAG" + b"\x00" * 125
    info = probe_mp3(p)
    assert info["n_frames"] == 5


def test_mp3_truncated_final_frame_counts_whole_frames_only():
    p = encode_mp3(5)
    info = probe_mp3(p[:-10])
    assert info["n_frames"] == 4


def test_mp3_truncation_sweep_never_raises():
    p = encode_mp3(3, vbr_header="xing", id3v2_bytes=40)
    for cut in range(len(p)):
        probe_mp3(p[:cut])


def test_mp3_garbage_rejected():
    assert probe_mp3(b"\x00" * 100) is None
    assert probe_mp3(b"") is None
    assert probe_mp3(None) is None
    assert not is_mp3(b"\xff\xd8\xff\xe0")  # JPEG SOI is not MP3 sync


def test_frame_params_rejects_free_and_bad_indices():
    # bitrate index 0 (free format) and 15 (bad) both refuse
    good = encode_mp3(1)[:4]
    free = bytes([good[0], good[1], good[2] & 0x0F, good[3]])
    bad = bytes([good[0], good[1], (good[2] & 0x0F) | 0xF0, good[3]])
    assert _frame_params(free) is None
    assert _frame_params(bad) is None


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 60),
    kbps=st.sampled_from([32, 64, 96, 128, 192, 320]),
    rate=st.sampled_from([32000, 44100, 48000]),
    ch=st.sampled_from([1, 2]),
    vbr=st.sampled_from([None, "xing", "vbri"]),
    id3=st.integers(0, 200),
)
def test_mp3_probe_recovers_closed_form(n, kbps, rate, ch, vbr, id3):
    info = probe_mp3(
        encode_mp3(n, kbps, rate, channels=ch, vbr_header=vbr, id3v2_bytes=id3)
    )
    assert info["n_frames"] == n
    assert info["sample_rate"] == rate
    assert info["channels"] == ch
    assert info["duration_ms"] == n * 1152 * 1000 // rate


@settings(max_examples=60, deadline=None)
@given(
    total=st.integers(0, (1 << 36) - 1),
    rate=st.integers(1, (1 << 20) - 1),
    ch=st.integers(1, 8),
    bps=st.integers(4, 32),
)
def test_flac_probe_recovers_closed_form(total, rate, ch, bps):
    info = probe_flac(encode_flac(total, rate, channels=ch, bits_per_sample=bps))
    assert info["total_samples"] == total
    assert info["sample_rate"] == rate
    assert info["channels"] == ch
    assert info["bits_per_sample"] == bps
    assert info["duration_ms"] == (total * 1000 // rate if total else None)


# ------------------------------------------------------------ Ogg / AIFF


def test_ogg_vorbis_roundtrip():
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_ogg,
        is_ogg,
        probe_ogg,
    )

    p = encode_ogg(441000, 44100, channels=2)
    assert is_ogg(p)
    info = probe_ogg(p)
    assert info == {
        "duration_ms": 10000,
        "sample_rate": 44100,
        "channels": 2,
        "codec": "vorbis",
    }


def test_ogg_opus_preskip_and_48k_clock():
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_ogg,
        probe_ogg,
    )

    # input rate 16000 is metadata only: Opus granules tick at 48 kHz
    info = probe_ogg(
        encode_ogg(96000, 16000, codec="opus", preskip=312)
    )
    assert info["codec"] == "opus"
    assert info["sample_rate"] == 48000
    assert info["duration_ms"] == 2000


def test_ogg_truncation_sweep_never_raises():
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_ogg,
        probe_ogg,
    )

    p = encode_ogg(48000, 48000)
    for cut in range(len(p)):
        probe_ogg(p[:cut])


def test_ogg_unknown_codec_rejected():
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        _ogg_page,
        probe_ogg,
    )

    assert probe_ogg(_ogg_page(0, b"\x7fFLAC rest", 0, 2)) is None


def test_aiff_roundtrip():
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_aiff,
        is_aiff,
        probe_aiff,
    )

    p = encode_aiff(44100, 22050, channels=2, bits_per_sample=24)
    assert is_aiff(p)
    info = probe_aiff(p)
    assert info["duration_ms"] == 2000
    assert info["sample_rate"] == 22050
    assert info["channels"] == 2
    assert info["bits_per_sample"] == 24
    assert info["total_samples"] == 44100


def test_aiff_truncation_sweep_never_raises():
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_aiff,
        probe_aiff,
    )

    p = encode_aiff(8000, 8000)
    for cut in range(len(p)):
        probe_aiff(p[:cut])


@settings(max_examples=40, deadline=None)
@given(
    total=st.integers(0, 1 << 40),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000, 96000]),
    ch=st.integers(1, 8),
    codec=st.sampled_from(["vorbis", "opus"]),
    pages=st.integers(1, 6),
)
def test_ogg_probe_recovers_closed_form(total, rate, ch, codec, pages):
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_ogg,
        probe_ogg,
    )

    info = probe_ogg(
        encode_ogg(total, rate, channels=ch, codec=codec, n_audio_pages=pages)
    )
    clock = 48000 if codec == "opus" else rate
    assert info["duration_ms"] == total * 1000 // clock
    assert info["channels"] == ch


@settings(max_examples=40, deadline=None)
@given(
    total=st.integers(0, 1 << 32 - 1),
    rate=st.sampled_from([8000, 11025, 22050, 44100, 48000]),
)
def test_aiff_probe_recovers_closed_form(total, rate):
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_aiff,
        probe_aiff,
    )

    info = probe_aiff(encode_aiff(total, rate))
    assert info["total_samples"] == total
    assert info["duration_ms"] == total * 1000 // rate


# -------------------------------------------------- probe_assets wiring


@pytest.fixture(scope="module")
def asset_df(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("asset_id", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_aiff,
        encode_ogg,
    )

    rows = [
        ("mp3_cbr", encode_mp3(20), None, None, None),
        ("mp3_xing", encode_mp3(100, vbr_header="xing"), None, None, None),
        ("flac", encode_flac(32000, 16000), None, None, None),
        ("ogg", encode_ogg(88200, 44100), None, None, None),
        ("opus", encode_ogg(48000, 48000, codec="opus"), None, None, None),
        ("aiff", encode_aiff(11025, 22050), None, None, None),
        ("junk", b"\x00" * 50, None, None, None),
    ]
    return spark.createDataFrame(rows, schema)


def test_probe_assets_fills_audio_durations(asset_df):
    from neo4j_to_clickhouse_spark.operators.multimodal import probe_assets

    got = {
        r.asset_id: r.duration_ms for r in probe_assets(asset_df).collect()
    }
    assert got["mp3_cbr"] == 20 * 1152 * 1000 // 44100
    assert got["mp3_xing"] == 100 * 1152 * 1000 // 44100
    assert got["flac"] == 2000
    assert got["ogg"] == 2000
    assert got["opus"] == 1000
    assert got["aiff"] == 500
    assert got["junk"] is None
