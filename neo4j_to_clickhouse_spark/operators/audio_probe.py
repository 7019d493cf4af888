"""Header-only MP3 / FLAC probes for :func:`probe_assets`.

Same O(header bytes) posture as the WAV/AVI/ISOBMFF walks: duration,
sample rate and channel count come from container/frame headers alone —
no entropy decode, no sample synthesis — so a billion-asset metadata
backfill never pays decode cost (the reference ships raw media pointers
to ClickHouse and never probes; `SURVEY.md §2` multimodal extension).

Formats are parsed from the public specs:

- MP3: ISO/IEC 11172-3 + 13818-3 frame headers (sync, version, layer,
  bitrate/samplerate indices), the de-facto Xing/Info and VBRI VBR
  headers, ID3v2.3/2.4 skip (syncsafe sizes), ID3v1 trailer tolerance.
- FLAC: the STREAMINFO metadata block (format spec: 20-bit sample rate,
  3-bit channels-1, 5-bit bps-1, 36-bit total samples packed big-endian
  after the block-size/frame-size fields).

No external library exists in this environment (no mutagen / lame /
flac / mpg123 — re-probed 2026-08-15), so correctness is pinned by
closed-form fixtures: the encoders below build byte-exact containers
from integer parameters and the probes must recover those integers
exactly (``tests/test_audio_probe.py``; the registry folds both formats
into the ``multimodal_probe_stats`` closed-form oracle).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# MP3 (MPEG audio) frame-header tables — ISO 11172-3 / 13818-3, public
# ---------------------------------------------------------------------------

# bitrate kbps by [version-group][layer][index]; index 0 = free, 15 = bad
_BITRATES_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BITRATES_V2 = {  # MPEG2 and 2.5 share tables; layers 2 and 3 share one
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLE_RATES = {  # by version bits (b1>>3 & 3)
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),  # MPEG2.5
}


def _frame_params(hdr: bytes) -> tuple[int, int, int, int, int] | None:
    """(frame_bytes, samples_per_frame, sample_rate, channels, bitrate_kbps)
    for one 4-byte MPEG audio frame header, or None if not a valid header.
    Free-format (bitrate index 0) is rejected: its frame size is not
    derivable from the header, so a walk cannot stay header-only."""
    if len(hdr) < 4 or hdr[0] != 0xFF or (hdr[1] & 0xE0) != 0xE0:
        return None
    version = (hdr[1] >> 3) & 3  # 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
    layer_bits = (hdr[1] >> 1) & 3  # 3=LayerI 2=LayerII 1=LayerIII
    if version == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 1/2/3
    br_idx = hdr[2] >> 4
    sr_idx = (hdr[2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (hdr[2] >> 1) & 1
    channels = 1 if (hdr[3] >> 6) == 3 else 2
    rate = _SAMPLE_RATES[version][sr_idx]
    table = _BITRATES_V1 if version == 3 else _BITRATES_V2
    kbps = table[layer][br_idx]
    if layer == 1:
        spf = 384
        size = (12 * kbps * 1000 // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == 3) else 576
        size = spf // 8 * kbps * 1000 // rate + padding
    return size, spf, rate, channels, kbps


def _skip_id3v2(payload: bytes) -> int:
    """Byte offset of the first audio byte past a leading ID3v2 tag."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    flags = payload[5]
    size = 0
    for b in payload[6:10]:  # syncsafe: 7 bits per byte
        if b & 0x80:
            return 0  # malformed syncsafe — treat as no tag
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)  # footer flag


def _side_info_bytes(version: int, channels: int) -> int:
    """Layer III side-info size = offset of the Xing tag inside a frame."""
    if version == 3:  # MPEG1
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def is_mp3(payload: bytes | None) -> bool:
    """Cheap dispatch test: leading ID3v2 tag, or a valid MPEG audio
    frame header at byte 0. Checked AFTER the exact-magic formats in
    ``probe_assets`` because frame sync is only a 12-bit pattern."""
    if not payload or len(payload) < 4:
        return False
    if payload[:3] == b"ID3":
        return True
    return _frame_params(payload[:4]) is not None


def probe_mp3(payload: bytes | None) -> dict | None:
    """Header-only MP3 probe: ``{duration_ms, sample_rate, channels,
    n_frames, method}`` with method one of ``xing`` / ``vbri`` /
    ``walk``.

    Precedence mirrors every mainstream reader: a Xing/Info or VBRI
    header in the first frame carries the authoritative VBR frame count
    (one O(1) read); otherwise the frame chain is walked — each step
    reads only the 4-byte header and jumps the derived frame size, so
    the walk is O(n_frames) header reads, never sample decode.
    duration_ms = total_samples * 1000 // rate (first frame's rate; a
    mid-stream rate switch is out of spec for a single stream).
    """
    if not payload:
        return None
    pos = _skip_id3v2(payload)
    first = _frame_params(payload[pos : pos + 4])
    if first is None:
        return None
    _, spf, rate, channels, _ = first
    version = (payload[pos + 1] >> 3) & 3

    # Xing/Info at the side-info offset of the first frame
    xing_at = pos + 4 + _side_info_bytes(version, channels)
    if (
        payload[xing_at : xing_at + 4] in (b"Xing", b"Info")
        and len(payload) >= xing_at + 12
    ):
        (flags,) = struct.unpack_from(">I", payload, xing_at + 4)
        if flags & 1:
            (frames,) = struct.unpack_from(">I", payload, xing_at + 8)
            return {
                "duration_ms": frames * spf * 1000 // rate,
                "sample_rate": rate,
                "channels": channels,
                "n_frames": frames,
                "method": "xing",
            }
        # Xing/Info tag without a FRAMES field: the tag frame is
        # metadata, not audio — skip it before the walk (mainstream
        # readers never count the header frame).
        pos += first[0]
    # VBRI sits at a fixed 32 bytes past the header (Fraunhofer spec)
    vbri_at = pos + 4 + 32
    if payload[vbri_at : vbri_at + 4] == b"VBRI" and len(payload) >= vbri_at + 18:
        (frames,) = struct.unpack_from(">I", payload, vbri_at + 14)
        return {
            "duration_ms": frames * spf * 1000 // rate,
            "sample_rate": rate,
            "channels": channels,
            "n_frames": frames,
            "method": "vbri",
        }

    # CBR/headerless walk
    n_frames = 0
    total_samples = 0
    while pos + 4 <= len(payload):
        p = _frame_params(payload[pos : pos + 4])
        if p is None:
            break
        size, spf_i, _, _, _ = p
        if size <= 4 or pos + size > len(payload):
            break  # truncated final frame: count only whole frames
        n_frames += 1
        total_samples += spf_i
        pos += size
    # tolerate an ID3v1 trailer / other trailing bytes silently
    if n_frames == 0:
        return None
    return {
        "duration_ms": total_samples * 1000 // rate,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "method": "walk",
    }


# ---------------------------------------------------------------------------
# FLAC STREAMINFO — format spec, public
# ---------------------------------------------------------------------------


def is_flac(payload: bytes | None) -> bool:
    return bool(payload) and payload[:4] == b"fLaC"


def probe_flac(payload: bytes | None) -> dict | None:
    """FLAC STREAMINFO probe: ``{duration_ms, sample_rate, channels,
    bits_per_sample, total_samples}``. Walks the metadata block chain
    (1-byte is-last/type + 3-byte big-endian length) to the type-0
    STREAMINFO block — spec requires it first, but tolerating reordered
    writers is free. total_samples = 0 means "unknown" per spec →
    duration None."""
    if not is_flac(payload):
        return None
    pos = 4
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        if (hdr & 0x7F) == 0:  # STREAMINFO
            if len(body) < 18:
                return None
            # bits 80..143 of the block: rate(20) ch-1(3) bps-1(5)
            # total(36), big-endian packed
            u64 = int.from_bytes(body[10:18], "big")
            rate = u64 >> 44
            channels = ((u64 >> 41) & 0x7) + 1
            bps = ((u64 >> 36) & 0x1F) + 1
            total = u64 & ((1 << 36) - 1)
            if rate == 0:
                return None  # invalid per spec
            return {
                "duration_ms": total * 1000 // rate if total else None,
                "sample_rate": rate,
                "channels": channels,
                "bits_per_sample": bps,
                "total_samples": total,
            }
        if hdr & 0x80:  # is-last and not STREAMINFO
            return None
        pos += 4 + length
    return None


# ---------------------------------------------------------------------------
# Fixture encoders (closed-form oracle side)
# ---------------------------------------------------------------------------


def encode_flac(
    total_samples: int,
    sample_rate: int = 16000,
    channels: int = 1,
    bits_per_sample: int = 16,
    audio_bytes: int = 64,
) -> bytes:
    """fLaC magic + a spec-exact STREAMINFO block (is-last set) + dummy
    frame bytes. The probe must return the exact integers passed here."""
    u64 = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    body = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00\x00\x00" * 2  # min/max framesize (unknown)
        + u64.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of unencoded audio (unset)
    )
    return (
        b"fLaC"
        + bytes([0x80]) + struct.pack(">I", len(body))[1:]
        + body
        + b"\x00" * audio_bytes
    )


# ---------------------------------------------------------------------------
# Ogg (RFC 3533) container walk — Vorbis and Opus duration
# ---------------------------------------------------------------------------


def is_ogg(payload: bytes | None) -> bool:
    return bool(payload) and payload[:4] == b"OggS"


def _ogg_pages(payload: bytes):
    """Yield (granule_position, header_type, body) per page. The walk
    jumps exact page sizes from the lacing tables (no decode, no sync
    scan — a forward walk can never false-sync on codec bytes)."""
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS" or payload[pos + 4] != 0:
            return
        htype = payload[pos + 5]
        (granule,) = struct.unpack_from("<q", payload, pos + 6)
        nsegs = payload[pos + 26]
        lacing = payload[pos + 27 : pos + 27 + nsegs]
        if len(lacing) < nsegs:
            return
        body_at = pos + 27 + nsegs
        size = sum(lacing)
        if body_at + size > len(payload):
            return
        yield granule, htype, payload[body_at : body_at + size]
        pos = body_at + size


def probe_ogg(payload: bytes | None) -> dict | None:
    """Ogg Vorbis / Opus probe: ``{duration_ms, sample_rate, channels,
    codec}``. Rate/channels come from the first page's identification
    header (``\\x01vorbis`` / ``OpusHead``); duration from the LAST
    page's granule position — Vorbis granules count output samples at
    the stream rate, Opus granules are always 48 kHz minus the encoder
    pre-skip (RFC 7845 §4)."""
    if not is_ogg(payload):
        return None
    codec = rate = channels = None
    preskip = 0
    last_granule = None
    for granule, _htype, body in _ogg_pages(payload):
        if codec is None:
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                (rate,) = struct.unpack_from("<I", body, 12)
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                (preskip,) = struct.unpack_from("<H", body, 10)
                rate = 48000  # granule clock, regardless of input rate
            else:
                return None
        if granule >= 0:  # -1 marks a page with no finished packet
            last_granule = granule
    if codec is None or not rate or last_granule is None:
        return None
    samples = max(0, last_granule - (preskip if codec == "opus" else 0))
    return {
        "duration_ms": samples * 1000 // rate,
        "sample_rate": rate,
        "channels": channels,
        "codec": codec,
    }


# ---------------------------------------------------------------------------
# AIFF — COMM chunk (80-bit extended-precision sample rate)
# ---------------------------------------------------------------------------


def is_aiff(payload: bytes | None) -> bool:
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[:4] == b"FORM"
        and payload[8:12] in (b"AIFF", b"AIFC")
    )


def _float80(b: bytes) -> int | None:
    """IEEE 754 extended (sign 1 / exp 15 / mantissa 64) -> int rate."""
    if len(b) < 10:
        return None
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    exp = (se & 0x7FFF) - 16383
    if se & 0x8000 or mant == 0 or not 0 <= exp <= 62:
        return None
    return mant >> (63 - exp)


def probe_aiff(payload: bytes | None) -> dict | None:
    """AIFF/AIFC COMM-chunk probe: ``{duration_ms, sample_rate,
    channels, bits_per_sample, total_samples}`` — chunk walk only."""
    if not is_aiff(payload):
        return None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from(">I", payload, pos + 4)
        if tag == b"COMM" and size >= 18 and pos + 8 + 18 <= len(payload):
            channels, frames = struct.unpack_from(">HI", payload, pos + 8)
            (bps,) = struct.unpack_from(">H", payload, pos + 14)
            rate = _float80(payload[pos + 16 : pos + 26])
            if not rate:
                return None
            return {
                "duration_ms": frames * 1000 // rate,
                "sample_rate": rate,
                "channels": channels,
                "bits_per_sample": bps,
                "total_samples": frames,
            }
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return None


def _mp3_header(
    bitrate_kbps: int, sample_rate: int, padding: int, channels: int
) -> bytes:
    br_idx = _BITRATES_V1[3].index(bitrate_kbps)
    sr_idx = _SAMPLE_RATES[3].index(sample_rate)
    b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG1 Layer III, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = (3 if channels == 1 else 0) << 6
    return bytes([0xFF, b1, b2, b3])


def _ogg_page(
    granule: int, body: bytes, seq: int, htype: int = 0
) -> bytes:
    lacing = bytes([255] * (len(body) // 255) + [len(body) % 255])
    return (
        b"OggS\x00"
        + bytes([htype])
        + struct.pack("<q", granule)
        + struct.pack("<II", 1, seq)
        + b"\x00" * 4  # CRC unset — the probe never checks it
        + bytes([len(lacing)])
        + lacing
        + body
    )


def encode_ogg(
    total_samples: int,
    sample_rate: int = 44100,
    channels: int = 1,
    codec: str = "vorbis",
    n_audio_pages: int = 3,
    preskip: int = 312,
) -> bytes:
    """Ogg fixture: BOS identification page + dummy audio pages whose
    final page carries ``total_samples`` (+ preskip for Opus) as its
    granule position with EOS set. The probe must return duration =
    total_samples * 1000 // rate (rate = 48000 for Opus)."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<I", 0)
            + bytes([channels])
            + struct.pack("<I", sample_rate)
            + b"\x00" * 13
        )
        final = total_samples
    else:
        ident = (
            b"OpusHead\x01"
            + bytes([channels])
            + struct.pack("<H", preskip)
            + struct.pack("<I", sample_rate)
            + b"\x00\x00\x00"
        )
        final = total_samples + preskip
    out = _ogg_page(0, ident, 0, htype=2)  # BOS
    step = final // max(n_audio_pages, 1)
    for i in range(1, n_audio_pages + 1):
        granule = final if i == n_audio_pages else step * i
        htype = 4 if i == n_audio_pages else 0  # EOS on the last
        out += _ogg_page(granule, b"\x00" * 40, i, htype)
    return out


def encode_aiff(
    total_samples: int,
    sample_rate: int = 22050,
    channels: int = 1,
    bits_per_sample: int = 16,
) -> bytes:
    """AIFF fixture: FORM/AIFF + spec-exact COMM (80-bit extended rate)
    + a stub SSND chunk."""
    exp = sample_rate.bit_length() - 1
    mant = sample_rate << (63 - exp)
    f80 = struct.pack(">HQ", 16383 + exp, mant)
    comm = (
        b"COMM" + struct.pack(">I", 18)
        + struct.pack(">HIH", channels, total_samples, bits_per_sample)
        + f80
    )
    ssnd = b"SSND" + struct.pack(">I", 8) + b"\x00" * 8
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def encode_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 1,
    vbr_header: str | None = None,
    id3v2_bytes: int = 0,
) -> bytes:
    """MPEG1 Layer III fixture: ``n_frames`` unpadded CBR frames with
    zero-filled payloads (0x00 can never alias frame sync). With
    ``vbr_header`` 'xing' or 'vbri', a VBR-header frame carrying
    ``n_frames`` as its frame count is PREPENDED (industry convention:
    the count excludes the header frame). ``id3v2_bytes`` > 0 prepends
    an ID3v2.4 tag of that body size."""
    hdr = _mp3_header(bitrate_kbps, sample_rate, 0, channels)
    size = 1152 // 8 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + b"\x00" * (size - 4)
    out = bytearray()
    if id3v2_bytes:
        ss = bytes(
            (id3v2_bytes >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += b"ID3\x04\x00\x00" + ss + b"\x00" * id3v2_bytes
    if vbr_header == "xing":
        vf = bytearray(frame)
        at = 4 + _side_info_bytes(3, channels)
        vf[at : at + 12] = b"Xing" + struct.pack(">II", 1, n_frames)
        out += vf
    elif vbr_header == "xing_noframes":
        # Xing tag with FRAMES flag unset — readers must skip the tag
        # frame and fall back to the walk without counting it
        vf = bytearray(frame)
        at = 4 + _side_info_bytes(3, channels)
        vf[at : at + 8] = b"Xing" + struct.pack(">I", 0)
        out += vf
    elif vbr_header == "vbri":
        vf = bytearray(frame)
        at = 4 + 32
        vf[at : at + 4] = b"VBRI"
        vf[at + 14 : at + 18] = struct.pack(">I", n_frames)
        out += vf
    out += frame * n_frames
    return bytes(out)
