"""Pure-Python MJPEG-in-AVI container codec (Microsoft RIFF/AVI spec).

Closes the video codec hole for ONE real format: Motion-JPEG inside an
AVI container is just RIFF chunk framing around per-frame baseline JPEG
payloads — no inter-frame prediction, no external codec. Each frame
decodes through the sibling :mod:`.jpeg` module, so
:func:`.multimodal.sample_frames` can do REAL frame extraction for
MJPEG/AVI assets while H.264/VP9/AV1 remain the documented
external-dependency boundary (ffmpeg).

Layout read: ``RIFF('AVI ') > LIST('hdrl') > 'avih'`` for the
per-frame period, then ``LIST('movi')`` for ``##dc``/``##db`` frame
chunks. The parser is lenient about optional lists (``idx1``, ``strl``
details) — it needs only the frame period and the frame chunks.
"""

from __future__ import annotations

import struct

_AVIH_MIN = 32  # we need dwMicroSecPerFrame (offset 0) .. dwTotalFrames (16)


def is_avi(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def parse_avi_mjpeg(payload: bytes) -> tuple[int, list[bytes]]:
    """Parse an MJPEG AVI into ``(frame_period_ms, [jpeg_bytes, ...])``.

    Raises ``ValueError`` for non-AVI input, a missing ``avih`` header,
    or frame chunks that are not JPEG (this parser is MJPEG-only; other
    FourCCs are the ffmpeg boundary).
    """
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    period_us = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal period_us
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", payload, pos)
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                # list type occupies the first 4 body bytes
                walk(body_start + 4, body_end)
            elif cid == b"avih":
                if size < _AVIH_MIN:
                    raise ValueError("truncated avih header")
                period_us = struct.unpack_from("<I", payload, body_start)[0]
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frame = payload[body_start:body_end]
                if frame[:2] != b"\xff\xd8":
                    raise ValueError(
                        "non-JPEG frame chunk: only MJPEG AVIs are "
                        "supported without ffmpeg"
                    )
                frames.append(frame)
            pos = body_end + (size & 1)  # chunks are word-aligned

    walk(12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0]))
    if period_us is None:
        raise ValueError("missing avih header")
    return (max(period_us // 1000, 1), frames)


def probe_avi(payload: bytes) -> tuple[int, int] | None:
    """(n_frames, duration_ms) if the payload is a parseable MJPEG AVI,
    else None — the :func:`.multimodal.probe_assets` contract."""
    try:
        period_ms, frames = parse_avi_mjpeg(payload)
    except (ValueError, struct.error, IndexError):
        return None
    return (len(frames), period_ms * len(frames))


def encode_avi_mjpeg(frames: list[bytes], fps: int = 10) -> bytes:
    """Wrap baseline-JPEG frames in a minimal MJPEG AVI (fixture helper;
    pair with :func:`.jpeg.encode_jpeg_flat` for analytically-known
    frame content)."""
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0x10,        # maxbytes, padding, flags (AVIF_HASINDEX off)
        len(frames), 0, 1, 0x100000,  # total frames, initial, streams, bufsize
        0, 0, 0, 0, 0, 0,  # width/height/reserved (prober reads the JPEG)
    )
    movi = b"".join(chunk(b"00dc", f) for f in frames)
    body = lst(b"hdrl", chunk(b"avih", avih)) + lst(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
