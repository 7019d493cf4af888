"""Codec-layer microbenchmark: decode throughput per format and the
header-probe speedup that justifies probe_assets' O(header) claim.

Prints one JSON line:
  {"metric": "codec_bench", "decode": {fmt: {"mb_s":, "ms":}},
   "probe_speedup": {fmt: x}, "video": {...}}

Usage: python tools/bench_codecs.py  [--size N]  (default 512x512)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from neo4j_to_clickhouse_spark.operators import heif  # noqa: E402
from neo4j_to_clickhouse_spark.operators import multimodal as M  # noqa: E402
from neo4j_to_clickhouse_spark.operators import tiff as T  # noqa: E402
from neo4j_to_clickhouse_spark.operators.gif import (  # noqa: E402
    encode_gif_animation,
)
from neo4j_to_clickhouse_spark.operators.png import (  # noqa: E402
    encode_apng,
    encode_png,
)
from neo4j_to_clickhouse_spark.operators.vp8l import (  # noqa: E402
    encode_webp,
    encode_webp_animation,
)


def _timed(fn, *args, repeat: int = 3):
    best = float("inf")
    out = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    size = 512
    if "--size" in sys.argv:
        size = int(sys.argv[sys.argv.index("--size") + 1])
    rng = np.random.default_rng(7)
    # photographic-ish content: smooth gradients + texture, <=256 colors
    # where palettes demand it
    base = rng.integers(0, 32, (size // 8, size // 8, 3), dtype=np.uint8)
    rgb = np.kron(base, np.ones((8, 8, 1), np.uint8)) * 8
    gif_rgb = (rgb // 64) * 64  # <=64 distinct colors (GIF palette)

    payloads: dict[str, bytes] = {
        "bmp": M.encode_bmp(rgb),
        "ppm": M.encode_ppm(rgb),
        "png": encode_png(rgb),
        "tiff_lzw": T.encode_tiff(rgb, "lzw", 2),
        "tiff_deflate": T.encode_tiff(rgb, "deflate", 2),
        "webp_vp8l": encode_webp(rgb),
        "gif": encode_gif_animation([{"pixels": gif_rgb}]),
    }
    if heif.available():
        payloads["avif"] = heif.encode_heif(rgb, codec="av1", lossless=False, quality=60)
        payloads["heic"] = heif.encode_heif(rgb, codec="hevc", lossless=False, quality=60)

    raw_mb = rgb.nbytes / 1e6
    decode: dict[str, dict] = {}
    probe_speedup: dict[str, float] = {}
    for fmt, data in payloads.items():
        dt, decoded = _timed(M.decode_image, data)
        assert decoded is not None, fmt
        pt, dims = _timed(M.probe_image_dims, data, repeat=20)
        assert dims == (decoded[1].shape[1], decoded[1].shape[0]), fmt
        decode[fmt] = {
            "ms": round(dt * 1000, 2),
            "mb_s": round(raw_mb / dt, 2),
            "payload_kb": round(len(data) / 1024, 1),
        }
        probe_speedup[fmt] = round(dt / max(pt, 1e-9), 1)
        print(
            f"# {fmt:13s} decode {dt*1000:8.2f} ms ({raw_mb/dt:7.2f} MB/s)"
            f"  probe {pt*1e6:7.1f} us  speedup {dt/max(pt,1e-9):9.1f}x",
            file=sys.stderr,
        )

    # animation / video sampling throughput (frames/s of composed output)
    video: dict[str, float] = {}
    anim_rgb = gif_rgb[:128, :128]
    gif_anim = encode_gif_animation(
        [{"pixels": anim_rgb, "delay_cs": 4} for _ in range(10)]
    )
    webp_anim = encode_webp_animation(
        [{"pixels": anim_rgb, "duration_ms": 40} for _ in range(10)],
        canvas=(128, 128),
    )
    apng_anim = encode_apng(
        [{"pixels": anim_rgb, "delay_ms": 40} for _ in range(10)],
        canvas=(128, 128),
    )
    from neo4j_to_clickhouse_spark.operators.gif import decode_gif_frames
    from neo4j_to_clickhouse_spark.operators.png import decode_apng_frames
    from neo4j_to_clickhouse_spark.operators.vp8l import decode_webp_frames

    for name, fn, data in (
        ("gif_frames", decode_gif_frames, gif_anim),
        ("webp_frames", decode_webp_frames, webp_anim),
        ("apng_frames", decode_apng_frames, apng_anim),
    ):
        dt, (_, frames) = _timed(fn, data)
        video[name] = round(len(frames) / dt, 1)
        print(
            f"# {name:13s} {len(frames)/dt:8.1f} frames/s (128x128)",
            file=sys.stderr,
        )

    # audio header probes (r11): duration from headers alone — the
    # probe cost must stay microseconds regardless of payload length
    from neo4j_to_clickhouse_spark.operators.audio_probe import (
        encode_aiff,
        encode_flac,
        encode_mp3,
        encode_ogg,
        probe_aiff,
        probe_flac,
        probe_mp3,
        probe_ogg,
    )

    audio_probe_us: dict[str, float] = {}
    for name, enc, probe in (
        # ~60 s of 128 kbps CBR: ~2300 frames — the WALK path, the
        # worst case (Xing/VBRI are one O(1) read)
        ("mp3_walk_60s", lambda: encode_mp3(2300), probe_mp3),
        ("mp3_xing", lambda: encode_mp3(2300, vbr_header="xing"), probe_mp3),
        ("flac", lambda: encode_flac(16000 * 60, 16000, audio_bytes=200000), probe_flac),
        ("ogg_vorbis", lambda: encode_ogg(48000 * 60, 48000, n_audio_pages=50), probe_ogg),
        ("aiff", lambda: encode_aiff(22050 * 60, 22050), probe_aiff),
    ):
        payload = enc()
        pt, info = _timed(probe, payload, repeat=20)
        assert info and info.get("duration_ms"), name
        audio_probe_us[name] = round(pt * 1e6, 1)
        print(
            f"# {name:13s} probe {pt*1e6:7.1f} us"
            f"  ({len(payload)/1024:.0f} KiB payload)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "codec_bench",
                "size": size,
                "decode": decode,
                "probe_speedup": probe_speedup,
                "video_frames_per_s": video,
                "audio_probe_us": audio_probe_us,
            }
        )
    )


if __name__ == "__main__":
    main()
