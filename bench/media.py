"""Media-decode throughput through the distributed kernel (pure-numpy
codecs, no PIL): mixed JPEG/PNG/BMP/GIF/WebP/WAV/FLAC payloads -> real pixel/signal
features via ``extract_media_features(deterministic_fake=False)``.

Standalone (not part of bench.py's driver line — decode is CPU-bound
Python and would double headline wall time). Prints one JSON line:
payload mix, total MB, payloads/sec and MB/sec at the given width.

Run: python bench/media.py [n_per_kind] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_payloads(n_per_kind: int) -> list[tuple[int, str, bytearray]]:
    import numpy as np

    from spanluke_spark.multimodal.codecs import encode_bmp, encode_png, encode_wav
    from spanluke_spark.multimodal.gif import encode_gif
    from spanluke_spark.multimodal.jpeg import encode_jpeg
    from spanluke_spark.multimodal.flac import encode_flac
    from spanluke_spark.multimodal.webp import encode_webp_lossless

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:240, 0:320]
    base = np.stack([xx % 256, yy % 256, (xx + yy) % 256], 2)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    rows: list[tuple[int, str, bytearray]] = []
    mid = 0
    t = np.linspace(0, 1.0, 16000, endpoint=False)
    for i in range(n_per_kind):
        img = np.clip(base + rng.integers(0, 20, base.shape), 0, 255).astype(np.uint8)
        gif_img = pal[rng.integers(0, 64, (120, 160))]
        rows.append((mid, "image", bytearray(encode_jpeg(img, quality=80, subsample=True))))
        rows.append((mid + 1, "image", bytearray(encode_png(img, filter_type=2))))
        rows.append((mid + 2, "image", bytearray(encode_bmp(img))))
        rows.append((mid + 3, "image", bytearray(encode_gif(gif_img))))
        rows.append(
            (mid + 4, "audio", bytearray(encode_wav(16000, 0.4 * np.sin((440 + i) * t))))
        )
        webp_img = np.clip(
            base[:120, :160] + rng.integers(0, 20, (120, 160, 3)), 0, 255
        ).astype(np.uint8)
        rows.append((mid + 5, "image", bytearray(encode_webp_lossless(webp_img))))
        clip = 0.3 * np.sin((330 + i) * t) + 0.05 * np.sin((991 + i) * t)
        rows.append(
            (mid + 6, "audio", bytearray(encode_flac(16000, clip, block_size=4096)))
        )
        mid += 7
    return rows


def main() -> None:
    n_per_kind = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from spanluke_spark.multimodal.media import extract_media_features
    from spanluke_spark.session import get_spark

    spark = get_spark(
        app_name="media-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    rows = build_payloads(n_per_kind)
    total_mb = sum(len(p) for _, _, p in rows) / 1e6
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    ).repartition(cpus * 2)
    df.count()  # materialize input + warm workers before timing

    def job() -> int:
        return (
            extract_media_features(df, deterministic_fake=False, on_error="null")
            .filter("features is not null")
            .count()
        )

    job()  # warm codegen/Arrow
    times = []
    decoded = 0
    for _ in range(3):
        t0 = time.perf_counter()
        decoded = job()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "metric": "media_decode_throughput",
                "payloads": len(rows),
                "decoded": decoded,
                "mix": "JPEG-4:2:0/PNG/BMP 320x240 + GIF/WebP-lossless 160x120 + 1s WAV + 1s FLAC",
                "total_mb": round(total_mb, 1),
                "cpus": cpus,
                "sec": round(best, 2),
                "runs_sec": [round(t, 2) for t in times],
                "payloads_per_sec": round(len(rows) / best, 1),
                "mb_per_sec": round(total_mb / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
