"""Benchmark: PPG front-end latency per frame on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (RTX 4070) must sustain 20 fps playback (50 ms/frame
budget, try_euroc.cpp:144) and the rebuild target is 4x playback = 12.5 ms of
front-end+BA per frame (BASELINE.md). vs_baseline = 12.5 / measured_ms, so
>= 1.0 means the 4x-speed target is met.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
    from ppg_slam_tpu.frontend import PPGExtractor

    cam = CameraModel(
        kind=CAM_PINHOLE, fx=458.654, fy=457.296, cx=367.215, cy=248.375,
        dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
        width=752, height=480,
    )
    ex = PPGExtractor(cam)

    rng = np.random.RandomState(0)
    frames = []
    for k in range(8):  # structured synthetic frames (lines + texture)
        img = np.full((480, 752), 120, np.uint8)
        for i in range(1, 10):
            img[i * 48 - 1, :] = 250
        for j in range(1, 15):
            img[:, j * 50 - 1] = 250
        img = np.clip(
            img.astype(np.int32) + rng.randint(-20, 20, img.shape), 0, 255
        ).astype(np.uint8)
        frames.append(img)

    ex.extract(frames[0])  # compile stage A (+B if edges found)

    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        ex.extract(frames[i % len(frames)])
    dt_ms = (time.perf_counter() - t0) / n_iters * 1e3

    print(json.dumps({
        "metric": "frontend_ms_per_frame",
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(12.5 / dt_ms, 3),
    }))


if __name__ == "__main__":
    main()
