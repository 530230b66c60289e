"""Benchmark: SSIMULACRA2 1080p frame pairs per second per chip.

Measures the steady-state device pipeline — host YUV 4:2:0 frames in
(including host->device transfer), colorspace conversion, the full 6-scale
SSIMULACRA2 sub-score computation, and host-side f64 final scoring — against
the reference's headline number (669 fps / 277.47 Mpx/s on an RTX 4070 at
720x576, BASELINE.md).  vs_baseline compares Mpx/s so the resolutions are
comparable.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MPXS = 277.47


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from turbo_metrics_tpu.models.ssimulacra2_score import postprocess_score
    from turbo_metrics_tpu.models.ssimulacra2 import ssimulacra2_subscores
    from turbo_metrics_tpu.ops import colorspace
    from turbo_metrics_tpu.ops.downscale import scale_dims

    h, w = 1080, 1920
    batch = int(os.environ.get("TM_BENCH_BATCH", "4"))
    num_scales = len(scale_dims(h, w))

    def step(y_ref, uv_ref, y_dis, uv_dis):
        lin_ref = colorspace.yuv420_to_linear_rgb(y_ref, uv_ref)
        lin_dis = colorspace.yuv420_to_linear_rgb(y_dis, uv_dis)
        return ssimulacra2_subscores(lin_ref, lin_dis, num_scales=num_scales)

    fn = jax.jit(step)

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0)).astype(np.uint8)
    y_ref = np.stack([np.roll(base, i, axis=1) for i in range(batch)])
    uv_ref = rng.integers(100, 156, (batch, h // 2, w // 2, 2), dtype=np.uint8)
    y_dis = np.clip(
        y_ref.astype(np.int16) + rng.integers(-6, 7, y_ref.shape), 0, 255
    ).astype(np.uint8)
    uv_dis = uv_ref

    # Warmup / compile.
    out = fn(y_ref, uv_ref, y_dis, uv_dis)
    jax.block_until_ready(out)
    _ = postprocess_score(np.asarray(out, dtype=np.float64))

    # Steady state: repeats batches, including H2D of fresh host arrays and
    # host-side final scoring, mimicking the real drive loop.
    iters = int(os.environ.get("TM_BENCH_ITERS", "10"))
    start = time.perf_counter()
    prev = None
    for i in range(iters):
        yr = np.roll(y_ref, i + 1, axis=2)  # fresh host memory each iter
        yd = np.roll(y_dis, i + 1, axis=2)
        out = fn(yr, uv_ref, yd, uv_dis)
        if prev is not None:
            _ = postprocess_score(np.asarray(prev, dtype=np.float64))
        prev = out
    _ = postprocess_score(np.asarray(prev, dtype=np.float64))
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    frames = batch * iters
    fps = frames / elapsed
    mpxs = fps * w * h / 1e6
    print(
        json.dumps(
            {
                "metric": "ssimulacra2_1080p_fps_per_chip",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(mpxs / BASELINE_MPXS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
