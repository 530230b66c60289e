"""Benchmark: SSIMULACRA2 1080p frame pairs per second per chip.

Measures the steady-state device pipeline — 8-bit YUV 4:2:0 frames in,
BT.709 -> linear RGB conversion, the full 6-scale SSIMULACRA2 sub-score
computation (fused Pallas path), and host-side f64 final scoring — against
the reference's headline number (669 fps / 277.47 Mpx/s on an RTX 4070 at
720x576, BASELINE.md).  vs_baseline compares Mpx/s so the resolutions are
comparable.

Method notes:
  * Batches are pre-staged on device and the loop pipelines: batch N+1 is
    enqueued before batch N's (tiny) sub-score fetch, like the drive loop.
  * The dev-environment TPU is reached through a network tunnel whose
    host<->device link (~0.4 GB/s H2D, one-off multi-second first-fetch
    penalty) is not representative of a production PCIe host; the primary
    metric is therefore the device pipeline rate.  The H2D-inclusive rate is
    printed to stderr for reference.

Prints exactly one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MPXS = 277.47
H, W = 1080, 1920


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _decode_clip_frames(n: int):
    """Decode ``n`` ref/dis frame pairs from a real encoded 1080p clip
    (encoding + decoding happen once, outside the timed loop; the clips are
    the same procedural MPEG-2 TS pair bench_e2e.py uses, cached on disk)."""
    from bench_e2e import CACHE, NFRAMES, make_clip, open_source

    ref_path = os.path.join(CACHE, f"e2e_ref_{W}x{H}_{NFRAMES}.ts")
    dis_path = os.path.join(CACHE, f"e2e_dis_{W}x{H}_{NFRAMES}.ts")
    for path, seed in ((ref_path, 1), (dis_path, 2)):
        if not os.path.exists(path):
            t0 = time.perf_counter()
            make_clip(path, seed=seed)
            log(f"bench: encoded {path} in {time.perf_counter()-t0:.1f}s")
    out = []
    for path in (ref_path, dis_path):
        src = open_source(path, 1)
        ys, uvs = [], []
        while len(ys) < n:
            f = src.get_frame()
            if f is None:
                break
            ys.append(f.y)
            uvs.append(f.uv)
        src.close()
        if len(ys) < n:
            raise RuntimeError(f"clip too short: {len(ys)} < {n} frames")
        out += [np.stack(ys), np.stack(uvs)]
    log(f"bench: decoded {n} real frame pairs from {ref_path}")
    return tuple(out)


def _metric_fn(metric: str, jax, jnp, batch: int):
    """Jitted device step for a non-flagship metric (``TM_BENCH_METRIC``):
    (y_ref, uv_ref, y_dis, uv_dis) u8 -> small device array.  Used to
    measure every metric family's device rate with the same harness; the
    driver's headline stays ssimulacra2."""
    if metric in ("ssim", "msssim"):
        from turbo_metrics_tpu.ops import quality

        fn = quality.ssim if metric == "ssim" else quality.msssim

        def step(y_ref, uv_ref, y_dis, uv_dis):
            a = y_ref.astype(jnp.float32)[:, None].repeat(3, axis=1)
            b = y_dis.astype(jnp.float32)[:, None].repeat(3, axis=1)
            return fn(a, b)

        return jax.jit(step)
    if metric == "psnr":
        from turbo_metrics_tpu.ops.quality import psnr

        def step(y_ref, uv_ref, y_dis, uv_dis):
            return psnr(
                y_ref.astype(jnp.float32), y_dis.astype(jnp.float32)
            )

        return jax.jit(step)
    if metric == "xpsnr":
        from turbo_metrics_tpu.ops.xpsnr_ops import xpsnr_block_stats

        def step(y_ref, uv_ref, y_dis, uv_dis):
            prev = jnp.concatenate([y_ref[:1], y_ref[:-1]], axis=0)
            return xpsnr_block_stats(y_ref, y_dis, prev)

        return jax.jit(step)
    if metric == "vmaf":
        from turbo_metrics_tpu.ops.adm import adm_stats
        from turbo_metrics_tpu.ops.vif import vif_scale_stats
        from turbo_metrics_tpu.ops.vmaf_motion import integer_blur, motion_stats

        def step(y_ref, uv_ref, y_dis, uv_dis):
            r = y_ref.astype(jnp.float32)
            d = y_dis.astype(jnp.float32)
            blur = integer_blur(y_ref, depth=8)
            prev = jnp.concatenate([blur[:1], blur[:-1]], axis=0)
            return (
                vif_scale_stats(r, d),
                adm_stats(r, d),
                motion_stats(y_ref, prev, depth=8),
            )

        return jax.jit(step)
    raise SystemExit(f"unknown TM_BENCH_METRIC {metric!r}")


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from turbo_metrics_tpu.models.ssimulacra2 import ssimulacra2_subscores
    from turbo_metrics_tpu.models.ssimulacra2_score import postprocess_score
    from turbo_metrics_tpu.ops import colorspace
    from turbo_metrics_tpu.ops.downscale import scale_dims

    # Per-frame throughput keeps rising with batch at 1080p — the
    # drift-controlled job-114 ladder measured 902/901/938/959/979 fps at
    # b24/32/48/64/96 (both pass orders agreeing) and b128 adds ~1% more
    # (job 117); the bench-style pipelined loop at b96 measured
    # 998-1001 fps across 6 reps (docs/PERFORMANCE.md round-4).  Bench at
    # b128 for margin; staging cost stays two pre-staged sets.
    batch = int(os.environ.get("TM_BENCH_BATCH", "128"))
    iters = int(os.environ.get("TM_BENCH_ITERS", "16"))
    num_scales = len(scale_dims(H, W))

    t0 = time.perf_counter()
    _ = float(jnp.ones((8, 128)).sum())  # absorb the tunnel's first-fetch cost
    log(f"bench: first fetch {time.perf_counter() - t0:.1f}s; devices={jax.devices()}")

    on_tpu = jax.default_backend() == "tpu"

    metric = os.environ.get("TM_BENCH_METRIC", "ssimulacra2")
    if metric != "ssimulacra2":
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:H, 0:W]
        base = (128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0)).astype(np.uint8)
        y_ref = np.stack([np.roll(base, 7 * i, axis=1) for i in range(batch)])
        uv_ref = rng.integers(100, 156, (batch, H // 2, W // 2, 2), dtype=np.uint8)
        y_dis = np.clip(
            y_ref.astype(np.int16) + rng.integers(-6, 7, y_ref.shape), 0, 255
        ).astype(np.uint8)
        fn = _metric_fn(metric, jax, jnp, batch)
        sets = [
            tuple(
                jax.device_put(a)
                for a in (np.roll(y_ref, s, axis=2), uv_ref,
                          np.roll(y_dis, s, axis=2), uv_ref)
            )
            for s in (0, 3)
        ]
        jax.block_until_ready(sets)
        out = fn(*sets[0])
        jax.block_until_ready(out)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(*sets[i % 2])
            jax.block_until_ready(out)
            best = max(best, batch * iters / (time.perf_counter() - t0))
        mpxs = best * W * H / 1e6
        log(f"bench[{metric}]: device pipeline {best:.1f} fps ({mpxs:.0f} Mpx/s)")
        print(
            json.dumps(
                {
                    "metric": f"{metric}_1080p_fps_per_chip",
                    "value": round(best, 2),
                    "unit": "fps",
                    "vs_baseline": round(mpxs / BASELINE_MPXS, 3),
                }
            )
        )
        return 0

    if on_tpu:
        # Zero-copy padded chain: frames are staged host-side straight into
        # the megakernel's padded layout (the engine does the same at
        # upload time — _stack_padded_yuv), so the step has no pad or stack
        # copies at all; each level emits the next level's input in-kernel.
        # The emit buffers are allocated once and THREADED through the
        # steps (donated), so their 200+ MB never get re-zeroed.
        from turbo_metrics_tpu.models.ssimulacra2 import (
            ds_buffer_shapes_yuv,
            ssimulacra2_subscores_from_yuv,
        )

        def step(planes, ds_bufs):
            sub, ds_outs = ssimulacra2_subscores_from_yuv(
                None, None,
                H, W, num_scales=num_scales, ds_bufs=ds_bufs,
                padded_planes=planes,
            )
            return sub, ds_outs

        fn_buf = jax.jit(step, donate_argnums=(1,))
        ds0 = [
            jnp.zeros(s, jnp.float32)
            for s in ds_buffer_shapes_yuv(H, W, batch, num_scales=num_scales)
        ]

        def make_fn():
            from turbo_metrics_tpu.ops.pallas.scale_stats import (
                pad_yuv_planes,
            )

            state = {"ds": ds0}

            def run(y_ref, uv_ref, y_dis, uv_dis):
                if isinstance(y_ref, np.ndarray):
                    planes = pad_yuv_planes(
                        np.stack([y_ref, y_dis]),
                        np.stack([uv_ref, uv_dis]), H, W,
                    )
                else:  # already-staged padded planes tuple
                    planes = y_ref
                sub, state["ds"] = fn_buf(planes, state["ds"])
                return sub

            return run

        fn = make_fn()
    else:
        def step(y_ref, uv_ref, y_dis, uv_dis):
            lin_ref = colorspace.yuv420_to_linear_rgb(y_ref, uv_ref)
            lin_dis = colorspace.yuv420_to_linear_rgb(y_dis, uv_dis)
            return ssimulacra2_subscores(lin_ref, lin_dis, num_scales=num_scales)

        fn = jax.jit(step)
    stack = jax.jit(lambda xs: jnp.stack(xs))

    def stage(y_r, uv_r, y_d, uv_d):
        # Stage a batch on device in the padded plane layout (what the
        # engine uploads); returns the (yp, up, vp) device tuple.
        if on_tpu:
            from turbo_metrics_tpu.ops.pallas.scale_stats import (
                pad_yuv_planes,
            )

            planes = pad_yuv_planes(
                np.stack([y_r, y_d]), np.stack([uv_r, uv_d]), H, W
            )
            return (tuple(jax.device_put(a) for a in planes), None, None, None)
        return tuple(jax.device_put(a) for a in (y_r, uv_r, y_d, uv_d))

    if "--clip" in sys.argv[1:]:
        # Real-clip mode: decode an encoded 1080p clip once (host decode is
        # NOT timed — this isolates the same device pipeline, fed with real
        # decoded frames instead of synthetic rolled noise).
        y_all, uv_all, yd_all, uvd_all = _decode_clip_frames(2 * batch)
        halves = [slice(0, batch), slice(batch, 2 * batch)]
        raws = [
            (y_all[s], uv_all[s], yd_all[s], uvd_all[s]) for s in halves
        ]
        sets = [stage(*r) for r in raws]
        y_ref, uv_ref, y_dis = raws[0][0], raws[0][1], raws[0][2]
    else:
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:H, 0:W]
        base = (128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0)).astype(np.uint8)
        y_ref = np.stack([np.roll(base, 7 * i, axis=1) for i in range(batch)])
        uv_ref = rng.integers(100, 156, (batch, H // 2, W // 2, 2), dtype=np.uint8)
        y_dis = np.clip(
            y_ref.astype(np.int16) + rng.integers(-6, 7, y_ref.shape), 0, 255
        ).astype(np.uint8)

        # Two device-resident input sets, alternated so no result caching
        # helps.
        sets = [
            stage(
                np.roll(y_ref, shift, axis=2), uv_ref,
                np.roll(y_dis, shift, axis=2), uv_ref,
            )
            for shift in (0, 3)
        ]
    jax.block_until_ready(sets)

    t0 = time.perf_counter()
    out = fn(*sets[0])
    jax.block_until_ready(out)
    log(f"bench: compile+first step {time.perf_counter() - t0:.1f}s")
    _ = postprocess_score(np.asarray(out, dtype=np.float64))

    # Steady state, pipelined: enqueue continuously; sub-scores of K batches
    # are stacked DEVICE-SIDE and fetched as one transfer, so the dev
    # tunnel's ~28 ms fixed per-fetch latency (not present on a production
    # PCIe host) amortizes over K*batch frames instead of capping the loop.
    # Best of TM_BENCH_REPS repetitions (tunnel load varies run to run by
    # ~2x; each rep is <1 s, so extra reps cheaply sample quiet windows).
    K = 8
    reps = int(os.environ.get("TM_BENCH_REPS", "6"))
    best = 0.0
    for rep in range(reps):
        t0 = time.perf_counter()
        pend: list = []
        prev = None
        done = 0
        for i in range(iters):
            pend.append(fn(*sets[i % 2]))
            if len(pend) == K:
                packed = stack(pend)
                pend = []
                if prev is not None:
                    vals = np.asarray(prev, dtype=np.float64)
                    _ = postprocess_score(vals.reshape((-1,) + vals.shape[2:]))
                    done += vals.shape[0] * vals.shape[1]
                prev = packed
        for leftover in ([prev] if prev is not None else []) + (
            [stack(pend)] if pend else []
        ):
            vals = np.asarray(leftover, dtype=np.float64)
            _ = postprocess_score(vals.reshape((-1,) + vals.shape[2:]))
            done += vals.shape[0] * vals.shape[1]
        elapsed = time.perf_counter() - t0
        assert done == batch * iters
        best = max(best, batch * iters / elapsed)
    fps = best
    mpxs = fps * W * H / 1e6
    log(f"bench: device pipeline {fps:.1f} fps ({mpxs:.0f} Mpx/s)")

    # Secondary: include H2D of fresh host frames (tunnel-limited here).
    t0 = time.perf_counter()
    e2e_iters = max(2, iters // 8)
    prev = None
    for i in range(e2e_iters):
        yr = np.roll(y_ref, i + 1, axis=2)
        yd = np.roll(y_dis, i + 1, axis=2)
        out = fn(yr, uv_ref, yd, uv_ref)
        if prev is not None:
            _ = postprocess_score(np.asarray(prev, dtype=np.float64))
        prev = out
    _ = postprocess_score(np.asarray(prev, dtype=np.float64))
    e2e_fps = batch * e2e_iters / (time.perf_counter() - t0)
    log(f"bench: H2D-inclusive {e2e_fps:.1f} fps (tunnel-limited in this env)")

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
