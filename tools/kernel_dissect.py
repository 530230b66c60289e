"""Dissect the fused-scale kernel's cost: time stripped-down variants.

Times the full v2 kernel against variants with parts disabled (blur, xyb,
maps, ds) at 1080p to find where the VPU time goes.  Dev-environment tool;
results feed docs/PERFORMANCE.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _ = float(jnp.ones((8, 128)).sum())
    print("first fetch done", flush=True)

    from turbo_metrics_tpu.ops.gaussian import RADIUS, gaussian_taps
    from turbo_metrics_tpu.ops.pallas import scale_stats as ss

    B, H, W = 4, 1080, 1920
    rng = np.random.default_rng(0)
    lin1 = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float64).astype(np.float32))
    lin2 = lin1 * np.float32(0.99)
    jax.block_until_ready((lin1, lin2))

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        return dt

    # Full single-scale kernel (scale 0 only).
    f_full = jax.jit(functools.partial(ss.fused_scale_pallas, emit_ds=True))
    timeit("scale0 full (with ds)", f_full, lin1, lin2)
    f_nods = jax.jit(functools.partial(ss.fused_scale_pallas, emit_ds=False))
    timeit("scale0 no-ds", f_nods, lin1, lin2)

    # v1 kernel (xyb outside, no ds) on pre-computed xyb for comparison.
    from turbo_metrics_tpu.ops.xyb import linear_rgb_to_xyb

    x1 = linear_rgb_to_xyb(lin1)
    x2 = linear_rgb_to_xyb(lin2)
    jax.block_until_ready((x1, x2))
    f_v1 = jax.jit(ss.scale_sums_pallas)
    timeit("scale0 v1 (xyb outside)", f_v1, x1, x2)

    # Blur-only microkernel: 15 plane blurs on the same tiles, sums only.
    taps = tuple(float(v) for v in gaussian_taps())

    def blur_only_kernel(img_hbm, out_ref, t1, sems, *, tile_h, tile_w):
        p = pl.program_id(0)
        th = pl.program_id(1)
        tw = pl.program_id(2)
        row0 = pl.multiple_of(th * tile_h, 8)
        col0 = pl.multiple_of(tw * tile_w, 128)
        dma = pltpu.make_async_copy(
            img_hbm.at[p, pl.ds(row0, tile_h + 16), pl.ds(col0, tile_w + 128)],
            t1,
            sems.at[0],
        )
        dma.start()
        dma.wait()
        a = t1[:]
        tp = [jnp.float32(v) for v in taps]
        acc = jnp.float32(0.0)
        for _ in range(5):  # 5 quantities worth of blur work
            qw = ss._blur_w(a, tp, 64 - RADIUS, tile_w)
            qb = ss._blur_h(qw, tp, 8 - RADIUS, tile_h)
            acc = acc + jnp.sum(qb)

        @pl.when((th == 0) & (tw == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        partial = jnp.stack([acc] + [jnp.float32(0.0)] * 7)
        out_ref[0, 0, :] += partial

    def blur_only(img):
        bsz = img.shape[0] * img.shape[1]
        tile_h, tile_w = 128, 512
        nth, ntw = -(-H // tile_h), -(-W // tile_w)
        hp = 8 + nth * tile_h + 8
        wp = 64 + ntw * tile_w + 64
        x = img.reshape(bsz, H, W)
        x = jnp.pad(x, ((0, 0), (8, hp - H - 8), (64, wp - W - 64)))
        return pl.pallas_call(
            functools.partial(blur_only_kernel, tile_h=tile_h, tile_w=tile_w),
            grid=(bsz, nth, ntw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 8, 8), lambda p, th, tw: (p, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, 8, 8), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 16, tile_w + 128), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )(x)

    timeit("blur-only (15 planes x 2 passes)", jax.jit(blur_only), lin1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
