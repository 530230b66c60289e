"""On-chip timing lab for the fused-scale kernel variants (round-2 perf push).

Times v2 (current) against v3 configs (MXU blur passes, DMA double-buffering,
tile sizes) at 1080p batch-4 scale-0, and checks each variant's norms against
the jnp path on-chip.  Dev tool; results feed docs/PERFORMANCE.md.

Usage: python tools/perf_lab.py [config ...]
  config = wpass,hpass,precision,db,tile_h,tile_w  e.g. vpu,mxu,highest,1,128,512
  default: a sweep of the interesting configs.
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

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    t0 = time.perf_counter()
    _ = float(jnp.ones((8, 128)).sum())
    print(f"first fetch {time.perf_counter()-t0:.1f}s", flush=True)

    from turbo_metrics_tpu.ops.pallas import scale_stats as ss

    B, H, W = 4, 1080, 1920
    rng = np.random.default_rng(0)
    lin1 = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float64).astype(np.float32))
    lin2 = jnp.clip(
        lin1 + jnp.asarray(rng.normal(0, 0.05, lin1.shape).astype(np.float32)), 0, 1
    )
    jax.block_until_ready((lin1, lin2))

    def timeit(name, fn, *args, iters=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        return dt, out

    if len(sys.argv) > 1 and sys.argv[1] == "v4":
        # v4 padded-chain sweep: scale-0-only and full 6-scale pipeline per
        # blur-engine config (W pass vpu|mxu3, matmul highest|bf16x3, newton).
        from turbo_metrics_tpu.models.ssimulacra2 import (
            ssimulacra2_subscores_from_padded,
        )

        p12 = jax.jit(
            lambda a, b: ss.pad_to_layout4(jnp.stack([a, b]), H, W)
        )(lin1, lin2)
        jax.block_until_ready(p12)

        base = None
        for wp, prec, cbrt in [
            ("vpu", "highest", "pow"),
            ("vpu", "highest", "fastnr"),
            ("mxu3", "highest", "fastnr"),
            ("mxu3", "bf16x3", "fastnr"),
        ]:
            name = f"v4 w={wp} mm={prec} cbrt={cbrt}"
            try:
                f0 = jax.jit(
                    lambda p, wp=wp, prec=prec, cbrt=cbrt: ss.fused_scale_pallas_v4(
                        p, H, W, emit_ds=True, w_pass=wp, precision=prec,
                        cbrt=cbrt,
                    )[0]
                )
                _, sums = timeit(f"{name} scale0", f0, p12)
                norms = np.asarray(ss.norms_from_sums(sums, H * W))
                if base is None:
                    base = norms
                print(f"    scale0 norm err: {np.abs(norms - base).max():.2e}",
                      flush=True)

                ffull = jax.jit(
                    lambda p, wp=wp, prec=prec, cbrt=cbrt: (
                        ssimulacra2_subscores_from_padded(
                            p, H, W, num_scales=6, w_pass=wp,
                            precision=prec, cbrt=cbrt,
                        )
                    )
                )
                timeit(f"{name} 6-scale", ffull, p12, iters=20)
            except Exception as e:
                print(f"    FAILED: {type(e).__name__}: {str(e)[:300]}",
                      flush=True)
        return 0

    if len(sys.argv) > 1 and sys.argv[1] == "v4tiles":
        # Tile-geometry sweep for the v4 padded chain (default blur engine).
        from turbo_metrics_tpu.models.ssimulacra2 import (
            ssimulacra2_subscores_from_padded,
        )

        base = None
        for th4, tw4 in [
            (64, 1024), (72, 1024), (120, 1024), (128, 1024),
            (120, 2048), (64, 2048), (40, 1024), (56, 1024),
        ]:
            ss.TILE_H4, ss.TILE_W4 = th4, tw4
            try:
                p12 = jax.jit(
                    lambda a, b: ss.pad_to_layout4(jnp.stack([a, b]), H, W)
                )(lin1, lin2)
                jax.block_until_ready(p12)
                ffull = jax.jit(
                    lambda p: ssimulacra2_subscores_from_padded(
                        p, H, W, num_scales=6
                    )
                )
                _, norms = timeit(f"v4 tiles {th4}x{tw4} 6-scale", ffull, p12,
                                  iters=20)
                norms = np.asarray(norms)
                if base is None:
                    base = norms
                print(f"    norm err: {np.abs(norms - base).max():.2e}",
                      flush=True)
            except Exception as e:
                print(f"    FAILED: {type(e).__name__}: {str(e)[:300]}",
                      flush=True)
        return 0

    # Reference: current v2 kernel and jnp-path norms for numeric check.
    f_v2 = jax.jit(lambda a, b: ss.fused_scale_pallas(a, b)[0])
    _, sums_v2 = timeit("v2 current (serial DMA, vpu/vpu)", f_v2, lin1, lin2)
    ref = np.asarray(ss.norms_from_sums(sums_v2, H * W))

    if len(sys.argv) > 1:
        configs = [tuple(a.split(",")) for a in sys.argv[1:]]
    else:
        configs = [
            ("vpu", "vpu", "highest", "1", "128", "512"),
            ("vpu", "mxu", "highest", "1", "128", "512"),
            ("vpu", "mxu", "high", "1", "128", "512"),
            ("mxu", "mxu", "highest", "1", "128", "512"),
            ("mxu", "mxu", "high", "1", "128", "512"),
            ("vpu", "mxu", "highest", "0", "128", "512"),
            ("vpu", "mxu", "highest", "1", "128", "1024"),
            ("vpu", "mxu", "highest", "1", "64", "1024"),
            ("vpu", "mxu", "highest", "1", "256", "512"),
        ]
    for wp, hp, prec, db, th, tw in configs:
        name = f"v3 w={wp} h={hp} prec={prec} db={db} tile={th}x{tw}"
        try:
            fn = jax.jit(
                functools.partial(
                    ss.fused_scale_pallas_v3,
                    w_pass=wp,
                    h_pass=hp,
                    precision=prec,
                    double_buffer=db == "1",
                    tile_h=int(th),
                    tile_w=int(tw),
                )
            )
            _, sums = timeit(name, fn, lin1, lin2)
            norms = np.asarray(ss.norms_from_sums(sums, H * W))
            err = np.abs(norms - ref).max()
            print(f"    max norm err vs v2: {err:.2e}", flush=True)
        except Exception as e:
            print(f"    FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
