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
