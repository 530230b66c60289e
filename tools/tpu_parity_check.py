"""Score-parity check on real hardware: device pipeline vs the CPU oracle.

Scores synthetic frame pairs (several noise levels and odd/even dims) with
the default device backend and with the NumPy reference implementation, and
reports the maximum score delta.  The acceptance budget is +/-0.05 on the
0-100 SSIMULACRA2 scale (BASELINE.md); the reference project's own GPU gate
was +/-0.25 (ssimulacra2-cuda/examples/compare.rs:70-74).

Usage: python tools/tpu_parity_check.py [--full]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from turbo_metrics_tpu.models.ssimulacra2 import Ssimulacra2, default_backend
    from turbo_metrics_tpu.refimpl.ssimulacra2 import compute_ssimulacra2

    t0 = time.time()
    import jax.numpy as jnp

    _ = float(jnp.ones((8, 128)).sum())
    print(f"first fetch {time.time()-t0:.0f}s; backend={default_backend()}; "
          f"devices={jax.devices()}", flush=True)

    full = "--full" in sys.argv
    cases = [(96, 128, 0.02), (67, 83, 0.05), (128, 160, 0.1)]
    if full:
        cases.append((480, 640, 0.03))

    rng = np.random.default_rng(7)
    worst = 0.0
    worst_iir = 0.0
    for h, w, noise in cases:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack(
            [
                0.5 + 0.4 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
                0.5 + 0.3 * np.cos(xx / 11.0 + 1.0) * np.sin(yy / 31.0),
                0.5 + 0.2 * np.sin((xx + yy) / 13.0),
            ],
            axis=-1,
        ).astype(np.float32)
        ref = np.clip(base + rng.normal(0, 0.01, base.shape).astype(np.float32), 0, 1)
        dis = np.clip(ref + rng.normal(0, noise, ref.shape).astype(np.float32), 0, 1)

        dev = Ssimulacra2(w, h).score_pair(ref, dis)
        dev_iir = Ssimulacra2(w, h, backend="jnp_iir").score_pair(ref, dis)
        cpu_iir = compute_ssimulacra2(ref, dis)  # faithful reference recursion
        cpu_fir = compute_ssimulacra2(ref, dis, blur_impl="fir")  # device math
        d_fir = abs(dev - cpu_fir)
        d_iir = abs(dev_iir - cpu_iir)
        worst = max(worst, d_fir)
        worst_iir = max(worst_iir, d_iir)
        # Two gates, each device mode against its matching oracle at the
        # BASELINE.md budget of 0.05 (the reference project's own GPU gate
        # was 0.25, compare.rs:70-74):
        #   * default (FIR megakernel) vs the exact-filter oracle;
        #   * jnp_iir (faithful f32 recursion) vs the recursive oracle.
        ok = d_fir < 0.05 and d_iir < 0.05
        status = "OK " if ok else "FAIL"
        print(
            f"{status} {w}x{h} noise={noise}: device={dev:.4f} "
            f"oracleFIR={cpu_fir:.4f} (d={d_fir:.5f}) "
            f"deviceIIR={dev_iir:.4f} oracleIIR={cpu_iir:.4f} (d={d_iir:.5f}) "
            f"[FIR-vs-IIR formulation spread "
            f"{abs(cpu_fir - cpu_iir):.5f}]",
            flush=True,
        )

    print(f"worst: FIR-mode vs FIR oracle {worst:.5f} (budget 0.05), "
          f"IIR-mode vs IIR oracle {worst_iir:.5f} (budget 0.05)")
    return 0 if worst < 0.05 and worst_iir < 0.05 else 1


if __name__ == "__main__":
    sys.exit(main())
