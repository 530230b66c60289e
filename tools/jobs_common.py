"""Shared harness for /tmp/tpu_jobs measurement jobs (run inside
tools/tpu_jobd.py's single warm TPU process).

Provides 1080p YUV inputs staged in the padded plane layout and a timer for
the full 6-scale from-YUV SSIMULACRA2 pipeline under arbitrary kernel
kwargs / module flags, mirroring bench.py's donated ds-buffer threading so
job numbers are directly comparable to the headline bench.
"""

from __future__ import annotations

import time

import numpy as np

H, W = 1080, 1920


def make_yuv(batch: int, seed: int = 0, h: int = None, w: int = None):
    h, w = h or H, w or W
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 64 * np.sin(xx / 37.0) * np.cos(yy / 23.0)).astype(np.uint8)
    y_ref = np.stack([np.roll(base, 7 * i, axis=1) for i in range(batch)])
    uv_ref = rng.integers(100, 156, (batch, h // 2, w // 2, 2), dtype=np.uint8)
    y_dis = np.clip(
        y_ref.astype(np.int16) + rng.integers(-6, 7, y_ref.shape), 0, 255
    ).astype(np.uint8)
    return y_ref, uv_ref, y_dis, uv_ref


def stage_padded(batch: int, shift: int = 0, seed: int = 0,
                 h: int = None, w: int = None):
    import jax

    from turbo_metrics_tpu.ops.pallas.scale_stats import pad_yuv_planes

    h, w = h or H, w or W
    y_ref, uv_ref, y_dis, uv_dis = make_yuv(batch, seed, h, w)
    if shift:
        y_ref = np.roll(y_ref, shift, axis=2)
        y_dis = np.roll(y_dis, shift, axis=2)
    planes = pad_yuv_planes(np.stack([y_ref, y_dis]), np.stack([uv_ref, uv_dis]), h, w)
    out = tuple(jax.device_put(a) for a in planes)
    jax.block_until_ready(out)
    return out


def time_from_yuv(batch=8, iters=24, reps=3, use_tail2=None, label="",
                  h=None, w=None, **kernel_kwargs):
    """ms/batch for the full pipeline (conversion-fused scale 0 + chain),
    ds buffers donated+threaded like bench.py.  Returns (ms, subscores0).
    ``h``/``w`` override the 1080p default (4K sweeps)."""
    import jax
    import jax.numpy as jnp

    import turbo_metrics_tpu.models.ssimulacra2 as m

    H_, W_ = h or H, w or W

    old_tail2 = m.USE_TAIL2
    if use_tail2 is not None:
        m.USE_TAIL2 = bool(use_tail2)
    try:
        from turbo_metrics_tpu.ops.downscale import scale_dims

        num_scales = len(scale_dims(H_, W_))

        def step(planes, ds_bufs):
            return m.ssimulacra2_subscores_from_yuv(
                None, None, H_, W_, num_scales=num_scales, ds_bufs=ds_bufs,
                padded_planes=planes, **kernel_kwargs,
            )

        fn = jax.jit(step, donate_argnums=(1,))
        shapes = m.ds_buffer_shapes_yuv(
            H_, W_, batch, num_scales=num_scales,
            kernel_kwargs=kernel_kwargs or None,
        )
        ds = [jnp.zeros(s, jnp.float32) for s in shapes]
        sets = [stage_padded(batch, shift, 0, H_, W_) for shift in (0, 3)]
        sub, ds = fn(sets[0], ds)
        jax.block_until_ready(sub)
        sub0 = np.asarray(sub, dtype=np.float64)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = sub
            for i in range(iters):
                out, ds = fn(sets[i % 2], ds)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        ms = best * 1e3
        fps = batch / best
        print(f"{label or 'run'}: {ms:.2f} ms/b{batch} = {fps:.0f} fps "
              f"({fps * H_ * W_ / 1e6:.0f} Mpx/s)", flush=True)
        return ms, sub0
    finally:
        m.USE_TAIL2 = old_tail2


def score_delta(sub_a: np.ndarray, sub_b: np.ndarray) -> float:
    """Max |score| delta between two (B,3,S,2,3) sub-score arrays."""
    from turbo_metrics_tpu.models.ssimulacra2_score import postprocess_score

    sa = postprocess_score(sub_a)
    sb = postprocess_score(sub_b)
    return float(np.abs(sa - sb).max())


def reload_stack(engine: bool = False):
    """Reload the kernel/model module chain inside the warm jobd process so
    a job picks up on-disk edits (dependency order matters: from-imports
    rebind on reload of the importer)."""
    import importlib

    mods = [
        "turbo_metrics_tpu.ops.pallas.scale_stats",
        "turbo_metrics_tpu.ops.pallas.scale_stats_legacy",
        "turbo_metrics_tpu.ops.pallas.scale_tail",
        "turbo_metrics_tpu.ops.pallas.convert",
        "turbo_metrics_tpu.ops.pallas.windowed",
        "turbo_metrics_tpu.ops.pallas.windowed_tail",
        "turbo_metrics_tpu.ops.pallas.vif",
        "turbo_metrics_tpu.ops.pallas.vif_tail",
        "turbo_metrics_tpu.ops.pallas.adm",
        "turbo_metrics_tpu.ops.pallas.motion",
        "turbo_metrics_tpu.ops.pallas.xpsnr",
        "turbo_metrics_tpu.ops.vif",
        "turbo_metrics_tpu.ops.adm",
        "turbo_metrics_tpu.ops.vmaf_motion",
        "turbo_metrics_tpu.ops.xpsnr_ops",
        "turbo_metrics_tpu.ops.quality",
        "turbo_metrics_tpu.models.ssimulacra2",
    ] + (["turbo_metrics_tpu.engine"] if engine else [])
    import sys as _sys

    out = []
    for m in mods:
        if m in _sys.modules:
            out.append(importlib.reload(_sys.modules[m]))
    return out

def time_multi(batch=8, iters=12, reps=3, label="", metrics=None,
               vmaf_integer=False):
    """Device-resident ms/batch of the engine's 1080p multi-metric padded
    step (the exact program the CLI runs for `-m` combinations), inputs
    staged once.  Returns (ms, out0) where out0 is the first step's raw
    output dict fetched to host (for score-parity checks between configs)."""
    import jax
    import jax.numpy as jnp

    from turbo_metrics_tpu import engine as eng

    M = metrics or eng.Metrics(psnr=True, ssim=True, msssim=True,
                               ssimulacra2=True, xpsnr=True, vmaf=True)
    tm = eng.TurboMetrics(W, H, M, batch=batch, vmaf_integer=vmaf_integer)
    spec = eng.ConvertSpec("yuv420", 8, "bt709", "bt709", False)
    step = tm._get_step(spec, spec)

    y_ref, uv_ref, y_dis, uv_dis = make_yuv(batch)
    ref_arrays = (jax.device_put(y_ref), jax.device_put(uv_ref))
    dis_arrays = (jax.device_put(y_dis), jax.device_put(uv_dis))
    aux = {}
    if M.xpsnr:
        prev_lead = np.concatenate([y_ref[0:1], y_ref[:-1]], axis=0)
        aux["prev_ref"] = (jax.device_put(prev_lead), ref_arrays[1])
    if M.vmaf:
        from turbo_metrics_tpu.ops.vmaf_motion import integer_blur

        prev_blur = jax.jit(lambda y: integer_blur(y, depth=8))(
            ref_arrays[0][0:1]
        )[0]
        aux["vmaf_prev_blur"] = jax.device_put(np.asarray(prev_blur))
    jax.block_until_ready(ref_arrays)

    out = step(ref_arrays, dis_arrays, aux)
    jax.block_until_ready(out)

    def _flat(d, prefix=""):
        flat = {}
        for k, v in d.items():
            if isinstance(v, dict):
                flat.update(_flat(v, prefix + str(k) + "."))
            elif hasattr(v, "shape"):
                flat[prefix + str(k)] = np.asarray(v, dtype=np.float64)
        return flat

    out0 = _flat(out)
    import time as _t

    best = 1e9
    for _ in range(reps):
        t0 = _t.perf_counter()
        for _i in range(iters):
            out = step(ref_arrays, dis_arrays, aux)
        jax.block_until_ready(out)
        best = min(best, (_t.perf_counter() - t0) / iters)
    ms = best * 1e3
    fps = batch / best
    print(f"{label or 'multi'}: {ms:.2f} ms/b{batch} = {fps:.0f} fps "
          f"({fps * H * W / 1e6:.0f} Mpx/s)", flush=True)
    return ms, out0


def multi_delta(a: dict, b: dict) -> dict:
    """Max |delta| per output key between two time_multi out dicts."""
    out = {}
    for k in a:
        if k in b and hasattr(a[k], "shape"):
            out[k] = float(np.abs(np.asarray(a[k], np.float64)
                                  - np.asarray(b[k], np.float64)).max())
    return out
