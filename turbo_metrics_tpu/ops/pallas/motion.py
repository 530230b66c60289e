"""Fused Pallas VMAF-motion kernel (integer 5-tap blur + SAD).

One pass over each u8/u16 luma tile instead of the jnp path's ~10
full-array HBM trips (ops/vmaf_motion.py, measured 3.0 ms/b8 at 1080p).
All arithmetic is EXACT integer in i32 on the VPU, reproducing the
reference convention bit for bit:

* V pass: acc = sum F[k]*x <= 4095*65536 < 2^31 — single i32 accumulator;
  tmp = (acc + 2^(N-1)) >> N.
* H pass: sum F[k]*tmp can reach 2^32, so tmp is split into hi/lo bytes
  (tmp = th*256 + tl); with A = sum F*th, B = sum F*tl (each < 2^25) the
  rounded >>16 collapses EXACTLY to ``(A + ((B + 32768) >> 8)) >> 8`` —
  floor((A*256+B+32768)/65536) = floor((A + Dh + Dl/256)/256) with
  D = B+32768 and Dl/256 < 1 never crossing an integer boundary.
* SAD: |blurred - prev| masked to the image, summed along lanes per row
  (<= 1920*65535 < 2^31).

Borders use the reference's asymmetric mirroring (reflect low edge,
symmetric high edge — vmaf_motion._pad_mirror), prefilled host-side into
the padded layout's halos.

Parity: bit-exact vs ops/vmaf_motion.integer_blur / motion_stats (itself
bit-exact vs refimpl/vmaf_motion.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops.pallas.scale_stats import (
    COL_HALO4,
    ROW_HALO4,
    pad_geom4,
)
from turbo_metrics_tpu.ops.vmaf_motion import FILTER, RADIUS

_F = [int(v) for v in FILTER]


def _pad_motion_layout(y: jax.Array, h: int, w: int) -> jax.Array:
    """(B, h, w) -> (B, hp, wp) with the image at (8, 128) and the
    reference's asymmetric mirror in a RADIUS-px halo: low edge reflect
    (x[-1]=x[1]), high edge symmetric (x[n]=x[n-1])."""
    _, _, _, _, hp, wp = pad_geom4(h, w)
    R, C = ROW_HALO4, COL_HALO4
    buf = jnp.pad(y, ((0, 0), (R, hp - h - R), (C, wp - w - C)))
    r = RADIUS
    buf = buf.at[:, R - r : R, :].set(buf[:, R + r : R : -1, :])
    buf = buf.at[:, R + h : R + h + r, :].set(
        buf[:, R + h - 1 : R + h - 1 - r : -1, :]
    )
    buf = buf.at[:, :, C - r : C].set(buf[:, :, C + r : C : -1])
    buf = buf.at[:, :, C + w : C + w + r].set(
        buf[:, :, C + w - 1 : C + w - 1 - r : -1]
    )
    return buf


def _motion_kernel(
    *refs,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    nth: int,
    ntw: int,
    bsz: int,
    depth: int,
    with_sad: bool,
):
    it = iter(refs)
    y_hbm = next(it)
    p_hbm = next(it) if with_sad else None
    blur_ref = next(it)
    sad_ref = next(it) if with_sad else None
    ty = next(it)
    tp = next(it) if with_sad else None
    sems = next(it)
    b = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4

    nsteps = bsz * nth * ntw
    step = (b * nth + th) * ntw + tw

    def dmas(idx, slot):
        b_ = idx // (nth * ntw)
        rem = idx % (nth * ntw)
        row0_ = pl.multiple_of((rem // ntw) * tile_h, 8)
        col0_ = pl.multiple_of((rem % ntw) * tile_w, 128)
        out = [
            pltpu.make_async_copy(
                y_hbm.at[b_, pl.ds(row0_, rows), pl.ds(col0_, cols)],
                ty.at[slot], sems.at[slot, 0],
            ),
        ]
        if with_sad:
            out.append(pltpu.make_async_copy(
                p_hbm.at[b_, pl.ds(row0_, rows), pl.ds(col0_, cols)],
                tp.at[slot], sems.at[slot, 1],
            ))
        return out

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        for d in dmas(step, slot):
            d.start()

    @pl.when(step + 1 < nsteps)
    def _():
        for d in dmas(step + 1, jax.lax.rem(step + 1, 2)):
            d.start()

    for d in dmas(step, slot):
        d.wait()

    row0 = pl.multiple_of(th * tile_h, 8)
    col0 = pl.multiple_of(tw * tile_w, 128)

    x = ty[slot].astype(jnp.int32)  # (rows, cols)

    # V pass over the centre rows (halo cols kept for the H pass).
    acc = None
    for k in range(5):
        sl = jax.lax.slice(
            x, (ROW_HALO4 - RADIUS + k, 0),
            (ROW_HALO4 - RADIUS + k + tile_h, cols),
        )
        term = sl * jnp.int32(_F[k])
        acc = term if acc is None else acc + term
    half = jnp.int32(1 << (depth - 1))
    tmp = (acc + half) >> depth  # (tile_h, cols), <= 65535

    t_hi = tmp >> 8
    t_lo = tmp - (t_hi << 8)
    a_acc = None
    b_acc = None
    for k in range(5):
        hi = jax.lax.slice(
            t_hi, (0, COL_HALO4 - RADIUS + k),
            (tile_h, COL_HALO4 - RADIUS + k + tile_w),
        )
        lo = jax.lax.slice(
            t_lo, (0, COL_HALO4 - RADIUS + k),
            (tile_h, COL_HALO4 - RADIUS + k + tile_w),
        )
        fa = hi * jnp.int32(_F[k])
        fb = lo * jnp.int32(_F[k])
        a_acc = fa if a_acc is None else a_acc + fa
        b_acc = fb if b_acc is None else b_acc + fb
    blurred = (a_acc + ((b_acc + jnp.int32(32768)) >> 8)) >> 8  # u16 range

    blur_ref[...] = blurred.astype(jnp.uint16)[None]
    if with_sad:
        prev = jax.lax.slice(
            tp[slot].astype(jnp.int32),
            (ROW_HALO4, COL_HALO4),
            (ROW_HALO4 + tile_h, COL_HALO4 + tile_w),
        )
        rid = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + row0
        cid = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + col0
        mask = ((rid < h) & (cid < w)).astype(jnp.int32)
        diff = jnp.abs(blurred - prev) * mask
        sad = diff.sum(axis=1).astype(jnp.int32)  # (tile_h,), <= 2^31
        sad_ref[...] = jnp.broadcast_to(
            sad[None, None, None, :, None], (1, 1, 1, tile_h, 8)
        )


def motion_stats_pallas(
    y: jax.Array,
    prev_blurred: jax.Array,
    *,
    depth: int = 8,
    interpret: bool = False,
) -> dict:
    """Drop-in for ops/vmaf_motion.motion_stats: bit-exact
    {'blurred': (B, H, W) u16, 'sad_rows': (B, H) u32}."""
    bsz, h, w = y.shape
    tile_h, tile_w, nth, ntw, hp, wp = pad_geom4(h, w)
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4

    yp = _pad_motion_layout(y, h, w)
    pp = _pad_motion_layout(prev_blurred, h, w)

    kernel = functools.partial(
        _motion_kernel,
        h=h, w=w, tile_h=tile_h, tile_w=tile_w,
        nth=nth, ntw=ntw, bsz=bsz, depth=depth, with_sad=True,
    )
    blur, sad = pl.pallas_call(
        kernel,
        grid=(bsz, nth, ntw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile_w), lambda b, th, tw: (b, th, tw)),
            pl.BlockSpec(
                (1, 1, 1, tile_h, 8), lambda b, th, tw: (b, th, tw, 0, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nth * tile_h, ntw * tile_w), jnp.uint16),
            jax.ShapeDtypeStruct((bsz, nth, ntw, tile_h, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), yp.dtype),
            pltpu.VMEM((2, rows, cols), pp.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(yp, pp)
    rows_sum = sad[..., 0].sum(axis=2).reshape(bsz, nth * tile_h)
    return {
        "blurred": blur[:, :h, :w],
        "sad_rows": rows_sum[:, :h].astype(jnp.uint32),
    }


def integer_blur_pallas(
    y: jax.Array, *, depth: int = 8, interpret: bool = False
) -> jax.Array:
    """Drop-in for ops/vmaf_motion.integer_blur: (B, H, W) -> u16, bit-exact
    (blur-only variant of the fused kernel; the engine SADs consecutive
    frames itself to handle the cross-shard ppermute boundary)."""
    bsz, h, w = y.shape
    tile_h, tile_w, nth, ntw, hp, wp = pad_geom4(h, w)
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4
    yp = _pad_motion_layout(y, h, w)
    kernel = functools.partial(
        _motion_kernel,
        h=h, w=w, tile_h=tile_h, tile_w=tile_w,
        nth=nth, ntw=ntw, bsz=bsz, depth=depth, with_sad=False,
    )
    blur = pl.pallas_call(
        kernel,
        grid=(bsz, nth, ntw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, tile_w), lambda b, th, tw: (b, th, tw)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, nth * tile_h, ntw * tile_w), jnp.uint16
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), yp.dtype),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(yp)
    return blur[:, :h, :w]
