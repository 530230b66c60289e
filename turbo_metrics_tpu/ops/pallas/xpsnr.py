"""Fused Pallas XPSNR block-stats kernel.

The jnp formulation (ops/xpsnr_ops.py) costs ~12 full-array HBM passes
(highpass shifts, squares, pads, block reshapes) — measured 8.3 ms/b8 at
1080p.  Here one kernel reads each u8/u16 luma tile once and emits the
16x16 block grids directly:

* The 3x3 highpass [[-1,-2,-1],[-2,12,-2],[-1,-2,-1]] (xpsnr_ops.HIGHPASS)
  is computed as ``16*x - blur121_h(blur121_v(x))`` — the separable
  decomposition 16*I - [1,2,1] (x) [1,2,1] — with 1-px edge-replicated
  halos prefilled host-side in the padded layout.
* Everything stays EXACT in f32: every per-pixel quantity and block sum is
  an integer below 2^24, except the 10-bit SSE block sum, which is split
  into hi/lo limbs (hi = err2 // 4096) summed separately and recombined in
  uint32 (exact, matching the jnp/NPP-convention uint32 grids bit for bit).
* Block sums ride the MXU: a sublane reshape folds 16 rows, a one-hot
  (tile_w, tile_w/16) matmul folds 16 columns.

Parity: bit-exact vs ops/xpsnr_ops.xpsnr_block_stats (itself bit-exact vs
refimpl/xpsnr.py and the reference's 4x4 micro-test, tests/test_xpsnr.py).
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
    TILE_W4,
    _round_up,
)

BLOCK = 16


def _geom(h: int, w: int) -> tuple[int, int, int, int, int, int]:
    """Tile geometry with 16-multiple tile heights (block alignment)."""
    tile_h = min(64, _round_up(h, 16))
    wr = _round_up(w, 128)
    if wr <= TILE_W4:
        tile_w, ntw = wr, 1
    else:
        best = None
        for n in range(2, -(-w // 128) + 1):
            t = _round_up(-(-w // n), 128)
            if t > TILE_W4:
                continue
            cost = n * (t + 2 * COL_HALO4)
            if best is None or cost < best[0]:
                best = (cost, t, n)
        _, tile_w, ntw = best
    nth = -(-h // tile_h)
    hp = ROW_HALO4 + nth * tile_h + ROW_HALO4
    wp = COL_HALO4 + ntw * tile_w + COL_HALO4
    return tile_h, tile_w, nth, ntw, hp, wp


def _pad_layout(y: jax.Array, h: int, w: int, *, edge: bool) -> jax.Array:
    """(B, h, w) int -> (B, hp, wp) with the image at (8, 128); ``edge``
    additionally fills a 1-px edge-replicated halo (for the highpass)."""
    _, _, _, _, hp, wp = _geom(h, w)
    R, C = ROW_HALO4, COL_HALO4
    buf = jnp.pad(y, ((0, 0), (R, hp - h - R), (C, wp - w - C)))
    if edge:
        buf = buf.at[:, R - 1, :].set(buf[:, R, :])
        buf = buf.at[:, R + h, :].set(buf[:, R + h - 1, :])
        buf = buf.at[:, :, C - 1].set(buf[:, :, C])
        buf = buf.at[:, :, C + w].set(buf[:, :, C + w - 1])
    return buf


def _xpsnr_kernel(
    r_hbm,
    d_hbm,
    p_hbm,
    scol_ref,
    out_ref,
    tr,
    td,
    tp,
    sems,
    *,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    nth: int,
    ntw: int,
    bsz: int,
    split_sse: bool,
):
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
        row0_ = pl.multiple_of((rem // ntw) * tile_h, 16)
        col0_ = pl.multiple_of((rem % ntw) * tile_w, 128)
        return [
            pltpu.make_async_copy(
                src.at[b_, pl.ds(row0_, rows), pl.ds(col0_, cols)],
                dst.at[slot], sems.at[slot, i],
            )
            for i, (src, dst) in enumerate(
                ((r_hbm, tr), (d_hbm, td), (p_hbm, tp))
            )
        ]

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

    row0 = pl.multiple_of(th * tile_h, 16)
    col0 = pl.multiple_of(tw * tile_w, 128)

    rw = tr[slot].astype(jnp.int32).astype(jnp.float32)  # (rows, cols)

    def centre(x):
        return jax.lax.slice(
            x, (ROW_HALO4, COL_HALO4), (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
        )

    rc = centre(rw)
    dc = centre(td[slot].astype(jnp.int32).astype(jnp.float32))
    pc = centre(tp[slot].astype(jnp.int32).astype(jnp.float32))

    # Separable [1,2,1] x [1,2,1] blur of ref over the centre, halos valid.
    two = jnp.float32(2.0)
    vert = (
        jax.lax.slice(rw, (ROW_HALO4 - 1, 0), (ROW_HALO4 - 1 + tile_h, cols))
        + two * jax.lax.slice(rw, (ROW_HALO4, 0), (ROW_HALO4 + tile_h, cols))
        + jax.lax.slice(rw, (ROW_HALO4 + 1, 0), (ROW_HALO4 + 1 + tile_h, cols))
    )
    blur = (
        jax.lax.slice(vert, (0, COL_HALO4 - 1), (tile_h, COL_HALO4 - 1 + tile_w))
        + two * jax.lax.slice(vert, (0, COL_HALO4), (tile_h, COL_HALO4 + tile_w))
        + jax.lax.slice(vert, (0, COL_HALO4 + 1), (tile_h, COL_HALO4 + 1 + tile_w))
    )
    hp_abs = jnp.abs(jnp.float32(16.0) * rc - blur)

    rid = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + row0
    cid = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + col0
    mask = ((rid < h) & (cid < w)).astype(jnp.float32)

    err = rc - dc
    err2 = err * err * mask
    sact = hp_abs * mask
    tact = jnp.abs(rc - pc) * mask

    if split_sse:
        hi = jnp.floor(err2 * np.float32(1.0 / 4096.0))
        lo = err2 - hi * np.float32(4096.0)
        qs = [lo, hi, sact, tact]
    else:
        qs = [err2, jnp.zeros_like(err2), sact, tact]

    br = tile_h // BLOCK
    wb_t = tile_w // BLOCK
    scol = scol_ref[...]  # (tile_w, wb_t) one-hot 16-col fold
    out_ref[...] = jnp.zeros_like(out_ref)
    for qi, q in enumerate(qs):
        rfold = q.reshape(br, BLOCK, tile_w).sum(axis=1)  # (br, tile_w)
        sums = jax.lax.dot_general(
            rfold, scol,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (br, wb_t)
        out_ref[0, 0, 0, pl.ds(4 * qi, br), :] = sums


def xpsnr_block_stats_pallas(
    y_ref: jax.Array,
    y_dis: jax.Array,
    y_prev: jax.Array,
    *,
    depth: int = 8,
    interpret: bool = False,
) -> dict[str, jax.Array]:
    """Drop-in for ops/xpsnr_ops.xpsnr_block_stats (block=16): uint32
    (B, ceil(H/16), ceil(W/16)) grids, bit-exact."""
    bsz, h, w = y_ref.shape
    tile_h, tile_w, nth, ntw, hp, wp = _geom(h, w)
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4
    br = tile_h // BLOCK
    wb_t = tile_w // BLOCK

    rp = _pad_layout(y_ref, h, w, edge=True)
    dp = _pad_layout(y_dis, h, w, edge=False)
    pp = _pad_layout(y_prev, h, w, edge=False)

    scol = np.zeros((tile_w, wb_t), np.float32)
    scol[np.arange(tile_w), np.arange(tile_w) // BLOCK] = 1.0

    dt = rp.dtype
    # The SSE hi/lo split is needed whenever err^2 block sums can exceed
    # 2^24 (any input wider than 8 bits); derive it from the dtype so a
    # missing ``depth`` can never silently truncate.
    split = depth > 8 or dt != jnp.uint8
    kernel = functools.partial(
        _xpsnr_kernel,
        h=h, w=w, tile_h=tile_h, tile_w=tile_w,
        nth=nth, ntw=ntw, bsz=bsz, split_sse=split,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nth, ntw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_w, wb_t), lambda b, th, tw: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 16, wb_t), lambda b, th, tw: (b, th, tw, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nth, ntw, 16, wb_t), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), rp.dtype),
            pltpu.VMEM((2, rows, cols), dp.dtype),
            pltpu.VMEM((2, rows, cols), pp.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rp, dp, pp, jnp.asarray(scol))

    hb, wb = -(-h // BLOCK), -(-w // BLOCK)
    # (B, nth, ntw, 16, wb_t) -> per-quantity (B, nth*br, ntw*wb_t)
    def grid(qi):
        g = out[:, :, :, 4 * qi : 4 * qi + br, :]
        g = jnp.transpose(g, (0, 1, 3, 2, 4)).reshape(
            bsz, nth * br, ntw * wb_t
        )
        return g[:, :hb, :wb]

    lo = grid(0).astype(jnp.uint32)
    hi = grid(1).astype(jnp.uint32)
    sse = hi * jnp.uint32(4096) + lo
    return {
        "sse": sse,
        "sact": grid(2).astype(jnp.uint32),
        "tact": grid(3).astype(jnp.uint32),
    }
