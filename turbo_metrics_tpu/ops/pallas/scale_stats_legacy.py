"""Superseded SSIMULACRA2 kernel generations, kept as selectable backends.

Moved out of scale_stats.py (round 5, VERDICT r4 weak #8) so the default
engine file stays readable; nothing here is on the default path.  Each
generation's measured verdict lives in docs/PERFORMANCE.md:

* v1 (``scale_sums_pallas``): round-1 fused blur+maps+sums per scale, XYB
  computed outside.  Superseded by v2 (round-1 final table).
* v2 (``fused_scale_pallas``): in-kernel XYB + exact downscale emission.
  Superseded by the v3 MXU H-pass (round-2 kernel-changes table).
* v3 (``fused_scale_pallas_v3``): banded-matrix H pass on the MXU, DMA
  double-buffering, 64x1024 tiles.  Superseded by the v4 padded chain
  (round-2 "v4 padded chain" row); still the backend for the
  ``backend='pallas3'/'interpret2'`` model paths.
* ``_pipelined_maps_mxuC``: cross-tile software pipeline interleaving one
  tile's maps between the next tile's MXU dots.  Measured neutral-to-
  regressive vs the monolithic schedule (round-3 "overlap hypothesis,
  tested to destruction"); selectable via ``pipelined=True``.
* ``_maps_and_sums_exact_mxu`` / ``_maps_and_sums_centered``: W-pass /
  numerical-centering experiments (round-2/3 sweeps; both lost to the
  consistent-limb mxuC engine).

All remain covered by tests (backend-parametrized) and the perf-lab A/B
harness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops.gaussian import RADIUS, gaussian_taps
from turbo_metrics_tpu.ops.xyb import (
    OPSIN_ABSORBANCE_BIAS,
    OPSIN_ABSORBANCE_BIAS_ROOT,
    OPSIN_ABSORBANCE_MATRIX,
)
from turbo_metrics_tpu.ops.pallas.scale_stats import (  # noqa: F401
    C2,
    COL_HALO4,
    ROW_HALO4,
    TILE_H,
    TILE_W,
    _COL_HALO,
    _ROW_HALO,
    _PRECISIONS,
    _band_matrix_h,
    _band_matrix_w,
    _blur_h,
    _blur_pack_mxuC,
    _blur_w,
    _cbrt_fast,
    _dot3,
    _fin_sum,
    _interior_mask,
    _map_div,
    _maps_and_sums,
    _maps_sums_gen,
    _partial_sum,
    _round_up,
    _split_bf16,
    _tapsum_kappa,
    _xyb_in_kernel,
    norms_from_sums,
)


def _scale_stats_kernel(
    img1_hbm,
    img2_hbm,
    out_ref,
    t1,
    t2,
    sems,
    *,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    taps: tuple[float, ...],
):
    p = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    r = RADIUS

    row0 = pl.multiple_of(th * tile_h, 8)
    col0 = pl.multiple_of(tw * tile_w, 128)
    rows = tile_h + 2 * _ROW_HALO
    cols = tile_w + 2 * _COL_HALO
    dma1 = pltpu.make_async_copy(
        img1_hbm.at[p, pl.ds(row0, rows), pl.ds(col0, cols)], t1, sems.at[0]
    )
    dma2 = pltpu.make_async_copy(
        img2_hbm.at[p, pl.ds(row0, rows), pl.ds(col0, cols)], t2, sems.at[1]
    )
    dma1.start()
    dma2.start()
    dma1.wait()
    dma2.wait()

    a = t1[:]  # (tile_h + 16, tile_w + 128); image pixel (y, x) at local
    b = t2[:]  # (ROW_HALO + y - row0, COL_HALO + x - col0)
    tp = [jnp.float32(v) for v in taps]

    # Separable blur of the 5 quantities, entirely in VMEM.  The W pass
    # consumes lanes [COL_HALO-r+k, ...); the H pass rows [ROW_HALO-r+k, ...).
    blurred = []
    for q in (a, b, a * a, b * b, a * b):
        qw = _blur_w(q, tp, _COL_HALO - r, tile_w)  # (tile_h + 16, tile_w)
        blurred.append(_blur_h(qw, tp, _ROW_HALO - r, tile_h))  # (tile_h, tile_w)
    mu1, mu2, s11, s22, s12 = blurred

    i1 = jax.lax.slice(a, (_ROW_HALO, _COL_HALO), (_ROW_HALO + tile_h, _COL_HALO + tile_w))
    i2 = jax.lax.slice(b, (_ROW_HALO, _COL_HALO), (_ROW_HALO + tile_h, _COL_HALO + tile_w))

    one = jnp.float32(1.0)
    # Modified SSIM error map (see ops/ssim_maps.py for derivation).
    mu12 = mu1 * mu2
    mu_diff = mu1 - mu2
    num_m = one - mu_diff * mu_diff
    num_s = jnp.float32(2.0) * (s12 - mu12) + C2
    denom_s = (s11 - mu1 * mu1) + (s22 - mu2 * mu2) + C2
    d = jnp.maximum((denom_s - num_m * num_s) / denom_s, 0.0)

    # Edge-difference map.
    aa = jnp.abs(i2 - mu2)
    bb = jnp.abs(i1 - mu1)
    d1 = (aa - bb) / (one + bb)
    art = jnp.maximum(d1, 0.0)
    det = jnp.maximum(-d1, 0.0)

    # Mask to the valid image region (the zero padding beyond (h, w) must
    # not contribute to the sums).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), dimension=0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), dimension=1)
    mask = ((row_ids + row0 < h) & (col_ids + col0 < w)).astype(jnp.float32)

    d = d * mask
    art = art * mask
    det = det * mask
    d2 = d * d
    art2 = art * art
    det2 = det * det
    partial = jnp.stack(
        [
            jnp.sum(d),
            jnp.sum(d2 * d2),
            jnp.sum(art),
            jnp.sum(art2 * art2),
            jnp.sum(det),
            jnp.sum(det2 * det2),
            jnp.float32(0.0),
            jnp.float32(0.0),
        ]
    )

    # Output block is (1, 8, 8) per plane (sums live in row 0); blocks must
    # be (8k, 128k)-or-full in the last two dims, hence the 8x8 pad.
    @pl.when((th == 0) & (tw == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0, 0, :] += partial


def scale_sums_pallas(
    xyb1: jax.Array, xyb2: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Fused per-scale sums for (B, 3, h, w) XYB inputs.

    Returns (B, 3, 6) f32: [sum d, sum d^4, sum art, sum art^4, sum det,
    sum det^4] over the h*w valid pixels (caller divides and takes roots).
    """
    bsz, ch, h, w = xyb1.shape
    assert ch == 3
    tile_h = min(TILE_H, _round_up(h, 8))
    tile_w = min(TILE_W, _round_up(w, 128))
    nth = -(-h // tile_h)
    ntw = -(-w // tile_w)
    # Padded plane: aligned zero halos around the tiled extent.
    hp = _ROW_HALO + nth * tile_h + _ROW_HALO
    wp = _COL_HALO + ntw * tile_w + _COL_HALO

    def pad(x):
        x = x.reshape(bsz * 3, h, w)
        return jnp.pad(
            x,
            (
                (0, 0),
                (_ROW_HALO, hp - h - _ROW_HALO),
                (_COL_HALO, wp - w - _COL_HALO),
            ),
        )

    p1 = pad(xyb1)
    p2 = pad(xyb2)
    taps = tuple(float(v) for v in gaussian_taps())

    kernel = functools.partial(
        _scale_stats_kernel, h=h, w=w, tile_h=tile_h, tile_w=tile_w, taps=taps
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz * 3, nth, ntw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 8), lambda p, th, tw: (p, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz * 3, 8, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _ROW_HALO, tile_w + 2 * _COL_HALO), jnp.float32),
            pltpu.VMEM((tile_h + 2 * _ROW_HALO, tile_w + 2 * _COL_HALO), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p1, p2)
    return out[:, 0, :6].reshape(bsz, 3, 6)


def _fused_scale_kernel(
    lin1_hbm,
    lin2_hbm,
    out_ref,
    t1,
    t2,
    sems,
    *,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    taps: tuple[float, ...],
):
    p = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    r = RADIUS

    row0 = pl.multiple_of(th * tile_h, 8)
    col0 = pl.multiple_of(tw * tile_w, 128)
    rows = tile_h + 2 * _ROW_HALO
    cols = tile_w + 2 * _COL_HALO
    dma1 = pltpu.make_async_copy(
        lin1_hbm.at[p, :, pl.ds(row0, rows), pl.ds(col0, cols)], t1, sems.at[0]
    )
    dma2 = pltpu.make_async_copy(
        lin2_hbm.at[p, :, pl.ds(row0, rows), pl.ds(col0, cols)], t2, sems.at[1]
    )
    dma1.start()
    dma2.start()
    dma1.wait()
    dma2.wait()

    tp = [jnp.float32(v) for v in taps]

    # Validity mask over the padded tile: out-of-image pixels must be exactly
    # zero in XYB space (the reference blurs zero-padded XYB planes).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=1)
    gr_ids = row_ids + row0 - _ROW_HALO
    gc_ids = col_ids + col0 - _COL_HALO
    valid = (
        (gr_ids >= 0) & (gr_ids < h) & (gc_ids >= 0) & (gc_ids < w)
    ).astype(jnp.float32)

    def opsin_mix(t, row):
        """cbrt(opsin mix) - bias_root for one matrix row (3 pows/image).

        Mosaic has no cbrt; pow(x, 1/3) alone costs ~1e-6 relative, so
        refine with one Newton step: y <- (2y + v/y^2)/3.  v >= the opsin
        bias > 0 everywhere (zero padding included), so division is safe.
        """
        m = OPSIN_ABSORBANCE_MATRIX
        bias = OPSIN_ABSORBANCE_BIAS
        root = OPSIN_ABSORBANCE_BIAS_ROOT
        third = np.float32(1.0 / 3.0)
        v = m[row, 0] * t[0] + m[row, 1] * t[1] + m[row, 2] * t[2] + bias
        v = jnp.maximum(v, 0.0)
        y0 = jnp.power(v, third)
        y1 = (np.float32(2.0) * y0 + v / (y0 * y0)) * third
        return y1 - root

    # rg/gr stay live across the channel loop (X and Y both need them);
    # bmix's cube root is only needed at c == 2 and is computed there.
    mixes = [(opsin_mix(t, 0), opsin_mix(t, 1)) for t in (t1, t2)]

    def xyb_channel(idx, c):
        rg, gr = mixes[idx]
        if c == 0:
            val = (rg - gr) * np.float32(0.5) * np.float32(14.0) + np.float32(0.42)
        elif c == 1:
            val = (rg + gr) * np.float32(0.5) + np.float32(0.01)
        else:
            y = (rg + gr) * np.float32(0.5)
            val = opsin_mix((t1, t2)[idx], 2) - y + np.float32(0.55)
        return val * valid

    # Each grid step writes its own partial-sums block (no block revisiting:
    # mixing a revisited accumulator with the moving ds output blocks
    # miscompiles on real TPUs — partials ping-pong between pipeline
    # buffers; the caller reduces over tiles instead).
    out_ref[...] = jnp.zeros_like(out_ref)

    one = jnp.float32(1.0)
    for c in range(3):
        a = xyb_channel(0, c)
        b = xyb_channel(1, c)
        blurred = []
        for q in (a, b, a * a, b * b, a * b):
            qw = _blur_w(q, tp, _COL_HALO - r, tile_w)
            blurred.append(_blur_h(qw, tp, _ROW_HALO - r, tile_h))
        mu1, mu2, s11, s22, s12 = blurred

        i1 = jax.lax.slice(
            a, (_ROW_HALO, _COL_HALO), (_ROW_HALO + tile_h, _COL_HALO + tile_w)
        )
        i2 = jax.lax.slice(
            b, (_ROW_HALO, _COL_HALO), (_ROW_HALO + tile_h, _COL_HALO + tile_w)
        )

        mu12 = mu1 * mu2
        mu_diff = mu1 - mu2
        num_m = one - mu_diff * mu_diff
        num_s = jnp.float32(2.0) * (s12 - mu12) + C2
        denom_s = (s11 - mu1 * mu1) + (s22 - mu2 * mu2) + C2
        d = jnp.maximum((denom_s - num_m * num_s) / denom_s, 0.0)

        aa = jnp.abs(i2 - mu2)
        bb2 = jnp.abs(i1 - mu1)
        d1 = (aa - bb2) / (one + bb2)
        art = jnp.maximum(d1, 0.0)
        det = jnp.maximum(-d1, 0.0)

        mask = jax.lax.slice(
            valid, (_ROW_HALO, _COL_HALO), (_ROW_HALO + tile_h, _COL_HALO + tile_w)
        )
        d = d * mask
        art = art * mask
        det = det * mask
        d2 = d * d
        art2 = art * art
        det2 = det * det
        partial = jnp.stack(
            [
                jnp.sum(d),
                jnp.sum(d2 * d2),
                jnp.sum(art),
                jnp.sum(art2 * art2),
                jnp.sum(det),
                jnp.sum(det2 * det2),
                jnp.float32(0.0),
                jnp.float32(0.0),
            ]
        )
        out_ref[0, 0, 0, c, :] = partial


def fused_scale_pallas(
    lin1: jax.Array,
    lin2: jax.Array,
    *,
    emit_ds: bool = False,
    interpret: bool = False,
):
    """One fused pass over a pyramid level: linear RGB in, sums out.

    ``lin1``/``lin2``: (B, 3, h, w) f32 linear RGB for the current scale.
    Returns (sums (B, 3, 6), None, None) — the next level's inputs come from
    the separate exact downscale kernel (ops/pallas/convert.py; an in-kernel
    downscale either rounds to bf16 on the MXU or blows the VMEM budget with
    HIGHEST-precision decomposition buffers).
    """
    del emit_ds  # kept for API compatibility
    bsz, ch, h, w = lin1.shape
    assert ch == 3
    tile_h = min(TILE_H, _round_up(h, 8))
    tile_w = min(TILE_W, _round_up(w, 128))
    nth = -(-h // tile_h)
    ntw = -(-w // tile_w)
    hp = _ROW_HALO + nth * tile_h + _ROW_HALO
    wp = _COL_HALO + ntw * tile_w + _COL_HALO

    def pad(x):
        return jnp.pad(
            x,
            (
                (0, 0),
                (0, 0),
                (_ROW_HALO, hp - h - _ROW_HALO),
                (_COL_HALO, wp - w - _COL_HALO),
            ),
        )

    p1 = pad(lin1)
    p2 = pad(lin2)
    taps = tuple(float(v) for v in gaussian_taps())

    kernel = functools.partial(
        _fused_scale_kernel, h=h, w=w, tile_h=tile_h, tile_w=tile_w, taps=taps
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nth, ntw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 8, 8),
            lambda p, th, tw: (p, th, tw, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nth, ntw, 8, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (3, tile_h + 2 * _ROW_HALO, tile_w + 2 * _COL_HALO), jnp.float32
            ),
            pltpu.VMEM(
                (3, tile_h + 2 * _ROW_HALO, tile_w + 2 * _COL_HALO), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(p1, p2)
    sums = out[:, :, :, :3, :6].sum(axis=(1, 2))  # reduce tile partials
    return sums, None, None


# ---------------------------------------------------------------------------
# v3: MXU blur passes + cross-step DMA double-buffering
# ---------------------------------------------------------------------------


def _fused_scale_kernel_v3(
    *refs,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    nth: int,
    ntw: int,
    bsz: int,
    taps: tuple[float, ...],
    w_pass: str,
    h_pass: str,
    precision: str,
    double_buffer: bool,
):
    # Unpack refs: inputs, optional band matrices, output, scratch, sems.
    it = iter(refs)
    lin1_hbm = next(it)
    lin2_hbm = next(it)
    wmat = next(it) if w_pass == "mxu" else None
    hmat = next(it) if h_pass == "mxu" else None
    out_ref = next(it)
    t1 = next(it)
    t2 = next(it)
    sems = next(it)

    p = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    r = RADIUS
    rows = tile_h + 2 * _ROW_HALO
    cols = tile_w + 2 * _COL_HALO
    prec = _PRECISIONS[precision]

    if double_buffer:
        nsteps = bsz * nth * ntw
        step = (p * nth + th) * ntw + tw

        def dma_pair(idx, slot):
            p_ = idx // (nth * ntw)
            rem = idx % (nth * ntw)
            row0 = pl.multiple_of((rem // ntw) * tile_h, 8)
            col0 = pl.multiple_of((rem % ntw) * tile_w, 128)
            d1 = pltpu.make_async_copy(
                lin1_hbm.at[p_, :, pl.ds(row0, rows), pl.ds(col0, cols)],
                t1.at[slot],
                sems.at[slot, 0],
            )
            d2 = pltpu.make_async_copy(
                lin2_hbm.at[p_, :, pl.ds(row0, rows), pl.ds(col0, cols)],
                t2.at[slot],
                sems.at[slot, 1],
            )
            return d1, d2

        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _():
            d1, d2 = dma_pair(step, slot)
            d1.start()
            d2.start()

        @pl.when(step + 1 < nsteps)
        def _():
            d1, d2 = dma_pair(step + 1, jax.lax.rem(step + 1, 2))
            d1.start()
            d2.start()

        d1, d2 = dma_pair(step, slot)
        d1.wait()
        d2.wait()
        a3 = t1[slot]
        b3 = t2[slot]
    else:
        row0 = pl.multiple_of(th * tile_h, 8)
        col0 = pl.multiple_of(tw * tile_w, 128)
        d1 = pltpu.make_async_copy(
            lin1_hbm.at[p, :, pl.ds(row0, rows), pl.ds(col0, cols)], t1, sems.at[0, 0]
        )
        d2 = pltpu.make_async_copy(
            lin2_hbm.at[p, :, pl.ds(row0, rows), pl.ds(col0, cols)], t2, sems.at[0, 1]
        )
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()
        a3 = t1[:]
        b3 = t2[:]

    row0 = pl.multiple_of(th * tile_h, 8)
    col0 = pl.multiple_of(tw * tile_w, 128)

    # Validity mask over the padded tile (zero XYB outside the image).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=1)
    gr_ids = row_ids + row0 - _ROW_HALO
    gc_ids = col_ids + col0 - _COL_HALO
    valid = (
        (gr_ids >= 0) & (gr_ids < h) & (gc_ids >= 0) & (gc_ids < w)
    ).astype(jnp.float32)

    def opsin_mix(t, row):
        m = OPSIN_ABSORBANCE_MATRIX
        bias = OPSIN_ABSORBANCE_BIAS
        root = OPSIN_ABSORBANCE_BIAS_ROOT
        third = np.float32(1.0 / 3.0)
        v = m[row, 0] * t[0] + m[row, 1] * t[1] + m[row, 2] * t[2] + bias
        v = jnp.maximum(v, 0.0)
        y0 = jnp.power(v, third)
        y1 = (np.float32(2.0) * y0 + v / (y0 * y0)) * third
        return y1 - root

    mixes = [(opsin_mix(t, 0), opsin_mix(t, 1)) for t in (a3, b3)]

    def xyb_channel(idx, c):
        rg, gr = mixes[idx]
        if c == 0:
            val = (rg - gr) * np.float32(0.5) * np.float32(14.0) + np.float32(0.42)
        elif c == 1:
            val = (rg + gr) * np.float32(0.5) + np.float32(0.01)
        else:
            y = (rg + gr) * np.float32(0.5)
            val = opsin_mix((a3, b3)[idx], 2) - y + np.float32(0.55)
        return val * valid

    tp = [jnp.float32(v) for v in taps]

    def blur(q):
        if w_pass == "mxu":
            qw = jax.lax.dot_general(
                q, wmat[...],
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
        else:
            qw = _blur_w(q, tp, _COL_HALO - r, tile_w)
        if h_pass == "mxu":
            return jax.lax.dot_general(
                hmat[...], qw,
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
        return _blur_h(qw, tp, _ROW_HALO - r, tile_h)

    out_ref[...] = jnp.zeros_like(out_ref)
    one = jnp.float32(1.0)
    for c in range(3):
        a = xyb_channel(0, c)
        b = xyb_channel(1, c)
        # 4 blurs instead of 5: the maps only ever use s11 + s22 (the SSIM
        # denominator sums the two centred variances), so blur(a^2) and
        # blur(b^2) collapse into one blur(a^2 + b^2) by linearity.
        mu1, mu2, s_sum, s12 = (blur(q) for q in (a, b, a * a + b * b, a * b))

        i1 = jax.lax.slice(
            a, (_ROW_HALO, _COL_HALO), (_ROW_HALO + tile_h, _COL_HALO + tile_w)
        )
        i2 = jax.lax.slice(
            b, (_ROW_HALO, _COL_HALO), (_ROW_HALO + tile_h, _COL_HALO + tile_w)
        )

        mu12 = mu1 * mu2
        mu_diff = mu1 - mu2
        num_m = one - mu_diff * mu_diff
        num_s = jnp.float32(2.0) * (s12 - mu12) + C2
        denom_s = (s_sum - mu1 * mu1 - mu2 * mu2) + C2
        d = jnp.maximum((denom_s - num_m * num_s) / denom_s, 0.0)

        aa = jnp.abs(i2 - mu2)
        bb2 = jnp.abs(i1 - mu1)
        d1m = (aa - bb2) / (one + bb2)
        art = jnp.maximum(d1m, 0.0)
        det = jnp.maximum(-d1m, 0.0)

        mask = jax.lax.slice(
            valid, (_ROW_HALO, _COL_HALO), (_ROW_HALO + tile_h, _COL_HALO + tile_w)
        )
        d = d * mask
        art = art * mask
        det = det * mask
        d2 = d * d
        art2 = art * art
        det2 = det * det
        partial = jnp.stack(
            [
                jnp.sum(d),
                jnp.sum(d2 * d2),
                jnp.sum(art),
                jnp.sum(art2 * art2),
                jnp.sum(det),
                jnp.sum(det2 * det2),
                jnp.float32(0.0),
                jnp.float32(0.0),
            ]
        )
        out_ref[0, 0, 0, c, :] = partial


def fused_scale_pallas_v3(
    lin1: jax.Array,
    lin2: jax.Array,
    *,
    tile_h: int | None = None,
    tile_w: int | None = None,
    w_pass: str = "vpu",
    h_pass: str = "mxu",
    precision: str = "highest",
    double_buffer: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Tunable fused scale kernel: blur passes on VPU or MXU (banded matmul),
    optional cross-step double-buffered input DMA.  Returns (B, 3, 6) sums.

    The MXU H pass replaces 11 sublane-rotated FMA sweeps with one banded
    matmul that overlaps the VPU map/XYB work; 'highest' keeps f32-exact
    6-pass products, 'high' uses the 3-pass bf16 decomposition (~1e-6 rel).
    """
    bsz, ch, h, w = lin1.shape
    assert ch == 3
    tile_h = tile_h or min(TILE_H, _round_up(h, 8))
    tile_h = min(tile_h, _round_up(h, 8))
    tile_w = tile_w or min(TILE_W, _round_up(w, 128))
    tile_w = min(tile_w, _round_up(w, 128))
    nth = -(-h // tile_h)
    ntw = -(-w // tile_w)
    hp = _ROW_HALO + nth * tile_h + _ROW_HALO
    wp = _COL_HALO + ntw * tile_w + _COL_HALO
    rows = tile_h + 2 * _ROW_HALO
    cols = tile_w + 2 * _COL_HALO

    def pad(x):
        return jnp.pad(
            x,
            (
                (0, 0),
                (0, 0),
                (_ROW_HALO, hp - h - _ROW_HALO),
                (_COL_HALO, wp - w - _COL_HALO),
            ),
        )

    p1 = pad(lin1)
    p2 = pad(lin2)
    taps = tuple(float(v) for v in gaussian_taps())
    r = RADIUS

    inputs = [p1, p2]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if w_pass == "mxu":
        inputs.append(jnp.asarray(_band_matrix_w(cols, tile_w, taps, _COL_HALO - r)))
        in_specs.append(
            pl.BlockSpec((cols, tile_w), lambda *_: (0, 0))
        )
    if h_pass == "mxu":
        inputs.append(jnp.asarray(_band_matrix_h(tile_h, rows, taps, _ROW_HALO - r)))
        in_specs.append(
            pl.BlockSpec((tile_h, rows), lambda *_: (0, 0))
        )

    nbuf = 2 if double_buffer else 1
    kernel = functools.partial(
        _fused_scale_kernel_v3,
        h=h,
        w=w,
        tile_h=tile_h,
        tile_w=tile_w,
        nth=nth,
        ntw=ntw,
        bsz=bsz,
        taps=taps,
        w_pass=w_pass,
        h_pass=h_pass,
        precision=precision,
        double_buffer=double_buffer,
    )
    scratch_in = (
        pltpu.VMEM((nbuf, 3, rows, cols), jnp.float32)
        if double_buffer
        else pltpu.VMEM((3, rows, cols), jnp.float32)
    )
    scratch_in2 = (
        pltpu.VMEM((nbuf, 3, rows, cols), jnp.float32)
        if double_buffer
        else pltpu.VMEM((3, rows, cols), jnp.float32)
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nth, ntw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, 1, 8, 8),
            lambda p, th, tw: (p, th, tw, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nth, ntw, 8, 8), jnp.float32),
        scratch_shapes=[
            scratch_in,
            scratch_in2,
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:, :, :, :3, :6].sum(axis=(1, 2))


def _pipelined_maps_mxuC(
    out_ref, xyb_channel, hmat2, wt2, pack_scr, int_scr,
    tile_h, tile_w, rows, cols, kappa, row0, col0, h, w,
    s_id, nsteps, nth, ntw, fastdiv="div", map_chunk=128, w_layout="t",
    interleave=True, mxu_sums=False,
):
    """Cross-tile software pipeline for the mxuC engine.

    At grid step ``s_id`` this emits, interleaved at trace order:
      * the CURRENT tile's splits + H + W band matmuls (MXU), whose blurred
        pack and interiors are stored to VMEM scratch slot ``s_id % 2``;
      * the PREVIOUS tile's maps + sums (pure VPU), read from scratch slot
        ``(s_id-1) % 2`` and written to the previous tile's row of the
        VMEM-resident sums output.

    The interleaving (one maps chunk per MXU dot, via _blur_pack_mxuC's
    ``tick``) puts independent MXU and VPU work adjacent in program order,
    inside Mosaic's scheduling window — measured on-chip, adjacent
    independent MXU/VPU work overlaps near-perfectly while program-order-
    distant work does not, which is why the monolithic kernel ran at ~1/3
    of its VPU issue bound (docs/PERFORMANCE.md round-3 analysis).

    Boundary handling is by clamping, not predication (pl.when regions
    would fence the scheduler): step 0 runs the maps on uninitialized
    scratch and writes sums row 0, which step 1 overwrites with the real
    tile-0 sums; the extra final step (grid is nsteps+1) re-runs tile
    nsteps-1's front half redundantly while emitting its maps.  Per-tile
    map math is identical to the non-pipelined mxuC engine, but the maps
    are always column-chunked (cw = map_chunk or 128 — chunking is what
    the interleaving needs), so with the monolithic default (map_chunk=0 =
    whole-tile chunks) sums differ by f32 summation-reorder noise (~2e-7
    rel), not bit-identically.
    """
    prev = jnp.maximum(s_id - 1, 0)
    prev_slot = jax.lax.rem(s_id + 1, 2)
    cur_slot = jax.lax.rem(s_id, 2)
    prem = jax.lax.rem(prev, nth * ntw)
    prow0 = (prem // ntw) * tile_h
    pcol0 = jax.lax.rem(prem, ntw) * tile_w
    mask = _interior_mask(tile_h, tile_w, prow0, pcol0, h, w)

    def bq(i):
        return pack_scr[prev_slot, pl.ds(i * tile_h, tile_h), :]

    def iq(i):
        return int_scr[prev_slot, pl.ds(i * tile_h, tile_h), :]

    def finish(all_accs):
        rows8 = [
            jnp.stack(
                [_fin_sum(a) for a in all_accs[c]] + [jnp.float32(0.0)] * 2
            )
            for c in range(3)
        ]
        blk = jnp.stack(rows8 + [jnp.zeros((8,), jnp.float32)] * 5)
        out_ref[prev] = blk

    ones_row = jnp.ones((1, tile_h), jnp.float32)

    def _sum(v):
        if not mxu_sums:
            return _partial_sum(v)
        r = jax.lax.dot_general(
            ones_row, v, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(r)

    cw = map_chunk or 128
    gen = _maps_sums_gen(
        bq, iq, mask, tile_h, tile_w, fastdiv, cw, _sum, finish
    )
    wt_nat, interiors = _blur_pack_mxuC(
        xyb_channel, hmat2, wt2, tile_h, tile_w, rows, cols,
        kappa, row0, col0, h, w, w_layout=w_layout,
        tick=gen if interleave else None,
    )
    for _ in gen:  # maps chunks not consumed by ticks
        pass
    pack_scr[cur_slot] = wt_nat
    int_scr[cur_slot] = jnp.concatenate(interiors, axis=0)


def _maps_and_sums_exact_mxu(
    out_ref, xyb_channel, hmatf, wtf, valid, tile_h, tile_w, rows, cols
):
    """All-HIGHEST packed MXU blur ('mxuX'): exact f32 blur with ZERO manual
    limb splits.

    Both separable passes ride the MXU at Precision.HIGHEST (Mosaic's own
    f32-exact decomposition), packed so each pass is a handful of large
    matmuls: H is ONE (tile_h, rows) x (rows, 12*cols) dot over the
    lane-packed quantities; W runs on the transposed pack in 128-output
    chunks whose 8-aligned windows need only 144 MACs/output — the shape
    discovery that makes HIGHEST affordable here where the lane-aligned
    320-MAC chunks (mxuP/highest) were not.  Compared to 'mxuC' this trades
    ~25% more (largely latency-hidden) MXU passes for all of the VPU limb
    splitting, exactness bookkeeping and the kappa rescale."""
    out_ref[...] = jnp.zeros_like(out_ref)
    one = jnp.float32(1.0)
    hmatf = hmatf[...]
    wtf = wtf[...]
    dims = (((1,), (0,)), ((), ()))

    def doth(a, b):
        return jax.lax.dot_general(
            a, b, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    xybs = []
    quantities = []
    for c in range(3):
        a = xyb_channel(0, c)
        b = xyb_channel(1, c)
        xybs.append((a, b))
        quantities += [a, b, a * a + b * b, a * b]

    pack = jnp.concatenate(quantities, axis=1)  # (rows, 12*cols)
    hp = doth(hmatf, pack)  # (tile_h, 12*cols)
    segs = [
        jax.lax.slice(hp, (0, i * cols), (tile_h, (i + 1) * cols))
        for i in range(12)
    ]
    pt = jnp.concatenate(segs, axis=0).T  # (cols, 12*tile_h)
    nq = 12 * tile_h
    chunks = []
    for j in range(tile_w // _WT_CHUNK):
        s = j * _WT_CHUNK + COL_HALO4 - 8
        win = jax.lax.slice(pt, (s, 0), (s + _WT_WIN, nq))
        chunks.append(doth(wtf, win))
    wt_nat = jnp.concatenate(chunks, axis=0).T  # (12*tile_h, tile_w)

    def bq(i):
        return jax.lax.slice(
            wt_nat, (i * tile_h, 0), ((i + 1) * tile_h, tile_w)
        )

    lo = (ROW_HALO4, COL_HALO4)
    hi_ = (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
    mask = jax.lax.slice(valid, lo, hi_)

    for c in range(3):
        a, b = xybs[c]
        mu1, mu2 = bq(4 * c), bq(4 * c + 1)
        s_sum, s12 = bq(4 * c + 2), bq(4 * c + 3)
        i1 = jax.lax.slice(a, lo, hi_)
        i2 = jax.lax.slice(b, lo, hi_)

        mu12 = mu1 * mu2
        mu_diff = mu1 - mu2
        num_m = one - mu_diff * mu_diff
        num_s = jnp.float32(2.0) * (s12 - mu12) + C2
        denom_s = (s_sum - mu1 * mu1 - mu2 * mu2) + C2
        d = jnp.maximum((denom_s - num_m * num_s) / denom_s, 0.0)

        aa = jnp.abs(i2 - mu2)
        bb2 = jnp.abs(i1 - mu1)
        d1m = (aa - bb2) / (one + bb2)
        art = jnp.maximum(d1m, 0.0)
        det = jnp.maximum(-d1m, 0.0)

        d = d * mask
        art = art * mask
        det = det * mask
        d2 = d * d
        art2 = art * art
        det2 = det * det
        out_ref[0, 0, 0, c, :] = jnp.stack(
            [
                jnp.sum(d),
                jnp.sum(d2 * d2),
                jnp.sum(art),
                jnp.sum(art2 * art2),
                jnp.sum(det),
                jnp.sum(det2 * det2),
                jnp.float32(0.0),
                jnp.float32(0.0),
            ]
        )


def _maps_and_sums_centered(
    out_ref, xyb_channel, blur_all, blur_exact, valid, tile_h, tile_w
):
    """Centered-statistics variant of _maps_and_sums: every blurred quantity
    is centered by a per-tile per-channel constant before the blur, and the
    maps are computed with the algebraically equivalent centered formulas.

    Why: the SSIM denominators/covariances are *differences* of blurred
    quantities (variance-scale results from full-scale inputs), so a blur
    engine with relative error eps produces map errors of eps * fullscale /
    variance — catastrophic amplification for the manual 3-pass bf16 MXU
    blur (eps ~ 1.5e-5, measured 0.01-0.03 at score level uncentered).
    Centering makes every blurred quantity (and every cancellation) scale
    with the LOCAL signal amplitude, so the same eps lands at ~1e-3 score
    level.  In exact arithmetic the formulas are identical for any choice of
    centers.

    The one quantity whose error would not shrink — blur(valid), whose
    (1 - bV) factor multiplies center-sized constants — goes through
    ``blur_exact`` (f32 lane-rotation VPU path; it is position-only data and
    exact there), so e = 1 - bV is exact and vanishes on interior tiles.
    """
    out_ref[...] = jnp.zeros_like(out_ref)
    one = jnp.float32(1.0)
    lo = (ROW_HALO4, COL_HALO4)
    hi = (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
    mask = jax.lax.slice(valid, lo, hi)
    bv = blur_exact(valid)  # (tile_h, tile_w), exact f32
    e = one - bv

    quantities = []
    xybs = []
    centers = []
    for c in range(3):
        a_full = xyb_channel(0, c)
        b_full = xyb_channel(1, c)
        # Any constant is algebraically exact; the tile mean keeps the
        # centered magnitudes (and the bf16 limb error) near the local
        # signal scale.
        c1 = jnp.mean(a_full)
        c2 = jnp.mean(b_full)
        at = (a_full - c1) * valid
        bt = (b_full - c2) * valid
        xybs.append((at, bt))
        centers.append((c1, c2))
        quantities += [at, bt, at * at + bt * bt, at * bt]
    blurred = blur_all(quantities)

    for c in range(3):
        at, bt = xybs[c]
        c1, c2 = centers[c]
        bA, bB, bS, bP = blurred[4 * c : 4 * c + 4]

        i1 = jax.lax.slice(at, lo, hi)
        i2 = jax.lax.slice(bt, lo, hi)

        # mu1 = bA + c1*bv, mu2 = bB + c2*bv (never formed: the maps only
        # need the centered combinations below).
        mu_diff = bA - bB + (c1 - c2) * bv
        num_m = one - mu_diff * mu_diff
        # s12 - mu1*mu2 (exact expansion; e = 1 - bv vanishes interior)
        cov = bP - bA * bB + e * (c2 * bA + c1 * bB) + (c1 * c2) * bv * e
        num_s = jnp.float32(2.0) * cov + C2
        # s_sum - mu1^2 - mu2^2
        var2 = (
            bS - bA * bA - bB * bB
            + e * (jnp.float32(2.0) * (c1 * bA + c2 * bB))
            + (c1 * c1 + c2 * c2) * bv * e
        )
        denom_s = var2 + C2
        d = jnp.maximum((denom_s - num_m * num_s) / denom_s, 0.0)

        # |i2 - mu2| with i2 = it2 + c2*mask, mu2 = bB + c2*bv
        aa = jnp.abs(i2 - bB + c2 * (mask - bv))
        bb2 = jnp.abs(i1 - bA + c1 * (mask - bv))
        d1m = (aa - bb2) / (one + bb2)
        art = jnp.maximum(d1m, 0.0)
        det = jnp.maximum(-d1m, 0.0)

        d = d * mask
        art = art * mask
        det = det * mask
        d2 = d * d
        art2 = art * art
        det2 = det * det
        out_ref[0, 0, 0, c, :] = jnp.stack(
            [
                jnp.sum(d),
                jnp.sum(d2 * d2),
                jnp.sum(art),
                jnp.sum(art2 * art2),
                jnp.sum(det),
                jnp.sum(det2 * det2),
                jnp.float32(0.0),
                jnp.float32(0.0),
            ]
        )
