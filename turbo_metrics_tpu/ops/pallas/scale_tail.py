"""Full-pyramid SSIMULACRA2 tail: levels 1-5 in ONE Pallas kernel.

The current composition runs scale 1 as a gridded v4 kernel (reading and
re-writing its level buffers through HBM) plus a whole-plane fused tail
for levels 2-5.  This kernel ingests the level-1 buffer the v5 scale-0
kernel emitted and runs ALL remaining levels in VMEM: each level is
processed in 64-row single-column tiles by a python loop (the
vif_tail.py scheme), reusing the mxuC consistent-limb machinery
(scale_stats._maps_and_sums_consistent with ``return_sums``) unchanged —
same band matrices, same kappa, same validity folding — so sub-scores
match the per-level kernels to f32 rounding.  Each level's exact 2x2-mean
downscale (edge-replicated odd dims, _emit_ds_tiles semantics) is stored
straight into the next level's VMEM plane.

Wins vs the per-level composition: no level-1 kernel launch, no HBM
round trips for the level-2..5 buffers, no zeros re-threading.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops.gaussian import RADIUS, gaussian_taps
from turbo_metrics_tpu.ops.pallas.scale_stats import (
    COL_HALO4,
    ROW_HALO4,
    OPSIN_ABSORBANCE_BIAS,
    OPSIN_ABSORBANCE_BIAS_ROOT,
    OPSIN_ABSORBANCE_MATRIX,
    _band_matrix_h,
    _cbrt_fast,
    _maps_and_sums_consistent,
    _mxuc_w_band,
    _pair_sum_cols,
    _round_up,
    _split_band_zs,
    _tapsum_kappa,
)

_TH = 64


def _tail2_dims(h1: int, w1: int):
    """Per-level (h, w, wpad, nth) for the 5 tail levels."""
    out = []
    h, w = h1, w1
    for _ in range(5):
        out.append((h, w, _round_up(w, 128), -(-h // _TH)))
        h, w = (h + 1) // 2, (w + 1) // 2
    return out


def tail2_ok(h1: int, w1: int, p12_shape) -> bool:
    """Geometry gate: single-column tiles per level, 256-aligned widths for
    the in-VMEM half-width emission, and the level-1 buffer must cover the
    whole-plane DMA window."""
    if min(h1, w1) < 48:
        return False
    dims = _tail2_dims(h1, w1)
    for li, (h, w, wpad, nth) in enumerate(dims):
        if wpad > 1024:
            return False
    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4
    return p12_shape[-2] >= rows1 and p12_shape[-1] >= cols1


def _tail2_kernel(
    p_hbm,
    hmat_ref,
    wt_ref,
    out_ref,
    t1,
    t2,
    pl2,
    pl3,
    pl4,
    pl5,
    sems,
    *,
    dims,
    kappa: float,
    bsz: int,
    needs_lvls=None,
):
    p = pl.program_id(0)
    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4

    def dma(idx, slot):
        d1 = pltpu.make_async_copy(
            p_hbm.at[0, idx, :, pl.ds(0, rows1), pl.ds(0, cols1)],
            t1.at[slot], sems.at[slot, 0],
        )
        d2 = pltpu.make_async_copy(
            p_hbm.at[1, idx, :, pl.ds(0, rows1), pl.ds(0, cols1)],
            t2.at[slot], sems.at[slot, 1],
        )
        return d1, d2

    slot = jax.lax.rem(p, 2)

    @pl.when(p == 0)
    def _():
        d1, d2 = dma(p, slot)
        d1.start()
        d2.start()

    @pl.when(p + 1 < bsz)
    def _():
        d1, d2 = dma(p + 1, jax.lax.rem(p + 1, 2))
        d1.start()
        d2.start()

    # Zero the level planes while the DMA flies: correct zero-extension
    # semantics AND NaN safety (0-coefficient matmul limbs still poison on
    # garbage VMEM).
    for buf in (pl2, pl3, pl4, pl5):
        buf[...] = jnp.zeros_like(buf)

    d1, d2 = dma(p, slot)
    d1.wait()
    d2.wait()

    hm = hmat_ref[...]  # (2, 64, 80) bf16 limbs
    wt = wt_ref[...]  # (2, 128, 144) bf16 limbs

    out_ref[...] = jnp.zeros_like(out_ref)
    planes = [None, pl2, pl3, pl4, pl5]
    for li, (h, w, wpad, nth) in enumerate(dims):
        cols = COL_HALO4 + wpad + COL_HALO4
        emit = li < len(dims) - 1
        if emit:
            h2n, w2n = dims[li + 1][0], dims[li + 1][1]
            nxt = planes[li + 1]
            dh = _TH // 2
            dw_p = _round_up(wpad // 2, 128)
        accs_lvl = [[jnp.float32(0.0)] * 6 for _ in range(3)]
        for t in range(nth):
            r0 = t * _TH
            if li == 0:
                a3 = t1[slot, :, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
                b3 = t2[slot, :, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
            else:
                src = planes[li]
                a3 = src[0, :, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
                b3 = src[1, :, pl.ds(r0, _TH + 16), pl.ds(0, cols)]

            def opsin_mix(t3, row):
                m = OPSIN_ABSORBANCE_MATRIX
                bias = OPSIN_ABSORBANCE_BIAS
                root = OPSIN_ABSORBANCE_BIAS_ROOT
                v = (
                    m[row, 0] * t3[0] + m[row, 1] * t3[1]
                    + m[row, 2] * t3[2] + bias
                )
                return _cbrt_fast(jnp.maximum(v, 0.0)) - root

            mixes = [(opsin_mix(t3, 0), opsin_mix(t3, 1)) for t3 in (a3, b3)]

            def xyb_channel(idx, c, masked=True):
                rg, gr = mixes[idx]
                if c == 0:
                    return (rg - gr) * np.float32(0.5) * np.float32(
                        14.0
                    ) + np.float32(0.42)
                if c == 1:
                    return (rg + gr) * np.float32(0.5) + np.float32(0.01)
                y = (rg + gr) * np.float32(0.5)
                return opsin_mix((a3, b3)[idx], 2) - y + np.float32(0.55)

            sums = _maps_and_sums_consistent(
                None, xyb_channel, hm, wt, _TH, wpad,
                _TH + 16, cols, kappa, r0, 0, h, w,
                return_sums=True,
                needs=needs_lvls[li] if needs_lvls is not None else None,
            )
            for c in range(3):
                for k in range(6):
                    accs_lvl[c][k] = accs_lvl[c][k] + sums[c][k]

            if emit:
                # _emit_ds_tiles semantics, stored straight to VMEM.
                rfac = jnp.float32(1.0)
                cfac = jnp.float32(1.0)
                if h % 2:
                    rid = (
                        jax.lax.broadcasted_iota(jnp.int32, (dh, dw_p), 0)
                        + r0 // 2
                    )
                    rfac = jnp.where(
                        rid == (h + 1) // 2 - 1,
                        jnp.float32(2.0), jnp.float32(1.0),
                    )
                if w % 2:
                    cid = jax.lax.broadcasted_iota(jnp.int32, (dh, dw_p), 1)
                    cfac = jnp.where(
                        cid == (w + 1) // 2 - 1,
                        jnp.float32(2.0), jnp.float32(1.0),
                    )
                rsums = []
                for img_idx, src3 in enumerate((a3, b3)):
                    for c in range(3):
                        q = jax.lax.slice(
                            src3,
                            (c, ROW_HALO4, COL_HALO4),
                            (c + 1, ROW_HALO4 + _TH, COL_HALO4 + wpad),
                        )[0]
                        rsums.append(q.reshape(dh, 2, wpad).sum(axis=1))
                # Same packed DS_ENGINE pair-sum as the scale-0 kernel
                # (limb3cp default: 8.35 vs 9.05 ms/b8 there, job 032).
                quad_all = _pair_sum_cols(
                    jnp.concatenate(rsums, axis=0), wpad, wpad // 2, dw_p
                )
                for img_idx in (0, 1):
                    for c in range(3):
                        slot_ = img_idx * 3 + c
                        quad = jax.lax.slice(
                            quad_all,
                            (slot_ * dh, 0),
                            (slot_ * dh + dh, dw_p),
                        )
                        ds_tile = quad * np.float32(0.25)
                        if h % 2 or w % 2:
                            ds_tile = ds_tile * rfac * cfac
                        nxt[
                            img_idx, c,
                            pl.ds(ROW_HALO4 + r0 // 2, dh),
                            pl.ds(COL_HALO4, dw_p),
                        ] = ds_tile
        for c in range(3):
            out_ref[0, li, c, :] = jnp.stack(
                accs_lvl[c] + [jnp.float32(0.0), jnp.float32(0.0)]
            )


def fused_pyramid_tail_pallas(
    p12: jax.Array, h1: int, w1: int, *, needs_lvls=None,
    interpret: bool = False,
) -> jax.Array:
    """Levels 1-5 sums from the scale-0 kernel's emitted level-1 buffer.
    Returns (B, 5, 3, 8) raw sums (norms_from_sums applies downstream)."""
    bsz = p12.shape[1]
    dims = _tail2_dims(h1, w1)
    assert tail2_ok(h1, w1, p12.shape), (p12.shape, dims)
    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4

    taps = tuple(float(v) for v in gaussian_taps())
    # Chunked bands (h16/t64): tight Toeplitz windows, same nonzero terms,
    # a fraction of the fat bands' MACs — the round-3 sweep that took the
    # scale-0 kernel from 10.5 to 9.1 ms/b8 (docs/PERFORMANCE.md); level
    # widths are 256-aligned (tail2_ok) so the 64-chunk W loop divides.
    # Zero-sum limbs (scale_stats._tap_limbs_zs) so the H band matches
    # _tapsum_kappa's limb sums and the BAND_LOLO-dropped cross terms stay
    # bias-free (the W band gets them via _mxuc_w_band).
    hmat2 = _split_band_zs(
        lambda tp: _band_matrix_h(16, 32, tp, ROW_HALO4 - RADIUS), taps
    )
    wt2 = _mxuc_w_band(taps, "t64")
    kappa = _tapsum_kappa(taps)

    scratch = [
        pltpu.VMEM((2, 3, rows1, cols1), jnp.float32),
        pltpu.VMEM((2, 3, rows1, cols1), jnp.float32),
    ]
    for li in range(1, 5):
        r = dims[li][3] * _TH + 16
        c = COL_HALO4 + dims[li][2] + COL_HALO4
        scratch.append(pltpu.VMEM((2, 3, r, c), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, 2)))

    kernel = functools.partial(
        _tail2_kernel, dims=dims, kappa=kappa, bsz=bsz,
        needs_lvls=needs_lvls,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(hmat2.shape, lambda p: (0, 0, 0)),
            pl.BlockSpec(wt2.shape, lambda p: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 5, 3, 8), lambda p: (p, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, 5, 3, 8), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p12, jnp.asarray(hmat2), jnp.asarray(wt2))
    return out
