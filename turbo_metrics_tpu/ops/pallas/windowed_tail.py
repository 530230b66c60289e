"""Fused MS-SSIM tail: levels 1-4 in ONE Pallas kernel.

The MS-SSIM chain (ops/pallas/windowed.py) runs one gridded kernel per
level; levels >= 1 are small enough that per-launch fixed costs and the
inter-level HBM round trips dominate.  This kernel ingests the level-1
buffer the level-0 kernel emitted (half-pooled, zero halos) and runs the
remaining levels entirely in VMEM, processing each level in 64-row tiles
by a python loop (the vif_tail.py scheme).  Unlike VIF there is no mirror
bookkeeping: the SSIM family uses zero-extension + the valid-correlation
mask, so the standard shared band matrices apply to every tile.

Each level emits the next level's input in-register: the exact 2x2-mean
half-pool with MS-SSIM's odd-dimension TRUNCATION (quality._downsample_2x2
— positions past (h//2, w//2) masked to zero, keeping the padded-chain
invariant).

Parity: tested against the per-level windowed kernels and the jnp
formulation (ops/quality.msssim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from turbo_metrics_tpu.ops.gaussian import gaussian_window
from turbo_metrics_tpu.ops.pallas.scale_stats import (
    COL_HALO4,
    ROW_HALO4,
    _band_matrix_h,
    _band_matrix_wt,
    _pair_sum_cols,
    _round_up,
    _split3,
    _split_band_zs,
    _split_bf16,
)
from turbo_metrics_tpu.ops.pallas.windowed import _C1, _C2, RADIUS

_TH = 64
_WT_CHUNK = 128
_WT_WIN = 144

# Round-5 rework: the tile loop is a lax.fori_loop (the body is traced ONCE
# per level instead of nth times), which collapses the register pressure
# that pinned this kernel at the w128 band — the w64 chunking that blew
# Mosaic's register allocator under the fully unrolled program (207 MB of
# spill slots, round-4 job 104) now compiles.  Knobs kept for A/B jobs:
# TAIL_W_CHUNK selects the W band (64 matches the windowed kernels'
# measured optimum), TAIL_FORI=0 restores the unrolled python loop.
TAIL_W_CHUNK = int(os.environ.get("TM_MSSSIM_TAIL_WCHUNK", "64"))
TAIL_FORI = os.environ.get("TM_MSSSIM_TAIL_FORI", "1") != "0"
_W_WINS = {128: 144, 64: 80}


def _tail_dims(h1: int, w1: int, levels: int):
    """Per-level (h, w, wpad, nth, nchunks); wpad 256-aligned so half-pool
    emission stays 128-aligned."""
    out = []
    h, w = h1, w1
    for _ in range(levels):
        wpad = _round_up(w, 256)
        out.append((h, w, wpad, -(-h // _TH), wpad // 128))
        h, w = h // 2, w // 2
    return out


def _msssim_tail_kernel(
    q12_hbm,
    hmat_ref,
    wmat_ref,
    out_ref,
    t1,
    t2,
    p2,
    p3,
    p4,
    sems,
    *,
    dims,
    bsz: int,
    limb: bool = False,
    kappa=None,
):
    p = pl.program_id(0)

    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4

    def dma(idx, slot):
        d1 = pltpu.make_async_copy(
            q12_hbm.at[0, idx, :, pl.ds(0, rows1), pl.ds(0, cols1)],
            t1.at[slot], sems.at[slot, 0],
        )
        d2 = pltpu.make_async_copy(
            q12_hbm.at[1, idx, :, pl.ds(0, rows1), pl.ds(0, cols1)],
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

    for buf in (p2, p3, p4):
        if buf is not None:
            buf[...] = jnp.zeros_like(buf)  # NaN safety for halo reads

    d1, d2 = dma(p, slot)
    d1.wait()
    d2.wait()

    dims_dot = (((1,), (0,)), ((), ()))

    def doth(x, y):
        return jax.lax.dot_general(
            x, y, dims_dot, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    def dotb(x, y):
        return jax.lax.dot_general(
            x, y, dims_dot, preferred_element_type=jnp.float32
        )

    hmat = hmat_ref[...]
    wmat = wmat_ref[...]
    two = jnp.float32(2.0)
    nlev = len(dims)
    planes = [None, (p2,), (p3,), (p4,)]
    for li, (h, w, wpad, nth, nc) in enumerate(dims):
        cols = COL_HALO4 + wpad + COL_HALO4
        emit = li < nlev - 1
        if emit:
            h2, w2 = dims[li + 1][0], dims[li + 1][1]
            nxt = planes[li + 1][0]
            dwp = wpad // 2

        def tile_body(t, accs, li=li, h=h, w=w, wpad=wpad, emit=emit,
                      nxt=planes[li + 1][0] if emit else None,
                      dwp=wpad // 2,
                      h2=dims[li + 1][0] if emit else 0,
                      w2=dims[li + 1][1] if emit else 0):
            cols = COL_HALO4 + wpad + COL_HALO4
            r0 = pl.multiple_of(t * _TH, _TH)
            if li == 0:
                a3 = t1[slot, :, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
                b3 = t2[slot, :, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
            else:
                src = planes[li][0]
                a3 = src[0, :, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
                b3 = src[1, :, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
            if limb:
                # Consistent-limb blurs (windowed.WIN_LIMB; pool means are
                # 2^-k-granular code values, exact 2-limb splits).
                vals, prods = [], []
                for c in range(3):
                    a = jax.lax.slice(
                        a3, (c, 0, 0), (c + 1, _TH + 16, cols))[0]
                    b = jax.lax.slice(
                        b3, (c, 0, 0), (c + 1, _TH + 16, cols))[0]
                    a0, a1 = _split_bf16(a)
                    b0, b1 = _split_bf16(b)
                    av = a0.astype(jnp.float32) + a1.astype(jnp.float32)
                    bv = b0.astype(jnp.float32) + b1.astype(jnp.float32)
                    vals += [(a0, a1), (b0, b1)]
                    prods += [av * av + bv * bv, av * bv]
                pa0 = jnp.concatenate([v[0] for v in vals], axis=1)
                pa1 = jnp.concatenate([v[1] for v in vals], axis=1)
                q3_ = [_split3(q) for q in prods]
                pb0 = jnp.concatenate([q[0] for q in q3_], axis=1)
                pb1 = jnp.concatenate([q[1] for q in q3_], axis=1)
                pb2 = jnp.concatenate([q[2] for q in q3_], axis=1)
                hm0, hm1 = hmat[0], hmat[1]
                hch, hwin = hm0.shape

                def hdot(s):
                    def slc(t):
                        return jax.lax.slice(t, (s, 0), (s + hwin, 6 * cols))

                    ha_ = (
                        dotb(hm0, slc(pa0))
                        + dotb(hm0, slc(pa1))
                        + dotb(hm1, slc(pa0))
                    )
                    hb_ = (
                        dotb(hm0, slc(pb0))
                        + dotb(hm0, slc(pb1))
                        + dotb(hm0, slc(pb2))
                        + dotb(hm1, slc(pb0))
                    )
                    return ha_, hb_

                if hch < _TH:
                    parts = [hdot(ci * hch) for ci in range(_TH // hch)]
                    ha = jnp.concatenate([p[0] for p in parts], axis=0)
                    hb = jnp.concatenate([p[1] for p in parts], axis=0)
                else:
                    ha, hb = hdot(0)
                segs = []
                for c in range(3):
                    segs += [
                        jax.lax.slice(ha, (0, (2 * c + i) * cols),
                                      (_TH, (2 * c + i + 1) * cols))
                        for i in range(2)
                    ] + [
                        jax.lax.slice(hb, (0, (2 * c + i) * cols),
                                      (_TH, (2 * c + i + 1) * cols))
                        for i in range(2)
                    ]
                pt = jnp.concatenate(segs, axis=0).T  # (cols, 12*64)
                t0_, t1_, t2_ = _split3(pt)
                w0, w1 = wmat[0], wmat[1]
                wch, wwin = w0.shape
                chunks = []
                for q in range(wpad // wch):
                    s = q * wch + COL_HALO4 - 8

                    def sl(t, s=s):
                        return jax.lax.slice(t, (s, 0), (s + wwin, 12 * _TH))

                    x0, x1, x2 = sl(t0_), sl(t1_), sl(t2_)
                    chunks.append(
                        dotb(w0, x0) + dotb(w0, x1)
                        + dotb(w0, x2) + dotb(w1, x0)
                    )
                wt = (
                    jnp.concatenate(chunks, axis=0).T * jnp.float32(kappa)
                )  # (12*64, wpad)
            else:
                qs = []
                for c in range(3):
                    a = jax.lax.slice(
                        a3, (c, 0, 0), (c + 1, _TH + 16, cols))[0]
                    b = jax.lax.slice(
                        b3, (c, 0, 0), (c + 1, _TH + 16, cols))[0]
                    qs += [a, b, a * a + b * b, a * b]
                pack = jnp.concatenate(qs, axis=1)  # (80, 12*cols)
                hch, hwin = hmat.shape
                if hch < _TH:
                    # Chunked Toeplitz H window (see windowed.py H_CHUNK).
                    hcs = []
                    for ci in range(_TH // hch):
                        s = ci * hch
                        hcs.append(
                            doth(
                                hmat,
                                jax.lax.slice(
                                    pack, (s, 0), (s + hwin, 12 * cols)),
                            )
                        )
                    hp_ = jnp.concatenate(hcs, axis=0)  # (64, 12*cols)
                else:
                    hp_ = doth(hmat, pack)  # (64, 12*cols)
                segs = [
                    jax.lax.slice(hp_, (0, i * cols), (_TH, (i + 1) * cols))
                    for i in range(12)
                ]
                pt = jnp.concatenate(segs, axis=0).T  # (cols, 12*64)
                wch, wwin = wmat.shape
                chunks = []
                for q in range(wpad // wch):
                    s = q * wch + COL_HALO4 - 8
                    win = jax.lax.slice(pt, (s, 0), (s + wwin, 12 * _TH))
                    chunks.append(doth(wmat, win))
                wt = jnp.concatenate(chunks, axis=0).T  # (12*64, wpad)

            def bq(i, _wt=wt, _wpad=wpad):
                return jax.lax.slice(
                    _wt, (i * _TH, 0), ((i + 1) * _TH, _wpad)
                )

            mri = (
                jax.lax.broadcasted_iota(jnp.int32, (_TH, wpad), 0) + r0
            )
            mci = jax.lax.broadcasted_iota(jnp.int32, (_TH, wpad), 1)
            mask = (
                (mri >= RADIUS) & (mri < h - RADIUS)
                & (mci >= RADIUS) & (mci < w - RADIUS)
            ).astype(jnp.float32)
            accs = list(accs)
            for c in range(3):
                mu1, mu2 = bq(4 * c), bq(4 * c + 1)
                s_sum, s12 = bq(4 * c + 2), bq(4 * c + 3)
                mu1sq = mu1 * mu1
                mu2sq = mu2 * mu2
                mu12 = mu1 * mu2
                lum = (two * mu12 + _C1) / (mu1sq + mu2sq + _C1)
                cs = (two * (s12 - mu12) + _C2) / (
                    (s_sum - mu1sq - mu2sq) + _C2
                )
                accs[2 * c] = accs[2 * c] + jnp.sum(lum * cs * mask)
                accs[2 * c + 1] = accs[2 * c + 1] + jnp.sum(cs * mask)

            if emit:
                dh = _TH // 2
                rid2 = (
                    jax.lax.broadcasted_iota(jnp.int32, (dh, dwp), 0)
                    + r0 // 2
                )
                cid2 = jax.lax.broadcasted_iota(jnp.int32, (dh, dwp), 1)
                keep = ((rid2 < h2) & (cid2 < w2)).astype(jnp.float32)
                quarter = np.float32(0.25)
                # Packed column pair-sum (scale_stats._pair_sum_cols /
                # DS_ENGINE): all six planes' row sums in ONE tall operand
                # — the per-plane dense HIGHEST one-hot matmul this
                # replaces cost more MXU cycles than the whole W blur.
                rsums = []
                for src3 in (a3, b3):
                    for c in range(3):
                        q = jax.lax.slice(
                            src3,
                            (c, ROW_HALO4, COL_HALO4),
                            (c + 1, ROW_HALO4 + _TH, COL_HALO4 + wpad),
                        )[0]
                        rsums.append(q.reshape(dh, 2, wpad).sum(axis=1))
                packed = jnp.concatenate(rsums, axis=0)  # (6*dh, wpad)
                quad_all = _pair_sum_cols(packed, wpad, dwp, dwp)
                for img_idx in (0, 1):
                    for c in range(3):
                        slot_ = img_idx * 3 + c
                        quad = jax.lax.slice(
                            quad_all, (slot_ * dh, 0), (slot_ * dh + dh, dwp)
                        )
                        # r0//2 = 32*t and ROW_HALO4 = 8, but Mosaic cannot
                        # prove 8-alignment through the div when t is the
                        # fori_loop carry — hint it (on-chip compile failure
                        # otherwise: "index in dimension 2" job 202).
                        nxt[
                            img_idx, c,
                            pl.ds(pl.multiple_of(ROW_HALO4 + r0 // 2, 8), dh),
                            pl.ds(COL_HALO4, dwp),
                        ] = quad * quarter * keep
            return tuple(accs)

        accs = (jnp.float32(0.0),) * 6  # (lum*cs, cs) x 3 channels
        if TAIL_FORI:
            accs = jax.lax.fori_loop(0, nth, tile_body, accs)
        else:
            for t in range(nth):
                accs = tile_body(t, accs)
        for c in range(3):
            out_ref[0, li, c, :] = jnp.stack(
                [accs[2 * c], accs[2 * c + 1]] + [jnp.float32(0.0)] * 6
            )


def msssim_tail_ok(h1: int, w1: int, q12_shape) -> bool:
    if min(h1, w1) < 48:
        return False
    dims = _tail_dims(h1, w1, 4)
    if dims[-1][0] < 2 * RADIUS + 1 or dims[-1][1] < 2 * RADIUS + 1:
        return False
    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4
    return q12_shape[-2] >= rows1 and q12_shape[-1] >= cols1


def msssim_tail_pallas(
    q12: jax.Array, h1: int, w1: int, *, levels: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Per-channel (sum(lum*cs), sum(cs)) for MS-SSIM levels 1..levels from
    the level-0 kernel's emitted buffer.  Returns (B, levels, 3, 2)."""
    bsz = q12.shape[1]
    dims = _tail_dims(h1, w1, levels)
    assert msssim_tail_ok(h1, w1, q12.shape), (q12.shape, dims)
    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4

    taps = tuple(float(t) for t in gaussian_window(11, 1.5))
    from turbo_metrics_tpu.ops.pallas import windowed as _wd

    hch = _wd.H_CHUNK if _wd.H_CHUNK and _TH % _wd.H_CHUNK == 0 else _TH

    def _hbuild(tp):
        return _band_matrix_h(
            min(hch, _TH), min(hch, _TH) + 16, tp, ROW_HALO4 - RADIUS
        )

    limb = _wd.WIN_LIMB
    kappa = _wd._kappa_ssim() if limb else None
    hmat = _split_band_zs(_hbuild, taps) if limb else _hbuild(taps)
    # W band: under the round-4 fully-unrolled program this was pinned at
    # the 128-chunk band (64-chunks doubled the unrolled matmul count and
    # blew Mosaic's register allocator — 207 MB of spill slots, on-chip
    # compile failure, job 104).  The fori_loop tile body (TAIL_FORI)
    # removed that wall; TAIL_W_CHUNK picks the band, decoupled from
    # windowed.W_CHUNK so A/B jobs can sweep it independently.
    # (wpad is 256-aligned at every level, so any chunk in _W_WINS divides.)
    wch = TAIL_W_CHUNK if TAIL_W_CHUNK in _W_WINS else _WT_CHUNK
    if limb:
        wmat = _split_band_zs(
            lambda tp: _band_matrix_wt(tp, wch, _W_WINS[wch]), taps
        )
    else:
        wmat = _band_matrix_wt(taps, wch, _W_WINS[wch])

    scratch = [
        pltpu.VMEM((2, 3, rows1, cols1), jnp.float32),
        pltpu.VMEM((2, 3, rows1, cols1), jnp.float32),
    ]
    for li in range(1, levels):
        r = dims[li][3] * _TH + 16
        c = COL_HALO4 + dims[li][2] + COL_HALO4
        scratch.append(pltpu.VMEM((2, 3, r, c), jnp.float32))
    while len(scratch) < 5:
        scratch.append(None)

    kernel = functools.partial(
        _msssim_tail_kernel, dims=dims, bsz=bsz, limb=limb, kappa=kappa,
    )

    def _k(q12_hbm, hm, wm, out_ref, t1, t2, *rest):
        sems = rest[-1]
        bufs = list(rest[:-1]) + [None] * (3 - (len(rest) - 1))
        return kernel(
            q12_hbm, hm, wm, out_ref, t1, t2,
            bufs[0], bufs[1], bufs[2], sems,
        )

    out = pl.pallas_call(
        _k,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(hmat.shape, lambda p: (0,) * hmat.ndim),
            pl.BlockSpec(wmat.shape, lambda p: (0,) * wmat.ndim),
        ],
        out_specs=pl.BlockSpec((1, levels, 3, 8), lambda p: (p, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, levels, 3, 8), jnp.float32),
        scratch_shapes=[s for s in scratch if s is not None]
        + [pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q12, jnp.asarray(hmat), jnp.asarray(wmat))
    return out[..., :2]
