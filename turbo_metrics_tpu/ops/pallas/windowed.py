"""SSIM / MS-SSIM windowed statistics as a fused Pallas megakernel.

The classic SSIM family (Wang et al.; the reference computes these via
NVIDIA NPP — cudarse-npp/src/lib.rs — and never optimises them) needs five
11-tap separable Gaussian correlations per channel plus a light map.  The
plain jnp formulation (ops/quality.py) is HBM-bound at 1080p: every tap is
a full-array shifted multiply-add, ~43 ms for batch 8.  Lowering the
correlations to `lax.conv_general_dilated` is WORSE on TPU (measured 378 ms
+ OOM: XLA pads the singleton feature dim of a depthwise 1-D conv 128x,
see docs/PERFORMANCE.md "windowed-metric lowering").

This kernel reuses the SSIMULACRA2 megakernel's discoveries wholesale
(ops/pallas/scale_stats.py): the same padded layout (pad_geom4 /
pad_to_layout4), the same 11-tap geometry (SSIM's gaussian_window(11,1.5)
has the same radius as SSIMULACRA2's blur), the s11+s22 linearity collapse
(blur(a^2+b^2) in one pass), the lane-packed HIGHEST H matmul and the
transposed-pack 144-MAC W chunks ('mxuX' engine) — so each (ref, dis) tile
costs ONE HBM read and the blur rides the MXU f32-exactly with no limb
bookkeeping.  Per tile the kernel emits channelwise sums of the SSIM map
(luminance*cs) and of cs alone (MS-SSIM pools cs at all but the last
level); the tiny per-tile partials are reduced outside.

Validity here is the *valid-correlation* convention (window fully inside
the image), not SSIMULACRA2's zero-extension: map centers are masked to
[R, h-R) x [R, w-R) and no input masking is needed at all — every surviving
center only ever sees in-image samples.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops.gaussian import gaussian_window
from turbo_metrics_tpu.ops.pallas.scale_stats import (
    COL_HALO4,
    ROW_HALO4,
    _WT_CHUNK,
    _WT_WIN,
    _band_matrix_h,
    _band_matrix_wt,
    _round_up,
    _split3,
    _split_band_zs,
    _split_bf16,
    _tap_limbs_zs,
    ds_buffer_hw,
    pad_geom4,
    pad_to_layout4,
)

# Consistent-limb blurs instead of Precision.HIGHEST (the scale_stats mxuC
# scheme; see ops/pallas/vif.py for the numeric argument): SSIM-family
# inputs are 8-bit code values (level 0, in-kernel quantized or
# pre-quantized) or their 2^-k-granular pool means (MS-SSIM levels), so the
# 2-limb value split is exact and the 3-limb product split is exact to
# level 3 (2^-24 rel at level 4, vs C2 = 58.5).  The zero-sum band limbs +
# kappa keep the effective tap sum exact for both data limbs.  H pass
# 72 -> 42 bf16 unit-dots per chunk, W pass 72 -> 48.
WIN_LIMB = os.environ.get("TM_WIN_LIMB", "1") != "0"


def _kappa_ssim() -> np.float32:
    taps = tuple(float(t) for t in gaussian_window(11, 1.5))
    hi, lo = _tap_limbs_zs(taps)
    sf = np.asarray(taps, np.float32).astype(np.float64).sum()
    return np.float32((sf / (hi + lo).sum()) ** 2)

RADIUS = 5  # gaussian_window(11, 1.5)
# Wang et al. stabilisers at 8-bit dynamic range (match ops/quality.py).
_C1 = np.float32((0.01 * 255.0) ** 2)
_C2 = np.float32((0.03 * 255.0) ** 2)

# Chunked Toeplitz blur bands (round-3 discovery, scale_stats.py): the band
# matrices are Toeplitz, so one tiny window matrix serves every output
# chunk with the same nonzero terms as the fat band at a fraction of its
# MACs — H: (32, 48) instead of (tile_h, tile_h+16); W: (64, 80) instead
# of (128, 144) = 45% fewer.  Exact: the windows contain identical terms
# (HIGHEST f32 matmuls; sums reorder at ~1e-7 rel).  On-chip sweep at
# 1080p b8 (job 107, identical scores): SSIM 8.76 (h16/w128) -> 7.16
# (h16/w64) -> 6.98 (h32/w64); MS-SSIM 14.47 -> 12.92.  h32/w64 is the
# default; fat paths stay selectable for A/B (h_chunk=0 / w_chunk=128).
H_CHUNK = 32
W_CHUNK = 64
_W_WINS = {128: _WT_WIN, 64: 80, 32: 48}


def _emit_halfpool_tiles(
    ds_ref, ds_store, ds_sems, get_plane, *,
    p, row0, col0, tile_h, tile_w, h, w,
):
    """Exact 2x2-mean half-pool of the tile into the next MS-SSIM level's
    padded buffer.  MS-SSIM TRUNCATES odd dims before halving (quality.
    _downsample_2x2), so emitted positions past (h//2, w//2) are zeroed —
    keeping the next level's halos exactly zero (the padded-chain
    invariant) — instead of scale_stats._emit_ds_tiles' ceil-half
    edge-replication."""
    dh, dw = tile_h // 2, tile_w // 2
    dh_p = _round_up(dh, 8)
    dw_p = _round_up(dw, 128)
    s_cols = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_w, dw_p), dimension=0) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (tile_w, dw_p), dimension=1)
    ).astype(jnp.float32)
    h2, w2 = h // 2, w // 2
    rid = jax.lax.broadcasted_iota(jnp.int32, (dh_p, dw_p), 0) + row0 // 2
    cid = jax.lax.broadcasted_iota(jnp.int32, (dh_p, dw_p), 1) + col0 // 2
    keep = ((rid < h2) & (cid < w2)).astype(jnp.float32)

    copies = []
    for img_idx in (0, 1):
        for c in range(3):
            q = get_plane(img_idx, c)
            rsum = q.reshape(dh, 2, tile_w).sum(axis=1)
            if dh_p != dh:
                rsum = jnp.pad(rsum, ((0, dh_p - dh), (0, 0)))
            quad = jax.lax.dot_general(
                rsum, s_cols,
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            ds_store[img_idx * 3 + c] = quad * np.float32(0.25) * keep
            dst_r = pl.multiple_of(ROW_HALO4 + row0 // 2, 8)
            dst_c = pl.multiple_of(COL_HALO4 + col0 // 2, 128)
            cp = pltpu.make_async_copy(
                ds_store.at[img_idx * 3 + c],
                ds_ref.at[
                    img_idx, p, c, pl.ds(dst_r, dh_p), pl.ds(dst_c, dw_p)
                ],
                ds_sems.at[img_idx, c],
            )
            cp.start()
            copies.append(cp)
    return copies


def _ssim_kernel(
    *refs,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    nth: int,
    ntw: int,
    bsz: int,
    emit_ds: bool,
    quantize: bool,
    limb: bool = False,
    kappa=None,
):
    it = iter(refs)
    q12_hbm = next(it)  # (2, B, 3, hp, wp) f32 code values
    hmat = next(it)  # (tile_h, rows) fat or (H_CHUNK, H_CHUNK+16) band
    wmat = next(it)  # (chunk, win) transposed-W band
    if emit_ds:
        _z = next(it)  # zeros-aliased ds buffer (consumed via the output)
    out_ref = next(it)  # (1, 1, 1, 8, 8) per-tile sums block
    ds_ref = next(it) if emit_ds else None  # (2, B, 3, hp2, wp2)
    t1 = next(it)  # VMEM (2 slots, 3, rows, cols)
    t2 = next(it)
    sems = next(it)  # DMA (2, 2)
    ds_store = next(it) if emit_ds else None  # (6, dh_p, dw_p)
    ds_sems = next(it) if emit_ds else None

    p = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4

    # Cross-step double-buffered input DMA (same scheme as the v4 kernel).
    nsteps = bsz * nth * ntw
    step = (p * nth + th) * ntw + tw

    def dma_pair(idx, slot):
        p_ = idx // (nth * ntw)
        rem = idx % (nth * ntw)
        row0_ = pl.multiple_of((rem // ntw) * tile_h, 8)
        col0_ = pl.multiple_of((rem % ntw) * tile_w, 128)
        d1 = pltpu.make_async_copy(
            q12_hbm.at[0, p_, :, pl.ds(row0_, rows), pl.ds(col0_, cols)],
            t1.at[slot],
            sems.at[slot, 0],
        )
        d2 = pltpu.make_async_copy(
            q12_hbm.at[1, p_, :, pl.ds(row0_, rows), pl.ds(col0_, cols)],
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
    a3 = t1[slot]  # (3, rows, cols)
    b3 = t2[slot]
    if quantize:
        # In-kernel 8-bit quantization of linear RGB in [0, 1] (the
        # engine's multi-metric padded fast path feeds the conversion
        # kernel's output directly): identical to ops/quality.py's
        # clip(round(lin*255)) staging pass, without materialising the
        # quantized pair in HBM.  Zero halos stay exactly zero.
        a3 = jnp.clip(jnp.round(a3 * np.float32(255.0)), 0.0, 255.0)
        b3 = jnp.clip(jnp.round(b3 * np.float32(255.0)), 0.0, 255.0)

    row0 = pl.multiple_of(th * tile_h, 8)
    col0 = pl.multiple_of(tw * tile_w, 128)

    ds_copies = []
    if emit_ds:
        def get_plane(img_idx, c):
            return jax.lax.slice(
                (a3, b3)[img_idx],
                (c, ROW_HALO4, COL_HALO4),
                (c + 1, ROW_HALO4 + tile_h, COL_HALO4 + tile_w),
            )[0]

        ds_copies = _emit_halfpool_tiles(
            ds_ref, ds_store, ds_sems, get_plane,
            p=p, row0=row0, col0=col0, tile_h=tile_h, tile_w=tile_w,
            h=h, w=w,
        )

    dims = (((1,), (0,)), ((), ()))

    def doth(x, y):
        return jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    nq = 12 * tile_h
    wch, wwin = wmat.shape[-2], wmat.shape[-1]
    if limb:
        # Consistent-limb blurs (WIN_LIMB): exact 2-limb values, exact
        # 3-limb products of the consistent values, zero-sum band limbs.
        vals, prods = [], []
        for c in range(3):
            a = jax.lax.slice(a3, (c, 0, 0), (c + 1, rows, cols))[0]
            b = jax.lax.slice(b3, (c, 0, 0), (c + 1, rows, cols))[0]
            a0, a1 = _split_bf16(a)
            b0, b1 = _split_bf16(b)
            av = a0.astype(jnp.float32) + a1.astype(jnp.float32)
            bv = b0.astype(jnp.float32) + b1.astype(jnp.float32)
            vals += [(a0, a1), (b0, b1)]
            prods += [av * av + bv * bv, av * bv]
        pa0 = jnp.concatenate([v[0] for v in vals], axis=1)  # (rows, 6*cols)
        pa1 = jnp.concatenate([v[1] for v in vals], axis=1)
        q3 = [_split3(q) for q in prods]
        pb0 = jnp.concatenate([q[0] for q in q3], axis=1)
        pb1 = jnp.concatenate([q[1] for q in q3], axis=1)
        pb2 = jnp.concatenate([q[2] for q in q3], axis=1)
        hm0, hm1 = hmat[0], hmat[1]
        hch, hwin = hm0.shape

        def dotb(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32
            )

        def hdot(s):
            def slc(t):
                return jax.lax.slice(t, (s, 0), (s + hwin, 6 * cols))

            ha = (
                dotb(hm0, slc(pa0))
                + dotb(hm0, slc(pa1))
                + dotb(hm1, slc(pa0))
            )
            hb = (
                dotb(hm0, slc(pb0))
                + dotb(hm0, slc(pb1))
                + dotb(hm0, slc(pb2))
                + dotb(hm1, slc(pb0))
            )
            return ha, hb

        if hch < tile_h:
            parts = [hdot(ci * hch) for ci in range(tile_h // hch)]
            ha = jnp.concatenate([p[0] for p in parts], axis=0)
            hb = jnp.concatenate([p[1] for p in parts], axis=0)
        else:
            ha, hb = hdot(0)
        segs = []
        for c in range(3):  # restore the [a, b, ss, s12]-per-channel order
            segs += [
                jax.lax.slice(ha, (0, (2 * c + i) * cols),
                              (tile_h, (2 * c + i + 1) * cols))
                for i in range(2)
            ] + [
                jax.lax.slice(hb, (0, (2 * c + i) * cols),
                              (tile_h, (2 * c + i + 1) * cols))
                for i in range(2)
            ]
        pt = jnp.concatenate(segs, axis=0).T  # (cols, 12*tile_h)
        t0, t1, t2 = _split3(pt)
        w0, w1 = wmat[0], wmat[1]
        chunks = []
        for j in range(tile_w // wch):
            s = j * wch + COL_HALO4 - 8

            def sl(t, s=s):
                return jax.lax.slice(t, (s, 0), (s + wwin, nq))

            x0, x1, x2 = sl(t0), sl(t1), sl(t2)
            chunks.append(
                dotb(w0, x0) + dotb(w0, x1) + dotb(w0, x2) + dotb(w1, x0)
            )
        wt_nat = jnp.concatenate(chunks, axis=0).T * jnp.float32(kappa)
    else:
        # 4 blur quantities per channel (s11+s22 collapsed by linearity).
        qs = []
        for c in range(3):
            a = jax.lax.slice(a3, (c, 0, 0), (c + 1, rows, cols))[0]
            b = jax.lax.slice(b3, (c, 0, 0), (c + 1, rows, cols))[0]
            qs += [a, b, a * a + b * b, a * b]

        pack = jnp.concatenate(qs, axis=1)  # (rows, 12*cols)
        hmatf = hmat[...]
        hch, hwin = hmat.shape
        if hch < tile_h:
            # Chunked Toeplitz H pass: one (hch, hch+16) window serves every
            # output-row chunk (same nonzero terms as the fat band).
            hcs = []
            for ci in range(tile_h // hch):
                s = ci * hch
                hcs.append(
                    doth(hmatf, jax.lax.slice(pack, (s, 0), (s + hwin, 12 * cols)))
                )
            hp_ = jnp.concatenate(hcs, axis=0)  # (tile_h, 12*cols)
        else:
            hp_ = doth(hmatf, pack)  # (tile_h, 12*cols)
        segs = [
            jax.lax.slice(hp_, (0, i * cols), (tile_h, (i + 1) * cols))
            for i in range(12)
        ]
        pt = jnp.concatenate(segs, axis=0).T  # (cols, 12*tile_h)
        wmatf = wmat[...]
        chunks = []
        for j in range(tile_w // wch):
            s = j * wch + COL_HALO4 - 8
            win = jax.lax.slice(pt, (s, 0), (s + wwin, nq))
            chunks.append(doth(wmatf, win))
        wt_nat = jnp.concatenate(chunks, axis=0).T  # (12*tile_h, tile_w)

    def bq(i):
        return jax.lax.slice(
            wt_nat, (i * tile_h, 0), ((i + 1) * tile_h, tile_w)
        )

    # Valid-correlation mask: the 11x11 window must sit fully inside.
    mri = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + row0
    mci = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + col0
    mask = (
        (mri >= RADIUS) & (mri < h - RADIUS)
        & (mci >= RADIUS) & (mci < w - RADIUS)
    ).astype(jnp.float32)

    out_ref[...] = jnp.zeros_like(out_ref)
    two = jnp.float32(2.0)
    for c in range(3):
        mu1, mu2 = bq(4 * c), bq(4 * c + 1)
        s_sum, s12 = bq(4 * c + 2), bq(4 * c + 3)
        mu1sq = mu1 * mu1
        mu2sq = mu2 * mu2
        mu12 = mu1 * mu2
        lum = (two * mu12 + _C1) / (mu1sq + mu2sq + _C1)
        cs = (two * (s12 - mu12) + _C2) / ((s_sum - mu1sq - mu2sq) + _C2)
        lc = lum * cs * mask
        csm = cs * mask
        out_ref[0, 0, 0, c, :] = jnp.stack(
            [jnp.sum(lc), jnp.sum(csm)] + [jnp.float32(0.0)] * 6
        )

    for cp in ds_copies:
        cp.wait()


def ssim_sums_pallas(
    q12: jax.Array, h: int, w: int, *, emit_ds: bool = False,
    interpret: bool = False, h_chunk: int | None = None,
    w_chunk: int | None = None, quantize: bool = False,
    ds_buf: jax.Array | None = None,
):
    """Per-channel (sum(luminance*cs), sum(cs)) over the valid grid.

    ``q12``: (2, B, 3, hp, wp) padded code values (pad_to_layout4 layout);
    with ``quantize``, padded LINEAR RGB in [0, 1] instead — quantized to
    8-bit code values in-kernel (the multi-metric padded fast path).
    Returns ((B, 3, 2) f32 sums, ds12) where ds12 is the next MS-SSIM
    level's (2, B, 3, hp2, wp2) padded input (2x2-mean, odd dims
    truncated) when ``emit_ds``, else None.  The valid-position count is
    (h - 2*RADIUS) * (w - 2*RADIUS).
    """
    two, bsz = q12.shape[0], q12.shape[1]
    assert two == 2
    tile_h, tile_w, nth, ntw, hp, wp = pad_geom4(h, w)
    # An emitted buffer (ds_buffer_hw) may be larger than this level's
    # minimal layout; the slack rows/cols are zero and never read.
    assert q12.shape[-2] >= hp and q12.shape[-1] >= wp, (q12.shape, hp, wp)
    assert not (emit_ds and nth > 1 and tile_h % 16)
    assert not (emit_ds and ntw > 1 and tile_w % 256), (
        "half-pool destination DMA needs 128-aligned columns"
    )
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4
    taps = tuple(float(t) for t in gaussian_window(11, 1.5))

    hch = H_CHUNK if h_chunk is None else h_chunk
    wch = W_CHUNK if w_chunk is None else w_chunk
    if hch and tile_h % hch == 0 and tile_h > hch:
        def _hbuild(tp):
            return _band_matrix_h(
                hch, hch + 2 * ROW_HALO4, tp, ROW_HALO4 - RADIUS
            )
    else:
        def _hbuild(tp):
            return _band_matrix_h(tile_h, rows, tp, ROW_HALO4 - RADIUS)

    wwin = _W_WINS[wch]
    limb = WIN_LIMB
    kappa = _kappa_ssim() if limb else None
    if limb:
        hmat = _split_band_zs(_hbuild, taps)
        wmat = _split_band_zs(lambda tp: _band_matrix_wt(tp, wch, wwin), taps)
    else:
        hmat = _hbuild(taps)
        wmat = _band_matrix_wt(taps, wch, wwin)

    def _bspec(m):
        n = m.ndim
        return pl.BlockSpec(m.shape, lambda p, th, tw: (0,) * n)

    inputs = [q12, jnp.asarray(hmat), jnp.asarray(wmat)]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        _bspec(hmat),
        _bspec(wmat),
    ]
    out_shapes = [jax.ShapeDtypeStruct((bsz, nth, ntw, 8, 8), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 1, 1, 8, 8), lambda p, th, tw: (p, th, tw, 0, 0))
    ]
    scratch = [
        pltpu.VMEM((2, 3, rows, cols), jnp.float32),
        pltpu.VMEM((2, 3, rows, cols), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    aliases = {}
    if emit_ds:
        # Sized to cover BOTH the emitting grid's staging extent and the
        # next level's tile grid (scale_stats.ds_buffer_hw); MS-SSIM's
        # truncated dims (h//2) are <= ds_buffer_hw's ceil-half extent.
        # ``ds_buf``: a caller-threaded (donated) buffer whose
        # never-written slack is already zero — skips re-materialising
        # the zeros every step (the aliased output forces XLA to refill
        # a fresh-constant buffer each execution otherwise).
        hp2, wp2 = ds_buffer_hw(h, w)
        dh_p = _round_up(tile_h // 2, 8)
        dw_p = _round_up(tile_w // 2, 128)
        if ds_buf is not None:
            assert ds_buf.shape == (2, bsz, 3, hp2, wp2), (
                ds_buf.shape, (2, bsz, 3, hp2, wp2)
            )
            inputs.append(ds_buf)
        else:
            inputs.append(jnp.zeros((2, bsz, 3, hp2, wp2), jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(
            jax.ShapeDtypeStruct((2, bsz, 3, hp2, wp2), jnp.float32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        aliases = {len(inputs) - 1: 1}
        scratch += [
            pltpu.VMEM((6, dh_p, dw_p), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ]

    kernel = functools.partial(
        _ssim_kernel,
        h=h, w=w, tile_h=tile_h, tile_w=tile_w,
        nth=nth, ntw=ntw, bsz=bsz, emit_ds=emit_ds, quantize=quantize,
        limb=limb, kappa=kappa,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, nth, ntw),
        in_specs=in_specs,
        out_specs=out_specs if emit_ds else out_specs[0],
        out_shape=out_shapes if emit_ds else out_shapes[0],
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if emit_ds:
        out, ds12 = outs
    else:
        out, ds12 = outs, None
    return out[:, :, :, :3, :2].sum(axis=(1, 2)), ds12  # (B, 3, 2)


def _means(sums: jax.Array, h: int, w: int):
    count = np.float32(3 * (h - 2 * RADIUS) * (w - 2 * RADIUS))
    return (
        sums[:, :, 0].sum(axis=-1) / count,
        sums[:, :, 1].sum(axis=-1) / count,
    )


def ssim_level(
    a: jax.Array, b: jax.Array, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """(mean(luminance*cs), mean(cs)) over channels+valid grid for one level.

    a, b: (B, 3, H, W) f32 code values.  Drop-in for the jnp formulation's
    per-level means (ops/quality.py) up to f32 summation order.
    """
    h, w = a.shape[-2], a.shape[-1]
    q12 = pad_to_layout4(jnp.stack([a, b]), h, w)
    return ssim_level_padded(q12, h, w, interpret=interpret)


def ssim_level_padded(
    q12: jax.Array, h: int, w: int, *, quantize: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """ssim_level on an already-padded (2, B, 3, hp, wp) buffer — the
    engine's multi-metric fast path consumes the fused conversion kernel's
    output directly (``quantize``: linear RGB in, 8-bit quantization
    in-kernel)."""
    sums, _ = ssim_sums_pallas(
        q12, h, w, interpret=interpret, quantize=quantize
    )
    return _means(sums, h, w)


def msssim_level_means(
    a: jax.Array, b: jax.Array, levels: int, *, interpret: bool = False
) -> list[tuple[jax.Array, jax.Array]]:
    """Per-level (mean(luminance*cs), mean(cs)) for the MS-SSIM chain.

    One padded-chain pass: level 0 pads once, every level emits the next
    level's 2x2-mean (odd-truncated) padded input in-kernel — no jnp.pad
    or downsample ops between levels (the jnp chain's inter-level
    pad+pool cost ~doubled MS-SSIM's step time on chip)."""
    h, w = a.shape[-2], a.shape[-1]
    q12 = pad_to_layout4(jnp.stack([a, b]), h, w)
    return msssim_level_means_padded(q12, h, w, levels, interpret=interpret)


def msssim_ds_buffer_shape(h: int, w: int, bsz: int) -> tuple:
    """Shape of the level-0 emit buffer msssim_level_means_padded threads
    (for callers that donate it through steps, e.g. the engine)."""
    hp2, wp2 = ds_buffer_hw(h, w)
    return (2, bsz, 3, hp2, wp2)


def msssim_level_means_padded(
    q12: jax.Array, h: int, w: int, levels: int, *,
    quantize: bool = False, interpret: bool = False,
    ds_buf: jax.Array | None = None,
) -> list[tuple[jax.Array, jax.Array]]:
    """msssim_level_means on an already-padded (2, B, 3, hp, wp) buffer.

    ``quantize`` applies only to level 0 (deeper levels consume the
    emitted 2x2 means of the already-quantized values, matching
    quality._downsample_2x2's semantics).  ``ds_buf``: optional threaded
    level-0 emit buffer (msssim_ds_buffer_shape) — callers that loop
    steps should donate it and reuse the emitted buffer (ds12, returned
    as per_level's attribute via the chain) to skip per-step zero fills;
    levels 1-4 live in VMEM when the fused tail engages."""
    ds0 = None
    if levels > 1:
        from turbo_metrics_tpu.ops.pallas.windowed_tail import (
            msssim_tail_ok,
            msssim_tail_pallas,
        )

        sums0, ds12 = ssim_sums_pallas(
            q12, h, w, emit_ds=True, interpret=interpret, quantize=quantize,
            ds_buf=ds_buf,
        )
        ds0 = ds12
        h1, w1 = h // 2, w // 2
        if levels == 5 and msssim_tail_ok(h1, w1, ds12.shape):
            # Levels 1-4 in one kernel (windowed_tail.py) — kills the
            # per-level launch + HBM round-trip costs of the small levels.
            tail = msssim_tail_pallas(ds12, h1, w1, interpret=interpret)
            out = [_means(sums0, h, w)]
            lh, lw = h1, w1
            for li in range(4):
                out.append(_means(tail[:, li], lh, lw))
                lh, lw = lh // 2, lw // 2
            return (out, ds0) if ds_buf is not None else out
        out = [_means(sums0, h, w)]
        q12, h, w = ds12, h1, w1
        start = 1
    else:
        out, start = [], 0
    for lvl in range(start, levels):
        sums, ds12 = ssim_sums_pallas(
            q12, h, w, emit_ds=lvl < levels - 1, interpret=interpret,
            quantize=quantize and lvl == 0,
        )
        out.append(_means(sums, h, w))
        if lvl < levels - 1:
            q12 = ds12
            h, w = h // 2, w // 2
    return (out, ds0) if ds_buf is not None else out
