"""Fused Pallas VIF (4-scale) megakernel.

The jnp formulation (ops/vif.py) is HBM-bound: the 17-tap scale-0 window
alone is 34 full-array shifted FMAs x 5 blur quantities (measured
30.7 ms/batch-8 at 1080p — VMAF's dominant cost).  This kernel reuses the
SSIMULACRA2/windowed machinery (ops/pallas/scale_stats.py): padded tile
layout, banded-matrix H pass on the MXU (f32-exact HIGHEST), transposed
128-chunk W pass (the 17-tap radius-8 window exactly fills the standard
144-wide chunk window), per-tile num/den partial sums, and in-kernel
emission of the next scale's input.

VIF specifics vs the SSIM kernel:

* Borders are libvmaf's reflect-101 (refimpl/vif.py), not zero-extension
  or valid-correlation.  The halo region of the padded layout is
  mirror-filled host-side (``_pad_reflect_layout`` / ``_mirror_halos``)
  so in-kernel plain band matrices produce exactly the mirrored blur for
  every in-image center; only radius <= 8 = ROW_HALO4 columns/rows of the
  halo are needed.
* The next scale's input is decimate2(blur(x, win_{k+1})) with the NEXT
  scale's window applied at THIS scale's resolution (libvmaf vif.c /
  vifp_mscale.m convention, see ops/vif.py docstring) — so each emitting
  scale blurs TWO quantity groups: 5 with window A (its own) for the
  statistics, 2 with window B (the next scale's) for the emission.
  Decimation keeps even rows/cols: an exact [1,0] row fold plus a one-hot
  even-column matmul.

Reference parity: ops/vif.py == libvmaf float VIF conventions; this kernel
is tested against both the jnp path and the f64 oracle
(turbo_metrics_tpu/refimpl/vif.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops.pallas.scale_stats import (
    COL_HALO4,
    ROW_HALO4,
    TILE_H4,
    TILE_W4,
    _band_matrix_h,
    _round_up,
    _split3,
    _split_band_zs,
    _split_bf16,
    _tap_limbs_zs,
)

# Consistent-limb blurs (the scale_stats mxuC scheme) instead of
# Precision.HIGHEST: VMAF-path luma is integer-valued in 8-bit units
# (<= 255.75 at 10-bit), so the 2-limb value split and the 3-limb product
# split are EXACT on the data; the only perturbation is the 2-limb bf16
# band taps (2^-17, tap-sum matched by kappa), and the blur(q) - mu^2
# variance cancellation makes that a relative-to-local-variance error —
# measured VIF score parity ~1e-6 vs the HIGHEST path (tolerance 2e-4).
# Cost: stats H pass 30 -> 18 bf16 unit-dots, W pass 30 -> 20, emission
# 12 -> 7 per tile.
VIF_LIMB = os.environ.get("TM_VIF_LIMB", "1") != "0"


def _kappa2(taps) -> np.float32:
    """(sf / s2l)^2 post-blur rescale matching the 2-limb bf16 taps' sum to
    the f32 taps' (cf. scale_stats._tapsum_kappa; one factor per separable
    pass, H and W use the same window).  Computed from the same zero-sum
    limbs the bands are built from."""
    hi, lo = _tap_limbs_zs(taps)
    sf = np.asarray(taps, np.float32).astype(np.float64).sum()
    return np.float32((sf / (hi + lo).sum()) ** 2)

_WT_CHUNK = 128
_WT_WIN = 144  # fits radius-8 (17-tap) windows exactly: 127 + 8 + 8 + 1

# Chunked Toeplitz bands (round-3 scale_stats discovery, exact at HIGHEST):
# H (16, 32) instead of (tile_h, tile_h+16); W (64, 80) instead of
# (128, 144) — the radius-8 window exactly fills both (16+16=32, 64+8+8=80).
# Fat paths selectable for A/B (H_CHUNK=0 / W_CHUNK=128).
H_CHUNK = 16
W_CHUNK = 64
_W_WINS = {128: 144, 64: 80}


def _band_wt(taps, chunk: int = _WT_CHUNK, win: int = _WT_WIN) -> np.ndarray:
    """Transposed-W-pass band matrix for an arbitrary odd window (the
    scale_stats version hardcodes the 11-tap radius): chunk j yields
    blurred cols [chunk*j, chunk*(j+1)) from transposed-input rows
    starting at chunk*j + COL_HALO4 - 8."""
    r_ = len(taps) // 2
    assert r_ <= 8 and chunk + 8 + r_ <= win
    m = np.zeros((chunk, win), np.float32)
    rr = np.arange(chunk)
    for k, t in enumerate(taps):
        m[rr, rr + 8 - r_ + k] = np.float32(t)
    return m

SIGMA_NSQ = np.float32(2.0)
EPS = np.float32(1e-10)
NUM_SCALES = 4
_RADII = (8, 4, 2, 1)  # vif_window(k) has 2^(4-k)+1 taps


def _vif_geom(h: int, w: int) -> tuple[int, int, int, int, int, int]:
    """pad_geom4-style geometry constrained so emit_ds is always legal:
    multi-tile rows need tile_h % 16 == 0 (64 always is) and multi-tile
    columns need tile_w % 256 == 0 (the half-tile DMA destination must be
    128-aligned)."""
    tile_h = min(TILE_H4, _round_up(h, 8))
    wr = _round_up(w, 128)
    if wr <= TILE_W4:
        tile_w, ntw = wr, 1
    else:
        best = None
        for n in range(2, -(-w // 128) + 1):
            t = _round_up(-(-w // n), 256)
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


def _vif_ds_hw(h: int, w: int) -> tuple[int, int]:
    """Emitted-buffer extent: covers this scale's staging writes and the
    next scale's tile grid (cf. scale_stats.ds_buffer_hw)."""
    tile_h, tile_w, nth, ntw, _, _ = _vif_geom(h, w)
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    t2h, t2w, n2h, n2w, _, _ = _vif_geom(h2, w2)
    dh, dw = tile_h // 2, tile_w // 2
    dh_p, dw_p = _round_up(dh, 8), _round_up(dw, 128)
    hp2 = ROW_HALO4 + max(n2h * t2h, (nth - 1) * dh + dh_p) + ROW_HALO4
    wp2 = COL_HALO4 + max(n2w * t2w, (ntw - 1) * dw + dw_p) + COL_HALO4
    return hp2, wp2


def _pad_reflect_layout(x: jax.Array, h: int, w: int, r: int) -> jax.Array:
    """(..., h, w) -> (..., hp, wp): r-px reflect-101 halo, zeros beyond."""
    _, _, _, _, hp, wp = _vif_geom(h, w)
    lead = [(0, 0)] * (x.ndim - 2)
    xr = jnp.pad(x, lead + [(r, r), (r, r)], mode="reflect")
    return jnp.pad(
        xr,
        lead
        + [
            (ROW_HALO4 - r, hp - h - ROW_HALO4 - r),
            (COL_HALO4 - r, wp - w - COL_HALO4 - r),
        ],
    )


def _mirror_halos(buf: jax.Array, h: int, w: int, r: int) -> jax.Array:
    """Fill an r-px reflect-101 halo around the (h, w) image stored at
    (ROW_HALO4, COL_HALO4) in ``buf`` (..., hp, wp).  Rows first, then
    columns over the row-filled buffer, so corners come out right."""
    R, C = ROW_HALO4, COL_HALO4
    buf = buf.at[..., R - r : R, :].set(buf[..., R + 1 : R + 1 + r, :][..., ::-1, :])
    buf = buf.at[..., R + h : R + h + r, :].set(
        buf[..., R + h - 1 - r : R + h - 1, :][..., ::-1, :]
    )
    buf = buf.at[..., :, C - r : C].set(buf[..., :, C + 1 : C + 1 + r][..., ::-1])
    buf = buf.at[..., :, C + w : C + w + r].set(
        buf[..., :, C + w - 1 - r : C + w - 1][..., ::-1]
    )
    return buf


def _vif_kernel(
    *refs,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    nth: int,
    ntw: int,
    bsz: int,
    emit_ds: bool,
    limb: bool = False,
    kappa_a=None,
    kappa_b=None,
):
    it = iter(refs)
    q12_hbm = next(it)  # (2, B, hp, wp) f32, mirror-filled halos
    hmat_a = next(it)  # (tile_h, rows)
    wmat_a = next(it)  # (_WT_CHUNK, _WT_WIN)
    if emit_ds:
        hmat_b = next(it)
        wmat_b = next(it)
        _z = next(it)  # zeros-aliased ds buffer (consumed via the output)
    out_ref = next(it)  # (1, 1, 1, 8, 8)
    ds_ref = next(it) if emit_ds else None  # (2, B, hp2, wp2)
    t1 = next(it)  # VMEM (2, rows, cols)
    t2 = next(it)
    sems = next(it)  # DMA (2, 2)
    ds_store = next(it) if emit_ds else None  # (2, dh_p, dw_p)
    ds_sems = next(it) if emit_ds else None  # DMA (2,)

    p = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4

    nsteps = bsz * nth * ntw
    step = (p * nth + th) * ntw + tw

    def dma_pair(idx, slot):
        p_ = idx // (nth * ntw)
        rem = idx % (nth * ntw)
        row0_ = pl.multiple_of((rem // ntw) * tile_h, 8)
        col0_ = pl.multiple_of((rem % ntw) * tile_w, 128)
        d1 = pltpu.make_async_copy(
            q12_hbm.at[0, p_, pl.ds(row0_, rows), pl.ds(col0_, cols)],
            t1.at[slot],
            sems.at[slot, 0],
        )
        d2 = pltpu.make_async_copy(
            q12_hbm.at[1, p_, pl.ds(row0_, rows), pl.ds(col0_, cols)],
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
    a = t1[slot]  # (rows, cols)
    b = t2[slot]

    row0 = pl.multiple_of(th * tile_h, 8)
    col0 = pl.multiple_of(tw * tile_w, 128)

    dims = (((1,), (0,)), ((), ()))

    def doth(x, y):
        return jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    def blur_group(qs, hmat, wmat):
        nq = len(qs)
        pack = jnp.concatenate(qs, axis=1)  # (rows, nq*cols)
        hm = hmat[...]
        hch, hwin = hmat.shape
        if hch < tile_h:
            # Chunked Toeplitz H window (see windowed.py H_CHUNK).
            hcs = []
            for ci in range(tile_h // hch):
                s = ci * hch
                hcs.append(
                    doth(hm, jax.lax.slice(pack, (s, 0), (s + hwin, nq * cols)))
                )
            hp_ = jnp.concatenate(hcs, axis=0)  # (tile_h, nq*cols)
        else:
            hp_ = doth(hm, pack)  # (tile_h, nq*cols)
        segs = [
            jax.lax.slice(hp_, (0, i * cols), (tile_h, (i + 1) * cols))
            for i in range(nq)
        ]
        pt = jnp.concatenate(segs, axis=0).T  # (cols, nq*tile_h)
        wm = wmat[...]
        wch, wwin = wmat.shape
        chunks = []
        for j in range(tile_w // wch):
            s = j * wch + COL_HALO4 - 8
            win = jax.lax.slice(pt, (s, 0), (s + wwin, nq * tile_h))
            chunks.append(doth(wm, win))
        wt_nat = jnp.concatenate(chunks, axis=0).T  # (nq*tile_h, tile_w)
        return [
            jax.lax.slice(wt_nat, (i * tile_h, 0), ((i + 1) * tile_h, tile_w))
            for i in range(nq)
        ]

    def dotb(x, y):
        return jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32
        )

    if limb:
        a0, a1 = _split_bf16(a)
        b0, b1 = _split_bf16(b)
        av = a0.astype(jnp.float32) + a1.astype(jnp.float32)
        bv = b0.astype(jnp.float32) + b1.astype(jnp.float32)

    def blur_group_limb(hmat2, wmat2, kappa):
        """Consistent-limb stats blur (see VIF_LIMB): values from their
        exact 2-limb splits, products of the consistent values from exact
        3-limb splits, 2-limb bf16 bands with the lo x lo terms dropped."""
        pa0 = jnp.concatenate([a0, b0], axis=1)  # (rows, 2*cols) bf16
        pa1 = jnp.concatenate([a1, b1], axis=1)
        q3 = [_split3(q) for q in (av * av, bv * bv, av * bv)]
        pb0 = jnp.concatenate([q[0] for q in q3], axis=1)  # (rows, 3*cols)
        pb1 = jnp.concatenate([q[1] for q in q3], axis=1)
        pb2 = jnp.concatenate([q[2] for q in q3], axis=1)
        hm0, hm1 = hmat2[0], hmat2[1]
        hch, hwin = hm0.shape

        def hdot(s):
            def slc(t, n):
                return jax.lax.slice(t, (s, 0), (s + hwin, n * cols))

            ha = (
                dotb(hm0, slc(pa0, 2))
                + dotb(hm0, slc(pa1, 2))
                + dotb(hm1, slc(pa0, 2))
            )
            hb = (
                dotb(hm0, slc(pb0, 3))
                + dotb(hm0, slc(pb1, 3))
                + dotb(hm0, slc(pb2, 3))
                + dotb(hm1, slc(pb0, 3))
            )
            return ha, hb

        if hch < tile_h:
            parts = [hdot(ci * hch) for ci in range(tile_h // hch)]
            ha = jnp.concatenate([p[0] for p in parts], axis=0)
            hb = jnp.concatenate([p[1] for p in parts], axis=0)
        else:
            ha, hb = hdot(0)
        segs = [
            jax.lax.slice(ha, (0, i * cols), (tile_h, (i + 1) * cols))
            for i in range(2)
        ] + [
            jax.lax.slice(hb, (0, i * cols), (tile_h, (i + 1) * cols))
            for i in range(3)
        ]
        pt = jnp.concatenate(segs, axis=0).T  # (cols, 5*tile_h)
        t0, t1, t2 = _split3(pt)
        w0, w1 = wmat2[0], wmat2[1]
        wch, wwin = w0.shape
        chunks = []
        for j in range(tile_w // wch):
            s = j * wch + COL_HALO4 - 8

            def sl(t, s=s):
                return jax.lax.slice(t, (s, 0), (s + wwin, 5 * tile_h))

            x0, x1, x2 = sl(t0), sl(t1), sl(t2)
            chunks.append(
                dotb(w0, x0) + dotb(w0, x1) + dotb(w0, x2) + dotb(w1, x0)
            )
        wt_nat = jnp.concatenate(chunks, axis=0).T * kappa
        return [
            jax.lax.slice(wt_nat, (i * tile_h, 0), ((i + 1) * tile_h, tile_w))
            for i in range(5)
        ]

    if limb:
        mu1, mu2, br2, bd2, brd = blur_group_limb(
            hmat_a, wmat_a, jnp.float32(kappa_a)
        )
    else:
        mu1, mu2, br2, bd2, brd = blur_group(
            [a, b, a * a, b * b, a * b], hmat_a, wmat_a
        )

    def blur_group_dec(qs, hmat, wmat):
        """Emission blur with the decimation FOLDED INTO THE BANDS: the H
        band keeps only EVEN output rows and the transposed W band only
        EVEN output columns, so each kept output is the exact same taps
        dotted with the exact same window as full-res-blur-then-decimate
        (bit-identical) at half the blur MACs — and the one-hot
        even-column selection matmul (which cost about as many MXU cycles
        as the whole W blur pass) disappears entirely."""
        nq = len(qs)
        dh = tile_h // 2
        pack = jnp.concatenate(qs, axis=1)
        hm = hmat[...]
        hch2, hwin = hmat.shape  # decimated: (hch//2, hch+16)
        hch_ = 2 * hch2
        if hch_ < tile_h:
            hcs = []
            for ci in range(tile_h // hch_):
                s = ci * hch_
                hcs.append(
                    doth(hm, jax.lax.slice(pack, (s, 0), (s + hwin, nq * cols)))
                )
            hp_ = jnp.concatenate(hcs, axis=0)  # (dh, nq*cols)
        else:
            hp_ = doth(hm, pack)
        segs = [
            jax.lax.slice(hp_, (0, i * cols), (dh, (i + 1) * cols))
            for i in range(nq)
        ]
        pt = jnp.concatenate(segs, axis=0).T  # (cols, nq*dh)
        wm = wmat[...]
        wch2, wwin = wmat.shape  # decimated: (wch//2, win)
        wch_ = 2 * wch2
        chunks = []
        for j in range(tile_w // wch_):
            s = j * wch_ + COL_HALO4 - 8
            win = jax.lax.slice(pt, (s, 0), (s + wwin, nq * dh))
            chunks.append(doth(wm, win))
        wt_nat = jnp.concatenate(chunks, axis=0).T  # (nq*dh, tile_w//2)
        return [
            jax.lax.slice(wt_nat, (i * dh, 0), ((i + 1) * dh, tile_w // 2))
            for i in range(nq)
        ]

    def blur_group_dec_limb(hmat2, wmat2, kappa):
        """Decimation-folded emission blur on the consistent limbs (bands
        keep even output rows / columns; see blur_group_dec)."""
        dh = tile_h // 2
        pa0 = jnp.concatenate([a0, b0], axis=1)  # (rows, 2*cols) bf16
        pa1 = jnp.concatenate([a1, b1], axis=1)
        hm0, hm1 = hmat2[0], hmat2[1]
        hch2, hwin = hm0.shape  # decimated: (hch//2, hch+16)
        hch_ = 2 * hch2

        def hdot(s):
            def slc(t):
                return jax.lax.slice(t, (s, 0), (s + hwin, 2 * cols))

            return (
                dotb(hm0, slc(pa0))
                + dotb(hm0, slc(pa1))
                + dotb(hm1, slc(pa0))
            )

        if hch_ < tile_h:
            hp_ = jnp.concatenate(
                [hdot(ci * hch_) for ci in range(tile_h // hch_)], axis=0
            )  # (dh, 2*cols)
        else:
            hp_ = hdot(0)
        segs = [
            jax.lax.slice(hp_, (0, i * cols), (dh, (i + 1) * cols))
            for i in range(2)
        ]
        pt = jnp.concatenate(segs, axis=0).T  # (cols, 2*dh)
        t0, t1, t2 = _split3(pt)
        w0, w1 = wmat2[0], wmat2[1]
        wch2, wwin = w0.shape  # decimated: (wch//2, win)
        wch_ = 2 * wch2
        chunks = []
        for j in range(tile_w // wch_):
            s = j * wch_ + COL_HALO4 - 8

            def sl(t, s=s):
                return jax.lax.slice(t, (s, 0), (s + wwin, 2 * dh))

            x0, x1, x2 = sl(t0), sl(t1), sl(t2)
            chunks.append(
                dotb(w0, x0) + dotb(w0, x1) + dotb(w0, x2) + dotb(w1, x0)
            )
        wt_nat = jnp.concatenate(chunks, axis=0).T * kappa  # (2*dh, tw//2)
        return [
            jax.lax.slice(wt_nat, (i * dh, 0), ((i + 1) * dh, tile_w // 2))
            for i in range(2)
        ]

    ds_copies = []
    if emit_ds:
        dh = tile_h // 2
        dw = tile_w // 2
        dh_p = _round_up(dh, 8)
        dw_p = _round_up(dw, 128)
        if limb:
            ea, eb = blur_group_dec_limb(hmat_b, wmat_b, jnp.float32(kappa_b))
        else:
            ea, eb = blur_group_dec([a, b], hmat_b, wmat_b)  # (dh, dw) each
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        rid = jax.lax.broadcasted_iota(jnp.int32, (dh_p, dw_p), 0) + row0 // 2
        cid = jax.lax.broadcasted_iota(jnp.int32, (dh_p, dw_p), 1) + col0 // 2
        keep = ((rid < h2) & (cid < w2)).astype(jnp.float32)
        for img_idx, q in enumerate((ea, eb)):
            if dh_p != dh:
                q = jnp.pad(q, ((0, dh_p - dh), (0, 0)))
            if dw_p != dw:
                q = jnp.pad(q, ((0, 0), (0, dw_p - dw)))
            ds_store[img_idx] = q * keep
            dst_r = pl.multiple_of(ROW_HALO4 + row0 // 2, 8)
            dst_c = pl.multiple_of(COL_HALO4 + col0 // 2, 128)
            cp = pltpu.make_async_copy(
                ds_store.at[img_idx],
                ds_ref.at[img_idx, p, pl.ds(dst_r, dh_p), pl.ds(dst_c, dw_p)],
                ds_sems.at[img_idx],
            )
            cp.start()
            ds_copies.append(cp)

    # Per-pixel VIF map (guard order mirrors ops/vif.py / libvmaf).
    s11 = jnp.maximum(br2 - mu1 * mu1, 0.0)
    s22 = jnp.maximum(bd2 - mu2 * mu2, 0.0)
    s12 = brd - mu1 * mu2
    g = s12 / (s11 + EPS)
    sv_sq = s22 - g * s12
    g = jnp.where(s11 < EPS, 0.0, g)
    sv_sq = jnp.where(s11 < EPS, s22, sv_sq)
    s11c = jnp.where(s11 < EPS, 0.0, s11)
    sv_sq = jnp.where(s22 < EPS, 0.0, sv_sq)
    g = jnp.where(s22 < EPS, 0.0, g)
    sv_sq = jnp.where(g < 0.0, s22, sv_sq)
    g = jnp.maximum(g, 0.0)
    sv_sq = jnp.maximum(sv_sq, EPS)

    inv_ln2 = np.float32(1.0 / np.log(2.0))
    num = jnp.log(1.0 + g * g * s11c / (sv_sq + SIGMA_NSQ)) * inv_ln2
    den = jnp.log(1.0 + s11c / SIGMA_NSQ) * inv_ln2

    mri = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + row0
    mci = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + col0
    mask = ((mri < h) & (mci < w)).astype(jnp.float32)

    out_ref[...] = jnp.zeros_like(out_ref)
    out_ref[0, 0, 0, 0, :] = jnp.stack(
        [jnp.sum(num * mask), jnp.sum(den * mask)] + [jnp.float32(0.0)] * 6
    )

    for cp in ds_copies:
        cp.wait()


def _vif_scale_pallas(
    q12: jax.Array, h: int, w: int, scale: int, *,
    emit_ds: bool, interpret: bool = False,
):
    """One VIF scale on the padded mirror-filled layout.

    Returns ((B, 2) [num, den] sums, ds) where ds is the next scale's
    (2, B, hp2, wp2) buffer (decimated window-B blur, halos NOT yet
    mirror-filled) when ``emit_ds``."""
    two, bsz = q12.shape[0], q12.shape[1]
    assert two == 2
    tile_h, tile_w, nth, ntw, hp, wp = _vif_geom(h, w)
    assert q12.shape[-2] >= hp and q12.shape[-1] >= wp, (q12.shape, hp, wp)
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4

    from turbo_metrics_tpu.ops.vif import vif_window

    taps_a = tuple(float(t) for t in vif_window(scale))
    r_a = _RADII[scale]
    hch = H_CHUNK if (H_CHUNK and tile_h % H_CHUNK == 0 and tile_h > H_CHUNK) else 0

    def _h_band(taps, r):
        if hch:
            return _band_matrix_h(hch, hch + 2 * ROW_HALO4, taps, ROW_HALO4 - r)
        return _band_matrix_h(tile_h, rows, taps, ROW_HALO4 - r)

    # Limbs only at scale 0: that's 75% of the pixels and the only scale
    # whose input is integer-valued (exact data limbs).  At the tiny deep
    # scales the win is negligible and the stats are guard-flip sensitive —
    # s11 ~ EPS pixels jump discontinuously between num formulas, so a
    # 1e-6-level summation-order difference there costs ~1e-3 of scale-3
    # score on smooth content (measured at 96x128); scales 1-3 stay on the
    # f32-exact HIGHEST dots (the fused tail kernel always is).
    limb = VIF_LIMB and scale == 0
    hmat_a = _h_band(taps_a, r_a)
    wmat_a = _band_wt(taps_a, W_CHUNK, _W_WINS[W_CHUNK])
    kappa_a = kappa_b = None
    if limb:
        kappa_a = _kappa2(taps_a)
        hmat_a = _split_band_zs(lambda tp: _h_band(tp, r_a), taps_a)
        wmat_a = _split_band_zs(
            lambda tp: _band_wt(tp, W_CHUNK, _W_WINS[W_CHUNK]), taps_a
        )

    def _bspec(m):
        n = m.ndim
        return pl.BlockSpec(m.shape, lambda p, th, tw: (0,) * n)

    inputs = [q12, jnp.asarray(hmat_a), jnp.asarray(wmat_a)]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        _bspec(hmat_a),
        _bspec(wmat_a),
    ]
    out_shapes = [jax.ShapeDtypeStruct((bsz, nth, ntw, 8, 8), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 1, 1, 8, 8), lambda p, th, tw: (p, th, tw, 0, 0))
    ]
    scratch = [
        pltpu.VMEM((2, rows, cols), jnp.float32),
        pltpu.VMEM((2, rows, cols), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    aliases = {}
    if emit_ds:
        taps_b = tuple(float(t) for t in vif_window(scale + 1))
        r_b = _RADII[scale + 1]
        # Even-output-row / even-output-column subsets: decimation folded
        # into the emission bands (see _vif_kernel.blur_group_dec).
        hmat_b = _h_band(taps_b, r_b)[0::2]
        wmat_b = _band_wt(taps_b, W_CHUNK, _W_WINS[W_CHUNK])[0::2]
        if limb:
            kappa_b = _kappa2(taps_b)
            hmat_b = _split_band_zs(
                lambda tp: _h_band(tp, r_b)[0::2], taps_b
            )
            wmat_b = _split_band_zs(
                lambda tp: _band_wt(tp, W_CHUNK, _W_WINS[W_CHUNK])[0::2],
                taps_b,
            )
        in_specs.insert(3, _bspec(hmat_b))
        in_specs.insert(4, _bspec(wmat_b))
        inputs.insert(3, jnp.asarray(hmat_b))
        inputs.insert(4, jnp.asarray(wmat_b))
        hp2, wp2 = _vif_ds_hw(h, w)
        dh_p = _round_up(tile_h // 2, 8)
        dw_p = _round_up(tile_w // 2, 128)
        inputs.append(jnp.zeros((2, bsz, hp2, wp2), jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shapes.append(jax.ShapeDtypeStruct((2, bsz, hp2, wp2), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        aliases = {len(inputs) - 1: 1}
        scratch += [
            pltpu.VMEM((2, dh_p, dw_p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    kernel = functools.partial(
        _vif_kernel,
        h=h, w=w, tile_h=tile_h, tile_w=tile_w,
        nth=nth, ntw=ntw, bsz=bsz, emit_ds=emit_ds,
        limb=limb, kappa_a=kappa_a, kappa_b=kappa_b,
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
        out, ds = outs
    else:
        out, ds = outs, None
    return out[:, :, :, 0, :2].sum(axis=(1, 2)), ds


def vif_scale_stats_pallas(
    ref: jax.Array,
    dis: jax.Array,
    *,
    use_tail: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops/vif.vif_scale_stats: (B, H, W) f32 luma in 8-bit
    units -> (B, 4, 2) per-scale [num, den] sums.

    ``use_tail``: run scales 1-3 as ONE fused kernel (vif_tail.py) instead
    of per-scale kernels + jnp mirror fixups, when the geometry allows."""
    h, w = ref.shape[-2], ref.shape[-1]
    q12 = _pad_reflect_layout(jnp.stack([ref, dis]), h, w, _RADII[0])
    sums0, q12 = _vif_scale_pallas(
        q12, h, w, 0, emit_ds=True, interpret=interpret
    )
    h1, w1 = (h + 1) // 2, (w + 1) // 2
    if use_tail:
        from turbo_metrics_tpu.ops.pallas.vif_tail import (
            vif_tail_ok,
            vif_tail_pallas,
        )

        if vif_tail_ok(h1, w1, q12.shape):
            rest = vif_tail_pallas(q12, h1, w1, interpret=interpret)
            return jnp.concatenate([sums0[:, None], rest], axis=-2)
    out = [sums0]
    hh, ww = h, w
    for k in range(1, NUM_SCALES):
        hh, ww = (hh + 1) // 2, (ww + 1) // 2
        q12 = _mirror_halos(q12, hh, ww, _RADII[k])
        sums, q12 = _vif_scale_pallas(
            q12, hh, ww, k, emit_ds=k < NUM_SCALES - 1, interpret=interpret
        )
        out.append(sums)
    return jnp.stack(out, axis=-2)
