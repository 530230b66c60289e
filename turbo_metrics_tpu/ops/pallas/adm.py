"""Fused Pallas ADM (adm2) kernels.

The jnp formulation (ops/adm.py) pays ~30 full-array HBM round trips per
level for the db2 DWT's shifted slice-FMAs plus the decouple/mask maps
(measured 7.9 ms/batch-8 at 1080p).  Here each level runs as TWO fused
kernels over band-domain tiles:

* Kernel A (``_adm_dwt_kernel``): the 2-D db2 analysis DWT as banded
  stride-2 matmuls on the MXU — row lo/hi passes as (toh, rows_in) band
  matrices with taps at ``[i, 2i+7+k]`` (libvmaf's ``2*i - 1 + tap`` read
  pattern, image at halo offset 8), column passes as transposed 128-chunk
  band matmuls — followed in-register by the decoupling (restored r, gated
  by the 1-degree angle test), CSF weighting, and |csf_a| accumulation.
  Per tile it writes the two approximation bands into the NEXT level's
  input buffer and seven feature planes (csf_r x3, csf_o x3, s = sum of
  |csf_a|) for kernel B.
* Kernel B (``_adm_mask_kernel``): the contrast-masking threshold
  ``thr = box3x3(s)/30 + s/30`` (the 1/15-centre 3x3 filter decomposed
  into a separable box plus a pointwise term), masked-detail cube sums and
  |csf_o| cube sums over libvmaf's centre region.

Between levels two tiny jnp halo fixups run: half-sample symmetric
extension around the approximation band (the next DWT's border rule) and
reflect-101 around the ``s`` plane (the mask filter's border rule).

Parity: ops/adm.py == libvmaf float-ADM conventions; this kernel is tested
against the jnp path and the f64 oracle (refimpl/adm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops.adm import (
    COS_1DEG_SQ,
    DB2_HI,
    DB2_LO,
    DECOUPLE_EPS,
    NUM_LEVELS,
    center_region,
    csf_rfactors,
)
from turbo_metrics_tpu.ops.pallas.scale_stats import _round_up

ROW_HALO = 8
COL_HALO = 128
TILE_BH = 64
TILE_BW = 512


def _band_geom(hb: int, wb: int) -> tuple[int, int, int, int]:
    """(tile_bh, tile_bw, nbh, nbw) of a band-domain tile grid."""
    tile_bh = min(TILE_BH, _round_up(hb, 8))
    wr = _round_up(wb, 128)
    if wr <= TILE_BW:
        tile_bw, nbw = wr, 1
    else:
        nbw = -(-wr // TILE_BW)
        tile_bw = _round_up(-(-wb // nbw), 128)
    nbh = -(-hb // tile_bh)
    return tile_bh, tile_bw, nbh, nbw


def _input_geom(h: int, w: int) -> tuple[int, int]:
    """(hp, wp) of a level's input buffer: image at (ROW_HALO, COL_HALO)
    with 2-px symmetric halos, extended to cover kernel A's aligned DMA
    windows ([2*r0, 2*r0 + 2*toh + 16) x [2*c0, 2*c0 + 2*tow + 256))."""
    hb, wb = (h + 1) // 2, (w + 1) // 2
    toh, tow, nbh, nbw = _band_geom(hb, wb)
    hp = max(2 * nbh * toh + 16, ROW_HALO + h + ROW_HALO)
    wp = max(2 * nbw * tow + 2 * COL_HALO, COL_HALO + w + COL_HALO)
    return _round_up(hp, 8), _round_up(wp, 128)


def _band_buf_geom(hb: int, wb: int) -> tuple[int, int]:
    """(hbp, wbp) sized to serve BOTH as kernel A's band write target /
    kernel B's read source AND as the next level's input buffer."""
    toh, tow, nbh, nbw = _band_geom(hb, wb)
    hp_next, wp_next = _input_geom(hb, wb)
    hbp = max(ROW_HALO + nbh * toh + ROW_HALO, hp_next)
    wbp = max(COL_HALO + nbw * tow + COL_HALO, wp_next)
    return _round_up(hbp, 8), _round_up(wbp, 128)


def _pad_symmetric_input(x: jax.Array, h: int, w: int) -> jax.Array:
    """(..., h, w) -> (..., hp, wp) with 2-px half-sample-symmetric halos
    at (ROW_HALO, COL_HALO), zeros beyond."""
    hp, wp = _input_geom(h, w)
    lead = [(0, 0)] * (x.ndim - 2)
    xs = jnp.pad(x, lead + [(2, 2), (2, 2)], mode="symmetric")
    return jnp.pad(
        xs,
        lead
        + [
            (ROW_HALO - 2, hp - h - ROW_HALO - 2),
            (COL_HALO - 2, wp - w - COL_HALO - 2),
        ],
    )


def _fix_symmetric_halos(buf: jax.Array, h: int, w: int) -> jax.Array:
    """Write the 2-px half-sample symmetric halo around the (h, w) image at
    (ROW_HALO, COL_HALO): x[-1]=x[0], x[-2]=x[1], x[n]=x[n-1], x[n+1]=x[n-2].
    Rows first, then columns over the row-fixed buffer (corners)."""
    R, C = ROW_HALO, COL_HALO
    buf = buf.at[..., R - 2 : R, :].set(buf[..., R + 1 : R - 1 : -1, :])
    buf = buf.at[..., R + h : R + h + 2, :].set(
        buf[..., R + h - 1 : R + h - 3 : -1, :]
    )
    buf = buf.at[..., :, C - 2 : C].set(buf[..., :, C + 1 : C - 1 : -1])
    buf = buf.at[..., :, C + w : C + w + 2].set(
        buf[..., :, C + w - 1 : C + w - 3 : -1]
    )
    return buf


def _fix_reflect1_halos(buf: jax.Array, h: int, w: int) -> jax.Array:
    """1-px reflect-101 halo (x[-1]=x[1], x[n]=x[n-2]) around the image."""
    R, C = ROW_HALO, COL_HALO
    buf = buf.at[..., R - 1, :].set(buf[..., R + 1, :])
    buf = buf.at[..., R + h, :].set(buf[..., R + h - 2, :])
    buf = buf.at[..., :, C - 1].set(buf[..., :, C + 1])
    buf = buf.at[..., :, C + w].set(buf[..., :, C + w - 2])
    return buf


def _dwt_band_h(toh: int, rows_in: int, taps) -> np.ndarray:
    m = np.zeros((toh, rows_in), np.float32)
    i = np.arange(toh)
    for k, t in enumerate(taps):
        m[i, 2 * i + 7 + k] = np.float32(t)
    return m


_WT_WIN = 272  # 128 outputs x stride 2 + 7 offset + 3 taps, 16-aligned


def _dwt_band_wt(taps) -> np.ndarray:
    m = np.zeros((128, _WT_WIN), np.float32)
    j = np.arange(128)
    for k, t in enumerate(taps):
        m[j, 2 * j + 7 + k] = np.float32(t)
    return m


def _adm_dwt_kernel(
    *refs,
    hb: int,
    wb: int,
    toh: int,
    tow: int,
    nbh: int,
    nbw: int,
    bsz: int,
    level: int,
):
    it = iter(refs)
    x_hbm = next(it)  # (2, B, hp, wp) level input, symmetric halos
    hlo = next(it)  # (toh, rows_in)
    hhi = next(it)
    wlo = next(it)  # (128, _WT_WIN)
    whi = next(it)
    _z_nxt = next(it)
    _z_feat = next(it)
    nxt_ref = next(it)  # (2, B, hbp, wbp) approx bands out
    feat_ref = next(it)  # (7, B, hbp, wbp) csf_r x3, csf_o x3, s
    t1 = next(it)  # VMEM (2, rows_in, cols_in)
    t2 = next(it)
    sems = next(it)  # DMA (2, 2)
    store = next(it)  # VMEM (9, toh, tow)
    st_sems = next(it)  # DMA (9,)

    p = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    rows_in = 2 * toh + 16
    cols_in = 2 * tow + 2 * COL_HALO

    nsteps = bsz * nbh * nbw
    step = (p * nbh + th) * nbw + tw

    def dma_pair(idx, slot):
        p_ = idx // (nbh * nbw)
        rem = idx % (nbh * nbw)
        r0 = pl.multiple_of((rem // nbw) * (2 * toh), 16)
        c0 = pl.multiple_of((rem % nbw) * (2 * tow), 256)
        d1 = pltpu.make_async_copy(
            x_hbm.at[0, p_, pl.ds(r0, rows_in), pl.ds(c0, cols_in)],
            t1.at[slot], sems.at[slot, 0],
        )
        d2 = pltpu.make_async_copy(
            x_hbm.at[1, p_, pl.ds(r0, rows_in), pl.ds(c0, cols_in)],
            t2.at[slot], sems.at[slot, 1],
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
    o_in = t1[slot]
    t_in = t2[slot]

    row0 = pl.multiple_of(th * toh, 8)
    col0 = pl.multiple_of(tw * tow, 128)

    dims = (((1,), (0,)), ((), ()))

    def doth(x, y):
        return jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    pack = jnp.concatenate([o_in, t_in], axis=1)  # (rows_in, 2*cols_in)
    lo_r = doth(hlo[...], pack)  # (toh, 2*cols_in)
    hi_r = doth(hhi[...], pack)
    segs = []
    for src in (lo_r, hi_r):
        for i in range(2):
            segs.append(
                jax.lax.slice(src, (0, i * cols_in), (toh, (i + 1) * cols_in))
            )
    pt = jnp.concatenate(segs, axis=0).T  # (cols_in, 4*toh)
    nq = 4 * toh
    lo_chunks, hi_chunks = [], []
    for j in range(tow // 128):
        s = j * 256 + 120
        win = jax.lax.slice(pt, (s, 0), (s + _WT_WIN, nq))
        lo_chunks.append(doth(wlo[...], win))
        hi_chunks.append(doth(whi[...], win))
    lo_c = jnp.concatenate(lo_chunks, axis=0).T  # (4*toh, tow)
    hi_c = jnp.concatenate(hi_chunks, axis=0).T

    def band(mat, i):
        return jax.lax.slice(mat, (i * toh, 0), ((i + 1) * toh, tow))

    # pack order: [lo_r(o), lo_r(t), hi_r(o), hi_r(t)] — "r" passes here run
    # along HEIGHT first (the jnp path filters WIDTH first; separability
    # makes the result equal to f32 rounding).  Horizontal detail = highpass
    # along width + lowpass along height (ops/adm._dwt_level convention).
    a_o, a_t = band(lo_c, 0), band(lo_c, 1)
    h_o, h_t = band(hi_c, 0), band(hi_c, 1)  # lo height, hi width
    v_o, v_t = band(lo_c, 2), band(lo_c, 3)  # hi height, lo width
    d_o, d_t = band(hi_c, 2), band(hi_c, 3)

    rid = jax.lax.broadcasted_iota(jnp.int32, (toh, tow), 0) + row0
    cid = jax.lax.broadcasted_iota(jnp.int32, (toh, tow), 1) + col0
    keep = ((rid < hb) & (cid < wb)).astype(jnp.float32)

    # Decoupling + CSF (libvmaf adm_decouple_s / adm_csf_s).
    eps = np.float32(DECOUPLE_EPS)
    ot_dp = h_o * h_t + v_o * v_t
    o_mag_sq = h_o * h_o + v_o * v_o
    t_mag_sq = h_t * h_t + v_t * v_t
    angle_ok = (ot_dp >= 0.0) & (
        ot_dp * ot_dp >= np.float32(COS_1DEG_SQ) * o_mag_sq * t_mag_sq
    )
    rf_hv, rf_d = csf_rfactors(level)
    rfs = (np.float32(rf_hv), np.float32(rf_hv), np.float32(rf_d))

    s_acc = None
    outs = []  # csf_r x3 then csf_o x3
    csf_o_list = []
    for o_b, t_b, rf in zip((h_o, v_o, d_o), (h_t, v_t, d_t), rfs):
        k = jnp.clip(t_b / (o_b + eps), 0.0, 1.0)
        r = jnp.where(angle_ok, t_b, k * o_b)
        csf_r = rf * r
        csf_a = rf * (t_b - r)
        outs.append(csf_r * keep)
        csf_o_list.append(rf * o_b * keep)
        aa = jnp.abs(csf_a)
        s_acc = aa if s_acc is None else s_acc + aa
    outs += csf_o_list + [s_acc * keep]

    dst_r = pl.multiple_of(ROW_HALO + row0, 8)
    dst_c = pl.multiple_of(COL_HALO + col0, 128)
    copies = []
    for i, val in enumerate((a_o * keep, a_t * keep)):
        store[i] = val
        cp = pltpu.make_async_copy(
            store.at[i],
            nxt_ref.at[i, p, pl.ds(dst_r, toh), pl.ds(dst_c, tow)],
            st_sems.at[i],
        )
        cp.start()
        copies.append(cp)
    for i, val in enumerate(outs):
        store[2 + i] = val
        cp = pltpu.make_async_copy(
            store.at[2 + i],
            feat_ref.at[i, p, pl.ds(dst_r, toh), pl.ds(dst_c, tow)],
            st_sems.at[2 + i],
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()


def _adm_mask_kernel(
    *refs,
    hb: int,
    wb: int,
    toh: int,
    tow: int,
    nbh: int,
    nbw: int,
    bsz: int,
):
    it = iter(refs)
    feat_hbm = next(it)  # (7, B, hbp, wbp)
    out_ref = next(it)  # (1, 1, 1, 8, 8)
    tf = next(it)  # VMEM (2, 6, toh, tow)
    ts = next(it)  # VMEM (2, toh + 16, tow + 256)
    sems = next(it)  # DMA (2, 7)

    p = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)

    nsteps = bsz * nbh * nbw
    step = (p * nbh + th) * nbw + tw

    def dmas(idx, slot):
        # One DMA per plane: a strided multi-plane source slice is riskier
        # than 7 plain 2-D window copies.
        p_ = idx // (nbh * nbw)
        rem = idx % (nbh * nbw)
        r0 = pl.multiple_of((rem // nbw) * toh, 8)
        c0 = pl.multiple_of((rem % nbw) * tow, 128)
        out = [
            pltpu.make_async_copy(
                feat_hbm.at[
                    i, p_,
                    pl.ds(r0 + ROW_HALO, toh), pl.ds(c0 + COL_HALO, tow),
                ],
                tf.at[slot, i], sems.at[slot, i],
            )
            for i in range(6)
        ]
        out.append(pltpu.make_async_copy(
            feat_hbm.at[6, p_, pl.ds(r0, toh + 16), pl.ds(c0, tow + 256)],
            ts.at[slot], sems.at[slot, 6],
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

    row0 = pl.multiple_of(th * toh, 8)
    col0 = pl.multiple_of(tw * tow, 128)

    # thr = box3x3(s)/30 + s/30 over the windowed s tile (halos prefilled:
    # reflect-101 at image borders, neighbouring tiles' values inside).
    sw = ts[slot]  # (toh + 16, tow + 256)
    rowsum = None
    for dy in range(3):
        part = jax.lax.slice(sw, (7 + dy, 0), (7 + dy + toh, tow + 256))
        rowsum = part if rowsum is None else rowsum + part
    acc = None
    for dx in range(3):
        part = jax.lax.slice(rowsum, (0, 127 + dx), (toh, 127 + dx + tow))
        acc = part if acc is None else acc + part
    centre = jax.lax.slice(sw, (8, 128), (8 + toh, 128 + tow))
    inv30 = np.float32(1.0 / 30.0)
    thr = acc * inv30 + centre * inv30

    top, bottom, left, right = center_region(hb, wb)
    rid = jax.lax.broadcasted_iota(jnp.int32, (toh, tow), 0) + row0
    cid = jax.lax.broadcasted_iota(jnp.int32, (toh, tow), 1) + col0
    region = (
        (rid >= top) & (rid < bottom) & (cid >= left) & (cid < right)
    ).astype(jnp.float32)

    out_ref[...] = jnp.zeros_like(out_ref)
    fb = tf[slot]
    for b in range(3):
        csf_r = jax.lax.slice(fb, (b, 0, 0), (b + 1, toh, tow))[0]
        csf_o = jax.lax.slice(fb, (3 + b, 0, 0), (4 + b, toh, tow))[0]
        rm = jnp.maximum(jnp.abs(csf_r) - thr, 0.0) * region
        oc = jnp.abs(csf_o) * region
        out_ref[0, 0, 0, b, :] = jnp.stack(
            [jnp.sum(rm * rm * rm), jnp.sum(oc * oc * oc)]
            + [jnp.float32(0.0)] * 6
        )


def adm_stats_pallas(
    y_ref: jax.Array, y_dis: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Drop-in for ops/adm.adm_stats: (B, H, W) f32 luma -> (B, 4, 3, 2)
    per-level/band centre-region cube sums."""
    h, w = y_ref.shape[-2], y_ref.shape[-1]
    bsz = y_ref.shape[0]
    x = _pad_symmetric_input(jnp.stack([y_ref, y_dis]), h, w)
    out = []
    for level in range(NUM_LEVELS):
        hb, wb = (h + 1) // 2, (w + 1) // 2
        toh, tow, nbh, nbw = _band_geom(hb, wb)
        sums, nxt = _adm_level_run(
            x, h, w, level, interpret=interpret
        )
        out.append(sums)
        if level < NUM_LEVELS - 1:
            x = _fix_symmetric_halos(nxt, hb, wb)
        h, w = hb, wb
    return jnp.stack(out, axis=-3)


def _adm_level_run(
    x: jax.Array, h: int, w: int, level: int, *, interpret: bool = False
):
    bsz = x.shape[1]
    hb, wb = (h + 1) // 2, (w + 1) // 2
    toh, tow, nbh, nbw = _band_geom(hb, wb)
    rows_in = 2 * toh + 16
    cols_in = 2 * tow + 2 * COL_HALO
    hp, wp = _input_geom(h, w)
    assert x.shape[-2] >= hp and x.shape[-1] >= wp, (x.shape, hp, wp)
    hbp, wbp = _band_buf_geom(hb, wb)

    mats = [
        jnp.asarray(m)
        for m in (
            _dwt_band_h(toh, rows_in, DB2_LO),
            _dwt_band_h(toh, rows_in, DB2_HI),
            _dwt_band_wt(DB2_LO),
            _dwt_band_wt(DB2_HI),
        )
    ]
    z_nxt = jnp.zeros((2, bsz, hbp, wbp), jnp.float32)
    z_feat = jnp.zeros((7, bsz, hbp, wbp), jnp.float32)
    kernel = functools.partial(
        _adm_dwt_kernel,
        hb=hb, wb=wb, toh=toh, tow=tow, nbh=nbh, nbw=nbw, bsz=bsz,
        level=level,
    )
    nxt, feat = pl.pallas_call(
        kernel,
        grid=(bsz, nbh, nbw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((toh, rows_in), lambda p, th, tw: (0, 0)),
            pl.BlockSpec((toh, rows_in), lambda p, th, tw: (0, 0)),
            pl.BlockSpec((128, _WT_WIN), lambda p, th, tw: (0, 0)),
            pl.BlockSpec((128, _WT_WIN), lambda p, th, tw: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, bsz, hbp, wbp), jnp.float32),
            jax.ShapeDtypeStruct((7, bsz, hbp, wbp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows_in, cols_in), jnp.float32),
            pltpu.VMEM((2, rows_in, cols_in), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((9, toh, tow), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *mats, z_nxt, z_feat)

    feat = _fix_reflect1_halos(feat, hb, wb)

    mask_kernel = functools.partial(
        _adm_mask_kernel,
        hb=hb, wb=wb, toh=toh, tow=tow, nbh=nbh, nbw=nbw, bsz=bsz,
    )
    sums = pl.pallas_call(
        mask_kernel,
        grid=(bsz, nbh, nbw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 8, 8), lambda p, th, tw: (p, th, tw, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nbh, nbw, 8, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 6, toh, tow), jnp.float32),
            pltpu.VMEM((2, toh + 16, tow + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(feat)
    return sums[:, :, :, :3, :2].sum(axis=(1, 2)), nxt
