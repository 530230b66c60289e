"""Fused VIF tail: scales 1-3 in ONE Pallas kernel.

The per-scale VIF kernels (ops/pallas/vif.py) pay a fixed per-launch cost
on small pyramid levels plus jnp mirror-halo fixups between scales.  This
kernel ingests the level-1 buffer the scale-0 kernel emitted and runs the
remaining three scales entirely in VMEM: each level is processed in
64-row tiles by a PYTHON loop (no grid), so tile-position-specific band
matrices are free — reflect-101 borders are FOLDED INTO the edge tiles'
matrices (out-of-image taps re-landed on their mirrored in-image source,
outputs beyond the image zeroed) instead of mirror-filling halos.  Each
level also emits the next level's input in-register: the window-B blur
(the NEXT scale's window at THIS scale's resolution — the libvmaf
decimation convention, ops/vif.py) decimated by the even-row fold +
even-column one-hot matmul, stored straight into the next level's VMEM
plane.

NaN safety: the level-2/3 VMEM planes are zero-filled each grid step —
folded matrices carry zero coefficients for halo/unwritten positions, but
IEEE 0*NaN would still poison the MXU dot products if the scratch held
garbage.

Same num/den map and guard order as ops/pallas/vif.py; tested against the
jnp path and the f64 oracle (refimpl/vif.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops.pallas.vif import (
    COL_HALO4,
    EPS,
    ROW_HALO4,
    SIGMA_NSQ,
)

_TH = 64  # row-tile height inside the tail
_RMAX = 8  # conservative edge-proximity bound for matrix dedup


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _mirror(g: int, n: int) -> int:
    g = abs(g)
    return 2 * n - g - 2 if g >= n else g


def _folded_h(taps, r0: int, h: int) -> np.ndarray:
    """(64, 80) H band matrix for out rows [r0, r0+64) of an h-row image;
    window = padded rows [r0, r0+80) (image at +8).  Reflect-101 folded,
    out rows beyond the image zeroed."""
    r = len(taps) // 2
    m = np.zeros((_TH, _TH + 16), np.float32)
    for i in range(_TH):
        if r0 + i >= h:
            continue
        for k, t in enumerate(taps):
            g = _mirror(r0 + i - r + k, h)
            m[i, g + 8 - r0] += np.float32(t)
    return m


def _folded_wt(taps, c0: int, w: int) -> np.ndarray:
    """(128, 144) transposed-W band matrix for out cols [c0, c0+128) of a
    w-col image; window = padded cols [c0+120, c0+264) (image at +128)."""
    r = len(taps) // 2
    m = np.zeros((128, 144), np.float32)
    for j in range(128):
        if c0 + j >= w:
            continue
        for k, t in enumerate(taps):
            g = _mirror(c0 + j - r + k, w)
            m[j, g + 128 - (c0 + 120)] += np.float32(t)
    return m


def _tail_dims(h1: int, w1: int):
    """Per-level (h, w, wpad, nth, nchunks) for scales 1..3.  wpad is
    256-aligned so each level's half-width emission stays 128-aligned."""
    out = []
    h, w = h1, w1
    for _ in range(3):
        wpad = _round_up(w, 256)
        out.append((h, w, wpad, -(-h // _TH), wpad // 128))
        h, w = (h + 1) // 2, (w + 1) // 2
    return out


def _h_key(t: int, nth: int, h: int):
    """Dedup key: tiles that touch neither edge share one plain matrix."""
    if t > 0 and t * _TH - _RMAX >= 0 and (t + 1) * _TH + _RMAX <= h:
        return "mid"
    return t


def _w_key(q: int, nc: int, w: int):
    if q > 0 and (q + 1) * 128 + _RMAX <= w:
        return "mid"
    return q


def _build_mats(h1: int, w1: int):
    """Folded band matrices for the 3 tail levels.  Returns stacked arrays
    (ha, hb, wa, wb) and per-level index tables; A/B entries are appended
    in lockstep so one index serves both."""
    from turbo_metrics_tpu.ops.vif import vif_window

    dims = _tail_dims(h1, w1)
    ha, hb, wa, wb = [], [], [], []
    ha_ix, wa_ix = [], []
    for li, (h, w, wpad, nth, nc) in enumerate(dims):
        taps_a = tuple(float(t) for t in vif_window(li + 1))
        taps_b = (
            tuple(float(t) for t in vif_window(li + 2)) if li < 2 else None
        )
        hrow, wrow = {}, {}
        hix, wix = [], []
        for t in range(nth):
            key = _h_key(t, nth, h)
            if key not in hrow:
                hrow[key] = len(ha)
                ha.append(_folded_h(taps_a, t * _TH, h))
                # B (emission) bands carry only the EVEN output rows/cols:
                # decimation folded into the band (see the kernel's
                # emission block) — bit-identical to blur-then-decimate.
                hb.append(
                    _folded_h(taps_b, t * _TH, h)[0::2]
                    if taps_b is not None
                    else np.zeros((_TH // 2, _TH + 16), np.float32)
                )
            hix.append(hrow[key])
        for q in range(nc):
            key = _w_key(q, nc, w)
            if key not in wrow:
                wrow[key] = len(wa)
                wa.append(_folded_wt(taps_a, q * 128, w))
                wb.append(
                    _folded_wt(taps_b, q * 128, w)[0::2]
                    if taps_b is not None
                    else np.zeros((64, 144), np.float32)
                )
            wix.append(wrow[key])
        ha_ix.append(hix)
        wa_ix.append(wix)
    return np.stack(ha), np.stack(hb), np.stack(wa), np.stack(wb), ha_ix, wa_ix


def _vif_tail_kernel(
    q12_hbm,
    ha_ref,
    hb_ref,
    wa_ref,
    wb_ref,
    out_ref,
    t1,
    t2,
    p2,
    p3,
    sems,
    *,
    dims,
    ha_ix,
    wa_ix,
    bsz: int,
):
    p = pl.program_id(0)

    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4

    def dma(idx, slot):
        d1 = pltpu.make_async_copy(
            q12_hbm.at[0, idx, pl.ds(0, rows1), pl.ds(0, cols1)],
            t1.at[slot], sems.at[slot, 0],
        )
        d2 = pltpu.make_async_copy(
            q12_hbm.at[1, idx, pl.ds(0, rows1), pl.ds(0, cols1)],
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

    # Zero the level-2/3 planes while the DMA flies (NaN safety, see
    # module docstring).
    p2[...] = jnp.zeros_like(p2)
    p3[...] = jnp.zeros_like(p3)

    d1, d2 = dma(p, slot)
    d1.wait()
    d2.wait()

    dims_dot = (((1,), (0,)), ((), ()))

    def doth(x, y):
        return jax.lax.dot_general(
            x, y, dims_dot, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    inv_ln2 = np.float32(1.0 / np.log(2.0))
    for li, (h, w, wpad, nth, nc) in enumerate(dims):
        cols = COL_HALO4 + wpad + COL_HALO4
        emit = li < 2
        if emit:
            h2, w2 = dims[li + 1][0], dims[li + 1][1]
            nxt = (p2, p3)[li]
            dwp = wpad // 2
        num_acc = jnp.float32(0.0)
        den_acc = jnp.float32(0.0)
        for t in range(nth):
            r0 = t * _TH
            if li == 0:
                a = t1[slot, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
                b = t2[slot, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
            else:
                src = (p2, p3)[li - 1]
                a = src[0, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
                b = src[1, pl.ds(r0, _TH + 16), pl.ds(0, cols)]
            hm = ha_ref[ha_ix[li][t]]
            pack = jnp.concatenate([a, b, a * a, b * b, a * b], axis=1)
            hp_ = doth(hm, pack)  # (64, 5*cols)
            segs = [
                jax.lax.slice(hp_, (0, i * cols), (_TH, (i + 1) * cols))
                for i in range(5)
            ]
            pt = jnp.concatenate(segs, axis=0).T  # (cols, 5*64)
            dh = _TH // 2
            if emit:
                # Decimated emission bands: hb/wb carry only the even
                # output rows/cols (built in _build_mats), so the B blur
                # lands directly at the next level's resolution.
                hpb = doth(
                    hb_ref[ha_ix[li][t]], jnp.concatenate([a, b], axis=1)
                )  # (dh, 2*cols)
                segsb = [
                    jax.lax.slice(hpb, (0, i * cols), (dh, (i + 1) * cols))
                    for i in range(2)
                ]
                ptb = jnp.concatenate(segsb, axis=0).T  # (cols, 2*dh)
            chunks, chunksb = [], []
            for q in range(nc):
                s = q * 128 + COL_HALO4 - 8
                win = jax.lax.slice(pt, (s, 0), (s + 144, 5 * _TH))
                chunks.append(doth(wa_ref[wa_ix[li][q]], win))
                if emit:
                    winb = jax.lax.slice(ptb, (s, 0), (s + 144, 2 * dh))
                    chunksb.append(doth(wb_ref[wa_ix[li][q]], winb))
            wt = jnp.concatenate(chunks, axis=0).T  # (5*64, wpad)

            def bq(i, _wt=wt, _wpad=wpad):
                return jax.lax.slice(
                    _wt, (i * _TH, 0), ((i + 1) * _TH, _wpad)
                )

            mu1, mu2, br2, bd2, brd = (bq(i) for i in range(5))
            s11 = jnp.maximum(br2 - mu1 * mu1, 0.0)
            s22 = jnp.maximum(bd2 - mu2 * mu2, 0.0)
            s12 = brd - mu1 * mu2
            g = s12 / (s11 + EPS)
            sv = s22 - g * s12
            g = jnp.where(s11 < EPS, 0.0, g)
            sv = jnp.where(s11 < EPS, s22, sv)
            s11c = jnp.where(s11 < EPS, 0.0, s11)
            sv = jnp.where(s22 < EPS, 0.0, sv)
            g = jnp.where(s22 < EPS, 0.0, g)
            sv = jnp.where(g < 0.0, s22, sv)
            g = jnp.maximum(g, 0.0)
            sv = jnp.maximum(sv, EPS)
            num = jnp.log(1.0 + g * g * s11c / (sv + SIGMA_NSQ)) * inv_ln2
            den = jnp.log(1.0 + s11c / SIGMA_NSQ) * inv_ln2
            rid = jax.lax.broadcasted_iota(jnp.int32, (_TH, wpad), 0) + r0
            cid = jax.lax.broadcasted_iota(jnp.int32, (_TH, wpad), 1)
            mask = ((rid < h) & (cid < w)).astype(jnp.float32)
            num_acc = num_acc + jnp.sum(num * mask)
            den_acc = den_acc + jnp.sum(den * mask)

            if emit:
                wtb = jnp.concatenate(chunksb, axis=0).T  # (2*dh, wpad//2)
                rid2 = (
                    jax.lax.broadcasted_iota(jnp.int32, (dh, dwp), 0)
                    + r0 // 2
                )
                cid2 = jax.lax.broadcasted_iota(jnp.int32, (dh, dwp), 1)
                keep = ((rid2 < h2) & (cid2 < w2)).astype(jnp.float32)
                for ii in range(2):
                    eb = jax.lax.slice(
                        wtb, (ii * dh, 0), ((ii + 1) * dh, dwp)
                    )
                    nxt[
                        ii,
                        pl.ds(ROW_HALO4 + r0 // 2, dh),
                        pl.ds(COL_HALO4, dwp),
                    ] = eb * keep
        out_ref[0, li, :] = jnp.stack(
            [num_acc, den_acc] + [jnp.float32(0.0)] * 6
        )


def vif_tail_ok(h1: int, w1: int, q12_shape) -> bool:
    """The tail needs the scale-0 ds buffer to cover its aligned whole-
    plane DMA window and sane level sizes."""
    if min(h1, w1) < 48:
        return False
    dims = _tail_dims(h1, w1)
    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4
    return q12_shape[-2] >= rows1 and q12_shape[-1] >= cols1


def vif_tail_pallas(
    q12: jax.Array, h1: int, w1: int, *, interpret: bool = False
) -> jax.Array:
    """Scales 1-3 sums from the scale-0 kernel's emitted level-1 buffer
    (halos need NOT be mirror-filled).  Returns (B, 3, 2) [num, den]."""
    bsz = q12.shape[1]
    dims = _tail_dims(h1, w1)
    assert vif_tail_ok(h1, w1, q12.shape), (q12.shape, dims)
    rows1 = dims[0][3] * _TH + 16
    cols1 = COL_HALO4 + dims[0][2] + COL_HALO4
    rows2 = dims[1][3] * _TH + 16
    cols2 = COL_HALO4 + dims[1][2] + COL_HALO4
    rows3 = dims[2][3] * _TH + 16
    cols3 = COL_HALO4 + dims[2][2] + COL_HALO4

    ha, hb, wa, wb, ha_ix, wa_ix = _build_mats(h1, w1)
    kernel = functools.partial(
        _vif_tail_kernel,
        dims=dims, ha_ix=ha_ix, wa_ix=wa_ix, bsz=bsz,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(ha.shape, lambda p: (0, 0, 0)),
            pl.BlockSpec(hb.shape, lambda p: (0, 0, 0)),
            pl.BlockSpec(wa.shape, lambda p: (0, 0, 0)),
            pl.BlockSpec(wb.shape, lambda p: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, 8), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows1, cols1), jnp.float32),
            pltpu.VMEM((2, rows1, cols1), jnp.float32),
            pltpu.VMEM((2, rows2, cols2), jnp.float32),
            pltpu.VMEM((2, rows3, cols3), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q12, jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(wa), jnp.asarray(wb))
    return out[:, :, :2]
