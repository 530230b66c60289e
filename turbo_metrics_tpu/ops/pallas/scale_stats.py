"""Pallas TPU megakernels for SSIMULACRA2: one fused pass per scale.

The jnp pipeline materialises ~13 HBM-sized intermediates per scale (products,
two blur passes, maps).  These kernels keep everything in VMEM: each grid step
DMAs one (tile + halo) block of the two images, computes the products, the
separable 11-tap blur, the SSIM and edge-difference error maps, and the six
masked partial sums — writing back only a tiny sums row per plane.

This is the TPU analog of the reference's fused 5-image blur + CUDA-graph
scheduling (ssimulacra2-cuda/src/kernel.rs:219-277, lib.rs:140-229), fused
further: where the reference does 3 HBM round trips per scale
(blur -> transpose -> blur), these kernels do at most one.

Four generations live here, in measured-improvement order (docs/
PERFORMANCE.md records the numbers; older ones stay as the baselines for
tools/perf_lab.py and the regression tests):

  * v1 ``scale_sums_pallas`` — blur+maps+sums per tile, XYB precomputed.
  * v2 ``fused_scale_pallas`` — XYB (shared cube roots) folded in.
  * v3 ``fused_scale_pallas_v3`` — H blur pass as a banded matmul on the
    MXU, cross-step double-buffered input DMA, 4 blurs instead of 5
    (the maps only use s11+s22, so blur(a²)+blur(b²) = blur(a²+b²)).
  * v4 ``fused_scale_pallas_v4`` — the product path: the padded-chain
    layout (pad_geom4) shared with the producers, and the exact MXU
    downscale emitting the NEXT level's padded input in-kernel
    (zero-aliased output buffer).  No jnp.pad or slice copies anywhere in
    the scale loop.  Default blur engine: BOTH separable passes as banded
    matmuls on the MXU — the W pass chunked over 128-aligned windows so a
    single chunk-invariant band matrix serves every chunk with zero lane
    rotations — using a manual 3-pass bf16 split (hi/lo) per operand, the
    Precision.HIGH decomposition Mosaic lacks (~1e-6 rel, measured 1.6e-6
    at norm level; 'highest'/'vpu' remain for exact-mode validation).

Alignment rules (Mosaic): DMA slices tile to (8, 128) in the last two dims,
so the zero halo (R = 5) is embedded in aligned padding and tiles read with
aligned overlap.  Padding is zero, matching the reference's zero-padded blur
borders exactly; sums are masked to the valid (h, w) region.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops.gaussian import RADIUS, gaussian_taps
from turbo_metrics_tpu.ops.ssim_maps import C2

# Row/column tile sizes (rows: multiple of 8; cols: multiple of 128).
TILE_H = 128
TILE_W = 512
_ROW_HALO = 8  # aligned halo covering the blur radius of 5
_COL_HALO = 64


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _blur_w(x: jax.Array, taps, start: int, out_w: int) -> jax.Array:
    acc = taps[0] * jax.lax.slice_in_dim(x, start, start + out_w, axis=-1)
    for k in range(1, 2 * RADIUS + 1):
        acc = acc + taps[k] * jax.lax.slice_in_dim(
            x, start + k, start + k + out_w, axis=-1
        )
    return acc


def _blur_h(x: jax.Array, taps, start: int, out_h: int) -> jax.Array:
    acc = taps[0] * jax.lax.slice_in_dim(x, start, start + out_h, axis=-2)
    for k in range(1, 2 * RADIUS + 1):
        acc = acc + taps[k] * jax.lax.slice_in_dim(
            x, start + k, start + k + out_h, axis=-2
        )
    return acc


def norms_from_sums(sums: jax.Array, npx: int) -> jax.Array:
    """(B, 3, 6) sums -> (B, 3, 2, 3) norms matching ops.ssim_maps.scale_norms."""
    inv = np.float32(1.0 / npx)
    n1 = sums[..., 0::2] * inv  # (B, 3, 3): d, art, det 1-norms
    n4 = jnp.sqrt(jnp.sqrt(sums[..., 1::2] * inv))
    return jnp.stack([n1, n4], axis=-2)  # (B, 3, 2, 3)


# ---------------------------------------------------------------------------
# v2: XYB conversion and the 2x downscale folded into the kernel
# ---------------------------------------------------------------------------

from turbo_metrics_tpu.ops.xyb import (  # noqa: E402
    OPSIN_ABSORBANCE_BIAS,
    OPSIN_ABSORBANCE_BIAS_ROOT,
    OPSIN_ABSORBANCE_MATRIX,
)


def _xyb_in_kernel(r: jax.Array, g: jax.Array, b: jax.Array):
    """linear RGB -> positive-shifted XYB, identical math to ops/xyb.py."""
    m = OPSIN_ABSORBANCE_MATRIX
    bias = OPSIN_ABSORBANCE_BIAS
    root = OPSIN_ABSORBANCE_BIAS_ROOT
    rmix = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b + bias
    gmix = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b + bias
    bmix = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b + bias
    # Mosaic has no cbrt primitive; pow(x, 1/3) is exact enough (inputs are
    # >= the opsin bias > 0, pow stays finite; relative error ~1e-7).
    third = np.float32(1.0 / 3.0)
    rg = jnp.power(jnp.maximum(rmix, 0.0), third) - root
    gr = jnp.power(jnp.maximum(gmix, 0.0), third) - root
    bb = jnp.power(jnp.maximum(bmix, 0.0), third) - root
    x = 0.5 * (rg - gr)
    y = 0.5 * (rg + gr)
    return (
        x * np.float32(14.0) + np.float32(0.42),
        y + np.float32(0.01),
        bb - y + np.float32(0.55),
    )


def _band_matrix_w(cols: int, tile_w: int, taps, start: int) -> np.ndarray:
    """(cols, tile_w) banded matrix so q @ Ww == the 11-tap W blur pass."""
    m = np.zeros((cols, tile_w), np.float32)
    j = np.arange(tile_w)
    for k, t in enumerate(taps):
        m[j + start + k, j] = np.float32(t)
    return m


def _band_matrix_h(tile_h: int, rows: int, taps, start: int) -> np.ndarray:
    """(tile_h, rows) banded matrix so Hm @ qw == the 11-tap H blur pass."""
    m = np.zeros((tile_h, rows), np.float32)
    i = np.arange(tile_h)
    for k, t in enumerate(taps):
        m[i, i + start + k] = np.float32(t)
    return m


_PRECISIONS = {
    "high": jax.lax.Precision.HIGH,  # 3-pass bf16 decomposition (~1e-6 rel)
    "highest": jax.lax.Precision.HIGHEST,  # 6-pass, f32-exact
}


# ---------------------------------------------------------------------------
# v4: padded-chain pipeline — producers write the megakernel's padded layout
# directly, and the megakernel emits the NEXT pyramid level's padded input
# itself (in-kernel exact MXU downscale).  No jnp.pad / slice copies and no
# separate downscale kernels anywhere in the scale loop.
# ---------------------------------------------------------------------------

# Shared padded-layout geometry.  The column halo is 128 so every producer's
# destination DMA (image origin at (ROW_HALO4, COL_HALO4)) lands on Mosaic's
# (8, 128)-aligned boundaries.
ROW_HALO4 = 8
COL_HALO4 = 128
TILE_H4 = 64
TILE_W4 = 1024
# Multi-tile widths may exceed TILE_W4 up to this bound when 256-aligned
# (see pad_geom4's cost search); sweepable for geometry A/B jobs.  Default
# 1280: at 3840 the 3x1280 grid measured 30.11 vs 4x960's 32.28 ms/b8
# (2204 vs 2056 Mpx/s, score delta 1.7e-6; round-5 job 207) — fewer total
# processed columns and emit DMAs that keep 256-lane alignment.
TILE_W4_OVER = int(os.environ.get("TM_TILE_W4_OVER", "1280"))


def pad_geom4(h: int, w: int) -> tuple[int, int, int, int, int, int]:
    """(tile_h, tile_w, nth, ntw, hp, wp) of a level's padded layout.

    Column tiling picks the cheapest uniform 128-multiple tile no wider
    than TILE_W4, minimising total processed columns ntw*(tile_w + halos)
    — 1920 tiles as 2x1024 — except that a single 256-aligned tile up to
    1280 wide wins outright when it fits (1280 -> 1x1280: fewer processed
    columns than 2x640 AND the v5 fused-YUV path stays available; measured
    7.42 vs 8.16 ms/b8 at 720p)."""
    tile_h = min(TILE_H4, _round_up(h, 8))
    wr = _round_up(w, 128)
    if wr <= TILE_W4:
        tile_w, ntw = wr, 1
    elif wr <= 1280 and wr % 256 == 0:
        # A single slightly-over-budget tile beats splitting when it is
        # both cheaper in processed columns (1280: 1x1536 vs 2x896) and
        # 256-aligned, which keeps the conversion-fused v5 scale-0 path
        # available (its chroma tiles need 128-lane alignment at half
        # width) — 1280x720 would otherwise fall back to producer + v4.
        tile_w, ntw = wr, 1
    else:
        best = None
        for n in range(2, -(-w // 128) + 1):
            t = _round_up(-(-w // n), 128)
            if t > TILE_W4:
                # The 720p exception, multi-tile form: allow a 256-aligned
                # tile up to TILE_W4_OVER (1280 default) when it cuts the
                # total processed columns — at 3840 the 3x1280 grid costs
                # 4608 columns vs 4x960's 4864 AND keeps the 256-alignment
                # the fused-YUV producer and emit DMAs want (round-5 4K
                # sweep; TM_TILE_W4_OVER=1024 restores the old grid).
                t = _round_up(-(-w // n), 256)
                if t > TILE_W4_OVER or t % 256:
                    continue
            cost = n * (t + 2 * COL_HALO4)
            if best is None or cost < best[0]:
                best = (cost, t, n)
        _, tile_w, ntw = best
    nth = -(-h // tile_h)
    hp = ROW_HALO4 + nth * tile_h + ROW_HALO4
    wp = COL_HALO4 + ntw * tile_w + COL_HALO4
    return tile_h, tile_w, nth, ntw, hp, wp


def pad_to_layout4(lin: jax.Array, h: int, w: int) -> jax.Array:
    """Host-side fallback producer: zero-pad (..., h, w) into the layout."""
    _, _, _, _, hp, wp = pad_geom4(h, w)
    return jnp.pad(
        lin,
        [(0, 0)] * (lin.ndim - 2)
        + [
            (ROW_HALO4, hp - h - ROW_HALO4),
            (COL_HALO4, wp - w - COL_HALO4),
        ],
    )


# -- manual 3-pass bf16 matmuls (Precision.HIGH, which Mosaic lacks) ---------
#
# Split x = hi + lo with hi = bf16(x), lo = bf16(x - hi); then
# x @ W = hi@Whi + lo@Whi + hi@Wlo + O(2^-16) — three bf16 MXU passes at
# full bf16 rate instead of HIGHEST's six, ~1e-6 relative error (the same
# magnitude as the kernel's pow-based cube root).

_W_CHUNK = 128  # output columns per W-pass matmul chunk
_W_WIN = COL_HALO4 + 2 * _W_CHUNK  # 128-aligned input window per chunk


def _split_bf16(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_np(m: np.ndarray) -> np.ndarray:
    """(2, ...) bf16 hi/lo split of a host matrix (via float32 round trip)."""
    import ml_dtypes

    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([hi, lo])


def _tap_limbs_zs(taps) -> tuple[np.ndarray, np.ndarray]:
    """bf16-exact (hi, lo) f64 tap limbs with sum(lo) driven toward 0.

    With the lo x lo cross-term dots dropped (BAND_LOLO=False), the data's
    lo limb sees the filter hi while its hi limb sees hi + lo; any nonzero
    sum(lo) is then an effective TAP-SUM mismatch between the two data
    limbs, which the score punishes brutally (~0.05 per 1.3e-6 of sum
    delta, job 203: natural split = 0.0144 score delta).  Greedy single-ulp
    flips steer the hi rounding so the residual sums to ~0 (each flipped
    residual is still captured exactly by lo, so tap SHAPE error stays
    ~2^-17), then micro-flips on lo push |sum(lo)| to the lo-ulp level
    (~1e-9): both data limbs see the same effective sum and the standing
    kappa correction applies to both."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    t = np.asarray(taps, np.float64)
    n = t.size

    def q(v):
        return np.asarray(v, np.float32).astype(bf).astype(np.float64)

    def adj(v, up: bool) -> float:
        a = np.asarray([v], np.float32).astype(bf)
        if float(a[0]) == 0.0:
            bits = np.asarray([0x0001 if up else 0x8001], np.uint16)
        else:
            b = a.view(np.uint16)
            neg = bool(b[0] & np.uint16(0x8000))
            bits = b + np.uint16(1) if (up != neg) else b - np.uint16(1)
        return float(bits.view(bf)[0])

    hi = q(t)
    for _ in range(4 * n):
        e = (t - hi).sum()
        best = (abs(e), None, 0.0)
        for k in range(n):
            cand = adj(hi[k], e > 0)
            if abs(t[k] - cand) > abs(t[k]) * 2.0**-6:
                continue  # keep the residual within lo's exact range
            e2 = abs(e - (cand - hi[k]))
            if e2 < best[0]:
                best = (e2, k, cand)
        if best[1] is None:
            break
        hi[best[1]] = best[2]
    lo = q(t - hi)
    for _ in range(4 * n):
        e = lo.sum()
        best = (abs(e), None, 0.0)
        for k in range(n):
            cand = adj(lo[k], e < 0)
            e2 = abs(e + (cand - lo[k]))
            if e2 < best[0]:
                best = (e2, k, cand)
        if best[1] is None:
            break
        lo[best[1]] = best[2]
    return hi, lo


def _split_band_zs(build, taps) -> np.ndarray:
    """(2, ...) bf16 band-matrix limb stack from the zero-sum tap limbs:
    ``build(tap_vector)`` must place its (bf16-exact) entries verbatim."""
    import ml_dtypes

    hi, lo = _tap_limbs_zs(taps)
    return np.stack([build(hi), build(lo)]).astype(ml_dtypes.bfloat16)


def _dot3(xhi, xlo, whi, wlo, dims):
    acc = jax.lax.dot_general(
        xhi, whi, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        xlo, whi, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        xhi, wlo, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    return acc


# Seed constant for the division-free cube root: bitcast exponent trick for
# w ~= v^(-1/3), optimized over the opsin-mix input range (max seed error
# 3.4%); three quadratic Newton iterations (all multiplies) reach f32
# rounding (max 4.3e-7 relative — the same magnitude as pow + one Newton
# step, with no transcendentals and no divides on the VPU).
_CBRT_MAGIC = np.float32(1419915940.0)  # 0x54a232a4


def _cbrt_fast(v: jax.Array) -> jax.Array:
    """cbrt(v) for v > 0 via inverse-cube-root Newton (division-free)."""
    i = jax.lax.bitcast_convert_type(v, jnp.int32).astype(jnp.float32)
    j = _CBRT_MAGIC - i * np.float32(1.0 / 3.0)
    w = jax.lax.bitcast_convert_type(j.astype(jnp.int32), jnp.float32)
    v3 = v * np.float32(1.0 / 3.0)
    for _ in range(3):
        w = w * (np.float32(4.0 / 3.0) - v3 * (w * w * w))
    return v * w * w


def _map_div(num: jax.Array, den: jax.Array, fastdiv: str) -> jax.Array:
    """Quotient engine for the per-pixel maps.

    'div' is the exact f32 divide (multi-pass on the VPU); 'nr1'/'nr2' use
    the VPU's approximate reciprocal plus 1 or 2 Newton refinements
    (r <- r*(2 - den*r), quadratic: eps -> eps^2), trading sub-ulp exactness
    for fewer VPU passes on the maps block, the kernel's largest VPU cost.
    The maps' quotients feed pixel averages, so the ~1e-10 ('nr2') relative
    error is far below the score parity gates (tools/tpu_parity_check.py)."""
    if fastdiv == "div":
        return num / den
    r = pl.reciprocal(den, approx=True)
    r = r * (jnp.float32(2.0) - den * r)
    if fastdiv == "nr2":
        r = r * (jnp.float32(2.0) - den * r)
    return num * r


def _band_matrix_wchunk(taps) -> np.ndarray:
    """(W_WIN, 128) band matrix; the same matrix serves every 128-aligned
    W-pass chunk: chunk j consumes padded cols [128j, 128j + W_WIN) and
    yields blurred cols [128j, 128(j+1)) of the tile interior."""
    m = np.zeros((_W_WIN, _W_CHUNK), np.float32)
    c = np.arange(_W_CHUNK)
    for k, t in enumerate(taps):
        m[COL_HALO4 - RADIUS + c + k, c] = np.float32(t)
    return m


# Transposed W pass ('mxuT'): transpose the H-blurred tile so the lane axis
# becomes the sublane axis, then blur with chunked LEFT band matmuls.  Chunk
# windows on the sublane axis only need 8-alignment (not 128), so each
# 128-output chunk reads a 144-row window — 144 MACs/output instead of the
# lane-aligned right-multiply's 320 (_W_WIN), making even the f32-exact
# HIGHEST W pass affordable on the MXU.
_WT_CHUNK = 128  # output rows (blurred columns) per chunk
_WT_WIN = 144  # 8-aligned input window: 128 outputs + 10 halo + align slack


def _band_matrix_wt(taps, chunk: int = _WT_CHUNK, win: int = _WT_WIN) -> np.ndarray:
    """(chunk, win) left band matrix for the transposed W pass: chunk j
    yields blurred cols [chunk*j, chunk*(j+1)) from transposed-input rows
    [chunk*j + COL_HALO4 - 8, ... + win); the same matrix serves every
    chunk."""
    m = np.zeros((chunk, win), np.float32)
    r = np.arange(chunk)
    for k, t in enumerate(taps):
        # Output col chunk*j+r = sum_k taps[k] * q[chunk*j + r + COL_HALO4
        # - 5 + k] and the window starts at chunk*j + COL_HALO4 - 8.
        m[r, r + 8 - RADIUS + k] = np.float32(t)
    return m


def _mxuc_w_band(taps, w_layout: str) -> np.ndarray:
    """(2, ...) bf16-limb W band matrix for the mxuC engine's W layout:
    't' = transposed 128-chunks (144 MACs/output), 't256' = transposed
    256-chunks (half the matmul instructions, ~1.9x the MACs), 't64'/'t32'
    = smaller chunks with tighter windows (80/48-wide = 45/67% fewer MACs,
    2/4x the matmul instructions), 'r' = natural-orientation
    right-multiply (no transposes, ~2.7x the MACs)."""
    if w_layout == "r":
        return _split_band_zs(_band_matrix_wchunk, taps)
    if w_layout == "t256":
        return _split_band_zs(lambda tp: _band_matrix_wt(tp, 256, 272), taps)
    if w_layout == "t64":
        return _split_band_zs(lambda tp: _band_matrix_wt(tp, 64, 80), taps)
    if w_layout == "t32":
        return _split_band_zs(lambda tp: _band_matrix_wt(tp, 32, 48), taps)
    return _split_band_zs(_band_matrix_wt, taps)


def _maps_and_sums(
    out_ref, xyb_channel, blur, valid, tile_h, tile_w, blur_all=None,
    fastdiv="div",
):
    """Shared per-channel tail of the scale kernels: XYB pair -> 4 blurs
    (s11+s22 collapsed by linearity) -> modified-SSIM + edge-difference
    maps -> masked partial sums into out_ref[0,0,0,c,:].

    With ``blur_all`` (the packed MXU engine) all 12 blur quantities go
    through the blur stage together — few large matmuls instead of 12x
    small ones."""
    out_ref[...] = jnp.zeros_like(out_ref)
    one = jnp.float32(1.0)
    mask = jax.lax.slice(
        valid, (ROW_HALO4, COL_HALO4), (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
    )
    xybs = []
    blurred = None
    if blur_all is not None:
        quantities = []
        for c in range(3):
            a = xyb_channel(0, c)
            b = xyb_channel(1, c)
            xybs.append((a, b))
            quantities += [a, b, a * a + b * b, a * b]
        blurred = blur_all(quantities)
    for c in range(3):
        if blurred is not None:
            a, b = xybs[c]
            mu1, mu2, s_sum, s12 = blurred[4 * c : 4 * c + 4]
        else:
            a = xyb_channel(0, c)
            b = xyb_channel(1, c)
            mu1, mu2, s_sum, s12 = (blur(q) for q in (a, b, a * a + b * b, a * b))

        i1 = jax.lax.slice(
            a, (ROW_HALO4, COL_HALO4), (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
        )
        i2 = jax.lax.slice(
            b, (ROW_HALO4, COL_HALO4), (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
        )

        mu12 = mu1 * mu2
        mu_diff = mu1 - mu2
        num_m = one - mu_diff * mu_diff
        num_s = jnp.float32(2.0) * (s12 - mu12) + C2
        denom_s = (s_sum - mu1 * mu1 - mu2 * mu2) + C2
        d = jnp.maximum(_map_div(denom_s - num_m * num_s, denom_s, fastdiv), 0.0)

        aa = jnp.abs(i2 - mu2)
        bb2 = jnp.abs(i1 - mu1)
        d1m = _map_div(aa - bb2, one + bb2, fastdiv)
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


# Number of bf16 limbs carrying the BAND matrices (the blur taps), read at
# trace time by _blur_pack_mxuC and _tapsum_kappa.  2 (default) is the
# consistent-limb scheme: taps exact to 2^-17, kappa matches the tap sum,
# measured score delta <= 0.002.  1 drops the lo-limb MXU passes — the H
# pass goes 4->2 dots (A group) / 5->3 (B group) and the W pass 5->3 — at
# the cost of a ~2^-8 per-tap SHAPE perturbation (still sum-matched by
# kappa, still the same filter for every quantity, so the cancellation
# argument holds; the filter itself is slightly different).  Experimental
# knob: flip only with a measured score delta inside the 0.05 budget.
BAND_LIMBS: int = int(os.environ.get("TM_BAND_LIMBS", "2"))

# Keep the lo-matrix x lo-data cross terms (hm1@pa1, hm1@pb1, w1@x1) in the
# 2-limb scheme.  Those products are O(2^-17) relative — the same order as
# the 2-limb tap representation error itself — yet they cost 3 of the 14
# MXU dots per tile (H-A 4->3, H-B 5->4, W 5->4 when dropped).  The
# highest-order lo term of each pass (lo-matrix x hi-data) is always kept,
# which is what separates this from BAND_LIMBS=1 (score delta 0.0079,
# job 201); dropping only lo x lo measured a score delta of ~1e-4.
BAND_LOLO: bool = os.environ.get("TM_BAND_LOLO", "0") == "1"


def _tapsum_kappa(taps) -> float:
    """Exact post-blur rescale for the limb-truncated tap representation.

    The variance/covariance maps are (linear blur) - (bilinear mu products),
    so they are NOT invariant to the blur's tap sum: a filter-sum
    perturbation eps biases var by ~ -eps * mu^2 against C2 ~ 9e-4, and the
    score's measured sensitivity is ~0.05 per 1.3e-6 of tap-sum delta.  The
    BAND_LIMBS-limb bf16 taps sum to s_l != the f32 taps' sum, so the
    blurred pack is rescaled by (s_f32 / s_l)^2 (both separable passes),
    matching the oracle's effective filter sum to f64 accuracy; the
    remaining per-tap shape difference (2^-17 at 2 limbs, sum-matched) is
    harmless.  Computed from the SAME zero-sum limbs the band matrices are
    built from (_tap_limbs_zs), so the correction matches the kernel's
    actual filter."""
    hi, lo = _tap_limbs_zs(taps)
    s2l = hi.sum() if BAND_LIMBS == 1 else (hi + lo).sum()
    sf = np.asarray(taps, np.float32).astype(np.float64).sum()
    return float((sf / s2l) ** 2)


def _split2(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    h = x.astype(jnp.bfloat16)
    l = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, l


def _split3(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _pack_layout(needs):
    """mxuC pack layout under a ``needs`` mask (see weight_needs in
    models/ssimulacra2_score.py): the tuple of active channels (any sum
    needed — mu blurs + interiors) and the subset that needs the
    modified-SSIM map (product blurs s_sum/s12).  ``needs=None`` means
    full compute: all three channels in both groups."""
    if needs is None:
        needs = ((True,) * 6,) * 3
    act = tuple(c for c in range(3) if any(needs[c]))
    ssim = tuple(c for c in act if needs[c][0] or needs[c][1])
    return act, ssim


def _blur_pack_mxuC(
    xyb_channel, hmat2, wt2, tile_h, tile_w,
    rows, cols, kappa, row0, col0, h, w, w_layout="t", tick=None,
    needs=None,
):
    """Front half of the mxuC engine (see _maps_and_sums_consistent for the
    numeric design): consistent-limb splits + H band matmuls + W band
    matmuls, returning the blurred pack in natural orientation
    (12*tile_h, tile_w) and the interiors pack (6*tile_h, tile_w).

    ``tick()`` (if given) is invoked right after each MXU dot is emitted —
    the pipelined kernels use it to interleave an *independent* VPU stream
    (the previous tile's maps) between the dots at trace-program order, so
    Mosaic's scheduler (whose reordering window is local — measured in
    /tmp diagnostics: adjacent independent MXU/VPU work overlaps ~fully,
    program-order-distant work not at all) can run the MXU passes under
    the VPU maps.

    ``needs`` (weight_needs entry) statically drops zero-weighted work:
    channels outside the active set contribute nothing (no xyb, no blur),
    and the product blurs (group B) exist only for channels whose
    modified-SSIM map has a nonzero weight — at scale 0 that is ONE of the
    three channels, shrinking the pack from 12 to 8 blurred quantities and
    skipping two channels' products + 3-limb splits outright."""
    def _tick():
        if tick is not None:
            next(tick, None)

    act, ssim_ch = _pack_layout(needs)
    apos = {c: i for i, c in enumerate(act)}

    if hmat2.shape[1] == tile_h:
        # Fold row validity (blur zero-extension at image borders) into the
        # fat H band limbs; the chunked-H branch folds per window instead.
        gr = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1) + (
            row0 - ROW_HALO4
        )
        rvm = ((gr >= 0) & (gr < h)).astype(jnp.bfloat16)
        hm0, hm1 = hmat2[0] * rvm, hmat2[1] * rvm  # (tile_h, rows) limbs
    w0, w1 = wt2[0], wt2[1]  # (WT_CHUNK, WT_WIN) bf16 limbs
    dims = (((1,), (0,)), ((), ()))

    def dot(a, b):
        out = jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )
        _tick()
        return out

    # Group A: 2-limb xyb quantities, consistent values ah (UNmasked —
    # validity is folded into the band matrices).
    def _splits(*xybs):
        a0s, a1s, ahs = [], [], []
        for k in range(len(act) * 2):
            h0, l0 = _split2(xybs[k])
            a0s.append(h0)
            a1s.append(l0)
            ahs.append(h0.astype(jnp.float32) + l0.astype(jnp.float32))
        # Group B: products of consistent values, exact 3-limb split.
        b0s, b1s, b2s = [], [], []
        for c in ssim_ch:
            ah, bh = ahs[2 * apos[c]], ahs[2 * apos[c] + 1]
            for q in (ah * ah + bh * bh, ah * bh):
                q0, q1, q2 = _split3(q)
                b0s.append(q0)
                b1s.append(q1)
                b2s.append(q2)
        # H-pass operands: lane-packed over the active quantities.
        return (
            jnp.concatenate(a0s, axis=1),  # (rows, na*cols) bf16
            jnp.concatenate(a1s, axis=1),
            jnp.concatenate(b0s, axis=1) if b0s else None,
            jnp.concatenate(b1s, axis=1) if b0s else None,
            jnp.concatenate(b2s, axis=1) if b0s else None,
            tuple(ahs),
        )

    pa0, pa1, pb0, pb1, pb2, ahs = _dup(
        "packS",
        _splits,
        *[xyb_channel(idx, c, masked=False) for c in act for idx in (0, 1)],
    )
    na, nb = 2 * len(act), 2 * len(ssim_ch)
    hch = hmat2.shape[1]

    def _h_pass(pa0, pa1, pb0, pb1, pb2):
        if hch < tile_h:
            # Chunked H pass ('h16'/'h32'): the band is Toeplitz, so one
            # tiny (hch, hch+16) matrix serves every output-row chunk with
            # a tight window — same nonzero terms as the fat (tile_h, rows)
            # band at a fraction of its MACs (fat: rows MACs/output;
            # chunked: hch+16).
            hwin = hmat2.shape[2]
            ha_cs, hb_cs = [], []
            for ci in range(tile_h // hch):
                s = ci * hch
                grc = jax.lax.broadcasted_iota(jnp.int32, (1, hwin), 1) + (
                    row0 - ROW_HALO4 + s
                )
                rvc = ((grc >= 0) & (grc < h)).astype(jnp.bfloat16)
                hm0c, hm1c = hmat2[0] * rvc, hmat2[1] * rvc

                def slr(t, s=s, hwin=hwin):
                    return jax.lax.slice(t, (s, 0), (s + hwin, t.shape[1]))

                pa0c, pa1c = slr(pa0), slr(pa1)
                ha_c = dot(hm0c, pa0c) + dot(hm0c, pa1c)
                if BAND_LIMBS == 2:
                    ha_c = ha_c + dot(hm1c, pa0c)
                    if BAND_LOLO:
                        ha_c = ha_c + dot(hm1c, pa1c)
                ha_cs.append(ha_c)
                if nb:
                    pb0c, pb1c, pb2c = slr(pb0), slr(pb1), slr(pb2)
                    hb_c = dot(hm0c, pb0c) + dot(hm0c, pb1c) + dot(hm0c, pb2c)
                    if BAND_LIMBS == 2:
                        hb_c = hb_c + dot(hm1c, pb0c)
                        if BAND_LOLO:
                            hb_c = hb_c + dot(hm1c, pb1c)
                    hb_cs.append(hb_c)
            return (
                jnp.concatenate(ha_cs, axis=0),
                jnp.concatenate(hb_cs, axis=0) if nb else None,
            )
        hae = dot(hm0, pa0) + dot(hm0, pa1)
        if BAND_LIMBS == 2:
            hae = hae + dot(hm1, pa0)
            if BAND_LOLO:
                hae = hae + dot(hm1, pa1)
        hbe = None
        if nb:
            hbe = dot(hm0, pb0) + dot(hm0, pb1) + dot(hm0, pb2)
            if BAND_LIMBS == 2:
                hbe = hbe + dot(hm1, pb0)
                if BAND_LOLO:
                    hbe = hbe + dot(hm1, pb1)
        return hae, hbe

    ha, hb = _dup("blurH", _h_pass, pa0, pa1, pb0, pb1, pb2)

    # Repack quantity segments along sublanes.
    segs = [
        jax.lax.slice(ha, (0, i * cols), (tile_h, (i + 1) * cols))
        for i in range(na)
    ] + [
        jax.lax.slice(hb, (0, i * cols), (tile_h, (i + 1) * cols))
        for i in range(nb)
    ]
    nq = (na + nb) * tile_h
    if w_layout == "r":
        # Right-multiply W pass: no transposes at all — the sublane pack
        # stays in natural orientation and each 128-aligned lane window is
        # band-matmuled from the right ((nq, win) @ (win, chunk)).  More
        # MXU MACs per output than the transposed form (the window must be
        # 128-lane aligned), zero VPU transpose work.
        ps = jnp.concatenate(segs, axis=0)  # (12*tile_h, cols)
        s0_, s1_, s2_ = _split3(ps)
        win, chunk = wt2.shape[1], wt2.shape[2]
        chunks = []
        for j in range(tile_w // chunk):
            s = j * chunk
            # Window element k sits at global column col0 - COL_HALO4 +
            # j*chunk + k; fold validity into the band rows.
            gc = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0) + (
                col0 - COL_HALO4 + s
            )
            cvm = ((gc >= 0) & (gc < w)).astype(jnp.bfloat16)
            w0j, w1j = w0 * cvm, w1 * cvm

            def sl(t, s=s):
                return jax.lax.slice(t, (0, s), (nq, s + win))

            x0, x1, x2 = sl(s0_), sl(s1_), sl(s2_)
            c_ = dot(x0, w0j) + dot(x1, w0j) + dot(x2, w0j)
            if BAND_LIMBS == 2:
                c_ = c_ + dot(x0, w1j)
                if BAND_LOLO:
                    c_ = c_ + dot(x1, w1j)
            chunks.append(c_)
        wt_nat = jnp.concatenate(chunks, axis=1) * jnp.float32(kappa)
    else:
        # Transposed W pass ('t'): ONE transpose in, chunk windows need only
        # 8-sublane alignment (144 MACs/output), ONE transpose back.
        pt = _dup(
            "packT", lambda s_: s_.T, jnp.concatenate(segs, axis=0)
        )  # (cols, 12*tile_h)

        def _w_pass(pt_):
            t0, t1, t2 = _split3(pt_)
            chunk, win = wt2.shape[1], wt2.shape[2]
            chunks = []
            for j in range(tile_w // chunk):
                s = j * chunk + COL_HALO4 - 8
                # Column validity folded into this chunk's W band limbs
                # (window element k sits at global column
                # col0 - 8 + j*chunk + k).
                gc = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1) + (
                    col0 + j * chunk - 8
                )
                cvm = ((gc >= 0) & (gc < w)).astype(jnp.bfloat16)
                w0j, w1j = w0 * cvm, w1 * cvm

                def sl(t, s=s):
                    return jax.lax.slice(t, (s, 0), (s + win, nq))

                x0, x1, x2 = sl(t0), sl(t1), sl(t2)
                c_ = dot(w0j, x0) + dot(w0j, x1) + dot(w0j, x2)
                if BAND_LIMBS == 2:
                    c_ = c_ + dot(w1j, x0)
                    if BAND_LOLO:
                        c_ = c_ + dot(w1j, x1)
                chunks.append(c_)
            return jnp.concatenate(chunks, axis=0)

        # kappa matches the 2-limb filter's sum to the oracle's f32 taps
        # (_tapsum_kappa); the back-transpose restores full-lane orientation.
        wt_nat = _dup(
            "packT2",
            lambda v: v.T,
            _dup("blurW", _w_pass, pt) * jnp.float32(kappa),
        )

    lo = (ROW_HALO4, COL_HALO4)
    hi_ = (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
    interiors = [jax.lax.slice(a, lo, hi_) for a in ahs]
    return wt_nat, interiors


def _interior_mask(tile_h, tile_w, row0, col0, h, w):
    """0/1 f32 mask of in-image positions for a tile's interior (interior
    globals are always >= 0, so only the upper bounds are tested)."""
    mri = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + row0
    mci = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + col0
    return ((mri < h) & (mci < w)).astype(jnp.float32)


def _maps_sums_gen(
    bq, iq, mask, tile_h, tile_w, fastdiv, cw, sum_fn, finish, needs=None,
):
    """Generator over the mxuC maps stage: per (channel, column-chunk) unit
    of VPU work, yielding once before each unit so a pipelined caller can
    interleave the units between another tile's MXU dots.  ``bq(i)``/
    ``iq(i)`` return blurred quantity / interior i as (tile_h, tile_w);
    ``finish(all_accs)`` consumes the 3x6 sums.

    ``needs`` (weight_needs entry) statically gates the per-channel map
    math and reductions to the nonzero-weighted sub-scores; skipped sums
    finish as exact 0.0.  The pack indexing follows _pack_layout: group A
    (mu blurs) covers the active channels, group B (s_sum/s12) only the
    ssim channels."""
    one = jnp.float32(1.0)
    act, ssim_ch = _pack_layout(needs)
    apos = {c: i for i, c in enumerate(act)}
    spos = {c: i for i, c in enumerate(ssim_ch)}
    na = 2 * len(act)
    if needs is None:
        needs = ((True,) * 6,) * 3
    all_accs = []
    for c in range(3):
        accs = [jnp.float32(0.0)] * 6
        if c not in apos:
            all_accs.append(accs)
            continue
        need_ssim = needs[c][0] or needs[c][1]
        need_art = needs[c][2] or needs[c][3]
        need_det = needs[c][4] or needs[c][5]
        mu1f, mu2f = bq(2 * apos[c]), bq(2 * apos[c] + 1)
        if need_ssim:
            s_sumf, s12f = bq(na + 2 * spos[c]), bq(na + 2 * spos[c] + 1)
        i1f, i2f = iq(2 * apos[c]), iq(2 * apos[c] + 1)
        for j0 in range(0, tile_w, cw):
            yield
            def sl(t, j0=j0):
                return jax.lax.slice(t, (0, j0), (tile_h, j0 + cw))

            msk = sl(mask)

            def _map_chunk(mu1, mu2, i1, i2, *ss):
                maps6 = [None] * 6
                if need_ssim:
                    s_sum, s12 = ss
                    mu12 = mu1 * mu2
                    mu_diff = mu1 - mu2
                    num_m = one - mu_diff * mu_diff
                    num_s = jnp.float32(2.0) * (s12 - mu12) + C2
                    denom_s = (s_sum - mu1 * mu1 - mu2 * mu2) + C2
                    d = jnp.maximum(
                        _map_div(denom_s - num_m * num_s, denom_s, fastdiv),
                        0.0,
                    ) * msk
                    d2 = d * d
                    maps6[0], maps6[1] = d, d2 * d2

                if need_art or need_det:
                    aa = jnp.abs(i2 - mu2)
                    bb2 = jnp.abs(i1 - mu1)
                    # Masking d1m once replaces masking art and det
                    # separately: max(x*m, 0) == max(x, 0)*m for m in {0, 1}.
                    d1m = _map_div(aa - bb2, one + bb2, fastdiv) * msk
                    if need_art:
                        art = jnp.maximum(d1m, 0.0)
                        art2 = art * art
                        maps6[2], maps6[3] = art, art2 * art2
                    if need_det:
                        det = jnp.maximum(-d1m, 0.0)
                        det2 = det * det
                        maps6[4], maps6[5] = det, det2 * det2
                return tuple(maps6)

            maps6 = _dup(
                "maps",
                _map_chunk,
                sl(mu1f), sl(mu2f), sl(i1f), sl(i2f),
                *((sl(s_sumf), sl(s12f)) if need_ssim else ()),
            )

            for k in range(6):
                if needs[c][k]:
                    accs[k] = accs[k] + sum_fn(maps6[k])
        all_accs.append(accs)
    finish(all_accs)


# Dev-only stage-knockout knob for on-chip cost attribution (perf lab /
# /tmp/tpu_jobs): 'maps' skips the maps+sums stage (zeros written), 'blur'
# replaces the whole splits/H/W machinery with a fake pack built from the
# xyb interiors (data-dependent, so nothing constant-folds).  Scores are
# meaningless under any skip; never set outside timing experiments.
DEBUG_SKIP: frozenset = frozenset()

# Dev-only stage-DUPLICATION knob: the finer attribution instrument that
# replaced DEBUG_SKIP knockouts after they saturated in round 4 (the
# DCE-safe fake consumer became slower than the real maps, and knockouts
# disable needs-gating, so sub-ms stage costs were unresolvable).  A stage
# named in DEBUG_DUP is evaluated a SECOND time on a multiplicatively
# perturbed copy of its inputs (perturbation defeats CSE) and the two
# results are averaged, so needs-gating, the DMA pattern and every
# downstream consumer stay exactly as in the default build.  The stage's
# marginal cost is then t(DEBUG_DUP={stage}) - t(DEBUG_DUP=set()), always
# >= 0 up to scheduler overlap (a stage that hides under DMA or MXU/VPU
# overlap shows a marginal below its issue cost — that is the quantity
# that matters for optimisation anyway).  Scores shift by ~the
# perturbation (<= 2^-7 relative); never set outside timing experiments.
DEBUG_DUP: frozenset = frozenset()


def _dup_perturb(a):
    if a is None or not hasattr(a, "dtype"):
        return a
    if a.dtype == jnp.bfloat16:
        # 1 + 2^-7 is the smallest bf16-representable relative nudge.
        return a * jnp.asarray(1.0078125, jnp.bfloat16)
    return a * jnp.asarray(1.0 + 2.0 ** -20, a.dtype)


def _dup(name: str, fn, *args):
    """Evaluate ``fn(*args)``; if stage ``name`` is under DEBUG_DUP, also
    evaluate it on perturbed inputs and average (see DEBUG_DUP)."""
    out = fn(*args)
    if name not in DEBUG_DUP:
        return out
    out2 = fn(*[_dup_perturb(a) for a in args])
    return jax.tree_util.tree_map(
        lambda x, y: (x + y) * np.float32(0.5), out, out2
    )

# Column pair-sum engine for the in-kernel 2x2-mean downscale emission
# (see _emit_ds_tiles): 'highest' = dense f32 selection matmul (6 MXU
# passes); 'limb3p' = dense bf16 0/1 matrix x exact 3-limb split (3
# single-pass matmuls, half the MACs); 'limb3cp' = 'limb3p' with the
# Toeplitz structure sliced into (256, 128) windows (1/8 the MACs).
# All engines operate on the six planes packed into one tall operand.
# Module-level knob (not a kwarg) because every caller wants the same
# engine; overridable for A/B jobs and the parity tests.  Default
# 'limb3cp' measured 8.35 vs 9.05 ms/b8 packed-HIGHEST on chip (job 032)
# at 1.2e-7 ds parity.
DS_ENGINE: str = os.environ.get("TM_DS_ENGINE", "limb3cp")

# Sum engine for the maps reductions.  The 030 attribution job measured the
# 18 per-tile full-array jnp.sum reductions at 3.31 ms of the 9.1 ms b8
# step — 5.5x the maps math they reduce (0.6 ms): Mosaic lowers a full
# (64, 1024) reduction with cross-lane work per vreg.  'vreg' accumulates
# the (8, 128) vreg-grid elementwise (63 lane-aligned adds, no cross-lane
# ops) and defers the single cross-lane reduce to one (8, 128) jnp.sum per
# (tile, quantity) in finish().  Sums differ from 'full' only by f32
# summation order (~1e-7 rel).  Measured neutral on chip (9.09 vs 9.14
# ms/b8, job 032): the 030 'sums 3.31 ms' attribution was an artifact —
# the single-vreg knockout let Mosaic dead-code-eliminate 63/64 of the
# maps MATH feeding each sum, so the cost it measured was the maps
# elementwise work, not the reductions.  Kept opt-in.
SUM_ENGINE: str = os.environ.get("TM_SUM_ENGINE", "full")


def _partial_sum(m: jax.Array):
    """Engine-internal partial sum of a (tile_h, tile_w) map: an (8, 128)
    vreg accumulator under 'vreg', a scalar otherwise (see SUM_ENGINE).

    The vreg tree is built from layout-aligned lax.slice adds (no
    relayouts, no cross-lane ops) — a reshape-based multi-axis reduce
    fails Mosaic lowering ("Invalid relayout ... replicated in
    destination"), and per-vreg cross-lane reduction is exactly the cost
    this engine removes."""
    if (
        SUM_ENGINE == "vreg"
        and m.shape[0] % 8 == 0
        and m.shape[1] % 128 == 0
    ):
        acc = None
        for i in range(m.shape[0] // 8):
            row = jax.lax.slice(m, (8 * i, 0), (8 * i + 8, m.shape[1]))
            acc = row if acc is None else acc + row
        out = None
        for j in range(m.shape[1] // 128):
            v = jax.lax.slice(acc, (0, 128 * j), (8, 128 * j + 128))
            out = v if out is None else out + v
        return out
    return jnp.sum(m)


def _fin_sum(a):
    """Finalize an accumulator from _partial_sum to a scalar."""
    return jnp.sum(a) if getattr(a, "ndim", 0) else a


def _maps_and_sums_consistent(
    out_ref, xyb_channel, hmat2, wt2, tile_h, tile_w,
    rows, cols, kappa, row0, col0, h, w, fastdiv="div",
    map_chunk=0, mxu_sums=False, w_layout="t", return_sums=False,
    needs=None,
):
    """Consistent-limb packed MXU blur ('mxuC'): HIGHEST-class accuracy at
    bf16-pass cost.

    The manual bf16 3-pass blur drifts 0.01-0.03 at score level because the
    SSIM covariances/variances are *differences* of blurred quantities: any
    data-dependent rounding between the blur inputs breaks the cancellation
    and eps ~ 2^-17 input rounding is amplified by fullscale/variance.  The
    fix here is exact consistency, not higher precision everywhere:

      * each xyb quantity is replaced by its exact 2-limb bf16 value
        ah = hi + lo, and ah is used EVERYWHERE (interiors, products);
      * the H pass computes blur(ah) EXACTLY with 4 bf16 passes
        (hi/lo x hmat hi/lo; every bf16 x bf16 product is exact in f32);
      * the products ah^2 + bh^2, ah*bh (f32, 2^-24) enter H via their
        exact 3-limb split — 5 passes, dropping only the 2^-25 limb2 x lo
        term;
      * the W pass must be exact-linear on the arbitrary-f32 H output, so
        it uses a 3-limb split x 2-limb band (5 passes) — and runs on the
        TRANSPOSED pack, where chunk windows need only 8-alignment:
        144 MACs/output instead of the lane-aligned 320.

    Every blurred quantity is then (blur-with-2-limb-taps applied exactly)
    + O(2^-24), so all cancellations hold to f32 accuracy; the 2^-17 tap
    perturbation is a consistent filter change, which cancellations are
    algebraically immune to (up to the filter-sum quadratic term, matched
    by kappa).  The blurred pack is transposed BACK before the maps: in the
    transposed orientation every per-quantity array is (tile_w, tile_h
    = 64) — half-empty vregs — and the ~25-op map math at 50% lane
    utilization measured 2 ms/b4, a third of the whole kernel.  One big
    back-transpose restores full-lane (tile_h, tile_w) maps and lets the
    interiors/mask come straight from the natural-orientation arrays.

    With ``return_sums`` the per-channel sum lists are returned instead of
    written to ``out_ref`` (for callers that accumulate across tiles, e.g.
    the full-pyramid tail).

    Validity masking is FOLDED INTO THE BAND MATRICES: zeroing an
    out-of-image row of the xyb inputs equals zeroing the matching hmat
    column, and zeroing an out-of-image column equals zeroing the matching
    W-window column — 0/1 bf16 multiplies on the tiny (tile_h, rows) and
    (WT_CHUNK, WT_WIN) operands are exact on the limbs, so the blur output
    is BIT-IDENTICAL to masking the six full (rows, cols) xyb arrays while
    skipping those 6 full-size VPU multiplies and the full-size validity
    iota.  Only the small interior mask on the final maps remains.
    """
    if not return_sums:
        out_ref[...] = jnp.zeros_like(out_ref)
    if DEBUG_SKIP:
        # Attribution knockouts measure the FULL engine; a needs mask would
        # change the work being attributed (scores are meaningless anyway).
        needs = None
    if "blur" in DEBUG_SKIP:
        lo = (ROW_HALO4, COL_HALO4)
        hi_ = (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
        interiors = [
            jax.lax.slice(xyb_channel(idx, c, masked=False), lo, hi_)
            for c in range(3) for idx in (0, 1)
        ]
        # Distinct scale factors so no fake quantity aliases another SSA
        # value — identical values let the compiler fold |i - mu| = 0 and
        # delete half the maps, corrupting the attribution.
        wt_nat = jnp.concatenate(
            [q * np.float32(1.0 + 0.01 * k)
             for k, q in enumerate(interiors + interiors)],
            axis=0,
        )
    else:
        wt_nat, interiors = _blur_pack_mxuC(
            xyb_channel, hmat2, wt2, tile_h, tile_w, rows, cols,
            kappa, row0, col0, h, w, w_layout=w_layout, needs=needs,
        )
    if "maps" in DEBUG_SKIP:
        # DCE-safe fake maps: consume EVERY element of the pack and the
        # interiors with the same 18 full-array reductions the real maps
        # end in, skipping only the ~35 elementwise map ops.  (A fake that
        # samples one element lets Mosaic dead-code-eliminate most of the
        # blur feeding it — the round-3 'sums 3.31 ms' artifact.)
        lo = (ROW_HALO4, COL_HALO4)
        hi_ = (ROW_HALO4 + tile_h, COL_HALO4 + tile_w)
        sums18 = [
            jnp.sum(
                jax.lax.slice(
                    wt_nat, (i * tile_h, 0), ((i + 1) * tile_h, tile_w)
                )
            )
            for i in range(12)
        ] + [
            jnp.sum(jax.lax.slice(xyb_channel(idx, c, masked=False), lo, hi_))
            for c in range(3)
            for idx in (0, 1)
        ]
        if return_sums:
            return [sums18[6 * c: 6 * c + 6] for c in range(3)]
        for c in range(3):
            out_ref[0, 0, 0, c, :] = jnp.stack(
                sums18[6 * c: 6 * c + 6]
                + [jnp.float32(0.0), jnp.float32(0.0)]
            )
        return

    def bq(i):  # blurred quantity i, natural (tile_h, tile_w)
        return jax.lax.slice(
            wt_nat, (i * tile_h, 0), ((i + 1) * tile_h, tile_w)
        )

    def iq(i):  # interior of the consistent value, natural orientation
        return interiors[i]

    mask = _interior_mask(tile_h, tile_w, row0, col0, h, w)

    # Sum engine: 'mxu_sums' rides the row reduction on the MXU (exact —
    # 1.0 x f32 products at HIGHEST, f32 accumulator) leaving only a
    # (1, width) lane reduction for the VPU; 'map_chunk' processes the maps
    # in lane chunks to shrink the live vreg set (spill traffic).
    ones_row = jnp.ones((1, tile_h), jnp.float32)
    dims = (((1,), (0,)), ((), ()))

    def _sum(m):
        if "sums" in DEBUG_SKIP:
            # Attribution knockout: reduce one vreg instead of the full
            # map (64x less reduced data; keeps the maps math alive).
            return jnp.sum(jax.lax.slice(m, (0, 0), (8, 128)))
        if not mxu_sums:
            return _dup("sums", _partial_sum, m)
        r = jax.lax.dot_general(
            ones_row, m, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(r)

    result = []

    def finish(all_accs):
        for c in range(3):
            fins = [_fin_sum(a) for a in all_accs[c]]
            if return_sums:
                result.append(fins)
            else:
                out_ref[0, 0, 0, c, :] = jnp.stack(
                    fins + [jnp.float32(0.0), jnp.float32(0.0)]
                )

    cw = map_chunk or tile_w
    for _ in _maps_sums_gen(
        bq, iq, mask, tile_h, tile_w, fastdiv, cw, _sum, finish,
        needs=needs,
    ):
        pass
    if return_sums:
        return result




def _maps_consistent_subtiled(
    out_ref, xyb_channel, hmat2, wt2, tile_h, tile_w,
    rows, cols, kappa, row0, col0, h, w, *, subtiles=1, fastdiv="div",
    map_chunk=0, mxu_sums=False, w_layout="t", needs=None,
):
    """mxuC maps, optionally split into ``subtiles`` independent row
    sub-chains (ILP experiment, docs/PERFORMANCE.md round-3 roadmap #2):
    each sub-chain is a complete split->H->W->maps dataflow over
    tile_h/subtiles rows, so Mosaic may overlap one sub-chain's MXU
    passes with another's VPU maps.  The xyb planes are computed ONCE on
    the full window and sliced per sub-chain; blurred values are
    bit-identical (the band windows contain the same nonzero terms), only
    the final sum order differs.  ``hmat2`` must be built for the SUB-tile
    height when subtiles > 1."""
    if subtiles <= 1:
        return _maps_and_sums_consistent(
            out_ref, xyb_channel, hmat2, wt2, tile_h, tile_w,
            rows, cols, kappa, row0, col0, h, w, fastdiv=fastdiv,
            map_chunk=map_chunk, mxu_sums=mxu_sums, w_layout=w_layout,
            needs=needs,
        )
    th2 = tile_h // subtiles
    xyb_full = {
        (idx, c): xyb_channel(idx, c, masked=False)
        for c in range(3)
        for idx in (0, 1)
    }
    totals = [[jnp.float32(0.0)] * 6 for _ in range(3)]
    for sub in range(subtiles):
        off = sub * th2

        def xyb_sub(idx, c, masked=True, _off=off):
            return jax.lax.slice(
                xyb_full[(idx, c)], (_off, 0), (_off + th2 + 16, cols)
            )

        sums = _maps_and_sums_consistent(
            None, xyb_sub, hmat2, wt2, th2, tile_w,
            th2 + 16, cols, kappa, row0 + off, col0, h, w,
            fastdiv=fastdiv, map_chunk=map_chunk, mxu_sums=mxu_sums,
            w_layout=w_layout, return_sums=True, needs=needs,
        )
        for c in range(3):
            for k in range(6):
                totals[c][k] = totals[c][k] + sums[c][k]
    out_ref[...] = jnp.zeros_like(out_ref)
    for c in range(3):
        out_ref[0, 0, 0, c, :] = jnp.stack(
            totals[c] + [jnp.float32(0.0), jnp.float32(0.0)]
        )


def _pair_sum_cols(packed, tile_w, dw, dw_p):
    """Apply the DS_ENGINE column pair-sum to a tall packed operand
    (N, tile_w) -> (N, dw_p): out[:, j] = packed[:, 2j] + packed[:, 2j+1]
    for j < dw, zeros beyond.  See _emit_ds_tiles for the engine notes."""
    n = packed.shape[0]
    dims = (((1,), (0,)), ((), ()))

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )

    engine = DS_ENGINE
    if engine == "limb3cp" and not (tile_w % 256 == 0 and dw_p == dw):
        engine = "limb3p"
    if engine == "limb3cp":
        s_chunk = (
            jax.lax.broadcasted_iota(jnp.int32, (256, 128), dimension=0) // 2
            == jax.lax.broadcasted_iota(jnp.int32, (256, 128), dimension=1)
        ).astype(jnp.bfloat16)
        r0, r1, r2 = _split3(packed)
        parts = []
        for j in range(dw // 128):
            def slc(t, j=j):
                return jax.lax.slice(t, (0, 256 * j), (n, 256 * j + 256))

            parts.append(
                bdot(slc(r0), s_chunk)
                + bdot(slc(r1), s_chunk)
                + bdot(slc(r2), s_chunk)
            )
        return jnp.concatenate(parts, axis=1)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_w, dw_p), dimension=0) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (tile_w, dw_p), dimension=1)
    )
    if engine == "limb3p":
        s_cols = sel.astype(jnp.bfloat16)
        r0, r1, r2 = _split3(packed)
        return bdot(r0, s_cols) + bdot(r1, s_cols) + bdot(r2, s_cols)
    return jax.lax.dot_general(
        packed, sel.astype(jnp.float32), dims,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _emit_ds_tiles(
    ds_ref, ds_store, ds_sems, get_plane, *,
    p, row0, col0, tile_h, tile_w, h, w, h_odd, w_odd,
):
    """Shared exact 2x2-mean downscale of the valid tile region into the
    next level's padded buffer.  ``get_plane(img, c)`` yields the linear
    (tile_h, tile_w) interior; returns the started DMA copies to wait on.

    Column pair-sum engines (``DS_ENGINE``): the selection matrix has two
    nonzeros per output column, so a dense per-plane HIGHEST matmul
    (6 MXU passes at M=32) wastes ~1500x the needed MACs — invisible
    while the kernel's MXU work hid behind the VPU blur, but the largest
    MXU block (~2 ms of the 9.1 ms b8 step) after the t64/h16 band
    chunking.  All engines pack the six planes' row sums into one tall
    (6*dh_p, tile_w) operand first (few big matmuls beat many M=32 ones —
    the unpacked chunked variant measured SLOWER than dense, 9.64 vs
    9.04 ms/b8, job 031).  'limb3p' applies the dense bf16 0/1 selection
    to the exact 3-limb split of the pack (3 single-pass matmuls, half of
    HIGHEST's MACs); 'limb3cp' additionally slices the Toeplitz structure
    into (256, 128) windows (1/8 the MACs, 3*dw/128 matmuls).  Every
    product is exact (0/1 x bf16 limb), so both match HIGHEST to 1-2
    ulps."""
    dh, dw = tile_h // 2, tile_w // 2
    dh_p = _round_up(dh, 8)
    dw_p = _round_up(dw, 128)
    # Odd-dimension correction: with zero padding, the last valid output
    # row/col of an odd input dimension sums one real sample instead of a
    # replicated pair — scale it by 2 (2x2-mean edge replication).
    rfac = jnp.float32(1.0)
    cfac = jnp.float32(1.0)
    h2 = (h + 1) // 2
    w2 = (w + 1) // 2
    if h_odd:
        rid = jax.lax.broadcasted_iota(jnp.int32, (dh_p, dw_p), 0) + row0 // 2
        rfac = jnp.where(rid == h2 - 1, jnp.float32(2.0), jnp.float32(1.0))
    if w_odd:
        cid = jax.lax.broadcasted_iota(jnp.int32, (dh_p, dw_p), 1) + col0 // 2
        cfac = jnp.where(cid == w2 - 1, jnp.float32(2.0), jnp.float32(1.0))

    def _ds_compute(*planes):
        rsums = []
        for q in planes:
            rsum = q.reshape(dh, 2, tile_w).sum(axis=1)
            if dh_p != dh:
                rsum = jnp.pad(rsum, ((0, dh_p - dh), (0, 0)))
            rsums.append(rsum)
        packed = jnp.concatenate(rsums, axis=0)  # (6*dh_p, tile_w)
        return _pair_sum_cols(packed, tile_w, dw, dw_p)

    quad_all = _dup(
        "ds",
        _ds_compute,
        *[get_plane(img_idx, c) for img_idx in (0, 1) for c in range(3)],
    )

    copies = []
    for img_idx in (0, 1):
        for c in range(3):
            slot_ = img_idx * 3 + c
            quad = jax.lax.slice(
                quad_all, (slot_ * dh_p, 0), (slot_ * dh_p + dh_p, dw_p)
            )
            ds_tile = quad * np.float32(0.25)
            if h_odd or w_odd:
                ds_tile = ds_tile * rfac * cfac
            ds_store[slot_] = ds_tile
            dst_r = pl.multiple_of(ROW_HALO4 + row0 // 2, 8)
            dst_c = pl.multiple_of(COL_HALO4 + col0 // 2, 128)
            cp = pltpu.make_async_copy(
                ds_store.at[slot_],
                ds_ref.at[
                    img_idx, p, c, pl.ds(dst_r, dh_p), pl.ds(dst_c, dw_p)
                ],
                ds_sems.at[img_idx, c],
            )
            cp.start()
            copies.append(cp)
    return copies


def _fused_scale_kernel_v4(
    *refs,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    nth: int,
    ntw: int,
    bsz: int,
    taps: tuple[float, ...],
    precision: str,
    emit_ds: bool,
    h_odd: bool,
    w_odd: bool,
    newton: bool,
    w_pass: str,
    cbrt: str,
    centered: bool,
    fastdiv: str = "div",
    map_chunk: int = 0,
    mxu_sums: bool = False,
    w_layout: str = "t",
    subtiles: int = 1,
    pipelined: bool = False,
    interleave: bool = True,
    needs: tuple | None = None,
):
    """One pyramid level: XYB + 4-blur + maps + sums, plus (emit_ds) the
    exact 2x2-mean downscale of the linear tile written straight into the
    next level's padded buffer.

    Blur passes: H is a banded matmul on the MXU (precision 'highest' =
    f32-exact 6-pass, 'bf16x3' = manual 3-pass split, ~1e-6 rel).  W is
    either 11 lane-rotated FMA sweeps on the VPU ('vpu') or, with 'mxu3',
    128-aligned chunked banded matmuls on the MXU using the same manual
    3-pass split — no lane rotations at all, and the W-pass work moves to
    the otherwise idle MXU."""
    it = iter(refs)
    lin12_hbm = next(it)  # (2, B, 3, hp, wp): ref and dis stacked
    hmat = next(it)
    # mxu3/mxuP: (W_WIN, 128) f32 or (2, W_WIN, 128) bf16;
    # mxuT: (128, 144) f32 or (2, 128, 144) bf16
    wmat = next(it) if w_pass in ("mxu3", "mxuT", "mxuP", "mxuC", "mxuX") else None
    if emit_ds:
        _z = next(it)  # zeros-aliased ds buffer (consumed via the output)
    out_ref = next(it)
    ds_ref = next(it) if emit_ds else None  # (2, B, 3, hp2, wp2)
    t1 = next(it)
    t2 = next(it)
    sems = next(it)
    ds_store = next(it) if emit_ds else None  # (6, dh, dw) staging for ds DMA
    ds_sems = next(it) if emit_ds else None
    pack_scr = next(it) if pipelined else None
    int_scr = next(it) if pipelined else None

    nsteps = bsz * nth * ntw
    if pipelined:
        # Cross-tile software pipeline (see _pipelined_maps_mxuC): 1-D grid
        # of nsteps+1 steps, boundary handling by index clamping.
        s_id = pl.program_id(0)
        step = jnp.minimum(s_id, nsteps - 1)
        p = step // (nth * ntw)
        rem_ = jax.lax.rem(step, nth * ntw)
        th = rem_ // ntw
        tw = jax.lax.rem(rem_, ntw)
    else:
        p = pl.program_id(0)
        th = pl.program_id(1)
        tw = pl.program_id(2)
        s_id = step = (p * nth + th) * ntw + tw
    r = RADIUS
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4
    prec = _PRECISIONS.get(precision)

    def dma_pair(idx, slot):
        p_ = idx // (nth * ntw)
        rem = idx % (nth * ntw)
        row0_ = pl.multiple_of((rem // ntw) * tile_h, 8)
        col0_ = pl.multiple_of((rem % ntw) * tile_w, 128)
        d1 = pltpu.make_async_copy(
            lin12_hbm.at[0, p_, :, pl.ds(row0_, rows), pl.ds(col0_, cols)],
            t1.at[slot],
            sems.at[slot, 0],
        )
        d2 = pltpu.make_async_copy(
            lin12_hbm.at[1, p_, :, pl.ds(row0_, rows), pl.ds(col0_, cols)],
            t2.at[slot],
            sems.at[slot, 1],
        )
        return d1, d2

    slot = jax.lax.rem(s_id, 2)

    @pl.when(s_id == 0)
    def _():
        d1, d2 = dma_pair(step, slot)
        d1.start()
        d2.start()

    # Pipelined grids have one extra step that re-reads the last tile, so
    # its prefetch (clamped) must still be issued at s_id == nsteps - 1.
    @pl.when(s_id < (nsteps if pipelined else nsteps - 1))
    def _():
        nxt = jnp.minimum(s_id + 1, nsteps - 1)
        d1, d2 = dma_pair(nxt, jax.lax.rem(s_id + 1, 2))
        d1.start()
        d2.start()

    d1, d2 = dma_pair(step, slot)
    d1.wait()
    d2.wait()
    a3 = t1[slot]
    b3 = t2[slot]

    row0 = pl.multiple_of(th * tile_h, 8)
    col0 = pl.multiple_of(tw * tile_w, 128)

    # ---- exact downscale of the valid tile region into the next level ----
    ds_copies = []
    if emit_ds:
        def get_plane(img_idx, c):
            return jax.lax.slice(
                (a3, b3)[img_idx],
                (c, ROW_HALO4, COL_HALO4),
                (c + 1, ROW_HALO4 + tile_h, COL_HALO4 + tile_w),
            )[0]

        ds_copies = _emit_ds_tiles(
            ds_ref, ds_store, ds_sems, get_plane,
            p=p, row0=row0, col0=col0, tile_h=tile_h, tile_w=tile_w,
            h=h, w=w, h_odd=h_odd, w_odd=w_odd,
        )

    # ---- XYB + blur + maps + sums (as v3) ----
    valid = None
    if w_pass != "mxuC":  # mxuC folds validity into the band matrices
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=1)
        gr_ids = row_ids + row0 - ROW_HALO4
        gc_ids = col_ids + col0 - COL_HALO4
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
        if cbrt == "fastnr":
            return _cbrt_fast(v) - root
        y0 = jnp.power(v, third)
        if newton:
            y0 = (np.float32(2.0) * y0 + v / (y0 * y0)) * third
        return y0 - root

    mixes = [(opsin_mix(t, 0), opsin_mix(t, 1)) for t in (a3, b3)]

    def xyb_channel(idx, c, masked=True):
        rg, gr = mixes[idx]
        if c == 0:
            val = (rg - gr) * np.float32(0.5) * np.float32(14.0) + np.float32(0.42)
        elif c == 1:
            val = (rg + gr) * np.float32(0.5) + np.float32(0.01)
        else:
            y = (rg + gr) * np.float32(0.5)
            val = opsin_mix((a3, b3)[idx], 2) - y + np.float32(0.55)
        return val * valid if masked else val

    tp = [jnp.float32(v) for v in taps]

    def blur(q):
        if w_pass == "mxu3":
            qhi, qlo = _split_bf16(q)
            wm_hi = wmat[0]
            wm_lo = wmat[1]
            chunks = []
            for j in range(tile_w // _W_CHUNK):
                s = j * _W_CHUNK
                xh = jax.lax.slice(qhi, (0, s), (rows, s + _W_WIN))
                xl = jax.lax.slice(qlo, (0, s), (rows, s + _W_WIN))
                chunks.append(_dot3(xh, xl, wm_hi, wm_lo, ((1,), (0,))))
            qw = jnp.concatenate(chunks, axis=-1)
            if precision == "bf16x3":
                qwhi, qwlo = _split_bf16(qw)
                return _dot3(hmat[0], hmat[1], qwhi, qwlo, ((1,), (0,)))
            return jax.lax.dot_general(
                hmat[...], qw,
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
        # H pass FIRST on the MXU: the VPU's 11 lane-rotated W sweeps then
        # run on tile_h rows instead of tile_h + 2*halo (-20% of the
        # kernel's dominant VPU cost); the extra MXU columns stay hidden.
        if precision == "bf16x3":
            qhi, qlo = _split_bf16(q)
            qh = _dot3(hmat[0], hmat[1], qhi, qlo, ((1,), (0,)))
        else:
            qh = jax.lax.dot_general(
                hmat[...], q,
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
        if w_pass == "mxuT":
            # Transpose so the W blur becomes chunked LEFT band matmuls
            # (144 MACs/output): the whole 2D blur rides the MXU with no
            # lane rotations and, at 'highest', zero precision loss.
            qt = qh.T  # (cols, tile_h)
            chunks = []
            for j in range(tile_w // _WT_CHUNK):
                s = j * _WT_CHUNK + COL_HALO4 - 8
                win = jax.lax.slice(qt, (s, 0), (s + _WT_WIN, tile_h))
                if precision == "bf16x3":
                    xhi, xlo = _split_bf16(win)
                    chunks.append(
                        _dot3(wmat[0], wmat[1], xhi, xlo, ((1,), (0,)))
                    )
                else:
                    chunks.append(jax.lax.dot_general(
                        wmat[...], win,
                        (((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32,
                    ))
            return jnp.concatenate(chunks, axis=0).T
        return _blur_w(qh, tp, COL_HALO4 - r, tile_w)

    def _h_pass(q):
        if precision == "bf16x3":
            qhi, qlo = _split_bf16(q)
            return _dot3(hmat[0], hmat[1], qhi, qlo, ((1,), (0,)))
        return jax.lax.dot_general(
            hmat[...], q,
            (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )

    def blur_all(qs):
        # Packed MXU engine ('mxuP'): H pass per quantity (fat-N banded
        # matmul), then ALL quantities stacked along the sublane axis so
        # each 128-aligned W chunk is ONE (n*tile_h, W_WIN) @ (W_WIN, 128)
        # matmul — 8 large matmuls per pass instead of 12x8 small ones
        # (small-matmul issue overhead dominated the mxu3/mxuT variants).
        p_all = jnp.concatenate([_h_pass(q) for q in qs], axis=0)
        nrows = len(qs) * tile_h
        if precision == "bf16x3":
            phi, plo = _split_bf16(p_all)
        chunks = []
        for j in range(tile_w // _W_CHUNK):
            s = j * _W_CHUNK
            if precision == "bf16x3":
                xh = jax.lax.slice(phi, (0, s), (nrows, s + _W_WIN))
                xl = jax.lax.slice(plo, (0, s), (nrows, s + _W_WIN))
                chunks.append(_dot3(xh, xl, wmat[0], wmat[1], ((1,), (0,))))
            else:
                xw = jax.lax.slice(p_all, (0, s), (nrows, s + _W_WIN))
                chunks.append(jax.lax.dot_general(
                    xw, wmat[...],
                    (((1,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32,
                ))
        wfull = jnp.concatenate(chunks, axis=1)
        return [
            jax.lax.slice(wfull, (i * tile_h, 0), ((i + 1) * tile_h, tile_w))
            for i in range(len(qs))
        ]

    if w_pass == "mxuC" and pipelined:
        from turbo_metrics_tpu.ops.pallas.scale_stats_legacy import (
            _pipelined_maps_mxuC,
        )

        _pipelined_maps_mxuC(
            out_ref, xyb_channel, hmat, wmat, pack_scr, int_scr,
            tile_h, tile_w, rows, cols, _tapsum_kappa(taps),
            row0, col0, h, w, s_id, nsteps, nth, ntw,
            fastdiv=fastdiv, map_chunk=map_chunk, w_layout=w_layout,
            interleave=interleave, mxu_sums=mxu_sums,
        )
    elif w_pass == "mxuC":
        _maps_consistent_subtiled(
            out_ref, xyb_channel, hmat, wmat,
            tile_h, tile_w, rows, cols, _tapsum_kappa(taps),
            row0, col0, h, w, subtiles=subtiles, fastdiv=fastdiv,
            map_chunk=map_chunk, mxu_sums=mxu_sums, w_layout=w_layout,
            needs=needs,
        )
    elif w_pass == "mxuX":
        from turbo_metrics_tpu.ops.pallas.scale_stats_legacy import (
            _maps_and_sums_exact_mxu,
        )

        _maps_and_sums_exact_mxu(
            out_ref, xyb_channel, hmat, wmat, valid,
            tile_h, tile_w, rows, cols,
        )
    elif centered:
        def blur_exact(q):
            qh = _blur_h(q, tp, ROW_HALO4 - r, tile_h)
            return _blur_w(qh, tp, COL_HALO4 - r, tile_w)

        from turbo_metrics_tpu.ops.pallas.scale_stats_legacy import (
            _maps_and_sums_centered,
        )

        _maps_and_sums_centered(
            out_ref,
            lambda i, c: xyb_channel(i, c, masked=False),
            blur_all, blur_exact, valid, tile_h, tile_w,
        )
    else:
        _maps_and_sums(
            out_ref, xyb_channel, blur, valid, tile_h, tile_w,
            blur_all=blur_all if w_pass == "mxuP" else None,
        )

    for cp in ds_copies:
        cp.wait()


def _fused_scale0_yuv_kernel(
    *refs,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    nth: int,
    ntw: int,
    bsz: int,
    taps: tuple[float, ...],
    precision: str,
    emit_ds: bool,
    h_odd: bool,
    w_odd: bool,
    cbrt: str,
    coeffs: tuple,
    minimum: float,
    neutral: float,
    transfer: str,
    w_pass: str,
    depth: int,
    fastdiv: str = "div",
    map_chunk: int = 0,
    mxu_sums: bool = False,
    w_layout: str = "t",
    subtiles: int = 1,
    pipelined: bool = False,
    interleave: bool = True,
    needs: tuple | None = None,
):
    """v5: scale 0 straight from padded u8 YUV planes — the conversion
    (range offsets, matrix, exact chunked one-hot chroma upsample, EOTF,
    validity mask) happens in-kernel, so full-resolution linear RGB never
    touches HBM.  Downstream (XYB, 4-blur, maps, sums, emit_ds) is
    identical to the v4 kernel; halo semantics match the producer path
    exactly (clip + mask)."""
    from turbo_metrics_tpu.ops import colorspace as _cs

    it = iter(refs)
    y_hbm = next(it)  # (2, B, HP_Y, WP_Y) u8, image origin (8, 128)
    u_hbm = next(it)  # (2, B, HP_C, WP_C) u8, origin (4, 64)
    v_hbm = next(it)
    hmat = next(it)
    # mxuC: (2, 128, 144) bf16 limbs; mxuX: (128, 144) f32
    wmat = next(it) if w_pass in ("mxuC", "mxuX") else None
    if emit_ds:
        _z = next(it)
    out_ref = next(it)
    ds_ref = next(it) if emit_ds else None
    ty = next(it)  # (2 slots, 2 img, rows, cols) u8
    tu = next(it)  # (2 slots, 2 img, crows, ccols) u8
    tv = next(it)
    sems = next(it)  # (2 slots, 6)
    ds_store = next(it) if emit_ds else None
    ds_sems = next(it) if emit_ds else None
    pack_scr = next(it) if pipelined else None
    int_scr = next(it) if pipelined else None

    nsteps = bsz * nth * ntw
    if pipelined:
        # 1-D grid of nsteps+1 steps: step s runs tile min(s, nsteps-1)'s
        # front half and tile s-1's maps (see _pipelined_maps_mxuC).  All
        # boundary handling is index clamping — no pl.when around compute,
        # which would fence the scheduler's MXU/VPU interleaving.
        s_id = pl.program_id(0)
        step = jnp.minimum(s_id, nsteps - 1)
        p = step // (nth * ntw)
        rem_ = jax.lax.rem(step, nth * ntw)
        th = rem_ // ntw
        tw = jax.lax.rem(rem_, ntw)
    else:
        p = pl.program_id(0)
        th = pl.program_id(1)
        tw = pl.program_id(2)
        s_id = step = (p * nth + th) * ntw + tw
    r = RADIUS
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4
    crows = rows // 2
    ccols = cols // 2
    prec = _PRECISIONS.get(precision)
    # mxuC folds validity into the band matrices and the input planes are
    # padded with (minimum, neutral) — converted RGB is exactly 0 outside
    # the image by construction — so the full-size validity mask and its 6
    # plane multiplies exist only for the fallback engines.
    needs_valid = w_pass != "mxuC"

    def dmas(idx, slot):
        p_ = idx // (nth * ntw)
        rem = idx % (nth * ntw)
        row0_ = pl.multiple_of((rem // ntw) * tile_h, 8)
        col0_ = pl.multiple_of((rem % ntw) * tile_w, 128)
        crow0 = pl.multiple_of(row0_ // 2, 8)
        ccol0 = pl.multiple_of(col0_ // 2, 128)
        out = []
        for img in (0, 1):
            out.append(pltpu.make_async_copy(
                y_hbm.at[img, p_, pl.ds(row0_, rows), pl.ds(col0_, cols)],
                ty.at[slot, img], sems.at[slot, img],
            ))
            out.append(pltpu.make_async_copy(
                u_hbm.at[img, p_, pl.ds(crow0, crows), pl.ds(ccol0, ccols)],
                tu.at[slot, img], sems.at[slot, 2 + img],
            ))
            out.append(pltpu.make_async_copy(
                v_hbm.at[img, p_, pl.ds(crow0, crows), pl.ds(ccol0, ccols)],
                tv.at[slot, img], sems.at[slot, 4 + img],
            ))
        return out

    slot = jax.lax.rem(s_id, 2)

    @pl.when(s_id == 0)
    def _():
        for d in dmas(step, slot):
            d.start()

    # Pipelined grids have one extra step that re-reads the last tile, so
    # its prefetch (clamped) must still be issued at s_id == nsteps - 1.
    @pl.when(s_id < (nsteps if pipelined else nsteps - 1))
    def _():
        nxt = jnp.minimum(s_id + 1, nsteps - 1)
        for d in dmas(nxt, jax.lax.rem(s_id + 1, 2)):
            d.start()

    for d in dmas(step, slot):
        d.wait()

    row0 = pl.multiple_of(th * tile_h, 8)
    col0 = pl.multiple_of(tw * tile_w, 128)

    valid = None
    if needs_valid:
        # Validity mask over the padded tile.
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=1)
        gr_ids = row_ids + row0 - ROW_HALO4
        gc_ids = col_ids + col0 - COL_HALO4
        valid = (
            (gr_ids >= 0) & (gr_ids < h) & (gc_ids >= 0) & (gc_ids < w)
        ).astype(jnp.float32)

    # ---- in-kernel conversion: u8 YUV tile -> linear RGB planes ----
    y_coeff, r_coeff, b_coeff, g_coeff1, g_coeff2 = (
        jnp.float32(c) for c in coeffs
    )
    up_rows = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, crows), dimension=0) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (rows, crows), dimension=1)
    ).astype(jnp.bfloat16)
    up_cols_chunk = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 256), dimension=0)
        == jax.lax.broadcasted_iota(jnp.int32, (128, 256), dimension=1) // 2
    ).astype(jnp.bfloat16)

    # Raw integer chroma is exactly representable in 1 bf16 limb at 8-bit
    # depth (|c| <= 128) and 2 limbs at 10..16-bit, so upsampling the RAW
    # neutral-offset chroma and applying the matrix coefficients AFTER is
    # bit-identical to the old coefficient-first 3-limb form at 1/4.5 the
    # matmul cost (2 planes x <=2 limbs instead of 3 planes x 3 limbs).
    n_limbs = 1 if depth <= 8 else 2

    def up(c):
        # Exact limb-split bf16 one-hot upsample; the column pass is chunked
        # over 128-aligned chroma stripes (each output pair-of-lanes needs
        # exactly one chroma lane, so chunks need no halo).
        limbs = []
        x = c
        for _ in range(n_limbs):
            hi = x.astype(jnp.bfloat16)
            limbs.append(hi)
            x = x - hi.astype(jnp.float32)
        acc = None
        for limb in limbs:
            t = jax.lax.dot_general(
                up_rows, limb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            chunks = []
            for j in range(ccols // 128):
                s = j * 128
                chunks.append(jax.lax.dot_general(
                    jax.lax.slice(t, (0, s), (rows, s + 128)),
                    up_cols_chunk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            tt = jnp.concatenate(chunks, axis=-1)
            acc = tt if acc is None else acc + tt
        return acc

    eotf = {
        "bt709": _cs.bt709_eotf_fast,
        "srgb": _cs.srgb_eotf_fast,
        "pq": _cs.pq_eotf,
        "hlg": _cs.hlg_eotf,
        "linear": lambda v: v,
    }[transfer]

    rgbs = []
    for img in (0, 1):
        luma = (
            jnp.maximum(
                ty[slot, img].astype(jnp.int32).astype(jnp.float32),
                jnp.float32(minimum),
            )
            - jnp.float32(minimum)
        ) * y_coeff
        cb = tu[slot, img].astype(jnp.int32).astype(jnp.float32) - jnp.float32(neutral)
        cr = tv[slot, img].astype(jnp.int32).astype(jnp.float32) - jnp.float32(neutral)
        ucb = _dup("up", up, cb)
        ucr = _dup("up", up, cr)
        r_ = r_coeff * ucr
        g_ = g_coeff1 * ucb + g_coeff2 * ucr
        b_ = b_coeff * ucb

        def _eotf_clip(t):
            return jnp.clip(eotf(t), 0.0, 1.0)

        # Outside the image the padded planes hold (minimum, neutral), so
        # luma + c_ is exactly 0 there and every EOTF maps 0 -> 0: the RGB
        # planes are already zero at padded positions with no mask multiply.
        rgbs.append(tuple(
            _dup("eotf", _eotf_clip, luma + c_)
            if valid is None
            else _dup("eotf", _eotf_clip, luma + c_) * valid
            for c_ in (r_, g_, b_)
        ))

    # ---- exact downscale of the valid tile region into the next level ----
    ds_copies = []
    if emit_ds:
        def get_plane(img_idx, c):
            return jax.lax.slice(
                rgbs[img_idx][c],
                (ROW_HALO4, COL_HALO4),
                (ROW_HALO4 + tile_h, COL_HALO4 + tile_w),
            )

        ds_copies = _emit_ds_tiles(
            ds_ref, ds_store, ds_sems, get_plane,
            p=p, row0=row0, col0=col0, tile_h=tile_h, tile_w=tile_w,
            h=h, w=w, h_odd=h_odd, w_odd=w_odd,
        )

    # ---- XYB + blur + maps + sums (identical math to v4) ----
    def opsin_mix(rgb, row):
        m = OPSIN_ABSORBANCE_MATRIX
        bias = OPSIN_ABSORBANCE_BIAS
        root = OPSIN_ABSORBANCE_BIAS_ROOT
        third = np.float32(1.0 / 3.0)
        v = m[row, 0] * rgb[0] + m[row, 1] * rgb[1] + m[row, 2] * rgb[2] + bias
        v = jnp.maximum(v, 0.0)
        if cbrt == "fastnr":
            return _cbrt_fast(v) - root
        y0 = jnp.power(v, third)
        y0 = (np.float32(2.0) * y0 + v / (y0 * y0)) * third
        return y0 - root

    def _mix(r_, g_, b_, row):
        return opsin_mix((r_, g_, b_), row)

    mixes = [
        (
            _dup("xyb", lambda r_, g_, b_: _mix(r_, g_, b_, 0), *rgb),
            _dup("xyb", lambda r_, g_, b_: _mix(r_, g_, b_, 1), *rgb),
        )
        for rgb in rgbs
    ]

    def xyb_channel(idx, c, masked=True):
        rg, gr = mixes[idx]
        if c == 0:
            val = (rg - gr) * np.float32(0.5) * np.float32(14.0) + np.float32(0.42)
        elif c == 1:
            val = (rg + gr) * np.float32(0.5) + np.float32(0.01)
        else:
            y = (rg + gr) * np.float32(0.5)
            val = opsin_mix(rgbs[idx], 2) - y + np.float32(0.55)
        return val * valid if masked else val

    tp = [jnp.float32(v) for v in taps]

    def blur(q):
        if precision == "bf16x3":
            qhi, qlo = _split_bf16(q)
            qh = _dot3(hmat[0], hmat[1], qhi, qlo, ((1,), (0,)))
        else:
            qh = jax.lax.dot_general(
                hmat[...], q,
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
        return _blur_w(qh, tp, COL_HALO4 - r, tile_w)

    if w_pass == "mxuC" and pipelined:
        from turbo_metrics_tpu.ops.pallas.scale_stats_legacy import (
            _pipelined_maps_mxuC,
        )

        _pipelined_maps_mxuC(
            out_ref, xyb_channel, hmat, wmat, pack_scr, int_scr,
            tile_h, tile_w, rows, cols, _tapsum_kappa(taps),
            row0, col0, h, w, s_id, nsteps, nth, ntw,
            fastdiv=fastdiv, map_chunk=map_chunk, w_layout=w_layout,
            interleave=interleave, mxu_sums=mxu_sums,
        )
    elif w_pass == "mxuC":
        _maps_consistent_subtiled(
            out_ref, xyb_channel, hmat, wmat,
            tile_h, tile_w, rows, cols, _tapsum_kappa(taps),
            row0, col0, h, w, subtiles=subtiles, fastdiv=fastdiv,
            map_chunk=map_chunk, mxu_sums=mxu_sums, w_layout=w_layout,
            needs=needs,
        )
    else:
        _maps_and_sums(
            out_ref, xyb_channel, blur, valid, tile_h, tile_w,
            fastdiv=fastdiv,
        )

    for cp in ds_copies:
        cp.wait()


def fused_scale0_yuv_pallas(
    y2: jax.Array,
    uv2: jax.Array,
    h: int,
    w: int,
    *,
    depth: int = 8,
    matrix: str = "bt709",
    transfer: str = "bt709",
    full_range: bool = False,
    emit_ds: bool = True,
    precision: str = "highest",
    w_pass: str = "mxuC",
    cbrt: str = "fastnr",
    fastdiv: str = "div",
    map_chunk: int = 0,
    mxu_sums: bool = False,
    w_layout: str = "t64",
    h_layout: str = "h16",
    subtiles: int = 1,
    pipelined: bool = False,
    interleave: bool = True,
    ds_buf: jax.Array | None = None,
    padded_planes: tuple[jax.Array, jax.Array, jax.Array] | None = None,
    needs: tuple | None = None,
    interpret: bool = False,
):
    """Scale 0 of the pyramid straight from YUV 4:2:0 — conversion fused.

    ``y2``: (2, B, h, w) integer luma (ref, dis); ``uv2``: (2, B, ch, cw, 2).
    Returns (sums (B, 3, 6), ds12) with ds12 the level-1 padded input —
    full-resolution linear RGB never exists in HBM.  Requires even tile
    geometry (pad_geom4 tile_h/tile_w already are).

    ``padded_planes``: optional (yp, up, vp) already in the padded layout
    (see pad_yuv_planes) — skips the in-step pad copies entirely (the
    engine pads once at upload time); y2/uv2 are then only consulted for
    batch size and dtype and may be the planes themselves.

    Measured on a real chip the sums are BIT-IDENTICAL to the producer +
    v4 path (and 17.51 -> 16.85 ms per 1080p batch-8 step).  In Pallas
    INTERPRET mode only, the sums differ from v4 at the ~1e-7-relative
    level (the interpreter evaluates the two expression graphs with
    different fp contraction; the divergence does not exist on TPU) — do
    not chase it.
    """
    from turbo_metrics_tpu.ops import colorspace

    two, bsz = y2.shape[0], y2.shape[1]
    assert two == 2
    tile_h, tile_w, nth, ntw, hp, wp = pad_geom4(h, w)
    assert not (emit_ds and nth > 1 and tile_h % 16)
    if tile_w % 256:
        # Chroma tiles must stay 128-lane aligned (half the luma tile);
        # geometries like 2x640 fall back to producer + v4.
        raise ValueError(
            f"fused YUV scale-0 needs tile_w % 256 == 0 (got {tile_w})"
        )
    if w_layout == "t256" and tile_w % 256:
        w_layout = "t"  # 256-chunks need a 256-multiple tile width
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4
    taps = tuple(float(v) for v in gaussian_taps())

    kr, kb = colorspace.MATRIX_KR_KB[matrix]
    rng = colorspace.sample_range(depth, full_range)
    kg = 1.0 - kr - kb
    coeffs = (
        1.0 / rng.luma_range,
        2.0 * (1.0 - kr) / rng.chroma_range,
        2.0 * (1.0 - kb) / rng.chroma_range,
        -2.0 * (1.0 - kb) * kb / kg / rng.chroma_range,
        -2.0 * (1.0 - kr) * kr / kg / rng.chroma_range,
    )

    # Padded integer planes: luma origin (8, 128) in the pad_geom4 grid
    # extent; chroma origin (4, 64) at half geometry.  Pads hold (minimum,
    # neutral) so the converted RGB is exactly 0 outside the image — the
    # kernel then needs no full-size validity multiply (blur zero-extension
    # is folded into the mxuC band matrices, and the interior sums mask
    # handles the rest).
    hp_y, wp_y = ROW_HALO4 + nth * tile_h + ROW_HALO4, COL_HALO4 + ntw * tile_w + COL_HALO4
    ch, cw = (h + 1) // 2, (w + 1) // 2
    dt = y2.dtype
    pad_y = int(round(rng.minimum))
    pad_c = int(round(rng.neutral))
    if padded_planes is not None:
        yp, up_, vp_ = padded_planes
        assert yp.shape == (2, bsz, hp_y, wp_y), (yp.shape, (hp_y, wp_y))
        assert up_.shape == vp_.shape == (2, bsz, hp_y // 2, wp_y // 2)
    else:
        yp = jnp.pad(
            y2, ((0, 0), (0, 0), (ROW_HALO4, hp_y - h - ROW_HALO4),
                 (COL_HALO4, wp_y - w - COL_HALO4)),
            constant_values=np.asarray(pad_y, y2.dtype),
        )
        up_ = jnp.pad(
            uv2[..., 0],
            ((0, 0), (0, 0), (ROW_HALO4 // 2, hp_y // 2 - ch - ROW_HALO4 // 2),
             (COL_HALO4 // 2, wp_y // 2 - cw - COL_HALO4 // 2)),
            constant_values=np.asarray(pad_c, uv2.dtype),
        )
        vp_ = jnp.pad(
            uv2[..., 1],
            ((0, 0), (0, 0), (ROW_HALO4 // 2, hp_y // 2 - ch - ROW_HALO4 // 2),
             (COL_HALO4 // 2, wp_y // 2 - cw - COL_HALO4 // 2)),
            constant_values=np.asarray(pad_c, uv2.dtype),
        )

    inputs = [yp, up_, vp_]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    if w_pass != "mxuC":
        pipelined = False
    if pipelined:
        subtiles = 1  # the cross-tile pipeline supersedes sub-tile ILP
    if w_pass != "mxuC" or tile_h % (16 * subtiles):
        subtiles = 1  # sub-chains need 16-row-aligned mxuC sub-tiles
    th_b = tile_h // subtiles
    rows_b = th_b + 2 * ROW_HALO4
    nsteps = bsz * nth * ntw
    hch = {"h8": 8, "h16": 16, "h32": 32}.get(h_layout, 0)
    if (
        w_pass == "mxuC" and hch and subtiles == 1
        and tile_h % hch == 0 and tile_h > hch
    ):
        # Chunked-H band: one tiny Toeplitz window matrix serves every
        # output-row chunk (see _blur_pack_mxuC) at a fraction of the fat
        # band's MACs.
        th_b, rows_b = hch, hch + 2 * ROW_HALO4
    hmat = _band_matrix_h(th_b, rows_b, taps, ROW_HALO4 - RADIUS)
    if precision == "bf16x3" or w_pass == "mxuC":
        inputs.append(jnp.asarray(_split_band_zs(
            lambda tp: _band_matrix_h(th_b, rows_b, tp, ROW_HALO4 - RADIUS),
            taps,
        )))
        in_specs.append(
            pl.BlockSpec((2, th_b, rows_b), lambda *_: (0, 0, 0))
        )
    else:
        inputs.append(jnp.asarray(hmat))
        in_specs.append(pl.BlockSpec((tile_h, rows), lambda *_: (0, 0)))
    if w_pass == "mxuC":
        wm = _mxuc_w_band(taps, w_layout)
        inputs.append(jnp.asarray(wm))
        in_specs.append(
            pl.BlockSpec(wm.shape, lambda *_: (0, 0, 0))
        )
    elif w_pass == "mxuX":
        inputs.append(jnp.asarray(_band_matrix_wt(taps)))
        in_specs.append(
            pl.BlockSpec((_WT_CHUNK, _WT_WIN), lambda *_: (0, 0))
        )

    if pipelined:
        # Flattened sums: one (8, 8) row block per tile, resident in VMEM
        # across the whole grid (constant index map) — step s writes tile
        # s-1's rows (see _pipelined_maps_mxuC).
        out_shapes = [jax.ShapeDtypeStruct((nsteps, 8, 8), jnp.float32)]
        out_specs = [
            pl.BlockSpec(
                (nsteps, 8, 8), lambda *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    else:
        out_shapes = [jax.ShapeDtypeStruct((bsz, nth, ntw, 8, 8), jnp.float32)]
        out_specs = [
            pl.BlockSpec(
                (1, 1, 1, 8, 8),
                lambda p, th, tw: (p, th, tw, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    scratch = [
        pltpu.VMEM((2, 2, rows, cols), dt),
        pltpu.VMEM((2, 2, rows // 2, cols // 2), dt),
        pltpu.VMEM((2, 2, rows // 2, cols // 2), dt),
        pltpu.SemaphoreType.DMA((2, 6)),
    ]
    aliases = {}
    if emit_ds:
        hp2, wp2 = ds_buffer_hw(h, w)
        dh_p = _round_up(tile_h // 2, 8)
        dw_p = _round_up(tile_w // 2, 128)
        if ds_buf is not None:
            assert ds_buf.shape == (2, bsz, 3, hp2, wp2)
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
    if pipelined:
        scratch += [
            pltpu.VMEM((2, 12 * tile_h, tile_w), jnp.float32),  # blur pack
            pltpu.VMEM((2, 6 * tile_h, tile_w), jnp.float32),  # interiors
        ]

    kernel = functools.partial(
        _fused_scale0_yuv_kernel,
        h=h,
        w=w,
        tile_h=tile_h,
        tile_w=tile_w,
        nth=nth,
        ntw=ntw,
        bsz=bsz,
        taps=taps,
        precision=precision,
        emit_ds=emit_ds,
        h_odd=bool(h % 2) if emit_ds else False,
        w_odd=bool(w % 2) if emit_ds else False,
        cbrt=cbrt,
        coeffs=coeffs,
        minimum=float(rng.minimum),
        neutral=float(rng.neutral),
        transfer=transfer,
        w_pass=w_pass,
        depth=depth,
        fastdiv=fastdiv,
        map_chunk=map_chunk,
        mxu_sums=mxu_sums,
        w_layout=w_layout,
        subtiles=subtiles,
        pipelined=pipelined,
        interleave=interleave,
        needs=needs if (w_pass == "mxuC" and not pipelined) else None,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nsteps + 1,) if pipelined else (bsz, nth, ntw),
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
        sums_raw, ds12 = outs
    else:
        sums_raw, ds12 = outs, None
    if pipelined:
        sums = (
            sums_raw.reshape(bsz, nth * ntw, 8, 8)[:, :, :3, :6].sum(axis=1)
        )
    else:
        sums = sums_raw[:, :, :, :3, :6].sum(axis=(1, 2))
    return sums, ds12


def _fused_tail_kernel(
    p_hbm,
    out_ref,
    *scratch,
    dims: tuple[tuple[int, int], ...],
    planes: tuple[tuple[int, int], ...],
    taps: tuple[float, ...],
    needs_lvls: tuple | None = None,
):
    """All remaining small pyramid levels for ONE batch element, entirely in
    VMEM.  ``p_hbm`` block: (2, 1, 3, ph0, pw0) — the first tail level's
    padded plane (interior at (8, 128)).  For each level: XYB + 4-blur
    (both passes VPU; these arrays are tiny) + maps + masked sums, then an
    exact 2x2-mean downscale into the next level's VMEM plane."""
    r = RADIUS
    tp = [jnp.float32(v) for v in taps]
    nlev = len(dims)
    cur = p_hbm  # indexable as [img, 0, ch] -> (ph, pw)

    def plane(ref, img, ch, is_input):
        if is_input:
            return ref[img, 0, ch]
        return ref[img, ch]

    for li, (lh, lw) in enumerate(dims):
        ph, pw = planes[li]
        LH = _round_up(lh, 8)
        LW = _round_up(lw, 128)
        is_input = li == 0

        # Validity masks (interior occupies [8, 8+lh) x [128, 128+lw)).
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
        valid = (
            (row_ids >= 8) & (row_ids < 8 + lh)
            & (col_ids >= 128) & (col_ids < 128 + lw)
        ).astype(jnp.float32)
        mrow = jax.lax.broadcasted_iota(jnp.int32, (LH, LW), 0)
        mcol = jax.lax.broadcasted_iota(jnp.int32, (LH, LW), 1)
        mask = ((mrow < lh) & (mcol < lw)).astype(jnp.float32)

        def opsin_mix(img, row):
            m = OPSIN_ABSORBANCE_MATRIX
            bias = OPSIN_ABSORBANCE_BIAS
            root = OPSIN_ABSORBANCE_BIAS_ROOT
            t = [plane(cur, img, c, is_input) for c in range(3)]
            v = m[row, 0] * t[0] + m[row, 1] * t[1] + m[row, 2] * t[2] + bias
            return _cbrt_fast(jnp.maximum(v, 0.0)) - root

        mixes = [(opsin_mix(img, 0), opsin_mix(img, 1)) for img in (0, 1)]

        def xyb_channel(img, c):
            rg, gr = mixes[img]
            if c == 0:
                val = (rg - gr) * np.float32(0.5) * np.float32(14.0) + np.float32(0.42)
            elif c == 1:
                val = (rg + gr) * np.float32(0.5) + np.float32(0.01)
            else:
                y = (rg + gr) * np.float32(0.5)
                val = opsin_mix(img, 2) - y + np.float32(0.55)
            return val * valid

        def blur(q):
            qw = _blur_w(q, tp, 128 - r, LW)
            return _blur_h(qw, tp, 8 - r, LH)

        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        for c in range(3):
            nd = needs_lvls[li][c] if needs_lvls is not None else (True,) * 6
            if not any(nd):
                out_ref[0, li, c, :] = jnp.zeros((8,), jnp.float32)
                continue
            need_ssim = nd[0] or nd[1]
            need_art = nd[2] or nd[3]
            need_det = nd[4] or nd[5]
            a = xyb_channel(0, c)
            b = xyb_channel(1, c)
            mu1, mu2 = _dup("tailblur", blur, a), _dup("tailblur", blur, b)
            i1 = jax.lax.slice(a, (8, 128), (8 + LH, 128 + LW))
            i2 = jax.lax.slice(b, (8, 128), (8 + LH, 128 + LW))

            def _tail_maps(mu1, mu2, i1, i2, *ss):
                sums6 = [zero] * 6
                if need_ssim:
                    s_sum, s12 = ss
                    mu12 = mu1 * mu2
                    mu_diff = mu1 - mu2
                    num_m = one - mu_diff * mu_diff
                    num_s = jnp.float32(2.0) * (s12 - mu12) + C2
                    denom_s = (s_sum - mu1 * mu1 - mu2 * mu2) + C2
                    d = jnp.maximum((denom_s - num_m * num_s) / denom_s, 0.0)
                    d = d * mask
                    d2 = d * d
                    if nd[0]:
                        sums6[0] = jnp.sum(d)
                    if nd[1]:
                        sums6[1] = jnp.sum(d2 * d2)

                if need_art or need_det:
                    aa = jnp.abs(i2 - mu2)
                    bb2 = jnp.abs(i1 - mu1)
                    d1m = (aa - bb2) / (one + bb2) * mask
                    if need_art:
                        art = jnp.maximum(d1m, 0.0)
                        art2 = art * art
                        if nd[2]:
                            sums6[2] = jnp.sum(art)
                        if nd[3]:
                            sums6[3] = jnp.sum(art2 * art2)
                    if need_det:
                        det = jnp.maximum(-d1m, 0.0)
                        det2 = det * det
                        if nd[4]:
                            sums6[4] = jnp.sum(det)
                        if nd[5]:
                            sums6[5] = jnp.sum(det2 * det2)
                return tuple(sums6)

            ssb = (
                (_dup("tailblur", blur, a * a + b * b),
                 _dup("tailblur", blur, a * b))
                if need_ssim else ()
            )
            sums6 = list(_dup("tailmaps", _tail_maps, mu1, mu2, i1, i2, *ssb))
            out_ref[0, li, c, :] = jnp.stack(sums6 + [zero, zero])

        # Exact 2x2-mean downscale into the next level's VMEM plane.
        if li + 1 < nlev:
            hn, wn = (lh + 1) // 2, (lw + 1) // 2
            phn, pwn = planes[li + 1]
            nxt = scratch[li]
            nxt[...] = jnp.zeros_like(nxt)
            dw_p = _round_up(wn, 128)
            s_cols = (
                jax.lax.broadcasted_iota(jnp.int32, (2 * wn, dw_p), 0) // 2
                == jax.lax.broadcasted_iota(jnp.int32, (2 * wn, dw_p), 1)
            ).astype(jnp.float32)
            rfac = jnp.float32(1.0)
            cfac = jnp.float32(1.0)
            if lh % 2:
                rid = jax.lax.broadcasted_iota(jnp.int32, (hn, dw_p), 0)
                rfac = jnp.where(rid == hn - 1, jnp.float32(2.0), jnp.float32(1.0))
            if lw % 2:
                cid = jax.lax.broadcasted_iota(jnp.int32, (hn, dw_p), 1)
                cfac = jnp.where(cid == wn - 1, jnp.float32(2.0), jnp.float32(1.0))
            def _tail_ds(q):
                rsum = q.reshape(hn, 2, 2 * wn).sum(axis=1)
                return jax.lax.dot_general(
                    rsum, s_cols,
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

            for img in (0, 1):
                for c in range(3):
                    q = jax.lax.slice(
                        plane(cur, img, c, is_input),
                        (8, 128),
                        (8 + 2 * hn, 128 + 2 * wn),
                    )
                    quad = _dup("tailds", _tail_ds, q)
                    ds = quad * np.float32(0.25)
                    if lh % 2 or lw % 2:
                        ds = ds * rfac * cfac
                    nxt[img, c, 8 : 8 + hn, 128 : 128 + dw_p] = ds
            cur = nxt


def fused_yuv_ok(h: int, w: int) -> bool:
    """Whether fused_scale0_yuv_pallas supports this geometry (its chroma
    tiles must stay 128-lane aligned: luma tile_w % 256 == 0)."""
    tile_h, tile_w, nth, _, _, _ = pad_geom4(h, w)
    return tile_w % 256 == 0 and not (nth > 1 and tile_h % 16)


def tail_plane_bytes(h: int, w: int) -> int:
    """VMEM bytes of one batch element's (2, 3, ph, pw) padded level plane."""
    return 2 * 3 * (16 + _round_up(h, 8)) * (256 + _round_up(w, 128)) * 4


def ds_buffer_hw(h: int, w: int) -> tuple[int, int]:
    """(hp2, wp2) of the buffer an (h, w) level's emit_ds writes: covers
    BOTH this level's ds-write extent (its tile grid halved, staging tiles
    8/128-rounded) and the next level's own tile grid, whichever is larger;
    slack stays zero and is masked anyway."""
    tile_h, tile_w, nth, ntw, _, _ = pad_geom4(h, w)
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    t2h, t2w, n2h, n2w, _, _ = pad_geom4(h2, w2)
    dh, dw = tile_h // 2, tile_w // 2
    dh_p, dw_p = _round_up(dh, 8), _round_up(dw, 128)
    hp2 = ROW_HALO4 + max(n2h * t2h, (nth - 1) * dh + dh_p) + ROW_HALO4
    wp2 = COL_HALO4 + max(n2w * t2w, (ntw - 1) * dw + dw_p) + COL_HALO4
    return hp2, wp2


def padded_yuv_geometry(h: int, w: int) -> tuple[int, int]:
    """(hp_y, wp_y) of the padded luma plane fused_scale0_yuv_pallas reads
    (chroma planes are exactly half in both dims)."""
    tile_h, tile_w, nth, ntw, _, _ = pad_geom4(h, w)
    return (
        ROW_HALO4 + nth * tile_h + ROW_HALO4,
        COL_HALO4 + ntw * tile_w + COL_HALO4,
    )


def pad_yuv_planes(
    y2,
    uv2,
    h: int,
    w: int,
    *,
    depth: int = 8,
    full_range: bool = False,
    xp=np,
):
    """Build the (yp, up, vp) padded planes for fused_scale0_yuv_pallas's
    ``padded_planes`` fast path — pads hold (minimum, neutral) so converted
    RGB is exactly 0 outside the image.  ``xp`` selects numpy (pad on the
    host at upload time — the product path) or jnp (on device)."""
    from turbo_metrics_tpu.ops import colorspace

    rng = colorspace.sample_range(depth, full_range)
    hp_y, wp_y = padded_yuv_geometry(h, w)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    pad_y = int(round(rng.minimum))
    pad_c = int(round(rng.neutral))
    yp = xp.pad(
        y2, ((0, 0), (0, 0), (ROW_HALO4, hp_y - h - ROW_HALO4),
             (COL_HALO4, wp_y - w - COL_HALO4)),
        constant_values=pad_y,
    )
    up_ = xp.pad(
        uv2[..., 0],
        ((0, 0), (0, 0), (ROW_HALO4 // 2, hp_y // 2 - ch - ROW_HALO4 // 2),
         (COL_HALO4 // 2, wp_y // 2 - cw - COL_HALO4 // 2)),
        constant_values=pad_c,
    )
    vp_ = xp.pad(
        uv2[..., 1],
        ((0, 0), (0, 0), (ROW_HALO4 // 2, hp_y // 2 - ch - ROW_HALO4 // 2),
         (COL_HALO4 // 2, wp_y // 2 - cw - COL_HALO4 // 2)),
        constant_values=pad_c,
    )
    return yp, up_, vp_


def fused_tail_pallas(
    p12: jax.Array,
    dims: list[tuple[int, int]],
    *,
    needs_lvls: tuple | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Sums for ALL of ``dims`` (the small pyramid levels) in one kernel.

    ``p12``: (2, B, 3, hp, wp) padded plane of dims[0] (a v4 emit_ds
    output).  One grid step per batch element; every level lives in VMEM,
    killing the ~0.8 ms/level fixed cost the per-level kernels pay at
    sizes where compute is negligible.  Returns (B, len(dims), 3, 6).
    """
    two, bsz = p12.shape[0], p12.shape[1]
    assert two == 2
    ph0, pw0 = p12.shape[3], p12.shape[4]
    # Per-level padded VMEM plane sizes (interior at (8, 128), zero halos).
    planes = [(ph0, pw0)]
    for lh, lw in dims[1:]:
        planes.append((16 + _round_up(lh, 8), 256 + _round_up(lw, 128)))
    # The downscale writes rows [8, 8+hn) and lane stripe [128, 128+dw_p):
    # ensure each plane accommodates the padded stripe.
    planes = [
        (ph, max(pw, 128 + _round_up(lw, 128) + 128))
        for (ph, pw), (lh, lw) in zip(planes, dims)
    ]
    taps = tuple(float(v) for v in gaussian_taps())
    kernel = functools.partial(
        _fused_tail_kernel,
        dims=tuple(dims),
        planes=tuple(planes),
        taps=taps,
        needs_lvls=needs_lvls,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(
                (2, 1, 3, ph0, pw0), lambda b: (0, b, 0, 0, 0)
            )
        ],
        out_specs=pl.BlockSpec(
            (1, len(dims), 3, 8), lambda b: (b, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, len(dims), 3, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, ph, pw), jnp.float32) for ph, pw in planes[1:]
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p12)
    return out[..., :6]


def fused_scale_pallas_v4(
    lin12_padded: jax.Array,
    h: int,
    w: int,
    *,
    emit_ds: bool,
    precision: str = "highest",
    newton: bool = True,
    w_pass: str = "mxuC",
    cbrt: str = "fastnr",
    centered: bool = False,
    fastdiv: str = "div",
    map_chunk: int = 0,
    mxu_sums: bool = False,
    w_layout: str = "t64",
    h_layout: str = "h16",
    ds_buf: jax.Array | None = None,
    interpret: bool = False,
    subtiles: int = 1,
    pipelined: bool = False,
    interleave: bool = True,
    needs: tuple | None = None,
):
    """One padded-chain pyramid level.

    ``lin12_padded``: (2, B, 3, hp, wp) — ref and dis stacked, in the
    level's padded layout (pad_geom4).  Returns (sums (B, 3, 6), ds12)
    where ds12 is the NEXT level's stacked padded input (None when
    ``emit_ds`` is False).
    """
    two, bsz = lin12_padded.shape[0], lin12_padded.shape[1]
    assert two == 2
    assert not centered or w_pass == "mxuP", (
        "centered statistics pair with the packed MXU blur engine"
    )
    assert w_pass != "mxuC" or not centered, "mxuC is consistent by itself"
    tile_h, tile_w, nth, ntw, hp, wp = pad_geom4(h, w)
    # With multiple row tiles, the (8-aligned) downscale staging tile of one
    # tile must not overlap the next tile's destination rows: tile_h//2 must
    # itself be 8-aligned.  (Caught by the v4tiles sweep: odd tile heights
    # zero 4 rows per boundary at the next level.)
    assert not (emit_ds and nth > 1 and tile_h % 16), (
        f"tile_h={tile_h} must be a multiple of 16 when emitting the next "
        "level from a multi-row-tile grid"
    )
    # Producers may allocate larger than this level's own geometry (their
    # tile grid can write past our interior; the slack is zero + masked).
    assert (
        lin12_padded.shape[2] == 3
        and lin12_padded.shape[3] >= hp
        and lin12_padded.shape[4] >= wp
    ), (lin12_padded.shape, (hp, wp))
    rows = tile_h + 2 * ROW_HALO4
    cols = tile_w + 2 * COL_HALO4
    taps = tuple(float(v) for v in gaussian_taps())

    if w_layout == "t256" and tile_w % 256:
        w_layout = "t"  # 256-chunks need a 256-multiple tile width
    if w_pass != "mxuC":
        pipelined = False
    if pipelined:
        subtiles = 1  # the cross-tile pipeline supersedes sub-tile ILP
    if w_pass != "mxuC" or tile_h % (16 * subtiles):
        subtiles = 1  # sub-chains need 16-row-aligned mxuC sub-tiles
    th_b = tile_h // subtiles
    rows_b = th_b + 2 * ROW_HALO4
    nsteps = bsz * nth * ntw
    hch = {"h8": 8, "h16": 16, "h32": 32}.get(h_layout, 0)
    if (
        w_pass == "mxuC" and hch and subtiles == 1
        and tile_h % hch == 0 and tile_h > hch
    ):
        # Chunked-H band: one tiny Toeplitz window matrix serves every
        # output-row chunk (see _blur_pack_mxuC) at a fraction of the fat
        # band's MACs.
        th_b, rows_b = hch, hch + 2 * ROW_HALO4
    hmat = _band_matrix_h(th_b, rows_b, taps, ROW_HALO4 - RADIUS)
    inputs = [lin12_padded]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if precision == "bf16x3" or w_pass == "mxuC":
        inputs.append(jnp.asarray(_split_band_zs(
            lambda tp: _band_matrix_h(th_b, rows_b, tp, ROW_HALO4 - RADIUS),
            taps,
        )))
        in_specs.append(
            pl.BlockSpec((2, th_b, rows_b), lambda *_: (0, 0, 0))
        )
    else:
        inputs.append(jnp.asarray(hmat))
        in_specs.append(pl.BlockSpec((tile_h, rows), lambda *_: (0, 0)))
    if w_pass == "mxuC":
        wm = _mxuc_w_band(taps, w_layout)
        inputs.append(jnp.asarray(wm))
        in_specs.append(
            pl.BlockSpec(wm.shape, lambda *_: (0, 0, 0))
        )
    elif w_pass == "mxuX":
        inputs.append(jnp.asarray(_band_matrix_wt(taps)))
        in_specs.append(
            pl.BlockSpec((_WT_CHUNK, _WT_WIN), lambda *_: (0, 0))
        )
    elif w_pass in ("mxu3", "mxuP"):
        wc = _band_matrix_wchunk(taps)
        # mxu3's W stage always uses the manual bf16 3-pass split; mxuP at
        # 'highest' keeps the f32 matrix (Mosaic's own 6-pass decomposition).
        if w_pass == "mxu3" or precision == "bf16x3":
            inputs.append(jnp.asarray(_split_bf16_np(wc)))
            in_specs.append(
                pl.BlockSpec(
                    (2, _W_WIN, _W_CHUNK), lambda *_: (0, 0, 0)
                )
            )
        else:
            inputs.append(jnp.asarray(wc))
            in_specs.append(
                pl.BlockSpec((_W_WIN, _W_CHUNK), lambda *_: (0, 0))
            )
    elif w_pass == "mxuT":
        wt = _band_matrix_wt(taps)
        if precision == "bf16x3":
            inputs.append(jnp.asarray(_split_bf16_np(wt)))
            in_specs.append(
                pl.BlockSpec(
                    (2, _WT_CHUNK, _WT_WIN), lambda *_: (0, 0, 0)
                )
            )
        else:
            inputs.append(jnp.asarray(wt))
            in_specs.append(
                pl.BlockSpec((_WT_CHUNK, _WT_WIN), lambda *_: (0, 0))
            )
    if pipelined:
        # Flattened sums, resident in VMEM across the whole grid (see
        # fused_scale0_yuv_pallas / _pipelined_maps_mxuC).
        out_shapes = [jax.ShapeDtypeStruct((nsteps, 8, 8), jnp.float32)]
        out_specs = [
            pl.BlockSpec(
                (nsteps, 8, 8), lambda *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    else:
        out_shapes = [jax.ShapeDtypeStruct((bsz, nth, ntw, 8, 8), jnp.float32)]
        out_specs = [
            pl.BlockSpec(
                (1, 1, 1, 8, 8),
                lambda p, th, tw: (p, th, tw, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    scratch = [
        pltpu.VMEM((2, 3, rows, cols), jnp.float32),
        pltpu.VMEM((2, 3, rows, cols), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    aliases = {}
    if emit_ds:
        hp2, wp2 = ds_buffer_hw(h, w)
        dh_p = _round_up(tile_h // 2, 8)
        dw_p = _round_up(tile_w // 2, 128)
        # Zero buffer donated to the ds output: tiles write the interior,
        # the aliasing keeps halos and uncovered slack exactly zero.  A
        # caller-threaded buffer (its halos already zero from a previous
        # step) avoids re-materialising the zeros every step.
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
    if pipelined:
        scratch += [
            pltpu.VMEM((2, 12 * tile_h, tile_w), jnp.float32),  # blur pack
            pltpu.VMEM((2, 6 * tile_h, tile_w), jnp.float32),  # interiors
        ]

    kernel = functools.partial(
        _fused_scale_kernel_v4,
        h=h,
        w=w,
        tile_h=tile_h,
        tile_w=tile_w,
        nth=nth,
        ntw=ntw,
        bsz=bsz,
        taps=taps,
        precision=precision,
        emit_ds=emit_ds,
        h_odd=bool(h % 2) if emit_ds else False,
        w_odd=bool(w % 2) if emit_ds else False,
        newton=newton,
        w_pass=w_pass,
        cbrt=cbrt,
        centered=centered,
        fastdiv=fastdiv,
        map_chunk=map_chunk,
        mxu_sums=mxu_sums,
        w_layout=w_layout,
        subtiles=subtiles,
        pipelined=pipelined,
        interleave=interleave,
        needs=needs if (w_pass == "mxuC" and not pipelined) else None,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nsteps + 1,) if pipelined else (bsz, nth, ntw),
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
        sums_raw, ds12 = outs
    else:
        sums_raw, ds12 = outs, None
    if pipelined:
        sums = (
            sums_raw.reshape(bsz, nth * ntw, 8, 8)[:, :, :3, :6].sum(axis=1)
        )
    else:
        sums = sums_raw[:, :, :, :3, :6].sum(axis=(1, 2))
    return sums, ds12


# ---------------------------------------------------------------------------
# Superseded kernel generations (v1/v2/v3 engines and the negative-result
# experiment variants) live in scale_stats_legacy.py — each with a pointer
# to its PERFORMANCE.md verdict.  They remain selectable backends, lazily
# re-exported here so existing imports keep working.
_LEGACY_NAMES = {
    "_scale_stats_kernel", "scale_sums_pallas", "_fused_scale_kernel",
    "fused_scale_pallas", "_fused_scale_kernel_v3", "fused_scale_pallas_v3",
    "_pipelined_maps_mxuC", "_maps_and_sums_exact_mxu",
    "_maps_and_sums_centered",
}


def __getattr__(name):  # PEP 562
    if name in _LEGACY_NAMES:
        from turbo_metrics_tpu.ops.pallas import scale_stats_legacy

        return getattr(scale_stats_legacy, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
