"""Pallas TPU kernel: planar YUV 4:2:0 -> linear RGB f32.

One fused pass replacing the jnp conversion chain (integer widening, range
offsets, matrix, nearest-neighbour chroma upsample, EOTF, clamp), which XLA
leaves as several HBM round trips (~10 ms per 1080p batch-8; this kernel is
~1.5 ms).  Math is identical to ops/colorspace.yuv420_to_linear_rgb.

The 2x chroma upsample rides the MXU via exact 0/1 replication matrices
(the transpose of the pair-sum trick in scale_stats.py; copies, no rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbo_metrics_tpu.ops import colorspace

TILE_H = 256  # multiple of 16 (chroma tile rows stay 8-aligned)
TILE_W = 512  # multiple of 256 (chroma tile lanes stay 128-aligned)

_EOTFS = {
    # bt709/srgb use the division/transcendental-free pow decompositions
    # (<=7e-7 relative vs the pow forms — see colorspace._pow_x2_xn2); the
    # pow-based EOTFs remain the jnp-path/oracle definitions.
    "bt709": colorspace.bt709_eotf_fast,
    "srgb": colorspace.srgb_eotf_fast,
    "pq": colorspace.pq_eotf,
    "hlg": colorspace.hlg_eotf,
    "linear": lambda v: v,
}


def _up_matrices(tile_h: int, tile_w: int):
    """0/1 nearest-neighbour 2x replication matrices (exact in bf16)."""
    dh, dw = tile_h // 2, tile_w // 2
    up_rows = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, dh), dimension=0) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (tile_h, dh), dimension=1)
    ).astype(jnp.bfloat16)
    up_cols = (
        jax.lax.broadcasted_iota(jnp.int32, (dw, tile_w), dimension=0)
        == jax.lax.broadcasted_iota(jnp.int32, (dw, tile_w), dimension=1) // 2
    ).astype(jnp.bfloat16)
    return up_rows, up_cols


def _up_exact(c: jax.Array, up_rows, up_cols) -> jax.Array:
    """Exact chroma upsample on the MXU: each output selects ONE input, the
    0/1 matrices are exact in bf16, and the 3-limb hi/mid/lo bf16 split is
    an exact decomposition of f32 that re-sums exactly — bit-exact
    replication at half the passes of a HIGHEST matmul.  ``up_rows`` /
    ``up_cols`` may be None (that axis needs no upsample: 4:2:2 rows,
    4:4:4 both)."""
    if up_rows is None and up_cols is None:
        return c
    hi = c.astype(jnp.bfloat16)
    r1 = c - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = None
    for limb in (hi, mid, lo):
        t = limb
        if up_rows is not None:
            t = jax.lax.dot_general(
                up_rows, t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        if up_cols is not None:
            t = jax.lax.dot_general(
                t, up_cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            t = t.astype(jnp.float32)
        acc = t if acc is None else acc + t
    return acc


def _convert_kernel(
    y_ref,
    u_ref,
    v_ref,
    out_ref,
    *,
    coeffs: tuple,
    minimum: float,
    neutral: float,
    transfer: str,
    tile_h: int,
    tile_w: int,
    chroma: int = 420,
):
    # Mosaic cannot cast uint8->f32 directly; hop through int32.
    y_coeff, r_coeff, b_coeff, g_coeff1, g_coeff2 = (jnp.float32(c) for c in coeffs)
    luma = (
        jnp.maximum(y_ref[0].astype(jnp.int32).astype(jnp.float32), jnp.float32(minimum))
        - jnp.float32(minimum)
    ) * y_coeff
    cb = u_ref[0].astype(jnp.int32).astype(jnp.float32) - jnp.float32(neutral)
    cr = v_ref[0].astype(jnp.int32).astype(jnp.float32) - jnp.float32(neutral)

    # Nearest-neighbour upsample via exact 0/1 replication matrices
    # (420: both axes; 422: columns only; 444: none).
    up_rows, up_cols = _up_matrices(tile_h, tile_w)
    if chroma == 444:
        up_rows = up_cols = None
    elif chroma == 422:
        up_rows = None
    r_ = _up_exact(r_coeff * cr, up_rows, up_cols)
    g_ = _up_exact(g_coeff1 * cb + g_coeff2 * cr, up_rows, up_cols)
    b_ = _up_exact(b_coeff * cb, up_rows, up_cols)

    eotf = _EOTFS[transfer]
    out_ref[0, 0] = jnp.clip(eotf(luma + r_), 0.0, 1.0)
    out_ref[0, 1] = jnp.clip(eotf(luma + g_), 0.0, 1.0)
    out_ref[0, 2] = jnp.clip(eotf(luma + b_), 0.0, 1.0)


def yuv420_to_linear_rgb_pallas(
    y: jax.Array,
    uv: jax.Array,
    *,
    depth: int = 8,
    matrix: str = "bt709",
    transfer: str = "bt709",
    full_range: bool = False,
    chroma: int = 420,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused variant of colorspace.yuv420_to_linear_rgb.

    ``y``: (B, H, W) integer luma; ``uv``: (B, ch, cw, 2) at the
    ``chroma`` subsampling's grid (420: ceil-half both axes; 422:
    full-height, ceil-half width; 444: full).  Returns (B, 3, H, W) f32
    linear RGB in [0, 1].
    """
    bsz, h, w = y.shape
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

    tile_h = min(TILE_H, _round_up(h, 16))
    tile_w = min(TILE_W, _round_up(w, 256))
    nth = -(-h // tile_h)
    ntw = -(-w // tile_w)
    hp, wp = nth * tile_h, ntw * tile_w
    cth = tile_h if chroma in (422, 444) else tile_h // 2
    ctw = tile_w if chroma == 444 else tile_w // 2
    ch = h if chroma in (422, 444) else (h + 1) // 2
    cw = w if chroma == 444 else (w + 1) // 2
    chp = nth * cth
    cwp = ntw * ctw

    yp = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w)))
    u = jnp.pad(uv[..., 0], ((0, 0), (0, chp - ch), (0, cwp - cw)))
    v = jnp.pad(uv[..., 1], ((0, 0), (0, chp - ch), (0, cwp - cw)))

    kernel = functools.partial(
        _convert_kernel,
        coeffs=coeffs,
        minimum=float(rng.minimum),
        neutral=float(rng.neutral),
        transfer=transfer,
        tile_h=tile_h,
        tile_w=tile_w,
        chroma=chroma,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nth, ntw),
        in_specs=[
            pl.BlockSpec((1, tile_h, tile_w), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, cth, ctw), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, cth, ctw), lambda b, i, j: (b, i, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, tile_h, tile_w), lambda b, i, j: (b, 0, i, j)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, hp, wp), jnp.float32),
        interpret=interpret,
    )(yp, u, v)
    return out[:, :, :h, :w]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Conversion straight into the v4 padded-chain layout (no pad/slice copies)
# ---------------------------------------------------------------------------

# Candidate producer tile sizes, best (largest measured-fastest) first; the
# wrapper picks the first whose grid fits inside the consumer's padded
# layout (pad_geom4).  Heights are multiples of 16 (chroma blocks stay
# 8-row aligned), widths multiples of 256 (chroma blocks stay 128-lane
# aligned).
PAD_TILE_H_CANDIDATES = (272, 128, 64, 32, 16)
PAD_TILE_W_CANDIDATES = (512, 256)


def _pick_pad_tiles(h: int, w: int) -> tuple[int, int] | None:
    """(tile_h, tile_w) of the padded producer for an (h, w) image, or None
    if no candidate grid fits the pad_geom4 layout (tiny images)."""
    from turbo_metrics_tpu.ops.pallas.scale_stats import pad_geom4

    _, _, _, _, hp, wp = pad_geom4(h, w)
    tile_h = next(
        (t for t in PAD_TILE_H_CANDIDATES if 8 + -(-h // t) * t <= hp - 8),
        None,
    )
    tile_w = next(
        (t for t in PAD_TILE_W_CANDIDATES if 128 + -(-w // t) * t <= wp - 128),
        None,
    )
    if tile_h is None or tile_w is None:
        return None
    return tile_h, tile_w


def padded_conversion_fits(h: int, w: int) -> bool:
    """Whether yuv420_to_linear_rgb_padded supports this image size."""
    return _pick_pad_tiles(h, w) is not None


def _convert_padded_kernel(
    y_ref,
    u_ref,
    v_ref,
    _zeros,
    out_ref,
    rgb_scratch,
    sems,
    *,
    coeffs: tuple,
    minimum: float,
    neutral: float,
    transfer: str,
    h: int,
    w: int,
    img_ofs: int,
    n_img: int,
    nth: int,
    ntw: int,
    bsz: int,
    tile_h: int,
    tile_w: int,
):
    # Grid dim 0 is flat over (image, batch): f = img * bsz + b.  A pair
    # call (n_img=2) converts ref and dis in ONE kernel; the single-image
    # path passes n_img=1 with img_ofs selecting the destination slot.
    f = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    nsteps = n_img * bsz * nth * ntw
    step = (f * nth + ti) * ntw + tj
    slot = jax.lax.rem(step, 2)

    def store_dma(idx, slot_):
        f_i = idx // (nth * ntw)
        rem = idx % (nth * ntw)
        dst_r = pl.multiple_of(8 + (rem // ntw) * tile_h, 8)
        dst_c = pl.multiple_of(128 + (rem % ntw) * tile_w, 128)
        return pltpu.make_async_copy(
            rgb_scratch.at[slot_],
            out_ref.at[
                img_ofs + f_i // bsz,
                f_i % bsz,
                :,
                pl.ds(dst_r, tile_h),
                pl.ds(dst_c, tile_w),
            ],
            sems.at[slot_],
        )

    # Wait for the store issued two steps ago before reusing its slot.
    @pl.when(step >= 2)
    def _():
        store_dma(step - 2, slot).wait()

    y_coeff, r_coeff, b_coeff, g_coeff1, g_coeff2 = (jnp.float32(c) for c in coeffs)
    luma = (
        jnp.maximum(y_ref[0].astype(jnp.int32).astype(jnp.float32), jnp.float32(minimum))
        - jnp.float32(minimum)
    ) * y_coeff
    cb = u_ref[0].astype(jnp.int32).astype(jnp.float32) - jnp.float32(neutral)
    cr = v_ref[0].astype(jnp.int32).astype(jnp.float32) - jnp.float32(neutral)

    up_rows, up_cols = _up_matrices(tile_h, tile_w)
    r_ = _up_exact(r_coeff * cr, up_rows, up_cols)
    g_ = _up_exact(g_coeff1 * cb + g_coeff2 * cr, up_rows, up_cols)
    b_ = _up_exact(b_coeff * cb, up_rows, up_cols)

    # Zero beyond the image so the consumer's halo reads stay exact.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    mask = (
        (row_ids + ti * tile_h < h) & (col_ids + tj * tile_w < w)
    ).astype(jnp.float32)

    eotf = _EOTFS[transfer]
    rgb_scratch[slot, 0] = jnp.clip(eotf(luma + r_), 0.0, 1.0) * mask
    rgb_scratch[slot, 1] = jnp.clip(eotf(luma + g_), 0.0, 1.0) * mask
    rgb_scratch[slot, 2] = jnp.clip(eotf(luma + b_), 0.0, 1.0) * mask

    store_dma(step, slot).start()

    @pl.when(step == nsteps - 1)
    def _():
        store_dma(step, slot).wait()

        @pl.when(nsteps >= 2)
        def _():
            store_dma(step - 1, jax.lax.rem(step - 1, 2)).wait()


def yuv420_to_linear_rgb_padded(
    y: jax.Array,
    uv: jax.Array,
    out_or_none,
    img_idx: int,
    *,
    depth: int = 8,
    matrix: str = "bt709",
    transfer: str = "bt709",
    full_range: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Convert into slot ``img_idx`` of a (2, B, 3, hp, wp) padded-chain
    buffer (ops/pallas/scale_stats.pad_geom4 layout; halos stay zero via a
    zero-aliased buffer).  Pass ``out_or_none=None`` on the first image; pass
    the returned buffer for the second.  This is the producer side of the v4
    pipeline — one fused pass, no pad or slice copies."""
    from turbo_metrics_tpu.ops.pallas.scale_stats import pad_geom4

    bsz, h, w = y.shape
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

    return _convert_padded_impl(
        y, uv, out_or_none, img_idx, 1, bsz, h, w, coeffs, rng, transfer,
        interpret,
    )


def yuv420_pair_to_linear_rgb_padded(
    y_pair: jax.Array,
    uv_pair: jax.Array,
    out_or_none,
    *,
    depth: int = 8,
    matrix: str = "bt709",
    transfer: str = "bt709",
    full_range: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Convert BOTH images of a frame pair in ONE kernel call.

    ``y_pair``: (2, B, H, W); ``uv_pair``: (2, B, ch, cw, 2) — ref at index
    0, dis at index 1, sharing one conversion spec.  Produces the same
    (2, B, 3, hp, wp) padded-chain buffer as two yuv420_to_linear_rgb_padded
    calls, at half the kernel-launch/pipeline-drain cost."""
    two, bsz, h, w = y_pair.shape
    assert two == 2
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
    y_flat = y_pair.reshape(2 * bsz, h, w)
    uv_flat = uv_pair.reshape(2 * bsz, *uv_pair.shape[2:])
    return _convert_padded_impl(
        y_flat, uv_flat, out_or_none, 0, 2, bsz, h, w, coeffs, rng, transfer,
        interpret,
    )


def _convert_padded_impl(
    y, uv, out_or_none, img_ofs, n_img, bsz, h, w, coeffs, rng, transfer,
    interpret,
):
    from turbo_metrics_tpu.ops.pallas.scale_stats import pad_geom4

    # Tile choice: largest candidate grid that does not write past the
    # megakernel's interior (regions it never writes stay zero from the
    # buffer, which is what the consumer's mask expects anyway).  Images too
    # small for any grid use the general conversion + pad_to_layout4
    # fallback.
    tiles = _pick_pad_tiles(h, w)
    if tiles is None:
        raise ValueError(
            f"no padded conversion grid fits a {h}x{w} image; "
            "use the general path"
        )
    tile_h, tile_w = tiles
    nth = -(-h // tile_h)
    ntw = -(-w // tile_w)
    _, _, _, _, hp, wp = pad_geom4(h, w)

    ht, wt = nth * tile_h, ntw * tile_w
    ch, cw = (h + 1) // 2, (w + 1) // 2
    yp = jnp.pad(y, ((0, 0), (0, ht - h), (0, wt - w)))
    u = jnp.pad(uv[..., 0], ((0, 0), (0, ht // 2 - ch), (0, wt // 2 - cw)))
    v = jnp.pad(uv[..., 1], ((0, 0), (0, ht // 2 - ch), (0, wt // 2 - cw)))

    if out_or_none is None:
        out_or_none = jnp.zeros((2, bsz, 3, hp, wp), jnp.float32)

    kernel = functools.partial(
        _convert_padded_kernel,
        coeffs=coeffs,
        minimum=float(rng.minimum),
        neutral=float(rng.neutral),
        transfer=transfer,
        h=h,
        w=w,
        img_ofs=img_ofs,
        n_img=n_img,
        nth=nth,
        ntw=ntw,
        bsz=bsz,
        tile_h=tile_h,
        tile_w=tile_w,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_img * bsz, nth, ntw),
        in_specs=[
            pl.BlockSpec((1, tile_h, tile_w), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, tile_h // 2, tile_w // 2), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, tile_h // 2, tile_w // 2), lambda b, i, j: (b, i, j)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(out_or_none.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(yp, u, v, out_or_none)
    return out


# ---------------------------------------------------------------------------
# 2x downscale kernel (pyramid step)
# ---------------------------------------------------------------------------

DS_TILE_H = 256
DS_TILE_W = 256


def _downscale_kernel(x_ref, out_ref, *, tile_h: int, tile_w: int):
    dh, dw = tile_h // 2, tile_w // 2
    # Row pairs: a sublane-splitting reshape lowers exactly and cheaply.
    # Column (lane) pairs: Mosaic has no lane-splitting reshape or strided
    # slice, so they ride the MXU as an exact 0/1 matmul — with HIGHEST
    # precision, because the default TPU matmul rounds inputs to bf16
    # (which cost 0.44 on the SSIMULACRA2 score).
    s_cols = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_w, dw), dimension=0) // 2
        == jax.lax.broadcasted_iota(jnp.int32, (tile_w, dw), dimension=1)
    ).astype(jnp.float32)
    q = x_ref[0]
    rows = q.reshape(dh, 2, tile_w).sum(axis=1)
    quad = jnp.dot(
        rows, s_cols, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = quad * np.float32(0.25)


def downscale_by_2_pallas(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Edge-replicated ceil 2x2-mean downscale of (B, C, h, w) f32.

    Same semantics as ops.downscale.downscale_by_2 (the SSIMULACRA2 pyramid
    step): odd dims replicate the last row/column.  Replication happens in
    the jnp edge-pad, so the kernel is a plain quad mean.
    """
    b, c, h, w = x.shape
    tile_h = min(DS_TILE_H, _round_up(h, 16))
    tile_w = min(DS_TILE_W, _round_up(w, 256))
    nth = -(-h // tile_h)
    ntw = -(-w // tile_w)
    hp, wp = nth * tile_h, ntw * tile_w
    xp = jnp.pad(
        x.reshape(b * c, h, w), ((0, 0), (0, hp - h), (0, wp - w)), mode="edge"
    )
    out = pl.pallas_call(
        functools.partial(_downscale_kernel, tile_h=tile_h, tile_w=tile_w),
        grid=(b * c, nth, ntw),
        in_specs=[pl.BlockSpec((1, tile_h, tile_w), lambda p, i, j: (p, i, j))],
        out_specs=pl.BlockSpec(
            (1, tile_h // 2, tile_w // 2), lambda p, i, j: (p, i, j)
        ),
        out_shape=jax.ShapeDtypeStruct((b * c, hp // 2, wp // 2), jnp.float32),
        interpret=interpret,
    )(xp)
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    return out[:, :h2, :w2].reshape(b, c, h2, w2)
