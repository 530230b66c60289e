"""Pallas kernels vs the jnp reference path (interpreter backend on CPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from turbo_metrics_tpu.models.ssimulacra2 import ssimulacra2_subscores
from turbo_metrics_tpu.ops.gaussian import blur_2d
from turbo_metrics_tpu.ops.pallas.scale_stats import norms_from_sums, scale_sums_pallas
from turbo_metrics_tpu.ops.ssim_maps import scale_norms
from turbo_metrics_tpu.ops.xyb import linear_rgb_to_xyb


def _xyb_pair(rng, b, h, w):
    lin1 = rng.random((b, 3, h, w), dtype=np.float64).astype(np.float32)
    lin2 = np.clip(lin1 + rng.normal(0, 0.05, lin1.shape).astype(np.float32), 0, 1)
    return (
        np.asarray(linear_rgb_to_xyb(jnp.asarray(lin1))),
        np.asarray(linear_rgb_to_xyb(jnp.asarray(lin2))),
    )


@pytest.mark.parametrize("hw", [(32, 48), (40, 130), (24, 128), (34, 60)])
def test_scale_sums_matches_jnp(rng, hw):
    h, w = hw
    xyb1, xyb2 = _xyb_pair(rng, 2, h, w)

    sums = scale_sums_pallas(jnp.asarray(xyb1), jnp.asarray(xyb2), interpret=True)
    got = np.asarray(norms_from_sums(sums, h * w))

    stacked = jnp.concatenate(
        [xyb1, xyb2, xyb1 * xyb1, xyb2 * xyb2, xyb1 * xyb2], axis=1
    )
    mu1, mu2, s11, s22, s12 = jnp.split(blur_2d(jnp.asarray(stacked)), 5, axis=1)
    want = np.asarray(
        scale_norms(jnp.asarray(xyb1), jnp.asarray(xyb2), mu1, mu2, s11, s22, s12)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_full_subscores_interpret_matches_jnp(rng):
    b, h, w = 1, 48, 64
    lin1 = rng.random((b, 3, h, w), dtype=np.float64).astype(np.float32)
    lin2 = np.clip(lin1 + rng.normal(0, 0.03, lin1.shape).astype(np.float32), 0, 1)
    jnp_out = np.asarray(
        ssimulacra2_subscores(lin1, lin2, num_scales=3, backend="jnp")
    )
    pl_out = np.asarray(
        ssimulacra2_subscores(lin1, lin2, num_scales=3, backend="interpret")
    )
    np.testing.assert_allclose(pl_out, jnp_out, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("hw", [(48, 64), (35, 61), (136, 640)])
def test_fused_v2_matches_jnp(rng, hw):
    """v2 kernel (xyb + downscale folded in) vs the jnp path, odd dims too."""
    h, w = hw
    lin1 = rng.random((2, 3, h, w), dtype=np.float64).astype(np.float32)
    lin2 = np.clip(lin1 + rng.normal(0, 0.03, lin1.shape).astype(np.float32), 0, 1)
    jnp_out = np.asarray(
        ssimulacra2_subscores(lin1, lin2, num_scales=3, backend="jnp")
    )
    v2_out = np.asarray(
        ssimulacra2_subscores(lin1, lin2, num_scales=3, backend="interpret2")
    )
    # 2x2-mean summation order differs (reduce_window vs explicit quad sum),
    # giving ~1e-6 absolute differences on near-zero sub-scores.
    np.testing.assert_allclose(v2_out, jnp_out, rtol=3e-5, atol=1e-5)


@pytest.mark.parametrize(
    "hw,depth,matrix,transfer,full",
    [
        ((48, 64), 8, "bt709", "bt709", False),
        ((37, 53), 8, "bt601_525", "bt709", True),
        ((32, 32), 10, "bt2020", "pq", False),
    ],
)
def test_pallas_yuv_convert_matches_jnp(rng, hw, depth, matrix, transfer, full):
    from turbo_metrics_tpu.ops import colorspace
    from turbo_metrics_tpu.ops.pallas.convert import yuv420_to_linear_rgb_pallas

    h, w = hw
    hi = (1 << depth) - 1
    dtype = np.uint8 if depth == 8 else np.uint16
    y = rng.integers(0, hi + 1, (2, h, w), dtype=dtype)
    uv = rng.integers(0, hi + 1, (2, (h + 1) // 2, (w + 1) // 2, 2), dtype=dtype)

    want = np.asarray(
        colorspace.yuv420_to_linear_rgb(
            jnp.asarray(y), jnp.asarray(uv),
            depth=depth, matrix=matrix, transfer=transfer, full_range=full,
        )
    )
    got = np.asarray(
        yuv420_to_linear_rgb_pallas(
            jnp.asarray(y), jnp.asarray(uv),
            depth=depth, matrix=matrix, transfer=transfer, full_range=full,
            interpret=True,
        )
    )
    # PQ's steep top end amplifies 1-ulp pre-EOTF differences ~300x.
    np.testing.assert_allclose(got, want, atol=1e-4 if transfer == "pq" else 3e-6)


@pytest.mark.parametrize("hw", [(48, 64), (33, 61), (480, 640)])
def test_pallas_downscale_matches_jnp(rng, hw):
    from turbo_metrics_tpu.ops.downscale import downscale_by_2
    from turbo_metrics_tpu.ops.pallas.convert import downscale_by_2_pallas

    h, w = hw
    x = rng.random((1, 3, h, w), dtype=np.float64).astype(np.float32)
    want = np.asarray(downscale_by_2(jnp.asarray(x)))
    got = np.asarray(downscale_by_2_pallas(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-7)


@pytest.mark.parametrize("hw", [(48, 64), (35, 61), (96, 129)])
def test_fused_v4_chain_matches_jnp(rng, hw):
    """v4 padded-chain (in-kernel downscale into the next level's padded
    layout, zero-aliased buffers) vs the jnp path, odd dims included."""
    h, w = hw
    lin1 = rng.random((2, 3, h, w), dtype=np.float64).astype(np.float32)
    lin2 = np.clip(lin1 + rng.normal(0, 0.03, lin1.shape).astype(np.float32), 0, 1)
    jnp_out = np.asarray(
        ssimulacra2_subscores(lin1, lin2, num_scales=3, backend="jnp")
    )
    v4_out = np.asarray(
        ssimulacra2_subscores(lin1, lin2, num_scales=3, backend="interpret3")
    )
    np.testing.assert_allclose(v4_out, jnp_out, rtol=3e-5, atol=5e-5)


def test_v4_downscale_chain_exact(rng):
    """The in-kernel MXU downscale equals the reference 2x2 edge-replicated
    mean, including odd dimensions and halo zeros."""
    from turbo_metrics_tpu.ops.downscale import downscale_by_2
    from turbo_metrics_tpu.ops.pallas.scale_stats import (
        ROW_HALO4,
        COL_HALO4,
        fused_scale_pallas_v4,
        pad_to_layout4,
    )

    for (h, w) in [(96, 128), (67, 83), (33, 129)]:
        lin1 = rng.random((1, 3, h, w), dtype=np.float64).astype(np.float32)
        lin2 = np.clip(lin1 * 0.5 + 0.1, 0, 1)
        p12 = pad_to_layout4(
            jnp.stack([jnp.asarray(lin1), jnp.asarray(lin2)]), h, w
        )
        _, ds12 = fused_scale_pallas_v4(p12, h, w, emit_ds=True, interpret=True)
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        full = np.asarray(ds12)
        got = full[:, :, :, ROW_HALO4:ROW_HALO4 + h2, COL_HALO4:COL_HALO4 + w2]
        for i, lin in enumerate((lin1, lin2)):
            want = np.asarray(downscale_by_2(jnp.asarray(lin)))
            np.testing.assert_allclose(got[i], want, rtol=0, atol=1e-6, err_msg=f"{h}x{w} img{i}")
        # everything outside the valid region must be exactly zero
        inner = np.zeros_like(full)
        inner[:, :, :, ROW_HALO4:ROW_HALO4 + h2, COL_HALO4:COL_HALO4 + w2] = got
        assert np.array_equal(full, inner), f"nonzero slack at {h}x{w}"


def test_pair_conversion_matches_two_calls(rng):
    """yuv420_pair_to_linear_rgb_padded must be bit-identical to two
    single-image producer calls into the same buffer."""
    import jax.numpy as jnp

    from turbo_metrics_tpu.ops.pallas.convert import (
        yuv420_pair_to_linear_rgb_padded,
        yuv420_to_linear_rgb_padded,
    )

    B, H, W = 2, 96, 1024
    y = rng.integers(16, 236, (2, B, H, W), dtype=np.uint8)
    uv = rng.integers(16, 240, (2, B, H // 2, W // 2, 2), dtype=np.uint8)
    pair = yuv420_pair_to_linear_rgb_padded(
        jnp.asarray(y), jnp.asarray(uv), None, interpret=True
    )
    p = yuv420_to_linear_rgb_padded(
        jnp.asarray(y[0]), jnp.asarray(uv[0]), None, 0, interpret=True
    )
    p = yuv420_to_linear_rgb_padded(
        jnp.asarray(y[1]), jnp.asarray(uv[1]), p, 1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(pair), np.asarray(p))


@pytest.mark.parametrize("depth", [8, 10])
@pytest.mark.parametrize("w_pass", ["vpu", "mxuC"])
def test_fused_yuv_scale0_interpret(rng, depth, w_pass):
    """v5 conversion-fused scale 0 (raw-chroma limb upsample, round 3) vs
    the producer + v4 path, per blur engine.  Interpret-mode fp contraction
    differs between the two graphs at ~1e-7 relative (bit-identical on
    chip), so the gate is loose-but-tight."""
    from turbo_metrics_tpu.ops import colorspace
    from turbo_metrics_tpu.ops.pallas.scale_stats import (
        fused_scale0_yuv_pallas,
        fused_scale_pallas_v4,
        fused_yuv_ok,
        norms_from_sums,
        pad_to_layout4,
    )

    h, w, b = 72, 256, 1
    assert fused_yuv_ok(h, w)
    hi = (1 << depth) - 1
    dtype = np.uint8 if depth == 8 else np.uint16
    y2 = rng.integers(0, hi, (2, b, h, w), dtype=np.uint16).astype(dtype)
    uv2 = rng.integers(
        0, hi, (2, b, (h + 1) // 2, (w + 1) // 2, 2), dtype=np.uint16
    ).astype(dtype)

    sums, ds = fused_scale0_yuv_pallas(
        jnp.asarray(y2), jnp.asarray(uv2), h, w,
        depth=depth, full_range=True, emit_ds=True,
        w_pass=w_pass, interpret=True,
    )
    lin = colorspace.yuv420_to_linear_rgb(
        jnp.asarray(y2.reshape(2 * b, h, w)),
        jnp.asarray(uv2.reshape(2 * b, (h + 1) // 2, (w + 1) // 2, 2)),
        depth=depth, full_range=True, backend="jnp",
    ).reshape(2, b, 3, h, w)
    p12 = pad_to_layout4(lin, h, w)
    ref_sums, ref_ds = fused_scale_pallas_v4(
        p12, h, w, emit_ds=True, w_pass=w_pass,
        interpret=True,
    )
    n = np.asarray(norms_from_sums(sums, h * w))
    nref = np.asarray(norms_from_sums(ref_sums, h * w))
    np.testing.assert_allclose(n, nref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(ds), np.asarray(ref_ds), rtol=2e-5, atol=1e-6
    )


def test_mxuC_engine_matches_default(rng):
    """The consistent-limb packed MXU blur engine ('mxuC', round 3) must
    track the exact default engine at the 1e-6 norm level with the full
    2-limb scheme (its design guarantees f32-level consistency;
    docs/PERFORMANCE.md round 3), and at the 1e-5 level with the round-5
    default that drops the O(2^-17) lo x lo cross-term dots (BAND_LOLO)."""
    from turbo_metrics_tpu.ops.pallas import scale_stats as ss
    from turbo_metrics_tpu.ops.pallas.scale_stats import (
        fused_scale_pallas_v4,
        norms_from_sums,
        pad_to_layout4,
    )

    h, w, b = 72, 200, 2
    lin1 = rng.random((b, 3, h, w), dtype=np.float64).astype(np.float32)
    lin2 = np.clip(
        lin1 + rng.normal(0, 0.05, lin1.shape).astype(np.float32), 0, 1
    )
    p12 = pad_to_layout4(jnp.stack([jnp.asarray(lin1), jnp.asarray(lin2)]), h, w)
    # Baseline: the f32-exact engine (H MXU HIGHEST + VPU W sweep).
    base, _ = fused_scale_pallas_v4(
        p12, h, w, emit_ds=False, w_pass="vpu", precision="highest",
        interpret=True,
    )
    nb = np.asarray(norms_from_sums(base, h * w))
    old_lolo = ss.BAND_LOLO
    try:
        for lolo, tol in ((True, 3e-6), (False, 1e-5)):
            ss.BAND_LOLO = lolo
            got, _ = fused_scale_pallas_v4(
                p12, h, w, emit_ds=False, w_pass="mxuC", interpret=True
            )
            ng = np.asarray(norms_from_sums(got, h * w))
            assert np.abs(ng - nb).max() < tol, (lolo, np.abs(ng - nb).max())
    finally:
        ss.BAND_LOLO = old_lolo


def test_ssim_pallas_matches_jnp(rng):
    """The fused windowed SSIM kernel (ops/pallas/windowed.py) must match
    the jnp valid-correlation formulation (same taps, same maps) to f32
    summation order."""
    from turbo_metrics_tpu.ops import quality

    a = jnp.asarray(
        rng.integers(0, 256, (2, 3, 72, 200)).astype(np.float32)
    )
    b = jnp.clip(
        a + jnp.asarray(rng.normal(0, 9, a.shape).astype(np.float32)),
        0, 255,
    )
    s_jnp = np.asarray(quality.ssim(a, b, backend="jnp"))
    s_pal = np.asarray(quality.ssim(a, b, backend="interpret"))
    assert np.abs(s_jnp - s_pal).max() < 2e-6
    m_jnp = np.asarray(quality.msssim(a, b, backend="jnp"))
    m_pal = np.asarray(quality.msssim(a, b, backend="interpret"))
    assert np.abs(m_jnp - m_pal).max() < 2e-6
    # identical pair stays exactly at the fixed point
    s_same = float(np.asarray(quality.ssim(a, a, backend="interpret"))[0])
    assert s_same == pytest.approx(1.0, abs=1e-6)


def test_msssim_pallas_chain_odd_dims(rng):
    """The in-kernel half-pool chain (emit_ds) must reproduce the jnp
    truncate-then-halve downsampling, including odd level dims."""
    from turbo_metrics_tpu.ops import quality

    a = jnp.asarray(
        rng.integers(0, 256, (1, 3, 135, 240)).astype(np.float32)
    )
    b = jnp.clip(
        a + jnp.asarray(rng.normal(0, 6, a.shape).astype(np.float32)),
        0, 255,
    )
    m_jnp = np.asarray(quality.msssim(a, b, backend="jnp"))
    m_pal = np.asarray(quality.msssim(a, b, backend="interpret"))
    assert np.abs(m_jnp - m_pal).max() < 5e-6


@pytest.mark.parametrize("hw", [(96, 128), (96, 1100), (161, 300)])
def test_vif_pallas_matches_oracle(rng, hw):
    """Fused Pallas VIF vs the jnp path and the f64 oracle: multi-tile
    columns (1100 -> tile_w=768 x2), multi-tile rows, odd decimation."""
    from turbo_metrics_tpu.ops.vif import vif_scale_stats, vif_scores
    from turbo_metrics_tpu.refimpl.vif import vif_frame

    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ref = (128 + 80 * np.sin(xx / 11) * np.cos(yy / 7)).astype(np.float32)
    dis = np.clip(
        ref + rng.normal(0, 4, ref.shape).astype(np.float32), 0, 255
    )
    s_pal = np.asarray(
        vif_scale_stats(ref[None], dis[None], backend="interpret")
    )
    got = vif_scores(s_pal)
    want = vif_frame(ref, dis)
    for k in ("vif_scale0", "vif_scale1", "vif_scale2", "vif_scale3", "vif"):
        assert float(got[k][0]) == pytest.approx(want[k], rel=2e-4), k
    same = vif_scores(
        np.asarray(vif_scale_stats(ref[None], ref[None], backend="interpret"))
    )
    for k in range(4):
        assert float(same[f"vif_scale{k}"][0]) == pytest.approx(1.0, abs=1e-3)


@pytest.mark.parametrize("hw", [(96, 128), (96, 1100), (161, 300)])
def test_adm_pallas_matches_oracle(rng, hw):
    """Fused Pallas ADM (DWT + mask kernels) vs the jnp path and oracle."""
    from turbo_metrics_tpu.ops.adm import adm_score, adm_stats
    from turbo_metrics_tpu.refimpl.adm import adm_frame

    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ref = (128 + 80 * np.sin(xx / 11) * np.cos(yy / 7)).astype(np.float32)
    dis = np.clip(
        ref + rng.normal(0, 4, ref.shape).astype(np.float32), 0, 255
    )
    s_pal = np.asarray(adm_stats(ref[None], dis[None], backend="interpret"))
    got = adm_score(s_pal, h, w)
    want = adm_frame(ref, dis)
    # Tolerance note: the decoupling angle gate (adm.py step 2) is
    # DISCONTINUOUS — a band value change of ~1e-6 (the MXU DWT's f32
    # summation-order rounding vs the oracle) can flip a near-tie pixel and
    # shift a scale score by ~5e-4 (measured: exactly one flipped pixel at
    # 161x300/seed 1234).  libvmaf's own float path has the same
    # sensitivity vs an f64 oracle.
    for k in ("adm_scale0", "adm_scale1", "adm_scale2", "adm_scale3", "adm2"):
        assert float(got[k][0]) == pytest.approx(
            float(want[k]), rel=5e-3, abs=1e-3
        ), k


@pytest.mark.parametrize("hw", [(161, 300), (96, 1100)])
def test_vif_tail_matches_perscale(rng, hw):
    """Fused VIF tail (scales 1-3 in one kernel, reflect folded into edge
    band matrices) vs the per-scale kernels and the oracle."""
    from turbo_metrics_tpu.ops.pallas.vif import vif_scale_stats_pallas
    from turbo_metrics_tpu.ops.vif import vif_scores
    from turbo_metrics_tpu.refimpl.vif import vif_frame

    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ref = (128 + 80 * np.sin(xx / 11) * np.cos(yy / 7)).astype(np.float32)
    dis = np.clip(
        ref + rng.normal(0, 4, ref.shape).astype(np.float32), 0, 255
    )
    s_tail = np.asarray(
        vif_scale_stats_pallas(
            ref[None], dis[None], use_tail=True, interpret=True
        )
    )
    got = vif_scores(s_tail)
    want = vif_frame(ref, dis)
    for k in ("vif_scale0", "vif_scale1", "vif_scale2", "vif_scale3", "vif"):
        assert float(got[k][0]) == pytest.approx(want[k], rel=2e-4), k


@pytest.mark.parametrize(
    "hw_depth",
    [(96, 128, 8), (161, 300, 8), (96, 1100, 10), (64, 3840, 10)],
)
def test_xpsnr_pallas_bit_exact(rng, hw_depth):
    """Fused Pallas XPSNR block stats are bit-exact vs the jnp path
    (separable highpass decomposition + exact f32 block sums, hi/lo SSE
    limbs above 8-bit).  The (64, 3840, 10) case pins the BASELINE
    config-4 tile geometry (XPSNR on 4K 10-bit; docs/PERFORMANCE.md
    "Round-4 campaign") at the full 3840 width."""
    from turbo_metrics_tpu.ops.xpsnr_ops import xpsnr_block_stats

    h, w, depth = hw_depth
    hi = (1 << depth) - 1
    dt = np.uint8 if depth == 8 else np.uint16
    r = rng.integers(0, hi + 1, (2, h, w), dtype=dt)
    d = np.clip(
        r.astype(np.int32) + rng.integers(-40, 40, r.shape), 0, hi
    ).astype(dt)
    p = np.roll(r, 3, axis=2)
    want = xpsnr_block_stats(
        jnp.asarray(r), jnp.asarray(d), jnp.asarray(p), backend="jnp"
    )
    got = xpsnr_block_stats(
        jnp.asarray(r), jnp.asarray(d), jnp.asarray(p),
        depth=depth, backend="interpret",
    )
    for k in ("sse", "sact", "tact"):
        assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), k


@pytest.mark.parametrize("hw_depth", [(96, 128, 8), (161, 300, 8), (96, 1100, 10)])
def test_motion_pallas_bit_exact(rng, hw_depth):
    """Fused Pallas motion (integer blur + SAD) is bit-exact vs the jnp
    path (exact i32 arithmetic, hi/lo byte split on the H pass)."""
    from turbo_metrics_tpu.ops.vmaf_motion import integer_blur, motion_stats

    h, w, depth = hw_depth
    hi = (1 << depth) - 1
    dt = np.uint8 if depth == 8 else np.uint16
    y = rng.integers(0, hi + 1, (2, h, w), dtype=dt)
    prev = rng.integers(0, 65536, (2, h, w), dtype=np.uint16)
    b_j = np.asarray(integer_blur(jnp.asarray(y), depth=depth, backend="jnp"))
    b_p = np.asarray(
        integer_blur(jnp.asarray(y), depth=depth, backend="interpret")
    )
    assert np.array_equal(b_j, b_p)
    m_j = motion_stats(
        jnp.asarray(y), jnp.asarray(prev), depth=depth, backend="jnp"
    )
    m_p = motion_stats(
        jnp.asarray(y), jnp.asarray(prev), depth=depth, backend="interpret"
    )
    assert np.array_equal(np.asarray(m_j["blurred"]), np.asarray(m_p["blurred"]))
    assert np.array_equal(np.asarray(m_j["sad_rows"]), np.asarray(m_p["sad_rows"]))


def test_msssim_tail_matches_jnp(rng):
    """Fused MS-SSIM tail (levels 1-4 in one kernel) vs the jnp chain.
    176x368 is the smallest-ish size where the tail engages (level-4 dims
    must exceed the 11-tap window)."""
    from turbo_metrics_tpu.ops import quality
    from turbo_metrics_tpu.ops.pallas.windowed_tail import msssim_tail_ok

    h, w = 176, 368
    assert msssim_tail_ok(h // 2, w // 2, (2, 1, 3, 10**6, 10**6))
    a = jnp.asarray(rng.integers(0, 256, (1, 3, h, w)).astype(np.float32))
    b = jnp.clip(
        a + jnp.asarray(rng.normal(0, 6, a.shape).astype(np.float32)),
        0, 255,
    )
    m_jnp = np.asarray(quality.msssim(a, b, backend="jnp"))
    m_pal = np.asarray(quality.msssim(a, b, backend="interpret"))
    assert np.abs(m_jnp - m_pal).max() < 5e-6


def test_ssimulacra2_tail2_matches_chain(rng):
    """Full-pyramid tail (levels 1-5 in one kernel) vs the per-level v4
    chain: same mxuC machinery, expect f32-rounding-level agreement."""
    import turbo_metrics_tpu.models.ssimulacra2 as s2m

    lin1 = rng.random((1, 3, 208, 272)).astype(np.float32)
    lin2 = np.clip(
        lin1 + rng.normal(0, 0.03, lin1.shape).astype(np.float32), 0, 1
    )
    old_tail, old_t2 = s2m.TAIL_MAX_BYTES, s2m.USE_TAIL2
    try:
        s2m.TAIL_MAX_BYTES = 0  # per-level chain as the reference
        a = np.asarray(
            s2m.ssimulacra2_subscores(
                lin1, lin2, num_scales=6, backend="interpret3"
            )
        )
        s2m.USE_TAIL2 = True
        b = np.asarray(
            s2m.ssimulacra2_subscores(
                lin1, lin2, num_scales=6, backend="interpret3"
            )
        )
    finally:
        s2m.TAIL_MAX_BYTES, s2m.USE_TAIL2 = old_tail, old_t2
    assert np.abs(a - b).max() < 1e-6


@pytest.mark.parametrize("chroma", [422, 444])
def test_pallas_convert_full_chroma(rng, chroma):
    """The fused converter handles 4:2:2/4:4:4 on the real chroma grid
    (engine fast path; the reference is stuck with NVDEC's 4:2:0)."""
    from turbo_metrics_tpu.ops import colorspace
    from turbo_metrics_tpu.ops.pallas.convert import yuv420_to_linear_rgb_pallas

    h, w = 37, 53
    ch = h if chroma in (422, 444) else -(-h // 2)
    cw = w if chroma == 444 else -(-w // 2)
    y = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
    uv = rng.integers(0, 256, (2, ch, cw, 2), dtype=np.uint8)
    want = np.asarray(
        colorspace.yuv420_to_linear_rgb(
            jnp.asarray(y), jnp.asarray(uv), chroma=chroma
        )
    )
    got = np.asarray(
        yuv420_to_linear_rgb_pallas(
            jnp.asarray(y), jnp.asarray(uv), chroma=chroma, interpret=True
        )
    )
    assert np.abs(got - want).max() < 3e-6


def test_subtiled_mxuc_bit_identical(rng):
    """subtiles=2 (the ILP sub-chain experiment) must be bit-identical to
    the monolithic mxuC maps: the band windows contain the same nonzero
    terms, zeros add exactly."""
    from turbo_metrics_tpu.ops.pallas.scale_stats import (
        fused_scale_pallas_v4,
        pad_to_layout4,
    )

    h, w = 160, 256
    lin1 = rng.random((1, 3, h, w)).astype(np.float32)
    lin2 = np.clip(
        lin1 + rng.normal(0, 0.03, lin1.shape).astype(np.float32), 0, 1
    )
    p12 = pad_to_layout4(jnp.stack([jnp.asarray(lin1), jnp.asarray(lin2)]), h, w)
    # Pin h_layout='f': the subtile path always uses the fat per-subtile H
    # band (the chunked-H default is gated to subtiles == 1), and this test
    # asserts the subtile decomposition itself is exact.
    s1, _ = fused_scale_pallas_v4(
        p12, h, w, emit_ds=False, h_layout="f", interpret=True
    )
    s2, _ = fused_scale_pallas_v4(
        p12, h, w, emit_ds=False, h_layout="f", subtiles=2, interpret=True
    )
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_ds_buffer_bookkeeping_matches_runtime(rng):
    """ds_buffer_shapes* must agree with what the runtime actually
    consumes, for both tail2 settings and for kernel-variant kwargs
    (review finding: the two paths previously decided independently)."""
    import turbo_metrics_tpu.models.ssimulacra2 as s2m
    from turbo_metrics_tpu.ops.pallas.scale_stats import pad_to_layout4

    h, w = 208, 272
    lin1 = rng.random((1, 3, h, w)).astype(np.float32)
    lin2 = np.clip(
        lin1 + rng.normal(0, 0.02, lin1.shape).astype(np.float32), 0, 1
    )
    p12 = pad_to_layout4(jnp.stack([jnp.asarray(lin1), jnp.asarray(lin2)]), h, w)
    old_tail, old_t2 = s2m.TAIL_MAX_BYTES, s2m.USE_TAIL2
    try:
        s2m.TAIL_MAX_BYTES = 0  # force the per-level chain at this size
        for use_t2 in (False, True):
            for kw in ({}, {"subtiles": 2}):
                s2m.USE_TAIL2 = use_t2
                shapes = s2m.ds_buffer_shapes(
                    h, w, 1, num_scales=6, kernel_kwargs=kw or None
                )
                bufs = [jnp.zeros(s, jnp.float32) for s in shapes]
                out, ds_outs = s2m.ssimulacra2_subscores_from_padded(
                    p12, h, w, num_scales=6, interpret=True,
                    ds_bufs=bufs, **kw,
                )
                assert len(ds_outs) == len(bufs), (use_t2, kw)
    finally:
        s2m.TAIL_MAX_BYTES, s2m.USE_TAIL2 = old_tail, old_t2


def test_pipelined_mxuc_matches_monolithic(rng):
    """The cross-tile software pipeline (pipelined=True, a measured
    negative result kept for the record) must reproduce the monolithic
    mxuC sums up to map-chunk summation reorder, on both kernels."""
    from turbo_metrics_tpu.ops.pallas.scale_stats import (
        fused_scale0_yuv_pallas,
        fused_scale_pallas_v4,
        pad_to_layout4,
    )

    h, w = 120, 500
    lin1 = rng.random((2, 3, h, w)).astype(np.float32)
    lin2 = np.clip(
        lin1 + rng.normal(0, 0.03, lin1.shape).astype(np.float32), 0, 1
    )
    p12 = pad_to_layout4(jnp.stack([jnp.asarray(lin1), jnp.asarray(lin2)]), h, w)
    s1, d1 = fused_scale_pallas_v4(p12, h, w, emit_ds=True, interpret=True)
    s2, d2 = fused_scale_pallas_v4(
        p12, h, w, emit_ds=True, pipelined=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-5)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))

    y2 = rng.integers(16, 235, (2, 2, h, w)).astype(np.uint8)
    uv2 = rng.integers(
        16, 240, (2, 2, (h + 1) // 2, (w + 1) // 2, 2)
    ).astype(np.uint8)
    s3, _ = fused_scale0_yuv_pallas(
        jnp.asarray(y2), jnp.asarray(uv2), h, w, interpret=True
    )
    s4, _ = fused_scale0_yuv_pallas(
        jnp.asarray(y2), jnp.asarray(uv2), h, w, pipelined=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s4), rtol=2e-5)


def test_single_wide_tile_geometry_1280(rng):
    """1280-wide content tiles as a single 256-aligned column tile (so the
    conversion-fused v5 path engages at 720p) and matches the jnp oracle
    path through the full sub-score pipeline."""
    from turbo_metrics_tpu.models.ssimulacra2 import ssimulacra2_subscores
    from turbo_metrics_tpu.ops.pallas.scale_stats import (
        fused_yuv_ok,
        pad_geom4,
    )

    tile_h, tile_w, nth, ntw, _, _ = pad_geom4(720, 1280)
    assert (tile_w, ntw) == (1280, 1) and tile_w % 256 == 0
    assert fused_yuv_ok(720, 1280)

    # The conversion-fused v5 kernel itself at the 1280 tile width (10
    # chroma column chunks — a geometry no other test reaches) vs the
    # producer + v4 path.
    from turbo_metrics_tpu.ops import colorspace
    from turbo_metrics_tpu.ops.pallas.scale_stats import (
        fused_scale0_yuv_pallas,
        fused_scale_pallas_v4,
        norms_from_sums,
        pad_to_layout4,
    )

    h, w, b = 48, 1280, 1
    y2 = rng.integers(16, 235, (2, b, h, w)).astype(np.uint8)
    uv2 = rng.integers(16, 240, (2, b, h // 2, w // 2, 2)).astype(np.uint8)
    sums, _ = fused_scale0_yuv_pallas(
        jnp.asarray(y2), jnp.asarray(uv2), h, w, emit_ds=False,
        interpret=True,
    )
    lin = colorspace.yuv420_to_linear_rgb(
        jnp.asarray(y2.reshape(2 * b, h, w)),
        jnp.asarray(uv2.reshape(2 * b, h // 2, w // 2, 2)),
        backend="jnp",
    ).reshape(2, b, 3, h, w)
    ref_sums, _ = fused_scale_pallas_v4(
        pad_to_layout4(lin, h, w), h, w, emit_ds=False, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(norms_from_sums(sums, h * w)),
        np.asarray(norms_from_sums(ref_sums, h * w)),
        rtol=2e-5, atol=2e-6,
    )

    h, w = 96, 1280  # full 1280-wide tiles, small height for CPU speed
    lin1 = rng.random((1, 3, h, w)).astype(np.float32)
    lin2 = np.clip(
        lin1 + rng.normal(0, 0.03, lin1.shape).astype(np.float32), 0, 1
    )
    ref = ssimulacra2_subscores(
        jnp.asarray(lin1), jnp.asarray(lin2), num_scales=3, backend="jnp"
    )
    got = ssimulacra2_subscores(
        jnp.asarray(lin1), jnp.asarray(lin2), num_scales=3,
        backend="interpret3",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_zero_weight_skipping_exact(rng):
    """SKIP_ZERO_WEIGHTED drops zero-weighted sub-score work in the mxuC
    kernels (weight_needs): nonzero-weighted entries must be BIT-identical
    to the full computation (the pack shrinks but every remaining matmul
    column/window sees the same data), masked entries exactly 0, and the
    final score unchanged to the last bit."""
    import turbo_metrics_tpu.models.ssimulacra2 as s2m
    from turbo_metrics_tpu.models.ssimulacra2_score import (
        needs_mask,
        postprocess_score,
        weight_needs,
    )

    # weight_needs/needs_mask agree with each other and with WEIGHTS.
    for ns in (3, 6):
        nd = weight_needs(ns)
        m = needs_mask(ns)
        for s in range(ns):
            for c in range(3):
                for k in range(6):
                    assert nd[s][c][k] == bool(m[c, s, k % 2, k // 2])

    h, w = 160, 272  # multiple tail levels, CPU-feasible
    lin1 = rng.random((1, 3, h, w)).astype(np.float32)
    lin2 = np.clip(
        lin1 + rng.normal(0, 0.03, lin1.shape).astype(np.float32), 0, 1
    )
    old = s2m.SKIP_ZERO_WEIGHTED
    try:
        for use_t2 in (False, True):
            old_t2 = s2m.USE_TAIL2
            s2m.USE_TAIL2 = use_t2
            try:
                s2m.SKIP_ZERO_WEIGHTED = False
                full = np.asarray(
                    s2m.ssimulacra2_subscores(
                        jnp.asarray(lin1), jnp.asarray(lin2),
                        num_scales=6, backend="interpret3",
                    )
                )
                s2m.SKIP_ZERO_WEIGHTED = True
                skip = np.asarray(
                    s2m.ssimulacra2_subscores(
                        jnp.asarray(lin1), jnp.asarray(lin2),
                        num_scales=6, backend="interpret3",
                    )
                )
            finally:
                s2m.USE_TAIL2 = old_t2
            m6 = needs_mask(6)
            assert np.abs((full - skip) * m6).max() == 0.0, use_t2
            assert np.abs(skip * (1.0 - m6)).max() == 0.0, use_t2
            assert postprocess_score(full) == postprocess_score(skip)
    finally:
        s2m.SKIP_ZERO_WEIGHTED = old


def test_vif_jnp_guard_on_tpu(monkeypatch):
    """The jnp VIF formulation faults the TPU at >=720p-class areas
    (round-4 job 115); the dispatcher must refuse it there instead of
    letting a public kwarg poison the device (VERDICT r4 weak #4)."""
    import types

    import jax as _jax

    from turbo_metrics_tpu.ops import vif as vifm

    monkeypatch.setattr(
        _jax, "devices", lambda: [types.SimpleNamespace(platform="tpu")]
    )
    a = jnp.zeros((1, 720, 1280), jnp.float32)
    with pytest.raises(ValueError, match="faults the device"):
        vifm.vif_scale_stats(a, a, backend="jnp")
    # Small images keep the jnp path (measured fine; used by CPU tests).
    monkeypatch.undo()
    out = vifm.vif_scale_stats(
        jnp.ones((1, 64, 96), jnp.float32),
        jnp.ones((1, 64, 96), jnp.float32),
        backend="jnp",
    )
    assert out.shape == (1, 4, 2)
