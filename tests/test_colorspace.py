"""Colorspace op tests: matrices from primaries, transfers, YUV conversion,
HDR (BT.2020 + PQ/HLG) path, and the CLI colour overrides."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from turbo_metrics_tpu.ops import colorspace as cs


def test_kr_kb_from_primaries():
    kr, kb = cs.MATRIX_KR_KB["bt709"]
    assert kr == pytest.approx(0.2126, abs=2e-4)
    assert kb == pytest.approx(0.0722, abs=2e-4)
    kr20, kb20 = cs.MATRIX_KR_KB["bt2020"]
    assert kr20 == pytest.approx(0.2627, abs=2e-4)
    assert kb20 == pytest.approx(0.0593, abs=2e-4)


def test_bt709_eotf_roundtrip():
    # OETF(EOTF(v)) == v on the curve's domain.
    v = np.linspace(0, 1, 101, dtype=np.float32)
    lin = np.asarray(cs.bt709_eotf(jnp.asarray(v)))
    beta = 0.018053968510807
    alpha = 1.0 + 5.5 * beta
    oetf = np.where(lin < beta, 4.5 * lin, alpha * lin**0.45 - (alpha - 1))
    np.testing.assert_allclose(oetf, v, atol=2e-6)


def test_srgb_matches_reference_lut():
    from turbo_metrics_tpu.refimpl.ssimulacra2 import srgb8_to_linear

    v = np.arange(256, dtype=np.uint8)
    got = np.asarray(cs.srgb_to_linear(jnp.asarray(v)))
    want = srgb8_to_linear(v)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_pq_eotf_anchor_points():
    # PQ: code 1.0 -> 10000 nits (=1.0 normalised); ~0.508 -> ~100 nits.
    out = np.asarray(cs.pq_eotf(jnp.asarray(np.float32([0.0, 0.5080784, 1.0]))))
    assert out[0] == pytest.approx(0.0, abs=1e-6)
    assert out[1] * 10000 == pytest.approx(100.0, rel=1e-3)
    assert out[2] == pytest.approx(1.0, rel=1e-5)


def test_hlg_eotf_continuity():
    v = np.float32([0.4999, 0.5001])
    out = np.asarray(cs.hlg_eotf(jnp.asarray(v)))
    assert abs(out[1] - out[0]) < 1e-3
    assert np.asarray(cs.hlg_eotf(jnp.float32(1.0))) == pytest.approx(1.0, rel=1e-5)


def test_yuv420_gray_point():
    """Limited-range mid-gray YCbCr -> equal RGB channels."""
    y = np.full((2, 4, 4), 126, np.uint8)  # mid luma
    uv = np.full((2, 2, 2, 2), 128, np.uint8)  # neutral chroma
    rgb = np.asarray(cs.yuv420_to_linear_rgb(jnp.asarray(y), jnp.asarray(uv)))
    assert rgb.shape == (2, 3, 4, 4)
    np.testing.assert_allclose(rgb[:, 0], rgb[:, 1], atol=1e-7)
    np.testing.assert_allclose(rgb[:, 1], rgb[:, 2], atol=1e-7)
    # (126-16)/219 = 0.5023 gamma -> inverse-OETF linear ~0.262
    assert 0.25 < rgb[0, 0, 0, 0] < 0.27


def test_yuv420_limited_vs_full_range():
    y = np.full((1, 4, 4), 200, np.uint8)
    uv = np.full((1, 2, 2, 2), 128, np.uint8)
    lim = np.asarray(cs.yuv420_to_linear_rgb(jnp.asarray(y), jnp.asarray(uv)))
    ful = np.asarray(
        cs.yuv420_to_linear_rgb(jnp.asarray(y), jnp.asarray(uv), full_range=True)
    )
    assert lim[0, 0, 0, 0] > ful[0, 0, 0, 0]  # limited range stretches up


def test_yuv420_10bit_bt2020_pq():
    """HDR path: 10-bit BT.2020 limited-range with PQ transfer."""
    y = np.full((1, 4, 4), 600, np.uint16)
    uv = np.full((1, 2, 2, 2), 512, np.uint16)
    rgb = np.asarray(
        cs.yuv420_to_linear_rgb(
            jnp.asarray(y), jnp.asarray(uv),
            depth=10, matrix="bt2020", transfer="pq",
        )
    )
    assert rgb.shape == (1, 3, 4, 4)
    assert np.isfinite(rgb).all() and (rgb >= 0).all() and (rgb <= 1).all()
    np.testing.assert_allclose(rgb[0, 0], rgb[0, 1], atol=1e-7)


def test_odd_dims_chroma_upsample():
    y = np.zeros((1, 5, 7), np.uint8)
    uv = np.full((1, 3, 4, 2), 128, np.uint8)
    rgb = np.asarray(cs.yuv420_to_linear_rgb(jnp.asarray(y), jnp.asarray(uv)))
    assert rgb.shape == (1, 3, 5, 7)


def test_cli_color_override(tmp_path, rng, capsys):
    """--color-matrix/transfer/range reach the conversion spec."""
    import json

    from tests.test_io import _rand_yuv, _write_y4m
    from turbo_metrics_tpu.cli import main

    w, h = 32, 32
    frames = [_rand_yuv(rng, w, h, 10) for _ in range(2)]
    pr = tmp_path / "r.y4m"
    _write_y4m(pr, frames, w, h, depth=10)

    rc = main([
        str(pr), str(pr), "-m", "psnr",
        "--color-matrix", "bt2020", "--color-transfer", "pq",
        "--color-range", "limited",
        "--output", "json-lines", "--no-progress",
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[0])["psnr"] > 1e6 or json.loads(lines[0])["psnr"] == float("inf")


def test_fast_eotf_forms_match_pow():
    """The division-free EOTF decompositions (used in the Pallas conversion
    kernels) match the pow-based definitions to f32 rounding over a dense
    sweep of the whole input domain, including both piecewise branches and
    out-of-gamut excursions."""
    import jax.numpy as jnp

    from turbo_metrics_tpu.ops.colorspace import (
        bt709_eotf,
        bt709_eotf_fast,
        srgb_eotf,
        srgb_eotf_fast,
    )

    v = jnp.asarray(np.linspace(-0.2, 1.3, 200001, dtype=np.float32))
    for exact, fast in ((bt709_eotf, bt709_eotf_fast), (srgb_eotf, srgb_eotf_fast)):
        a = np.asarray(exact(v), dtype=np.float64)
        b = np.asarray(fast(v), dtype=np.float64)
        err = np.abs(a - b)
        assert err.max() < 2e-6, (exact.__name__, err.max())
        # branch threshold behaviour identical (lo branch is shared code)
        assert np.array_equal(a < 0, b < 0)
