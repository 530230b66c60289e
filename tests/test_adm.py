"""ADM (adm2) feature tests: device vs oracle, behavioural sanity."""

import numpy as np
import pytest

import jax

from turbo_metrics_tpu.ops.adm import adm_score, adm_stats, band_sizes, dwt_quant_step
from turbo_metrics_tpu.refimpl.adm import adm_frame


def _luma(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return (
        128 + 60 * np.sin(xx / 9) * np.cos(yy / 7) + 30 * np.sin((xx + yy) / 5)
    ).astype(np.float32)


def _device_scores(ref, dis):
    stats = np.asarray(jax.jit(adm_stats)(ref[None], dis[None]))
    return {k: float(v[0]) for k, v in adm_score(stats, *ref.shape).items()}


def test_adm_matches_oracle(rng):
    h, w = 96, 128
    ref = _luma(h, w)
    dis = ref + rng.normal(0, 6, ref.shape).astype(np.float32)
    got = _device_scores(ref, dis)
    want = adm_frame(ref, dis)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=2e-3), key


def test_adm_matches_oracle_odd_dims(rng):
    # libvmaf's ceil-halving band sizes: exercise odd dims at several levels.
    h, w = 75, 101
    ref = _luma(h, w)
    dis = np.clip(ref * 0.9 + rng.normal(0, 4, ref.shape), 0, 255).astype(
        np.float32
    )
    got = _device_scores(ref, dis)
    want = adm_frame(ref, dis)
    assert got["adm2"] == pytest.approx(want["adm2"], abs=2e-3)
    assert band_sizes(h, w) == [(38, 51), (19, 26), (10, 13), (5, 7)]


def test_adm_identical_is_exactly_one(rng):
    ref = _luma(64, 96)
    got = _device_scores(ref, ref)
    # No additive impairment => zero masking threshold => num == den.
    assert got["adm2"] == pytest.approx(1.0, abs=1e-6)
    assert adm_frame(ref, ref)["adm2"] == 1.0


def test_adm_blur_reduces_score(rng):
    h, w = 96, 128
    ref = _luma(h, w)
    p = np.pad(ref, 2, mode="edge")
    blur = np.zeros_like(ref)
    for dy in range(5):
        for dx in range(5):
            blur += p[dy : dy + h, dx : dx + w]
    blur /= 25.0
    blurred = _device_scores(ref, blur)["adm2"]
    # blur = detail loss (the area stabilisers keep small-image scores high;
    # at 1080p the same distortion scores far lower)
    assert blurred < 0.97
    # additive noise decouples into A, not R: score stays higher than blur
    noisy = ref + rng.normal(0, 3, ref.shape).astype(np.float32)
    assert _device_scores(ref, noisy)["adm2"] > blurred


def test_watson_csf_constants():
    # Q decreases with level in the mid range and the diagonal band is
    # quantised more coarsely (lower CSF) than H/V at every level.
    for level in range(4):
        assert dwt_quant_step(level, 2) > dwt_quant_step(level, 1)
    # Spot value: display visual resolution r = 3*1080*pi/180 = 56.55 px/deg;
    # Q(0, 1) = 2*0.495*10^(0.466*log10(2*0.401/56.55)^2).
    import math

    r = 3.0 * 1080 * math.pi / 180.0
    t = math.log10(2.0 * 0.401 / r)
    assert dwt_quant_step(0, 1) == pytest.approx(
        2.0 * 0.495 * 10.0 ** (0.466 * t * t), rel=1e-12
    )
