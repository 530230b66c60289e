"""DLM (ADM-style) feature tests: device vs oracle, behavioural sanity."""

import numpy as np
import pytest

import jax

from turbo_metrics_tpu.ops.adm import dlm_score, dlm_stats
from turbo_metrics_tpu.refimpl.adm import dlm_frame


def _lumapair(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ref = (128 + 60 * np.sin(xx / 9) * np.cos(yy / 7) + 30 * np.sin((xx + yy) / 5)).astype(
        np.float32
    )
    return ref


def test_dlm_matches_oracle(rng):
    h, w = 96, 128
    ref = _lumapair(rng, h, w)
    dis = ref + rng.normal(0, 6, ref.shape).astype(np.float32)
    got = float(
        dlm_score(np.asarray(jax.jit(dlm_stats)(ref[None], dis[None])))[0]
    )
    want = dlm_frame(ref, dis)
    assert got == pytest.approx(want, abs=2e-3)


def test_dlm_identical_is_one(rng):
    ref = _lumapair(rng, 64, 96)
    got = float(dlm_score(np.asarray(jax.jit(dlm_stats)(ref[None], ref[None])))[0])
    assert got == pytest.approx(1.0, abs=1e-3)


def test_dlm_blur_reduces_score(rng):
    ref = _lumapair(rng, 96, 128)
    # crude blur: 5x5 box
    p = np.pad(ref, 2, mode="edge")
    blur = np.zeros_like(ref)
    for dy in range(5):
        for dx in range(5):
            blur += p[dy : dy + 96, dx : dx + 128]
    blur /= 25.0
    fn = jax.jit(dlm_stats)
    same = float(dlm_score(np.asarray(fn(ref[None], ref[None])))[0])
    blurred = float(dlm_score(np.asarray(fn(ref[None], blur[None])))[0])
    assert blurred < same - 0.05  # blur = detail loss
    # additive ringing-like noise decouples into A, not R: score stays higher
    # than heavy blur
    noisy = ref + rng.normal(0, 3, ref.shape).astype(np.float32)
    n = float(dlm_score(np.asarray(fn(ref[None], noisy[None])))[0])
    assert n > blurred
