"""VMAF motion feature: exact-integer parity with the oracle."""

import numpy as np
import pytest

import jax

from turbo_metrics_tpu.models.vmaf import VmafFeatures
from turbo_metrics_tpu.ops.vmaf_motion import integer_blur, motion_score
from turbo_metrics_tpu.refimpl import vmaf_motion as oracle


def test_integer_blur_bit_exact(rng):
    y = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    got = np.asarray(jax.jit(integer_blur)(y[None]))[0]
    want = oracle.integer_blur(y)
    np.testing.assert_array_equal(got, want)


def test_integer_blur_10bit(rng):
    import functools

    y = rng.integers(0, 1024, (16, 20), dtype=np.uint16)
    got = np.asarray(jax.jit(functools.partial(integer_blur, depth=10))(y[None]))[0]
    want = oracle.integer_blur(y, depth=10)
    np.testing.assert_array_equal(got, want)


def test_motion_stream_matches_oracle(rng):
    h, w = 28, 36
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(5)]
    eng = VmafFeatures(w, h)
    got = eng.compute_batch(np.stack(frames[:3])) + eng.compute_batch(np.stack(frames[3:]))

    prev = None
    want = []
    for f in frames:
        prev, sad = oracle.motion_frame(f, prev)
        want.append(motion_score(sad, w, h))
    assert got == pytest.approx(want, abs=0)
    assert got[0] == 0.0
    assert all(g > 0 for g in got[1:])


def test_static_scene_zero_motion():
    y = np.full((3, 32, 32), 77, np.uint8)
    eng = VmafFeatures(32, 32)
    assert eng.compute_batch(y) == [0.0, 0.0, 0.0]
