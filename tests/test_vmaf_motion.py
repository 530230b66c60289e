"""VMAF motion feature: exact-integer parity with the oracle."""

import numpy as np
import pytest

import jax

from turbo_metrics_tpu.ops.vmaf_motion import integer_blur, motion_score
from turbo_metrics_tpu.refimpl import vmaf_motion as oracle


def _motion_engine(w, h, batch):
    """The motion feature through the one product engine."""
    from turbo_metrics_tpu.color.characteristics import height_fallback
    from turbo_metrics_tpu.engine import Metrics, TurboMetrics

    eng = TurboMetrics(w, h, Metrics(vmaf=True), batch=batch)
    cc = (height_fallback(h), "limited")

    def compute(y_frames):
        from turbo_metrics_tpu.io.frame_source import RawFrame

        uv = np.full(((h + 1) // 2, (w + 1) // 2, 2), 128, np.uint8)
        fr = [RawFrame(y=y, uv=uv, depth=8) for y in y_frames]
        return [s.vmaf_motion for s in eng.compute_frames(fr, cc, fr, cc)]

    return compute


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
    eng = _motion_engine(w, h, 3)
    got = eng(frames[:3]) + eng(frames[3:])

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
    assert _motion_engine(32, 32, 3)(list(y)) == [0.0, 0.0, 0.0]


# ---------------------------------------------------------------------------
# VIF
# ---------------------------------------------------------------------------

def test_vif_matches_oracle(rng):
    import jax

    from turbo_metrics_tpu.ops.vif import vif_scale_stats, vif_scores
    from turbo_metrics_tpu.refimpl.vif import vif_frame

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ref = (128 + 80 * np.sin(xx / 11) * np.cos(yy / 7)).astype(np.float32)
    dis = np.clip(ref + rng.normal(0, 4, ref.shape).astype(np.float32), 0, 255)

    stats = np.asarray(jax.jit(vif_scale_stats)(ref[None], dis[None]))
    got = vif_scores(stats)
    want = vif_frame(ref, dis)
    for k in ("vif_scale0", "vif_scale1", "vif_scale2", "vif_scale3", "vif"):
        assert float(got[k][0]) == pytest.approx(want[k], rel=2e-4), k
    # identical frames -> VIF == 1 at every scale
    stats_same = np.asarray(jax.jit(vif_scale_stats)(ref[None], ref[None]))
    same = vif_scores(stats_same)
    for k in range(4):
        assert float(same[f"vif_scale{k}"][0]) == pytest.approx(1.0, abs=1e-3)
    # distortion reduces VIF
    assert 0.0 < float(got["vif"][0]) < 1.0


def test_engine_vmaf_features_via_cli(tmp_path, rng, capsys):
    """Config-5 style multi-metric single decode: ssimulacra2+xpsnr+vmaf."""
    import json

    from tests.test_io import _write_y4m
    from turbo_metrics_tpu.cli import main
    from turbo_metrics_tpu.refimpl import vmaf_motion as moracle

    w, h = 64, 48
    yy, xx = np.mgrid[0:h, 0:w]
    frames, dframes = [], []
    for i in range(4):
        y = (120 + 60 * np.sin(xx / 7 + i * 0.5) * np.cos(yy / 5)).astype(np.uint16)
        u = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint16)
        frames.append((y, u, u))
        yd = np.clip(y + rng.integers(-5, 6, y.shape), 0, 255)
        dframes.append((yd, u, u))
    pr, pd = tmp_path / "r.y4m", tmp_path / "d.y4m"
    _write_y4m(pr, frames, w, h)
    _write_y4m(pd, dframes, w, h)

    rc = main([
        str(pr), str(pd), "-m", "ssimulacra2", "-m", "xpsnr", "-m", "vmaf",
        "--output", "json", "--no-progress", "--batch", "3",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["frame_count"] == 4
    for key in ("ssimulacra2", "xpsnr", "vmaf_motion", "vmaf_vif"):
        assert len(out[key]["scores"]) == 4, key

    # motion: frame 0 is 0.0; others match the oracle chain exactly.
    motion = out["vmaf_motion"]["scores"]
    assert motion[0] == 0.0
    prev = None
    from turbo_metrics_tpu.ops.vmaf_motion import motion_score
    for i, (y, _, _) in enumerate(frames):
        prev, sad = moracle.motion_frame(y.astype(np.uint8), prev)
        if i > 0:
            assert motion[i] == pytest.approx(motion_score(sad, w, h), abs=0)
    assert all(0.0 < v <= 1.0 for v in out["vmaf_vif"]["scores"])
