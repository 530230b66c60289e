"""XPSNR: device block stats vs NumPy oracle, engine streaming state, CLI."""

import numpy as np
import pytest

import jax

from turbo_metrics_tpu.ops.xpsnr_ops import xpsnr_block_stats, xpsnr_db, xpsnr_weights
from turbo_metrics_tpu.refimpl import xpsnr as oracle


def _xpsnr_engine(w, h, batch):
    """XPSNR through the one product engine (no duplicate streaming logic)."""
    from turbo_metrics_tpu.color.characteristics import height_fallback
    from turbo_metrics_tpu.engine import Metrics, TurboMetrics

    eng = TurboMetrics(w, h, Metrics(xpsnr=True), batch=batch)
    cc = (height_fallback(h), "limited")

    def compute(y_ref, y_dis):
        from turbo_metrics_tpu.io.frame_source import RawFrame

        uv = np.full(((h + 1) // 2, (w + 1) // 2, 2), 128, np.uint8)
        fr = [RawFrame(y=y, uv=uv, depth=8) for y in y_ref]
        fd = [RawFrame(y=y, uv=uv, depth=8) for y in y_dis]
        return [s.xpsnr for s in eng.compute_frames(fr, cc, fd, cc)]

    return compute


def test_reference_micro_case():
    """The reference's own numeric micro-test (xpsnr-cuda/src/lib.rs:206-231):
    4x4 all-16 ref vs all-14 dis, all-16 prev -> SSE 16*(16-14)^2 = 64,
    temporal activity 0, spatial activity 0 (flat)."""
    ref = np.full((1, 4, 4), 16, np.uint8)
    dis = np.full((1, 4, 4), 14, np.uint8)
    stats = jax.jit(xpsnr_block_stats)(ref, dis, ref)
    assert int(np.asarray(stats["sse"]).sum()) == 64
    assert int(np.asarray(stats["tact"]).sum()) == 0
    assert int(np.asarray(stats["sact"]).sum()) == 0


def test_block_stats_match_oracle(rng):
    h, w = 52, 70  # partial edge blocks
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dis = rng.integers(0, 256, (h, w), dtype=np.uint8)
    prev = rng.integers(0, 256, (h, w), dtype=np.uint8)

    stats = jax.jit(xpsnr_block_stats)(ref[None], dis[None], prev[None])
    np.testing.assert_array_equal(
        np.asarray(stats["sse"])[0], oracle.block_sums((ref.astype(np.int64) - dis) ** 2)
    )
    np.testing.assert_array_equal(
        np.asarray(stats["sact"])[0], oracle.block_sums(oracle.highpass_abs(ref))
    )
    np.testing.assert_array_equal(
        np.asarray(stats["tact"])[0],
        oracle.block_sums(np.abs(ref.astype(np.int64) - prev)),
    )


@pytest.mark.parametrize("hw", [(64, 80), (480, 640), (144, 176)])
def test_xpsnr_matches_oracle(rng, hw):
    h, w = hw
    ref = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
    dis = np.clip(
        ref.astype(np.int16) + rng.integers(-8, 9, ref.shape), 0, 255
    ).astype(np.uint8)

    got = _xpsnr_engine(w, h, 3)(list(ref), list(dis))

    prev = None
    for i in range(3):
        _, want = oracle.xpsnr_frame(ref[i], dis[i], prev)
        prev = ref[i]
        assert got[i] == pytest.approx(want, abs=1e-9), f"frame {i}"


def test_xpsnr_streaming_state_matches_one_shot(rng):
    """Two batches of 2 must equal one batch of 4 (prev-frame chaining)."""
    h, w = 48, 64
    ref = rng.integers(0, 256, (4, h, w), dtype=np.uint8)
    dis = np.clip(ref.astype(np.int16) + rng.integers(-5, 6, ref.shape), 0, 255).astype(np.uint8)
    one_shot = _xpsnr_engine(w, h, 4)(list(ref), list(dis))
    b = _xpsnr_engine(w, h, 2)
    chunked = b(list(ref[:2]), list(dis[:2])) + b(list(ref[2:]), list(dis[2:]))
    np.testing.assert_allclose(one_shot, chunked, rtol=0, atol=0)


def test_identical_frames_inf():
    y = np.full((2, 32, 32), 128, np.uint8)
    got = _xpsnr_engine(32, 32, 2)(list(y), list(y))
    assert all(np.isinf(s) for s in got)


def test_weight_smoothing_only_small_frames(rng):
    """<= VGA frames take the smoothing path; larger ones do not."""
    sse = rng.integers(0, 1000, (4, 5)).astype(np.uint32)
    sact = rng.integers(0, 5000, (4, 5)).astype(np.uint32)
    tact = rng.integers(0, 5000, (4, 5)).astype(np.uint32)
    w_small, _ = xpsnr_weights(sse, sact, tact, width=80, height=64)
    w_big, _ = xpsnr_weights(sse, sact, tact, width=1920, height=1080)
    # Same block stats, different frame areas -> different avgact scaling.
    assert w_small != w_big


def test_engine_cli_xpsnr(tmp_path, rng, capsys):
    import json

    from tests.test_io import _write_y4m
    from turbo_metrics_tpu.cli import main

    w, h = 64, 48
    frames, dframes = [], []
    for i in range(4):
        y = rng.integers(0, 256, (h, w), dtype=np.uint16)
        u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint16)
        v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint16)
        frames.append((y, u, v))
        dframes.append((np.clip(y + rng.integers(-4, 5, y.shape), 0, 255), u, v))
    pr, pd = tmp_path / "r.y4m", tmp_path / "d.y4m"
    _write_y4m(pr, frames, w, h)
    _write_y4m(pd, dframes, w, h)

    rc = main([str(pr), str(pd), "-m", "xpsnr", "-m", "psnr", "--output", "json", "--no-progress", "--batch", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["xpsnr"]["scores"]) == 4
    assert all(20 < s < 70 for s in out["xpsnr"]["scores"])

    # Cross-check against the oracle through the same Y4M files.
    prev = None
    for i in range(4):
        yr = frames[i][0].astype(np.uint8)
        yd = dframes[i][0].astype(np.uint8)
        _, want = oracle.xpsnr_frame(yr, yd, prev)
        prev = yr
        assert out["xpsnr"]["scores"][i] == pytest.approx(want, abs=1e-9)
