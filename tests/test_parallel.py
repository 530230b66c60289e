"""Multi-chip (virtual 8-device CPU mesh) and graft-entry tests."""

import numpy as np
import pytest


def test_graft_entry_compiles():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_sharded_scores_match_single_device(rng):
    """Frame-sharded execution must give identical scores."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import functools

    from turbo_metrics_tpu.models.ssimulacra2 import ssimulacra2_subscores
    from turbo_metrics_tpu.parallel.mesh import make_mesh, shard_over_frames

    b, h, w = 4, 32, 48
    ref = rng.random((b, 3, h, w), dtype=np.float64).astype(np.float32)
    dis = np.clip(ref + rng.normal(0, 0.05, ref.shape).astype(np.float32), 0, 1)
    fn = functools.partial(ssimulacra2_subscores, num_scales=3)

    single = np.asarray(jax.jit(fn)(ref, dis))
    mesh = make_mesh(4)
    sharded = np.asarray(shard_over_frames(fn, mesh, in_ndims=(4, 4))(ref, dis))
    np.testing.assert_allclose(single, sharded, atol=2e-6)


def test_prefetcher(tmp_path, rng):
    from tests.test_io import _rand_yuv, _write_y4m

    from turbo_metrics_tpu.io.probe import create_source
    from turbo_metrics_tpu.parallel.streaming import FramePrefetcher

    w, h = 32, 24
    frames = [_rand_yuv(rng, w, h) for _ in range(7)]
    p = tmp_path / "t.y4m"
    _write_y4m(p, frames, w, h)
    pf = FramePrefetcher(create_source(p), create_source(p), batch=3)
    batches = list(pf)
    assert [len(b[0]) for b in batches] == [3, 3, 1]
    np.testing.assert_array_equal(batches[0][0][0].y, frames[0][0].astype(np.uint8))


def test_width_sharded_scores_match(rng):
    """SP analog: shard one frame's columns across chips; XLA inserts the
    halo exchanges for the blur's shifted slices automatically."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import functools

    from turbo_metrics_tpu.models.ssimulacra2 import ssimulacra2_subscores
    from turbo_metrics_tpu.parallel.mesh import make_mesh, shard_over_width

    b, h, w = 1, 64, 512  # width divisible by 4 chips
    ref = rng.random((b, 3, h, w), dtype=np.float64).astype(np.float32)
    dis = np.clip(ref + rng.normal(0, 0.05, ref.shape).astype(np.float32), 0, 1)
    fn = functools.partial(ssimulacra2_subscores, num_scales=3, backend="jnp")

    single = np.asarray(jax.jit(fn)(ref, dis))
    mesh = make_mesh(4)
    sharded = np.asarray(shard_over_width(fn, mesh, in_ndims=(4, 4))(ref, dis))
    np.testing.assert_allclose(single, sharded, atol=2e-5, rtol=2e-5)


def test_chunked_decode_exact_order(tmp_path):
    """Seek-partitioned chunked decode reproduces sequential frame order
    exactly (any workers/chunk combination)."""
    import numpy as np
    import pytest as _pytest

    cv2 = _pytest.importorskip("cv2")
    from turbo_metrics_tpu.io.native import NativeVideoSource, native_available
    from turbo_metrics_tpu.parallel.decode_pool import ChunkedVideoSource

    if not native_available():
        _pytest.skip("native demuxer not built")
    path = str(tmp_path / "clip.mkv")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"VP90"), 25, (64, 48))
    if not vw.isOpened():
        _pytest.skip("VP9 encoder unavailable")
    for i in range(23):
        img = np.zeros((48, 64, 3), np.uint8)
        img[:, :, 0] = (i * 11) % 256
        vw.write(img)
    vw.release()

    seq = []
    src = NativeVideoSource(path)
    while (f := src.get_frame()) is not None:
        seq.append(f.y.copy())

    for workers, chunk in [(2, 5), (3, 8), (2, 64)]:
        cs = ChunkedVideoSource(path, workers=workers, chunk=chunk)
        got = []
        while (f := cs.get_frame()) is not None:
            got.append(f.y)
        assert len(got) == len(seq), (workers, chunk)
        assert all(np.array_equal(a, b) for a, b in zip(got, seq))

    # skip_frames offsets the chunk origin
    cs = ChunkedVideoSource(path, workers=2, chunk=4)
    cs.skip_frames(7)
    got = []
    while (f := cs.get_frame()) is not None:
        got.append(f.y)
    assert len(got) == len(seq) - 7
    assert np.array_equal(got[0], seq[7])


def test_seek_to_frame(tmp_path):
    import numpy as np
    import pytest as _pytest

    cv2 = _pytest.importorskip("cv2")
    from turbo_metrics_tpu.io.native import NativeVideoSource, native_available

    if not native_available():
        _pytest.skip("native demuxer not built")
    path = str(tmp_path / "clip.mkv")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"VP90"), 25, (64, 48))
    if not vw.isOpened():
        _pytest.skip("VP9 encoder unavailable")
    for i in range(17):
        img = np.zeros((48, 64, 3), np.uint8)
        img[:, :, 0] = (i * 13) % 256
        vw.write(img)
    vw.release()

    seq = []
    src = NativeVideoSource(path)
    while (f := src.get_frame()) is not None:
        seq.append(f.y.copy())

    src2 = NativeVideoSource(path)
    assert src2.can_seek()
    for target in (11, 3, 16, 0):
        assert src2.seek_to_frame(target)
        f = src2.get_frame()
        assert np.array_equal(f.y, seq[target]), target
    assert not src2.seek_to_frame(100)  # beyond EOF


def test_engine_mesh_sharding(rng):
    """Engine-level multi-chip: TurboMetrics(mesh=...) shards frame batches
    over the device mesh via shard_map; scores must equal the single-device
    engine bit-for-bit (pure frame-DP, SURVEY.md section 5)."""
    import jax
    import numpy as np
    from turbo_metrics_tpu.color.characteristics import height_fallback
    from turbo_metrics_tpu.engine import Metrics, TurboMetrics
    from turbo_metrics_tpu.io.frame_source import RawFrame
    from turbo_metrics_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        import pytest as _pytest

        _pytest.skip("needs 4 virtual devices")
    w, h = 64, 48
    cc = (height_fallback(h), "limited")
    frames_r, frames_d = [], []
    for i in range(8):
        y = rng.integers(16, 236, (h, w), dtype=np.uint8)
        uv = rng.integers(16, 240, ((h + 1) // 2, (w + 1) // 2, 2), dtype=np.uint8)
        frames_r.append(RawFrame(y=y, uv=uv, depth=8))
        yd = np.clip(y.astype(np.int16) + rng.integers(-5, 6, y.shape), 0, 255).astype(np.uint8)
        frames_d.append(RawFrame(y=yd, uv=uv, depth=8))

    m = Metrics(psnr=True, ssim=True, ssimulacra2=True, xpsnr=True)
    single = TurboMetrics(w, h, m, batch=8)
    s1 = single.compute_frames(frames_r, cc, frames_d, cc)

    mesh = make_mesh(4)
    sharded = TurboMetrics(w, h, m, batch=8, mesh=mesh)
    s2 = sharded.compute_frames(frames_r, cc, frames_d, cc)

    for a, b in zip(s1, s2):
        for name in ("psnr", "ssim", "ssimulacra2", "xpsnr"):
            assert getattr(a, name) == pytest.approx(getattr(b, name), abs=1e-6), name

    # batch rounding: a mesh engine rounds batch up to a mesh multiple
    odd = TurboMetrics(w, h, m, batch=5, mesh=mesh)
    assert odd.batch == 8
    s3 = odd.compute_frames(frames_r[:5], cc, frames_d[:5], cc)
    assert len(s3) == 5
    for a, b in zip(s1[:5], s3):
        assert a.psnr == pytest.approx(b.psnr, abs=1e-6)

    # vmaf shards too: the motion boundary frame crosses shards via a
    # ppermute; must match the single-device engine exactly.
    mv = Metrics(vmaf=True, xpsnr=True)
    sv1 = TurboMetrics(w, h, mv, batch=8).compute_frames(frames_r, cc, frames_d, cc)
    sv2 = TurboMetrics(w, h, Metrics(vmaf=True, xpsnr=True), batch=8, mesh=mesh).compute_frames(
        frames_r, cc, frames_d, cc
    )
    for a, b in zip(sv1, sv2):
        assert a.vmaf_motion == pytest.approx(b.vmaf_motion, abs=0)
        assert a.vmaf_vif == pytest.approx(b.vmaf_vif, abs=1e-9)
        assert a.vmaf_adm == pytest.approx(b.vmaf_adm, abs=1e-9)
        assert a.xpsnr == pytest.approx(b.xpsnr, abs=1e-9)

    # ...including streaming state across chunked batches
    e1 = TurboMetrics(w, h, Metrics(vmaf=True), batch=4)
    c1 = e1.compute_frames(frames_r[:4], cc, frames_d[:4], cc) + e1.compute_frames(
        frames_r[4:], cc, frames_d[4:], cc
    )
    e2 = TurboMetrics(w, h, Metrics(vmaf=True), batch=4, mesh=mesh)
    c2 = e2.compute_frames(frames_r[:4], cc, frames_d[:4], cc) + e2.compute_frames(
        frames_r[4:], cc, frames_d[4:], cc
    )
    for a, b in zip(c1, c2):
        assert a.vmaf_motion == pytest.approx(b.vmaf_motion, abs=0)
