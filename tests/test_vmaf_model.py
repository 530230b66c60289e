"""VMAF fusion model: libsvm parsing, nu-SVR prediction, engine wiring.

Mirrors the reference's libvmaf score path (vmaf/src/lib.rs:160-245) with a
small fixture model (the upstream vmaf_v0.6.1.json is not redistributable;
the parser accepts it unchanged)."""

import json

import numpy as np
import pytest

from turbo_metrics_tpu.models.vmaf_model import (
    ScoreTransform,
    SvmModel,
    VmafModel,
    canonical_feature_name,
    motion2,
)

FEATURES_V061 = [
    "VMAF_feature_adm2_score",
    "VMAF_feature_motion2_score",
    "VMAF_feature_vif_scale0_score",
    "VMAF_feature_vif_scale1_score",
    "VMAF_feature_vif_scale2_score",
    "VMAF_feature_vif_scale3_score",
]

SVM_TEXT = """svm_type nu_svr
kernel_type rbf
gamma 0.05
nr_class 2
total_sv 2
rho -1.25
SV
0.75 1:0.9 2:0.1 3:0.8 4:0.85 5:0.9 6:0.95
-0.25 1:0.4 2:0.6 3:0.3 4:0.35 5:0.4 6:0.45
"""


def fixture_model_dict(**overrides):
    d = {
        "model_type": "LIBSVMNUSVR",
        "feature_names": FEATURES_V061,
        "norm_type": "linear_rescale",
        # slot 0 is the score; slots 1..6 the features
        "slopes": [0.01, 1.0, 0.5, 1.0, 1.0, 1.0, 1.0],
        "intercepts": [-0.1, 0.0, 0.05, 0.0, 0.0, 0.0, 0.0],
        "score_clip": [0.0, 100.0],
        "model": SVM_TEXT,
    }
    d.update(overrides)
    return {"model_dict": d}


def test_canonical_names():
    assert canonical_feature_name("VMAF_feature_adm2_score") == "adm2"
    assert canonical_feature_name("integer_adm2") == "adm2"
    assert canonical_feature_name("VMAF_feature_motion2_score") == "motion2"
    assert canonical_feature_name("integer_motion") == "motion"
    assert canonical_feature_name("VMAF_feature_vif_scale3_score") == "vif_scale3"
    assert canonical_feature_name("integer_vif_scale0") == "vif_scale0"
    with pytest.raises(ValueError):
        canonical_feature_name("VMAF_feature_ansnr_score")


def test_svm_parse_and_rbf_predict():
    svm = SvmModel.parse(SVM_TEXT, 6)
    assert svm.svm_type == "nu_svr" and svm.kernel == "rbf"
    assert svm.gamma == 0.05 and svm.rho == -1.25
    assert svm.coef.shape == (2,) and svm.sv.shape == (2, 6)

    x = np.array([0.7, 0.3, 0.6, 0.65, 0.7, 0.75])
    # Hand-computed RBF decision value.
    expect = 0.0
    for c, s in zip(svm.coef, svm.sv):
        expect += c * np.exp(-0.05 * np.sum((x - s) ** 2))
    expect -= svm.rho
    got = svm.predict(x[None])[0]
    assert got == pytest.approx(expect, rel=1e-12)


def test_svm_parse_rejects_bad_counts():
    bad = SVM_TEXT.replace("total_sv 2", "total_sv 3")
    with pytest.raises(ValueError):
        SvmModel.parse(bad, 6)


def test_model_predict_pipeline():
    """Normalise -> SVR -> denormalise -> clip, all hand-checked."""
    model = VmafModel.from_dict(fixture_model_dict())
    feats = {
        "adm2": np.array([0.95]),
        "motion2": np.array([4.0]),
        "vif_scale0": np.array([0.6]),
        "vif_scale1": np.array([0.75]),
        "vif_scale2": np.array([0.85]),
        "vif_scale3": np.array([0.9]),
    }
    # Manual: normalise features with slopes[1:]/intercepts[1:]
    x = np.array([0.95, 4.0 * 0.5 + 0.05, 0.6, 0.75, 0.85, 0.9])
    svm = SvmModel.parse(SVM_TEXT, 6)
    y_norm = svm.predict(x[None])[0]
    y = (y_norm - (-0.1)) / 0.01
    y = np.clip(y, 0.0, 100.0)
    got = model.predict(feats)
    assert got.shape == (1,)
    assert got[0] == pytest.approx(y, rel=1e-12)


def test_score_transform_guards():
    t = ScoreTransform(p0=1.0, p1=1.0, p2=0.0, out_lte_in=True)
    # transform gives y+1 but out_lte_in caps at y
    assert t.apply(np.array([50.0]))[0] == 50.0
    t2 = ScoreTransform(p0=-3.0, p1=1.0, p2=0.0, out_gte_in=True)
    assert t2.apply(np.array([50.0]))[0] == 50.0
    t3 = ScoreTransform(p0=0.0, p1=0.5, p2=0.005)
    assert t3.apply(np.array([10.0]))[0] == pytest.approx(5.5)


def test_model_load_json_roundtrip(tmp_path):
    p = tmp_path / "fixture.json"
    p.write_text(json.dumps(fixture_model_dict()))
    m = VmafModel.load(str(p))
    assert m.name == "fixture"
    assert m.feature_names == [
        "adm2", "motion2", "vif_scale0", "vif_scale1", "vif_scale2", "vif_scale3",
    ]
    assert m.score_clip == (0.0, 100.0)


def test_motion2():
    m = np.array([0.0, 5.0, 2.0, 8.0])
    assert motion2(m).tolist() == [0.0, 2.0, 2.0, 8.0]
    assert motion2(np.array([3.0])).tolist() == [3.0]


def test_engine_fused_vmaf(tmp_path, rng):
    """End-to-end: -m vmaf with a model produces a per-frame 'vmaf' score,
    fused with one-frame motion2 holdback, in stream order."""
    from tests.test_engine_cli import _smooth_yuv
    from turbo_metrics_tpu.color.characteristics import height_fallback
    from turbo_metrics_tpu.engine import Metrics, TurboMetrics
    from turbo_metrics_tpu.io.frame_source import RawFrame

    w, h = 64, 48
    cc = (height_fallback(h), "limited")
    model = VmafModel.from_dict(fixture_model_dict())

    frames = []
    for i in range(5):
        y, u, v = _smooth_yuv(rng, w, h, i * 0.5)
        frames.append((y, np.stack([u, v], axis=-1)))
    f_ref = [RawFrame(y=y, uv=uv, depth=8) for y, uv in frames]
    f_dis = [
        RawFrame(
            y=np.clip(y.astype(np.int16) + rng.integers(-4, 5, y.shape), 0, 255).astype(np.uint8),
            uv=uv,
            depth=8,
        )
        for y, uv in frames
    ]

    class ListSource:
        def __init__(self, fr):
            self._fr = list(fr)
            self._i = 0
            self.width, self.height = w, h

        def format_id(self):
            return "test"

        def color_characteristics(self):
            return cc

        def frame_count(self):
            return len(self._fr)

        def skip_frames(self, n):
            self._i += n

        def next_frame(self):
            if self._i >= len(self._fr):
                return None
            f = self._fr[self._i]
            self._i += 1
            return f

        get_frame = next_frame

    m = Metrics(vmaf=True)
    eng = TurboMetrics(w, h, m, batch=2, vmaf_model=model)
    assert m.vmaf_fused

    seen = []
    res = eng.compute_all(
        ListSource(f_ref), ListSource(f_dis), on_frame=lambda s: seen.append(s),
        prefetch=False,
    )
    assert res.frame_count == 5
    assert len(seen) == 5
    assert res.vmaf is not None and len(res.vmaf.scores) == 5
    assert all(s.vmaf is not None for s in seen)
    assert all(0.0 <= s.vmaf <= 100.0 for s in seen)
    assert all(s.vmaf_vif_scale0 is not None for s in seen)

    # Check the motion2 fusion against a direct prediction.
    motions = [s.vmaf_motion for s in seen]
    m2 = motion2(np.array(motions))
    for i, s in enumerate(seen):
        feats = {
            "adm2": s.vmaf_adm,
            "motion2": float(m2[i]),
            "motion": s.vmaf_motion,
            "vif": s.vmaf_vif,
            **{f"vif_scale{k}": getattr(s, f"vmaf_vif_scale{k}") for k in range(4)},
        }
        assert s.vmaf == pytest.approx(model.predict_one(feats), abs=1e-9)


def test_cli_vmaf_model(tmp_path, rng, capsys):
    """--vmaf-model end-to-end through the CLI (json output gains 'vmaf')."""
    from PIL import Image

    from turbo_metrics_tpu.cli import main

    p = tmp_path / "fixture.json"
    p.write_text(json.dumps(fixture_model_dict()))
    ref = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    dis = np.clip(ref.astype(np.int16) + rng.integers(-9, 10, ref.shape), 0, 255).astype(np.uint8)
    pr, pd = tmp_path / "r.png", tmp_path / "d.png"
    Image.fromarray(ref).save(pr)
    Image.fromarray(dis).save(pd)

    rc = main([
        str(pr), str(pd), "-m", "vmaf", "--vmaf-model", str(p),
        "--output", "json", "--no-progress",
    ])
    assert rc == 0
    obj = json.loads(capsys.readouterr().out)
    assert "vmaf" in obj and len(obj["vmaf"]["scores"]) == 1
    assert 0.0 <= obj["vmaf"]["scores"][0] <= 100.0
    assert "vmaf_vif_scale0" in obj


def test_real_model_if_present():
    """Validates the genuine vmaf_v0.6.1.json when vendored (see
    turbo_metrics_tpu/models/data/README.md — the build environment has no
    network egress, so the file cannot ship pre-fetched; this test activates
    automatically once a user drops it in)."""
    import os

    from turbo_metrics_tpu.models.vmaf_model import _DATA_DIR

    path = os.path.join(_DATA_DIR, "vmaf_v0.6.1.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("genuine vmaf_v0.6.1.json not vendored (no-egress build)")
    m = VmafModel.load(path)
    assert m.name == "vmaf_v0.6.1"
    assert set(m.feature_names) == {
        "adm2", "motion2", "vif_scale0", "vif_scale1", "vif_scale2",
        "vif_scale3",
    }
    assert m.svm.kernel == "rbf" and len(m.svm.coef) > 100
    # Perfect-quality features -> score near 100 (libvmaf clips to [0, 100]).
    perfect = {
        "adm2": 1.0, "motion2": 0.0, "vif_scale0": 1.0, "vif_scale1": 1.0,
        "vif_scale2": 1.0, "vif_scale3": 1.0,
    }
    s = m.predict_one(perfect)
    assert 95.0 <= s <= 100.0


def test_default_model_discovery_data_dir(tmp_path, monkeypatch):
    """find_default_model prefers the in-package data dir (vendored model)."""
    import json as _json
    import os

    import turbo_metrics_tpu.models.vmaf_model as vm

    monkeypatch.delenv("TM_VMAF_MODEL", raising=False)
    p = tmp_path / "vmaf_v0.6.1.json"
    p.write_text(_json.dumps(fixture_model_dict()))
    monkeypatch.setattr(
        vm, "DEFAULT_MODEL_PATHS", (str(p),) + vm.DEFAULT_MODEL_PATHS
    )
    assert vm.find_default_model() == str(p)
    m = VmafModel.load(vm.find_default_model())
    assert m.name == "vmaf_v0.6.1"


def test_svm_parse_full_scale_model():
    """Parse and predict with a vmaf_v0.6.1-SHAPED model: 6 features, 211
    support vectors (the genuine model's count) — exercises the parser and
    the RBF kernel at real-model scale, not just the 2-SV fixture."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_sv, n_feat = 211, 6
    coefs = rng.normal(0, 2.0, n_sv)
    svs = rng.random((n_sv, n_feat))
    lines = [
        "svm_type nu_svr", "kernel_type rbf", "gamma 0.04",
        "nr_class 2", f"total_sv {n_sv}", "rho -1.1", "SV",
    ]
    for c, sv in zip(coefs, svs):
        lines.append(
            f"{c:.10g} " + " ".join(f"{j+1}:{v:.10g}" for j, v in enumerate(sv))
        )
    model = VmafModel.from_dict({
        "model_dict": {
            "model_type": "LIBSVMNUSVR",
            "feature_names": FEATURES_V061,
            "norm_type": "linear_rescale",
            "slopes": [0.01] + [1.0] * n_feat,
            "intercepts": [-0.1] + [0.0] * n_feat,
            "score_clip": [0.0, 100.0],
            "model": "\n".join(lines) + "\n",
        }
    })
    assert model.svm.sv.shape == (n_sv, n_feat)
    feats = {
        "adm2": np.asarray([0.9, 0.5]),
        "motion2": np.asarray([2.0, 10.0]),
        **{f"vif_scale{k}": np.asarray([0.8, 0.3]) for k in range(4)},
    }
    y = model.predict(feats)
    assert y.shape == (2,)
    assert np.isfinite(y).all() and (0 <= y).all() and (y <= 100).all()
    # Manual RBF cross-check of frame 0 against the parsed parameters.
    x = np.array(
        [0.9, 2.0, 0.8, 0.8, 0.8, 0.8]
    )[[FEATURES_V061.index(n) for n in model.raw_feature_names]]
    x = model.slopes[1:] * x + model.intercepts[1:]
    k = np.exp(-0.04 * ((svs - x) ** 2).sum(axis=1))
    raw = coefs @ k - (-1.1)
    want = np.clip((raw - (-0.1)) / 0.01, 0, 100)
    np.testing.assert_allclose(y[0], want, rtol=1e-10)
