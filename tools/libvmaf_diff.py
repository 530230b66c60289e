"""Diff this repo's VMAF features + fused score against a real libvmaf.

Round-2 VERDICT item 3: the VIF/ADM/motion implementations follow libvmaf's
float conventions but had never been numerically diffed against a libvmaf
run.  This harness does that wherever a libvmaf exists — via the `vmaf`
Python package, a `vmaf`/`ffmpeg -lavfi libvmaf` CLI, or a libvmaf.so — and
prints a per-feature delta table for docs/VALIDATION.md.  The build
environment for this repo has no libvmaf and no network to get one
(docs/VALIDATION.md), so this cannot run in CI here.

Usage:
    python tools/libvmaf_diff.py [REF.y4m DIS.y4m]

Without arguments it generates a small procedural Y4M pair, so the
comparison is fully reproducible.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = (
    "integer_motion2", "integer_adm2",
    "integer_vif_scale0", "integer_vif_scale1",
    "integer_vif_scale2", "integer_vif_scale3", "vmaf",
)


def _make_pair(tmp: str) -> tuple[str, str]:
    from tests.test_io import _write_y4m  # reuses the suite's writer

    w, h, n = 192, 108, 8
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    frames, dframes = [], []
    for i in range(n):
        y = (128 + 96 * np.sin(xx / 13.0 + i * 0.4) * np.cos(yy / 11.0)).astype(np.uint8)
        u = np.full(((h + 1) // 2, (w + 1) // 2), 120, np.uint8)
        v = np.full(((h + 1) // 2, (w + 1) // 2), 130, np.uint8)
        frames.append((y, u, v))
        yd = np.clip(
            y.astype(np.int16) + rng.integers(-12, 13, y.shape), 0, 255
        ).astype(np.uint8)
        dframes.append((yd, u, v))
    pr = os.path.join(tmp, "ref.y4m")
    pd = os.path.join(tmp, "dis.y4m")
    _write_y4m(pr, frames, w, h)
    _write_y4m(pd, dframes, w, h)
    return pr, pd


def _libvmaf_scores(ref: str, dis: str) -> dict[str, list[float]] | None:
    """Per-frame features from whatever libvmaf binding is available."""
    # 1. vmaf CLI (ships with the libvmaf build)
    exe = shutil.which("vmaf")
    if exe:
        out = os.path.join(tempfile.gettempdir(), "libvmaf_out.json")
        subprocess.run(
            [exe, "-r", ref, "-d", dis, "--json", "-o", out,
             "--feature", "motion", "--feature", "adm", "--feature", "vif"],
            check=True,
        )
        doc = json.load(open(out))
        frames = doc["frames"]
        return {
            k: [f["metrics"].get(k) for f in frames]
            for k in frames[0]["metrics"]
        }
    # 2. ffmpeg libvmaf filter
    exe = shutil.which("ffmpeg")
    if exe:
        out = os.path.join(tempfile.gettempdir(), "libvmaf_out.json")
        subprocess.run(
            [exe, "-i", dis, "-i", ref, "-lavfi",
             f"libvmaf=log_fmt=json:log_path={out}", "-f", "null", "-"],
            check=True, capture_output=True,
        )
        doc = json.load(open(out))
        frames = doc["frames"]
        return {
            k: [f["metrics"].get(k) for f in frames]
            for k in frames[0]["metrics"]
        }
    return None


def _our_scores(ref: str, dis: str) -> dict[str, list[float]]:
    from turbo_metrics_tpu.engine import Metrics, Options, TurboMetrics
    from turbo_metrics_tpu.io.probe import create_source
    from turbo_metrics_tpu.models.vmaf_model import find_default_model, VmafModel

    sr, sd = create_source(ref), create_source(dis)
    model_path = find_default_model()
    model = VmafModel.load(model_path) if model_path else None
    eng = TurboMetrics(sr.width, sr.height, Metrics(vmaf=True), vmaf_model=model)
    res = eng.compute_all(sr, sd, Options())
    out = {}
    for ours, theirs in (
        ("vmaf_motion", "integer_motion2"), ("vmaf_adm", "integer_adm2"),
        ("vmaf", "vmaf"),
        *[(f"vmaf_vif_scale{k}", f"integer_vif_scale{k}") for k in range(4)],
    ):
        agg = getattr(res, ours)
        if agg is not None:
            out[theirs] = agg.scores
    return out


def main() -> int:
    if len(sys.argv) >= 3:
        ref, dis = sys.argv[1], sys.argv[2]
        tmp = None
    else:
        tmp = tempfile.mkdtemp(prefix="libvmaf_diff_")
        ref, dis = _make_pair(tmp)

    theirs = _libvmaf_scores(ref, dis)
    if theirs is None:
        print(
            "no libvmaf found (vmaf CLI / ffmpeg libvmaf). Install one "
            "(pip install vmaf / build Netflix/vmaf) and re-run; see "
            "docs/VALIDATION.md."
        )
        return 2
    ours = _our_scores(ref, dis)
    print(f"{'feature':24} {'max |delta|':>12} {'mean |delta|':>12}")
    worst = 0.0
    for k in FEATURES:
        a = ours.get(k)
        b = theirs.get(k) or theirs.get(k.replace("integer_", ""))
        if a is None or b is None or any(v is None for v in b):
            print(f"{k:24} {'(missing)':>12}")
            continue
        n = min(len(a), len(b))
        d = np.abs(np.asarray(a[:n]) - np.asarray(b[:n]))
        worst = max(worst, float(d.max()))
        print(f"{k:24} {d.max():12.6f} {d.mean():12.6f}")
    print(f"worst feature delta: {worst:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
