"""NumPy CPU reference for the VIF features — the test oracle.

Same math as ops/vif.py (see that docstring for the algorithm), implemented
independently with scipy-free NumPy convolution in f64.
"""

from __future__ import annotations

import numpy as np

from turbo_metrics_tpu.ops.vif import NUM_SCALES, vif_window

SIGMA_NSQ = 2.0
EPS = 1e-10


def _blur_axis(x: np.ndarray, win: np.ndarray, axis: int) -> np.ndarray:
    """'same' correlation along ``axis`` with libvmaf's reflect-101 index
    rule (ind < 0 -> -ind, ind >= n -> 2n-ind-2), via explicit indexing."""
    x = np.moveaxis(x, axis, -1)
    n = x.shape[-1]
    r = len(win) // 2
    ind = np.arange(n)[:, None] - r + np.arange(len(win))[None, :]
    ind = np.abs(ind)
    ind = np.where(ind >= n, 2 * n - ind - 2, ind)
    out = np.einsum("...ik,k->...i", x[..., ind], win)
    return np.moveaxis(out, -1, axis)


def _blur_same(x: np.ndarray, win: np.ndarray) -> np.ndarray:
    return _blur_axis(_blur_axis(x, win, -1), win, -2)


def vif_frame(ref: np.ndarray, dis: np.ndarray) -> dict[str, float]:
    ref = ref.astype(np.float64)
    dis = dis.astype(np.float64)
    nums, dens = [], []
    for k in range(NUM_SCALES):
        win = vif_window(k)
        if k > 0:
            ref = _blur_same(ref, win)[::2, ::2]
            dis = _blur_same(dis, win)[::2, ::2]
        mu1 = _blur_same(ref, win)
        mu2 = _blur_same(dis, win)
        s11 = np.maximum(_blur_same(ref * ref, win) - mu1 * mu1, 0.0)
        s22 = np.maximum(_blur_same(dis * dis, win) - mu2 * mu2, 0.0)
        s12 = _blur_same(ref * dis, win) - mu1 * mu2

        g = s12 / (s11 + EPS)
        sv_sq = s22 - g * s12
        g = np.where(s11 < EPS, 0.0, g)
        sv_sq = np.where(s11 < EPS, s22, sv_sq)
        s11c = np.where(s11 < EPS, 0.0, s11)
        sv_sq = np.where(s22 < EPS, 0.0, sv_sq)
        g = np.where(s22 < EPS, 0.0, g)
        sv_sq = np.where(g < 0.0, s22, sv_sq)
        g = np.maximum(g, 0.0)
        sv_sq = np.maximum(sv_sq, EPS)

        nums.append(np.log2(1.0 + g * g * s11c / (sv_sq + SIGMA_NSQ)).sum())
        dens.append(np.log2(1.0 + s11c / SIGMA_NSQ).sum())
    out = {f"vif_scale{k}": nums[k] / dens[k] for k in range(NUM_SCALES)}
    out["vif"] = sum(nums) / sum(dens)
    return out
