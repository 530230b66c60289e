"""NumPy CPU reference for the DLM (ADM-style) feature — the test oracle.

Independent implementation of the same documented DLM variant as ops/adm.py
(see that module's docstring for the algorithm and parity notes), in f64.
"""

from __future__ import annotations

import numpy as np

from turbo_metrics_tpu.ops.adm import (
    ANGLE_THRESHOLD,
    BORDER_FRACTION,
    DB2_HI,
    DB2_LO,
    NUM_LEVELS,
    csf_weight,
)


def _filter_rows(x: np.ndarray, taps: np.ndarray) -> np.ndarray:
    n = len(taps)
    d = x.shape[-1]
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, n - 2)], mode="symmetric")
    acc = sum(taps[k] * xp[..., k : k + d] for k in range(n))
    return acc[..., 0::2]


def _dwt_level(x: np.ndarray):
    lo_r = _filter_rows(x, DB2_LO)
    hi_r = _filter_rows(x, DB2_HI)

    def cols(y, taps):
        return np.swapaxes(_filter_rows(np.swapaxes(y, -1, -2), taps), -1, -2)

    return cols(lo_r, DB2_LO), cols(hi_r, DB2_LO), cols(lo_r, DB2_HI), cols(hi_r, DB2_HI)


def _box3(x: np.ndarray) -> np.ndarray:
    h, w = x.shape
    xp = np.pad(x, 1)
    acc = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            acc += xp[dy : dy + h, dx : dx + w]
    return acc


def dlm_frame(y_ref: np.ndarray, y_dis: np.ndarray) -> float:
    o = y_ref.astype(np.float64)
    t = y_dis.astype(np.float64)
    eps = 1e-12
    num = den = 0.0
    for level in range(NUM_LEVELS):
        o = o[: (o.shape[0] // 2) * 2, : (o.shape[1] // 2) * 2]
        t = t[: (t.shape[0] // 2) * 2, : (t.shape[1] // 2) * 2]
        o_a, o_h, o_v, o_d = _dwt_level(o)
        t_a, t_h, t_v, t_d = _dwt_level(t)

        psi_o = np.arctan2(o_v, o_h + eps)
        psi_t = np.arctan2(t_v, t_h + eps)
        dpsi = np.abs(psi_o - psi_t)
        dpsi = np.minimum(dpsi, 2 * np.pi - dpsi)
        angle_ok = dpsi < float(ANGLE_THRESHOLD)

        csf = csf_weight(level)
        hh, ww = o_h.shape
        bh = max(1, int(hh * BORDER_FRACTION))
        bw = max(1, int(ww * BORDER_FRACTION))
        num_l = den_l = 0.0
        for o_s, t_s in ((o_h, t_h), (o_v, t_v), (o_d, t_d)):
            k = np.clip(t_s / np.where(np.abs(o_s) < eps, eps, o_s), 0.0, 1.0)
            k = np.where(np.abs(o_s) < eps, 0.0, k)
            r = np.where(angle_ok, t_s, k * o_s)
            rc, ac, oc = csf * r, csf * (t_s - r), csf * o_s
            thr = _box3(np.abs(ac)) / 30.0
            rm = np.maximum(np.abs(rc) - thr, 0.0)[bh : hh - bh, bw : ww - bw]
            ocr = np.abs(oc)[bh : hh - bh, bw : ww - bw]
            num_l += (rm**3).sum()
            den_l += (ocr**3).sum()
        num += np.cbrt(num_l)
        den += np.cbrt(den_l)
        o, t = o_a, t_a
    return float((num + 1e-4) / (den + 1e-4))
