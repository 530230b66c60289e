"""NumPy CPU reference for the ADM (adm2) feature — the test oracle.

Independent f64 implementation of the same libvmaf float-ADM conventions as
ops/adm.py (see that module's docstring for the specification and parity
notes).  Borders are realised through explicit libvmaf-style index
arithmetic (``ind < 0 -> -(ind+1)``, ``ind >= n -> 2n-ind-1`` for the DWT;
reflect-101 for the masking filter) rather than array padding, so the two
implementations share no mechanism.
"""

from __future__ import annotations

import numpy as np

from turbo_metrics_tpu.ops.adm import (
    BORDER_FACTOR,
    COS_1DEG_SQ,
    DB2_HI,
    DB2_LO,
    DECOUPLE_EPS,
    NUMDEN_LIMIT,
    NUM_LEVELS,
    csf_rfactors,
)


def _dwt_1d(x: np.ndarray, taps: np.ndarray, axis: int) -> np.ndarray:
    """Analysis filter + decimate along ``axis``: out[i] = sum_k taps[k] *
    x[sym(2*i - 1 + k)], ceil(n/2) outputs (libvmaf adm_dwt2 indexing)."""
    x = np.moveaxis(x, axis, -1)
    n = x.shape[-1]
    co = (n + 1) // 2
    ind = 2 * np.arange(co)[:, None] - 1 + np.arange(len(taps))[None, :]
    ind = np.where(ind < 0, -(ind + 1), ind)
    ind = np.where(ind >= n, 2 * n - ind - 1, ind)
    out = np.einsum("...ik,k->...i", x[..., ind], taps)
    return np.moveaxis(out, -1, axis)


def _dwt_level(x: np.ndarray):
    lo_r = _dwt_1d(x, DB2_LO, -1)
    hi_r = _dwt_1d(x, DB2_HI, -1)
    a = _dwt_1d(lo_r, DB2_LO, -2)
    v = _dwt_1d(lo_r, DB2_HI, -2)
    h = _dwt_1d(hi_r, DB2_LO, -2)
    d = _dwt_1d(hi_r, DB2_HI, -2)
    return a, h, v, d


def _mask_filter(x: np.ndarray) -> np.ndarray:
    """3x3, centre 1/15 else 1/30, reflect-101 via index arithmetic."""
    h, w = x.shape
    out = np.zeros_like(x)
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    for fi in range(3):
        for fj in range(3):
            f = 1.0 / 15.0 if (fi == 1 and fj == 1) else 1.0 / 30.0
            i2 = np.abs(ii - 1 + fi)
            i2 = np.where(i2 >= h, 2 * h - i2 - 2, i2)
            j2 = np.abs(jj - 1 + fj)
            j2 = np.where(j2 >= w, 2 * w - j2 - 2, j2)
            out += f * x[i2, j2]
    return out


def _sum_cube(x: np.ndarray) -> float:
    """Centre-region Minkowski 3-norm + area stabiliser (adm_sum_cube)."""
    h, w = x.shape
    left = max(0, int(w * BORDER_FACTOR - 0.5))
    top = max(0, int(h * BORDER_FACTOR - 0.5))
    region = np.abs(x[top : h - top, left : w - left])
    area = (h - 2 * top) * (w - 2 * left)
    return float(np.cbrt((region**3).sum()) + np.cbrt(area / 32.0))


def adm_frame(y_ref: np.ndarray, y_dis: np.ndarray) -> dict[str, float]:
    """adm2 + per-scale scores for one luma pair (8-bit units)."""
    o = y_ref.astype(np.float64)
    t = y_dis.astype(np.float64)
    h0, w0 = o.shape
    num_scale, den_scale = [], []
    for level in range(NUM_LEVELS):
        o_a, o_h, o_v, o_d = _dwt_level(o)
        t_a, t_h, t_v, t_d = _dwt_level(t)

        ot_dp = o_h * t_h + o_v * t_v
        angle_ok = (ot_dp >= 0.0) & (
            ot_dp * ot_dp
            >= COS_1DEG_SQ * (o_h**2 + o_v**2) * (t_h**2 + t_v**2)
        )

        rf_hv, rf_d = csf_rfactors(level)
        csf_r, csf_a, csf_o = [], [], []
        for o_b, t_b, rf in (
            (o_h, t_h, rf_hv),
            (o_v, t_v, rf_hv),
            (o_d, t_d, rf_d),
        ):
            k = np.clip(t_b / (o_b + DECOUPLE_EPS), 0.0, 1.0)
            r = np.where(angle_ok, t_b, k * o_b)
            csf_r.append(rf * r)
            csf_a.append(rf * (t_b - r))
            csf_o.append(rf * o_b)

        thr = sum(_mask_filter(np.abs(a_b)) for a_b in csf_a)
        num = den = 0.0
        for r_b, o_b in zip(csf_r, csf_o):
            num += _sum_cube(np.maximum(np.abs(r_b) - thr, 0.0))
            den += _sum_cube(o_b)
        num_scale.append(num)
        den_scale.append(den)
        o, t = o_a, t_a

    limit = NUMDEN_LIMIT * (w0 * h0) / (1920.0 * 1080.0)

    def ratio(num: float, den: float) -> float:
        num = 0.0 if num < limit else num
        den = 0.0 if den < limit else den
        return 1.0 if den == 0.0 else num / den

    out = {
        f"adm_scale{k}": ratio(num_scale[k], den_scale[k])
        for k in range(NUM_LEVELS)
    }
    out["adm2"] = ratio(sum(num_scale), sum(den_scale))
    return out
