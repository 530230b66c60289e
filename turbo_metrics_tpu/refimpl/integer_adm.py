"""NumPy CPU reference for the INTEGER (fixed-point) ADM path — the oracle.

libvmaf's *default* ADM is the fixed-point ``integer_adm.c`` (the
reference binds libvmaf: vmaf/src/lib.rs:160-217); our float path follows
``float_adm``.  As with refimpl/integer_vif.py, this pins a fully-specified
fixed-point schedule with libvmaf's structure — integer DWT with rounded
fixed-point taps and defined rounding shifts, an integer-arithmetic
decoupling angle gate — adapted to 32-bit arithmetic so the device path
(ops/integer_adm.py) reproduces the integer stages BIT-EXACTLY with
native i32 ops.  See docs/VALIDATION.md for the libvmaf closure procedure.

Schedule:

  * taps: NORMALISED db2 (DB2_LO / sqrt(2), so the DC gain per 1-D pass is
    exactly 1) in Q13: c = round(t * 2^13); the LO filter's largest tap
    absorbs the residue so sum(LO) == 2^13 exactly (flat input -> exact
    approx); the HI filter's largest-|.| tap absorbs the residue so
    sum(HI) == 0 exactly (flat input -> exactly zero detail).
  * bands carry Q8 int32 values of the normalised-DWT output; the level-0
    input is (x - 128) << 8.  Each 1-D analysis pass computes
    (sum_k c[k] * x[2i - 1 + k] + 2^12) >> 13 with libvmaf's symmetric
    half-sample extension and ceil-half output sizes (every intermediate
    is < 2^31 in magnitude: worst-case growth 1.183 per pass on 8-bit
    input over 4 levels).
  * decoupling angle gate in integers: bands truncated to Q2
    (b2 = b >> 6, arithmetic shift), then
      dp   = oh2*th2 + ov2*tv2            (|dp|  < 2^24: exact in f32)
      omag = oh2^2 + ov2^2, tmag likewise (      < 2^24)
      gate = (dp >= 0) & (f32(dp)*f32(dp) >= COS_1DEG_SQ_F32 * (f32(omag)*f32(tmag)))
    — the three products are single f32 multiplies of exactly-representable
    integers, so the comparison is deterministic on every IEEE backend
    (no FMA-fusable add is involved).
  * everything from the decoupling ratio onward (k, CSF, masking, pooling)
    is the float pipeline applied to the integer-exact bands, dequantised
    to orthonormal units: band_f = band_q8 * 2^(level+1) / 2^8 (the
    normalised taps scale the orthonormal bands by exactly 2^-(level+1)).

Bit-exact oracle surfaces: the per-level integer bands and the integer
angle-gate mask.  The float finish is gated at tolerance in tests.
"""

from __future__ import annotations

import numpy as np

from turbo_metrics_tpu.ops.adm import DB2_HI, DB2_LO, NUM_LEVELS

Q_TAPS = 13
Q_BAND = 8
COS_1DEG_SQ_F32 = np.float32(np.cos(np.pi / 180.0) ** 2)


def adm_coeffs_q() -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) Q13 normalised db2 taps, int64, DC-exact (see module doc)."""
    lo = np.round(DB2_LO / np.sqrt(2.0) * (1 << Q_TAPS)).astype(np.int64)
    lo[np.argmax(np.abs(lo))] += (1 << Q_TAPS) - lo.sum()
    hi = np.round(DB2_HI / np.sqrt(2.0) * (1 << Q_TAPS)).astype(np.int64)
    hi[np.argmax(np.abs(hi))] -= hi.sum()
    assert lo.sum() == 1 << Q_TAPS and hi.sum() == 0
    return lo, hi


def _filter_dec_q(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Integer DWT analysis along the last axis (symmetric extension,
    output i reads input 2i-1+k, ceil-half outputs), rounded >> Q_TAPS."""
    n = len(c)
    d = x.shape[-1]
    co = (d + 1) // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, n - 1)], mode="symmetric")
    acc = np.zeros(x.shape[:-1] + (co,), dtype=np.int64)
    for k in range(n):
        acc += c[k] * xp[..., k : k + 2 * co : 2]
    return (acc + (1 << (Q_TAPS - 1))) >> Q_TAPS


def _dwt_level_q(x: np.ndarray):
    lo, hi = adm_coeffs_q()
    lo_r = _filter_dec_q(x, lo)
    hi_r = _filter_dec_q(x, hi)

    def cols(y, c):
        return np.swapaxes(_filter_dec_q(np.swapaxes(y, -1, -2), c), -1, -2)

    return cols(lo_r, lo), cols(hi_r, lo), cols(lo_r, hi), cols(hi_r, hi)
    # (a, h, v, d): h = highpass rows/lowpass cols, v = lowpass rows/highpass
    # cols — matching ops/adm._dwt_level's orientation convention.


def integer_adm_levels(
    ref: np.ndarray, dis: np.ndarray, *, depth: int = 8
) -> list[dict[str, np.ndarray]]:
    """Per-level integer bands + angle mask — the bit-exact oracle surface.

    Returns per level dict(o_h, o_v, o_d, t_h, t_v, t_d [int32 Q8],
    angle_ok [bool]).
    """
    x = np.asarray(ref, dtype=np.int64)
    y = np.asarray(dis, dtype=np.int64)
    if depth > 8:
        x = (x + (1 << (depth - 9))) >> (depth - 8)
        y = (y + (1 << (depth - 9))) >> (depth - 8)
    o = (x - 128) << Q_BAND
    t = (y - 128) << Q_BAND
    out = []
    for _ in range(NUM_LEVELS):
        o_a, o_h, o_v, o_d = _dwt_level_q(o)
        t_a, t_h, t_v, t_d = _dwt_level_q(t)
        oh2, ov2 = o_h >> 6, o_v >> 6
        th2, tv2 = t_h >> 6, t_v >> 6
        dp = (oh2 * th2 + ov2 * tv2).astype(np.int32)
        omag = (oh2 * oh2 + ov2 * ov2).astype(np.int32)
        tmag = (th2 * th2 + tv2 * tv2).astype(np.int32)
        dpf = dp.astype(np.float32)
        angle_ok = (dp >= 0) & (
            dpf * dpf
            >= COS_1DEG_SQ_F32
            * (omag.astype(np.float32) * tmag.astype(np.float32))
        )
        out.append(
            {
                "o_h": o_h.astype(np.int32),
                "o_v": o_v.astype(np.int32),
                "o_d": o_d.astype(np.int32),
                "t_h": t_h.astype(np.int32),
                "t_v": t_v.astype(np.int32),
                "t_d": t_d.astype(np.int32),
                "angle_ok": angle_ok,
            }
        )
        o, t = o_a, t_a
    return out


def integer_adm_frame(
    ref: np.ndarray, dis: np.ndarray, *, depth: int = 8
) -> dict[str, float]:
    """Integer-convention ADM score for one frame pair: integer DWT +
    integer angle gate, float finish (f64) on the dequantised bands,
    reusing the float pipeline's CSF/masking/pooling conventions."""
    from turbo_metrics_tpu.ops.adm import adm_score, center_region, csf_rfactors
    from turbo_metrics_tpu.refimpl.adm import _mask_filter

    levels = integer_adm_levels(ref, dis, depth=depth)
    h, w = np.asarray(ref).shape[-2:]
    stats = np.zeros((NUM_LEVELS, 3, 2), dtype=np.float64)
    for li, lv in enumerate(levels):
        scale = float(1 << (li + 1)) / (1 << Q_BAND)
        rf_hv, rf_d = csf_rfactors(li)
        rfs = (rf_hv, rf_hv, rf_d)
        csf_r, csf_a, csf_o = [], [], []
        for bi, (ob, tb) in enumerate(
            (("o_h", "t_h"), ("o_v", "t_v"), ("o_d", "t_d"))
        ):
            o_b = lv[ob].astype(np.float64) * scale
            t_b = lv[tb].astype(np.float64) * scale
            k = np.clip(t_b / (o_b + 1e-30), 0.0, 1.0)
            r = np.where(lv["angle_ok"], t_b, k * o_b)
            csf_r.append(rfs[bi] * r)
            csf_a.append(rfs[bi] * (t_b - r))
            csf_o.append(rfs[bi] * o_b)
        thr = sum(_mask_filter(np.abs(a_b)) for a_b in csf_a)
        hh, ww = lv["o_h"].shape[-2:]
        top, bottom, left, right = center_region(hh, ww)
        for bi, (r_b, o_b) in enumerate(zip(csf_r, csf_o)):
            rm = np.maximum(np.abs(r_b) - thr, 0.0)[top:bottom, left:right]
            oc = np.abs(o_b)[top:bottom, left:right]
            stats[li, bi, 0] = (rm**3).sum()
            stats[li, bi, 1] = (oc**3).sum()
    return {k: float(v) for k, v in adm_score(stats, h, w).items()}
