"""NumPy f64 oracles for the classic metrics (PSNR / SSIM / MS-SSIM).

Independent implementations of the published definitions (Wang et al. 2004;
Wang et al. 2003 with the standard five scale weights) used to validate the
device kernels in ops/quality.py — the oracle pattern the whole test suite
follows (SURVEY.md §4: the reference's only effective correctness mechanism
was a CPU reference + tolerance assert; here it is a first-class suite).
PSNR is additionally anchored against OpenCV's implementation in the tests
(an external, widely-deployed reference).
"""

from __future__ import annotations

import numpy as np

K1, K2, L = 0.01, 0.03, 255.0
C1 = (K1 * L) ** 2
C2 = (K2 * L) ** 2
MSSSIM_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return float(10.0 * np.log10(peak * peak / mse))


def _gauss2d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    half = (size - 1) / 2.0
    g = np.exp(-((np.arange(size) - half) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def _corr_valid(x: np.ndarray, win: np.ndarray) -> np.ndarray:
    """2-D 'valid' correlation by direct summation (small test images)."""
    n = win.shape[0]
    h = x.shape[0] - n + 1
    w = x.shape[1] - n + 1
    out = np.zeros((h, w), np.float64)
    for i in range(n):
        for j in range(n):
            out += win[i, j] * x[i : i + h, j : j + w]
    return out


def _ssim_parts(a: np.ndarray, b: np.ndarray):
    win = _gauss2d()
    mu1 = _corr_valid(a, win)
    mu2 = _corr_valid(b, win)
    s11 = _corr_valid(a * a, win) - mu1 * mu1
    s22 = _corr_valid(b * b, win) - mu2 * mu2
    s12 = _corr_valid(a * b, win) - mu1 * mu2
    lum = (2 * mu1 * mu2 + C1) / (mu1 * mu1 + mu2 * mu2 + C1)
    cs = (2 * s12 + C2) / (s11 + s22 + C2)
    return lum, cs


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM over channels; inputs (C, H, W) f64 code values."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    vals = []
    for c in range(a.shape[0]):
        lum, cs = _ssim_parts(a[c], b[c])
        vals.append(lum * cs)
    return float(np.mean(vals))


def _down2(x: np.ndarray) -> np.ndarray:
    h, w = x.shape[0] & ~1, x.shape[1] & ~1
    x = x[:h, :w]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])


def msssim(a: np.ndarray, b: np.ndarray, levels: int = 5) -> float:
    """Wang-2003 MS-SSIM; inputs (C, H, W) f64 code values.  Level clamping
    matches ops/quality.msssim (window must fit after downsampling)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    min_dim = min(a.shape[-2], a.shape[-1])
    fit = max(1, (min_dim // 11).bit_length())
    levels = min(levels, fit)
    weights = MSSSIM_WEIGHTS[:levels]
    if levels < len(MSSSIM_WEIGHTS):
        weights = weights / weights.sum()
    result = 1.0
    for lvl in range(levels):
        lums, css = [], []
        for c in range(a.shape[0]):
            lum, cs = _ssim_parts(a[c], b[c])
            lums.append(lum)
            css.append(cs)
        if lvl == levels - 1:
            ml = np.mean([l * c for l, c in zip(lums, css)])
            result *= max(ml, 0.0) ** weights[lvl]
        else:
            result *= max(np.mean(css), 0.0) ** weights[lvl]
            a = np.stack([_down2(a[c]) for c in range(a.shape[0])])
            b = np.stack([_down2(b[c]) for c in range(b.shape[0])])
    return float(result)
