"""NumPy CPU reference for the VMAF motion feature — the test oracle.

Scalar, exact-integer port of the reference kernel's math
(vmaf-cuda-kernel/src/integer_motion.rs:28-92), including its asymmetric
border mirroring.
"""

from __future__ import annotations

import numpy as np

FILTER = np.array([3571, 16004, 26386, 16004, 3571], dtype=np.uint64)
RADIUS = 2


def _mirror(idx: int, limit: int) -> int:
    idx = abs(idx)
    return idx if idx < limit else limit - (idx - limit + 1)


def integer_blur(y: np.ndarray, depth: int = 8) -> np.ndarray:
    h, w = y.shape
    out = np.zeros((h, w), dtype=np.uint16)
    src = y.astype(np.uint64)
    for yy in range(h):
        for xx in range(w):
            acc = np.uint64(0)
            for xf in range(5):
                col = 0
                for yf in range(5):
                    s = src[_mirror(yy - RADIUS + yf, h), _mirror(xx - RADIUS + xf, w)]
                    col += int(FILTER[yf]) * int(s)
                acc += FILTER[xf] * np.uint64((col + (1 << (depth - 1))) >> depth)
            out[yy, xx] = (int(acc) + 32768) >> 16
    return out


def motion_frame(y: np.ndarray, prev_blurred: np.ndarray | None, depth: int = 8):
    """Returns (blurred, sad)."""
    blurred = integer_blur(y, depth)
    if prev_blurred is None:
        return blurred, 0
    sad = int(np.abs(blurred.astype(np.int64) - prev_blurred.astype(np.int64)).sum())
    return blurred, sad
