"""NumPy CPU reference for XPSNR — the test oracle.

Mirrors the reference implementation's structure (xpsnr-cuda/src/lib.rs:92-197
and xpsnr-cuda-kernel/src/lib.rs:38-120): per-16x16-block SSE, spatial
activity via |3x3 highpass|, temporal activity via |frame diff|, visual-
activity weighting with the CPU smoothing pass for small frames, and the
final avgact scaling.  Borders of the highpass use edge replication (the
reference's NPP call has undefined borders; see ops/xpsnr_ops.py).
"""

from __future__ import annotations

import numpy as np

BLOCK = 16
HIGHPASS = np.array([[-1, -2, -1], [-2, 12, -2], [-1, -2, -1]], dtype=np.int64)


def highpass_abs(y: np.ndarray) -> np.ndarray:
    p = np.pad(y.astype(np.int64), 1, mode="edge")
    h, w = y.shape
    acc = np.zeros((h, w), dtype=np.int64)
    for dy in range(3):
        for dx in range(3):
            acc += HIGHPASS[dy, dx] * p[dy : dy + h, dx : dx + w]
    return np.abs(acc)


def block_sums(x: np.ndarray, block: int = BLOCK) -> np.ndarray:
    h, w = x.shape
    hb, wb = (h + block - 1) // block, (w + block - 1) // block
    out = np.zeros((hb, wb), dtype=np.int64)
    for by in range(hb):
        for bx in range(wb):
            out[by, bx] = x[by * block : (by + 1) * block, bx * block : (bx + 1) * block].sum()
    return out


def xpsnr_frame(
    y_ref: np.ndarray,
    y_dis: np.ndarray,
    y_prev: np.ndarray | None,
    *,
    depth: int = 8,
) -> tuple[float, float]:
    """Returns (wsse_final, xpsnr_db) for one frame."""
    h, w = y_ref.shape
    r = y_ref.astype(np.int64)
    d = y_dis.astype(np.int64)
    p = r if y_prev is None else y_prev.astype(np.int64)

    sse = block_sums((r - d) ** 2)
    sact = block_sums(highpass_abs(y_ref))
    tact = block_sums(np.abs(r - p))

    n = float(BLOCK * BLOCK)
    msact = 1.0 + sact.astype(np.float64) / n + 2.0 * tact.astype(np.float64) / n
    msact = np.maximum(msact, float(1 << (depth - 2)))
    weights = (1.0 / msact).reshape(-1)

    blocks_w = sse.shape[1]
    num_blocks = sse.size
    if w * h <= 640 * 480:
        wgt = weights
        for blk in range(num_blocks):
            if blk % blocks_w == 0:
                msact_prev = wgt[blk - 2] if blk > 1 else 0.0
            else:
                if blk % blocks_w > 1:
                    msact_prev = max(wgt[blk - 2], wgt[blk])
                else:
                    msact_prev = wgt[blk]
            if blk > blocks_w:
                msact_prev = max(msact_prev, wgt[blk - 1 - blocks_w])
            if blk > 0 and wgt[blk - 1] > msact_prev:
                wgt[blk - 1] = msact_prev
            if blk == num_blocks - 1 and blk > 0:
                msact_prev = max(wgt[blk - 1], wgt[blk - blocks_w])
                wgt[blk] = min(wgt[blk], msact_prev)
        weights = wgt

    wsse = float((weights * sse.reshape(-1).astype(np.float64)).sum())
    if wsse < 0:
        wsse_final = 0.0
    else:
        rr = w * h / (3840.0 * 2160.0)
        avgact = np.sqrt(16.0 * float(1 << (2 * depth - 9)) / np.sqrt(max(rr, 1e-5)))
        wsse_final = float(np.uint64(wsse * avgact + 0.5))
    if wsse_final <= 0:
        db = float("inf")
    else:
        maxval = (1 << depth) - 1
        db = 10.0 * np.log10(maxval * maxval * float(w * h) / wsse_final)
    return wsse_final, db
