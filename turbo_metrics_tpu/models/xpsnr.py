"""XPSNR engine: block-weighted PSNR over a streamed luma sequence.

The model layer over ops/xpsnr_ops.py (reference host orchestration:
xpsnr-cuda/src/lib.rs:42-197, completed — the reference's version is WIP and
not wired to its CLI; this one is a full metric producing dB scores).  Block
statistics run on device as one fused reduction per batch; the visual-
activity weighting and smoothing run on host in f64, faithful to the
reference's CPU path.

Temporal activity needs the previous *reference* frame, so the engine is
stateful across batches (first frame of a stream gets tact = 0).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np

from turbo_metrics_tpu.ops.xpsnr_ops import (
    BLOCK,
    xpsnr_block_stats,
    xpsnr_db,
    xpsnr_weights,
)


class Xpsnr:
    def __init__(self, width: int, height: int, *, depth: int = 8, block: int = BLOCK):
        self.width = int(width)
        self.height = int(height)
        self.depth = int(depth)
        self.block = int(block)
        self._prev: Optional[np.ndarray] = None
        self._fn = jax.jit(functools.partial(xpsnr_block_stats, block=self.block))

    def reset(self) -> None:
        self._prev = None

    def compute_batch(self, y_ref: np.ndarray, y_dis: np.ndarray) -> list[float]:
        """XPSNR (dB) per frame for (B, H, W) integer luma batches.

        Frames are consecutive in stream order; the previous batch's last
        reference frame seeds the temporal diff of the first frame.
        """
        assert y_ref.shape == y_dis.shape and y_ref.ndim == 3
        prev0 = self._prev if self._prev is not None else y_ref[0]
        y_prev = np.concatenate([prev0[None], y_ref[:-1]], axis=0)
        stats = self._fn(y_ref, y_dis, y_prev)
        sse = np.asarray(stats["sse"])
        sact = np.asarray(stats["sact"])
        tact = np.asarray(stats["tact"])
        self._prev = np.array(y_ref[-1])

        out = []
        for i in range(y_ref.shape[0]):
            wsse, _ = xpsnr_weights(
                sse[i], sact[i], tact[i],
                width=self.width, height=self.height,
                depth=self.depth, block=self.block,
            )
            out.append(xpsnr_db(wsse, width=self.width, height=self.height, depth=self.depth))
        return out
