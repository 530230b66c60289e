"""VMAF elementary features engine.

Role of the reference's vmaf/vmaf-cuda crates (vmaf/src/lib.rs binds libvmaf;
vmaf-cuda-kernel implements only the motion feature from scratch,
integer_motion.rs:28-92).  This engine computes features natively on TPU;
currently the 'motion' elementary feature (SAD of integer-blurred luma vs the
previous frame, normalised per pixel; frame 0 scores 0.0 as in libvmaf).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from turbo_metrics_tpu.ops.vmaf_motion import integer_blur, motion_score


class VmafFeatures:
    """Streaming, batched motion feature over the reference luma sequence."""

    def __init__(self, width: int, height: int, *, depth: int = 8):
        self.width = int(width)
        self.height = int(height)
        self.depth = int(depth)

        def batch_stats(y_batch, prev_blurred):
            blurred = integer_blur(y_batch, depth=depth)
            prev_seq = jnp.concatenate([prev_blurred[None], blurred[:-1]], axis=0)
            diff = jnp.abs(
                blurred.astype(jnp.int32) - prev_seq.astype(jnp.int32)
            ).astype(jnp.uint32)
            # Row sums stay within u32; the final sum happens on host in i64.
            return blurred[-1], diff.sum(axis=-1, dtype=jnp.uint32)

        self._fn = jax.jit(batch_stats)
        self._blur1 = jax.jit(functools.partial(integer_blur, depth=depth))
        self._prev_blurred: Optional[np.ndarray] = None
        self._first = True

    def reset(self) -> None:
        self._prev_blurred = None
        self._first = True

    def compute_batch(self, y_ref: np.ndarray) -> list[float]:
        """'motion' score per frame for a (B, H, W) luma batch (stream order)."""
        assert y_ref.ndim == 3
        if self._prev_blurred is None:
            prev = np.asarray(self._blur1(y_ref[0:1]))[0]
        else:
            prev = self._prev_blurred
        last_blur, sad_rows = self._fn(y_ref, prev)
        sads = np.asarray(sad_rows, dtype=np.int64).sum(axis=-1)
        self._prev_blurred = np.asarray(last_blur)
        scores = [
            motion_score(int(s), self.width, self.height, depth=self.depth)
            for s in sads
        ]
        if self._first:
            scores[0] = 0.0  # first frame of the stream has no predecessor
            self._first = False
        return scores
