"""Profiling and timing helpers.

The TPU mapping of the reference's observability hooks (SURVEY.md section 5):
cuProfilerStart/Stop + Nsight -> jax.profiler traces; CuEvent timing ->
block_until_ready wall timing; the CUDA-graph dot dump -> XLA HLO dumps.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/turbo_metrics_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto.

    Equivalent of the reference's cuProfilerStart/Stop bracketing
    (cudarse-driver/src/lib.rs:50-56).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def dump_hlo(fn, *example_args, path: str = "/tmp/turbo_metrics_hlo.txt") -> str:
    """Write the optimised HLO of a jitted function — the analog of the
    reference's CUDA-graph dot dump (cudarse-driver/src/graph.rs:13-16)."""
    lowered = jax.jit(fn).lower(*example_args)
    text = lowered.compile().as_text()
    with open(path, "w") as f:
        f.write(text)
    return path


@dataclass
class Timer:
    """Wall-clock timer that syncs the device (CuEvent::elapsed_since analog)."""

    samples: list = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.samples.append(time.perf_counter() - t0)

    def time_fn(self, fn, *args, iters: int = 10, warmup: int = 1):
        """Steady-state seconds/call of a jitted function."""
        for _ in range(warmup):
            r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        self.samples.append(dt)
        return dt


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (first 1080p compile is minutes)."""
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
