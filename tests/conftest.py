"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests must be deterministic and runnable without TPU hardware; multi-chip
sharding tests use the forced host-platform device count.
"""

import os

# Force CPU regardless of the outer environment (which may pin a real TPU):
# tests must be fast, deterministic and hardware-independent.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU tunnel's sitecustomize pins jax_platforms directly; override
# it after import (env alone is not enough in that environment).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_frame_pair(rng, h, w, *, noise=0.02):
    """A smooth reference image and a mildly distorted copy, linear RGB f32."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
            0.5 + 0.3 * np.cos(xx / 11.0 + 1.0) * np.sin(yy / 31.0),
            0.5 + 0.2 * np.sin((xx + yy) / 13.0),
        ],
        axis=-1,
    ).astype(np.float32)
    ref = np.clip(base + rng.normal(0, 0.01, base.shape).astype(np.float32), 0, 1)
    dis = np.clip(ref + rng.normal(0, noise, ref.shape).astype(np.float32), 0, 1)
    return ref.astype(np.float32), dis.astype(np.float32)
