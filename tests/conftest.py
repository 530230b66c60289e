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

# Two test tiers (CLAUDE.md): `pytest -m quick` is the fast dev gate
# (~5-8 min: every oracle, one interpret-mode test per kernel family,
# all pure-CPU logic); the unmarked full run (~30 min) is the
# end-of-round gate.  SLOW = items that cost >20s on the dev host
# (measured 2026-08-19, --durations), except the default engine's
# interpret gate (mxuC-8) which stays quick.
_SLOW = {
    "test_ds_buffer_bookkeeping_matches_runtime",
    "test_engine_mesh_sharding",
    "test_zero_weight_skipping_exact",
    "test_ssimulacra2_tail2_matches_chain",
    "test_dryrun_multichip_8",
    "test_msssim_pallas_chain_odd_dims",
    "test_pipelined_mxuc_matches_monolithic",
    "test_msssim_tail_matches_jnp",
    "test_ssim_pallas_matches_jnp",
    "test_mixed_bitdepth_xpsnr_vmaf",
    "test_single_wide_tile_geometry_1280",
    "test_vif_pallas_matches_oracle[hw0]",
    "test_vif_pallas_matches_oracle[hw1]",
    "test_vif_pallas_matches_oracle[hw2]",
    "test_adm_pallas_matches_oracle[hw0]",
    "test_adm_pallas_matches_oracle[hw1]",
    "test_adm_pallas_matches_oracle[hw2]",
    "test_fused_v2_matches_jnp[hw0]",
    "test_fused_v2_matches_jnp[hw1]",
    "test_fused_v2_matches_jnp[hw2]",
    "test_engine_vmaf_features_via_cli",
    "test_v4_downscale_chain_exact",
    "test_motion_stream_matches_oracle",
    "test_cli_vmaf_model",
    "test_fused_v4_chain_matches_jnp[hw2]",
    "test_fused_yuv_scale0_interpret[mxuC-10]",
    "test_engine_fused_vmaf",
    "test_static_scene_zero_motion",
    "test_full_subscores_interpret_matches_jnp",
    "test_padded_multi_step_interpret_matches_generic",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "quick: fast dev-gate subset")
    config.addinivalue_line("markers", "slow: >20s on the dev host")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


# Drift guard for the tier split: _SLOW keys on exact test names, so a new
# test (or a new heavy parametrization of an existing one) silently lands
# in the quick gate.  Fail any quick-marked item whose call phase exceeds
# the budget, with instructions to classify it — 3x the 20 s slow-list
# criterion so load jitter on borderline items doesn't flake the gate.
_QUICK_BUDGET_S = 60.0


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    rep = outcome.get_result()
    if (
        rep.when == "call"
        and rep.passed
        and call.duration > _QUICK_BUDGET_S
        and item.get_closest_marker("slow") is None
    ):
        rep.outcome = "failed"
        rep.longrepr = (
            f"{item.name} took {call.duration:.1f}s but is in the QUICK "
            f"dev gate (budget {_QUICK_BUDGET_S:.0f}s): add it to "
            "tests/conftest.py _SLOW (the >20s tier) or shrink it."
        )


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
