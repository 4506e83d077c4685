"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's graft entry;
unit/integration tests must be hermetic and multi-"chip"-capable, so we force
the CPU backend with 8 virtual devices before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session default is the real TPU (axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-sets jax_platforms="axon,cpu" programmatically
# (which beats the env var), so override it again before backends initialize.
import jax

jax.config.update("jax_platforms", "cpu")
# Allow float64 in tests (formula validation against scipy/OpenCV); runtime
# code paths stay float32 because production inputs are float32 arrays.
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu", jax.default_backend()

# NOTE: we deliberately do NOT enable the persistent XLA compilation cache:
# XLA:CPU caches AOT machine code whose recorded "machine features" include
# compiler pseudo-features (+prefer-no-gather etc.) that never match the
# host CPUID at load time — observed first as warnings, then as a hard
# SIGSEGV inside compilation_cache.get_executable_and_time mid-suite.

import pytest


_MODULES_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults inside backend_compile_and_load after several
    hundred in-process compilations (reproduced twice at the same point of
    the full suite; never in a single-module run). Dropping the compiled-
    executable caches periodically keeps the per-process compiler state
    bounded. Clearing every 3rd module (instead of every module) keeps the
    crash margin while letting shared programs (SE3 ops, pose-opt buckets,
    BA solves) survive across neighboring modules — measured a multi-minute
    saving on the 1-core host."""
    yield
    _MODULES_SINCE_CLEAR[0] += 1
    if _MODULES_SINCE_CLEAR[0] >= 3:
        _MODULES_SINCE_CLEAR[0] = 0
        jax.clear_caches()


@pytest.fixture(autouse=True, scope="module")
def _fresh_id_counters():
    """Module isolation for the global Frame/KeyFrame/MapPoint id counters
    (the reference resets nNextId on system reset, Tracking.cpp:1364-1365;
    tests that index ground truth by frame_id need counters starting at 0)."""
    from ppg_slam_tpu.worldmap import reset_ids

    reset_ids()
    yield
