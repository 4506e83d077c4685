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

# Persistent XLA compilation cache: the pipeline compiles ~30 distinct
# (bucketed) programs; caching them on disk makes suite re-runs start warm.
import pathlib

_cache = pathlib.Path.home() / ".cache" / "ppg_slam_tpu_xla"
_cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
