"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's graft entry;
unit/integration tests must be hermetic and multi-"chip"-capable, so we force
the CPU backend with 8 virtual devices before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session default is the real TPU (axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # Backend codegen level 1: measured on the 60-frame tracked fixture
    # (coarse-bucket era, warm process): -O0 compiles cheapest but runs
    # solves ~3x slower (cold 138 s / warm 33.8 s); default -O2 runs fast
    # but compiles dearest (194 / 14.8); -O1 is best on both sides of the
    # tradeoff for this suite (156 / 11.6). Tests assert numerics vs
    # scipy/OpenCV/TorchScript, not wall time.
    flags = flags + " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags

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


_COMPILES_SINCE_CLEAR = [0]
_COMPILES_TOTAL = [0]


def _count_backend_compile(key: str, *a, **kw) -> None:
    if key == "/jax/core/compile/backend_compile_duration":
        _COMPILES_SINCE_CLEAR[0] += 1
        _COMPILES_TOTAL[0] += 1


jax.monitoring.register_event_duration_secs_listener(_count_backend_compile)


# Module order: group modules that SHARE compiled programs and run them
# before the compile-churning unit modules, so the ~300-compile cache
# clear (below) never lands between two modules that would otherwise reuse
# each other's solve/pose/preintegration programs (observed: one unlucky
# clear boundary before the tracked-sequence modules costs minutes of
# recompiles). Order: solve-heavy pipeline modules (share solve_ba /
# pose-opt / preintegration programs and the tracked-map store) ->
# extractor-heavy modules (share the front-end program) -> unit modules
# (many one-use programs; clears are harmless there).
_MODULE_ORDER = [
    # group A: pipeline / solver programs (+ map_store producer before
    # consumers: test_pipeline_e2e donates to test_serialize/test_viewer/
    # test_parallel). The estimator-family unit modules run INSIDE this
    # span because they reuse the same solve_ba/pose-opt/preintegration
    # bucket programs — running them after a cache clear recompiled the
    # whole bucket set (~190 compiles, ~40 s, observed r2).
    "test_async", "test_ba_entry", "test_pipeline_e2e",
    "test_serialize", "test_viewer", "test_loop_closing",
    "test_relocalization", "test_profiling", "test_cli_e2e",
    "test_estimator", "test_inertial_init", "test_pose_graph",
    # group B: front-end extractor programs (cli_e2e sits in group A: it
    # tracks through the full pipeline, so it must reuse A's solve
    # programs — a cache clear between A and it recompiled ~30 s of solve
    # buckets, observed r2)
    "test_extractor", "test_frontend_decode",
    "test_device_match", "test_prefetch", "test_fisheye_e2e",
    "test_real_extractor_pipeline", "test_ppg_net",
    # test_parallel is a compile BOMB (~290 programs: 8-device shard_map
    # solves) that trips the cache clear below — run it after every module
    # that shares programs, so the clear wipes nothing anyone reuses
    "test_parallel",
]


def pytest_collection_modifyitems(session, config, items):
    rank = {m: i for i, m in enumerate(_MODULE_ORDER)}
    items.sort(key=lambda it: rank.get(it.module.__name__,
                                       len(_MODULE_ORDER)))


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_compiler_state(request):
    """XLA:CPU segfaults inside backend_compile_and_load after several
    hundred in-process COMPILATIONS (reproduced twice at the same point of
    the full suite; never in a single-module run). The earlier mitigation
    (clear_caches every module / every 3rd module) capped compiler state by
    recompiling everything — which made recompilation itself the dominant
    suite cost: the tracked-map fixture modules (loop closing, reloc,
    viewer, pipeline e2e, serialize) share the same LBA / pose-opt /
    preintegration programs and each paid the full compile bill again.
    Clear on the actual risk signal instead — the backend-compile COUNT
    since the last clear (counted via jax.monitoring) — so shared programs
    survive across modules while compiler state stays inside the margin
    that was green under the old policy."""
    import time as _time

    t0 = _time.monotonic()
    yield
    # Deterministic clear points at boundaries where program sharing ends
    # (after the solver-family span, after the shard_map bomb), plus the
    # >=300 safety valve in case compile counts drift: an unplanned clear
    # landing between two program-sharing modules costs ~30 s of
    # recompiles (observed r2 between the estimator family and cli_e2e).
    _CLEAR_AFTER = {"test_pose_graph", "test_parallel"}
    cleared = (_COMPILES_SINCE_CLEAR[0] >= 300
               or (request.module.__name__ in _CLEAR_AFTER
                   and _COMPILES_SINCE_CLEAR[0] >= 100))
    try:  # per-module compile telemetry (pytest captures stderr; use a file)
        with open("/tmp/ppg_compile_counts.log", "a") as f:
            f.write(f"{request.module.__name__}: "
                    f"total={_COMPILES_TOTAL[0]} "
                    f"since_clear={_COMPILES_SINCE_CLEAR[0]} "
                    f"wall={_time.monotonic() - t0:.1f}s"
                    f"{' CLEAR' if cleared else ''}\n")
    except OSError:
        pass
    if cleared:
        jax.clear_caches()
        _COMPILES_SINCE_CLEAR[0] = 0


@pytest.fixture(autouse=True, scope="module")
def _fresh_id_counters():
    """Module isolation for the global Frame/KeyFrame/MapPoint id counters
    (the reference resets nNextId on system reset, Tracking.cpp:1364-1365;
    tests that index ground truth by frame_id need counters starting at 0)."""
    from ppg_slam_tpu.worldmap import reset_ids

    reset_ids()
    yield
