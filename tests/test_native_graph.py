"""Native C++ graph builder vs the Python behavioral spec."""

import numpy as np
import pytest

from ppg_slam_tpu.frontend.graph_build import (
    _suppress_candidates_native,
    _suppress_candidates_py,
    pair_geometry_np,
)
from ppg_slam_tpu.native import get_lib

RNG = np.random.RandomState(77)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native graph builder not available")
    return lib


def make_case(k=120, density=0.08):
    kp = np.stack([RNG.uniform(5, 600, k), RNG.uniform(5, 400, k)],
                  1).astype(np.float32)
    dist, ang = pair_geometry_np(kp)
    pm = RNG.rand(k, k) < density
    pm = np.triu(pm, 1)
    pm = pm | pm.T
    return pm, dist, ang


class TestNativeGraphBuilder:
    def test_matches_python_spec(self, lib):
        for _ in range(5):
            pm, dist, ang = make_case()
            c_py, a_py = _suppress_candidates_py(pm, dist, ang)
            c_na, a_na = _suppress_candidates_native(lib, pm, dist, ang)
            np.testing.assert_array_equal(c_py, c_na)
            np.testing.assert_array_equal(a_py, a_na)

    def test_colines_match(self, lib):
        import ctypes

        from ppg_slam_tpu.frontend.graph_build import (
            finalize_edges_and_colines,
        )

        pm, dist, ang = make_case(k=80, density=0.12)
        cands, alive = _suppress_candidates_py(pm, dist, ang)
        n_c = len(cands)
        rate = RNG.rand(n_c).astype(np.float32) * 0.4 + 0.6
        score = RNG.rand(n_c).astype(np.float32) * 0.4 + 0.1
        edges, lscore, colines, connected = finalize_edges_and_colines(
            cands, alive, rate, score, dist, ang, 80)

        good = (alive & (rate >= 0.8) & (score >= 0.2)).astype(np.uint8)
        out = np.zeros((4096, 3), np.int32)
        cc = np.ascontiguousarray(cands.astype(np.int32))
        d = np.ascontiguousarray(dist.astype(np.float32))
        a = np.ascontiguousarray(ang.astype(np.float32))
        n = lib.ppg_extract_colines(
            cc.ctypes.data_as(ctypes.c_void_p),
            good.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(n_c),
            d.ctypes.data_as(ctypes.c_void_p),
            a.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(80),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(4096))
        np.testing.assert_array_equal(out[:n], colines)

    def test_native_faster(self, lib):
        import time

        pm, dist, ang = make_case(k=400, density=0.05)
        t0 = time.perf_counter()
        _suppress_candidates_py(pm, dist, ang)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        _suppress_candidates_native(lib, pm, dist, ang)
        t_na = time.perf_counter() - t0
        assert t_na < t_py, (t_na, t_py)


class TestFullBuildGraph:
    """ppg_build_graph (remap + probes + suppression + validation + colines)
    vs the numpy spec, on random (degeneracy-free) inputs."""

    def test_build_graph_native_matches_python(self, lib):
        from ppg_slam_tpu.frontend.graph_build import (
            _build_graph_native, _build_graph_py)

        for trial in range(10):
            h, w = 96, 128
            heat = np.clip(
                RNG.rand(h, w).astype(np.float32) ** 2 * 1.5, 0, 1)
            k = RNG.randint(5, 60)
            kp = np.stack([RNG.uniform(2, w - 3, k),
                           RNG.uniform(2, h - 3, k)], 1).astype(np.float32)
            ok = (RNG.rand(k) > 0.1).astype(np.uint8)
            e1, s1, c1, conn1 = _build_graph_py(heat, kp, ok)
            e2, s2, c2, conn2 = _build_graph_native(
                lib, np.ascontiguousarray(heat), np.ascontiguousarray(kp),
                np.ascontiguousarray(ok))
            assert np.array_equal(e1, e2), trial
            np.testing.assert_allclose(s1, s2, atol=1e-5)
            assert np.array_equal(c1, c2), trial
            assert conn1 == conn2, trial

    def test_remap_native_matches_numpy_and_device(self, lib):
        import ctypes

        import jax.numpy as jnp

        from ppg_slam_tpu.frontend.graph_build import remap_np
        from ppg_slam_tpu.ops.heatmap import remap_heatmap

        h, w = 64, 96
        heat = RNG.rand(h, w).astype(np.float32)
        mapx = np.clip(
            np.add.outer(np.zeros(h), np.arange(w))
            + RNG.randn(h, w) * 3, -2, w + 1).astype(np.float32)
        mapy = np.clip(
            np.add.outer(np.arange(h), np.zeros(w))
            + RNG.randn(h, w) * 3, -2, h + 1).astype(np.float32)
        rxy = np.stack([mapx, mapy], -1)

        r_np = remap_np(heat, rxy)
        r_dev = np.asarray(remap_heatmap(jnp.asarray(heat), jnp.asarray(rxy)))
        out = np.empty_like(heat)
        lib.ppg_remap(
            heat.ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(mapx).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(mapy).ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int(h), ctypes.c_int(w),
            out.ctypes.data_as(ctypes.c_void_p))
        np.testing.assert_allclose(out, r_np, atol=1e-6)
        np.testing.assert_allclose(out, r_dev, atol=1e-6)

    def test_pair_geometry_native_close_to_numpy(self, lib):
        from ppg_slam_tpu.native import pair_geometry_native

        kp = np.stack([RNG.uniform(0, 700, 80),
                       RNG.uniform(0, 400, 80)], 1).astype(np.float32)
        dist_n, ang_n = pair_geometry_native(kp)
        dist_p, ang_p = pair_geometry_np(kp)
        np.testing.assert_allclose(dist_n, dist_p, atol=1e-3)
        np.testing.assert_allclose(ang_n, ang_p, atol=1e-5)
