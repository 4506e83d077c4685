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
