"""FramePrefetcher ordering/flush semantics (frontend/prefetch.py)."""

import numpy as np

from ppg_slam_tpu.frontend.prefetch import FramePrefetcher


class _FakeHandle:
    def __init__(self, imgs):
        self.imgs = imgs

    def result(self):
        return [int(im[0, 0]) for im in self.imgs]  # "features" = frame id


class _FakeExtractor:
    def __init__(self):
        self.batches = []

    def extract_batch_async(self, imgs):
        self.batches.append(len(imgs))
        return _FakeHandle(imgs)


def _img(i):
    return np.full((2, 2), i, np.uint8)


class TestPrefetcher:
    def test_in_order_delivery(self):
        ex = _FakeExtractor()
        pf = FramePrefetcher(ex, batch=4, depth=2)
        out = []
        for i in range(10):
            pf.feed(_img(i))
            if i >= 3:
                out.append(pf.get())
        while len(out) < 10:
            out.append(pf.get())
        assert out == list(range(10))
        assert all(b == 4 for b in ex.batches)  # fixed compiled shape

    def test_flush_pads_and_trims(self):
        ex = _FakeExtractor()
        pf = FramePrefetcher(ex, batch=4, depth=2)
        for i in range(6):  # 1 full batch + 2 staged
            pf.feed(_img(i))
        got = [pf.get() for _ in range(6)]
        assert got == list(range(6))
        assert ex.batches == [4, 4]  # tail batch padded to 4

    def test_feed_after_flush_stays_aligned(self):
        ex = _FakeExtractor()
        pf = FramePrefetcher(ex, batch=4, depth=2)
        for i in range(2):
            pf.feed(_img(i))
        assert [pf.get() for _ in range(2)] == [0, 1]  # forces a flush
        for i in range(2, 7):
            pf.feed(_img(i))
        assert [pf.get() for _ in range(5)] == [2, 3, 4, 5, 6]

    def test_depth_bounds_inflight(self):
        ex = _FakeExtractor()
        pf = FramePrefetcher(ex, batch=2, depth=2)
        for i in range(20):
            pf.feed(_img(i))
        assert len(ex.batches) == 2  # window full: rest stays staged
        assert pf.get() == 0
        assert len(ex.batches) >= 3  # consuming refills the window
