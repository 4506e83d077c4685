"""Host service for device-side gated matching (ops/device_match.py).

Owns the persistent on-device descriptor bank (map-point descriptors,
uploaded incrementally at keyframe rate over the fast H2D link) and turns a
per-frame batch of gate queries into ONE device dispatch whose ~M*K*4-byte
result replaces the ~131 KB/frame descriptor download. The returned
`GatedRows` object is a drop-in for matcher._RowCache: `row(mp)[kp]` yields
the L2 descriptor distance when (mp, kp) is inside the map point's gate and
within the gate's K nearest, +inf otherwise — the host matcher's sequential
decision logic (claiming, ratio tests, PPG seed-growing) is unchanged.

Semantics vs the dense host matcher: gate membership is exact (the host
computes the same open-interval |kp - center| < r boxes Frame.features_in_area
checks, grid.py:78-80, and uploads them); the only approximation is the
per-row top-K cut. Rows whose gate population exceeds K report it in
`overflow_rows` so callers/tests can quantify (see tests/test_device_match.py).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from ..ops.device_match import MATCH_K, unpack_match

_BUCKETS = (256, 512, 1024, 2048, 4096)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


class _SparseRow:
    """Distance row over one frame's keypoints with +inf default."""

    __slots__ = ("d",)

    def __init__(self, d: Dict[int, float]):
        self.d = d

    def __getitem__(self, idx) -> float:
        return self.d.get(int(idx), np.inf)


_EMPTY = _SparseRow({})


class GatedRows:
    """matcher._RowCache-compatible view over one device match result."""

    def __init__(self, rows: Dict[int, _SparseRow], overflow_rows: int,
                 n_rows: int):
        self.rows = rows
        self.overflow_rows = overflow_rows  # rows with > K gated keypoints
        self.n_rows = n_rows

    def ensure(self, mps) -> None:  # dispatch already covered every row
        pass

    def row(self, mp) -> _SparseRow:
        return self.rows.get(mp.mnId, _EMPTY)


class DeviceMatcher:
    """Persistent device descriptor bank + per-frame gated match dispatch."""

    def __init__(self, bank_cap: int = 16384, k: int = MATCH_K):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        self.bank_cap = bank_cap
        self.k = k
        self.bank = jnp.zeros((bank_cap, 256), jnp.float32)
        self._slot_of: Dict[int, int] = {}   # mp.mnId -> bank slot
        self._desc_ref: Dict[int, int] = {}  # mp.mnId -> id(descriptor array)
        self._mp_of: Dict[int, object] = {}  # mp.mnId -> MapPoint (for GC)
        self._free: List[int] = list(range(bank_cap - 1, -1, -1))
        self._update = jax.jit(
            lambda b, s, d: b.at[s].set(d), donate_argnums=0)
        self._slice = jax.jit(
            lambda d, i: jax.lax.dynamic_index_in_dim(d, i, 0,
                                                      keepdims=False))
        # one compiled match program per (M bucket, N keypoint cap)
        from ..ops.device_match import gated_match_packed

        self._match = gated_match_packed
        self.n_dispatches = 0
        self.n_bank_uploads = 0
        self.n_pair_overflows = 0
        self.max_pairs = 0

    # -- bank maintenance (keyframe-rate) --------------------------------
    def release(self, mp_id: int) -> None:
        slot = self._slot_of.pop(mp_id, None)
        if slot is not None:
            self._desc_ref.pop(mp_id, None)
            self._mp_of.pop(mp_id, None)
            self._free.append(slot)

    def _reclaim_dead(self) -> None:
        """Free slots of culled map points (MapPoint::SetBadFlag / culling
        happens at keyframe rate in local mapping)."""
        dead = [mid for mid, mp in self._mp_of.items() if mp.is_bad()]
        for mid in dead:
            self.release(mid)

    def ensure_bank(self, mps: Iterable) -> None:
        """Upload descriptors for map points that are new or whose
        distinctive descriptor changed (identity check: MapPoint replaces
        the array object on recompute)."""
        slots, descs = [], []
        for mp in mps:
            if mp is None:
                continue
            d = mp.descriptor
            if d is None:
                continue
            slot = self._slot_of.get(mp.mnId)
            if slot is not None and self._desc_ref[mp.mnId] == id(d):
                continue
            if slot is None:
                if not self._free:
                    self._reclaim_dead()
                if not self._free:
                    continue  # bank full: mp simply stays unmatched
                slot = self._free.pop()
                self._slot_of[mp.mnId] = slot
                self._mp_of[mp.mnId] = mp
            self._desc_ref[mp.mnId] = id(d)
            slots.append(slot)
            descs.append(d)
        if not slots:
            return
        jnp = self._jnp
        # pad to a small set of shapes so updates share compiled programs
        u = len(slots)
        cap = 64
        while cap < u:
            cap *= 2
        pad = cap - u
        if pad:
            slots = slots + [slots[-1]] * pad
            descs = descs + [descs[-1]] * pad
        self.bank = self._update(self.bank,
                                 jnp.asarray(np.asarray(slots, np.int32)),
                                 jnp.asarray(np.stack(descs)))
        self.n_bank_uploads += 1

    # -- per-frame dispatch ----------------------------------------------
    def gated_rows(self, frame, queries: List[Tuple[object, float, float,
                                                    float]]) -> GatedRows:
        """One device dispatch answering all of a frame's gate queries.

        queries: list of (map_point, center_x, center_y, radius). Map points
        without a bank slot get empty rows (callers fall back to no-match,
        mirroring an out-of-gate candidate).
        """
        jnp = self._jnp
        feats = frame.feats
        dd = feats.desc_dev
        assert dd is not None, "frame was extracted without device descs"
        if isinstance(dd, tuple):
            dd = self._slice(dd[0], dd[1])

        live = [(mp, cx, cy, r) for (mp, cx, cy, r) in queries
                if mp.mnId in self._slot_of]
        if not live:
            return GatedRows({}, 0, 0)
        from ..utils import profiler
        profiler.count("device_dispatches")
        m = _bucket(len(live))
        bank_idx = np.full(m, -1, np.int32)
        rects = np.zeros((m, 4), np.float32)
        for i, (mp, cx, cy, r) in enumerate(live[:m]):
            bank_idx[i] = self._slot_of[mp.mnId]
            rects[i] = (cx - r, cx + r, cy - r, cy + r)

        n_cap = dd.shape[0]
        kp_pos = np.zeros((n_cap, 2), np.float32)
        kp_valid = np.zeros(n_cap, bool)
        n = frame.N
        kp_pos[:n] = frame.kp
        kp_valid[:n] = frame.grid.ok_mask

        buf = np.asarray(self._match(
            self.bank, jnp.asarray(bank_idx), dd, jnp.asarray(kp_pos),
            jnp.asarray(kp_valid), jnp.asarray(rects), k=self.k))
        from ..ops.device_match import PAIR_CAP

        p_rows, p_kps, p_ds, n_pairs, n_over = unpack_match(
            buf, min(PAIR_CAP, m * self.k))
        self.n_dispatches += 1
        self.n_pair_overflows += int(n_pairs > len(p_rows))
        self.max_pairs = max(self.max_pairs, int(n_pairs))

        maps: List[Dict[int, float]] = [{} for _ in range(len(live[:m]))]
        for r, j, d in zip(p_rows, p_kps, p_ds):
            if r >= 0 and r < len(maps):
                maps[r][int(j)] = float(d)
        rows = {mp.mnId: _SparseRow(maps[i])
                for i, (mp, _, _, _) in enumerate(live[:m])}
        return GatedRows(rows, int(n_over), len(live[:m]))
