"""Local mapping — the reference MSLocalMapping (system/src/LocalMapping.cpp).

Consumes new keyframes: neighbor fuse (SearchInNeighbors :159-366 including
MapEdge fusion), then local (inertial) BA, then hands the keyframe to loop
closing. Runs synchronously by default (deterministic, and the Python host
would serialize on the GIL anyway); the queue/abort protocol is preserved so a
threaded driver can reuse it.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..estimator.ba import local_bundle_adjustment, local_inertial_ba
from ..matching import Matcher
from ..worldmap import KeyFrame, Map


class LocalMapping:
    def __init__(self, wmap: Map, loop_closer=None, tracking=None,
                 threaded: bool = False):
        self.map = wmap
        self.loop_closer = loop_closer
        self.tracking = tracking
        self.queue: List[KeyFrame] = []
        self.abort_ba = False
        self._idle = True
        self._processing = False
        self.n_ba_aborted = 0  # observability: how many BAs were cut short
        # threaded=True enables the chunked-BA abort poll (the reference's
        # mbAbortBA, LocalMapping.cpp:118-124). In the synchronous pipeline
        # insert_keyframe can never race a running solve, so the poll would
        # only add per-chunk dispatch round trips — skip it and run each BA
        # as ONE fused device solve.
        self.threaded = threaded

    def idle(self) -> bool:
        return self._idle and not self.queue

    def insert_keyframe(self, kf: KeyFrame) -> None:
        """Queue a keyframe and abort any running BA (the reference sets
        mbAbortBA here, LocalMapping.cpp:118-124). If called re-entrantly
        (from a BA abort-poll or another thread) the enqueued KF is drained
        by the outer process_all loop."""
        self.queue.append(kf)
        self.abort_ba = True
        if not self._processing:
            self.process_all()

    def reset(self) -> None:
        self.queue.clear()

    # ------------------------------------------------------------------
    def process_all(self) -> None:
        self._processing = True
        try:
            while self.queue:
                kf = self.queue.pop(0)
                self._idle = False
                try:
                    self.process_keyframe(kf)
                finally:
                    self._idle = True
        finally:
            self._processing = False

    def _abort_requested(self) -> bool:
        """Polled between BA GN chunks (reference g2o force-stop flag,
        OptimizerLBA.cpp:112-113)."""
        if self.abort_ba:
            self.n_ba_aborted += 1
            return True
        return False

    def process_keyframe(self, kf: KeyFrame) -> None:
        # Mirror of the reference's mMutexMapUpdate discipline: fuse, BA
        # write-back and connection updates mutate the map, so they run
        # under the map update lock (re-entrant; only a background-GBA
        # thread ever contends — see loop_closing.poll_gba/_solve_gba).
        with self.map.update_lock:
            self._process_keyframe_locked(kf)

    def _process_keyframe_locked(self, kf: KeyFrame) -> None:
        from ..utils import profiler

        with profiler.timer("local_mapping.fuse"):
            self.search_in_neighbors(kf)
        if self.map.n_keyframes() > 2:
            self.abort_ba = False
            abort = self._abort_requested if self.threaded else None
            with profiler.timer("local_mapping.lba"):
                if self.map.imu_initialized:
                    inliers = (self.tracking.matches_inliers
                               if self.tracking is not None else 0)
                    b_large = inliers > 75  # LocalMapping.cpp:74
                    local_inertial_ba(kf, self.map, b_large=b_large,
                                      abort_check=abort)
                else:
                    local_bundle_adjustment(
                        kf, self.map, abort_check=abort)
        profiler.count("keyframes")
        if self.loop_closer is not None:
            self.loop_closer.insert_keyframe(kf)

    # ------------------------------------------------------------------
    def search_in_neighbors(self, kf: KeyFrame) -> None:
        """MapPoint fuse across 1st/2nd-ring covisibles + temporal chain,
        then MapEdge fusion (LocalMapping.cpp:159-366)."""
        targets: List[KeyFrame] = []
        seen = set()
        for nb in kf.get_best_covisibility_keyframes(30):
            if not nb.is_bad() and nb.mnId not in seen:
                targets.append(nb)
                seen.add(nb.mnId)
        for nb in list(targets):
            for nb2 in nb.get_best_covisibility_keyframes(20):
                if not nb2.is_bad() and nb2.mnId not in seen \
                        and nb2.mnId != kf.mnId:
                    targets.append(nb2)
                    seen.add(nb2.mnId)
        prev = kf.prev_kf
        while len(targets) < 20 and prev is not None:
            if not prev.is_bad() and prev.mnId not in seen:
                targets.append(prev)
                seen.add(prev.mnId)
            prev = prev.prev_kf

        matcher = Matcher(self.map.rig.cam)
        own_points = [mp for mp in kf.map_points if mp is not None]
        for t in targets:
            matcher.fuse(t, own_points)
        fuse_candidates = []
        cseen = set()
        for t in targets:
            for mp in t.map_points:
                if mp is not None and not mp.is_bad() \
                        and mp.mnId not in cseen:
                    cseen.add(mp.mnId)
                    fuse_candidates.append(mp)
        matcher.fuse(kf, fuse_candidates)

        for mp in kf.map_points:
            if mp is not None and not mp.is_bad():
                mp.compute_distinctive_descriptor()
                mp.update_normal_and_depth()

        # MapEdge fusion: edges of target KFs whose both endpoints are now
        # matched in kf get merged into kf's edges (:258-358)
        own_mps = {mp.mnId for mp in kf.map_points if mp is not None}
        own_edges = [me for me in kf.map_edges if me is not None]
        for t in targets:
            for me in t.map_edges:
                if me is None or me.is_bad():
                    continue
                if me.mp_s.mnId not in own_mps or me.mp_e.mnId not in own_mps:
                    continue
                for me2 in own_edges:
                    if me2.is_bad():
                        continue
                    same = ((me2.mp_s is me.mp_s and me2.mp_e is me.mp_e)
                            or (me2.mp_s is me.mp_e and me2.mp_e is me.mp_s))
                    if same and me2 is not me:
                        for okf, oid in me.observations.items():
                            if not okf.is_bad():
                                me2.add_observation(okf, oid)
                        me.bad = True
                        break
        for me in own_edges:
            if not me.is_bad():
                me.check_valid()
        kf.update_connections()
