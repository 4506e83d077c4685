"""Map checkpointing: save/load the full worldmap to a single file.

The reference has NO persistence (SURVEY.md §5 — only final trajectory
export); the rebuild adds it per the blueprint ("it's cheap and aids
testing"): loop-closing tests load a prebuilt map instead of re-tracking a
sequence, and long runs can checkpoint/resume.

Format: a pickle of the Map object graph (KeyFrame <-> MapPoint cycles are
handled natively), preceded by a magic+version header. The BoW vocabulary is
NOT stored (it is a large static asset, ~866 KB shared across maps) — the
loader reattaches the caller's vocabulary. Element id counters are advanced
past the stored maxima so post-load element creation never collides.
"""

from __future__ import annotations

import io
import itertools
import pickle
from typing import Optional

MAGIC = b"PPGTPUMAP"
VERSION = 1


def save_map(world_map, path: str) -> None:
    """Serialize the map (without the vocabulary) to `path`."""
    vocab = world_map.vocabulary
    world_map.vocabulary = None
    try:
        buf = io.BytesIO()
        pickle.dump(world_map, buf, protocol=pickle.HIGHEST_PROTOCOL)
    finally:
        world_map.vocabulary = vocab
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(VERSION.to_bytes(2, "little"))
        f.write(buf.getbuffer())


def load_map(path: str, vocabulary=None, rig=None):
    """Load a map saved by save_map; reattaches `vocabulary` (and optionally
    overrides the stored rig) and advances the global element id counters."""
    from . import elements, frame as frame_mod

    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not a ppg_slam_tpu map file")
        version = int.from_bytes(f.read(2), "little")
        if version > VERSION:
            raise ValueError(f"{path}: map version {version} > {VERSION}")
        try:
            world_map = pickle.load(f)
        except Exception as e:  # truncated / corrupted payload
            raise ValueError(f"{path}: corrupted map payload ({e})") from e

    world_map.vocabulary = vocabulary
    if rig is not None:
        world_map.rig = rig
    if vocabulary is not None:
        # Re-index place recognition: maps saved from a vocabulary-less run
        # have no BoW vectors, so compute the missing ones from the stored
        # keyframe descriptors and rebuild the inverted file — a loaded map
        # is then immediately relocalizable (System(load_map=...)).
        world_map.inverted_file = {}
        for kf in sorted(world_map.keyframes, key=lambda k: k.mnId):
            if not kf.bow_vec:
                desc = kf.descriptors
                if desc is None or not len(desc):
                    continue
                kf.bow_vec, kf.feat_vec = vocabulary.transform(desc)
            for word in kf.bow_vec:
                world_map.inverted_file.setdefault(word, []).append(kf)

    def bump(counter_name, module, ids):
        nxt = (max(ids) + 1) if ids else 0
        current = next(getattr(module, counter_name))
        setattr(module, counter_name,
                itertools.count(max(nxt, current + 1)))

    bump("_kf_ids", frame_mod, [kf.mnId for kf in world_map.keyframes])
    bump("_frame_ids", frame_mod,
         [kf.frame_id for kf in world_map.keyframes
          if getattr(kf, "frame_id", None) is not None])
    bump("_mp_ids", elements, [mp.mnId for mp in world_map.map_points])
    bump("_me_ids", elements, [me.mnId for me in world_map.map_edges])
    bump("_mc_ids", elements, [mc.mnId for mc in world_map.map_colines])
    return world_map
