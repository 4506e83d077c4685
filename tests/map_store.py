"""Session-scoped cache of expensive tracked-map builds.

Building a tracked map through the real pipeline is the dominant suite cost
on the 1-core CI host (minutes per module). Modules that only need *a*
populated map (serialize round trips) reuse the map built by the pipeline
e2e module instead of building their own. Entries hold serialized map BYTES
plus the generating sequence; consumers deserialize a FRESH copy, so
cross-module mutation cannot leak. Every consumer falls back to building
its own map when the entry is absent (standalone module runs stay
self-contained)."""

from typing import Dict, Tuple

STORE: Dict[str, Tuple[bytes, object]] = {}


def put(key: str, wmap, seq) -> None:
    import os
    import tempfile

    from ppg_slam_tpu.worldmap import save_map

    fd, p = tempfile.mkstemp(suffix=".ppgmap")
    os.close(fd)
    try:
        save_map(wmap, p)
        with open(p, "rb") as f:
            STORE[key] = (f.read(), seq)
    finally:
        os.unlink(p)


def get_map(key: str):
    """Deserialize a fresh copy of a stored map, or None if absent."""
    import os
    import tempfile

    from ppg_slam_tpu.worldmap import load_map

    entry = STORE.get(key)
    if entry is None:
        return None
    data, _ = entry
    fd, p = tempfile.mkstemp(suffix=".ppgmap")
    os.close(fd)
    try:
        with open(p, "wb") as f:
            f.write(data)
        return load_map(p)
    finally:
        os.unlink(p)
