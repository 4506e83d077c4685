from .elements import (MapColine, MapEdge, MapPoint, descriptor_distance,
                       reset_element_ids)
from .frame import Frame, KeyFrame, Rig, reset_frame_ids


def reset_ids() -> None:
    """Reset ALL global id counters (full system reset; tests)."""
    reset_frame_ids()
    reset_element_ids()

from .grid import FeatureGrid, image_bounds
from .map import Map
from .serialize import load_map, save_map

__all__ = [
    "load_map",
    "save_map",
    "MapPoint",
    "MapEdge",
    "MapColine",
    "descriptor_distance",
    "Frame",
    "KeyFrame",
    "Rig",
    "FeatureGrid",
    "image_bounds",
    "Map",
]
