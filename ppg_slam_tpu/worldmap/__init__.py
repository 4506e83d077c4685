from .elements import MapColine, MapEdge, MapPoint, descriptor_distance
from .frame import Frame, KeyFrame, Rig
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
