from .elements import MapColine, MapEdge, MapPoint, descriptor_distance
from .frame import Frame, KeyFrame, Rig
from .grid import FeatureGrid, image_bounds
from .map import Map

__all__ = [
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
