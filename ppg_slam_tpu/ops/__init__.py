from .descriptors import descriptor_distance_matrix, sample_descriptors
from .heatmap import bilinear_sample, refine_heatmap, remap_heatmap
from .lines import pair_geometry, pair_probe_mask, validate_edges
from .nms import nms_keypoints

__all__ = [
    "nms_keypoints",
    "refine_heatmap",
    "remap_heatmap",
    "bilinear_sample",
    "pair_probe_mask",
    "validate_edges",
    "pair_geometry",
    "sample_descriptors",
    "descriptor_distance_matrix",
]
