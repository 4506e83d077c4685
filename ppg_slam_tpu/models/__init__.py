from .ppg_net import (
    DEFAULT_WEIGHTS,
    backbone_apply,
    descriptor_apply,
    heatmap_apply,
    junction_apply,
    load_params,
    ppg_forward,
    ppg_forward_jit,
)

__all__ = [
    "DEFAULT_WEIGHTS",
    "load_params",
    "ppg_forward",
    "ppg_forward_jit",
    "backbone_apply",
    "junction_apply",
    "heatmap_apply",
    "descriptor_apply",
]
