"""The PPG front-end CNNs as one fused, jittable JAX model.

Re-implements the four reference TorchScript nets (SURVEY.md §2.1;
/root/reference/feature/src/PPGExtractor.cpp:149-156 runs the shared VGG
backbone once and feeds three heads) as a single forward pass in NHWC layout
(TPU-native: convs tile onto the MXU, elementwise ops fuse into them).

Heads and their decodes (the consumer-side ops live in ppg_slam_tpu.ops):
  * junction: convPa(3x3,128->256)+ReLU, convPb(1x1,256->65); consumer does
    softmax(channel) then pixel-shuffle(64ch, r=8) -> full-res junction prob
    (PPGExtractor.cpp:161-163).
  * heatmap: 3x [conv3x3+BN+ReLU -> pixel-shuffle(2)] + 1x1 conv(4->2);
    consumer does softmax(channel)[..., 1] -> full-res line heat
    (PPGExtractor.cpp:242).
  * descriptor: convDa(3x3,128->256)+ReLU, convDb(1x1,256->256) -> semi-dense
    256-d descriptors at 1/8 resolution (PPGExtractor.cpp:515-538).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # torch BatchNorm2d default

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "ppg_weights.npz",
)


def load_params(path: str = DEFAULT_WEIGHTS) -> Dict[str, Any]:
    """Load the converted weight file into a nested dict pytree."""
    flat = np.load(path)
    params: Dict[str, Any] = {}
    for k in flat.files:
        parts = k.split("/")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(flat[k])
    return params


def _conv(x, w, b, *, same: bool = True, dtype=None):
    """NHWC conv with f32 accumulation (MXU: preferred_element_type).

    dtype=jnp.bfloat16 runs the MXU in bf16 (2x flops on TPU) with f32
    accumulation, and STORES intermediate activations in bf16 (half the HBM
    traffic of the full-res trunk) — the standard TPU serving configuration.
    Head outputs come back in f32 (the accumulator dtype)."""
    pad = "SAME" if same else "VALID"
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b


def _act(x, dtype):
    """Inter-layer activation storage: bf16 when serving in bf16."""
    y = jax.nn.relu(x)
    return y if dtype is None else y.astype(dtype)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _bn(x, p, prefix):
    gamma, beta = p[f"bn_gamma"], p[f"bn_beta"]
    mean, var = p[f"bn_mean"], p[f"bn_var"]
    inv = jax.lax.rsqrt(var + BN_EPS)
    return (x - mean) * inv * gamma + beta


def _pixel_shuffle(x, r: int):
    """torch.pixel_shuffle semantics in NHWC: (N,H,W,C*r^2) -> (N,H*r,W*r,C)
    with input channel index c*r^2 + i*r + j."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return x.reshape(n, h * r, w * r, c)


def backbone_apply(params, x, dtype=None):
    """SuperpointBackbone (net/Backbone.pt): VGG-ish, 3 maxpools -> 1/8 res."""
    p = params["backbone"]
    x = _act(_conv(x, p["conv1a"]["w"], p["conv1a"]["b"], dtype=dtype), dtype)
    x = _act(_conv(x, p["conv1b"]["w"], p["conv1b"]["b"], dtype=dtype), dtype)
    x = _maxpool2(x)
    x = _act(_conv(x, p["conv2a"]["w"], p["conv2a"]["b"], dtype=dtype), dtype)
    x = _act(_conv(x, p["conv2b"]["w"], p["conv2b"]["b"], dtype=dtype), dtype)
    x = _maxpool2(x)
    x = _act(_conv(x, p["conv3a"]["w"], p["conv3a"]["b"], dtype=dtype), dtype)
    x = _act(_conv(x, p["conv3b"]["w"], p["conv3b"]["b"], dtype=dtype), dtype)
    x = _maxpool2(x)
    x = _act(_conv(x, p["conv4a"]["w"], p["conv4a"]["b"], dtype=dtype), dtype)
    x = _act(_conv(x, p["conv4b"]["w"], p["conv4b"]["b"], dtype=dtype), dtype)
    return x


def junction_apply(params, feat, dtype=None):
    p = params["junction"]
    x = _act(_conv(feat, p["convPa"]["w"], p["convPa"]["b"],
                   dtype=dtype), dtype)
    return _conv(x, p["convPb"]["w"], p["convPb"]["b"],
                 dtype=dtype)  # (N, H/8, W/8, 65)


def descriptor_apply(params, feat, dtype=None):
    p = params["descriptor"]
    x = _act(_conv(feat, p["convDa"]["w"], p["convDa"]["b"],
                   dtype=dtype), dtype)
    return _conv(x, p["convDb"]["w"], p["convDb"]["b"],
                 dtype=dtype)  # (N, H/8, W/8, 256)


def heatmap_apply(params, feat, dtype=None):
    p = params["heatmap"]
    x = feat
    for blk in range(3):
        bp = p[f"block{blk}"]
        x = _act(_bn(_conv(x, bp["w"], bp["b"], dtype=dtype), bp, blk), dtype)
        x = _pixel_shuffle(x, 2)
    return _conv(x, p["final"]["w"], p["final"]["b"],
                 dtype=dtype)  # (N, H, W, 2)


def ppg_forward(params, image, dtype=None):
    """Full fused forward. image: (N, H, W, 1) float32 in [0, 1].

    dtype=jnp.bfloat16 runs all conv matmuls in bf16 with f32 accumulation
    (the TPU serving configuration; see _conv).

    Returns dict with:
      junc_prob: (N, H, W) full-res junction probability (softmax + shuffle)
      heat:      (N, H, W) full-res line heat (softmax channel 1)
      desc:      (N, H/8, W/8, 256) raw semi-dense descriptors
    """
    feat = backbone_apply(params, image, dtype=dtype)
    junc_logits = junction_apply(params, feat, dtype=dtype)  # 65 ch at 1/8
    heat_logits = heatmap_apply(params, feat, dtype=dtype)  # 2 ch full res
    desc = descriptor_apply(params, feat, dtype=dtype)

    junc_norm = jax.nn.softmax(junc_logits, axis=-1)
    junc_prob = _pixel_shuffle(junc_norm[..., :64], 8)[..., 0]
    heat = jax.nn.softmax(heat_logits, axis=-1)[..., 1]
    return {"junc_prob": junc_prob, "heat": heat, "desc": desc}


@functools.partial(jax.jit, static_argnames=())
def ppg_forward_jit(params, image):
    return ppg_forward(params, image)
