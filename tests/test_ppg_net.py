"""Golden tests: JAX PPG nets vs the reference TorchScript modules (CPU).

This is minimum-slice gate #1's first half (SURVEY.md §7 phase 2): identical
net outputs. The TorchScript modules are run through torch (CPU) as the
behavioral oracle; torch is test-only, never a runtime dependency.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ppg_slam_tpu.models import load_params, ppg_forward

NET_DIR = "/root/reference/net"

torch = pytest.importorskip("torch")

# Default lane (was slow-lane in r2): the TorchScript golden parity is the
# single most load-bearing fidelity check and costs ~10 s — it must run in
# every verification window, not opt-in.
pytestmark = [
    pytest.mark.skipif(
        not os.path.exists(os.path.join(NET_DIR, "Backbone.pt")),
        reason="reference nets not available",
    ),
]


@pytest.fixture(scope="module")
def torch_nets():
    nets = {}
    for n in ("Backbone", "PointHeatmap", "EdgeHeatmap", "Descriptor"):
        nets[n] = torch.jit.load(os.path.join(NET_DIR, f"{n}.pt"),
                                 map_location="cpu").eval()
    return nets


@pytest.fixture(scope="module")
def params():
    return load_params()


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(7)
    # structured image: gradients + random texture, 160x128 (multiple of 8)
    h, w = 128, 160
    img = rng.rand(h, w).astype(np.float32) * 0.5
    yy, xx = np.mgrid[0:h, 0:w]
    img += 0.3 * np.sin(xx / 7.0) * np.cos(yy / 9.0) + 0.2
    return np.clip(img, 0, 1).astype(np.float32)


def test_full_forward_matches_torchscript(torch_nets, params, image):
    h, w = image.shape
    with torch.no_grad():
        t_in = torch.from_numpy(image).reshape(1, 1, h, w)
        feat = torch_nets["Backbone"](t_in)
        junc = torch_nets["PointHeatmap"](feat)
        heat = torch_nets["EdgeHeatmap"](feat)
        desc = torch_nets["Descriptor"](feat)
        # consumer-side decodes (PPGExtractor.cpp:161-163, :242)
        junc_prob = torch.pixel_shuffle(
            torch.softmax(junc, 1).narrow(1, 0, 64), 8
        )[0, 0].numpy()
        heat_score = torch.softmax(heat, 1).select(1, 1)[0].numpy()
        desc_np = desc[0].permute(1, 2, 0).numpy()
        feat_np = feat[0].permute(1, 2, 0).numpy()

    out = ppg_forward(params, jnp.asarray(image[None, :, :, None]))
    from ppg_slam_tpu.models import backbone_apply

    feat_jax = np.asarray(backbone_apply(params, jnp.asarray(image[None, :, :, None])))[0]
    np.testing.assert_allclose(feat_jax, feat_np, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["junc_prob"])[0], junc_prob, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out["heat"])[0], heat_score, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["desc"])[0], desc_np, atol=1e-3,
                               rtol=1e-3)


def test_forward_shapes(params):
    img = jnp.zeros((1, 480, 752, 1), jnp.float32)
    out = ppg_forward(params, img)
    assert out["junc_prob"].shape == (1, 480, 752)
    assert out["heat"].shape == (1, 480, 752)
    assert out["desc"].shape == (1, 60, 94, 256)
