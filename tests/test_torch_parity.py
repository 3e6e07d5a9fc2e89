"""Numeric parity vs an independent torch oracle.

Builds a tiny random MAEST state dict in torch layout, converts it with
maest_tpu.checkpoints, and compares our jitted forward against a from-scratch
functional torch implementation of the reference math
(reference: models/maest.py:634-933). This is the logit-parity gate the
reference never had (SURVEY.md §4).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from maest_tpu.checkpoints import (
    bicubic_resize_2d,
    merge_params,
    torch_to_jax_params,
)
from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params

from torch_oracle import make_state, torch_forward

E, DEPTH, HEADS, NC = 64, 2, 4, 10
CFG = MAESTConfig(
    img_size=(26, 46), patch_size=16, stride=(10, 10), in_chans=1,
    embed_dim=E, depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
    num_classes=NC, distilled=True, distilled_type="mean",
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    sd = make_state(rng, CFG, scale=0.05)
    params = merge_params(
        init_params(CFG, __import__("jax").random.PRNGKey(0)),
        torch_to_jax_params({k: v.numpy() for k, v in sd.items()}, CFG),
    )
    net = MAESTNet(CFG)
    x = rng.standard_normal((2, 1, 26, 46)).astype("float32") * 0.1
    return sd, params, net, x


def _apply(net, params, x, **kw):
    xh = jnp.asarray(x).transpose(0, 2, 3, 1)
    return net.apply({"params": params}, xh, train=False, **kw)


def test_logits_parity(setup):
    sd, params, net, x = setup
    ours = np.asarray(_apply(net, params, x)[0])
    ref = torch_forward(sd, x, CFG)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_embedding_tap_parity(setup):
    sd, params, net, x = setup
    ours = np.asarray(_apply(net, params, x, transformer_block=1)[1])
    ref = torch_forward(sd, x, CFG, transformer_block=1)
    assert ours.shape == (2, 3 * E)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_separated_heads_parity(setup):
    sd, _, _, x = setup
    cfg = CFG.replace(distilled_type="separated")
    params = merge_params(
        init_params(cfg, __import__("jax").random.PRNGKey(0)),
        torch_to_jax_params({k: v.numpy() for k, v in sd.items()}, cfg),
    )
    net2 = MAESTNet(cfg)
    lc, ld, _ = _apply(net2, params, x)
    rc, rd = torch_forward(sd, x, CFG, distilled_type="separated")
    np.testing.assert_allclose(np.asarray(lc), rc, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld), rd, rtol=2e-4, atol=2e-5)


def test_bicubic_matches_torch():
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((1, 8, 12, 24)).astype("float32")
    ours = bicubic_resize_2d(arr, 9, 47)
    ref = F.interpolate(
        torch.from_numpy(arr), size=(9, 47), mode="bicubic", align_corners=False
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grid_resize_adaptation():
    # loading a 46-frame table into a 56-frame model resizes via bicubic
    rng = np.random.default_rng(1)
    sd = {k: v.numpy() for k, v in make_state(rng, CFG, scale=0.05).items()}
    cfg2 = CFG.replace(img_size=(26, 56))
    params = torch_to_jax_params(sd, cfg2)
    assert params["time_new_pos_embed"].shape == (5, E)
    ref = F.interpolate(
        torch.from_numpy(sd["time_new_pos_embed"]), size=(1, 5),
        mode="bicubic", align_corners=False,
    ).numpy()[0, :, 0, :].T
    np.testing.assert_allclose(params["time_new_pos_embed"], ref, rtol=1e-4, atol=1e-5)


def test_imagenet_split_adaptation():
    # joint (1, 2+gs^2, E) pos_embed -> decoupled tables
    rng = np.random.default_rng(2)
    sd = {k: v.numpy() for k, v in make_state(rng, CFG, scale=0.05).items()}
    for k in ("freq_new_pos_embed", "time_new_pos_embed", "new_pos_embed"):
        sd.pop(k)
    gs = 6
    sd["pos_embed"] = rng.standard_normal((1, 2 + gs * gs, E)).astype("float32")
    params = torch_to_jax_params(sd, CFG)
    gf, gt = CFG.grid_size
    assert params["freq_new_pos_embed"].shape == (gf, E)
    assert params["time_new_pos_embed"].shape == (gt, E)
    grid = torch.from_numpy(sd["pos_embed"][0, 2:]).reshape(gs, gs, E)
    grid = grid.permute(2, 0, 1)[None]
    grid = F.interpolate(grid, size=(gf, gt), mode="bicubic", align_corners=False)
    np.testing.assert_allclose(
        params["freq_new_pos_embed"],
        grid.mean(dim=3)[0].numpy().T, rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        params["time_new_pos_embed"],
        grid.mean(dim=2)[0].numpy().T, rtol=1e-4, atol=1e-5,
    )
