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

E, DEPTH, HEADS, NC = 64, 2, 4, 10
CFG = MAESTConfig(
    img_size=(26, 46), patch_size=16, stride=(10, 10), in_chans=1,
    embed_dim=E, depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
    num_classes=NC, distilled=True, distilled_type="mean",
)


def make_state(rng):
    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype("float32") * 0.05)

    sd = {
        "cls_token": t(1, 1, E),
        "dist_token": t(1, 1, E),
        "new_pos_embed": t(1, 2, E),
        "freq_new_pos_embed": t(1, E, CFG.grid_size[0], 1),
        "time_new_pos_embed": t(1, E, 1, CFG.grid_size[1]),
        "patch_embed.proj.weight": t(E, 1, 16, 16),
        "patch_embed.proj.bias": t(E),
        "norm.weight": 1 + t(E),
        "norm.bias": t(E),
        "head.0.weight": 1 + t(E),
        "head.0.bias": t(E),
        "head.1.weight": t(NC, E),
        "head.1.bias": t(NC),
        "head_dist.weight": t(NC, E),
        "head_dist.bias": t(NC),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": 1 + t(E), f"{p}.norm1.bias": t(E),
            f"{p}.attn.qkv.weight": t(3 * E, E), f"{p}.attn.qkv.bias": t(3 * E),
            f"{p}.attn.proj.weight": t(E, E), f"{p}.attn.proj.bias": t(E),
            f"{p}.norm2.weight": 1 + t(E), f"{p}.norm2.bias": t(E),
            f"{p}.mlp.fc1.weight": t(4 * E, E), f"{p}.mlp.fc1.bias": t(4 * E),
            f"{p}.mlp.fc2.weight": t(E, 4 * E), f"{p}.mlp.fc2.bias": t(E),
        })
    return sd


def torch_forward(sd, x, transformer_block=-1, distilled_type="mean"):
    """Functional torch re-statement of the reference eval forward."""
    x = torch.from_numpy(x)  # (B, 1, F, T)
    x = F.conv2d(sd["patch_embed.proj.weight"], None) if False else F.conv2d(
        x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=(10, 10)
    )  # (B, E, F', T')
    b, e, f_dim, t_dim = x.shape
    time_pos = sd["time_new_pos_embed"][:, :, :, :t_dim]
    x = x + time_pos
    x = x + sd["freq_new_pos_embed"]
    x = x.flatten(2).transpose(1, 2)  # (B, N, E)

    cls = sd["cls_token"].expand(b, -1, -1) + sd["new_pos_embed"][:, :1]
    dist = sd["dist_token"].expand(b, -1, -1) + sd["new_pos_embed"][:, 1:]
    x = torch.cat([cls, dist, x], dim=1)

    def block(x, i, return_self_attention=False):
        p = f"blocks.{i}"
        h = F.layer_norm(x, (E,), sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"], 1e-6)
        qkv = F.linear(h, sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"])
        B, N, _ = h.shape
        qkv = qkv.reshape(B, N, 3, HEADS, E // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (E // HEADS) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, E)
        h = F.linear(h, sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
        if return_self_attention:
            return h
        x = x + h
        h = F.layer_norm(x, (E,), sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"], 1e-6)
        h = F.linear(h, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
        return x + h

    if transformer_block == -1:
        for i in range(DEPTH):
            x = block(x, i)
        x = F.layer_norm(x, (E,), sd["norm.weight"], sd["norm.bias"], 1e-6)
        cls_t, dist_t = x[:, 0], x[:, 1]
        if distilled_type == "mean":
            feats = (cls_t + dist_t) / 2
            h = F.layer_norm(feats, (E,), sd["head.0.weight"], sd["head.0.bias"], 1e-5)
            return F.linear(h, sd["head.1.weight"], sd["head.1.bias"]).numpy()
        if distilled_type == "separated":
            h = F.layer_norm(cls_t, (E,), sd["head.0.weight"], sd["head.0.bias"], 1e-5)
            lc = F.linear(h, sd["head.1.weight"], sd["head.1.bias"]).numpy()
            ld = F.linear(dist_t, sd["head_dist.weight"], sd["head_dist.bias"]).numpy()
            return lc, ld
    else:
        for i in range(DEPTH):
            if i == transformer_block:
                x = block(x, i)
                break
            x = block(x, i)
        return torch.cat(
            [x[:, 0], x[:, 1], x[:, 2:].mean(dim=1)], dim=1
        ).numpy()


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    sd = make_state(rng)
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
    ref = torch_forward(sd, x)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_embedding_tap_parity(setup):
    sd, params, net, x = setup
    ours = np.asarray(_apply(net, params, x, transformer_block=1)[1])
    ref = torch_forward(sd, x, transformer_block=1)
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
    rc, rd = torch_forward(sd, x, distilled_type="separated")
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
    sd = {k: v.numpy() for k, v in make_state(rng).items()}
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
    sd = {k: v.numpy() for k, v in make_state(rng).items()}
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
