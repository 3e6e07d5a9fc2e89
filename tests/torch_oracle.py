"""Geometry-parameterized functional torch oracle of the reference eval
forward (reference: models/maest.py:634-933).

Shared by the tiny-geometry parity tests (test_torch_parity.py) and the
full ViT-B gate (test_torch_parity_full.py). Kept functional and
from-scratch — no reference code, just the published math.
"""

import numpy as np
import torch
import torch.nn.functional as F


def make_state(rng, cfg, scale=0.02):
    """Random torch-layout state dict for the given MAESTConfig."""
    E, NC = cfg.embed_dim, cfg.num_classes
    gf, gt = cfg.grid_size

    def t(*shape):
        return torch.from_numpy(
            rng.standard_normal(shape).astype("float32") * scale
        )

    sd = {
        "cls_token": t(1, 1, E),
        "dist_token": t(1, 1, E),
        "new_pos_embed": t(1, 2, E),
        "freq_new_pos_embed": t(1, E, gf, 1),
        "time_new_pos_embed": t(1, E, 1, gt),
        "patch_embed.proj.weight": t(E, cfg.in_chans, cfg.patch_size, cfg.patch_size),
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
    hidden = int(E * cfg.mlp_ratio)
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": 1 + t(E), f"{p}.norm1.bias": t(E),
            f"{p}.attn.qkv.weight": t(3 * E, E), f"{p}.attn.qkv.bias": t(3 * E),
            f"{p}.attn.proj.weight": t(E, E), f"{p}.attn.proj.bias": t(E),
            f"{p}.norm2.weight": 1 + t(E), f"{p}.norm2.bias": t(E),
            f"{p}.mlp.fc1.weight": t(hidden, E), f"{p}.mlp.fc1.bias": t(hidden),
            f"{p}.mlp.fc2.weight": t(E, hidden), f"{p}.mlp.fc2.bias": t(E),
        })
    return sd


def torch_forward(sd, x, cfg, transformer_block=-1, distilled_type=None):
    """Reference eval forward. x: (B, 1, F, T) numpy; returns logits
    (or (cls, dist) logits for 'separated', or the 3E embedding tap)."""
    E, H = cfg.embed_dim, cfg.num_heads
    eps = cfg.layer_norm_eps
    distilled_type = distilled_type or cfg.distilled_type
    with torch.no_grad():
        x = torch.from_numpy(x)
        x = F.conv2d(
            x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
            stride=cfg.stride,
        )  # (B, E, F', T')
        b, e, f_dim, t_dim = x.shape
        x = x + sd["time_new_pos_embed"][:, :, :, :t_dim]
        x = x + sd["freq_new_pos_embed"]
        x = x.flatten(2).transpose(1, 2)  # (B, N, E)

        cls = sd["cls_token"].expand(b, -1, -1) + sd["new_pos_embed"][:, :1]
        dist = sd["dist_token"].expand(b, -1, -1) + sd["new_pos_embed"][:, 1:]
        x = torch.cat([cls, dist, x], dim=1)

        def block(x, i):
            p = f"blocks.{i}"
            h = F.layer_norm(x, (E,), sd[f"{p}.norm1.weight"],
                             sd[f"{p}.norm1.bias"], eps)
            qkv = F.linear(h, sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"])
            B, N, _ = h.shape
            qkv = qkv.reshape(B, N, 3, H, E // H).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (E // H) ** -0.5
            attn = attn.softmax(dim=-1)
            h = (attn @ v).transpose(1, 2).reshape(B, N, E)
            h = F.linear(h, sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
            x = x + h
            h = F.layer_norm(x, (E,), sd[f"{p}.norm2.weight"],
                             sd[f"{p}.norm2.bias"], eps)
            h = F.linear(h, sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
            h = F.gelu(h)
            h = F.linear(h, sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
            return x + h

        if transformer_block != -1:
            for i in range(transformer_block + 1):
                x = block(x, i)
            return torch.cat(
                [x[:, 0], x[:, 1], x[:, 2:].mean(dim=1)], dim=1
            ).numpy()

        for i in range(cfg.depth):
            x = block(x, i)
        x = F.layer_norm(x, (E,), sd["norm.weight"], sd["norm.bias"], eps)
        cls_t, dist_t = x[:, 0], x[:, 1]
        if distilled_type == "mean":
            feats = (cls_t + dist_t) / 2
            # head norm: torch nn.LayerNorm default eps 1e-5 (no override)
            h = F.layer_norm(feats, (E,), sd["head.0.weight"],
                             sd["head.0.bias"], 1e-5)
            return F.linear(h, sd["head.1.weight"], sd["head.1.bias"]).numpy()
        if distilled_type == "separated":
            h = F.layer_norm(cls_t, (E,), sd["head.0.weight"],
                             sd["head.0.bias"], 1e-5)
            lc = F.linear(h, sd["head.1.weight"], sd["head.1.bias"]).numpy()
            ld = F.linear(dist_t, sd["head_dist.weight"],
                          sd["head_dist.bias"]).numpy()
            return lc, ld
        raise ValueError(distilled_type)
