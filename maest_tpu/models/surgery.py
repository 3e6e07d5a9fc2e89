"""Model surgery on (config, params) pairs.

JAX has no mutable Modules, so the reference's in-place surgeries
(reference: models/maest.py:1391-1438) become pure functions returning a new
config + param pytree:

  * ``fix_embedding_layer``   — swap the patch embedding. ``"freq_embed"``
    converts the shared conv into per-frequency-row projections initialized
    from the shared weights (reference: ``replacePatchEmbedFreq``,
    models/maest.py:334-343). The ``"overlap"`` / ``"am_keepconv"`` branches
    reference classes that do not exist in the reference either
    (models/maest.py:1395-1397) — they raise here instead of failing later.
  * ``lighten_model``         — remove / stride transformer blocks
    (reference: models/maest.py:1403-1438): ``cut_depth > 0`` keeps block 0
    plus blocks[cut_depth+1:]; ``cut_depth < 0`` keeps first + every
    ``-cut_depth``-th middle block + last; ``remove_n_blocks`` drops the
    last n blocks. Params are renumbered to ``blocks_0..new_depth-1``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .config import MAESTConfig

Params = Dict[str, object]


def per_freq_params_from_conv(params: Params, cfg: MAESTConfig
                              ) -> Tuple[Params, MAESTConfig]:
    """Convert shared-conv patch embedding into per-freq-row projections.

    Every row starts from the shared conv weights, exactly like the
    reference's ``old_proj.state_dict()`` copy (models/maest.py:295-298).
    The flattened feature order matches
    ``lax.conv_general_dilated_patches`` (channel-major, then kernel h, w).
    """
    if "patch_embed_proj" not in params:
        raise KeyError("params have no shared patch_embed_proj to convert")
    new_cfg = cfg.replace(per_freq_patch_embed=True)
    grid_f = (cfg.img_size[0] - cfg.patch_size) // cfg.stride[0] + 1

    kern = np.asarray(params["patch_embed_proj"]["kernel"])  # HWIO (P,P,C,E)
    bias = np.asarray(params["patch_embed_proj"]["bias"])  # (E,)
    p_h, p_w, c, e = kern.shape
    flat = kern.transpose(2, 0, 1, 3).reshape(c * p_h * p_w, e)  # (C*P*P, E)

    out = {k: v for k, v in params.items() if k != "patch_embed_proj"}
    out["patch_embed_freq_kernel"] = np.broadcast_to(
        flat[None], (grid_f, c * p_h * p_w, e)
    ).copy()
    out["patch_embed_freq_bias"] = np.broadcast_to(bias[None], (grid_f, e)).copy()
    return out, new_cfg


def fix_embedding_layer(params: Params, cfg: MAESTConfig, embed: str = "default"
                        ) -> Tuple[Params, MAESTConfig]:
    """Patch-embedding swap dispatch (reference: models/maest.py:1391-1400)."""
    if embed == "default":
        return params, cfg
    if embed == "freq_embed":
        return per_freq_params_from_conv(params, cfg)
    if embed in ("overlap", "am_keepconv"):
        raise NotImplementedError(
            f"embed={embed!r} references classes that are undefined in the "
            "reference implementation as well (models/maest.py:1395-1397)"
        )
    raise ValueError(f"unknown embed mode {embed!r}")


def _kept_block_order(depth: int, cut_depth: int) -> list:
    if cut_depth == 0:
        return list(range(depth))
    if cut_depth < 0:
        middle = list(range(1, depth - 1))[::-cut_depth]
        return [0] + middle + [depth - 1]
    if depth < cut_depth + 2:
        raise ValueError(
            f"cut_depth for a ViT with {depth} layers should be between 1 "
            f"and {depth - 2}"
        )
    return [0] + list(range(cut_depth + 1, depth))


def lighten_model(params: Params, cfg: MAESTConfig, *, cut_depth: int = 0,
                  remove_n_blocks: int = 0) -> Tuple[Params, MAESTConfig]:
    """Block removal / striding (reference: models/maest.py:1403-1438)."""
    keep = _kept_block_order(cfg.depth, cut_depth)
    if remove_n_blocks:
        if not 0 < remove_n_blocks < len(keep):
            # a too-large count would slice with a NEGATIVE index and
            # silently keep most blocks instead of erroring
            raise ValueError(
                f"remove_n_blocks={remove_n_blocks} out of range: "
                f"{len(keep)} blocks present"
            )
        keep = keep[: len(keep) - remove_n_blocks]
    if not keep:
        raise ValueError("surgery removed every block")

    out = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    for new_i, old_i in enumerate(keep):
        out[f"blocks_{new_i}"] = params[f"blocks_{old_i}"]
    return out, cfg.replace(depth=len(keep))
