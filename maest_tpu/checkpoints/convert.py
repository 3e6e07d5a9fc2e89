"""Checkpoint conversion: torch/HF state dicts -> JAX param pytrees.

Handles all load paths of the reference factory
(reference: models/maest.py:1051-1118, 1554-1567):

  * Lightning ``.ckpt`` files from the GitHub releases (keys prefixed
    ``net.`` / ``net_swa.``), selected with ``swa_weights``;
  * raw MAEST-named state dicts / ``.safetensors``;
  * ImageNet/DeiT checkpoints with a joint ``pos_embed`` -> split into
    decoupled time/freq tables (``adapt_image_pos_embed_to_passt``,
    reference: models/maest.py:1008-1034);
  * grid-size changes -> bicubic resize of the time/freq tables
    (``adapt_passt_timefreq_embed``, reference: models/maest.py:1037-1048).

All conversion runs host-side in numpy (float32); bicubic interpolation
reimplements torch ``F.interpolate(mode="bicubic", align_corners=False)``
(A = -0.75 Keys kernel, half-pixel centers, edge clamping) so adapted
checkpoints match the reference bit-for-bit within float tolerance.
"""

from __future__ import annotations

import math
import re
from typing import Dict, Mapping

import numpy as np

from ..models.config import MAESTConfig

Params = Dict[str, object]


# ---------------------------------------------------------------------------
# torch-equivalent bicubic interpolation (host-side)
# ---------------------------------------------------------------------------

def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _cubic_weights_1d(in_size: int, out_size: int):
    """Sample positions + 4-tap weights for one axis (align_corners=False)."""
    if in_size == out_size:
        return None
    scale = in_size / out_size
    out = np.arange(out_size, dtype=np.float64)
    center = (out + 0.5) * scale - 0.5
    base = np.floor(center).astype(np.int64)
    frac = center - base
    # taps at base-1 .. base+2
    taps = base[:, None] + np.arange(-1, 3)[None, :]
    dist = taps - center[:, None]
    w = _cubic_kernel(dist)
    w = w / w.sum(axis=1, keepdims=True)
    taps = np.clip(taps, 0, in_size - 1)
    return taps, w


def bicubic_resize_2d(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bicubic resize of (..., H, W), matching torch bicubic align_corners=False."""
    return _bicubic_impl(np.asarray(arr, dtype=np.float64), out_h, out_w)


def _bicubic_impl(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    out = arr
    hw = _cubic_weights_1d(arr.shape[-2], out_h)
    if hw is not None:
        taps, wts = hw  # (out_h, 4)
        gathered = out[..., taps, :]  # (..., out_h, 4, W)
        out = (gathered * wts[..., None]).sum(axis=-2)
    ww = _cubic_weights_1d(arr.shape[-1], out_w)
    if ww is not None:
        taps, wts = ww  # (out_w, 4)
        gathered = out[..., taps]  # (..., H', out_w, 4)
        out = (gathered * wts).sum(axis=-1)
    return out


# ---------------------------------------------------------------------------
# state-dict plumbing
# ---------------------------------------------------------------------------

def strip_prefix(state: Mapping[str, np.ndarray], swa_weights: bool = True
                 ) -> Dict[str, np.ndarray]:
    """Select SWA or live weights from a Lightning checkpoint state dict.

    Mirrors the reference's prefix strip (models/maest.py:1554-1562): with
    ``swa_weights`` the ``net_swa.`` prefix is removed (so SWA weights shadow
    the ``net.``-prefixed live weights); otherwise keys are kept as-is minus
    the ``net.`` prefix.
    """
    out: Dict[str, np.ndarray] = {}
    if swa_weights and any(k.startswith("net_swa.") for k in state):
        # live weights first, SWA overrides
        for k, v in state.items():
            if k.startswith("net."):
                out[k[len("net."):]] = v
        for k, v in state.items():
            if k.startswith("net_swa."):
                out[k[len("net_swa."):]] = v
        return out
    for k, v in state.items():
        if k.startswith("net."):
            out[k[len("net."):]] = v
        elif not k.startswith("net_swa."):
            out[k] = v
    return out


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:  # torch tensor
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def adapt_pos_embeds(state: Dict[str, np.ndarray], cfg: MAESTConfig
                     ) -> Dict[str, np.ndarray]:
    """Positional-embedding adaptation (reference: models/maest.py:1051-1102)."""
    grid_f, grid_t = cfg.grid_size
    if "time_new_pos_embed" not in state and "pos_embed" in state:
        # ImageNet-style joint pos embed -> decoupled tables
        posemb = np.asarray(state.pop("pos_embed"), dtype=np.float64)  # (1, N, E)
        ntok = cfg.num_tokens
        posemb_tok, posemb_grid = posemb[:, :ntok], posemb[0, ntok:]
        gs_old = int(math.sqrt(len(posemb_grid)))
        grid = posemb_grid.reshape(gs_old, gs_old, -1).transpose(2, 0, 1)  # (E,H,W)
        grid = _bicubic_impl(grid, grid_f, grid_t)  # (E, grid_f, grid_t)
        state["new_pos_embed"] = posemb_tok.astype(np.float32)
        state["freq_new_pos_embed"] = grid.mean(axis=2, keepdims=True)[None].astype(
            np.float32
        )  # (1,E,F,1)
        state["time_new_pos_embed"] = grid.mean(axis=1, keepdims=True)[None].astype(
            np.float32
        )  # (1,E,1,T)
    elif "time_new_pos_embed" in state:
        freq = np.asarray(state["freq_new_pos_embed"], dtype=np.float64)  # (1,E,F,1)
        time = np.asarray(state["time_new_pos_embed"], dtype=np.float64)  # (1,E,1,T)
        f_old, t_old = freq.shape[2], time.shape[3]
        if f_old != grid_f or t_old != grid_t:
            state["freq_new_pos_embed"] = _bicubic_impl(freq, grid_f, 1).astype(
                np.float32
            )
            state["time_new_pos_embed"] = _bicubic_impl(time, 1, grid_t).astype(
                np.float32
            )
    return state


_BLOCK_RE = re.compile(r"^blocks\.(\d+)\.(.+)$")


def torch_to_jax_params(
    state: Mapping[str, object],
    cfg: MAESTConfig,
    *,
    discard_head: bool = False,
    strict: bool = False,
) -> Params:
    """Map a MAEST torch state dict to the MAESTNet flax param tree.

    Linear weights are transposed (out,in)->(in,out); the patch-embed conv
    kernel goes OIHW->HWIO; pos-embed tables are squeezed to 2-D.
    """
    state = {k: _to_numpy(v) for k, v in state.items()}
    state = adapt_pos_embeds(state, cfg)

    params: Params = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return state[key].astype(np.float32)

    def dense(dst: dict, prefix: str):
        dst["kernel"] = take(prefix + ".weight").T
        if prefix + ".bias" in state:
            dst["bias"] = take(prefix + ".bias")

    def layernorm(dst: dict, prefix: str):
        dst["scale"] = take(prefix + ".weight")
        dst["bias"] = take(prefix + ".bias")

    # tokens & pos embeds
    params["cls_token"] = take("cls_token").reshape(1, cfg.embed_dim)
    if cfg.distilled and "dist_token" in state:
        params["dist_token"] = take("dist_token").reshape(1, cfg.embed_dim)
    params["new_pos_embed"] = take("new_pos_embed").reshape(
        cfg.num_tokens, cfg.embed_dim
    )
    params["freq_new_pos_embed"] = (
        take("freq_new_pos_embed").reshape(cfg.embed_dim, -1).T
    )  # (F, E)
    params["time_new_pos_embed"] = (
        take("time_new_pos_embed").reshape(cfg.embed_dim, -1).T
    )  # (T, E)

    # patch embed conv: OIHW -> HWIO
    w = take("patch_embed.proj.weight")
    if w.ndim < 4:  # legacy linear patchify (reference: models/maest.py:1104-1108)
        w = w.reshape(cfg.embed_dim, -1, cfg.patch_size, cfg.patch_size)
    params["patch_embed_proj"] = {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": take("patch_embed.proj.bias"),
    }

    # blocks
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blk: dict = {"norm1": {}, "norm2": {}, "attn": {"qkv": {}, "proj": {}},
                     "mlp": {"fc1": {}, "fc2": {}}}
        layernorm(blk["norm1"], f"{p}.norm1")
        layernorm(blk["norm2"], f"{p}.norm2")
        dense(blk["attn"]["qkv"], f"{p}.attn.qkv")
        dense(blk["attn"]["proj"], f"{p}.attn.proj")
        dense(blk["mlp"]["fc1"], f"{p}.mlp.fc1")
        dense(blk["mlp"]["fc2"], f"{p}.mlp.fc2")
        params[f"blocks_{i}"] = blk

    params["norm"] = {}
    layernorm(params["norm"], "norm")

    # heads: torch head = Sequential(LayerNorm, Linear) -> head.0 / head.1
    if not discard_head and "head.1.weight" in state:
        head_cls = state["head.1.weight"].shape[0]
        if head_cls == cfg.num_classes:
            params["head_norm"] = {}
            layernorm(params["head_norm"], "head.0")
            params["head_linear"] = {}
            dense(params["head_linear"], "head.1")
            if cfg.distilled and "head_dist.weight" in state:
                params["head_dist"] = {}
                dense(params["head_dist"], "head_dist")
    if discard_head:
        for k in list(state):
            if "head" in k:
                consumed.add(k)

    if strict:
        ignorable = {k for k in state if k.startswith("melspectrogram")}
        ignorable |= {k for k in state if k.startswith("pre_logits")}
        leftover = set(state) - consumed - ignorable
        # heads may legitimately be skipped on class-count mismatch
        leftover = {k for k in leftover if "head" not in k}
        if leftover:
            raise KeyError(f"unconsumed checkpoint keys: {sorted(leftover)}")

    if cfg.per_freq_patch_embed:
        # checkpoints store the shared conv; expand it into the per-freq-row
        # projections exactly like the reference's load-time surgery
        # (models/maest.py:295-298) — without this, merge_params would
        # silently keep the RANDOM per-freq kernels while every other
        # weight loads, and the model would run producing garbage
        from ..models.surgery import per_freq_params_from_conv

        params, _ = per_freq_params_from_conv(params, cfg)

    return params


def merge_params(init: Params, loaded: Params) -> Params:
    """Overlay loaded params on a freshly-initialized tree (strict=False load:
    missing keys keep their initialization, mirroring the reference's
    ``load_state_dict(strict=False)``, models/maest.py:1567)."""
    out: Params = {}
    for k, v in init.items():
        if k in loaded:
            if isinstance(v, dict):
                out[k] = merge_params(v, loaded[k])  # type: ignore[arg-type]
            else:
                lv = np.asarray(loaded[k])
                if lv.shape != np.shape(v):
                    raise ValueError(f"shape mismatch for {k}: {lv.shape} vs {np.shape(v)}")
                out[k] = lv
        else:
            out[k] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.ckpt``/``.pt`` file into a numpy state dict."""
    import torch

    try:
        # The restricted unpickler: checkpoint files can arrive via
        # auto-download (checkpoints/fetch.py), and a full unpickle executes
        # arbitrary code. Plain state-dict and DeiT release files load fine
        # this way; only Lightning ckpts carrying exotic hparams objects
        # need the legacy loader — which is EXPLICIT OPT-IN: an automatic
        # fallback would hand any file that fails the restricted loader
        # straight to the unsafe one, making the protection worthless.
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as err:
        import os

        if os.environ.get("MAEST_TPU_UNSAFE_LOAD") != "1":
            raise ValueError(
                f"restricted (weights_only) torch.load failed for {path}: "
                f"{err}\nA full unpickle executes arbitrary code from the "
                "file. If you trust this checkpoint (e.g. a Lightning ckpt "
                "with custom hparams classes), set MAEST_TPU_UNSAFE_LOAD=1 "
                "to allow the legacy loader."
            ) from err
        import logging

        logging.getLogger(__name__).warning(
            "weights_only torch.load failed for %s (%s); MAEST_TPU_UNSAFE_"
            "LOAD=1 set — falling back to the full unpickler", path, err)
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if (isinstance(obj, dict) and "model" in obj
            and not torch_is_tensor(obj["model"])):
        # deit release format {"model": state_dict}
        inner = obj["model"]
        if isinstance(inner, dict):
            obj = inner
    return {k: _to_numpy(v) for k, v in obj.items()}


def torch_is_tensor(v) -> bool:
    return hasattr(v, "detach") and hasattr(v, "cpu")


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)
