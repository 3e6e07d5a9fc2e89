from .convert import (
    adapt_pos_embeds,
    bicubic_resize_2d,
    load_safetensors,
    load_torch_checkpoint,
    merge_params,
    strip_prefix,
    torch_to_jax_params,
)
from .fetch import FetchError, fetch_checkpoint

__all__ = [
    "FetchError",
    "adapt_pos_embeds",
    "bicubic_resize_2d",
    "fetch_checkpoint",
    "load_safetensors",
    "load_torch_checkpoint",
    "merge_params",
    "strip_prefix",
    "torch_to_jax_params",
]
