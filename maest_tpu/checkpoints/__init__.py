from .convert import (
    adapt_pos_embeds,
    bicubic_resize_2d,
    load_safetensors,
    load_torch_checkpoint,
    merge_params,
    strip_prefix,
    torch_to_jax_params,
)

__all__ = [
    "adapt_pos_embeds",
    "bicubic_resize_2d",
    "load_safetensors",
    "load_torch_checkpoint",
    "merge_params",
    "strip_prefix",
    "torch_to_jax_params",
]
