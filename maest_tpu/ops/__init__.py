"""TPU kernels and on-device data ops."""

from .attention import (  # noqa: F401
    attention_reference,
    flash_attention,
    flash_attention_sharded,
)
from .augment import mixup, roll_augment, spec_augment  # noqa: F401
from .mel_kernel import fused_logmel_from_frames  # noqa: F401

__all__ = [
    "attention_reference",
    "flash_attention",
    "flash_attention_sharded",
    "fused_logmel_from_frames",
    "mixup",
    "roll_augment",
    "spec_augment",
]
