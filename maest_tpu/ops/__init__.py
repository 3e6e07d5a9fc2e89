from .augment import mixup, roll_augment, spec_augment

__all__ = ["mixup", "roll_augment", "spec_augment"]
