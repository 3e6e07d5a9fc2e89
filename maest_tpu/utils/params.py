"""Parameter-count utilities (reference: helpers/models_size.py:1-35)."""

from __future__ import annotations

import jax
import numpy as np


def count_params(params) -> int:
    """Total parameter count of a pytree."""
    return int(sum(np.prod(np.shape(p)) for p in jax.tree_util.tree_leaves(params)))


def count_non_zero_params(params) -> dict:
    """Total vs non-zero parameter counts (sparsity report)."""
    total = 0
    nonzero = 0
    for leaf in jax.tree_util.tree_leaves(params):
        arr = np.asarray(leaf)
        total += arr.size
        nonzero += int(np.count_nonzero(arr))
    return {
        "total": total,
        "non_zero": nonzero,
        "sparsity": (1.0 - nonzero / total) if total else 0.0,
    }
