from .mesh import (
    ensure_on_mesh,
    batch_sharding,
    make_mesh,
    param_shardings,
    param_spec,
    replicated,
    shard_params,
)

__all__ = [
    "ensure_on_mesh",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "param_spec",
    "replicated",
    "shard_params",
]
