from .mesh import (
    ensure_on_mesh,
    init_distributed,
    batch_sharding,
    make_mesh,
    param_shardings,
    param_spec,
    replicated,
    shard_params,
)
from .pipeline import (
    make_pipeline_forward,
    make_pipeline_mesh,
    make_pipeline_train_step,
    pipeline_apply,
    pipeline_trunk,
    stack_block_params,
)

__all__ = [
    "ensure_on_mesh",
    "init_distributed",
    "batch_sharding",
    "make_mesh",
    "make_pipeline_forward",
    "make_pipeline_mesh",
    "make_pipeline_train_step",
    "param_shardings",
    "param_spec",
    "pipeline_apply",
    "pipeline_trunk",
    "replicated",
    "shard_params",
    "stack_block_params",
]
