"""Shared pieces between tests/test_multiprocess.py (single-process
references, computed inside the pytest process) and tests/multiproc_worker.py
(the real multi-process runs). Import-safe: no jax config side effects.
"""

from __future__ import annotations

import numpy as np

N_STEPS = 3
BATCH_N = 8
STEP_KEY = 7


def tiny_cfg():
    from maest_tpu.models.config import MAESTConfig

    return MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10),
        embed_dim=128, depth=2, num_heads=4, num_classes=16,
        distilled=True,
    )


def global_batch():
    """The synthetic global batch every participant regenerates (seeded)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH_N, 26, 46)).astype(np.float32)
    y = (rng.random((BATCH_N, 16)) > 0.8).astype(np.float32)
    return x, y


def build_step(mesh, fsdp: bool):
    """Construct (step_fn, initial_state) identically everywhere.

    TP needs no flag here: ``shard_params`` defaults to Megatron
    ``model``-axis specs, which are no-ops on a model-axis-of-1 (DP/FSDP)
    mesh and split qkv/fc1 when the caller passes a model-parallel mesh."""
    import jax
    import jax.numpy as jnp

    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.parallel.mesh import ensure_on_mesh, shard_params
    from maest_tpu.train.state import TrainState, make_optimizer
    from maest_tpu.train.steps import AugmentConfig, make_train_step

    cfg = tiny_cfg()
    net = MAESTNet(cfg, dtype=jnp.float32, mesh=mesh)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-3, adamw=True)
    step_fn = make_train_step(net, tx, AugmentConfig(), donate=False)
    with mesh:
        params = shard_params(params, mesh, fsdp=fsdp)
        state = ensure_on_mesh(TrainState.create(params, tx), mesh)
    return step_fn, state


def build_step_pp(mesh, fsdp: bool):
    """Pipeline-parallel twin of ``build_step`` (GPipe over the mesh's
    ``pipe`` axis, 1 block per stage at depth 2, 2 microbatches). Params
    stay replicated (or ZeRO-3 data-sharded under fsdp) exactly as the
    Trainer stores them."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.parallel.mesh import shard_params
    from maest_tpu.parallel.pipeline import make_pipeline_train_step
    from maest_tpu.train.state import TrainState, make_optimizer
    from maest_tpu.train.steps import AugmentConfig

    cfg = tiny_cfg()
    net = MAESTNet(cfg, dtype=jnp.float32)  # stage compute is manual
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-3, adamw=True)
    step_fn = make_pipeline_train_step(
        net, tx, AugmentConfig(), mesh=mesh, num_microbatches=2,
        donate=False, fsdp=fsdp,
    )
    with mesh:
        if fsdp:
            params = shard_params(params, mesh, fsdp=True,
                                  tensor_parallel=False)
        else:
            params = jax.device_put(params, NamedSharding(mesh, P()))
        state = TrainState.create(params, tx)
    return step_fn, state


def replicate_host(tree, mesh):
    """Fetch a (possibly sharded) pytree to host as full numpy arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))(tree)
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), rep)


def flatten_params(params) -> dict:
    import flax

    return {
        "/".join(map(str, path)): leaf
        for path, leaf in flax.traverse_util.flatten_dict(params).items()
    }


def fit_cfg(corpus: str, root_dir: str, ckpt_path: str | None = None) -> dict:
    """The tiny-but-real training config used by the multi-process fit
    scenarios (and by the single-process restore check, which must build a
    bit-identical trainer)."""
    from maest_tpu.configs import build_experiment_config

    overrides = [
        f"datamodule.base_dir={corpus}",
        f"datamodule.groundtruth_train={corpus}/gt.pk",
        f"datamodule.groundtruth_val={corpus}/gt.pk",
        "datamodule.clip_length=1",
        "datamodule.batch_size_train=2",
        "datamodule.batch_size_test=3",
        "datamodule.num_workers=2",
        "datamodule.sampler.epoch_len=16",
        "maest.n_classes=4",
        "maest.input_t=62",
        "maest.embed_dim=64",
        "maest.depth=2",
        "maest.num_heads=4",
        "trainer.max_epochs=2",
        "trainer.devices=4",
        "trainer.precision=fp32",
        "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=2",
        "module.optimizer.warm_up_len=1",
        f"trainer.default_root_dir={root_dir}",
    ]
    if ckpt_path:
        overrides.append(f"ckpt_path={ckpt_path}")
    return build_experiment_config(presets=[], overrides=overrides)
