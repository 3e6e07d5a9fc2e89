"""GPipe pipeline parallelism on the virtual 8-device CPU mesh.

Beyond the reference (DDP only, ex_maest.py:57): the trunk is split into
contiguous stage groups over a ``pipe`` mesh axis and microbatches stream
through via ppermute (maest_tpu/parallel/pipeline.py). The pipelined
programs must be numerically EQUIVALENT to the sequential ones, not merely
runnable — every test here compares against the unpipelined path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.parallel.mesh import make_mesh
from maest_tpu.parallel.pipeline import (
    make_pipeline_forward,
    make_pipeline_mesh,
    make_pipeline_train_step,
    stack_block_params,
)
from maest_tpu.train.state import TrainState, make_optimizer
from maest_tpu.train.steps import AugmentConfig, make_train_step

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,
]


def _cfg(**kw):
    base = dict(
        img_size=(26, 46), patch_size=16, stride=(10, 10),
        embed_dim=64, depth=4, num_heads=4, num_classes=8, distilled=True,
    )
    base.update(kw)
    return MAESTConfig(**base)


def _batch(n=16, classes=8):
    rng = np.random.default_rng(0)
    return {
        "x": rng.standard_normal((n, 26, 46)).astype(np.float32),
        "y": (rng.random((n, classes)) > 0.8).astype(np.float32),
    }


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 1), (2, 4)])
def test_pipeline_forward_matches_sequential(stages, microbatches):
    cfg = _cfg()
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, 26, 46, 1)), jnp.float32
    )
    ref_logits, ref_feats = net.apply({"params": params}, x, train=False)

    mesh = make_pipeline_mesh(8, num_stages=stages)
    fwd = make_pipeline_forward(net, mesh, num_microbatches=microbatches)
    pp_logits, pp_feats = fwd(params, x)

    np.testing.assert_allclose(np.asarray(pp_logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pp_feats), np.asarray(ref_feats),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("stages,tp,microbatches", [(2, 2, 2), (2, 4, 1),
                                                    (4, 2, 1)])
def test_pipeline_tp_forward_matches_sequential(stages, tp, microbatches):
    """3-D dp x pp x tp: Megatron TP inside each pipeline stage must
    reproduce the sequential forward (up to fp32 partial-sum
    reassociation from the head/hidden-split matmuls)."""
    cfg = _cfg()
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 26, 46, 1)), jnp.float32
    )
    ref_logits, ref_feats = net.apply({"params": params}, x, train=False)

    mesh = make_pipeline_mesh(8, num_stages=stages, model_parallel=tp)
    fwd = make_pipeline_forward(net, mesh, num_microbatches=microbatches)
    pp_logits, pp_feats = fwd(params, x)

    np.testing.assert_allclose(np.asarray(pp_logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pp_feats), np.asarray(ref_feats),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_tp_train_step_matches_dp():
    """One dp x pp x tp train step must match the plain DP step: same loss
    and the same updated params (tolerances admit fp32 reassociation of
    the TP partial sums through AdamW)."""
    cfg = _cfg(s_patchout_t=1)
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    aug = AugmentConfig(time_masks=4, freq_masks=2)
    batch = _batch()

    mesh_dp = make_mesh(8, model_parallel=1)
    step_dp = make_train_step(net, tx, aug, donate=False)
    with mesh_dp:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh_dp, P("data")))
             for k, v in batch.items()}
        st_dp, m_dp = step_dp(st, b, jax.random.PRNGKey(42))

    mesh_3d = make_pipeline_mesh(8, num_stages=2, model_parallel=2)
    step_3d = make_pipeline_train_step(
        net, tx, aug, mesh=mesh_3d, num_microbatches=2, donate=False
    )
    with mesh_3d:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh_3d, P("data")))
             for k, v in batch.items()}
        st_3d, m_3d = step_3d(st, b, jax.random.PRNGKey(42))

    assert abs(float(m_dp["train_loss"]) - float(m_3d["train_loss"])) < 1e-5
    for a, b_ in zip(jax.tree_util.tree_leaves(st_dp.params),
                     jax.tree_util.tree_leaves(st_3d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=1e-6)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_tp_with_dropout_runs(remat):
    """Dropout under dp x pp x tp: sharded sites (attention matrix, MLP
    hidden) draw per-device masks, post-psum sites shared masks — the
    residual stream must stay replicated over 'model' (check_vma would
    reject a diverging stream) and the loss finite. remat=True routes the
    manual TP block through jax.checkpoint (psum/axis_index under
    rematerialization)."""
    cfg = _cfg(drop_rate=0.1, attn_drop_rate=0.1, s_patchout_t=1,
               remat=remat)
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    mesh = make_pipeline_mesh(8, num_stages=2, model_parallel=2)
    step = make_pipeline_train_step(net, tx, AugmentConfig(), mesh=mesh,
                                    num_microbatches=2, donate=False)
    batch = _batch()
    with mesh:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
        _, m = step(st, b, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["train_loss"]))


def test_pipeline_tp_validation_errors():
    cfg = _cfg(num_heads=2)  # 2 heads not divisible by tp=4
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_pipeline_mesh(8, num_stages=2, model_parallel=4)
    fwd = make_pipeline_forward(net, mesh, num_microbatches=1)
    x = jnp.zeros((8, 26, 46, 1), jnp.float32)
    with pytest.raises(ValueError, match="num_heads"):
        fwd(params, x)

    with pytest.raises(ValueError, match="not divisible"):
        make_pipeline_mesh(8, num_stages=2, model_parallel=3)


def test_pipeline_train_step_matches_dp():
    """One full pipelined train step (SpecAugment + mixup + patchout + BCE
    + AdamW + NaN guard) must produce the same loss AND the same updated
    parameters as the plain data-parallel step."""
    cfg = _cfg(s_patchout_t=1)
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    aug = AugmentConfig(time_masks=4, freq_masks=2)
    batch = _batch()

    mesh_dp = make_mesh(8, model_parallel=1)
    step_dp = make_train_step(net, tx, aug, donate=False)
    with mesh_dp:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh_dp, P("data")))
             for k, v in batch.items()}
        st_dp, m_dp = step_dp(st, b, jax.random.PRNGKey(42))

    mesh_pp = make_pipeline_mesh(8, num_stages=2)
    step_pp = make_pipeline_train_step(
        net, tx, aug, mesh=mesh_pp, num_microbatches=2, donate=False
    )
    with mesh_pp:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh_pp, P("data")))
             for k, v in batch.items()}
        st_pp, m_pp = step_pp(st, b, jax.random.PRNGKey(42))

    assert abs(float(m_dp["train_loss"]) - float(m_pp["train_loss"])) < 1e-6
    for a, b_ in zip(jax.tree_util.tree_leaves(st_dp.params),
                     jax.tree_util.tree_leaves(st_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("tp", [1, 2])
def test_pipeline_fsdp_train_step_matches_dp(tp):
    """ZeRO-3 x GPipe (x Megatron TP): block params stored data-sharded,
    all-gathered at stage entry, gradients reduce-scattered back. One train
    step must match the plain DP step (loss + updated params), and the
    updated params must STAY data-sharded (the ZeRO footprint claim)."""
    from maest_tpu.parallel.mesh import shard_params

    cfg = _cfg(s_patchout_t=1)
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    aug = AugmentConfig(time_masks=4, freq_masks=2)
    batch = _batch()

    mesh_dp = make_mesh(8, model_parallel=1)
    step_dp = make_train_step(net, tx, aug, donate=False)
    with mesh_dp:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh_dp, P("data")))
             for k, v in batch.items()}
        st_dp, m_dp = step_dp(st, b, jax.random.PRNGKey(42))

    mesh = make_pipeline_mesh(8, num_stages=2, model_parallel=tp)
    step = make_pipeline_train_step(
        net, tx, aug, mesh=mesh, num_microbatches=2, donate=False, fsdp=True
    )
    with mesh:
        sharded = shard_params(params, mesh, fsdp=True, tensor_parallel=False)
        st = TrainState.create(sharded, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
        st_pp, m_pp = step(st, b, jax.random.PRNGKey(42))

    tol = dict(rtol=1e-6, atol=1e-8) if tp == 1 else dict(rtol=5e-4, atol=1e-6)
    assert abs(float(m_dp["train_loss"]) - float(m_pp["train_loss"])) < (
        1e-6 if tp == 1 else 1e-5
    )
    for a, b_ in zip(jax.tree_util.tree_leaves(st_dp.params),
                     jax.tree_util.tree_leaves(st_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), **tol)

    # the big block kernels must still be sharded after the step (the ZeRO
    # footprint claim): each device holds strictly less than the full leaf
    qkv = st_pp.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.size < qkv.size, (
        f"qkv kernel lost its ZeRO shard: {qkv.sharding}"
    )


def test_pipeline_train_step_remat():
    """cfg.remat routes the pipelined block applies through jax.checkpoint;
    the result must be unchanged."""
    cfg = _cfg(s_patchout_t=1)
    net_plain = MAESTNet(cfg)
    net_remat = MAESTNet(dataclasses.replace(cfg, remat=True))
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    aug = AugmentConfig(time_masks=4, freq_masks=2)
    batch = _batch()

    mesh = make_pipeline_mesh(8, num_stages=2)
    losses = []
    for net in (net_plain, net_remat):
        step = make_pipeline_train_step(
            net, tx, aug, mesh=mesh, num_microbatches=2, donate=False
        )
        with mesh:
            st = TrainState.create(params, tx)
            b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                 for k, v in batch.items()}
            _, m = step(st, b, jax.random.PRNGKey(42))
            losses.append(float(m["train_loss"]))
    assert abs(losses[0] - losses[1]) < 1e-6


def test_pipeline_teacher_student():
    cfg = _cfg(distilled_type="separated")
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    aug = AugmentConfig(time_masks=4, freq_masks=2)
    batch = _batch()
    batch["y_teacher"] = np.clip(
        batch["y"] + 0.1 * np.random.default_rng(2).random(batch["y"].shape),
        0, 1,
    ).astype(np.float32)

    mesh_dp = make_mesh(8, model_parallel=1)
    step_dp = make_train_step(net, tx, aug, teacher_student=True,
                              donate=False)
    with mesh_dp:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh_dp, P("data")))
             for k, v in batch.items()}
        _, m_dp = step_dp(st, b, jax.random.PRNGKey(3))

    mesh = make_pipeline_mesh(8, num_stages=4)
    step = make_pipeline_train_step(
        net, tx, aug, mesh=mesh, num_microbatches=2, teacher_student=True,
        donate=False,
    )
    with mesh:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
        _, m = step(st, b, jax.random.PRNGKey(3))
    for key in ("train_loss", "train_loss_standard", "train_loss_teacher"):
        assert abs(float(m[key]) - float(m_dp[key])) < 1e-6


def test_pipeline_train_with_attention_dropout():
    """Regression: attn_drop_rate > 0 with drop_rate == 0 must thread the
    dropout rng into the pipelined blocks (it used to crash with
    InvalidRngError because only drop_rate gated the rng plumbing)."""
    cfg = _cfg(attn_drop_rate=0.1)
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    mesh = make_pipeline_mesh(8, num_stages=2)
    step = make_pipeline_train_step(net, tx, AugmentConfig(), mesh=mesh,
                                    num_microbatches=2, donate=False)
    batch = _batch()
    with mesh:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
        _, m = step(st, b, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["train_loss"]))


@pytest.mark.parametrize("tp", [1, 2])
def test_pipeline_dropout_masks_differ_across_data_shards(tp):
    """Regression: the trunk's dropout key must fold in the data-shard
    index. The key enters the shard_map replicated, so without the fold
    row i of EVERY data shard drew a bitwise-identical mask (dropout
    correlated across the global batch). With all batch rows identical,
    the bug makes shard 0's output block equal shard 1's; independent
    masks make them differ."""
    from maest_tpu.parallel.pipeline import pipeline_trunk

    cfg = _cfg(drop_rate=0.3)
    params = init_params(cfg, jax.random.PRNGKey(0))
    stacked = stack_block_params(params, cfg.depth)
    mesh = make_pipeline_mesh(8, num_stages=2, model_parallel=tp)
    n_data = mesh.shape["data"]
    row = np.random.default_rng(3).standard_normal((1, 24, cfg.embed_dim))
    tokens = jnp.asarray(np.repeat(row, 16, axis=0), jnp.float32)
    out = np.asarray(pipeline_trunk(
        cfg, mesh, stacked, tokens, num_microbatches=2, n_real=None,
        train=True, dropout_key=jax.random.PRNGKey(7), dtype=jnp.float32,
    ))
    b_local = 16 // n_data
    assert np.abs(out[:b_local] - out[b_local:2 * b_local]).max() > 1e-3


def test_stack_block_params_layout():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    stacked = stack_block_params(params, cfg.depth)
    k = stacked["attn"]["qkv"]["kernel"]
    assert k.shape[0] == cfg.depth
    np.testing.assert_array_equal(
        np.asarray(k[2]), np.asarray(params["blocks_2"]["attn"]["qkv"]["kernel"])
    )


def test_pipeline_validation_errors():
    cfg = _cfg(depth=3)  # not divisible by 2 stages
    net = MAESTNet(cfg)
    tx = make_optimizer(lr_schedule=1e-4, adamw=True, weight_decay=1e-4)
    mesh = make_pipeline_mesh(8, num_stages=2)
    with pytest.raises(ValueError, match="not divisible"):
        make_pipeline_train_step(net, tx, mesh=mesh)

    with pytest.raises(ValueError, match="not divisible"):
        make_pipeline_mesh(8, num_stages=3)

    # stochastic depth is gated (all shipped configs use 0)
    cfg = _cfg(drop_path_rate=0.1)
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    step = make_pipeline_train_step(net, tx, mesh=mesh, num_microbatches=2,
                                    donate=False)
    batch = _batch()
    with mesh:
        st = TrainState.create(params, tx)
        b = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
        with pytest.raises(NotImplementedError, match="drop_path"):
            step(st, b, jax.random.PRNGKey(0))


def test_front_tail_seams_compose_to_full_forward():
    """forward_mode='front' + sequential blocks + forward_mode='tail' must
    reproduce the full forward exactly (the seam the pipeline relies on)."""
    from maest_tpu.models.vit import Block

    cfg = _cfg()
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 26, 46, 1)), jnp.float32
    )
    ref_logits, ref_feats = net.apply({"params": params}, x, train=False)

    tokens, n_tokens = net.apply({"params": params}, x, train=False,
                                 forward_mode="front")
    n_real = None if tokens.shape[1] == n_tokens else n_tokens
    h = tokens
    for i in range(cfg.depth):
        blk = Block(cfg.embed_dim, cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias, eps=cfg.layer_norm_eps,
                    n_real=n_real)
        h = blk.apply({"params": params[f"blocks_{i}"]}, h, True)
    logits, feats = net.apply({"params": params}, h, train=False,
                              forward_mode="tail")
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-6, atol=1e-7)

    with pytest.raises(ValueError, match="forward_mode"):
        net.apply({"params": params}, x, train=False, forward_mode="nope")
    with pytest.raises(ValueError, match="front/tail"):
        net.apply({"params": params}, x, train=False, forward_mode="front",
                  transformer_block=3)
