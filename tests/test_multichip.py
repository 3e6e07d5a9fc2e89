"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Covers what the reference never could (its DDP is validated only by a
hand-run launch script, ex_maest519.sh): DP+TP train step correctness and
DP-vs-single-device numerical equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.parallel.mesh import make_mesh, shard_params
from maest_tpu.train.state import TrainState, make_optimizer
from maest_tpu.train.steps import AugmentConfig, make_train_step

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,
]


def _tiny_cfg():
    return MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10),
        embed_dim=128, depth=2, num_heads=4, num_classes=16,
        distilled=True,
    )


def _batch(mesh, n=8):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 26, 46)).astype(np.float32)
    y = (rng.random((n, 16)) > 0.8).astype(np.float32)
    if mesh is None:
        return {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    return {
        "x": jax.device_put(x, NamedSharding(mesh, P("data"))),
        "y": jax.device_put(y, NamedSharding(mesh, P("data"))),
    }


def _run_steps(mesh, model_parallel, steps=2, sequence_parallel=False,
               fsdp=False):
    cfg = _tiny_cfg()
    if sequence_parallel:
        cfg = cfg.replace(sequence_parallel=True)
    net = MAESTNet(cfg, dtype=jnp.float32, mesh=mesh)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-3, adamw=True)
    step_fn = make_train_step(net, tx, AugmentConfig(mixup_alpha=0.0,
                                                     masking=False),
                              donate=False)
    key = jax.random.PRNGKey(7)
    if mesh is None:
        state = TrainState.create(params, tx)
        batch = _batch(None)
        for _ in range(steps):
            state, m = step_fn(state, batch, key)
        return state, m
    with mesh:
        params = shard_params(params, mesh, fsdp=fsdp)
        state = TrainState.create(params, tx)
        batch = _batch(mesh)
        for _ in range(steps):
            state, m = step_fn(state, batch, key)
        return state, m


def test_dp_matches_single_device():
    """Data-parallel over 8 devices reproduces single-device training."""
    state_1, m1 = _run_steps(None, 1)
    mesh = make_mesh(8, model_parallel=1)
    state_8, m8 = _run_steps(mesh, 1)
    np.testing.assert_allclose(
        float(m1["train_loss"]), float(m8["train_loss"]), rtol=1e-5
    )
    l1 = np.asarray(state_1.params["blocks_0"]["attn"]["qkv"]["kernel"])
    l8 = np.asarray(state_8.params["blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-6)


def test_dp_tp_train_step_runs_and_matches():
    """DP x TP (4x2) mesh: step executes and loss matches single-device."""
    state_1, m1 = _run_steps(None, 1)
    mesh = make_mesh(8, model_parallel=2)
    state_tp, mtp = _run_steps(mesh, 2)
    np.testing.assert_allclose(
        float(m1["train_loss"]), float(mtp["train_loss"]), rtol=1e-5
    )


def test_dp_tp_sp_train_step_matches():
    """DP x TP x SP: token-sharded residual stream (Megatron sequence
    parallelism) must not change the numbers — GSPMD only re-lays-out the
    LayerNorm/residual regions and swaps all-reduce for RS+AG."""
    state_1, m1 = _run_steps(None, 1)
    mesh = make_mesh(8, model_parallel=2)
    state_sp, msp = _run_steps(mesh, 2, sequence_parallel=True)
    np.testing.assert_allclose(
        float(m1["train_loss"]), float(msp["train_loss"]), rtol=1e-5
    )
    l1 = np.asarray(state_1.params["blocks_0"]["attn"]["qkv"]["kernel"])
    lsp = np.asarray(state_sp.params["blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(l1, lsp, rtol=1e-4, atol=1e-6)


def _data_sharded_fraction(tree):
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "sharding")]
    n_sharded = sum(
        1 for l in leaves
        if "data" in jax.tree.leaves(tuple(l.sharding.spec))
    )
    return n_sharded / max(1, len(leaves))


def test_fsdp_matches_single_device():
    """ZeRO-3 FSDP (params + Adam moments sharded over 'data') reproduces
    single-device training, and the updated state actually STAYS sharded —
    each device holds 1/8 of every shardable tensor."""
    state_1, m1 = _run_steps(None, 1)
    mesh = make_mesh(8, model_parallel=1)
    state_f, mf = _run_steps(mesh, 1, fsdp=True)
    np.testing.assert_allclose(
        float(m1["train_loss"]), float(mf["train_loss"]), rtol=1e-5
    )
    l1 = np.asarray(state_1.params["blocks_0"]["attn"]["qkv"]["kernel"])
    lf = np.asarray(state_f.params["blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(l1, lf, rtol=1e-4, atol=1e-6)
    # embed_dim 128 divides 8, so every >=1-dim tensor should carry 'data'
    assert _data_sharded_fraction(state_f.params) > 0.9
    # Adam moments inherit the param sharding (ZeRO: opt state 1/DP too)
    assert _data_sharded_fraction(state_f.opt_state) > 0.5


def test_fsdp_tp_train_step_matches():
    """FSDP composes with TP: kernels split over 'model' on one dim and
    'data' on the other (hybrid sharded layout)."""
    from maest_tpu.parallel.mesh import param_spec

    state_1, m1 = _run_steps(None, 1)
    mesh = make_mesh(8, model_parallel=2)
    state_f, mf = _run_steps(mesh, 2, fsdp=True)
    np.testing.assert_allclose(
        float(m1["train_loss"]), float(mf["train_loss"]), rtol=1e-5
    )
    assert param_spec(("blocks_0", "attn", "qkv", "kernel"), (128, 384),
                      fsdp_shards=4) == P("data", "model")


def test_param_sharding_specs():
    """TP puts qkv/fc1 column-sharded and proj/fc2 row-sharded on 'model'."""
    from maest_tpu.parallel.mesh import param_spec

    assert param_spec(("blocks_0", "attn", "qkv", "kernel"), (128, 384)) == \
        P(None, "model")
    assert param_spec(("blocks_0", "attn", "proj", "kernel"), (128, 128)) == \
        P("model", None)
    assert param_spec(("blocks_0", "mlp", "fc1", "kernel"), (128, 512)) == \
        P(None, "model")
    assert param_spec(("blocks_0", "mlp", "fc2", "kernel"), (512, 128)) == \
        P("model", None)


def test_flash_attention_sharded_interpret():
    """shard_map'd Pallas kernel (interpret mode) matches XLA attention and
    differentiates, on a (data=4, model=2) mesh."""
    from maest_tpu.ops.attention import (
        attention_reference,
        flash_attention_sharded,
    )

    mesh = make_mesh(8, model_parallel=2)
    rng = np.random.default_rng(0)
    b, n, h, d = 4, 256, 4, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        for _ in range(3)
    )

    with mesh:
        out = flash_attention_sharded(q, k, v, mesh, block_q=128, block_k=128,
                                      interpret=True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

        def loss(q):
            return jnp.sum(
                flash_attention_sharded(q, k, v, mesh, block_q=128,
                                        block_k=128, interpret=True) ** 2
            )

        g = jax.grad(loss)(q)
        g_ref = jax.grad(lambda q: jnp.sum(attention_reference(q, k, v) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=5e-3, atol=5e-3)


def test_api_inference_on_mesh_matches_single_device():
    """get_maest(mesh=...) shards the public inference API over the mesh
    (DP over chunks, TP over heads); logits must match the single-device
    wrapper bit-for-fp32-tolerance."""
    from maest_tpu.api import get_maest

    kwargs = dict(
        arch="discogs-maest-30s-pw-129e", pretrained=False,
        embed_dim=64, depth=2, num_heads=4, input_t=62, n_classes=16,
    )
    single = get_maest(**kwargs)
    mesh = make_mesh(8, model_parallel=2)
    sharded = get_maest(**kwargs, mesh=mesh)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 96, 62)).astype(np.float32)  # divisible batch
    ref = np.asarray(single(x)[0], np.float32)
    out = np.asarray(sharded(x)[0], np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # odd batch (not divisible by the data axis) pads with the repeated
    # last chunk, shards, and slices back — results must be unchanged
    x3 = rng.standard_normal((3, 96, 62)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sharded(x3)[0], np.float32),
        np.asarray(single(x3)[0], np.float32), rtol=2e-5, atol=2e-5)

    # rank-1 waveform path (chunking + mel) also runs under the mesh
    wave = rng.standard_normal(2 * 16000 // 16).astype(np.float32)
    acts, labels = sharded.predict_labels(wave)
    assert acts.shape == (16,) and np.isfinite(acts).all()


def test_param_shardings_match_shard_params_flags():
    """param_shardings must be able to express the pipeline/FSDP at-rest
    layout (tensor_parallel=False) — mismatched specs silently reshard
    every step."""
    from maest_tpu.parallel.mesh import param_spec

    shape = (64, 192)
    path = ("blocks_0", "attn", "qkv", "kernel")
    assert param_spec(path, shape, fsdp_shards=4) == P("data", "model")
    assert param_spec(path, shape, fsdp_shards=4,
                      tensor_parallel=False) == P(None, "data")


def test_init_distributed_requires_coordinator(monkeypatch):
    import pytest

    from maest_tpu.parallel.mesh import init_distributed

    # hermetic: other tests (resilience reinit) may leave coordinator env
    # vars behind, which would legitimately route past the guard
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    with pytest.raises(ValueError, match="coordinator"):
        init_distributed(num_processes=4, process_id=1)
