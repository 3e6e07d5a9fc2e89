"""Rematerialization: gradients identical with and without jax.checkpoint."""

import numpy as np

import jax
import jax.numpy as jnp

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params


def _grads(remat: bool):
    cfg = MAESTConfig(img_size=(96, 120), embed_dim=64, depth=2, num_heads=4,
                      num_classes=5, remat=remat, s_patchout_t=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    net = MAESTNet(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 96, 120, 1)), jnp.float32
    )

    def loss(p):
        logits, _ = net.apply(
            {"params": p}, x, train=True,
            rngs={"patchout": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(logits**2)

    return jax.grad(loss)(params)


def test_remat_grad_parity():
    g0 = _grads(False)
    g1 = _grads(True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        ),
        g0, g1,
    )


def test_remat_policy_grad_parity():
    """Every remat_policy saves a different activation set but must
    compute identical gradients (policies change memory/recompute, never
    math)."""
    base = _grads(False)
    for policy in ("dots", "attn_out"):
        cfg = MAESTConfig(img_size=(96, 120), embed_dim=64, depth=2,
                          num_heads=4, num_classes=5, remat=True,
                          remat_policy=policy, s_patchout_t=2)
        params = init_params(cfg, jax.random.PRNGKey(0))
        net = MAESTNet(cfg)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 96, 120, 1)),
            jnp.float32)

        def loss(p):
            logits, _ = net.apply(
                {"params": p}, x, train=True,
                rngs={"patchout": jax.random.PRNGKey(1),
                      "dropout": jax.random.PRNGKey(2)},
            )
            return jnp.sum(logits**2)

        g = jax.grad(loss)(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            ),
            base, g,
        )


def test_remat_policy_rejects_unknown():
    import pytest

    from maest_tpu.models.vit import remat_policy

    with pytest.raises(ValueError, match="remat_policy"):
        remat_policy("everything")
