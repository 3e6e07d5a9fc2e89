"""tap_block: predict's single-forward embedding tap must equal the
truncated ``transformer_block == k`` forward (reference semantics:
models/maest.py:811-829) while also returning the full-depth logits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.train.steps import AugmentConfig, make_predict_step


def _net():
    cfg = MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10),
        embed_dim=64, depth=3, num_heads=4, num_classes=8, distilled=True,
    )
    net = MAESTNet(cfg, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return net, params


def test_tap_block_matches_truncated_forward():
    net, params = _net()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 26, 46, 1)), jnp.float32
    )
    for k in range(3):
        logits, feats, tap = net.apply(
            {"params": params}, x, train=False, tap_block=k
        )
        _, emb = net.apply(
            {"params": params}, x, train=False, transformer_block=k
        )
        np.testing.assert_array_equal(np.asarray(tap), np.asarray(emb))
        ref_logits, _ = net.apply({"params": params}, x, train=False)
        np.testing.assert_array_equal(np.asarray(logits),
                                      np.asarray(ref_logits))


def test_predict_step_single_forward_outputs():
    net, params = _net()
    batch = {
        "x": np.random.default_rng(1).standard_normal((2, 26, 46))
        .astype(np.float32)
    }
    step = make_predict_step(net, AugmentConfig())
    out = step(params, batch, 1)
    assert out["logits"].shape == (2, 8)
    assert out["embeddings"].shape == (2, 3 * 64)
    from maest_tpu.train.steps import _prepare

    x = _prepare(jnp.asarray(batch["x"]), AugmentConfig(), None, train=False)
    _, emb = net.apply({"params": params}, x, train=False,
                       transformer_block=1)
    np.testing.assert_allclose(np.asarray(out["embeddings"]),
                               np.asarray(emb), rtol=1e-6, atol=1e-7)


def test_tap_block_exclusive_with_layer_tokens():
    net, params = _net()
    x = jnp.zeros((1, 26, 46, 1), jnp.float32)
    with pytest.raises(ValueError, match="tap_block"):
        net.apply({"params": params}, x, train=False, tap_block=1,
                  return_layer_tokens=True)
