"""TF SavedModel export: signature + exact parity with the JAX model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params

tf = pytest.importorskip("tensorflow")


def test_tf_saved_model_signature_and_parity(tmp_path):
    from maest_tpu.packaging.export import export_tf_saved_model, load_tf_and_check

    cfg = MAESTConfig(img_size=(96, 120), embed_dim=64, depth=2, num_heads=4,
                      num_classes=7)
    params = init_params(cfg, jax.random.PRNGKey(0))
    out = export_tf_saved_model(params, cfg, str(tmp_path / "tf"), batch_size=2)

    mel = np.random.default_rng(0).standard_normal((2, 120, 96)).astype("f4")
    res = load_tf_and_check(out, mel)

    # Essentia deployment signature (reference: packaging/onnx_to_tf.sh)
    assert {"logits", "activations", "layer_0_tokens", "layer_1_tokens"} <= set(res)
    assert res["logits"].shape == (2, 7)
    np.testing.assert_allclose(
        res["activations"], 1.0 / (1.0 + np.exp(-res["logits"])), atol=1e-6
    )

    ref, _ = MAESTNet(cfg).apply(
        {"params": params},
        jnp.transpose(jnp.asarray(mel), (0, 2, 1))[..., None],
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ref), res["logits"], atol=1e-5)
