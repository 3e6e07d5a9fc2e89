"""End-to-end: an HF-AST-layout safetensors file loads via get_maest and
produces the same logits as the original params."""

import numpy as np

import jax
import jax.numpy as jnp

from maest_tpu.api import get_maest
from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.packaging.hf_ast import save_pretrained


def test_hf_safetensors_roundtrip_through_get_maest(tmp_path, monkeypatch):
    # build a tiny model config matching a registry arch's geometry knobs
    cfg = MAESTConfig(img_size=(96, 312), embed_dim=64, depth=2, num_heads=4,
                      num_classes=400)
    params = init_params(cfg, jax.random.PRNGKey(0))
    out = save_pretrained(params, cfg, str(tmp_path / "hf"))

    m = get_maest(
        arch="discogs-maest-5s-pw-129e",
        pretrained=False,
        checkpoint=str(tmp_path / "hf" / "model.safetensors"),
        embed_dim=64, depth=2, num_heads=4,
    )

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 96, 312, 1)), jnp.float32
    )
    ref_logits, _ = MAESTNet(cfg).apply({"params": params}, x, train=False)
    got_logits, _ = MAESTNet(m.cfg).apply({"params": m.params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(got_logits), rtol=2e-4, atol=2e-4
    )
