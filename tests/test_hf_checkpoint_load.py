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


def test_hf_load_retargets_time_grid(tmp_path):
    """Regression: loading an HF AST export into a config with a DIFFERENT
    clip length used to hard-error on the grid-size check; it must split at
    the export geometry and bicubic-resize the time table like the torch
    checkpoint path (convert.py adapt_pos_embeds)."""
    cfg = MAESTConfig(img_size=(96, 312), embed_dim=64, depth=2, num_heads=4,
                      num_classes=400)  # 5 s export
    params = init_params(cfg, jax.random.PRNGKey(0))
    save_pretrained(params, cfg, str(tmp_path / "hf"))

    m = get_maest(
        arch="discogs-maest-10s-pw-129e",  # 10 s target: time grid differs
        pretrained=False,
        checkpoint=str(tmp_path / "hf" / "model.safetensors"),
        embed_dim=64, depth=2, num_heads=4,
    )
    t_target = (m.cfg.img_size[1] - m.cfg.patch_size) // m.cfg.stride[1] + 1
    assert m.params["time_new_pos_embed"].shape[0] in (
        t_target, m.cfg.grid_size[1]
    )
    x = np.random.default_rng(1).standard_normal((96, 622)).astype("float32")
    logits, _ = m(x, melspectrogram_input=True)
    assert np.isfinite(np.asarray(logits)).all()


def test_hf_export_requires_distilled():
    """Non-distilled states must fail with a clear unsupported-format error
    (AST's embedding layout has no non-distilled variant), not a KeyError."""
    import pytest

    from maest_tpu.packaging.hf_ast import jax_to_torch_state, to_hf_ast_state

    cfg = MAESTConfig(img_size=(96, 312), embed_dim=64, depth=2, num_heads=4,
                      num_classes=8, distilled=False)
    params = init_params(cfg, jax.random.PRNGKey(0))
    state = jax_to_torch_state(params, cfg)
    with pytest.raises(NotImplementedError, match="dist"):
        to_hf_ast_state(state)
