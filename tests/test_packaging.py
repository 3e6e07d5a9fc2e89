"""Packaging layer tests: HF AST round-trip, safetensors save, surgery.

The reference has no packaging tests; conversion fidelity there is asserted
only by hub-side usage (reference: packaging/push_to_hub.py). Here the
round-trip is a hard test: params -> AST layout -> params must be exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maest_tpu.checkpoints.convert import merge_params, torch_to_jax_params
from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.surgery import (
    fix_embedding_layer,
    lighten_model,
    per_freq_params_from_conv,
)
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.packaging.hf_ast import (
    ast_config_dict,
    from_hf_ast_state,
    jax_to_torch_state,
    save_pretrained,
    to_hf_ast_state,
)


@pytest.fixture(scope="module")
def small_cfg():
    return MAESTConfig(
        img_size=(96, 120), embed_dim=64, depth=2, num_heads=4, num_classes=7
    )


@pytest.fixture(scope="module")
def small_params(small_cfg):
    return init_params(small_cfg, jax.random.PRNGKey(0))


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6, err_msg=path
        )


def test_torch_state_roundtrip(small_cfg, small_params):
    """flax -> torch layout -> flax is exact."""
    torch_state = jax_to_torch_state(small_params, small_cfg)
    back = torch_to_jax_params(torch_state, small_cfg, strict=True)
    _tree_equal(jax.tree.map(np.asarray, small_params), back)


def test_hf_ast_roundtrip(small_cfg, small_params):
    """flax -> AST layout -> flax is exact (pos-table rank-1 split is exact
    for tables produced by the forward conversion)."""
    torch_state = jax_to_torch_state(small_params, small_cfg)
    ast = to_hf_ast_state(torch_state)
    assert f"audio_spectrogram_transformer.embeddings.position_embeddings" in ast
    back_torch = from_hf_ast_state(ast, small_cfg)
    back = torch_to_jax_params(back_torch, small_cfg, strict=True)
    ref = jax.tree.map(np.asarray, small_params)
    # The freq/time split is unique only up to a constant shift between the
    # two tables; the model consumes their broadcast sum, which must be exact.
    pos_keys = {"freq_new_pos_embed", "time_new_pos_embed"}
    for k in ref:
        if k in pos_keys:
            continue
        if isinstance(ref[k], dict):
            _tree_equal(ref[k], back[k], k)
        else:
            np.testing.assert_allclose(ref[k], back[k], atol=2e-6, err_msg=k)
    joint_ref = ref["freq_new_pos_embed"][:, None, :] + ref["time_new_pos_embed"][None]
    joint_back = (
        back["freq_new_pos_embed"][:, None, :] + back["time_new_pos_embed"][None]
    )
    np.testing.assert_allclose(joint_ref, joint_back, atol=2e-6)


def test_hf_ast_qkv_split(small_cfg, small_params):
    torch_state = jax_to_torch_state(small_params, small_cfg)
    ast = to_hf_ast_state(torch_state)
    e = small_cfg.embed_dim
    q = ast["audio_spectrogram_transformer.encoder.layer.0.attention.attention.query.weight"]
    np.testing.assert_array_equal(q, torch_state["blocks.0.attn.qkv.weight"][:e])


def test_ast_config(small_cfg):
    d = ast_config_dict(small_cfg, labels=["a", "b", "c", "d", "e", "f", "g"])
    assert d["num_mel_bins"] == 96
    assert d["time_stride"] == 10
    # the reference's per-duration AST max_length convention
    # (push_to_hub.py:100-108): patch + stride * (grid_t - 1); img_t=120
    # (grid 12) -> 126, and the released 30 s geometry (1875 -> 187) -> 1876
    assert d["max_length"] == 126
    from maest_tpu.models.config import MAESTConfig as _C

    assert ast_config_dict(_C(img_size=(96, 1875)))["max_length"] == 1876
    assert d["id2label"]["0"] == "a"


def test_save_pretrained(tmp_path, small_cfg, small_params):
    from safetensors.numpy import load_file

    out = save_pretrained(small_params, small_cfg, str(tmp_path / "hf"))
    state = load_file(str(tmp_path / "hf" / "model.safetensors"))
    assert "classifier.dense.weight" in state
    assert (tmp_path / "hf" / "config.json").exists()
    assert (tmp_path / "hf" / "preprocessor_config.json").exists()


# ---------------------------------------------------------------------------
# surgery
# ---------------------------------------------------------------------------

def test_per_freq_embed_matches_shared_conv(small_cfg, small_params):
    """Per-freq embedding tiled from the shared conv must produce the exact
    same activations (reference init semantics: models/maest.py:295-298)."""
    new_params, new_cfg = per_freq_params_from_conv(small_params, small_cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 96, 120, 1)), jnp.float32
    )
    base = MAESTNet(small_cfg).apply({"params": small_params}, x, train=False)
    freq = MAESTNet(new_cfg).apply({"params": new_params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(base[0]), np.asarray(freq[0]), rtol=2e-4, atol=2e-4
    )


def test_fix_embedding_layer_dispatch(small_cfg, small_params):
    p, c = fix_embedding_layer(small_params, small_cfg, "default")
    assert c is small_cfg
    with pytest.raises(NotImplementedError):
        fix_embedding_layer(small_params, small_cfg, "overlap")


def test_lighten_model_remove_n(small_cfg, small_params):
    p, c = lighten_model(small_params, small_cfg, remove_n_blocks=1)
    assert c.depth == 1
    assert "blocks_0" in p and "blocks_1" not in p
    # model still runs
    x = jnp.zeros((1, 96, 120, 1), jnp.float32)
    logits, _ = MAESTNet(c).apply({"params": p}, x, train=False)
    assert logits.shape == (1, 7)


def test_lighten_model_cut_depth():
    cfg = MAESTConfig(img_size=(96, 120), embed_dim=32, depth=6, num_heads=4,
                      num_classes=3)
    params = init_params(cfg, jax.random.PRNGKey(1))
    # cut_depth=2: keep block 0 + blocks 3..5 -> depth 4
    p, c = lighten_model(params, cfg, cut_depth=2)
    assert c.depth == 4
    np.testing.assert_array_equal(
        np.asarray(p["blocks_1"]["norm1"]["scale"]),
        np.asarray(params["blocks_3"]["norm1"]["scale"]),
    )
    # negative: keep first + every 2nd middle + last
    p, c = lighten_model(params, cfg, cut_depth=-2)
    assert c.depth == 2 + len(range(1, 5, 2))


def test_merge_params_after_surgery(small_cfg, small_params):
    """lightened params merge onto a fresh init of the lightened config."""
    p, c = lighten_model(small_params, small_cfg, remove_n_blocks=1)
    fresh = init_params(c, jax.random.PRNGKey(2))
    merged = merge_params(jax.tree.map(np.asarray, fresh), p)
    np.testing.assert_array_equal(
        np.asarray(merged["blocks_0"]["norm1"]["scale"]),
        np.asarray(small_params["blocks_0"]["norm1"]["scale"]),
    )


def test_save_torch_checkpoint_roundtrip(tmp_path, small_cfg, small_params):
    """.pt export loads back through the standard checkpoint path."""
    from maest_tpu.api import _load_any, _normalize_state
    from maest_tpu.packaging.hf_ast import save_torch_checkpoint

    p = str(tmp_path / "model.pt")
    save_torch_checkpoint(small_params, small_cfg, p, swa_prefix=True)
    state = _normalize_state(_load_any(p), small_cfg, swa_weights=True)
    back = torch_to_jax_params(state, small_cfg, strict=True)
    _tree_equal(jax.tree.map(np.asarray, small_params), back)


def test_per_freq_checkpoint_load(small_cfg, small_params):
    """A torch checkpoint (shared conv) loaded into a per-freq cfg must
    expand into the per-freq projections (reference load-time surgery,
    models/maest.py:295-298) — before this mapping, merge_params silently
    kept the RANDOM per-freq kernels."""
    torch_state = jax_to_torch_state(small_params, small_cfg)
    pf_cfg = small_cfg.replace(per_freq_patch_embed=True)
    loaded = torch_to_jax_params(torch_state, pf_cfg, strict=True)
    expect, _ = per_freq_params_from_conv(
        jax.tree.map(np.asarray, small_params), small_cfg)
    _tree_equal(expect, loaded)


def test_per_freq_export_rejected(small_cfg, small_params):
    """The inverse direction has no torch/AST mapping — clear error, not a
    KeyError deep inside the layout code."""
    pf_params, pf_cfg = per_freq_params_from_conv(
        jax.tree.map(np.asarray, small_params), small_cfg)
    with pytest.raises(NotImplementedError, match="per-freq"):
        jax_to_torch_state(pf_params, pf_cfg)


def test_qkv_bias_false_export_rejected(small_cfg, small_params):
    """AST's layout carries separate q/k/v biases; a qkv_bias=False state
    must be rejected with a clear error, not a KeyError."""
    cfg = small_cfg.replace(qkv_bias=False)
    params = init_params(cfg, jax.random.PRNGKey(0))
    state = jax_to_torch_state(params, cfg)
    with pytest.raises(NotImplementedError, match="qkv_bias"):
        to_hf_ast_state(state)


def test_non_distilled_hf_import_rejected(small_cfg, small_params):
    """AST checkpoints always carry [cls|dist|grid]; a non-distilled target
    cfg would misparse the position table."""
    ast_state = to_hf_ast_state(jax_to_torch_state(small_params, small_cfg))
    with pytest.raises(NotImplementedError, match="non-distilled"):
        from_hf_ast_state(ast_state, small_cfg.replace(distilled=False))


class _Exotic:
    """Non-allowlisted global: fails torch.load(weights_only=True)."""

    pass


def test_unsafe_torch_load_requires_opt_in(tmp_path, monkeypatch):
    """A checkpoint the restricted unpickler rejects must NOT be auto-loaded
    with the full (arbitrary-code-execution) unpickler — explicit opt-in via
    MAEST_TPU_UNSAFE_LOAD=1 only."""
    import torch

    from maest_tpu.checkpoints.convert import load_torch_checkpoint

    path = tmp_path / "exotic.ckpt"
    torch.save({"state_dict": {"w": torch.zeros(2)}, "hparams": _Exotic()},
               path)
    monkeypatch.delenv("MAEST_TPU_UNSAFE_LOAD", raising=False)
    with pytest.raises(ValueError, match="MAEST_TPU_UNSAFE_LOAD"):
        load_torch_checkpoint(str(path))
    monkeypatch.setenv("MAEST_TPU_UNSAFE_LOAD", "1")
    state = load_torch_checkpoint(str(path))
    assert state["w"].shape == (2,)
