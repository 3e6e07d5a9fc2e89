"""Round-2 hygiene guards: config surface matches behavior, and config
mistakes fail loudly instead of silently changing semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maest_tpu.ops.attention import _validate_tuned_blocks
from maest_tpu.ops.augment import roll_augment, spec_augment


def test_iid_masks_true_masks_differ_per_example():
    # torchaudio iid_masks=True (the default, discogs/datamodule.py:60):
    # every batch element draws its own mask positions.
    x = jnp.ones((4, 24, 64), jnp.float32)
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), x, time_masks=6,
                                  freq_masks=3, iid_masks=True))
    patterns = [tuple(np.flatnonzero(out[b] == 0)) for b in range(4)]
    assert len(set(patterns)) > 1


def test_iid_masks_false_shares_mask_across_batch():
    # torchaudio iid_masks=False: one mask per draw, shared by the batch.
    x = jnp.ones((4, 24, 64), jnp.float32)
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), x, time_masks=6,
                                  freq_masks=3, iid_masks=False))
    assert out.min() == 0.0  # something was actually masked
    for b in range(1, 4):
        np.testing.assert_array_equal(out[b], out[0])


def test_iid_masks_config_key_wired():
    import inspect

    from maest_tpu.train import loop as loop_mod
    from maest_tpu.train.steps import AugmentConfig

    assert AugmentConfig().iid_masks is True
    assert "iid_masks=dm[\"masking\"][\"iid_masks\"]" in inspect.getsource(
        loop_mod)


def test_roll_fixed_shift_honored():
    """A fixed ``shift`` must override the random range (the reference
    honors both keys, discogs/datamodule.py:111-124)."""
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    out = roll_augment(jax.random.PRNGKey(0), x, shift_range=50, shift=1)
    np.testing.assert_array_equal(
        np.asarray(out), np.roll(np.asarray(x), 1, axis=-1)
    )
    # shift=0 is a fixed no-op, not "fall back to random"
    out0 = roll_augment(jax.random.PRNGKey(0), x, shift_range=50, shift=0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))


def test_roll_shift_config_key_wired():
    """The datamodule roll.shift key reaches the jitted step's AugmentConfig."""
    import inspect

    from maest_tpu.train import loop as loop_mod
    from maest_tpu.train.steps import AugmentConfig

    assert hasattr(AugmentConfig(), "roll_shift")
    assert "roll_shift=dm[\"roll\"][\"shift\"]" in inspect.getsource(loop_mod)


def test_unknown_distilled_type_raises():
    """A typo'd distilled_type must not silently act as a cls-only head
    (reference fall-through differs, models/maest.py:905-933)."""
    from maest_tpu.models.config import MAESTConfig
    from maest_tpu.models.vit import MAESTNet, init_params

    cfg = MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10),
        embed_dim=64, depth=1, num_heads=4, num_classes=8,
        distilled=True, distilled_type="maen",  # typo
    )
    del MAESTNet
    with pytest.raises(ValueError, match="distilled_type"):
        init_params(cfg, jax.random.PRNGKey(0))


def test_tuned_block_table_validation():
    """Non-divisor tuned targets are an error at table-definition time, not
    a silent degradation to block 128 inside _pick_block."""
    _validate_tuned_blocks()  # shipped table must be clean
    with pytest.raises(AssertionError, match="silently"):
        _validate_tuned_blocks({896: (896, 448)})  # 448 does not divide 896
    with pytest.raises(AssertionError):
        _validate_tuned_blocks({1152: (1100, 384)})  # not a 128-multiple
    _validate_tuned_blocks({1152: (2048, 384)})  # target > pad is fine


def test_eval_step_returns_logits():
    """Eval metrics must be computable from logits (reference BCE-with-
    logits, models/module.py:90), not from clipped activations."""
    from maest_tpu.models.config import MAESTConfig
    from maest_tpu.models.vit import MAESTNet, init_params
    from maest_tpu.train.state import TrainState, make_optimizer
    from maest_tpu.train.steps import AugmentConfig, bce_with_logits, make_eval_step

    cfg = MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10),
        embed_dim=64, depth=1, num_heads=4, num_classes=8, distilled=True,
    )
    net = MAESTNet(cfg, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=1e-3, adamw=True)
    state = TrainState.create(params, tx)
    step = make_eval_step(net, AugmentConfig(masking=False), with_swa=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 26, 46)), jnp.float32)
    y = jnp.asarray((rng.random((2, 8)) > 0.5).astype(np.float32))
    # the device program is logits-only (targets never cross the relay);
    # loss and sigmoid compute host-side from them — assert derivability
    z = np.asarray(step(state, x)[""], np.float32)
    assert z.shape == (2, 8)
    assert np.isfinite(z).all()
    loss = float(bce_with_logits(jnp.asarray(z), y))
    assert np.isfinite(loss)
    y_hat = 1.0 / (1.0 + np.exp(-z))
    assert ((y_hat >= 0) & (y_hat <= 1)).all()


def test_select_params_reports_fallback():
    """--swa with swa_n == 0 must be labeled as a raw export."""
    from maest_tpu.apps.export_release import select_params

    state = {"params": {"w": np.ones(2)}, "swa_params": {"w": np.zeros(2)},
             "swa_n": 0}
    params, which = select_params(state, swa=True)
    assert "raw" in which and "unavailable" in which
    np.testing.assert_array_equal(params["w"], np.ones(2))

    state["swa_n"] = 3
    params, which = select_params(state, swa=True)
    assert which == "swa"
    np.testing.assert_array_equal(params["w"], np.zeros(2))


def test_forced_flash_with_attn_dropout_raises():
    """impl='flash' + attn_drop_rate>0 in train mode must error, not
    silently skip the configured attention-matrix dropout."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from maest_tpu.models.config import MAESTConfig
    from maest_tpu.models.vit import MAESTNet, init_params

    cfg = MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10), embed_dim=64,
        depth=1, num_heads=4, num_classes=4, distilled=True,
        attn_drop_rate=0.1, attention_impl="flash",
    )
    net = MAESTNet(cfg)
    params = init_params(cfg.replace(attention_impl="xla"),
                         jax.random.PRNGKey(0))
    x = jnp.zeros((1, 26, 46, 1), jnp.float32)
    with pytest.raises(ValueError, match="flash"):
        net.apply({"params": params}, x, train=True,
                  rngs={"dropout": jax.random.PRNGKey(0),
                        "patchout": jax.random.PRNGKey(1)})
    # eval mode must pass the guard (dropout inactive); on this CPU host
    # the forced-flash kernel itself cannot lower, which is fine — the
    # error must NOT be the dropout guard
    with pytest.raises(ValueError, match="interpret mode"):
        net.apply({"params": params}, x, train=False)
    del np  # silence unused-import lint in this CPU-only variant


def test_transformer_block_out_of_range_raises():
    import jax
    import jax.numpy as jnp
    import pytest

    from maest_tpu.models.config import MAESTConfig
    from maest_tpu.models.vit import MAESTNet, init_params

    cfg = MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10), embed_dim=64,
        depth=2, num_heads=4, num_classes=4, distilled=True,
    )
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 26, 46, 1), jnp.float32)
    with pytest.raises(ValueError, match="out of range"):
        net.apply({"params": params}, x, train=False, transformer_block=2)
    with pytest.raises(ValueError, match="out of range"):
        net.apply({"params": params}, x, train=False, tap_block=2)


def test_apply_override_rejects_unknown_keys():
    """Typo'd dotted overrides must error like Sacred, not silently create
    a dead key while the real setting keeps its default."""
    import pytest

    from maest_tpu.configs import apply_override, default_config

    cfg = default_config()
    apply_override(cfg, ["trainer", "max_epochs"], 2)  # valid
    assert cfg["trainer"]["max_epochs"] == 2
    with pytest.raises(KeyError, match="max_epoch"):
        apply_override(cfg, ["trainer", "max_epoch"], 2)
    with pytest.raises(KeyError, match="trainerr"):
        apply_override(cfg, ["trainerr", "max_epochs"], 2)


def test_mel_too_short_guard():
    """n in (hop, n_fft//2] used to pass the guard and silently diverge
    from torch.stft's reflect-pad contract."""
    import jax.numpy as jnp
    import pytest

    from maest_tpu.dsp.mel import log_mel_spectrogram

    with pytest.raises(ValueError, match="too short"):
        log_mel_spectrogram(jnp.zeros(256, jnp.float32))
    out = log_mel_spectrogram(jnp.zeros(257, jnp.float32))
    assert out.shape[0] == 96


def test_surgery_remove_too_many_blocks_raises():
    import jax
    import pytest

    from maest_tpu.models.config import MAESTConfig
    from maest_tpu.models.surgery import lighten_model
    from maest_tpu.models.vit import init_params

    cfg = MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10), embed_dim=64,
        depth=4, num_heads=4, num_classes=4, distilled=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="remove_n_blocks"):
        lighten_model(params, cfg, remove_n_blocks=5)
    out, cfg2 = lighten_model(params, cfg, remove_n_blocks=2)
    assert cfg2.depth == 2


def test_count_non_zero_params_empty():
    from maest_tpu.utils.params import count_non_zero_params

    assert count_non_zero_params({})["sparsity"] == 0.0


def test_tpu_execution_knobs_config_keys_wired():
    """`maest.remat` / `remat_policy` / `attention_quant` must reach the
    model config (no dead keys — the strict-override philosophy) and
    invalid values must fail at build time, not at trace time."""
    import pytest

    from maest_tpu.models.registry import build_config

    cfg = build_config("discogs-maest-5s-pw-129e", remat=True,
                       remat_policy="dots", attention_quant="qk8")
    assert cfg.remat and cfg.remat_policy == "dots"
    assert cfg.attention_quant == "qk8"
    with pytest.raises(ValueError, match="attention_quant"):
        build_config("discogs-maest-5s-pw-129e", attention_quant="int4")
    with pytest.raises(ValueError, match="remat_policy"):
        build_config("discogs-maest-5s-pw-129e", remat_policy="everything")
    with pytest.raises(ValueError, match="attention_bwd_quant"):
        build_config("discogs-maest-5s-pw-129e", attention_bwd_quant="fp8")

    import inspect

    from maest_tpu import configs
    from maest_tpu.train import loop as loop_mod

    for key in ("remat", "remat_policy", "attention_quant",
                "attention_bwd_quant"):
        assert key in configs.default_config()["maest"]
        assert f'm.get("{key}"' in inspect.getsource(loop_mod)


def test_patchout_drop_indices_validated():
    """Deterministic patchout must reject index sets that empty the grid
    or name rows outside it — an empty axis would flow through to NaN
    token means instead of an error (mirrors the random-patchout guard)."""
    import pytest

    from maest_tpu.models.vit import _static_keep_indices

    with pytest.raises(ValueError, match="out of range"):
        _static_keep_indices(4, (0, 7), 0)
    with pytest.raises(ValueError, match="all 4 rows"):
        _static_keep_indices(4, (0, 1, 2, 3), 0)
    kept = _static_keep_indices(4, (1, 3), 0)
    assert kept.tolist() == [0, 2]


def test_non_distilled_block_embedding_layout():
    """With distilled=False the patch tokens start at index 1: the block-k
    embedding must be [cls | mean(tokens 1:)] (2E-d), not mislabel patch
    token 1 as a dist token and drop it from the mean."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maest_tpu.models.config import MAESTConfig
    from maest_tpu.models.vit import MAESTNet, init_params

    cfg = MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10), embed_dim=64,
        depth=2, num_heads=4, num_classes=4, distilled=False,
    )
    net = MAESTNet(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 26, 46, 1)),
                    jnp.float32)
    _, emb = net.apply({"params": params}, x, train=False,
                       transformer_block=1)
    assert emb.shape == (2, 2 * cfg.embed_dim)
    assert bool(jnp.isfinite(emb).all())
    # cross-check against the raw token stream: cls == layer-1 token 0,
    # mean over ALL remaining (real) tokens
    out = net.apply({"params": params}, x, train=False,
                    return_layer_tokens=True)
    layer_tokens = out[-1][1]  # layer-1 tokens, (b, n_tokens, E)
    np.testing.assert_allclose(
        np.asarray(emb[:, :cfg.embed_dim]),
        np.asarray(layer_tokens[:, 0, :]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(emb[:, cfg.embed_dim:]),
        np.asarray(layer_tokens[:, 1:, :].mean(axis=1)), rtol=1e-5,
        atol=1e-5)


def test_removed_reference_keys_rejected_with_pointer():
    """Reference launch-surface keys with no JAX equivalent (the repo's own
    cited ex_maest519.sh uses two of them) must fail with the translation,
    not a bare 'unknown key'."""
    import pytest

    from maest_tpu.configs import apply_override, default_config, parse_override

    cfg = default_config()
    for key, frag in (
        ("trainer.num_sanity_val_steps=0", "sanity"),
        ("trainer.num_nodes=1", "init_distributed"),
        ("trainer.sync_batchnorm=True", "batch-norm"),
        ("datamodule.num_replicas=4", "process_index"),
    ):
        with pytest.raises(KeyError, match=frag):
            apply_override(cfg, *parse_override(key))


def test_teacher_student_presets_keep_reference_random_init():
    """The reference TS named configs never set 'pretrained' and so run
    with the Sacred default False (config_updates.py:197-236 vs
    maest.py:1447) — the presets must preserve that quirk instead of
    inheriting pretrained=True from the plain pretrain preset."""
    from maest_tpu.configs import PRESETS, build_experiment_config

    for name in ("maest_30s_from_passt_teacher_student_pretrain",
                 "maest_30s_from_passt_teacher_student_inference"):
        assert PRESETS[name]["maest"]["pretrained"] is False
        cfg = build_experiment_config([name])
        assert cfg["maest"]["pretrained"] is False
    # the non-TS siblings DO load pretrained weights
    cfg = build_experiment_config(["maest_30s_from_passt_pretrain"])
    assert cfg["maest"]["pretrained"] is True
