"""End-to-end training sanity: a tiny model overfits a fixed batch.

The reference has no such test (its only debug aid is the ``mini_train``
config, config_updates.py:10-14); this pins the full jitted train step —
augmentation off, BCE, AdamW, schedule — actually learning.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.train.state import TrainState, make_optimizer, swa_update
from maest_tpu.train.steps import AugmentConfig, make_eval_step, make_train_step


def test_overfit_fixed_batch():
    cfg = MAESTConfig(img_size=(26, 46), patch_size=16, stride=(10, 10),
                      embed_dim=64, depth=2, num_heads=4, num_classes=8)
    net = MAESTNet(cfg, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr_schedule=3e-3, adamw=True, weight_decay=1e-4)
    state = TrainState.create(params, tx)
    step = make_train_step(
        net, tx, AugmentConfig(masking=False, mixup_alpha=0.0), donate=False
    )

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.standard_normal((8, 26, 46)), jnp.float32),
        "y": jnp.asarray((rng.random((8, 8)) > 0.6).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)

    state, m0 = step(state, batch, key)
    first = float(m0["train_loss"])
    for _ in range(250):
        state, m = step(state, batch, key)
    last = float(m["train_loss"])
    assert np.isfinite(last)
    assert last < 0.1, (first, last)

    # SWA average tracks and evaluates (eval step is logits-only; losses
    # compute host-side from them, as in Trainer._run_eval)
    state = swa_update(state)
    eval_step = make_eval_step(net, AugmentConfig(masking=False), with_swa=True)
    out = eval_step(state, batch["x"])
    from maest_tpu.train.steps import bce_with_logits

    loss_swa = float(bce_with_logits(out["swa"], batch["y"]))
    loss_live = float(bce_with_logits(out[""], batch["y"]))
    assert np.isfinite(loss_swa)
    assert loss_live < first
