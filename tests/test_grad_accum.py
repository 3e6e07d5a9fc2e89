"""Gradient accumulation (optax.MultiSteps — Lightning's
accumulate_grad_batches, which the reference exposes but never sets).

Contract: k accumulation micro-steps over k equal slices of a batch must
produce the SAME parameter update as one step over the full batch, and the
NaN guard must still protect the accumulator.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maest_tpu.models.config import MAESTConfig
from maest_tpu.models.vit import MAESTNet, init_params
from maest_tpu.train.state import TrainState, make_optimizer
from maest_tpu.train.steps import AugmentConfig, make_train_step


def _setup():
    cfg = MAESTConfig(
        img_size=(26, 46), patch_size=16, stride=(10, 10),
        embed_dim=64, depth=2, num_heads=4, num_classes=8, distilled=True,
    )
    net = MAESTNet(cfg, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    # deterministic step: no masking / mixup / dropout
    aug = AugmentConfig(masking=False, mixup_alpha=0.0)
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.standard_normal((8, 26, 46)).astype(np.float32),
        "y": (rng.random((8, 8)) > 0.7).astype(np.float32),
    }
    return net, params, aug, batch


def test_two_half_batches_match_one_full_batch():
    net, params, aug, batch = _setup()
    key = jax.random.PRNGKey(1)

    tx_full = make_optimizer(lr_schedule=1e-3, adamw=True, weight_decay=1e-4)
    step_full = make_train_step(net, tx_full, aug, donate=False)
    st_full, _ = step_full(TrainState.create(params, tx_full), batch, key)

    tx_acc = make_optimizer(lr_schedule=1e-3, adamw=True, weight_decay=1e-4,
                            accumulate_steps=2)
    step_acc = make_train_step(net, tx_acc, aug, donate=False)
    st = TrainState.create(params, tx_acc)
    for half in (slice(0, 4), slice(4, 8)):
        st, m = step_acc(
            st, {"x": batch["x"][half], "y": batch["y"][half]}, key
        )

    for a, b in zip(jax.tree_util.tree_leaves(st_full.params),
                    jax.tree_util.tree_leaves(st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_params_frozen_between_optimizer_steps():
    net, params, aug, batch = _setup()
    tx = make_optimizer(lr_schedule=1e-3, adamw=True, accumulate_steps=4)
    step = make_train_step(net, tx, aug, donate=False)
    st0 = TrainState.create(params, tx)
    st1, _ = step(st0, batch, jax.random.PRNGKey(1))
    # first micro-step: gradients accumulated, parameters unchanged
    for a, b in zip(jax.tree_util.tree_leaves(st0.params),
                    jax.tree_util.tree_leaves(st1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_guard_protects_accumulator():
    net, params, aug, batch = _setup()
    tx = make_optimizer(lr_schedule=1e-3, adamw=True, accumulate_steps=2)
    step = make_train_step(net, tx, aug, donate=False)
    st = TrainState.create(params, tx)
    bad = {"x": np.full_like(batch["x"], np.nan), "y": batch["y"]}
    st_after, m = step(st, bad, jax.random.PRNGKey(1))
    assert float(m["nonfinite_skipped"]) == 1.0
    # the whole state (params AND the grad accumulator) is unchanged
    for a, b in zip(jax.tree_util.tree_leaves(st.opt_state),
                    jax.tree_util.tree_leaves(st_after.opt_state)):
        if hasattr(a, "shape"):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
