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


def test_schedule_epoch_rate_with_non_divisible_accum():
    """Regression: with steps_per_epoch=10 and accumulate_grad_batches=4
    there are 2.5 OPTIMIZER steps per epoch. The schedule must index
    epoch floor(step / 2.5); flooring the rate to int (10 // 4 = 2) made
    the epoch-wise ramps fire ~25% early."""
    from maest_tpu.train.schedules import make_schedule

    kw = dict(warm_up_len=3, ramp_down_start=50, ramp_down_len=50,
              last_lr_value=0.01)
    sched = make_schedule("exp_lin", 1.0, 10 / 4, **kw)
    by_epoch = make_schedule("exp_lin", 1.0, 1, **kw)  # epoch == step
    # optimizer step 4 is still epoch 1 (4 // 2.5 == 1); the old int
    # rate (2) wrongly put it in epoch 2
    assert float(sched(4)) == float(by_epoch(1))
    assert float(sched(5)) == float(by_epoch(2))
    assert float(by_epoch(1)) != float(by_epoch(2))


def test_cosine_cycle_matches_reference_for_odd_cycle():
    """Regression: / 2.0 instead of the reference's // 2.0 phase offset
    (helpers/ramp.py:124-137) shifted the cosine by half an epoch for odd
    cycle lengths — 10x the LR at epoch 0 for the default warm_up_len=5."""
    from maest_tpu.train.schedules import cosine_cycle

    lam = cosine_cycle(cycle_len=5, ramp_down_start=100, last_lr_value=0.01)

    def ref(epoch, cycle_len=5, ramp_down_start=100, last_lr_value=0.01):
        import numpy as np
        ramp_down_start = cycle_len + (
            (ramp_down_start - 1) // cycle_len * cycle_len)
        ep = (epoch + cycle_len // 2.0) / (1.0 * cycle_len)
        if epoch > ramp_down_start:
            return last_lr_value
        return last_lr_value + (1.0 - last_lr_value) * 0.5 * (
            np.cos(2.0 * np.pi * ep) + 1)

    for e in range(0, 120, 7):
        assert abs(lam(e) - ref(e)) < 1e-12, e
    # the old bug: epoch 0 multiplier was last_lr_value (cos at trough)
    assert lam(0) > 0.05


def test_train_state_without_swa_has_no_buffer():
    import jax

    from maest_tpu.train.state import TrainState, make_optimizer

    tx = make_optimizer(lr_schedule=1e-3)
    params = {"w": jax.numpy.ones((4, 4))}
    st = TrainState.create(params, tx, with_swa=False)
    assert st.swa_params == {}
    st2 = TrainState.create(params, tx)
    assert st2.swa_params["w"].shape == (4, 4)
