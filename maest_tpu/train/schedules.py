"""Learning-rate schedules.

Epoch-indexed multiplier functions matching the reference
(reference: helpers/ramp.py:21-109, 124-137; selected in
models/module.py:213-226), exposed both as plain callables and as optax
step-indexed schedules.
"""

from __future__ import annotations

import numpy as np
import optax


def exp_rampup(rampup_length: int):
    """Exponential warmup (reference: helpers/ramp.py:21-32)."""

    def f(epoch):
        if epoch < rampup_length:
            e = np.clip(epoch, 0.5, rampup_length)
            phase = 1.0 - e / rampup_length
            return float(np.exp(-5.0 * phase * phase))
        return 1.0

    return f


def linear_rampdown(rampdown_length: int, start: int = 0, last_value: float = 0.0):
    """Linear rampdown after ``start`` (reference: helpers/ramp.py:47-63)."""

    def f(epoch):
        if epoch <= start:
            return 1.0
        if epoch - start < rampdown_length:
            return float(
                last_value
                + (1.0 - last_value) * (rampdown_length - epoch + start) / rampdown_length
            )
        return float(last_value)

    return f


def exp_warmup_linear_down(warmup: int, rampdown_length: int, start_rampdown: int,
                           last_value: float):
    """Warmup * rampdown composition (reference: helpers/ramp.py:102-109)."""
    up = exp_rampup(warmup)
    down = linear_rampdown(rampdown_length, start_rampdown, last_value)

    def f(epoch):
        return up(epoch) * down(epoch)

    return f


def cosine_cycle(cycle_len: int = 20, ramp_down_start: int = 100,
                 last_lr_value: float = 0.01):
    """Cyclic cosine with floor (reference: helpers/ramp.py:124-137)."""
    ramp_down_start = cycle_len + (ramp_down_start - 1) // cycle_len * cycle_len

    def f(epoch):
        # floor division, as the reference: for odd cycle lengths
        # (epoch + len/2) shifts the cosine phase and changes the LR at
        # EVERY epoch (10x at epoch 0 for the default warm_up_len=5)
        ep = (epoch + cycle_len // 2.0) / (1.0 * cycle_len)
        if epoch > ramp_down_start:
            return float(last_lr_value)
        return float(
            last_lr_value
            + (1.0 - last_lr_value) * 0.5 * (np.cos(2.0 * np.pi * ep) + 1)
        )

    return f


def make_schedule(
    schedule_mode: str,
    base_lr: float,
    steps_per_epoch: float,
    *,
    warm_up_len: int = 5,
    ramp_down_start: int = 50,
    ramp_down_len: int = 50,
    last_lr_value: float = 0.01,
) -> optax.Schedule:
    """Step-indexed optax schedule applying the epoch-wise multiplier
    (the reference steps LambdaLR once per epoch; we hold the multiplier
    constant within an epoch for identical trajectories).

    ``steps_per_epoch`` may be fractional: under gradient accumulation the
    schedule is indexed by OPTIMIZER steps, of which there are
    steps_per_epoch/accum per epoch — not necessarily an integer."""
    if schedule_mode == "exp_lin":
        lam = exp_warmup_linear_down(
            warm_up_len, ramp_down_len, ramp_down_start, last_lr_value
        )
    elif schedule_mode == "cos_cyc":
        lam = cosine_cycle(warm_up_len, ramp_down_start, last_lr_value)
    elif schedule_mode == "constant":
        return optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"schedule_mode={schedule_mode} unknown")

    # precompute a generous epoch table; clamp beyond it
    max_epochs = 4096
    table = np.array([base_lr * lam(e) for e in range(max_epochs)], np.float32)

    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.minimum(
            jnp.asarray(step // steps_per_epoch, jnp.int32), max_epochs - 1
        )
        return jnp.asarray(table)[epoch]

    return schedule
