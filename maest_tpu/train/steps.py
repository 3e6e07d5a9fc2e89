"""Jitted train / eval / predict steps.

One compiled XLA program per workload: normalization, SpecAugment, mixup,
the forward/backward pass and the optimizer update all run on-device
(replacing the reference's CPU dataloader transforms + Lightning loop,
reference: models/module.py:73-102, discogs/datamodule.py:126-152).
Data parallelism comes from sharding the batch over the mesh ``data`` axis;
gradient all-reduce is inserted by XLA.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..dsp import NORM_MEAN, NORM_STD
from ..models.vit import MAESTNet
from ..ops.augment import mixup, roll_augment, spec_augment
from .state import TrainState


@dataclass(frozen=True)
class AugmentConfig:
    """Defaults mirror the reference datamodule config
    (reference: discogs/datamodule.py:42-63) and mixup alpha
    (models/module.py:29)."""

    normalize: bool = True
    norm_mean: float = NORM_MEAN
    norm_std: float = NORM_STD
    masking: bool = True
    time_mask_param: int = 8
    freq_mask_param: int = 5
    mask_p: float = 0.2
    time_masks: int = 20
    freq_masks: int = 8
    iid_masks: bool = True
    mixup_alpha: float = 0.3
    # roll augmentation (off by default, reference: discogs/datamodule.py:43,111-124)
    roll: bool = False
    roll_axis: int = -1
    roll_shift_range: int = 50
    roll_shift: int | None = None  # fixed shift overrides the random range


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _prepare(x: jnp.ndarray, aug: AugmentConfig, key, train: bool) -> jnp.ndarray:
    """Normalize (+ roll/SpecAugment when training) a (B, F, T) mel batch
    and return NHWC (B, F, T, 1)."""
    x = x.astype(jnp.float32)
    if aug.normalize:
        x = (x - aug.norm_mean) / (aug.norm_std * 2.0)
    if train and aug.roll:
        key, k_roll = jax.random.split(key)
        x = roll_augment(k_roll, x, aug.roll_shift_range, axis=aug.roll_axis,
                         shift=aug.roll_shift)
    if train and aug.masking:
        x = spec_augment(
            key,
            x,
            time_mask_param=aug.time_mask_param,
            freq_mask_param=aug.freq_mask_param,
            p=aug.mask_p,
            time_masks=aug.time_masks,
            freq_masks=aug.freq_masks,
            iid_masks=aug.iid_masks,
        )
    return x[..., None]


def make_train_step(
    net: MAESTNet,
    tx: optax.GradientTransformation,
    aug: AugmentConfig = AugmentConfig(),
    *,
    teacher_student: bool = False,
    donate: bool = True,
    apply_fn=None,
):
    """Build the jitted train step.

    Batch: dict with ``x`` (B, F, T) raw log-mel float16/32, ``y`` (B, C)
    [and ``y_teacher`` (B, C) for teacher-student]. Loss is BCE, or the
    mean of student/teacher BCE for the TS variant
    (reference: models/module.py:73-102, 280-316).

    ``apply_fn(params, x, rngs) -> net output`` overrides the plain
    sequential forward — the pipeline-parallel step passes a
    ``pipeline_apply`` closure here, sharing the whole augment / loss /
    NaN-guard body.
    """
    if apply_fn is None:
        def apply_fn(params, x, rngs):
            return net.apply({"params": params}, x, train=True, rngs=rngs)

    def step(state: TrainState, batch, rng: jax.Array):
        # Fold the step counter in on-device: callers pass one fixed base key
        # for the whole run. Host-side jax.random.split per step costs ~9 ms
        # of eager dispatch on remote/async backends.
        rng = jax.random.fold_in(rng, state.step)
        k_mask, k_mix, k_patch, k_drop, k_dropout = jax.random.split(rng, 5)

        x = _prepare(batch["x"], aug, k_mask, train=True)
        targets = (batch["y"],) if not teacher_student else (
            batch["y"], batch["y_teacher"],
        )
        x, targets = mixup(k_mix, x, targets, aug.mixup_alpha)

        def loss_fn(params):
            out = apply_fn(
                params,
                x,
                {
                    "patchout": k_patch,
                    "droppath": k_drop,
                    "dropout": k_dropout,
                },
            )
            if teacher_student:
                y_hat, y_hat_teacher = out[0], out[1]
                loss_standard = bce_with_logits(y_hat, targets[0])
                loss_teacher = bce_with_logits(y_hat_teacher, targets[1])
                loss = (loss_standard + loss_teacher) / 2
                return loss, {
                    "train_loss": loss,
                    "train_loss_standard": loss_standard,
                    "train_loss_teacher": loss_teacher,
                }
            y_hat = out[0]
            loss = bce_with_logits(y_hat, targets[0])
            return loss, {"train_loss": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return apply_guarded_update(state, tx, grads, metrics)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def apply_guarded_update(state: TrainState, tx, grads, metrics):
    """Optimizer update with the NaN guard (beyond the reference, which has
    no failure detection — SURVEY §5): a non-finite loss or gradient skips
    the update instead of poisoning 87M parameters; the skip count is
    surfaced as a metric. Shared by the plain and pipeline-parallel steps."""
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    grads_ok = jnp.isfinite(metrics["train_loss"])
    for leaf in jax.tree_util.tree_leaves(grads):
        grads_ok &= jnp.all(jnp.isfinite(leaf))
    new_params = jax.tree.map(
        lambda new, old: jnp.where(grads_ok, new, old),
        new_params, state.params,
    )
    new_opt = jax.tree.map(
        lambda new, old: jnp.where(grads_ok, new, old)
        if hasattr(new, "shape") else new,
        new_opt, state.opt_state,
    )
    metrics["nonfinite_skipped"] = (~grads_ok).astype(jnp.float32)

    new_state = state.replace(
        step=state.step + 1, params=new_params, opt_state=new_opt
    )
    return new_state, metrics


def make_eval_step(
    net: MAESTNet,
    aug: AugmentConfig = AugmentConfig(),
    *,
    with_swa: bool = True,
    apply_fn=None,
    out_sharding=None,
):
    """Eval step running both live and SWA weights in one program
    (reference: models/module.py:121-146).

    The device program is LOGITS-ONLY: ``step(state, x)`` returns
    ``{"": logits, "swa": logits}``. Losses / sigmoid / the
    teacher-student eval asymmetry are computed on HOST from the gathered
    logits (loop.py::_run_eval, matching reference models/module.py:90,
    326-331) — feeding targets into the jitted step would transfer them
    host->device over the ~50 MB/s relay only to ship derived scalars
    back, and eval metrics need the full logits host-side anyway.

    ``apply_fn(params, x) -> net output`` overrides the plain sequential
    forward — the pipeline-parallel Trainer passes a ``pipeline_apply``
    closure here so eval runs under the same (data, pipe) mesh.

    ``out_sharding`` (multi-process runs): a replicated NamedSharding for
    every output leaf. Without it the logits stay batch-sharded, which a
    host cannot fetch when the batch spans other processes' devices —
    replication on-device is the multi-host equivalent of the reference's
    eval ``all_gather`` (reference: models/module.py:163-180).
    """
    if apply_fn is None:
        def apply_fn(params, x):
            return net.apply({"params": params}, x, train=False)

    def one(params, x):
        return apply_fn(params, x)[0].astype(jnp.float32)

    def step(state: TrainState, x):
        x = _prepare(x, aug, None, train=False)
        out = {"": one(state.params, x)}
        if with_swa:
            out["swa"] = one(state.swa_params, x)
        return out

    if out_sharding is not None:
        return jax.jit(step, out_shardings=out_sharding)
    return jax.jit(step)


def make_predict_step(net: MAESTNet, aug: AugmentConfig = AugmentConfig()):
    """Predict step returning logits + block-k embeddings
    (reference: models/module.py:104-112)."""

    @functools.partial(jax.jit, static_argnames=("transformer_block",))
    def step(params, batch, transformer_block: int):
        x = _prepare(batch["x"], aug, None, train=False)
        # one forward for both outputs: tap_block captures the block-k
        # 2304-d embedding along the way (identical to the truncated
        # transformer_block == k forward — eval is deterministic), instead
        # of re-running blocks 0..k a second time
        out = net.apply(
            {"params": params}, x, train=False, tap_block=transformer_block
        )
        return {"logits": out[0], "embeddings": out[-1]}

    return step
