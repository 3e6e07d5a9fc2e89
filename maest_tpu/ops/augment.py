"""On-device data augmentation, fused into the jitted train step.

The reference applies mixup in ``training_step`` (reference:
models/module.py:77-86, helpers/mixup.py:5-12) and SpecAugment masking on CPU
inside dataloader workers (reference: helpers/spec_masking.py:27-33,
discogs/datamodule.py:140-152). Here both are pure jittable functions of a
PRNG key so they run inside the compiled graph on TPU (BASELINE.json north
star) — masking a (B, F, T) spectrogram batch costs a couple of fused VPU
passes instead of 28 sequential CPU transform calls per sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixup(key: jax.Array, x: jnp.ndarray, targets: tuple[jnp.ndarray, ...],
          alpha: float):
    """Batch mixup with max(lambda, 1-lambda) Beta weights.

    Matches ``my_mixup`` + its application (reference: helpers/mixup.py:5-12,
    models/module.py:77-86): a random pairing permutation and per-sample
    lambda drawn from Beta(alpha, alpha), folded to >= 0.5.

    Args:
      key: PRNG key.
      x: inputs, leading batch dim.
      targets: tuple of target arrays (student target, optionally teacher
        target), each (B, C).
      alpha: Beta parameter; <= 0 disables mixup.

    Returns:
      (mixed_x, tuple_of_mixed_targets)
    """
    if alpha <= 0:
        return x, targets
    b = x.shape[0]
    k_perm, k_lam = jax.random.split(key)
    perm = jax.random.permutation(k_perm, b)
    lam = jax.random.beta(k_lam, alpha, alpha, (b,))
    lam = jnp.maximum(lam, 1.0 - lam).astype(x.dtype)

    lam_x = lam.reshape((b,) + (1,) * (x.ndim - 1))
    x = x * lam_x + jnp.take(x, perm, axis=0) * (1.0 - lam_x)
    mixed = tuple(
        t * lam.reshape(b, 1).astype(t.dtype)
        + jnp.take(t, perm, axis=0) * (1.0 - lam.reshape(b, 1)).astype(t.dtype)
        for t in targets
    )
    return x, mixed


def _axis_masks(key: jax.Array, b: int, axis_len: int, n_masks: int,
                max_width: int, p: float, iid: bool = True) -> jnp.ndarray:
    """Boolean keep-mask (B, axis_len) after ``n_masks`` random masks.

    torchaudio semantics (TimeMasking/FrequencyMasking): width ~ U[0, W),
    additionally capped at p * axis_len for time masks; start ~ U[0, L - width].
    ``iid=False`` = torchaudio ``iid_masks=False``: ONE width/start per mask
    shared by the whole batch (returned with B=1, broadcast by the caller).
    """
    if not iid:
        b = 1
    k_w, k_s = jax.random.split(key)
    cap = jnp.floor(p * axis_len) if p < 1.0 else float(axis_len)
    widths = jax.random.uniform(k_w, (n_masks, b)) * jnp.minimum(
        float(max_width), cap
    )
    widths = jnp.floor(widths)  # (M, B)
    starts = jnp.floor(
        jax.random.uniform(k_s, (n_masks, b)) * (axis_len - widths)
    )
    pos = jnp.arange(axis_len)[None, None, :]
    masked = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return ~jnp.any(masked, axis=0)  # (B, axis_len) True = keep


def spec_augment(
    key: jax.Array,
    x: jnp.ndarray,  # (B, F, T) or (B, F, T, C)
    *,
    time_mask_param: int = 8,
    freq_mask_param: int = 5,
    p: float = 0.2,
    time_masks: int = 20,
    freq_masks: int = 8,
    mask_value: float = 0.0,
    iid_masks: bool = True,
) -> jnp.ndarray:
    """SpecAugment with torchaudio-equivalent mask statistics
    (reference: helpers/spec_masking.py:4-33; defaults from
    discogs/datamodule.py:55-63, including ``iid_masks``: False shares each
    mask across the batch, as torchaudio's batched 4-D path does)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    b, f, t, _ = x.shape
    k_t, k_f = jax.random.split(key)
    keep_t = _axis_masks(k_t, b, t, time_masks, time_mask_param, p,
                         iid=iid_masks)
    keep_f = _axis_masks(k_f, b, f, freq_masks, freq_mask_param, 1.0,
                         iid=iid_masks)
    keep = keep_f[:, :, None] & keep_t[:, None, :]
    x = jnp.where(keep[..., None], x, jnp.asarray(mask_value, x.dtype))
    return x[..., 0] if squeeze else x


def roll_augment(key: jax.Array, x: jnp.ndarray, shift_range: int,
                 axis: int = -1, shift: int | None = None) -> jnp.ndarray:
    """Circular shift along the time axis: a fixed ``shift`` when given,
    otherwise uniform in [-shift_range, shift_range]
    (reference: discogs/datamodule.py:111-124; off by default)."""
    if shift is None:
        shift = jax.random.randint(key, (), -shift_range, shift_range + 1)
    return jnp.roll(x, shift, axis=axis)
