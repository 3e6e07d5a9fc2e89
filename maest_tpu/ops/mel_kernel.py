"""Fused log-mel front-end kernel (Pallas, TPU).

The reference computes the inference mel front-end as four separate torch
ops — STFT, mel projection, log compression, z-norm (reference:
models/helpers/melspectrogram.py:47-60) — each materializing an HBM-sized
intermediate. This kernel fuses the whole post-framing pipeline into one
VMEM-resident pass per block of frames:

    frames @ (window*cos)  -> re      (MXU)
    frames @ (window*sin)  -> im      (MXU)
    re^2 + im^2            -> power   (VPU)
    power @ mel_fb         -> mel     (MXU)
    log10(1 + 10000*mel)   + z-norm   (VPU)

The Hann window is folded into the DFT matrices host-side, so the kernel
sees exactly three matmuls and a few elementwise passes; the only HBM
traffic is frames in (T x 512 fp32) and log-mels out (T x 96 fp32).

Framing (reflect pad + 50%-overlap blocking) stays in XLA where it is a
pair of reshapes (see dsp/mel.py). The XLA mel path remains the numerics
oracle; ``tests/test_mel_kernel.py`` asserts parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..dsp.filterbank import dft_matrices, hann_window, mel_filterbank


from ..utils.shapes import round_up as _round_up  # shared tile math


def _mel_kernel(frames_ref, cosw_ref, sinw_ref, fb_ref, out_ref, *,
                scale: float, mean: float, inv_two_std: float,
                normalize: bool):
    # TPU fp32 matmuls round inputs to bf16 at default precision; the DSP
    # front-end carries the <1e-3 Essentia-parity budget, so force the
    # multi-pass fp32 path (measured 2.5e-2 error at default precision).
    f = frames_ref[:]  # (block_t, n_fft) fp32
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(f, cosw_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(f, sinw_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im  # (block_t, n_bins)
    mel = jnp.dot(power, fb_ref[:], precision=hi,
                  preferred_element_type=jnp.float32)
    logmel = jnp.log10(1.0 + mel * scale)
    if normalize:
        logmel = (logmel - mean) * inv_two_std
    out_ref[:] = logmel


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "n_mels", "sample_rate", "normalize",
                     "block_t", "interpret", "compression_scale",
                     "norm_mean", "norm_std"),
)
def fused_logmel_from_frames(
    frames: jnp.ndarray,  # (n_frames, n_fft) fp32, window NOT applied
    *,
    n_fft: int = 512,
    n_mels: int = 96,
    sample_rate: int = 16000,
    compression_scale: float = 10000.0,
    norm_mean: float = 2.06755686098554,
    norm_std: float = 1.268292820667291,
    normalize: bool = True,
    block_t: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused window+DFT+mel+log+z-norm: (n_frames, n_fft) -> (n_frames, n_mels)."""
    n_frames = frames.shape[0]
    n_bins = n_fft // 2 + 1

    window = hann_window(n_fft).astype(np.float64)
    cos_m, sin_m = dft_matrices(n_fft)
    cosw = jnp.asarray((window[:, None] * cos_m).astype(np.float32))
    sinw = jnp.asarray((window[:, None] * sin_m).astype(np.float32))
    fb = jnp.asarray(
        mel_filterbank(n_bins, n_mels, sample_rate).astype(np.float32)
    )

    t_pad = _round_up(n_frames, block_t)
    if t_pad != n_frames:
        frames = jnp.pad(frames, ((0, t_pad - n_frames), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _mel_kernel,
            scale=compression_scale,
            mean=norm_mean,
            inv_two_std=1.0 / (2.0 * norm_std),
            normalize=normalize,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_mels), jnp.float32),
        grid=(t_pad // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, n_fft), lambda i: (i, 0)),
            pl.BlockSpec((n_fft, n_bins), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, n_bins), lambda i: (0, 0)),
            pl.BlockSpec((n_bins, n_mels), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, n_mels), lambda i: (i, 0)),
        interpret=interpret,
    )(frames.astype(jnp.float32), cosw, sinw, fb)

    return out[:n_frames]


def use_fused_mel() -> bool:
    """Fused kernel on TPU backends; XLA path elsewhere (and as oracle)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False
