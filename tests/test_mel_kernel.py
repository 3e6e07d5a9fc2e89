"""Fused Pallas mel kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maest_tpu.dsp.mel import MelConfig, log_mel_spectrogram
from maest_tpu.ops.mel_kernel import fused_logmel_from_frames


def _frames(wave, cfg=MelConfig()):
    pad = cfg.n_fft // 2
    padded = np.pad(wave, (pad, pad), mode="reflect")
    total = 1 + len(wave) // cfg.hop_length
    target = (total + 1) * cfg.hop_length
    if len(padded) < target:
        padded = np.pad(padded, (0, target - len(padded)))
    out = np.stack([
        padded[t * cfg.hop_length:t * cfg.hop_length + cfg.n_fft]
        for t in range(total)
    ])
    return out.astype(np.float32)


@pytest.mark.parametrize("n_samples", [16000, 5 * 16000 + 123])
def test_fused_kernel_matches_xla(n_samples):
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(n_samples).astype(np.float32) * 0.2
    oracle = np.asarray(
        log_mel_spectrogram(jnp.asarray(wave), impl="xla")
    )  # (96, T)
    frames = jnp.asarray(_frames(wave))
    fused = np.asarray(
        fused_logmel_from_frames(frames, interpret=True)
    ).T  # kernel returns (T, 96)
    assert fused.shape == oracle.shape
    np.testing.assert_allclose(fused, oracle, rtol=1e-4, atol=1e-4)


def test_fused_unnormalized():
    rng = np.random.default_rng(1)
    wave = rng.standard_normal(8000).astype(np.float32)
    frames = jnp.asarray(_frames(wave))
    raw = np.asarray(fused_logmel_from_frames(frames, normalize=False,
                                              interpret=True))
    assert raw.min() >= 0.0  # log10(1 + x), x >= 0


def test_impl_dispatch_cpu_uses_xla():
    """On CPU the auto impl must pick the XLA path (oracle) and agree."""
    rng = np.random.default_rng(2)
    wave = jnp.asarray(rng.standard_normal(16000).astype(np.float32))
    a = np.asarray(log_mel_spectrogram(wave, impl="auto"))
    b = np.asarray(log_mel_spectrogram(wave, impl="xla"))
    np.testing.assert_array_equal(a, b)


def test_pallas_impl_via_interpret_batch():
    """impl='pallas' path through the public API (interpret via CPU flag)."""
    from jax.experimental import pallas as pl  # noqa: F401

    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    # on CPU pallas_call requires interpret mode; route through the kernel
    # directly per-row instead of the public impl flag
    out_rows = []
    for row in np.asarray(wave):
        frames = jnp.asarray(_frames(row))
        out_rows.append(np.asarray(
            fused_logmel_from_frames(frames, interpret=True)).T)
    fused = np.stack(out_rows)
    oracle = np.asarray(log_mel_spectrogram(wave, impl="xla"))
    np.testing.assert_allclose(fused, oracle, rtol=1e-4, atol=1e-4)
