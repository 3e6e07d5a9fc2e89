"""Mel front-end parity tests.

The reference front-end is torchaudio Spectrogram + MelScale
(reference: models/helpers/melspectrogram.py:13-60). torchaudio is not
available in this image, so the oracle is built from torch.stft (the exact
kernel torchaudio wraps) plus an independently-written slaney filterbank.
"""

import numpy as np
import pytest
import torch

from maest_tpu.dsp import (
    MelConfig,
    hann_window,
    log_mel_spectrogram,
    log_mel_spectrogram_np,
    mel_filterbank,
    num_frames,
)

CFG = MelConfig()


def torch_power_spectrogram(wave: np.ndarray) -> np.ndarray:
    """|STFT|^2 exactly as torchaudio.transforms.Spectrogram(power=2)."""
    x = torch.from_numpy(wave.astype(np.float64))
    window = torch.hann_window(CFG.win_length, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        x,
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return (spec.abs() ** 2).numpy()  # (n_bins, T)


def torch_reference_logmel(wave: np.ndarray) -> np.ndarray:
    power = torch_power_spectrogram(wave)  # (257, T)
    fb = mel_filterbank(CFG.n_fft // 2 + 1, CFG.n_mels, CFG.sample_rate).astype(
        np.float64
    )
    mel = fb.T @ power  # (96, T)
    logmel = np.log10(1.0 + mel * CFG.compression_scale)
    return (logmel - CFG.norm_mean) / (CFG.norm_std * 2.0)


@pytest.mark.parametrize("n_sec", [1, 3])
def test_logmel_matches_torch_stft(n_sec):
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(n_sec * CFG.sample_rate).astype(np.float32) * 0.3
    ours = np.asarray(log_mel_spectrogram(wave))
    ref = torch_reference_logmel(wave)
    assert ours.shape == ref.shape == (96, num_frames(len(wave)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_logmel_nonmultiple_hop_length():
    # Length not a multiple of hop: frame count and tail content must match.
    rng = np.random.default_rng(1)
    n = 16000 + 777
    wave = rng.standard_normal(n).astype(np.float32)
    ours = np.asarray(log_mel_spectrogram(wave))
    ref = torch_reference_logmel(wave)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_logmel_batched():
    rng = np.random.default_rng(2)
    waves = rng.standard_normal((2, 16000)).astype(np.float32)
    batched = np.asarray(log_mel_spectrogram(waves))
    singles = np.stack([np.asarray(log_mel_spectrogram(w)) for w in waves])
    np.testing.assert_allclose(batched, singles, rtol=1e-6, atol=1e-6)


def test_numpy_oracle_matches_jax():
    rng = np.random.default_rng(3)
    wave = rng.standard_normal(16000).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(log_mel_spectrogram(wave)),
        log_mel_spectrogram_np(wave),
        rtol=1e-4,
        atol=1e-4,
    )


def test_filterbank_properties():
    fb = mel_filterbank(257, 96, 16000)
    assert fb.shape == (257, 96)
    assert fb.min() >= 0.0
    # every filter has some support
    assert (fb.sum(axis=0) > 0).all()


def test_hann_window_matches_torch():
    ours = hann_window(512)
    ref = torch.hann_window(512, periodic=True).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
