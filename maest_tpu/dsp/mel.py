"""TPU-native log-mel front-end.

Numerically equivalent to the reference inference extractor
(reference: models/helpers/melspectrogram.py:13-60):

    Spectrogram(n_fft=512, win_length=512, hop_length=256, power=2)
    -> MelScale(96 mels, sr=16000, slaney norm & scale)
    -> log10(1 + 10000 * mel)
    -> (x - 2.06755686098554) / (1.268292820667291 * 2)

Design notes (TPU-first):
  * hop == n_fft // 2, so every STFT frame is the concatenation of two
    consecutive 256-sample blocks; framing is a reshape + slice + concat,
    no gather.
  * The 512-point real DFT is computed as two matmuls against static
    cosine/sine matrices -- this rides the MXU and lets XLA fuse the
    window multiply, square-add, mel projection, log-compression and
    z-norm into a couple of kernels.
  * Everything is static-shape; the function is jit-friendly and vmaps
    over leading batch dims.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .filterbank import dft_matrices, hann_window, mel_filterbank

SAMPLE_RATE = 16000
N_FFT = 512
WIN_LENGTH = 512
HOP_LENGTH = 256
N_MELS = 96
# Discogs dataset statistics (reference: models/maest.py:37-38).
NORM_MEAN = 2.06755686098554
NORM_STD = 1.268292820667291


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = SAMPLE_RATE
    n_fft: int = N_FFT
    win_length: int = WIN_LENGTH
    hop_length: int = HOP_LENGTH
    n_mels: int = N_MELS
    norm_mean: float = NORM_MEAN
    norm_std: float = NORM_STD
    compression_scale: float = 10000.0


def _frame_half_overlap(padded: jnp.ndarray, n_frames: int, hop: int) -> jnp.ndarray:
    """Frame a 1-D padded signal into (n_frames, 2*hop) without gathers.

    Requires win == 2 * hop. ``padded`` must have length >= (n_frames+1)*hop.
    """
    blocks = padded[: (n_frames + 1) * hop].reshape(n_frames + 1, hop)
    return jnp.concatenate([blocks[:-1], blocks[1:]], axis=1)


def num_frames(n_samples: int, cfg: MelConfig = MelConfig()) -> int:
    """STFT frame count for a centered transform (torch.stft center=True)."""
    return 1 + n_samples // cfg.hop_length


def log_mel_spectrogram(
    waveform: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    normalize: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Compute the normalized log-mel spectrogram.

    Args:
      waveform: float array shaped ``(n_samples,)`` or ``(batch, n_samples)``.
      cfg: front-end constants.
      normalize: apply the Discogs z-norm (matches the reference, which
        always normalizes in ``MelSpectrogram.forward``).
      impl: ``"auto"`` (fused Pallas kernel on TPU, XLA elsewhere),
        ``"pallas"``, or ``"xla"`` (the numerics oracle).

    Returns:
      ``(..., n_mels, n_frames)`` float32 array, n_frames = 1 + n_samples//hop.
    """
    if impl == "auto":
        from ..ops.mel_kernel import use_fused_mel

        impl = "pallas" if use_fused_mel() else "xla"
    fn = lambda w: _log_mel_1d(w, cfg, normalize, fused=impl == "pallas")
    if waveform.ndim == 1:
        return fn(waveform)
    if waveform.ndim == 2:
        return jax.vmap(fn)(waveform)
    raise ValueError(f"waveform must be 1-D or 2-D, got shape {waveform.shape}")


def _log_mel_1d(waveform: jnp.ndarray, cfg: MelConfig, normalize: bool,
                fused: bool = False) -> jnp.ndarray:
    n = waveform.shape[0]
    hop = cfg.hop_length
    n_fft = cfg.n_fft
    if cfg.win_length != n_fft or hop * 2 != n_fft:
        raise NotImplementedError("front-end assumes win == n_fft == 2 * hop")
    if n <= n_fft // 2:
        # torch.stft(center=True, pad_mode="reflect") requires
        # n > n_fft//2 (reflect pad of size n is undefined at n == pad);
        # jnp.pad would silently tolerate it and diverge from the oracle
        raise ValueError(
            f"waveform too short: {n} samples (need > {n_fft // 2})"
        )

    waveform = waveform.astype(jnp.float32)
    pad = n_fft // 2
    # torch.stft(center=True, pad_mode="reflect")
    padded = jnp.pad(waveform, (pad, pad), mode="reflect")

    frames_total = 1 + n // hop
    # padded always covers the frame span: len = n + n_fft while the last
    # frame ends at (frames_total + 1) * hop = n_fft + (n // hop) * hop
    # <= n + n_fft (half-overlap framing, hop = n_fft // 2) — so no tail
    # pad is ever needed; shapes are static under jit, assert the invariant
    assert padded.shape[0] >= (frames_total + 1) * hop
    frames = _frame_half_overlap(padded, frames_total, hop)  # (T, n_fft)

    if fused:
        from ..ops.mel_kernel import fused_logmel_from_frames

        logmel = fused_logmel_from_frames(
            frames,
            n_fft=n_fft,
            n_mels=cfg.n_mels,
            sample_rate=cfg.sample_rate,
            compression_scale=cfg.compression_scale,
            norm_mean=cfg.norm_mean,
            norm_std=cfg.norm_std,
            normalize=normalize,
        )
        return logmel.T  # (n_mels, T)

    window = jnp.asarray(hann_window(cfg.win_length))
    cos_m, sin_m = dft_matrices(n_fft)
    cos_m = jnp.asarray(cos_m)
    sin_m = jnp.asarray(sin_m)

    fw = frames * window[None, :]
    # force full-fp32 matmuls: TPU default precision rounds inputs to bf16,
    # blowing the <1e-3 front-end parity budget
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(fw, cos_m, precision=hi, preferred_element_type=jnp.float32)
    im = jnp.dot(fw, sin_m, precision=hi, preferred_element_type=jnp.float32)
    power = re * re + im * im  # (T, n_bins)

    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate))
    mel = jnp.dot(power, fb, precision=hi,
                  preferred_element_type=jnp.float32)  # (T, n_mels)

    logmel = jnp.log10(1.0 + mel * cfg.compression_scale)
    if normalize:
        logmel = (logmel - cfg.norm_mean) / (cfg.norm_std * 2.0)
    return logmel.T  # (n_mels, T) to match torchaudio layout


def log_mel_spectrogram_np(waveform: np.ndarray, cfg: MelConfig = MelConfig(),
                           *, normalize: bool = True) -> np.ndarray:
    """Pure-numpy oracle of :func:`log_mel_spectrogram` (for tests/offline)."""
    waveform = np.asarray(waveform, dtype=np.float64)
    if waveform.ndim == 2:
        return np.stack([log_mel_spectrogram_np(w, cfg, normalize=normalize)
                         for w in waveform])
    pad = cfg.n_fft // 2
    padded = np.pad(waveform, (pad, pad), mode="reflect")
    frames_total = 1 + waveform.shape[0] // cfg.hop_length
    window = hann_window(cfg.win_length).astype(np.float64)
    spec = np.empty((frames_total, cfg.n_fft // 2 + 1))
    for t in range(frames_total):
        seg = padded[t * cfg.hop_length : t * cfg.hop_length + cfg.n_fft]
        spec[t] = np.abs(np.fft.rfft(seg * window)) ** 2
    fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate).astype(np.float64)
    mel = spec @ fb
    logmel = np.log10(1.0 + mel * cfg.compression_scale)
    if normalize:
        logmel = (logmel - cfg.norm_mean) / (cfg.norm_std * 2.0)
    return logmel.T.astype(np.float32)
