"""Mel-spectrogram extraction kernels (JAX, TPU-friendly).

HiFi-GAN-compatible mel extraction: centered reflect-padded STFT with a
periodic Hann window, magnitude ``sqrt(re^2 + im^2 + 1e-9)``, Slaney-norm
mel filterbank, ``log(clamp(mel, min_clipping))``.

Behavioral parity target:
/root/reference/src/daft_exprt/extract_features.py:330-359 (which uses
torch.stft + librosa.filters.mel). The filterbank reimplements the
librosa 0.8.1 default (htk=False, norm='slaney') natively since librosa
is not a dependency of this framework.

All functions are shape-polymorphic pure functions; wrap in jit with
bucketed shapes for TPU preprocessing throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# Mel filterbank (librosa-compatible, Slaney scale + Slaney norm)
# ----------------------------------------------------------------------
def _hz_to_mel(freq):
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freq = np.asanyarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels)
    return mels


def _mel_to_hz(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filter_bank(sampling_rate: int, n_fft: int, n_mels: int,
                    fmin: float, fmax: float) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, 1 + n_fft // 2).

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with the
    0.8.1 defaults htk=False, norm='slaney'.
    """
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, 1 + n_fft // 2)
    mel_min, mel_max = _hz_to_mel(fmin), _hz_to_mel(fmax)
    mel_f = _mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style energy normalization (area of each filter).
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ----------------------------------------------------------------------
# STFT
# ----------------------------------------------------------------------
def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window default)."""
    n = np.arange(n_fft, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(np.float32)


def num_frames(num_samples: int, n_fft: int, hop_length: int,
               center: bool = True) -> int:
    """Number of STFT frames for a signal of ``num_samples`` samples."""
    if center:
        return 1 + num_samples // hop_length
    # reference: 1 + int((n - n_fft) / hop) — int() truncates toward
    # zero, so signals shorter than one window still count 1 frame
    d = num_samples - n_fft
    return 1 + (d // hop_length if d >= 0 else -((-d) // hop_length))


def frame_signal(wav: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """Slice a (..., S) signal into overlapping frames (..., F, n_fft).

    With ``center`` the signal is reflect-padded by n_fft//2 on both
    sides (torch.stft pad_mode='reflect' semantics).
    """
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (wav.ndim - 1) + [(pad, pad)]
        wav = jnp.pad(wav, pad_widths, mode="reflect")
    n_samples = wav.shape[-1]
    n_f = 1 + (n_samples - n_fft) // hop_length
    starts = jnp.arange(n_f) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return wav[..., idx]


def stft_magnitude(wav: jnp.ndarray, n_fft: int, hop_length: int,
                   center: bool = True) -> jnp.ndarray:
    """Magnitude spectrogram (..., 1 + n_fft//2, F).

    Matches torch.stft(...).pow(2).sum(-1).add(1e-9).sqrt() with a
    periodic Hann window.
    """
    window = jnp.asarray(hann_window(n_fft))
    frames = frame_signal(wav, n_fft, hop_length, center) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    return jnp.swapaxes(mag, -1, -2)


def mel_spectrogram(wav: jnp.ndarray, sampling_rate: int, n_fft: int,
                    hop_length: int, n_mels: int, fmin: float, fmax: float,
                    min_clipping: float = 1e-5,
                    center: bool = True) -> jnp.ndarray:
    """Log-mel spectrogram (..., n_mels, F) -- HiFi-GAN-exact recipe."""
    mag = stft_magnitude(wav, n_fft, hop_length, center)
    fb = jnp.asarray(mel_filter_bank(sampling_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,...ft->...mt", fb, mag)
    return jnp.log(jnp.clip(mel, min=min_clipping))


def mel_spectrogram_hifi(wav, hparams) -> np.ndarray:
    """Convenience wrapper taking a HyperParams object; returns numpy.

    Drop-in behavioral equivalent of the reference
    ``mel_spectrogram_HiFi`` (extract_features.py:330-359).
    """
    mel = mel_spectrogram(
        jnp.asarray(wav, dtype=jnp.float32),
        sampling_rate=hparams.sampling_rate,
        n_fft=hparams.filter_length,
        hop_length=hparams.hop_length,
        n_mels=hparams.n_mel_channels,
        fmin=hparams.mel_fmin,
        fmax=hparams.mel_fmax,
        min_clipping=hparams.min_clipping,
        center=hparams.centered,
    )
    return np.asarray(mel)


def extract_energy(mel_spec: np.ndarray) -> np.ndarray:
    """Per-frame energy: L2 norm over mel channels of the linear mel.

    ``mel_spec`` is the *linear* (exp'd) mel, shape (n_mels, F).
    """
    return np.linalg.norm(mel_spec, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "sampling_rate", "n_fft", "hop_length", "n_mels", "fmin", "fmax",
    "min_clipping", "center"))
def mel_and_energy_batch(wavs: jnp.ndarray, sampling_rate: int, n_fft: int,
                         hop_length: int, n_mels: int, fmin: float,
                         fmax: float, min_clipping: float = 1e-5,
                         center: bool = True):
    """Batched (B, S) -> (log-mel (B, n_mels, F), frame energy (B, F)).

    The on-TPU preprocessing path: call with bucketed S so every batch
    hits a cached executable; crop per-utterance frames on host.
    """
    log_mel = mel_spectrogram(wavs, sampling_rate, n_fft, hop_length,
                              n_mels, fmin, fmax, min_clipping, center)
    energy = jnp.linalg.norm(jnp.exp(log_mel), axis=-2)
    return log_mel, energy
