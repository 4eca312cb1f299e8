"""Wav file IO with resampling (scipy-based; no librosa dependency).

Capability parity with the reference's ``librosa.load(sr=...)`` +
``rescale_wav_to_float32`` usage (/root/reference/src/daft_exprt/
extract_features.py:361-384, 414-426): load any wav, rescale to
float32 in [-1, 1], polyphase-resample to the target rate.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def rescale_wav_to_float32(x: np.ndarray) -> np.ndarray:
    """Rescale an integer/float wav array to float32 in [-1, 1]."""
    if x.dtype == np.int16:
        y = x / 32768.0
    elif x.dtype == np.int32:
        y = x / 2147483648.0
    elif x.dtype == np.uint8:
        y = ((x / 255.0) - 0.5) * 2
    elif x.dtype in (np.float32, np.float64):
        y = x
    else:
        raise TypeError(f"unsupported wav sample type {x.dtype}")
    return y.astype(np.float32)


def load_wav(path: str, target_sr: int | None = None) -> tuple[np.ndarray, int]:
    """Load a wav file as mono float32 in [-1, 1], optionally resampled.

    :return: (wav, sampling_rate)
    """
    sr, data = wavfile.read(path)
    wav = rescale_wav_to_float32(np.asarray(data))
    if wav.ndim == 2:  # downmix to mono
        wav = wav.mean(axis=1).astype(np.float32)
    if target_sr is not None and target_sr != sr:
        g = math.gcd(int(target_sr), int(sr))
        wav = resample_poly(wav, target_sr // g, sr // g).astype(np.float32)
        sr = target_sr
    return wav, sr


def save_wav(path, wav: np.ndarray, sampling_rate: int):
    """Save float32 [-1, 1] (or int16) audio to a 16-bit PCM wav.

    ``path`` is a filename or an open binary file object (e.g. an
    io.BytesIO for in-memory serialization by the serving endpoint).
    """
    if wav.dtype != np.int16:
        wav = np.clip(wav, -1.0, 1.0)
        wav = (wav * 32767.0).astype(np.int16)
    wavfile.write(path, sampling_rate, wav)
