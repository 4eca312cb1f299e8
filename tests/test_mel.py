"""Mel/STFT kernel tests: exact parity with the torch.stft recipe."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from daft_exprt_tpu.config import HyperParams
from daft_exprt_tpu.ops.mel import (extract_energy, hann_window,
                                    mel_filter_bank, mel_spectrogram_hifi,
                                    num_frames, stft_magnitude)


@pytest.fixture(scope="module")
def hp():
    return HyperParams(verbose=False, training_files="x",
                       validation_files="x", output_directory="/tmp/dx_test",
                       language="english", speakers=["spk"])


def _torch_magnitude(wav, n_fft, hop):
    spec = torch.stft(torch.from_numpy(wav).float(), n_fft, hop_length=hop,
                      win_length=n_fft, window=torch.hann_window(n_fft),
                      center=True, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    return torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).numpy()


def test_hann_window_matches_torch():
    ours = hann_window(1024)
    theirs = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_magnitude_matches_torch(rng_np):
    wav = rng_np.standard_normal(22050).astype(np.float32) * 0.3
    ours = np.asarray(stft_magnitude(jnp.asarray(wav), 1024, 256))
    theirs = _torch_magnitude(wav, 1024, 256)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_num_frames_centered():
    assert num_frames(22050, 1024, 256) == 1 + 22050 // 256


def test_mel_filter_bank_properties():
    fb = mel_filter_bank(22050, 1024, 80, 0, 8000)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support
    assert np.all(fb.sum(axis=1) > 0)
    # filters only occupy bins below fmax
    freqs = np.linspace(0, 22050 / 2, 513)
    active = fb.sum(axis=0) > 0
    assert freqs[active].max() <= 8000 + freqs[1]
    # slaney normalization: peak amplitudes shrink as bandwidth grows
    peaks = fb.max(axis=1)
    assert peaks[-1] < peaks[10]


def test_mel_filter_bank_spot_value():
    """Independently derived spot check of the Slaney mel formula.

    For fmin=0, fmax=8000, n_mels=80: mel_max = 15 + ln(8)/ (ln(6.4)/27),
    82 breakpoints linearly spaced in mel, converted back to Hz with
    f = mel * 200/3 (all breakpoints of filter 0 are < 1 kHz). Filter 0 at
    fft bin 1 is min(rising, falling ramp) * 2 / bandwidth.
    """
    fb = mel_filter_bank(22050, 1024, 80, 0, 8000)
    f_sp = 200.0 / 3
    mel_max = 15.0 + np.log(8000.0 / 1000.0) / (np.log(6.4) / 27.0)
    step = mel_max / 81.0
    f1, f2 = step * f_sp, 2 * step * f_sp  # first two breakpoints in Hz
    bin1 = 22050.0 / 2.0 / 512.0
    expected = min(bin1 / f1, (f2 - bin1) / (f2 - f1)) * 2.0 / f2
    assert abs(fb[0, 1] - expected) < 1e-6
    assert fb[0, 0] == 0.0


def test_mel_spectrogram_pipeline(hp, rng_np):
    wav = rng_np.standard_normal(33075).astype(np.float32) * 0.2
    mel = mel_spectrogram_hifi(wav, hp)
    assert mel.shape == (80, 1 + len(wav) // 256)
    # log-clamped: all values >= log(min_clipping)
    assert mel.min() >= np.log(1e-5) - 1e-5
    # cross-check against torch stft + our filterbank
    mag = _torch_magnitude(wav, 1024, 256)
    fb = mel_filter_bank(22050, 1024, 80, 0, 8000)
    ref = np.log(np.clip(fb @ mag, 1e-5, None))
    np.testing.assert_allclose(mel, ref, rtol=2e-3, atol=2e-3)


def test_extract_energy():
    mel = np.exp(np.random.default_rng(0).standard_normal((80, 10)))
    energy = extract_energy(mel)
    assert energy.shape == (10,)
    np.testing.assert_allclose(energy, np.linalg.norm(mel, axis=0),
                               rtol=1e-6)
