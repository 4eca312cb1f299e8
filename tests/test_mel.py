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


def test_symbols_mean_matches_naive_loop(rng_np):
    """Per-symbol aggregation == the reference's per-marker loop
    (get_symbols_energy/get_symbols_pitch), INCLUDING the last real
    phone when trailing zero-duration symbols (EOS/punctuation) sit at
    the end — a reduceat-based version silently dropped that phone's
    final frame (round-2 review)."""
    from daft_exprt_tpu.data.features import symbols_mean

    def naive(vals, durs, voiced_only):
        out, idx = [], 0
        for d in durs:
            seg = vals[idx:idx + d]
            if voiced_only:
                seg = seg[seg > 0.0]
            out.append(float(seg.mean()) if len(seg) else 0.0)
            idx += d
        return np.array(out)

    for trial in range(20):
        n_sym = int(rng_np.integers(2, 12))
        durs = rng_np.integers(1, 7, size=n_sym)
        # sprinkle zero-duration symbols, always at least one trailing
        durs[rng_np.integers(0, n_sym, size=2)] = 0
        durs = np.append(durs, [0, 0])
        vals = rng_np.standard_normal(int(durs.sum())) + 1.0
        vals[rng_np.random(len(vals)) < 0.3] = 0.0  # unvoiced frames
        for voiced_only in (False, True):
            got = symbols_mean(vals, durs, voiced_only=voiced_only)
            np.testing.assert_allclose(
                got, naive(vals, durs, voiced_only), atol=1e-12)


def test_uncentered_batched_path_consistent(rng_np):
    """centered=False end to end: the batched device mel/energy crops
    to the uncentered frame count, pitch framing emits the same count,
    and num_frames truncates toward zero like the reference's int()
    (round-2 review: the batched path hardcoded the centered count and
    silently skipped every file under centered=False)."""
    import copy

    from daft_exprt_tpu.audio.pitch import log_f0_per_mel_frame
    from daft_exprt_tpu.data.features import _mel_energy_batched
    from daft_exprt_tpu.ops.mel import num_frames

    hp = HyperParams(verbose=False, training_files="x",
                     validation_files="x",
                     output_directory="/tmp/dx_test",
                     language="english", speakers=["spk"])
    hp = copy.deepcopy(hp)
    hp.centered = False

    # trunc-toward-zero: sub-window signals still count 1 frame
    assert num_frames(882, 1024, 256, center=False) == 1
    assert num_frames(1024, 1024, 256, center=False) == 1
    assert num_frames(1024 + 256, 1024, 256, center=False) == 2

    wavs = [rng_np.standard_normal(n).astype(np.float32) * 0.2
            for n in (33075, 22050)]
    out = _mel_energy_batched(wavs, hp)
    for w, (mel, energy) in zip(wavs, out):
        t = num_frames(len(w), hp.filter_length, hp.hop_length, False)
        assert mel.shape == (hp.n_mel_channels, t)
        assert energy.shape == (t,)
        ref = mel_spectrogram_hifi(w, hp)  # per-utterance host STFT
        assert ref.shape[1] == t
        np.testing.assert_allclose(mel, ref, atol=2e-5)
        # pitch framing agrees with the mel frame count
        track = np.full(len(w), 220.0)
        frames = log_f0_per_mel_frame(track, hp.hop_length,
                                      n_fft=hp.filter_length,
                                      center=False)
        assert len(frames) == t


def test_batched_reflect_pad_sub_window_wav(rng_np):
    """Sub-window wavs (n <= n_fft//2 + 1) must not crash the manual
    reflect pad (a stop index of -1 used to produce an empty slice and
    a broadcast error)."""
    from daft_exprt_tpu.data.features import _mel_energy_batched

    hp = HyperParams(verbose=False, training_files="x",
                     validation_files="x",
                     output_directory="/tmp/dx_test",
                     language="english", speakers=["spk"])
    short = rng_np.standard_normal(513).astype(np.float32)  # pad + 1
    long = rng_np.standard_normal(4096).astype(np.float32)
    out = _mel_energy_batched([short, long], hp)
    mel_s, _ = out[0]
    assert mel_s.shape[1] == 1 + len(short) // hp.hop_length
    ref = mel_spectrogram_hifi(short, hp)
    np.testing.assert_allclose(mel_s, ref, atol=2e-5)
