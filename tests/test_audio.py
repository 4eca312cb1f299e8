"""Audio component tests: Griffin-Lim reconstruction, NNLS, wav IO."""

import numpy as np

import jax.numpy as jnp

from helpers import tiny_hparams

from daft_exprt_tpu.audio.griffin_lim import (
    griffin_lim_reconstruction_from_mel_spec, mel_to_linear, nnls)
from daft_exprt_tpu.audio.io import load_wav, save_wav
from daft_exprt_tpu.ops.mel import (mel_filter_bank, mel_spectrogram_hifi,
                                    stft_magnitude)

FS = 22050


def _harmonic_wav(dur=1.0, f0=220.0):
    t = np.arange(int(dur * FS)) / FS
    return (0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
            + 0.12 * np.sin(2 * np.pi * 3 * f0 * t)).astype(np.float32)


def test_nnls_recovers_mel():
    """NNLS inverse of the mel filterbank: A @ X ~= B for feasible B."""
    hp = tiny_hparams()
    fb = mel_filter_bank(hp.sampling_rate, hp.filter_length,
                         hp.n_mel_channels, hp.mel_fmin, hp.mel_fmax)
    rng = np.random.default_rng(0)
    x_true = np.abs(rng.standard_normal((fb.shape[1], 17))).astype(
        np.float32)
    b = fb @ x_true
    x = np.asarray(nnls(jnp.asarray(fb), jnp.asarray(b)))
    # the system is underdetermined; check residual, not x itself
    resid = np.abs(fb @ x - b).max() / np.abs(b).max()
    assert resid < 5e-3, resid


def test_mel_to_linear_shapes():
    hp = tiny_hparams()
    wav = _harmonic_wav(0.5)
    log_mel = mel_spectrogram_hifi(wav, hp)
    linear = mel_to_linear(log_mel, hp)
    assert linear.shape == (1 + hp.filter_length // 2, log_mel.shape[1])
    assert np.all(linear >= 0)


def test_griffin_lim_reconstruction_quality():
    """Reconstructed audio must reproduce the source mel closely."""
    hp = tiny_hparams()
    wav = _harmonic_wav(1.0)
    log_mel = mel_spectrogram_hifi(wav, hp)
    rec = griffin_lim_reconstruction_from_mel_spec(log_mel, hp,
                                                   iterations=30)
    assert rec.size > 0
    assert np.max(np.abs(rec)) <= 1.0 + 1e-6  # peak normalized
    # mel of the reconstruction correlates strongly with the source mel
    rec_mel = mel_spectrogram_hifi(rec.astype(np.float32), hp)
    n = min(log_mel.shape[1], rec_mel.shape[1])
    a = log_mel[:, :n].ravel()
    b = rec_mel[:, :n].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr


def test_stft_magnitude_frame_count():
    hp = tiny_hparams()
    wav = _harmonic_wav(0.73)
    mag = np.asarray(stft_magnitude(jnp.asarray(wav), hp.filter_length,
                                    hp.hop_length, center=True))
    assert mag.shape == (1 + hp.filter_length // 2,
                         1 + len(wav) // hp.hop_length)


def test_wav_io_roundtrip(tmp_path):
    wav = _harmonic_wav(0.3)
    path = str(tmp_path / "x.wav")
    save_wav(path, wav, FS)
    loaded, sr = load_wav(path)
    assert sr == FS
    np.testing.assert_allclose(loaded, wav, atol=2e-4)
    resampled, sr2 = load_wav(path, target_sr=16000)
    assert sr2 == 16000
    assert abs(len(resampled) - len(wav) * 16000 / FS) < 2


def test_griffin_lim_bucket_padding_drops_real_tail_frames():
    """Bucket padding must not change WHICH frames are dropped: the two
    real centered-STFT tail frames go, not two silence pad frames
    (round-2 review: pad-then-[:-2] synthesized the real tail into the
    crop region)."""
    import copy

    hp = tiny_hparams()
    wav = _harmonic_wav(1.0)
    log_mel = mel_spectrogram_hifi(wav, hp)
    assert (log_mel.shape[1] - 2) % 32 != 0  # padding must occur

    hp_pad = copy.deepcopy(hp)
    hp_pad.frame_bucket = 32
    hp_nopad = copy.deepcopy(hp)
    hp_nopad.frame_bucket = 1

    rec_pad = griffin_lim_reconstruction_from_mel_spec(
        log_mel, hp_pad, iterations=10)
    rec_nopad = griffin_lim_reconstruction_from_mel_spec(
        log_mel, hp_nopad, iterations=10)
    assert rec_pad.shape == rec_nopad.shape
    # near-silent pad frames couple only through the final window's
    # overlap-add; the waveforms must agree closely everywhere
    assert np.max(np.abs(rec_pad - rec_nopad)) < 5e-2
    np.testing.assert_allclose(rec_pad[:-hp.filter_length],
                               rec_nopad[:-hp.filter_length], atol=5e-3)


def test_griffin_lim_batch_matches_singles():
    """One batched NNLS+GL dispatch == per-utterance reconstructions
    (the serving fallback path batches N sentences into two device
    calls)."""
    from daft_exprt_tpu.audio.griffin_lim import \
        griffin_lim_reconstruction_batch

    hp = tiny_hparams()
    mels = [mel_spectrogram_hifi(_harmonic_wav(d, f), hp)
            for d, f in ((0.7, 220.0), (1.0, 180.0))]
    batch = griffin_lim_reconstruction_batch(mels, hp, iterations=10)
    for mel, wav_b in zip(mels, batch):
        wav_s = griffin_lim_reconstruction_from_mel_spec(
            mel, hp, iterations=10)
        assert wav_b.shape == wav_s.shape
        # rows padded to the common bucket couple with the silent pad
        # only through the final window's overlap-add
        np.testing.assert_allclose(
            wav_b[:-hp.filter_length], wav_s[:-hp.filter_length],
            atol=5e-3)
        assert np.max(np.abs(wav_b - wav_s)) < 5e-2
    # empty/degenerate rows keep their slots
    out = griffin_lim_reconstruction_batch(
        [mels[0], np.zeros((hp.n_mel_channels, 2), np.float32)], hp,
        iterations=5)
    assert out[0].size > 0 and out[1].size == 0
