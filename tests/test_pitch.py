"""Pitch tracker tests: host NCCF, native C++ binary, batched JAX.

All three implementations share one cost model and are checked against
each other and against a known synthetic F0.
"""

import os

import numpy as np
import pytest

from daft_exprt_tpu.audio.pitch import (_native_binary, extract_pitch,
                                        sample_synchronous_f0,
                                        sample_synchronous_f0_native,
                                        track_pitch)
from daft_exprt_tpu.audio.pitch_jax import track_pitch_batch


class HP:
    f0_interval = 0.005
    min_f0 = 40
    max_f0 = 500
    uv_interval = 0.01
    uv_cost = 0.9
    hop_length = 256
    filter_length = 1024
    centered = True


FS = 22050


def _voiced_wav(dur=1.5, f0_base=220.0, vibrato=3.0, seed=0,
                silence_tail=0.3):
    t = np.arange(int(dur * FS)) / FS
    f0 = f0_base + 20 * np.sin(2 * np.pi * vibrato * t)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    wav = (0.6 * np.sin(phase) + 0.25 * np.sin(2 * phase)
           + 0.1 * np.sin(3 * phase)).astype(np.float32)
    n_tail = int(silence_tail * FS)
    rng = np.random.default_rng(seed)
    wav[-n_tail:] = 0.003 * rng.standard_normal(n_tail).astype(np.float32)
    return wav, f0, t


def test_track_pitch_accuracy():
    wav, f0_true, t = _voiced_wav()
    f0, starts = track_pitch(wav, FS)
    times = starts / FS
    speech = times < 1.1
    assert np.all(f0[speech] > 0), "voiced region must be voiced"
    assert np.all(f0[times > 1.25] == 0), "silence must be unvoiced"
    err = np.abs(f0[speech] - np.interp(times[speech], t, f0_true))
    assert np.median(err) < 8.0


def test_pure_tone_no_octave_error():
    """A pure sine ties NCCF at lag k and 2k; the RAPT lag weight must
    resolve to the true F0, not the subharmonic."""
    t = np.arange(int(1.0 * FS)) / FS
    wav = (0.6 * np.sin(2 * np.pi * 180.0 * t)).astype(np.float32)
    f0, _ = track_pitch(wav, FS)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0
    assert abs(np.median(voiced) - 180.0) < 5.0


def test_extract_pitch_frame_count():
    wav, _, _ = _voiced_wav(dur=1.37)
    frames = extract_pitch(wav, FS, HP)
    assert len(frames) == 1 + len(wav) // HP.hop_length
    # log-domain, unvoiced exactly 0
    voiced = frames[frames > 0]
    assert np.all(voiced > np.log(HP.min_f0) - 1e-6)
    assert np.all(voiced < np.log(HP.max_f0) + 1e-6)


@pytest.mark.skipif(_native_binary() is None,
                    reason="native pitch_tracker not built")
def test_native_binary_parity():
    wav, _, _ = _voiced_wav()
    pcm = np.clip(wav.astype(np.float64) * 32768.0, -32768,
                  32767).astype(np.int16)
    qwav = pcm.astype(np.float64) / 32768.0
    py = sample_synchronous_f0(qwav, FS, HP)
    cc = sample_synchronous_f0_native(qwav, FS, HP)
    assert len(py) == len(cc) == len(wav)
    assert np.mean((py > 0) == (cc > 0)) > 0.999
    both = (py > 0) & (cc > 0)
    assert np.abs(py[both].astype(float)
                  - cc[both].astype(float)).max() <= 1.0


def test_batched_jax_parity():
    w0, _, _ = _voiced_wav(dur=1.5, f0_base=200)
    w1, _, _ = _voiced_wav(dur=1.1, f0_base=260, seed=1)
    lens = [len(w0), len(w1)]
    batch = np.zeros((2, max(lens)), np.float32)
    batch[0, :lens[0]] = w0
    batch[1, :lens[1]] = w1
    f0_b, _ = track_pitch_batch(batch, np.array(lens), FS)
    f0_b = np.asarray(f0_b)
    for i, w in enumerate((w0, w1)):
        f0_h, starts_h = track_pitch(w, FS)
        sub = f0_b[i, :len(starts_h)]
        assert np.mean((sub > 0) == (f0_h > 0)) == 1.0
        both = (sub > 0) & (f0_h > 0)
        np.testing.assert_allclose(sub[both], f0_h[both], atol=1e-3)


def test_robust_slope_range_recovers_attributes():
    """Trend-folded estimator: exact on clean tracks, immune to octave
    errors and voicing glitches that break the naive residual std
    (docs/RANGE_DIAG_r05.md: naive r=0.23 vs robust r=0.97 against the
    true generative range on the soak corpus)."""
    from daft_exprt_tpu.audio.pitch import robust_slope_range

    rng = np.random.default_rng(0)
    t = np.arange(0, 3.0, 0.005)
    slope, depth = 30.0, 12.0
    f0 = 200.0 + slope * (t - 1.5) + depth * np.sin(2 * np.pi * 1.5 * t)

    sl, rg = robust_slope_range(f0, t)
    assert abs(sl - slope) < 2.0
    # MAD scale of a sinusoid: 1.4826 * median|sin| * depth ~ 1.05*depth
    assert abs(rg - depth) < 2.0

    # inject 10% octave errors (up and down) + unvoiced dropouts
    bad = f0.copy()
    idx = rng.permutation(len(t))
    bad[idx[:30]] *= 2.0
    bad[idx[30:60]] *= 0.5
    bad[idx[60:90]] = 0.0
    sl2, rg2 = robust_slope_range(bad, t)
    assert abs(sl2 - slope) < 3.0
    assert abs(rg2 - rg) < 2.0

    # naive residual std on the corrupted track is wildly inflated —
    # the round-4 failure mode this estimator replaces
    v = bad > 0
    coef = np.polyfit(t[v], bad[v], 1)
    naive = np.std(bad[v] - np.polyval(coef, t[v]))
    assert naive > 3 * rg2

    # too few voiced frames -> NaNs, not a crash
    sl3, rg3 = robust_slope_range(np.zeros(50), np.arange(50) * 0.005)
    assert np.isnan(sl3) and np.isnan(rg3)
