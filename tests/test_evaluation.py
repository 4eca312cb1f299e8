"""Prosody-transfer evaluation metric (pitch-curve PCC)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "evaluation"))

from compare_pitch_curves import (pcc_between_wavs,  # noqa: E402
                                  pcc_on_2_pitch_curves)


def test_pcc_identity_and_scaling():
    t = np.linspace(0, 1, 200)
    curve = 180 + 30 * np.sin(2 * np.pi * 3 * t)
    assert abs(pcc_on_2_pitch_curves(curve, curve) - 1.0) < 1e-6
    # affine transforms preserve correlation
    assert abs(pcc_on_2_pitch_curves(curve, 2 * curve + 50) - 1.0) < 1e-6
    # anti-correlated
    flipped = 360 - curve
    assert pcc_on_2_pitch_curves(curve, flipped) < -0.99


def test_pcc_unvoiced_removal_and_resampling():
    t = np.linspace(0, 1, 300)
    a = 200 + 40 * np.sin(2 * np.pi * 2 * t)
    b = np.interp(np.linspace(0, 1, 120), t, a)  # different length
    # inject unvoiced gaps (zeros) that must be dropped, not correlated
    a_gapped = a.copy()
    a_gapped[::7] = 0.0
    pcc = pcc_on_2_pitch_curves(a_gapped, b)
    assert pcc > 0.95, pcc
    # degenerate curves -> nan, not crash
    assert np.isnan(pcc_on_2_pitch_curves(np.zeros(10), a))


def test_pcc_between_wavs(tmp_path):
    from daft_exprt_tpu.audio.io import save_wav
    sr = 22050
    t = np.arange(int(1.2 * sr)) / sr
    f0 = 170 + 25 * np.sin(2 * np.pi * 1.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = (0.5 * np.sin(phase)).astype(np.float32)
    p_a = str(tmp_path / "a.wav")
    p_b = str(tmp_path / "b.wav")
    save_wav(p_a, wav, sr)
    # same melody transposed up 20% (the cross-speaker transfer case:
    # different absolute pitch, same contour -> high correlation)
    phase_b = 2 * np.pi * np.cumsum(1.2 * f0) / sr
    save_wav(p_b, (0.8 * np.sin(phase_b)).astype(np.float32), sr)
    pcc = pcc_between_wavs(p_a, p_b)
    assert pcc > 0.9, pcc
