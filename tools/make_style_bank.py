"""Generate synthetic speech-like style-bank reference wavs.

The upstream repo ships 15 expressive recordings in
scripts/style_bank/english/ (release binaries, not code) that drive
training-time checkpoint synthesis and synthesize.py defaults
(/root/reference/scripts/synthesize.py:111-114). This tool builds
speech-LIKE substitutes from scratch — formant-filtered glottal pulse
trains with expressive pitch contours, vowel sequences, fricative
noise segments and syllable amplitude envelopes — so the style-bank
flow (reference .npz extraction -> FiLM -> synthesis -> pitch-PCC
eval) runs out of the box without redistributing the originals.

Usage: python tools/make_style_bank.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)

FS = 22050

# (F1, F2, F3) formant frequencies in Hz for a few vowels.
VOWELS = {
    "aa": (730, 1090, 2440),
    "iy": (270, 2290, 3010),
    "uw": (300, 870, 2240),
    "eh": (530, 1840, 2480),
    "ao": (570, 840, 2410),
}

# Each style: (name, base_f0, contour, vowel sequence, speaking rate)
STYLES = [
    ("neutral_ref", 120.0, "flat", ["aa", "eh", "iy", "ao"], 1.0),
    ("happy_ref", 220.0, "rise_fall", ["iy", "aa", "eh", "uw", "aa"], 1.3),
    ("sad_ref", 100.0, "fall", ["uw", "ao", "aa", "eh"], 0.7),
    ("surprise_ref", 180.0, "swoop", ["aa", "iy", "uw", "eh", "ao"], 1.1),
    ("angry_ref", 150.0, "jagged", ["eh", "aa", "ao", "iy", "aa"], 1.2),
]


def _contour(kind: str, n: int, base: float, rng) -> np.ndarray:
    t = np.linspace(0.0, 1.0, n)
    if kind == "flat":
        f0 = base * (1.0 + 0.04 * np.sin(2 * np.pi * 3.0 * t))
    elif kind == "rise_fall":
        f0 = base * (1.0 + 0.35 * np.sin(np.pi * t)
                     + 0.08 * np.sin(2 * np.pi * 5.0 * t))
    elif kind == "fall":
        f0 = base * (1.25 - 0.4 * t + 0.03 * np.sin(2 * np.pi * 2.0 * t))
    elif kind == "swoop":
        f0 = base * (1.0 + 0.5 * t ** 2
                     + 0.1 * np.sin(2 * np.pi * 4.0 * t))
    else:  # jagged
        steps = rng.uniform(0.85, 1.3, size=8)
        f0 = base * np.repeat(steps, -(-n // 8))[:n]
        f0 = np.convolve(f0, np.ones(n // 40 + 1) / (n // 40 + 1),
                         mode="same")
    # natural jitter
    return f0 * (1.0 + 0.01 * rng.standard_normal(n))


def _formant_filter(x: np.ndarray, formants, fs: int) -> np.ndarray:
    """Cascade of 2nd-order resonators (one per formant)."""
    from scipy.signal import lfilter
    y = x
    for f, bw in zip(formants, (60.0, 90.0, 120.0)):
        r = np.exp(-np.pi * bw / fs)
        theta = 2 * np.pi * f / fs
        a = [1.0, -2 * r * np.cos(theta), r * r]
        y = lfilter([1.0 - r], a, y)
    return y


def _glottal_pulses(f0: np.ndarray, fs: int) -> np.ndarray:
    """Impulse-ish glottal source following the pitch contour."""
    phase = 2 * np.pi * np.cumsum(f0) / fs
    # soft pulse train: sharpened cosine (energy at harmonics)
    x = np.cos(phase)
    return np.sign(x) * np.abs(x) ** 8


def synthesize_style(base_f0, contour, vowels, rate, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    seg_dur = 0.45 / rate
    gap_dur = 0.06 / rate
    pieces = [np.zeros(int(0.05 * FS), np.float64)]
    for i, v in enumerate(vowels):
        n = int(seg_dur * FS * rng.uniform(0.8, 1.2))
        f0 = _contour(contour, n, base_f0 * rng.uniform(0.95, 1.05), rng)
        voiced = _formant_filter(_glottal_pulses(f0, FS), VOWELS[v], FS)
        # syllable envelope: quick attack, slow decay
        t = np.linspace(0, 1, n)
        env = np.minimum(t / 0.08, 1.0) * np.exp(-1.2 * t)
        pieces.append(voiced * env)
        if i % 2 == 1:  # unvoiced fricative between some "syllables"
            m = int(gap_dur * FS * 1.5)
            noise = rng.standard_normal(m)
            noise = _formant_filter(noise, (2500, 4500, 6000), FS)
            pieces.append(noise * 0.15
                          * np.hanning(m))
        pieces.append(np.zeros(int(gap_dur * FS), np.float64))
    pieces.append(np.zeros(int(0.05 * FS), np.float64))
    wav = np.concatenate(pieces)
    wav = wav / (np.max(np.abs(wav)) + 1e-9) * 0.7
    return wav.astype(np.float32)


def main(out_dir: str) -> list[str]:
    from daft_exprt_tpu.audio.io import save_wav
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, (name, f0, contour, vowels, rate) in enumerate(STYLES):
        wav = synthesize_style(f0, contour, vowels, rate, seed=100 + i)
        assert len(wav) >= FS, (name, len(wav))  # >= 1 s (hparams min)
        path = os.path.join(out_dir, f"{name}.wav")
        save_wav(path, wav, FS)
        paths.append(path)
        print(f"wrote {path} ({len(wav) / FS:.2f}s)")
    return paths


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "scripts", "style_bank", "english")
    main(os.path.abspath(out))
