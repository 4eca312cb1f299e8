"""Prosody-transfer evaluation: Pearson correlation of pitch curves.

The repo's objective metric for cross-speaker prosody transfer
(capability parity with /root/reference/scripts/evaluation/
compare_pitch_curves.py): extract F0 from a reference wav and a
generated wav, drop unvoiced frames, resample to a common length and
report the Pearson correlation coefficient.
"""

import argparse
import os
import sys

import numpy as np
from scipy.signal import resample
from scipy.stats import pearsonr

FILE_ROOT = os.path.dirname(os.path.realpath(__file__))
PROJECT_ROOT = os.path.dirname(os.path.dirname(FILE_ROOT))
sys.path.insert(0, PROJECT_ROOT)

from daft_exprt_tpu.audio.io import load_wav  # noqa: E402
from daft_exprt_tpu.audio.pitch import track_pitch  # noqa: E402


def pcc_on_2_pitch_curves(pitch_a: np.ndarray, pitch_b: np.ndarray):
    """Pearson correlation between two pitch curves.

    Unvoiced (<= 0) values are removed from each curve, then the longer
    curve is resampled to the shorter one's length.
    """
    a = pitch_a[pitch_a > 0.0]
    b = pitch_b[pitch_b > 0.0]
    if len(a) < 2 or len(b) < 2:
        return float("nan")
    n = min(len(a), len(b))
    if len(a) != n:
        a = resample(a, n)
    if len(b) != n:
        b = resample(b, n)
    return float(pearsonr(a, b)[0])


def pcc_between_wavs(wav_a: str, wav_b: str, sr: int = 22050) -> float:
    xa, fs = load_wav(wav_a, target_sr=sr)
    xb, _ = load_wav(wav_b, target_sr=sr)
    f0_a, _ = track_pitch(xa, fs)
    f0_b, _ = track_pitch(xb, fs)
    return pcc_on_2_pitch_curves(f0_a, f0_b)


def main():
    parser = argparse.ArgumentParser(
        description="pitch-curve Pearson correlation")
    parser.add_argument("wav_ref")
    parser.add_argument("wav_gen")
    args = parser.parse_args()
    pcc = pcc_between_wavs(args.wav_ref, args.wav_gen)
    print(f"pitch PCC: {pcc:.4f}")


if __name__ == "__main__":
    main()
