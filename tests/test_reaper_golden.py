"""Golden parity vs the reference's actual REAPER binary on real speech.

The reference bundles a prebuilt REAPER
(/root/reference/src/daft_exprt/bin/reaper/linux/reaper) and feeds its
raw log-F0 into the prosody encoder at inference
(extract_features.py:222-269), so tracker mismatch shifts FiLM
parameters. SURVEY §2.3 sets the parity target: identical unvoiced
mask + log-F0 within tolerance, validated on the style-bank wavs.

These tests run THAT binary with the reference's exact flags
(extract_features.py:239-247) on the 15 real expressive recordings in
/root/reference/scripts/style_bank/english/ and pin the calibrated
agreement levels (docs/PARITY.md, calibrated 2026-08-19):

- unvoiced-mask agreement: mean 0.951, worst file 0.910
- median |delta log F0| over frames both call voiced: <= 0.014

The thresholds below leave a small safety margin; a tracker change
that drifts from REAPER on real speech fails here.
"""

import glob
import os
import subprocess

import numpy as np
import pytest
from scipy.io import wavfile

from daft_exprt_tpu.audio.io import load_wav
from daft_exprt_tpu.audio.pitch import (analysis_window,
                                        sample_synchronous_f0,
                                        sample_synchronous_f0_native,
                                        _native_binary)

REAPER = "/root/reference/src/daft_exprt/bin/reaper/linux/reaper"
STYLE_BANK = "/root/reference/scripts/style_bank/english"

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(REAPER) and os.access(REAPER, os.X_OK)
         and os.path.isdir(STYLE_BANK)),
    reason="reference REAPER binary / style bank not available")


class HP:
    # the reference's pitch hparams (hparams.py:48-55)
    f0_interval = 0.005
    min_f0 = 40
    max_f0 = 500
    uv_interval = 0.01
    uv_cost = 0.9


def _reaper_track(pcm: np.ndarray, fs: int, tmp_path) -> np.ndarray:
    """Run the reference binary with the reference's exact flags and
    read the sample-synchronous int16 track exactly as
    extract_features.py:239-251 does."""
    wav_file = str(tmp_path / "in.wav")
    f0_file = str(tmp_path / "out.f0")
    wavfile.write(wav_file, fs, pcm)
    subprocess.run(
        [REAPER, "-i", wav_file, "-a", "-f", f0_file,
         "-e", str(HP.f0_interval), "-m", str(HP.min_f0),
         "-x", str(HP.max_f0), "-u", str(HP.uv_interval),
         "-w", str(HP.uv_cost)],
        check=True, capture_output=True)
    with open(f0_file, "rb") as f:
        return np.frombuffer(f.read(), dtype=np.int16).astype(np.float64)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """[(name, quantized wav, fs, reaper per-sample track), ...] for all
    15 style-bank recordings, resampled to the pipeline's 22050 Hz."""
    tmp = tmp_path_factory.mktemp("reaper")
    out = []
    for path in sorted(glob.glob(os.path.join(STYLE_BANK, "*.wav"))):
        wav, fs = load_wav(path, target_sr=22050)
        pcm = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)
        reaper = _reaper_track(pcm, fs, tmp)
        out.append((os.path.basename(path),
                    pcm.astype(np.float64) / 32768.0, fs, reaper))
    assert len(out) == 15
    return out


def test_host_tracker_matches_reaper_on_real_speech(golden):
    agreements, dlogs = [], []
    for name, wav, fs, reaper in golden:
        ours = sample_synchronous_f0(wav, fs, HP).astype(np.float64)
        n = min(len(reaper), len(ours))
        r, o = reaper[:n], ours[:n]
        agree = np.mean((r > 0) == (o > 0))
        both = (r > 0) & (o > 0)
        assert both.sum() > 0, f"{name}: no frames voiced by both"
        dlog = np.median(np.abs(np.log(r[both]) - np.log(o[both])))
        agreements.append(agree)
        dlogs.append(dlog)
        assert agree >= 0.89, f"{name}: unvoiced-mask agreement {agree:.3f}"
        assert dlog <= 0.02, f"{name}: median |dlog F0| {dlog:.4f}"
    assert np.mean(agreements) >= 0.94, (
        f"mean unvoiced-mask agreement {np.mean(agreements):.4f}")


@pytest.mark.skipif(_native_binary() is None,
                    reason="native pitch_tracker not built")
def test_native_binary_matches_host_on_real_speech(golden):
    """The C++ tracker must match the host tracker on real speech:
    identical voiced/unvoiced mask, and voiced F0 within the +-1 Hz
    int16 rounding boundary (the host computes NCCF via BLAS matmuls,
    the C++ via direct loops; float summation order legitimately
    differs, so F0 values landing exactly on a .5 Hz rounding edge can
    round either way — measured on the style bank: <=2.5%% of samples,
    never a mask flip; test_pitch.py covers synthetic signals)."""
    for name, wav, fs, _ in golden[:3]:
        host = sample_synchronous_f0(wav, fs, HP).astype(np.int32)
        native = sample_synchronous_f0_native(wav, fs, HP).astype(np.int32)
        assert len(host) == len(native)
        np.testing.assert_array_equal(
            host > 0, native > 0, err_msg=f"{name}: V/UV mask differs")
        diff = np.abs(host - native)
        assert diff.max() <= 1, (
            f"{name}: native F0 deviates beyond rounding "
            f"(max {diff.max()} Hz)")


def test_batched_jax_tracker_matches_reaper_on_real_speech(golden):
    """The device tracker (TPU preprocessing path) must hit the same
    REAPER agreement bar as the host tracker."""
    from daft_exprt_tpu.audio.pitch import _hold_to_samples
    from daft_exprt_tpu.audio.pitch_jax import track_pitch_batch

    subset = golden[:4]
    lens = [len(w) for _, w, _, _ in subset]
    fs = subset[0][2]
    batch = np.zeros((len(subset), max(lens)), np.float32)
    for i, (_, w, _, _) in enumerate(subset):
        batch[i, :lens[i]] = w
    f0, starts = track_pitch_batch(batch, np.array(lens), fs,
                                   frame_interval=HP.f0_interval,
                                   min_f0=HP.min_f0, max_f0=HP.max_f0,
                                   uv_weight=HP.uv_cost)
    f0 = np.asarray(f0)
    starts = np.asarray(starts)
    for i, (name, wav, _, reaper) in enumerate(subset):
        window_lag = int(np.ceil(fs / HP.min_f0)) + analysis_window(fs)
        keep = starts <= lens[i] - window_lag
        track = _hold_to_samples(f0[i][keep], starts[keep], lens[i])
        n = min(len(reaper), len(track))
        r, o = reaper[:n], track[:n].astype(np.float64)
        agree = np.mean((r > 0) == (o > 0))
        assert agree >= 0.89, f"{name}: device-tracker agreement {agree:.3f}"
