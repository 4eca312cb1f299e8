"""F0 estimation: NCCF/RAPT-style pitch tracker with DP voicing.

Native replacement for the reference's bundled REAPER binary
(/root/reference/src/daft_exprt/extract_features.py:222-269 +
hparams.py:48-55). The reference's contract, which this module honors:

- F0 is estimated with a voicing decision (unvoiced <= 0);
- the .f0 track is *sample-synchronous*: one value per audio sample
  (the reference reads raw int16 and decimates with ``[::hop_length]``);
- downstream uses log-F0 with unvoiced frames set exactly to 0.0 and one
  pitch value per mel frame (edge rule: when ``len(track) % hop == 0``
  the final sample is appended so pitch frames == mel frames).

Algorithm (RAPT family, Talkin 1995): normalized cross-correlation
(NCCF) per analysis frame over the lag range [fs/max_f0, fs/min_f0],
peak candidate extraction, then Viterbi dynamic programming over
{unvoiced, candidate lags} with frequency-jump and voicing-transition
costs. The NCCF inner product is computed via FFT cross-correlation
(O(n log n) per frame) on host, or batched as an einsum on TPU.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np
import scipy.signal
from scipy.io import wavfile

# DP cost weights (RAPT-style). The non-structural knobs (window,
# analysis oversampling, high-pass, silence penalty, transition cost)
# are CALIBRATED against the reference's actual REAPER binary on the 15
# real speech recordings in /root/reference/scripts/style_bank/english/
# (grid search, 2026-08-19): unvoiced-mask agreement mean 0.950 /
# min 0.910, median voiced |dlog F0| 0.008 — see docs/PARITY.md and
# tests/test_reaper_golden.py, which pins these numbers.
_FREQ_JUMP_COST = 0.35     # cost per octave jump between voiced frames
_VUV_TRANSITION_COST = 0.7  # cost of switching voiced <-> unvoiced
_N_CANDS = 5                # voiced lag candidates per frame
# RAPT lag weight: local voiced cost = 1 - nccf * (1 - 0.3 * lag /
# max_lag). Breaks the subharmonic tie of perfectly periodic signals
# (an octave-down candidate has equal NCCF) in favor of the shorter lag.
_LAG_WT_FRACTION = 0.3
# correlation window (s): REAPER uses short (~7.5 ms) windows, which
# resolve voicing on/offsets far better than one full min-F0 period
_WINDOW_SEC = 0.0075
# analysis grid oversampling vs the nominal frame interval (-e): the
# track is held sample-synchronously, so a 2x finer grid sharpens
# voicing boundaries at negligible cost
_OVERSAMPLE = 2
# low-frequency rumble high-pass before correlation (REAPER's own
# preprocessing removes DC/rumble; without it, breath/room noise below
# the tracking band shows up as spurious voicing)
_HP_CUTOFF_HZ = 80.0
_HP_TAPS = 255
# quiet-frame penalty: voiced local costs grow by alpha * dB below the
# floor (relative to the utterance's loudest analysis frame)
_SILENCE_ALPHA = 0.1
_SILENCE_FLOOR_DB = -35.0


def highpass_kernel(fs: int, cutoff: float = _HP_CUTOFF_HZ,
                    taps: int = _HP_TAPS) -> np.ndarray:
    """Linear-phase high-pass FIR (Hann-windowed spectral inversion).

    Shared by the host and device trackers; the C++ tracker computes
    the identical kernel (native/pitch_tracker/pitch_tracker.cc).
    """
    n = np.arange(taps) - (taps - 1) / 2
    fc = cutoff / fs
    lp = 2 * fc * np.sinc(2 * fc * n)
    lp *= 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(taps) / (taps - 1))
    hp = -lp
    hp[(taps - 1) // 2] += 1.0
    return hp


def analysis_window(fs: int) -> int:
    """Correlation window length in samples (single source of truth;
    the JAX tracker and the REAPER golden test import it -- the C++
    tracker derives the identical value from _WINDOW_SEC)."""
    return max(2, int(round(_WINDOW_SEC * fs)))


def _frame_starts(n_samples: int, fs: int, frame_interval: float,
                  window: int, max_lag: int) -> np.ndarray:
    step = max(1, int(round(frame_interval * fs / _OVERSAMPLE)))
    last = n_samples - (window + max_lag)
    if last < 0:
        return np.zeros((0,), np.int64)
    return np.arange(0, last + 1, step, dtype=np.int64)


def nccf(wav: np.ndarray, fs: int, frame_interval: float, min_f0: float,
         max_f0: float):
    """Normalized cross-correlation function per frame.

    The input is high-passed (rumble removal) first; ``rel_db`` is each
    analysis frame's RMS in dB relative to the loudest frame, feeding
    the Viterbi silence penalty.

    :return: (nccf (F, K) for lags in [min_lag, max_lag], min_lag,
              frame start indices, rel_db (F,))
    """
    wav = np.asarray(wav, np.float64)
    # FFT convolution: identical zero-boundary 'same' semantics as
    # np.convolve within float rounding, ~10x faster at 255 taps
    # over whole utterances (this runs once per corpus file)
    wav = scipy.signal.fftconvolve(wav, highpass_kernel(fs),
                                   mode="same")
    min_lag = max(2, int(np.floor(fs / max_f0)))
    max_lag = int(np.ceil(fs / min_f0))
    window = analysis_window(fs)
    starts = _frame_starts(len(wav), fs, frame_interval, window, max_lag)
    F = len(starts)
    if F == 0:
        return np.zeros((0, 0)), min_lag, starts, np.zeros((0,))

    seg_len = window + max_lag
    idx = starts[:, None] + np.arange(seg_len)[None, :]
    segs = wav[idx]                                  # (F, w + max_lag)
    base = segs[:, :window]                          # (F, w)

    # cross-correlation via FFT: c[k] = sum_j base[j] * segs[j + k]
    nfft = 1 << int(np.ceil(np.log2(seg_len + window)))
    B = np.fft.rfft(base, nfft)
    S = np.fft.rfft(segs, nfft)
    corr = np.fft.irfft(np.conj(B) * S, nfft)[:, :max_lag + 1]  # (F, K+1)

    # energies: e0 = |base|^2 ; ek = sum segs[k:k+w]^2 via cumsum
    csum = np.cumsum(np.square(segs), axis=1)
    csum = np.concatenate([np.zeros((F, 1)), csum], axis=1)
    ek = csum[:, window:] - csum[:, :-window]        # (F, max_lag + 1)
    e0 = ek[:, :1]
    denom = np.sqrt(e0 * ek) + 1e-12
    out = (corr / denom)[:, min_lag:max_lag + 1]     # (F, K)
    rel_db = 20.0 * np.log10(np.sqrt(e0[:, 0] / window) + 1e-9)
    rel_db -= rel_db.max()
    return out, min_lag, starts, rel_db


def _viterbi_track(nccf_mat: np.ndarray, min_lag: int, fs: int,
                   uv_cost: float, rel_db: np.ndarray | None = None):
    """DP over {unvoiced, top-N lag candidates} per frame.

    :return: (f0 per frame, voiced mask per frame)
    """
    F, K = nccf_mat.shape
    if F == 0:
        return np.zeros((0,)), np.zeros((0,), bool)
    max_lag = min_lag + K - 1

    # top-N local maxima per frame (greedy top values are a good proxy)
    order = np.argsort(-nccf_mat, axis=1)[:, :_N_CANDS]   # (F, N)
    cand_nccf = np.take_along_axis(nccf_mat, order, axis=1)
    cand_lag = order + min_lag                            # (F, N)

    n_states = _N_CANDS + 1  # state 0 = unvoiced
    INF = 1e18
    cost = np.full((F, n_states), INF)
    back = np.zeros((F, n_states), np.int32)

    # local costs: voiced candidate = 1 - nccf * lag weight + silence
    # penalty; unvoiced = uv_cost
    local = np.empty((F, n_states))
    local[:, 0] = uv_cost
    local[:, 1:] = 1.0 - cand_nccf * (
        1.0 - _LAG_WT_FRACTION * cand_lag / max_lag)
    if rel_db is not None:
        local[:, 1:] += _SILENCE_ALPHA * np.maximum(
            0.0, _SILENCE_FLOOR_DB - rel_db)[:, None]

    cost[0] = local[0]
    log_lag = np.log2(np.maximum(cand_lag, 1))
    for i in range(1, F):
        # transition matrix prev_state -> state
        trans = np.zeros((n_states, n_states))
        trans[0, 1:] = _VUV_TRANSITION_COST
        trans[1:, 0] = _VUV_TRANSITION_COST
        jump = np.abs(log_lag[i - 1][:, None] - log_lag[i][None, :])
        trans[1:, 1:] = _FREQ_JUMP_COST * jump
        total = cost[i - 1][:, None] + trans
        back[i] = np.argmin(total, axis=0)
        cost[i] = np.min(total, axis=0) + local[i]

    # backtrack
    states = np.zeros(F, np.int32)
    states[-1] = int(np.argmin(cost[-1]))
    for i in range(F - 2, -1, -1):
        states[i] = back[i + 1, states[i + 1]]

    voiced = states > 0
    f0 = np.zeros(F)
    vi = np.where(voiced)[0]
    f0[vi] = fs / cand_lag[vi, states[vi] - 1]
    return f0, voiced


def track_pitch(wav: np.ndarray, fs: int, frame_interval: float = 0.005,
                min_f0: float = 40.0, max_f0: float = 500.0,
                uv_cost: float = 0.9):
    """F0 track at ``frame_interval`` resolution.

    :return: (f0 Hz per analysis frame (0 where unvoiced), frame starts)
    """
    mat, min_lag, starts, rel_db = nccf(wav, fs, frame_interval, min_f0,
                                        max_f0)
    # map REAPER-style uv cost (-w 0.9) to an NCCF voicing cost in (0, 1):
    # higher -w = more reluctant to call voiced.
    f0, voiced = _viterbi_track(
        mat, min_lag, fs, uv_cost=1.0 - 1.0 / (1.0 + uv_cost),
        rel_db=rel_db)
    f0[~voiced] = 0.0
    return f0, starts


def sample_synchronous_f0(wav: np.ndarray, fs: int, hparams) -> np.ndarray:
    """Per-sample integer F0 track (the bundled-REAPER output contract).

    One value per audio sample; unvoiced samples are 0.
    """
    f0, starts = track_pitch(
        wav, fs, frame_interval=hparams.f0_interval, min_f0=hparams.min_f0,
        max_f0=hparams.max_f0, uv_cost=hparams.uv_cost)
    return _hold_to_samples(f0, starts, len(wav))


def _hold_to_samples(f0: np.ndarray, starts: np.ndarray,
                     n_samples: int) -> np.ndarray:
    """Frame F0 -> per-sample int16 track (REAPER output contract).

    Shared by the host path and the device-batched path so the hold /
    quantization semantics cannot drift apart.
    """
    track = np.zeros(n_samples, np.int16)
    if len(starts) == 0:
        return track
    # hold each frame's value until the next frame start
    bounds = np.append(starts, n_samples)
    for i in range(len(starts)):
        track[bounds[i]:bounds[i + 1]] = np.int16(round(f0[i]))
    # samples before the first analysis frame share its value
    track[:bounds[0]] = np.int16(round(f0[0]))
    return track


def _native_binary() -> str | None:
    """Path to the compiled C++ tracker, or None if not built."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bin", "pitch_tracker")
    return path if os.path.isfile(path) and os.access(path, os.X_OK) \
        else None


def sample_synchronous_f0_native(wav: np.ndarray, fs: int,
                                 hparams) -> np.ndarray:
    """Per-sample int16 F0 via the native C++ tracker subprocess.

    Same CLI contract as the reference's bundled binary
    (extract_features.py:239-247); same algorithm as the Python
    implementation above (parity-tested).
    """
    binary = _native_binary()
    assert binary, "native pitch_tracker not built " \
        "(run make -C native/pitch_tracker)"
    pcm = np.clip(np.asarray(wav, np.float64) * 32768.0,
                  -32768, 32767).astype(np.int16)
    with tempfile.TemporaryDirectory() as tmp:
        wav_file = os.path.join(tmp, "in.wav")
        f0_file = os.path.join(tmp, "out.f0")
        wavfile.write(wav_file, fs, pcm)
        subprocess.run(
            [binary, "-i", wav_file, "-a", "-f", f0_file,
             "-e", str(hparams.f0_interval), "-m", str(hparams.min_f0),
             "-x", str(hparams.max_f0), "-u", str(hparams.uv_interval),
             "-w", str(hparams.uv_cost)],
            check=True, capture_output=True)
        with open(f0_file, "rb") as f:
            track = np.frombuffer(f.read(), dtype=np.int16)
    return track.copy()


def extract_pitch(wav: np.ndarray, fs: int, hparams,
                  use_native: bool | None = None) -> np.ndarray:
    """Per-mel-frame log-F0 with unvoiced frames set to 0.

    Framing parity with the reference extract_pitch
    (extract_features.py:222-269): per-sample track -> log (unvoiced
    stays 0) -> ``[::hop_length]`` with the end-of-track edge rule.

    The in-process tracker (FFT-based NCCF) is the default -- it is
    faster than shelling out to the binary for utterance-length audio.
    The native binary serves external consumers via the REAPER CLI
    contract and is parity-tested against this implementation; pass
    ``use_native=True`` to route through it.
    """
    if use_native is None:
        use_native = False
    if use_native:
        # sample_synchronous_f0_native quantizes to int16 PCM itself
        track = sample_synchronous_f0_native(
            np.asarray(wav, np.float64), fs, hparams)
        track = track.astype(np.float64)
    else:
        track = sample_synchronous_f0(wav, fs, hparams).astype(np.float64)
    return log_f0_per_mel_frame(track, hparams.hop_length,
                                n_fft=hparams.filter_length,
                                center=hparams.centered)


def log_f0_per_mel_frame(track: np.ndarray, hop_length: int,
                         n_fft: int | None = None,
                         center: bool = True) -> np.ndarray:
    """Per-sample F0 track -> per-mel-frame log-F0 (unvoiced = 0).

    ``center=True`` reproduces the reference's sampling exactly
    (extract_features.py:260-264: every ``hop`` samples, +1 edge frame
    when divisible — each sampling point IS the centered window's
    middle). ``center=False`` goes beyond the reference (whose pitch
    count only matches centered mels; uncentered configs assert-skip
    every file there): sample at each uncentered window's center
    ``k*hop + n_fft//2`` and emit exactly ``num_frames(.., False)``
    frames so pitch and mel counts agree.
    """
    track = np.asarray(track, np.float64).copy()
    unvoiced = track <= 0.0
    track[unvoiced] = 1.0
    log_f0 = np.log(track)
    log_f0[unvoiced] = 0.0
    if center:
        frames = log_f0[::hop_length]
        if len(log_f0) % hop_length == 0:
            frames = np.append(frames, log_f0[-1])
        return frames
    assert n_fft is not None, "center=False needs n_fft"
    from daft_exprt_tpu.ops.mel import num_frames
    nb = num_frames(len(log_f0), n_fft, hop_length, center=False)
    idx = np.minimum(n_fft // 2 + hop_length * np.arange(nb),
                     max(len(log_f0) - 1, 0))
    return log_f0[idx]


def extract_pitch_from_frame_f0(f0: np.ndarray, starts: np.ndarray,
                                wav_len: int, fs: int,
                                hparams) -> np.ndarray:
    """Per-mel-frame log-F0 from an analysis-frame F0 track.

    Consumes the output of ``pitch_jax.track_pitch_batch`` (one padded
    row): frames are truncated to exactly the set the host tracker
    emits for ``wav_len`` samples (start + window + max_lag <= wav_len
    -- the extra padded-row frames are forced-unvoiced and must NOT
    override the tail hold), then the identical sample-synchronous
    hold + int16 quantization + log/downsample chain as
    :func:`extract_pitch` is applied. Validated byte-identical to the
    host path on test corpora; in principle the f32 device NCCF vs the
    f64 host NCCF can disagree on near-tied candidates, so keep a
    corpus's incremental preprocessing runs on ONE tracker.
    """
    max_lag = int(np.ceil(fs / hparams.min_f0))
    window = analysis_window(fs)
    keep = starts <= wav_len - (window + max_lag)
    track = _hold_to_samples(np.asarray(f0)[keep],
                             np.asarray(starts)[keep], wav_len)
    return log_f0_per_mel_frame(track.astype(np.float64),
                                hparams.hop_length,
                                n_fft=hparams.filter_length,
                                center=hparams.centered)


def robust_slope_range(f0: np.ndarray, t: np.ndarray):
    """Outlier-robust global prosody attributes of an F0 track.

    Returns ``(slope_hz_per_sec, modulation_range_hz)`` where slope is
    the linear trend of the voiced track and range is a robust scale
    (1.4826 * MAD, std-consistent under normality) of the detrended
    residual.

    Pitch trackers commit octave errors and voicing glitches —
    especially on Griffin-Lim audio — and a plain residual std is
    dominated by those tails: on the synthetic soak corpus the naive
    estimator correlates with the true generative modulation range at
    r = 0.23 while this one reaches r = 0.97 (the identifiability
    ceiling; see tools/range_diagnosis.py and docs/RANGE_DIAG_r05.md).
    Procedure: (1) median-filter the voiced track (kernel 5) to
    suppress isolated glitches, fit the trend line on the filtered
    track; (2) fold every voiced frame onto the octave nearest the
    fitted TREND (folding against a global median corrupts
    strongly-trending tracks); (3) refit the trend on folded frames
    and take the residual MAD.

    Complements the curve-correlation instrument ported from the
    reference (scripts/evaluation/compare_pitch_curves.py, reference
    repo scripts/evaluation/compare_pitch_curves.py:24-45) with global
    attribute extraction the reference does not ship.
    """
    f0 = np.asarray(f0, np.float64)
    t = np.asarray(t, np.float64)
    v = f0 > 0
    if v.sum() < 8:
        return float("nan"), float("nan")
    fv, tv = f0[v], t[v]
    filtered = scipy.signal.medfilt(fv, 5)
    coef = np.polyfit(tv, filtered, 1)
    trend = np.maximum(np.polyval(coef, tv), 1.0)
    octaves = np.round(np.log2(fv / trend))
    folded = fv / np.exp2(octaves)
    coef = np.polyfit(tv, folded, 1)
    resid = folded - np.polyval(coef, tv)
    mad = np.median(np.abs(resid - np.median(resid)))
    return float(coef[0]), float(1.4826 * mad)
