"""Batched JAX F0 tracker: NCCF + top-k candidates + scan Viterbi.

The on-device counterpart of ``audio/pitch.py`` for TPU preprocessing
(BASELINE config 3: batched feature kernels): a whole padded batch of
utterances is tracked in one jitted program --

- NCCF via rfft cross-correlation over (B, F, nfft) frame tensors
  (MXU/VPU-friendly, no data-dependent shapes);
- top-k lag candidates per frame (``jax.lax.top_k``);
- Viterbi decoded with ``jax.lax.scan`` over frames, vectorized over
  the batch and the (k+1)-state set (state 0 = unvoiced);
- same cost model as the host tracker (parity-tested).

Padded samples must be zero; ``lengths`` masks trailing frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.audio.pitch import (_FREQ_JUMP_COST, _LAG_WT_FRACTION,
                                        _N_CANDS, _OVERSAMPLE,
                                        _SILENCE_ALPHA, _SILENCE_FLOOR_DB,
                                        _VUV_TRANSITION_COST,
                                        analysis_window as _analysis_window,
                                        highpass_kernel)


@functools.partial(
    jax.jit,
    static_argnames=("fs", "frame_interval", "min_f0", "max_f0"))
def nccf_batch(wavs: jnp.ndarray, fs: int, frame_interval: float = 0.005,
               min_f0: float = 40.0, max_f0: float = 500.0):
    """(B, S) zero-padded wavs -> (nccf (B, F, K), frame RMS (B, F)).

    F and K are static given (S, fs, f0 limits). Applies the shared
    80 Hz rumble high-pass (pitch.highpass_kernel) before correlating,
    mirroring the host tracker.
    """
    wavs = jnp.asarray(wavs, jnp.float32)
    B, S = wavs.shape
    # 'same' linear convolution with the high-pass FIR via rfft
    kern = highpass_kernel(fs).astype(np.float32)
    taps = len(kern)
    cfft = 1 << int(np.ceil(np.log2(S + taps - 1)))
    wavs = jnp.fft.irfft(
        jnp.fft.rfft(wavs, cfft) * jnp.fft.rfft(jnp.asarray(kern), cfft),
        cfft)[:, (taps - 1) // 2:(taps - 1) // 2 + S]
    min_lag = max(2, int(np.floor(fs / max_f0)))
    max_lag = int(np.ceil(fs / min_f0))
    window = _analysis_window(fs)
    step = max(1, int(round(frame_interval * fs / _OVERSAMPLE)))
    last = S - (window + max_lag)
    starts = np.arange(0, max(last, 0) + 1, step, dtype=np.int64)
    F = len(starts)
    seg_len = window + max_lag

    idx = starts[:, None] + np.arange(seg_len)[None, :]
    segs = wavs[:, idx]                     # (B, F, seg_len)
    base = segs[..., :window]

    nfft = 1 << int(np.ceil(np.log2(seg_len + window)))
    Bf = jnp.fft.rfft(base, nfft)
    Sf = jnp.fft.rfft(segs, nfft)
    corr = jnp.fft.irfft(jnp.conj(Bf) * Sf, nfft)[..., :max_lag + 1]

    csum = jnp.cumsum(jnp.square(segs), axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    ek = csum[..., window:] - csum[..., :-window]   # (B, F, max_lag + 1)
    e0 = ek[..., :1]
    denom = jnp.sqrt(e0 * ek) + 1e-12
    rms = jnp.sqrt(e0[..., 0] / window)             # (B, F)
    return (corr / denom)[..., min_lag:max_lag + 1], rms


def lag_range(fs: int, min_f0: float, max_f0: float):
    min_lag = max(2, int(np.floor(fs / max_f0)))
    max_lag = int(np.ceil(fs / min_f0))
    return min_lag, max_lag


def frame_starts(S: int, fs: int, frame_interval: float, min_f0: float,
                 max_f0: float) -> np.ndarray:
    _, max_lag = lag_range(fs, min_f0, max_f0)
    step = max(1, int(round(frame_interval * fs / _OVERSAMPLE)))
    last = S - (_analysis_window(fs) + max_lag)
    return np.arange(0, max(last, 0) + 1, step, dtype=np.int64)


@functools.partial(jax.jit, static_argnames=("fs", "min_lag", "uv_cost"))
def viterbi_batch(nccf: jnp.ndarray, fs: int, min_lag: int,
                  uv_cost: float, frame_valid=None,
                  silence_penalty=None):
    """(B, F, K) nccf -> (f0 (B, F), voiced (B, F)) via scan Viterbi.

    ``frame_valid`` (B, F) marks real frames of padded rows. Padded
    frames get zero local AND transition costs, which makes the scan a
    pure broadcast through them: the backtrace entering the padding
    picks argmin over the last real frame's costs -- exactly where the
    per-utterance host tracker terminates -- so batching rows of
    different lengths is bit-identical to tracking each row alone.

    ``silence_penalty`` (B, F) is added to every voiced candidate's
    local cost (the host tracker's quiet-frame penalty).
    """
    B, F, K = nccf.shape
    max_lag = min_lag + K - 1
    cand_nccf, order = jax.lax.top_k(nccf, _N_CANDS)     # (B, F, N)
    cand_lag = (order + min_lag).astype(jnp.float32)
    log_lag = jnp.log2(jnp.maximum(cand_lag, 1.0))

    n_states = _N_CANDS + 1
    voiced_local = 1.0 - cand_nccf * (
        1.0 - _LAG_WT_FRACTION * cand_lag / max_lag)
    if silence_penalty is not None:
        voiced_local = voiced_local + silence_penalty[..., None]
    local = jnp.concatenate(
        [jnp.full((B, F, 1), uv_cost, jnp.float32), voiced_local],
        axis=-1)                                          # (B, F, S)
    if frame_valid is None:
        frame_valid = jnp.ones((B, F), bool)
    local = jnp.where(frame_valid[..., None], local, 0.0)
    # state log-lags with a placeholder for unvoiced
    slog = jnp.concatenate(
        [jnp.zeros((B, F, 1), jnp.float32), log_lag], axis=-1)
    is_uv = jnp.arange(n_states) == 0                     # (S,)

    def trans_matrix(prev_log, cur_log):
        """(B, S_prev), (B, S_cur) -> (B, S_prev, S_cur) costs."""
        jump = jnp.abs(prev_log[:, :, None] - cur_log[:, None, :])
        voiced_pair = (~is_uv)[None, :, None] & (~is_uv)[None, None, :]
        switch = is_uv[None, :, None] ^ is_uv[None, None, :]
        return jnp.where(switch, _VUV_TRANSITION_COST,
                         jnp.where(voiced_pair, _FREQ_JUMP_COST * jump,
                                   0.0))

    def body(carry, frame):
        cost_prev, prev_log = carry
        local_f, slog_f, valid_f = frame
        trans = trans_matrix(prev_log, slog_f) \
            * valid_f[:, None, None].astype(jnp.float32)
        total = cost_prev[:, :, None] + trans
        back = jnp.argmin(total, axis=1)                  # (B, S)
        cost = jnp.min(total, axis=1) + local_f
        return (cost, slog_f), back

    init = (local[:, 0, :], slog[:, 0, :])
    frames = (jnp.moveaxis(local[:, 1:], 1, 0),
              jnp.moveaxis(slog[:, 1:], 1, 0),
              jnp.moveaxis(frame_valid[:, 1:], 1, 0))
    (final_cost, _), backs = jax.lax.scan(body, init, frames)
    # backs: (F-1, B, S)

    last_state = jnp.argmin(final_cost, axis=-1)          # (B,)

    # backs[j] maps frame j+1's state -> frame j's best predecessor.
    # Scanning backs in reverse with the carry = "state of frame j+1"
    # emits that carry per step (stacked back in forward order by
    # reverse=True), and the final carry is frame 0's state.
    def backtrack(carry, back_f):
        prev = jnp.take_along_axis(back_f, carry[:, None], axis=1)[:, 0]
        return prev, carry

    first_state, later_states = jax.lax.scan(backtrack, last_state, backs,
                                             reverse=True)
    states = jnp.concatenate([first_state[None], later_states], axis=0)
    states = jnp.moveaxis(states, 0, 1)                   # (B, F)

    voiced = states > 0
    sel = jnp.maximum(states - 1, 0)
    lag = jnp.take_along_axis(cand_lag, sel[..., None], axis=2)[..., 0]
    f0 = jnp.where(voiced, fs / jnp.maximum(lag, 1.0), 0.0)
    return f0, voiced


def track_pitch_batch(wavs, lengths, fs: int, frame_interval: float = 0.005,
                      min_f0: float = 40.0, max_f0: float = 500.0,
                      uv_weight: float = 0.9):
    """(B, S) padded wavs + (B,) lengths -> (f0 (B, F), starts (F,)).

    Frames whose analysis window extends past a row's true length are
    forced unvoiced (0).
    """
    nccf, rms = nccf_batch(wavs, fs, frame_interval, min_f0, max_f0)
    min_lag, max_lag = lag_range(fs, min_f0, max_f0)
    starts = frame_starts(wavs.shape[1], fs, frame_interval, min_f0,
                          max_f0)
    uv_cost = 1.0 - 1.0 / (1.0 + uv_weight)
    valid = jnp.asarray(starts[None, :] + _analysis_window(fs) + max_lag
                        <= np.asarray(lengths)[:, None])
    # quiet-frame penalty relative to each row's loudest VALID frame
    rel_db = 20.0 * jnp.log10(rms + 1e-9)
    rel_db = rel_db - jnp.max(jnp.where(valid, rel_db, -jnp.inf),
                              axis=1, keepdims=True)
    penalty = _SILENCE_ALPHA * jnp.maximum(0.0, _SILENCE_FLOOR_DB - rel_db)
    f0, _ = viterbi_batch(nccf, fs, min_lag, uv_cost, frame_valid=valid,
                          silence_penalty=penalty)
    return jnp.where(valid, f0, 0.0), starts
