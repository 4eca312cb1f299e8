"""Griffin-Lim waveform reconstruction from mel-spectrograms (JAX).

Capability parity with the reference previewer
(/root/reference/src/daft_exprt/griffin_lim.py): log-mel -> linear
magnitude via non-negative least squares against the mel filterbank,
then iterative phase reconstruction, peak-normalized output.

TPU-first design: both stages are jittable, batched, fixed-iteration
JAX programs instead of the reference's scipy L-BFGS blocks + per-frame
Python FFT loops --

- NNLS by projected (FISTA-accelerated) gradient descent on
  ``|Ax - B|^2`` with x >= 0: pure matmuls, batches over utterances;
- Griffin-Lim with ``jax.lax.fori_loop`` over rfft/irfft + strided
  overlap-add (the same update rule: keep the target magnitude, re-use
  the estimated phase).

Runs on whatever backend jax is on (TPU for batched preview generation,
CPU inside preprocessing workers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.ops.mel import mel_filter_bank


# ----------------------------------------------------------------------
# mel -> linear magnitude (batched NNLS)
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("iterations",))
def nnls(A: jnp.ndarray, B: jnp.ndarray, iterations: int = 200):
    """Solve min_{X>=0} |A X - B|^2 by FISTA projected gradient.

    :param A: (m, n) basis (mel filterbank)
    :param B: (..., m, N) targets (linear-mel magnitudes)
    :return: (..., n, N) non-negative solution
    """
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    # Lipschitz constant of the gradient = largest eigenvalue of A^T A;
    # power iteration (20 steps) is cheap and exact enough.
    AtA = A.T @ A

    def power_iter(i, v):
        v = AtA @ v
        return v / jnp.linalg.norm(v)

    v0 = jnp.ones((A.shape[1],), jnp.float32) / np.sqrt(A.shape[1])
    v = jax.lax.fori_loop(0, 20, power_iter, v0)
    lipschitz = jnp.vdot(v, AtA @ v)
    step = 1.0 / lipschitz

    # least-squares warm start, clipped to >= 0
    x0 = jnp.clip(jnp.einsum("nm,...mN->...nN", jnp.linalg.pinv(A), B),
                  min=0.0)

    def body(i, carry):
        x, y, t = carry
        grad = jnp.einsum("nm,...mN->...nN", A.T,
                          jnp.einsum("mn,...nN->...mN", A, y) - B)
        x_new = jnp.clip(y - step * grad, min=0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, y_new, t_new

    x, _, _ = jax.lax.fori_loop(
        0, iterations, body, (x0, x0, jnp.array(1.0, jnp.float32)))
    return x


def mel_to_linear(log_mel_spec: np.ndarray, hparams) -> np.ndarray:
    """(n_mels, T) log-mel -> (1 + n_fft//2, T) linear magnitude."""
    fb = jnp.asarray(mel_filter_bank(
        hparams.sampling_rate, hparams.filter_length,
        log_mel_spec.shape[0], hparams.mel_fmin, hparams.mel_fmax))
    return np.asarray(nnls(fb, jnp.exp(jnp.asarray(log_mel_spec))))


# ----------------------------------------------------------------------
# Griffin-Lim phase reconstruction
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "iterations"))
def _griffin_lim(magnitude: jnp.ndarray, rng: jax.Array, n_fft: int,
                 hop: int, iterations: int):
    """(F, 1 + n_fft//2) magnitude frames -> time signal.

    Hann analysis/synthesis windows, overlap-add normalized by the
    constant window gain n_fft / hop / 2 (exact for the Hann window
    with hop | n_fft).
    """
    F = magnitude.shape[0]
    n = np.hanning(n_fft)  # symmetric window, matching np.hanning
    window = jnp.asarray(n, jnp.float32)
    length = F * hop + n_fft
    gain = n_fft / hop / 2.0

    starts = jnp.arange(F) * hop
    frame_idx = starts[:, None] + jnp.arange(n_fft)[None, :]

    def analyze(x):
        frames = x[frame_idx] * window
        return jnp.fft.rfft(frames, n_fft, axis=-1)

    def synthesize(spec):
        frames = jnp.fft.irfft(spec, n_fft, axis=-1) * window
        x = jnp.zeros((length,), jnp.float32)
        x = x.at[frame_idx].add(frames)
        return x / gain

    x0 = jax.random.normal(rng, (length,), jnp.float32)

    def body(i, x):
        spec = analyze(x)
        phase = spec / jnp.maximum(jnp.abs(spec), 1e-12)
        return synthesize(magnitude * phase)

    return jax.lax.fori_loop(0, iterations, body, x0)


def reconstruct_signal_griffin_lim(magnitude_spectrogram: np.ndarray,
                                   step_size: int, iterations: int = 30,
                                   seed: int = 0) -> np.ndarray:
    """(1 + n_fft//2, T) magnitude -> waveform (float, unnormalized)."""
    mag = jnp.asarray(magnitude_spectrogram.T, jnp.float32)
    n_fft = (magnitude_spectrogram.shape[0] - 1) * 2
    wav = _griffin_lim(mag, jax.random.PRNGKey(seed), n_fft, step_size,
                       iterations)
    return np.asarray(wav)


def griffin_lim_reconstruction_batch(log_mels: list, hparams,
                                     iterations: int = 30) -> list:
    """Batched mel -> waveform previews: ONE device dispatch for N mels.

    Same per-utterance semantics as
    :func:`griffin_lim_reconstruction_from_mel_spec` (drop the two
    centered-STFT tail frames, peak-normalize), but NNLS runs once over
    the concatenated frame axes (columns are independent) and the
    phase-reconstruction loop runs vmapped over rows padded to a common
    bucket — N sequential dispatches collapse into two.
    """
    if not log_mels:
        return []
    keep = [(i, m) for i, m in enumerate(log_mels)
            if m.ndim == 2 and m.shape[1] > 2]
    wavs: list = [np.array([])] * len(log_mels)
    if not keep:
        return wavs
    floor = float(np.log(hparams.min_clipping))
    bucket = max(int(getattr(hparams, "frame_bucket", 1)), 1)
    effs = [m.shape[1] - 2 for _, m in keep]
    t_pad = -(-max(effs) // bucket) * bucket
    padded = np.full((len(keep), log_mels[keep[0][0]].shape[0], t_pad),
                     floor, np.float32)
    for row, (_, m) in enumerate(keep):
        padded[row, :, :m.shape[1] - 2] = m[:, :-2]
    # NNLS is per-column: one call over the concatenated frame axis
    linear = mel_to_linear(
        padded.transpose(1, 0, 2).reshape(padded.shape[1], -1), hparams)
    linear = linear.reshape(linear.shape[0], len(keep), t_pad)
    n_fft = (linear.shape[0] - 1) * 2
    mags = jnp.asarray(linear.transpose(1, 2, 0), jnp.float32)
    keys = jnp.broadcast_to(jax.random.PRNGKey(0), (len(keep), 2))
    batch_wavs = np.asarray(jax.vmap(
        lambda m, k: _griffin_lim(m, k, n_fft, hparams.hop_length,
                                  iterations))(mags, keys))
    for row, (i, _) in enumerate(keep):
        wav = batch_wavs[row, :(effs[row] - 1) * hparams.hop_length
                         + hparams.filter_length]
        peak = np.max(np.abs(wav))
        wavs[i] = wav / peak if peak > 0 else wav
    return wavs


def griffin_lim_reconstruction_from_mel_spec(log_mel_spec: np.ndarray,
                                             hparams,
                                             iterations: int = 30
                                             ) -> np.ndarray:
    """log-mel (n_mels, T) -> peak-normalized waveform.

    Drops the last two frames as the reference does (they carry the
    centered-STFT right padding). The frame axis is padded up to the
    configured frame bucket before the jitted NNLS/Griffin-Lim programs
    (then cropped), so utterances of different lengths reuse cached
    executables instead of recompiling per shape.
    """
    if log_mel_spec.ndim != 2 or log_mel_spec.shape[1] <= 2:
        return np.array([])
    # drop the two real tail frames BEFORE bucket padding: padding
    # first and then slicing [:-2] would remove two silence pad frames
    # while the centered-STFT right-padding frames this function exists
    # to drop still overlap-add into the tail
    log_mel_spec = log_mel_spec[:, :-2]
    t_eff = log_mel_spec.shape[1]
    bucket = max(int(getattr(hparams, "frame_bucket", 1)), 1)
    t_pad = -(-t_eff // bucket) * bucket
    if t_pad != t_eff:
        log_mel_spec = np.pad(
            log_mel_spec, ((0, 0), (0, t_pad - t_eff)),
            constant_values=float(np.log(hparams.min_clipping)))
    linear = mel_to_linear(log_mel_spec, hparams)
    wav = reconstruct_signal_griffin_lim(linear, hparams.hop_length,
                                         iterations=iterations)
    # crop to the unpadded reconstruction length: t_eff frames span
    # (t_eff - 1) hops plus the final analysis window
    wav = wav[:(t_eff - 1) * hparams.hop_length + hparams.filter_length]
    peak = np.max(np.abs(wav))
    return wav / peak if peak > 0 else wav
