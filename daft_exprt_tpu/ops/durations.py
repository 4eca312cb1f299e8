"""Duration quantization: float phone durations -> integer frame counts.

Two implementations with identical boundary semantics:

- ``duration_to_integer``: exact host (Python) version used by the
  preprocessing pipeline, matching the reference algorithm
  (/root/reference/src/daft_exprt/extract_features.py:69-111): a frame k
  (center sample index c + h*k, c = n_fft/2) belongs to phone i iff
  begin_samples_i < idx_k <= end_samples_i, with begin/end truncated to
  int samples; when the STFT is centered, n_fft/2/hop edge frames are
  added to the first phone and appended after the last phone.

- ``durations_to_int_frames``: closed-form vectorized version (works
  under jit, no data-dependent control flow) used on-device at inference
  to replace the reference's per-row CPU Python loop
  (/root/reference/src/daft_exprt/model.py:789-812).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def duration_to_integer(float_durations, hparams, nb_samples=None):
    """Exact reference-semantics conversion.

    :param float_durations: list of [begin_sec, end_sec] per phone
                            (contiguous, non-zero length)
    :param nb_samples: audio length in samples; estimated from the total
                       duration if None.
    :return: list of int frame counts (one per phone; a trailing entry is
             appended for the right edge frames if the frame budget was
             exhausted before the last phone).
    """
    float_durations = list(float_durations)
    if nb_samples is None:
        total_duration = sum((x[1] - x[0]) for x in float_durations)
        nb_samples = int(total_duration * hparams.sampling_rate)
    # Frame centers ignoring padding.
    nb_frames = 1 + int(
        (nb_samples - hparams.filter_length) / hparams.hop_length)
    frames_idx = [int(hparams.filter_length / 2) + hparams.hop_length * i
                  for i in range(nb_frames)]

    curr_frame = 1
    int_durations = []
    while curr_frame <= nb_frames:
        begin, end = float_durations.pop(0)
        if begin == end:
            raise ValueError("zero-length phone duration")
        begin = int(begin * hparams.sampling_rate)
        end = int(end * hparams.sampling_rate)
        nb_phone_frames = len([i for i in frames_idx if begin < i <= end])
        int_durations.append(nb_phone_frames)
        curr_frame += nb_phone_frames

    if hparams.centered:
        nb_edge_frames = int(hparams.filter_length / 2 / hparams.hop_length)
        int_durations[0] += nb_edge_frames
        if len(float_durations) != 0:
            int_durations.append(nb_edge_frames)
        else:
            int_durations[-1] += nb_edge_frames
    return int_durations


def durations_to_int_frames(durations, sampling_rate: int, filter_length: int,
                            hop_length: int, centered: bool = True):
    """Vectorized batched conversion, jit-compatible.

    :param durations: (B, L) float seconds; zeros mean "no frames" and do
                      not shift subsequent phone boundaries.
    :return: (B, L) int32 frame counts. Right-edge frames that the exact
             algorithm would append as an extra entry are folded into the
             last non-zero phone (equivalent for all downstream uses,
             which only consume per-symbol counts).
    """
    durations = jnp.asarray(durations, dtype=jnp.float32)
    c = filter_length // 2
    h = hop_length

    cum = jnp.cumsum(durations, axis=1)
    begin = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=1)
    end = cum
    # Truncate to integer sample indices (reference: int(begin * sr)).
    begin_s = jnp.floor(begin * sampling_rate).astype(jnp.int32)
    end_s = jnp.floor(end * sampling_rate).astype(jnp.int32)

    total = end_s[:, -1:]
    # Reference: 1 + int((nb_samples - filter_length) / hop) — int()
    # truncates toward zero, so audio SHORTER than one FFT window still
    # gets 1 base frame (floor division would give 0 and, uncentered,
    # an empty mel for a non-empty input).
    diff = total - filter_length
    nb_frames = 1 + jnp.sign(diff) * (jnp.abs(diff) // h)  # (B, 1)
    nb_frames = jnp.maximum(nb_frames, 0)

    # Count frame centers c + h*k with begin_s < c + h*k <= end_s,
    # k in [0, nb_frames).
    kmin = jnp.floor_divide(begin_s - c, h) + 1
    kmax = jnp.floor_divide(end_s - c, h)
    kmin = jnp.maximum(kmin, 0)
    kmax = jnp.minimum(kmax, nb_frames - 1)
    counts = jnp.maximum(kmax - kmin + 1, 0)
    counts = jnp.where(durations > 0.0, counts, 0)

    if centered:
        nb_edge = (filter_length // 2) // h
        nonzero = durations > 0.0
        any_nonzero = jnp.any(nonzero, axis=1, keepdims=True)
        first_idx = jnp.argmax(nonzero, axis=1)
        last_idx = (durations.shape[1] - 1
                    - jnp.argmax(nonzero[:, ::-1], axis=1))
        positions = jnp.arange(durations.shape[1])[None, :]
        one_hot_first = (positions == first_idx[:, None]).astype(counts.dtype)
        one_hot_last = (positions == last_idx[:, None]).astype(counts.dtype)
        counts = counts + jnp.where(
            any_nonzero, nb_edge * (one_hot_first + one_hot_last), 0)
    return counts.astype(jnp.int32)
