"""FiLM parameter reuse across requests.

The prosody encoder reads only the (reference features, speaker) pair,
so with a fixed style bank its output — the per-module FiLM (γ, β)
tensors (reference model.py:295-464) — is identical for every sentence
conditioned on the same style. Caching it removes ~60% of per-sentence
inference work in style-bank serving.

:class:`FilmCache` maps per-row hashable keys to per-row
(encoder_film, prosody_pred_film, decoder_film) numpy slices;
:func:`slim_inputs` replaces the now-unneeded full-size reference
tensors with (B, 1) dummies so cached-path executables never transfer
them host->device.
"""

from __future__ import annotations

import jax
import numpy as np


def slim_inputs(inputs, n_mel_channels: int):
    """Replace reference features with (B, 1) dummies: with precomputed
    films the executable must not transfer full-size reference
    tensors."""
    B = inputs[0].shape[0]
    dummy = (np.zeros((B, 1), np.float32), np.zeros((B, 1), np.float32),
             np.zeros((B, n_mel_channels, 1), np.float32),
             np.ones((B,), np.int32))
    return tuple(inputs[:5]) + dummy + (inputs[9],)


class FilmCache:
    """(reference identity, speaker_id) -> per-row FiLM params.

    Bounded FIFO (dict preserves insertion order); ``None`` keys mark
    padding rows — never cached, resolved to zero films whose outputs
    the caller crops away.
    """

    def __init__(self, capacity: int = 4096):
        self.capacity = capacity
        self.entries: dict = {}

    # dict-like surface (tests and warmup bookkeeping use it)
    def __contains__(self, key):
        return key in self.entries

    def __iter__(self):
        return iter(self.entries)

    def __len__(self):
        return len(self.entries)

    def pop(self, key, default=None):
        return self.entries.pop(key, default)

    def clear(self):
        self.entries.clear()

    def resolve(self, film_fn, params, inputs, film_keys):
        """Per-row FiLM params for one batch, served from the cache;
        any missing key triggers ONE prosody-encoder batch (computing
        every row, so a batch of all-new styles costs one dispatch).

        :param film_fn: compiled prosody-encoder executable taking
            (params, energy_refs, pitch_refs, mel_refs, ref_lengths,
            speaker_ids).
        :return: 3-tuple of (B, ...) stacked film arrays.
        """
        B = inputs[0].shape[0]
        assert len(film_keys) == B, (len(film_keys), B)
        missing = not self.entries or any(
            k is not None and k not in self.entries for k in film_keys)
        if missing:
            computed = film_fn(params, *inputs[5:10])
            computed = jax.device_get(computed)  # pipelined D2H
            rows = []
            for row, k in enumerate(film_keys):
                row_film = tuple(f[row] for f in computed)
                if k is not None:  # None = padding row, don't cache
                    self.entries[k] = row_film
                rows.append(row_film)
            # bound host memory: drop oldest entries
            while len(self.entries) > self.capacity:
                self.entries.pop(next(iter(self.entries)))
        else:
            # padding rows (key None) get zero films; their outputs are
            # cropped away by the caller
            zero = None
            rows = []
            for k in film_keys:
                if k is not None:
                    rows.append(self.entries[k])
                else:
                    if zero is None:
                        any_row = self.entries[next(iter(self.entries))]
                        zero = tuple(np.zeros_like(f) for f in any_row)
                    rows.append(zero)
        return tuple(np.stack([r[i] for r in rows]) for i in range(3))
