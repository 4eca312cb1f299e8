"""Output-frame bucket policy for bucketed decoding.

Inference output length T = sum of predicted integer durations is
data-dependent; under XLA every executable has a static T. The engine
therefore compiles the decode stage at a ladder of static output
buckets and picks one per batch. This module owns that choice:

- ``"speculate"``: estimate the bucket host-side from per-symbol
  duration statistics — no device sync, with a one-shot full-budget
  re-run if the estimate undershoots (the decode stage's overflow flag
  says so). Best when host<->chip round trips are expensive.
- ``"measure"``: read the predicted ``durations_int`` sums after the
  prosody stage (a few-hundred-byte sync) and pick the exact smallest
  bucket — never over-decodes, never re-runs. Best colocated.

The reference sizes outputs exactly instead (model.py:866-923) — a
dynamic shape a TPU program cannot afford per batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

POLICIES = ("speculate", "measure")


def symbol_duration_tables(hparams):
    """(mean, std) second-duration tables indexed by symbol id.

    Built from stats.json's per-symbol duration stats (the same source
    the reference loads back into hparams, features_stats.py:132-163);
    symbols without stats get a generous default so the host-side
    output-length estimate stays an upper bound in practice.
    """
    n = hparams.n_symbols
    mean = np.full((n,), 0.12, np.float32)
    std = np.full((n,), 0.08, np.float32)
    sym_stats = (hparams.stats or {}).get("symbols", {})
    for i, s in enumerate(hparams.symbols):
        if s in sym_stats:
            entry = sym_stats[s]
            # pipeline stats.json uses dur_mean/dur_std
            # (data/stats.py, reference features_stats.py:140-143)
            mean[i] = entry.get("dur_mean", entry.get("mean", mean[i]))
            std[i] = entry.get("dur_std", entry.get("std", std[i]))
    return mean, std


def default_buckets(max_out_frames: int, frame_bucket: int) -> list[int]:
    """Quarter multiples of ``max_out_frames``, frame-bucket aligned."""
    q = -(-max_out_frames // 4)  # ceil quarter
    q = -(-q // frame_bucket) * frame_bucket
    return sorted({min(q * i, max_out_frames) for i in range(1, 5)}
                  | {max_out_frames})


class OutputBucketPolicy:
    """Owns the bucket ladder and the per-batch bucket choice.

    Mutable on purpose: :meth:`align_to_multiple` re-grids the ladder
    when a vocoder with a blocked time multiple is attached, and the
    engine's warmup temporarily pins ``buckets`` to force each rung
    through the production path.
    """

    def __init__(self, hparams, max_out_frames=None,
                 out_frame_buckets=None, policy: str = "speculate"):
        assert policy in POLICIES, policy
        self.policy = policy
        self.hp = hparams
        self.max_frames = max_out_frames or hparams.max_frames
        if out_frame_buckets is None:
            out_frame_buckets = default_buckets(self.max_frames,
                                                hparams.frame_bucket)
        assert out_frame_buckets[-1] == self.max_frames
        self.buckets = list(out_frame_buckets)
        self.dur_mean, self.dur_std = symbol_duration_tables(hparams)

    def align_to_multiple(self, t_mult: int):
        """Round every bucket up to a multiple of ``t_mult`` (vocoder
        blocked-time alignment); the max grows accordingly."""
        t_mult = max(int(t_mult), 1)
        self.buckets = sorted({-(-b // t_mult) * t_mult
                               for b in self.buckets})
        self.max_frames = self.buckets[-1]

    def salt(self) -> bytes:
        """Contribution to the engine's AOT cache key: everything here
        that is baked into compiled graphs as constants."""
        return (np.ascontiguousarray(self.dur_mean).tobytes()
                + np.ascontiguousarray(self.dur_std).tobytes()
                + repr((self.max_frames, self.buckets,
                        self.policy)).encode())

    def _smallest_holding(self, need: int) -> int:
        for b in self.buckets:
            if need <= b:
                return b
        return self.buckets[-1]

    def speculate(self, inputs) -> int:
        """Host-side speculative output-frame bucket for one batch.

        Upper-bound estimate of each row's predicted total frames from
        the per-symbol duration stats (mean + 2 std, scaled by the
        duration control factors) — no device sync. If the speculation
        is ever too small, the decode stage's per-row overflow flag
        triggers one re-run at the full frame budget.
        """
        symbols, dur_factors = np.asarray(inputs[0]), np.asarray(inputs[1])
        input_lengths = np.asarray(inputs[4])
        L = symbols.shape[1]
        valid = np.arange(L)[None, :] < input_lengths[:, None]
        secs = (self.dur_mean[symbols] + 2.0 * self.dur_std[symbols]) \
            * np.abs(dur_factors)
        frames_per_row = np.sum(np.where(valid, secs, 0.0), axis=1) \
            * self.hp.sampling_rate / self.hp.hop_length
        need = int(np.max(frames_per_row) * 1.1) + 8
        return self._smallest_holding(need)

    def choose(self, inputs, encoder_preds) -> int:
        """Decode bucket per the configured policy."""
        if self.policy == "measure":
            need = int(np.max(jax.device_get(
                jnp.sum(encoder_preds[1], axis=1))))
            return self._smallest_holding(need)
        return self.speculate(inputs)
