"""Streaming (chunked) HiFi-GAN vocoding: low time-to-first-audio.

The reference pipeline (and this repo's batch path, `vocode_mels`)
vocodes a whole utterance in one dispatch, so the first audio sample
is only available after the full waveform is computed. For serving,
time-to-first-audio (TTFA) is what a listener perceives; a 20-second
utterance should start playing after one chunk, not after the whole
20 s of audio is rendered.

HiFi-GAN is purely convolutional (convs, transposed convs, leaky-relu,
tanh -- no recurrence, no attention), so every output sample depends
on a FINITE window of input mel frames: the receptive field.
`mel_halo_frames` walks the generator config and returns a
conservative one-sided bound on that window, in mel frames. The
streaming strategy is then exact, not approximate:

- slice the mel into fixed-size windows of ``chunk + 2*halo`` frames
  (ONE static shape -> one compiled executable for the whole stream);
- windows are clamped at the LEFT edge only (frame 0), matching the
  zero-SAME conv padding every other path applies at an utterance's
  start; beyond the true length T the mel is continued with the
  log-clamp floor ``log(1e-5)``, the SAME tail semantics as the
  batch path (``vocode_mels``) and the fused acoustic+vocoder graph
  (both vocode a floor-padded bucket and crop to ``T * up``) -- so
  the stream is sample-identical to those serving paths, junk in a
  caller's padded buffer beyond T notwithstanding;
- crop ``chunk * prod(upsample_rates)`` samples from each output at
  the window-relative offset of the chunk.

Every retained output sample is computed from the same input values
through the same per-sample dot products as the full-utterance run,
so the concatenated stream equals `HiFiGanGenerator.apply` on the
floor-padded mel cropped to ``T * up`` (bit-level on the plain path;
the time-blocked layout reassociates sums at window-relative block
phases, which is inaudible -- see tests/test_streaming_vocoder.py
for both).

Windows are double-buffered: window i+1 is dispatched to the device
before window i's result is fetched, so host transfer overlaps device
compute and a stream runs at the batch path's throughput after the
first chunk.

The reference has no analog (it emits mels for an external vocoder
repo: /root/reference/README.md:185-205); this is a beyond-parity
serving capability.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.vocoder.hifigan import (HiFiGanGenerator,
                                            _prepared_vocoder)


def mel_halo_frames(gen: HiFiGanGenerator) -> int:
    """Conservative one-sided receptive field of the generator, in mel
    frames: a window with this halo on each side yields interior
    outputs identical to a full-utterance run.

    Walks the architecture tracking ``reach`` (one-sided dependency
    radius in mel frames) and ``s`` (output samples per mel frame at
    the current stage). A conv with kernel k, dilation d at temporal
    scale s adds ``(k-1)*d/2 / s`` frames; a transposed conv with
    kernel k adds at most ``k / s`` frames (over-counting slightly --
    the exact reach is ceil((k-p-1)/u) input samples -- keeps the
    bound safe for every (k, u, padding) the official configs use).
    The MRF fan is parallel (averaged), so its reach is the MAX over
    resblocks; the dilation chain inside one resblock is sequential,
    so reaches ADD along it.
    """
    cfg = gen.cfg
    reach = (7 - 1) / 2  # conv_pre, k=7
    s = 1.0
    for u, k in zip(cfg["upsample_rates"], cfg["upsample_kernel_sizes"]):
        reach += k / s
        s *= u
        fan = 0.0
        for kr, dils in zip(cfg["resblock_kernel_sizes"],
                            cfg["resblock_dilation_sizes"]):
            chain = 0.0
            for d in dils:
                chain += (kr - 1) * d / 2  # convs1[j], dilation d
                if gen.two_convs:
                    chain += (kr - 1) / 2  # convs2[j], dilation 1
            fan = max(fan, chain)
        reach += fan / s
    reach += (7 - 1) / 2 / s  # conv_post, k=7
    return int(math.ceil(reach))


class StreamingVocoder:
    """Chunked mel -> waveform with a single compiled window shape.

    :param gen: generator architecture
    :param params: generator weights (same no-in-place-mutation
        contract as ``vocode_mels``: the compiled-weight cache is
        keyed by the dict's identity)
    :param chunk_frames: mel frames of NEW audio per emitted chunk
        (64 frames = 743 ms at 22050 Hz / hop 256)
    :param halo_frames: one-sided context; default
        ``mel_halo_frames(gen)``. Values below the default break
        exactness at chunk seams.
    :param dtype: matmul compute dtype
    :param blocked: run the time-blocked full-lane layout (default:
        on, unless ``DAFT_DISABLE_BLOCKED_VOCODER=1``); see
        `vocoder/hifigan.py`
    """

    def __init__(self, gen: HiFiGanGenerator, params, *,
                 chunk_frames: int = 64, halo_frames: int | None = None,
                 dtype=jnp.float32, blocked: bool | None = None):
        import os
        if blocked is None:
            blocked = os.environ.get(
                "DAFT_DISABLE_BLOCKED_VOCODER", "0") != "1"
        self.gen = gen
        self.params = params
        self.up = int(np.prod(gen.cfg["upsample_rates"]))
        self._fn, self._weights, t_mult = _prepared_vocoder(
            gen, params, dtype, blocked)
        self.chunk = int(chunk_frames)
        halo = mel_halo_frames(gen) if halo_frames is None \
            else int(halo_frames)
        # the window is the ONE compiled shape; round it up so the
        # blocked layout's plain->blocked bridges all divide it
        window = self.chunk + 2 * halo
        if window % t_mult:
            window += t_mult - window % t_mult
        self.halo = (window - self.chunk) // 2
        self.window = self.chunk + 2 * self.halo
        self._t_mult = t_mult

    # ------------------------------------------------------------------
    def windows(self, n_frames: int):
        """Static plan: [(window_start, crop_start, crop_len), ...] in
        mel frames; ``sum(crop_len) == n_frames``. Window starts clamp
        at 0 on the left only; a window may extend past ``n_frames``
        into the floor padding (``stream`` provides it)."""
        T, C, H = n_frames, self.chunk, self.halo
        plan = []
        for c0 in range(0, T, C):
            c1 = min(c0 + C, T)
            ws = max(c0 - H, 0)
            plan.append((ws, c0 - ws, c1 - c0))
        return plan

    def stream(self, mel, n_frames: int | None = None):
        """Yield float32 waveform chunks for ``mel`` (num_mels, T).

        Chunks concatenate to exactly ``n_frames * prod(rates)``
        samples, equal to the full-utterance run on ``mel[:, :T]``
        floor-padded past T (the batch/fused tail semantics; see the
        module docstring). Utterances no longer than ``window - halo``
        frames fall back to a single padded dispatch (cropped).
        """
        mel = np.asarray(mel, np.float32)
        T = mel.shape[1] if n_frames is None else int(n_frames)
        up = self.up

        if T + self.halo <= self.window:
            # single-dispatch fast path, same compiled shape as the
            # windowed loop. Only valid while the floor region
            # [T, window) covers the tail receptive field [T, T+halo):
            # for T in (window-halo, window) the buffer would end
            # inside the tail context and the conv's zero-SAME padding
            # (mel 0.0, not the log(1e-5) floor) would leak into the
            # last samples -- those lengths take the windowed loop,
            # which always keeps >= halo in-window frames of context
            # right of every retained sample.
            padded = np.full((1, mel.shape[0], self.window),
                             np.log(1e-5), np.float32)
            padded[0, :, :T] = mel[:, :T]
            yield np.asarray(self._fn(self._weights,
                                      jnp.asarray(padded)))[0, :T * up]
            return

        # continue the mel with the log-clamp floor so tail windows see
        # the same values the batch/fused paths' padded buckets hold
        # (a caller's own buffer may hold junk beyond T -- ignore it)
        ext = np.full((mel.shape[0], T + self.window), np.log(1e-5),
                      np.float32)
        ext[:, :T] = mel[:, :T]
        pending = None  # (device array, crop slice) -- double buffer
        for ws, rel, n in self.windows(T):
            win = jnp.asarray(ext[None, :, ws:ws + self.window])
            out = self._fn(self._weights, win)  # async dispatch
            if pending is not None:
                prev, sl = pending
                yield np.asarray(prev)[0, sl]
            pending = (out, slice(rel * up, (rel + n) * up))
        prev, sl = pending
        yield np.asarray(prev)[0, sl]

    def vocode(self, mel, n_frames: int | None = None):
        """Convenience: run the stream to completion, return one wav."""
        return np.concatenate(list(self.stream(mel, n_frames)))
