"""Streaming vocoder: chunked output must equal the full-utterance run.

The streaming contract (vocoder/streaming.py) is exactness, not
approximation: with halo >= the generator's receptive field, every
emitted sample is computed from the same inputs through the same
per-sample dot products as `HiFiGanGenerator.apply` on the mel
floor-padded past its true length (the batch/fused serving paths'
tail semantics). These tests check the analytic halo bound is
sufficient (and that the test would catch an insufficient one), seam
placement, edge-window semantics, tail parity with the padded-bucket
paths, and the blocked fast path.
"""

import jax
import numpy as np
import pytest

from daft_exprt_tpu.vocoder.hifigan import HiFiGanGenerator
from daft_exprt_tpu.vocoder.streaming import (StreamingVocoder,
                                              mel_halo_frames)

TINY = {
    "upsample_rates": [4, 2],
    "upsample_kernel_sizes": [8, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3, 5],
    "resblock_dilation_sizes": [[1, 3], [1, 3]],
    "num_mels": 16,
}


@pytest.fixture(scope="module")
def tiny_gen():
    gen = HiFiGanGenerator(TINY)
    params = gen.init_params(jax.random.PRNGKey(7))
    return gen, params


def _mel(rng, n_mels, t):
    return rng.standard_normal((n_mels, t)).astype(np.float32)


def _full_run(gen, params, mel, pad, blocked=False):
    """Reference: apply on the floor-padded mel, cropped to T*up --
    the tail semantics of vocode_mels and the fused serving graph."""
    T = mel.shape[1]
    up = int(np.prod(gen.cfg["upsample_rates"]))
    ext = np.full((mel.shape[0], T + pad), np.log(1e-5), np.float32)
    ext[:, :T] = mel
    return np.asarray(gen.apply(params, ext[None]))[0, :T * up]


def test_halo_bound_covers_v1_config():
    # full V1: the bound must be finite and modest (a window of
    # chunk + 2*halo frames is the serving executable's shape)
    gen = HiFiGanGenerator()
    h = mel_halo_frames(gen)
    assert 8 <= h <= 64


def test_stream_equals_full_run(tiny_gen, rng_np):
    gen, params = tiny_gen
    T = 75  # several chunks + a ragged tail
    mel = _mel(rng_np, TINY["num_mels"], T)
    sv = StreamingVocoder(gen, params, chunk_frames=16, blocked=False)
    assert sv.halo >= mel_halo_frames(gen)
    want = _full_run(gen, params, mel, sv.window)
    chunks = list(sv.stream(mel))
    assert len(chunks) == -(-T // 16)
    got = np.concatenate(chunks)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_insufficient_halo_breaks_seams(tiny_gen, rng_np):
    # guards the exactness test's sensitivity: a halo far below the
    # receptive field must visibly corrupt chunk seams
    gen, params = tiny_gen
    T = 75
    mel = _mel(rng_np, TINY["num_mels"], T)
    sv0 = StreamingVocoder(gen, params, chunk_frames=16, blocked=False)
    want = _full_run(gen, params, mel, sv0.window)
    sv = StreamingVocoder(gen, params, chunk_frames=16, halo_frames=1,
                          blocked=False)
    got = np.concatenate(list(sv.stream(mel)))
    assert np.abs(got - want).max() > 1e-4


def test_short_utterance_single_window(tiny_gen, rng_np):
    gen, params = tiny_gen
    sv = StreamingVocoder(gen, params, chunk_frames=16, blocked=False)
    T = sv.window - sv.halo  # longest single-dispatch fallback length
    mel = _mel(rng_np, TINY["num_mels"], T)
    chunks = list(sv.stream(mel))
    assert len(chunks) == 1
    assert chunks[0].shape == (T * sv.up,)
    # the fallback buffer keeps >= halo floor frames past T, so the
    # whole chunk -- tail included -- equals the floor-padded full run
    want = _full_run(gen, params, mel, sv.window)
    np.testing.assert_allclose(chunks[0], want, rtol=0, atol=2e-6)


def test_tail_exact_within_halo_of_one_window(tiny_gen, rng_np):
    """Regression: for T in (window - halo, window) the old fallback's
    floor buffer ended inside the tail receptive field, so the conv's
    zero-SAME padding (mel 0.0, not the log(1e-5) floor) leaked into
    the last samples; those lengths must stream exactly (they now take
    the windowed loop)."""
    gen, params = tiny_gen
    sv = StreamingVocoder(gen, params, chunk_frames=16, blocked=False)
    for T in (sv.window - sv.halo + 1, sv.window - 1):
        mel = _mel(rng_np, TINY["num_mels"], T)
        want = _full_run(gen, params, mel, sv.window)
        got = np.concatenate(list(sv.stream(mel)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_stream_blocked_matches_plain(tiny_gen, rng_np):
    # the time-blocked layout reassociates sums at window-relative
    # phases; the stream must stay audio-transparent vs the plain run
    gen, params = tiny_gen
    T = 75
    mel = _mel(rng_np, TINY["num_mels"], T)
    sv = StreamingVocoder(gen, params, chunk_frames=16, blocked=True)
    want = _full_run(gen, params, mel, sv.window)
    got = np.concatenate(list(sv.stream(mel)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_plan_covers_every_frame(tiny_gen):
    gen, params = tiny_gen
    sv = StreamingVocoder(gen, params, chunk_frames=16, blocked=False)
    for T in (sv.window, sv.window + 1, 75, 161):
        plan = sv.windows(T)
        covered = 0
        for ws, rel, n in plan:
            assert 0 <= ws <= max(T - 1, 0)
            assert 0 <= rel and rel + n <= sv.window
            assert ws + rel == covered  # chunks are contiguous
            covered += n
        assert covered == T


def test_stream_ignores_junk_beyond_true_length(tiny_gen, rng_np):
    """Serving hands the streamer PADDED bucket rows whose frames
    beyond out_lens hold decoder zeros (not the mel floor); the stream
    must reproduce the fused/batch tail regardless (regression: the
    last window used to clamp right and zero-SAME-pad at T)."""
    gen, params = tiny_gen
    T = 75
    mel = _mel(rng_np, TINY["num_mels"], T)
    sv = StreamingVocoder(gen, params, chunk_frames=16, blocked=False)
    want = _full_run(gen, params, mel, sv.window)
    padded = np.concatenate(
        [mel, 7.0 * rng_np.standard_normal(
            (TINY["num_mels"], 13)).astype(np.float32)], axis=1)
    got = np.concatenate(list(sv.stream(padded, n_frames=T)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)
