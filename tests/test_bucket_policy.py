"""Unit tests for the output-bucket policy and FiLM cache modules
(factored out of inference/generate.py; behavior pinned here at the
module level, end-to-end coverage in test_output_bucketing.py /
test_film_cache.py).
"""

import numpy as np
import pytest

from helpers import tiny_hparams

from daft_exprt_tpu.inference.buckets import (OutputBucketPolicy,
                                              default_buckets,
                                              symbol_duration_tables)
from daft_exprt_tpu.inference.film_cache import FilmCache, slim_inputs


def _inputs(symbols, dur_factors=None, lengths=None):
    B, L = symbols.shape
    return (symbols,
            dur_factors if dur_factors is not None
            else np.ones((B, L), np.float32),
            np.ones((B, L), np.float32),
            np.zeros((B, L), np.float32),
            lengths if lengths is not None
            else np.full((B,), L, np.int32),
            np.zeros((B, 8), np.float32),
            np.zeros((B, 8), np.float32),
            np.zeros((B, 4, 8), np.float32),
            np.full((B,), 8, np.int32),
            np.zeros((B,), np.int32))


def test_default_buckets_quarter_ladder():
    assert default_buckets(256, 64) == [64, 128, 192, 256]
    # aligned up to frame_bucket, max always last
    bs = default_buckets(250, 32)
    assert bs[-1] == 250 and bs == sorted(bs)
    assert all(b <= 250 for b in bs)


def test_align_to_multiple_regrids_and_grows_max():
    hp = tiny_hparams()
    pol = OutputBucketPolicy(hp, max_out_frames=250,
                             out_frame_buckets=[100, 250])
    pol.align_to_multiple(64)
    assert all(b % 64 == 0 for b in pol.buckets)
    assert pol.max_frames == pol.buckets[-1] >= 250


def test_speculate_monotonic_in_length_and_factors():
    hp = tiny_hparams()
    pol = OutputBucketPolicy(hp, max_out_frames=1024,
                             out_frame_buckets=[128, 256, 512, 1024])
    sym_short = np.ones((1, 8), np.int32)
    sym_long = np.ones((1, 64), np.int32)
    b_short = pol.speculate(_inputs(sym_short))
    b_long = pol.speculate(_inputs(sym_long))
    assert b_short <= b_long
    # duration factors scale the estimate
    b_fast = pol.speculate(_inputs(
        sym_long, dur_factors=np.full((1, 64), 0.25, np.float32)))
    assert b_fast <= b_long
    # padding rows (length < L) don't inflate the estimate
    b_masked = pol.speculate(_inputs(
        sym_long, lengths=np.array([8], np.int32)))
    assert b_masked == b_short


def test_speculate_caps_at_max():
    hp = tiny_hparams()
    pol = OutputBucketPolicy(hp, max_out_frames=64,
                             out_frame_buckets=[64])
    sym = np.ones((1, 512), np.int32)
    assert pol.speculate(_inputs(sym)) == 64


def test_duration_tables_read_stats():
    hp = tiny_hparams()
    hp.stats = {"symbols": {hp.symbols[3]: {"dur_mean": 0.5,
                                            "dur_std": 0.01}}}
    mean, std = symbol_duration_tables(hp)
    assert mean[3] == np.float32(0.5) and std[3] == np.float32(0.01)
    # defaults elsewhere
    assert mean[4] == np.float32(0.12) and std[4] == np.float32(0.08)


def test_salt_changes_with_policy_and_buckets():
    hp = tiny_hparams()
    a = OutputBucketPolicy(hp, 256, [128, 256], "speculate").salt()
    b = OutputBucketPolicy(hp, 256, [128, 256], "measure").salt()
    c = OutputBucketPolicy(hp, 256, [256], "speculate").salt()
    assert a != b and a != c


def test_invalid_policy_rejected():
    hp = tiny_hparams()
    with pytest.raises(AssertionError):
        OutputBucketPolicy(hp, 256, [256], policy="guess")


# ----------------------------------------------------------------------
# FilmCache
# ----------------------------------------------------------------------
def _film_fn(calls):
    """Fake compiled prosody encoder: films = f(speaker_ids)."""
    def fn(params, energy, pitch, mel, ref_lens, speaker_ids):
        calls.append(len(speaker_ids))
        B = len(speaker_ids)
        base = np.asarray(speaker_ids, np.float32)[:, None]
        return (base + np.zeros((B, 4), np.float32),
                base + np.ones((B, 4), np.float32),
                base + 2 * np.ones((B, 4), np.float32))
    return fn


def test_film_cache_hits_skip_compute():
    calls = []
    cache = FilmCache()
    inputs = _inputs(np.ones((2, 8), np.int32))
    films = cache.resolve(_film_fn(calls), None, inputs, ["a", "b"])
    assert len(calls) == 1
    assert all(f.shape[0] == 2 for f in films)
    assert set(cache) == {"a", "b"}
    # all-hit batch: no new call
    films2 = cache.resolve(_film_fn(calls), None, inputs, ["b", "a"])
    assert len(calls) == 1
    np.testing.assert_array_equal(films[0][0], films2[0][1])


def test_film_cache_padding_rows_zero_not_cached():
    calls = []
    cache = FilmCache()
    inputs = _inputs(np.ones((2, 8), np.int32))
    cache.resolve(_film_fn(calls), None, inputs, ["a", None])
    assert None not in cache and "a" in cache
    # hit path: None rows resolve to zeros
    films = cache.resolve(_film_fn(calls), None, inputs, ["a", None])
    assert len(calls) == 1
    assert np.all(films[0][1] == 0)


def test_film_cache_capacity_fifo():
    calls = []
    cache = FilmCache(capacity=2)
    for i in range(4):
        inputs = _inputs(np.ones((1, 8), np.int32))
        cache.resolve(_film_fn(calls), None, inputs, [f"k{i}"])
    assert len(cache) == 2
    assert "k0" not in cache and "k3" in cache


def test_slim_inputs_shapes():
    inputs = _inputs(np.ones((3, 8), np.int32))
    slim = slim_inputs(inputs, n_mel_channels=4)
    assert slim[5].shape == (3, 1) and slim[6].shape == (3, 1)
    assert slim[7].shape == (3, 4, 1)
    np.testing.assert_array_equal(slim[8], np.ones((3,), np.int32))
    # symbol-side tensors untouched, speaker ids kept
    assert slim[0] is inputs[0] and slim[9] is inputs[9]
    assert len(slim) == 10
