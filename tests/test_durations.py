"""Duration quantization tests: exact host algorithm vs vectorized op."""

import numpy as np
import pytest

from daft_exprt_tpu.config import HyperParams
from daft_exprt_tpu.ops.durations import (duration_to_integer,
                                          durations_to_int_frames)


@pytest.fixture(scope="module")
def hp():
    return HyperParams(verbose=False, training_files="x",
                       validation_files="x", output_directory="/tmp/dx_test",
                       language="english", speakers=["spk"])


def _random_durations(rng, n, min_dur=0.03, max_dur=0.4):
    durs = rng.uniform(min_dur, max_dur, size=n)
    begins = np.concatenate([[0.0], np.cumsum(durs)[:-1]])
    ends = np.cumsum(durs)
    return [[float(b), float(e)] for b, e in zip(begins, ends)], durs


def test_exact_invariants(hp, rng_np):
    """Frame counts sum to the mel frame count and are all positive."""
    for _ in range(20):
        n = int(rng_np.integers(3, 40))
        float_durs, durs = _random_durations(rng_np, n)
        nb_samples = int(sum(durs) * hp.sampling_rate)
        ints = duration_to_integer(list(float_durs), hp,
                                   nb_samples=nb_samples)
        nb_frames = 1 + nb_samples // hp.hop_length  # centered STFT
        assert len(ints) == n
        assert sum(ints) == nb_frames
        assert all(d > 0 for d in ints)


def test_vectorized_matches_exact(hp, rng_np):
    """The closed-form jit-compatible op reproduces the host algorithm.

    All 30 random cases are padded to one fixed width so the op compiles
    once (trailing zeros are inert: test_vectorized_zero_durations).
    """
    width = 40
    for _ in range(30):
        n = int(rng_np.integers(3, width + 1))
        float_durs, durs = _random_durations(rng_np, n)
        exact = duration_to_integer(list(float_durs), hp)
        padded = np.zeros(width, np.float32)
        padded[:n] = durs
        vec = np.asarray(durations_to_int_frames(
            padded[None, :], hp.sampling_rate,
            hp.filter_length, hp.hop_length, hp.centered))[0]
        np.testing.assert_array_equal(np.array(exact), vec[:n])
        assert np.all(vec[n:] == 0)


def test_vectorized_sub_window_audio(hp):
    """Audio shorter than one FFT window still gets the reference's 1
    base frame: int() truncates toward zero where floor division would
    yield 0 (reference extract_features.py:81)."""
    durs = [0.04]  # 882 samples < filter_length 1024
    exact = duration_to_integer([[0.0, durs[0]]], hp)
    padded = np.zeros(8, np.float32)
    padded[0] = durs[0]
    vec = np.asarray(durations_to_int_frames(
        padded[None, :], hp.sampling_rate, hp.filter_length,
        hp.hop_length, hp.centered))[0]
    assert sum(exact) == vec.sum()
    assert vec[0] == sum(exact)  # folded into the only phone
    assert np.all(vec[1:] == 0)


def test_vectorized_zero_durations(hp, rng_np):
    """Zeros yield 0 frames and do not shift later phone boundaries."""
    float_durs, durs = _random_durations(rng_np, 10)
    exact = duration_to_integer(list(float_durs), hp)
    padded = np.zeros(16, dtype=np.float32)
    padded[:10] = durs
    # insert interior zeros: vectorized path must skip them
    with_zeros = np.insert(durs, [2, 5], 0.0).astype(np.float32)
    vec = np.asarray(durations_to_int_frames(
        with_zeros[None, :], hp.sampling_rate, hp.filter_length,
        hp.hop_length, hp.centered))[0]
    nonzero = vec[with_zeros > 0]
    np.testing.assert_array_equal(np.array(exact), nonzero)
    assert np.all(vec[with_zeros == 0.0] == 0)
    # trailing padding zeros
    vec_pad = np.asarray(durations_to_int_frames(
        padded[None, :], hp.sampling_rate, hp.filter_length, hp.hop_length,
        hp.centered))[0]
    np.testing.assert_array_equal(np.array(exact), vec_pad[:10])
    assert np.all(vec_pad[10:] == 0)


def test_vectorized_batched(hp, rng_np):
    """Batched rows are independent."""
    rows = []
    for _ in range(4):
        _, durs = _random_durations(rng_np, 12)
        rows.append(durs)
    batch = np.stack(rows).astype(np.float32)
    vec = np.asarray(durations_to_int_frames(
        batch, hp.sampling_rate, hp.filter_length, hp.hop_length,
        hp.centered))
    for i in range(4):
        single = np.asarray(durations_to_int_frames(
            batch[i:i + 1], hp.sampling_rate, hp.filter_length,
            hp.hop_length, hp.centered))[0]
        np.testing.assert_array_equal(vec[i], single)


def test_all_zero_row(hp):
    vec = np.asarray(durations_to_int_frames(
        np.zeros((1, 8), np.float32), hp.sampling_rate, hp.filter_length,
        hp.hop_length, hp.centered))[0]
    assert np.all(vec == 0)
