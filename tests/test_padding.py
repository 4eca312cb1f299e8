"""Epoch-plan padding: plan_steps/padding_report invariants.

The reference pads dynamically per batch (data_loader.py:146-211); the
TPU build pads to static buckets and measures the waste
(tools/padding_report.py). These pin the planner's contracts.
"""

import numpy as np
import pytest

from daft_exprt_tpu.data.loader import (bucket_size, padding_report,
                                        plan_steps)


class HP:
    batch_size = 4
    accumulation_steps = 2
    symbol_bucket = 16
    frame_bucket = 64
    max_symbols = 256
    max_frames = 2048
    sort_chunk_steps = 16
    seed = 1234


def _lengths(n=200, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(60, 900, size=n)
    symbols = np.maximum(frames // 7, 2)
    return list(zip(symbols.tolist(), frames.tolist()))


@pytest.mark.fast
def test_plan_covers_each_item_once_per_full_step():
    lengths = _lengths(83)  # not a multiple of step size 8
    plan = plan_steps(lengths, HP(), seed=0)
    assert len(plan) == 83 // 8
    seen = [j for idxs, _, _ in plan for j in idxs]
    assert len(seen) == len(set(seen))  # no duplicates
    assert all(0 <= j < 83 for j in seen)


@pytest.mark.fast
def test_plan_buckets_are_rounded_and_sufficient():
    hp = HP()
    lengths = _lengths()
    for idxs, L, T in plan_steps(lengths, hp, seed=1):
        assert L % hp.symbol_bucket == 0 or L == hp.max_symbols
        assert T % hp.frame_bucket == 0 or T == hp.max_frames
        for j in idxs:
            s, t = lengths[j]
            assert s <= L and t <= T
        # tight: one bucket less would not fit the longest item
        assert T - hp.frame_bucket < max(lengths[j][1] for j in idxs)


@pytest.mark.fast
def test_plan_deterministic_in_seed():
    lengths = _lengths()
    assert plan_steps(lengths, HP(), 7) == plan_steps(lengths, HP(), 7)
    assert plan_steps(lengths, HP(), 7) != plan_steps(lengths, HP(), 8)


@pytest.mark.fast
def test_length_sorting_reduces_frame_padding():
    lengths = _lengths(800)

    class NoSort(HP):
        sort_chunk_steps = 1

    class BigSort(HP):
        sort_chunk_steps = 32

    waste_nosort = padding_report(lengths, NoSort(), seed=0)
    waste_sorted = padding_report(lengths, BigSort(), seed=0)
    assert waste_sorted["frame_pad_frac"] \
        < waste_nosort["frame_pad_frac"] * 0.7
    # quadratic (attention) waste is >= linear waste by construction
    assert waste_sorted["frame_pad_frac_sq"] \
        >= waste_sorted["frame_pad_frac"]


@pytest.mark.fast
def test_padding_report_zero_waste_when_uniform():
    hp = HP()
    lengths = [(hp.symbol_bucket, hp.frame_bucket)] * 64
    rep = padding_report(lengths, hp, seed=0)
    assert rep["symbol_pad_frac"] == 0.0
    assert rep["frame_pad_frac"] == 0.0
    assert rep["unique_shapes"] == 1


@pytest.mark.fast
def test_bucket_size_rounds_up_and_caps():
    assert bucket_size(1, 64, 2048) == 64
    assert bucket_size(64, 64, 2048) == 64
    assert bucket_size(65, 64, 2048) == 128
    assert bucket_size(5000, 64, 2048) == 2048
