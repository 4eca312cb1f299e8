"""Output-length bucketing + overflow signaling (inference engine).

The engine decodes at a static output-frame bucket speculated from
per-symbol duration stats; if the speculation is too small the decode
stage's per-row overflow flag triggers one re-run at the full budget,
and genuine truncation (predicted frames > engine budget) surfaces as a
warning in generate_mel_specs (the reference sizes outputs exactly and
asserts consistency, model.py:866-923, :914).
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import tiny_hparams
from test_inference_mesh import _inference_inputs

from daft_exprt_tpu.inference.generate import (InferenceEngine,
                                               generate_mel_specs)
from daft_exprt_tpu.models.daft_exprt import DaftExprt


class FixedDurModel(DaftExprt):
    """Test double: forces every valid symbol's predicted duration to a
    constant so the output length is controllable."""

    def __init__(self, hparams, fixed_dur: float):
        super().__init__(hparams)
        self.fixed_dur = fixed_dur

    def prosody_predictor(self, params, x, film, input_lengths, rng,
                          deterministic):
        d, e, p = super().prosody_predictor(params, x, film, input_lengths,
                                            rng, deterministic)
        return jnp.full_like(d, self.fixed_dur), e, p


def _stats_hp():
    hp = tiny_hparams(frame_bucket=32)
    # production stats.json format (data/stats.py): dur_mean/dur_std
    hp.stats = {"symbols": {s: {"dur_mean": 0.1, "dur_std": 0.0}
                            for s in hp.symbols}}
    return hp


def _engines(fixed_dur, max_out=256):
    hp = _stats_hp()
    model = FixedDurModel(hp, fixed_dur)
    params = model.init_params(jax.random.PRNGKey(0))
    bucketed = InferenceEngine(model, params, hp, max_out_frames=max_out)
    full = InferenceEngine(model, params, hp, max_out_frames=max_out,
                           out_frame_buckets=[max_out])
    return hp, bucketed, full


def _assert_same_outputs(got, want):
    enc_g, dec_g, w_g = got
    enc_w, dec_w, w_w = want
    np.testing.assert_array_equal(enc_g[1], enc_w[1])  # int durations
    np.testing.assert_array_equal(dec_g[1], dec_w[1])  # output lengths
    np.testing.assert_array_equal(dec_g[2], dec_w[2])  # overflow
    for b in range(dec_g[0].shape[0]):
        t = int(dec_g[1][b])
        np.testing.assert_allclose(dec_g[0][b, :, :t], dec_w[0][b, :, :t],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(w_g[b, :, :t], w_w[b, :, :t],
                                   rtol=1e-5, atol=1e-5)


def test_bucketed_decode_matches_full_budget():
    """Short utterances decode at a small bucket, same outputs."""
    hp, bucketed, full = _engines(fixed_dur=0.1)
    assert bucketed.out_frame_buckets == [64, 128, 192, 256]
    inputs = _inference_inputs(hp, B=4, L=12, T=32)
    got = bucketed.run(inputs, "add")
    want = full.run(inputs, "add")
    # ~0.1s x <=12 symbols ~= 108 frames -> the 128 bucket, not 256
    assert bucketed._pick_out_bucket(inputs) == 128
    assert not np.any(got[1][2])
    _assert_same_outputs(got, want)
    # the bucketed engine compiled a SMALLER fused graph than the budget
    assert ("fused", "add", 128, False, False) in bucketed._compiled
    assert ("fused", "add", 256, False, False) not in bucketed._compiled


def test_underestimate_triggers_full_budget_rerun():
    """Speculation too small -> overflow -> one re-run, same outputs."""
    hp, bucketed, full = _engines(fixed_dur=0.2)  # stats still claim 0.1
    inputs = _inference_inputs(hp, B=4, L=12, T=32)
    assert bucketed._pick_out_bucket(inputs) == 128  # stale estimate
    got = bucketed.run(inputs, "add")
    want = full.run(inputs, "add")
    # actual ~0.2s x 12 ~= 206 frames: fits 256, so no final overflow
    assert not np.any(got[1][2])
    assert np.max(got[1][1]) > 128  # really needed the bigger budget
    _assert_same_outputs(got, want)
    assert ("fused", "add", 256, False, False) in bucketed._compiled


def test_measure_policy_picks_exact_bucket():
    """bucket_policy='measure' reads predicted durations (tiny sync)
    and never undershoots, even with stale stats."""
    hp = _stats_hp()  # stats claim 0.1 s/symbol
    model = FixedDurModel(hp, 0.2)  # actual 0.2 s/symbol
    params = model.init_params(jax.random.PRNGKey(0))
    eng = InferenceEngine(model, params, hp, max_out_frames=256,
                          bucket_policy="measure")
    full = InferenceEngine(model, params, hp, max_out_frames=256,
                           out_frame_buckets=[256])
    inputs = _inference_inputs(hp, B=4, L=12, T=32)
    got = eng.run(inputs, "add")
    want = full.run(inputs, "add")
    _assert_same_outputs(got, want)
    # measured exactly: only the right-sized decode was compiled, no
    # undershoot re-run at a smaller bucket happened
    decode_keys = [k for k in eng._compiled if k[0] == "decode"]
    assert decode_keys == [("decode", 256)], decode_keys


def test_warmup_compiles_every_bucket():
    """engine.warmup pre-compiles all decode buckets (serving must not
    compile inside the request lock)."""
    hp, bucketed, _ = _engines(fixed_dur=0.1)
    bucketed.warmup(("add",))
    for T in bucketed.out_frame_buckets:
        # warmup drives the packed fused serving graph per bucket
        assert ("fused", "add", T, True, True) in bucketed._compiled, T
    assert ("__warmup__", 0) not in bucketed._film_cache
    # buckets restored after warmup
    assert bucketed.out_frame_buckets == [64, 128, 192, 256]


def test_true_truncation_sets_overflow_and_warns(tmp_path, caplog):
    """Predicted frames > engine budget: overflow flag + warning."""
    hp, bucketed, _ = _engines(fixed_dur=0.9, max_out=128)
    inputs = _inference_inputs(hp, B=2, L=12, T=32)
    enc, dec, _ = bucketed.run(inputs, "add")
    assert np.all(np.asarray(dec[2]))  # every row truncated
    assert np.all(np.asarray(dec[1]) == 128)

    # generate_mel_specs surfaces it with the file name
    T_ref = 32
    ref = tmp_path / "style_ref.npz"
    rng = np.random.default_rng(0)
    np.savez(ref, energy=np.abs(rng.standard_normal(T_ref)) + 1.0,
             pitch=rng.standard_normal(T_ref).astype(np.float32),
             mel_spec=rng.standard_normal(
                 (hp.n_mel_channels, T_ref)).astype(np.float32))
    sentence = [["HH", "AH0", "L", "OW1"], "~"]
    with caplog.at_level(logging.WARNING,
                         logger="daft_exprt_tpu.inference.generate"):
        generate_mel_specs(bucketed, [sentence], ["long_line"], [0],
                           [str(ref)], str(tmp_path), hp)
    assert "truncated" in caplog.text
    assert "long_line" in caplog.text
